"""Noise-robustness: the filter cascade and solvers must survive realistic
sensor degradation (round-3; SURVEY §6 commits to noisy-data evidence —
the reference was built for hand-held RGB-D video and its pixel_err /
dsp_err / conf_min thresholds exist precisely for noisy input,
Processor.cpp:82-108)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multiviewstitch_tpu.pipeline.fixtures import (sensor_noise,
                                                   inject_outlier_matches)
from multiviewstitch_tpu.pipeline.align_seq import (Sequence,
                                                    align_sequences)
from tests.test_e2e_align import build_two_sequences, CFG

pytestmark = pytest.mark.slow


def _noisy_pair(level, seed=0):
    seq1, seq2, gt, base, moved = build_two_sequences()
    out = []
    for k, s in enumerate((seq1, seq2)):
        g, d = sensor_noise(np.asarray(s.gray), np.asarray(s.disparity),
                            level, seed=seed + k)
        out.append(Sequence(jnp.asarray(g), jnp.asarray(d), s.cams))
    return out[0], out[1], gt


@pytest.mark.parametrize("level", [1.0, 2.0])
def test_align_survives_sensor_noise(level):
    """Full align at sensor-noise level 1x and 2x still recovers the
    similarity within (loosened) tolerances."""
    s1, s2, gt = _noisy_pair(level)
    result = align_sequences([s1, s2], CFG, seed=0)
    T = result.transforms[0]
    np.testing.assert_allclose(float(T.s), float(gt.s), rtol=0.08)
    dR = np.asarray(T.R) @ np.asarray(gt.R).T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 5.0, (level, ang)
    assert np.linalg.norm(np.asarray(T.t) - np.asarray(gt.t)) < 0.15


def test_srt_ransac_survives_gross_outliers():
    """30% uniformly random correspondences must not move the RANSAC SRT
    solution (the RemoveOutliers contract, Processor.cpp:196-259)."""
    from multiviewstitch_tpu.solvers.srt import estimate_srt_ransac
    from multiviewstitch_tpu.core.cameras import CameraBatch

    rng = np.random.default_rng(3)
    p1 = rng.uniform(-0.5, 0.5, size=(200, 3)).astype(np.float32)
    p1[:, 2] += 3.0
    s, th = 1.2, np.radians(20)
    R = np.array([[np.cos(th), -np.sin(th), 0],
                  [np.sin(th), np.cos(th), 0], [0, 0, 1]], np.float32)
    t = np.array([0.1, -0.2, 0.15], np.float32)
    p2 = (s * (R @ p1.T).T + t).astype(np.float32)
    # corrupt 30% of the target points grossly
    bad = rng.random(200) < 0.3
    p2[bad] += rng.uniform(0.5, 2.0, size=(int(bad.sum()), 3)).astype(
        np.float32) * np.sign(rng.normal(size=(int(bad.sum()), 3))).astype(
        np.float32)

    K = jnp.asarray([[200.0, 0, 80.0], [0, 200.0, 60.0], [0, 0, 1]])
    cam = CameraBatch(K, jnp.eye(3), jnp.zeros(3), 160, 120)
    T, res = estimate_srt_ransac(jnp.asarray(p1), jnp.asarray(p2),
                                 jnp.ones(200, bool), cam, cam,
                                 jax.random.key(0), iter_num=256)
    assert abs(float(T.s) - s) / s < 0.02
    dR = np.asarray(T.R) @ R.T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 1.0
    assert np.linalg.norm(np.asarray(T.t) - t) < 0.03


def test_inject_outlier_matches_shapes():
    uv1 = np.zeros((50, 2), np.int32)
    uv2 = np.zeros((50, 2), np.int32)
    mask = np.ones(50, bool)
    uv2n, bad = inject_outlier_matches(uv1, uv2, mask, 0.2, 160, 120)
    assert len(bad) == 10
    assert (uv2n[bad] != 0).any()
    # untouched rows stay identical
    untouched = np.setdiff1d(np.arange(50), bad)
    np.testing.assert_array_equal(uv2n[untouched], uv2[untouched])


def test_sensor_noise_properties():
    rng = np.random.default_rng(0)
    g = rng.uniform(0, 255, size=(2, 40, 50)).astype(np.float32)
    d = rng.uniform(0.2, 0.4, size=(2, 40, 50)).astype(np.float32)
    g0, d0 = sensor_noise(g, d, 0.0)
    np.testing.assert_array_equal(g0, g)
    g1, d1 = sensor_noise(g, d, 1.0)
    assert not np.allclose(g1, g)
    assert not np.allclose(d1, d)
    # quantization produces a discrete value set
    vals = np.unique(np.round(d1[d1 > 0], 6))
    assert len(vals) < d1.size / 3
    assert (g1 >= 0).all() and (g1 <= 255).all()
    # dropouts exist but are rare
    dropped = ((d1 == 0) & (d > 0)).mean()
    assert 0 < dropped < 0.02
