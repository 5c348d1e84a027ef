"""Three-sequence stitching with global pose-graph refinement — the
multi-sequence view-graph configuration (toward BASELINE configs 3-4)."""

import numpy as np
import jax.numpy as jnp
import pytest

from multiviewstitch_tpu.core.transforms import Similarity, compose, inverse
from multiviewstitch_tpu.pipeline.fixtures import make_scene, textured_views
from multiviewstitch_tpu.pipeline.align_seq import Sequence, align_sequences
from tests.test_e2e_align import CFG

pytestmark = pytest.mark.slow


def build_three_sequences(width=128, height=96):
    def rot_y(deg):
        a = np.radians(deg)
        return np.array([[np.cos(a), 0, np.sin(a)], [0, 1, 0],
                         [-np.sin(a), 0, np.cos(a)]], np.float32)

    gts = [
        Similarity(jnp.asarray(1.2, jnp.float32), jnp.asarray(rot_y(12.0)),
                   jnp.asarray([0.1, -0.05, 0.12], jnp.float32)),
        Similarity(jnp.asarray(0.9, jnp.float32), jnp.asarray(rot_y(-9.0)),
                   jnp.asarray([-0.08, 0.06, -0.1], jnp.float32)),
        Similarity.identity(),
    ]
    seqs = []
    scenes = []
    for k, gt in enumerate(gts):
        T = None if k == 2 else gt
        sc = make_scene(n_frames=4, width=width, height=height, bumps=0.15,
                        n_lat=64, n_lon=96, arc_deg=45.0, transform=T)
        seqs.append(Sequence(jnp.asarray(textured_views(sc)),
                             jnp.asarray(sc.disparity), sc.cams))
        scenes.append(sc)
    return seqs, gts, scenes


@pytest.fixture(scope="module")
def three_seq():
    return build_three_sequences()


def _angle_between(Ra, Rb):
    dR = np.asarray(Ra) @ np.asarray(Rb).T
    return np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))


def _check(result, gts, tol_scale, tol_ang, tol_t):
    # transforms[k] maps seq-k coords into the final frame; ground truth:
    # scene k was built by mapping the base world through gts[k], so the
    # true map from seq-k world to final(=identity seq) world is gts[k]^-1
    # composed appropriately... here scenes share the SAME base world, and
    # seq-k world = gts[k](base). Map seq-k -> seq-2(=base): gts[k]^{-1}.
    for k in range(2):
        T = result.transforms[k]
        gt = inverse(gts[k])
        assert abs(float(T.s) - float(gt.s)) / float(gt.s) < tol_scale, k
        assert _angle_between(T.R, gt.R) < tol_ang, k
        assert np.linalg.norm(np.asarray(T.t) - np.asarray(gt.t)) < tol_t, k


def test_three_sequence_chain(three_seq):
    seqs, gts, scenes = three_seq
    result = align_sequences(seqs, CFG, seed=0)
    _check(result, gts, 0.08, 4.0, 0.12)


def test_three_sequence_refined_at_least_as_good(three_seq):
    seqs, gts, scenes = three_seq
    chain = align_sequences(seqs, CFG, seed=0)
    refined = align_sequences(seqs, CFG, seed=0, refine=True)
    assert "pose_graph_rmse" in refined.metrics
    _check(refined, gts, 0.08, 4.0, 0.12)

    # the refined solution's global match consistency must not be worse
    def total_err(result):
        errs = []
        for k in range(2):
            T = result.transforms[k]
            gt = inverse(gts[k])
            errs.append(_angle_between(T.R, gt.R))
        return np.mean(errs)

    # non-degenerate bound: on a noise-free fixture the greedy chain can be
    # EXACT (total_err == 0), and the pose-graph optimum of the match
    # residual differs from ground truth by the fixture's discretization
    # noise — so allow that absolute floor (0.1 deg) on top of the
    # relative bound.
    assert total_err(refined) <= total_err(chain) * 1.5 + 0.1


def test_three_sequence_all_pairs_refine(three_seq):
    seqs, gts, scenes = three_seq
    result = align_sequences(seqs, CFG, seed=0, refine=True, all_pairs=True)
    assert result.metrics.get("pose_graph_edges", 0) >= 2
    _check(result, gts, 0.08, 4.0, 0.12)


def test_segment_flag_pipeline(three_seq):
    seqs, gts, scenes = three_seq
    cfg = CFG.replace(segment=True)
    result = align_sequences(seqs[:2], cfg, seed=0)
    # segmentation must not break alignment on the demo scenes (masking
    # adds silhouette edges, so tolerance is looser than the unmasked path)
    from multiviewstitch_tpu.core.transforms import inverse
    T = result.transforms[0]
    gt = inverse(gts[0])
    assert abs(float(T.s) - float(gt.s)) / float(gt.s) < 0.15
