import numpy as np
import jax
import jax.numpy as jnp

from multiviewstitch_tpu.core.transforms import Similarity, apply_points
from multiviewstitch_tpu.solvers import srt
from tests.test_cameras import make_camera


def gt_similarity(seed=0, s=1.7):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return Similarity(jnp.asarray(s, jnp.float32),
                      jnp.asarray(Q, jnp.float32),
                      jnp.asarray(rng.normal(size=3) * 0.3, jnp.float32))


def make_match_set(n=60, seed=1, noise=0.0, outlier_frac=0.0, s=1.7,
                   outlier_mag=8.0):
    """p2 = T(p1) (+noise); both point sets kept in front of both cameras."""
    rng = np.random.default_rng(seed)
    T = gt_similarity(seed, s=s)
    p1 = rng.normal(size=(n, 3)).astype(np.float32) * 0.3
    p1[:, 2] += 4.0  # in front of cam1 (identity-ish pose)
    p2 = np.asarray(apply_points(T, jnp.asarray(p1)))
    if noise:
        p2 = p2 + rng.normal(size=p2.shape).astype(np.float32) * noise
    n_out = int(n * outlier_frac)
    if n_out:
        # big 3D offsets so outliers are unambiguous in pixels at f≈50
        p2[:n_out] += (rng.normal(size=(n_out, 3)).astype(np.float32) *
                       np.float32(outlier_mag) + np.float32(outlier_mag / 4))
    return jnp.asarray(p1), jnp.asarray(p2), T


def cams_for(T: Similarity, w=320, h=240):
    """cam1 looks at p1 cloud; cam2 = cam1 pose mapped by T so p2 projects
    in front of it with similar image coverage."""
    cam1 = make_camera(1, w=w, h=h, seed=99)[0]
    # place cam1 at origin looking +z
    cam1 = type(cam1)(cam1.K, jnp.eye(3), jnp.zeros(3), w, h)
    # cam2: p_c = R2 p + t2 with R2 = R1 R^T / ... want cam2 to see T(p1):
    # use p_c2 = s^{-1} is wrong; simplest: cam2 = (R R_T^T, ...) emulate
    # fixtures: R2 = R1 @ T.R^T, t2 = s*t1 - R2 @ T.t  (scene-similarity map)
    R2 = jnp.eye(3) @ T.R.T
    t2 = float(T.s) * jnp.zeros(3) - R2 @ T.t
    cam2 = type(cam1)(cam1.K, R2, t2, w, h)
    return cam1, cam2


def test_kabsch_exact_recovery():
    p1, p2, T = make_match_set(40, seed=2)
    mask = jnp.ones(40, bool)
    est = srt.estimate_srt(p1, p2, mask)
    np.testing.assert_allclose(float(est.s), float(T.s), rtol=1e-4)
    np.testing.assert_allclose(np.asarray(est.R), np.asarray(T.R), atol=1e-4)
    np.testing.assert_allclose(np.asarray(est.t), np.asarray(T.t), atol=1e-4)


def test_kabsch_reflection_fix():
    # degenerate coplanar points must still produce a proper rotation
    rng = np.random.default_rng(3)
    p1 = np.zeros((20, 3), np.float32)
    p1[:, :2] = rng.normal(size=(20, 2))
    T = gt_similarity(4, s=1.0)
    p2 = np.asarray(apply_points(T, jnp.asarray(p1)))
    R, t = srt.kabsch_rt(jnp.asarray(p1), jnp.asarray(p2),
                         jnp.ones(20), 1.0)
    assert abs(float(jnp.linalg.det(R)) - 1.0) < 1e-4


def test_scale_estimate():
    p1, p2, T = make_match_set(80, seed=5, s=2.3)
    s = srt.estimate_scale(p1, p2, jnp.ones(80, bool))
    np.testing.assert_allclose(float(s), 2.3, rtol=1e-3)


def test_masked_points_ignored():
    p1, p2, T = make_match_set(50, seed=6)
    # corrupt the masked-out tail; estimate must not change
    p1c = jnp.concatenate([p1, jnp.full((10, 3), 1e3)], 0)
    p2c = jnp.concatenate([p2, jnp.full((10, 3), -1e3)], 0)
    mask = jnp.concatenate([jnp.ones(50, bool), jnp.zeros(10, bool)])
    est = srt.estimate_srt(p1c, p2c, mask)
    np.testing.assert_allclose(np.asarray(est.R), np.asarray(T.R), atol=1e-4)


def test_scale_robust_to_contamination():
    # round 3: estimate_scale is a MEDIAN ratio (robust upgrade over the
    # reference's mean, SRTSolver.cpp:44) — 30% gross outliers must no
    # longer bias it (they biased the mean by >0.5 on this fixture), and
    # the pruning cascade still converges to the same value.
    p1, p2, T = make_match_set(100, seed=7, noise=0.001, outlier_frac=0.3,
                               outlier_mag=2.0)
    cam1, cam2 = cams_for(T)
    mask = jnp.ones(100, bool)
    s_raw = srt.estimate_scale(p1, p2, mask)
    np.testing.assert_allclose(float(s_raw), 1.7, rtol=0.05)
    # pixel_err scaled to the fixture's f=50 optics (the reference default
    # 55 is calibrated for its ~VGA, f~500 sequences)
    mask2, Tb, _ = srt.remove_outliers(
        p1, p2, mask, cam1, cam2, jax.random.key(2),
        pixel_err=12.0, adapt_ratio=0.6, iter_num=256, rounds=3)
    s_rec = srt.estimate_scale(p1, p2, mask2)
    np.testing.assert_allclose(float(s_rec), 1.7, rtol=0.05)


def test_ransac_clean_matches_recovers_rotation():
    p1, p2, T = make_match_set(100, seed=7, noise=0.001)
    cam1, cam2 = cams_for(T)
    best, err = srt.estimate_srt_ransac(
        p1, p2, jnp.ones(100, bool), cam1, cam2, jax.random.key(0),
        iter_num=256)
    dR = np.asarray(best.R) @ np.asarray(T.R).T
    angle = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert angle < 1.0


def test_remove_outliers_cascade():
    p1, p2, T = make_match_set(120, seed=8, noise=0.0005, outlier_frac=0.35)
    cam1, cam2 = cams_for(T)
    mask0 = jnp.ones(120, bool)
    mask, Tb, res = srt.remove_outliers(
        p1, p2, mask0, cam1, cam2, jax.random.key(1),
        pixel_err=12.0, adapt_ratio=0.6, iter_num=256, rounds=3)
    m = np.asarray(mask)
    n_out = int(120 * 0.35)
    # the cascade is shrink-only (like the reference, which replaces its
    # match set with the survivors each round, Processor.cpp:232-240), so
    # recall can drop under heavy contamination — what matters is precision
    # and that the final transform is right.
    assert m[:n_out].sum() == 0          # every outlier pruned
    assert m[n_out:].sum() >= 3          # enough inliers survive to solve
    np.testing.assert_allclose(float(Tb.s), float(T.s), rtol=0.02)
    dR = np.asarray(Tb.R) @ np.asarray(T.R).T
    angle = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert angle < 1.0


def test_residual_zero_for_exact_transform():
    p1, p2, T = make_match_set(30, seed=9)
    cam1, cam2 = cams_for(T)
    res = srt.residual_error(T, p1, p2, jnp.ones(30, bool), cam1, cam2)
    assert float(res) < 1.0  # sub-pixel (integer rounding quantizes)
