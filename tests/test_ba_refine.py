"""Product-path BA refinement (pipeline/ba_refine.py, VERDICT r3 item 4):
unit tests for the camera compositing / similarity re-fit algebra plus the
e2e align_sequences(refine="ba") path on the config-1 fixture."""

import numpy as np
import jax.numpy as jnp
import pytest

from multiviewstitch_tpu.core.transforms import Similarity
from multiviewstitch_tpu.solvers.ba import rodrigues, BAState
from multiviewstitch_tpu.pipeline.ba_refine import (
    _rotmat_to_rvec, _nearest_rotation, refit_similarities,
    build_ba_problem, refine_with_ba)


def _rand_rot(rng):
    q = rng.normal(size=4)
    q /= np.linalg.norm(q)
    w, x, y, z = q
    return np.asarray([
        [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
        [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
        [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
    ])


def test_rotmat_to_rvec_roundtrip():
    rng = np.random.default_rng(0)
    for _ in range(20):
        R = _rand_rot(rng)
        rv = _rotmat_to_rvec(R.astype(np.float32))
        R2 = np.asarray(rodrigues(jnp.asarray(rv)))
        np.testing.assert_allclose(R2, R, atol=2e-5)
    # identity and near-pi cases
    np.testing.assert_allclose(_rotmat_to_rvec(np.eye(3, dtype=np.float32)),
                               0.0, atol=1e-8)
    Rpi = np.diag([1.0, -1.0, -1.0]).astype(np.float32)  # pi about x
    R2 = np.asarray(rodrigues(jnp.asarray(_rotmat_to_rvec(Rpi))))
    np.testing.assert_allclose(R2, Rpi, atol=1e-4)


def test_nearest_rotation_matches_svd_optimum():
    rng = np.random.default_rng(1)
    R = _rand_rot(rng)
    M = R + 0.05 * rng.normal(size=(3, 3))
    Rn = _nearest_rotation(M)
    np.testing.assert_allclose(Rn @ Rn.T, np.eye(3), atol=1e-5)
    assert np.linalg.det(Rn) > 0
    # close to the original rotation for a small perturbation
    ang = np.degrees(np.arccos(np.clip((np.trace(Rn @ R.T) - 1) / 2,
                                       -1, 1)))
    assert ang < 5.0


class _FakeCams:
    def __init__(self, R, t):
        self.R = jnp.asarray(R)
        self.t = jnp.asarray(t)


class _FakeSeq:
    def __init__(self, R, t):
        self.cams = _FakeCams(R, t)


def test_refit_recovers_known_similarity():
    """Compose exact cameras through a known similarity, refit, and get it
    back (>=2 frames: scale included; 1 frame: chain scale kept)."""
    rng = np.random.default_rng(2)
    n = 3
    Rf = np.stack([_rand_rot(rng) for _ in range(n)])
    tf = rng.normal(size=(n, 3))
    gt = Similarity(jnp.asarray(1.27, jnp.float32),
                    jnp.asarray(_rand_rot(rng), jnp.float32),
                    jnp.asarray([0.3, -0.2, 0.45], jnp.float32))
    s, RT, tT = float(gt.s), np.asarray(gt.R, np.float64), np.asarray(
        gt.t, np.float64)
    Rp = np.einsum("nij,kj->nik", Rf, RT)       # R_f @ R_T^T
    tp = -np.einsum("nij,j->ni", Rp, tT) + s * tf
    rv = np.stack([_rotmat_to_rvec(Rp[i].astype(np.float32))
                   for i in range(n)])
    st = BAState(jnp.asarray(rv), jnp.asarray(tp, jnp.float32),
                 jnp.zeros((1, 3), jnp.float32))
    seqs = [_FakeSeq(Rf, tf), _FakeSeq(Rf[:1], tf[:1])]
    # chain init with WRONG scale to prove the LS recovers the true one
    init = [Similarity(jnp.asarray(1.0, jnp.float32), gt.R, gt.t),
            Similarity.identity()]
    cam_map = {(0, i): i for i in range(n)}
    out = refit_similarities(seqs, init, st, cam_map)
    np.testing.assert_allclose(float(out[0].s), s, rtol=1e-4)
    np.testing.assert_allclose(np.asarray(out[0].R), RT, atol=1e-4)
    np.testing.assert_allclose(np.asarray(out[0].t), tT, atol=1e-3)
    # reference sequence untouched
    assert float(out[1].s) == 1.0

    # single observed frame: scale must stay at the chain value
    cam_map1 = {(0, 0): 0}
    init1 = [Similarity(jnp.asarray(s, jnp.float32), gt.R,
                        jnp.zeros(3)), Similarity.identity()]
    out1 = refit_similarities(seqs, init1, st, cam_map1)
    np.testing.assert_allclose(float(out1[0].s), s, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out1[0].t), tT, atol=1e-3)


@pytest.mark.slow
def test_align_with_ba_refine_recovers_gt():
    from tests.test_e2e_align import build_two_sequences, CFG
    from multiviewstitch_tpu.pipeline.align_seq import align_sequences
    seq1, seq2, gt, _, _ = build_two_sequences()
    res = align_sequences([seq1, seq2], CFG, seed=0, refine="ba")
    assert "ba_rmse_px" in res.metrics, res.metrics
    assert res.metrics["ba_rmse_px"] <= res.metrics["ba_rmse_init_px"] + 1e-6
    assert res.metrics["ba_cams"] >= 2
    T = res.transforms[0]
    np.testing.assert_allclose(float(T.s), float(gt.s), rtol=0.05)
    dR = np.asarray(T.R) @ np.asarray(gt.R).T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 3.0
    assert np.linalg.norm(np.asarray(T.t) - np.asarray(gt.t)) < 0.08


def test_refine_with_ba_sharded_matches_unsharded():
    """The mesh-sharded product path (point blocks over 'views') equals
    the single-device solve on a small synthetic problem."""
    from multiviewstitch_tpu.parallel.mesh import make_mesh
    from tests.test_ba import synth_ba_problem  # noqa: F401 (fixture gen)
    # build a tiny two-sequence candidate set by hand
    rng = np.random.default_rng(5)

    class _C:
        pass

    n = 37                                    # NOT divisible by 8: pads
    R1 = np.stack([_rand_rot(rng) for _ in range(2)])
    t1 = rng.normal(size=(2, 3)) * 0.1 + np.asarray([0, 0, 2.0])
    seqs = [_FakeSeq(R1, t1), _FakeSeq(R1.copy(), t1.copy())]
    pts_w = rng.normal(size=(n, 3)) * 0.4     # reference-frame points

    gtT = Similarity(jnp.asarray(1.1, jnp.float32),
                     jnp.asarray(_rand_rot(rng), jnp.float32),
                     jnp.asarray([0.1, 0.05, -0.08], jnp.float32))
    import jax
    from multiviewstitch_tpu.core.transforms import inverse
    K = np.asarray([[80.0, 0, 31.5], [0, 80.0, 23.5], [0, 0, 1]],
                   np.float32)

    class _KC:
        def __init__(self, R, t):
            self.R = jnp.asarray(R)
            self.t = jnp.asarray(t)
            self.K = jnp.asarray(np.tile(K, (len(R), 1, 1)))

    for s in seqs:
        s.cams = _KC(np.asarray(s.cams.R), np.asarray(s.cams.t))

    def project(Rf, tf, X):
        pc = Rf @ X + tf
        return np.asarray([K[0, 0] * pc[0] / pc[2] + K[0, 2],
                           K[1, 1] * pc[1] / pc[2] + K[1, 2]])

    # seq 1 = reference (identity); seq 0 related by gtT
    Tinv = inverse(gtT)
    cands = []
    c = _C()
    c.frame_i, c.frame_j = 0, 1
    p1 = np.asarray([np.asarray(
        jnp.einsum("ij,j->i", Tinv.R, jnp.asarray(p)) * Tinv.s +
        np.asarray(Tinv.t)) for p in pts_w])  # seq-0 world lifts
    c.p1 = p1
    c.p2 = pts_w
    c.uv1 = np.stack([project(np.asarray(R1[0]), np.asarray(t1[0]) * 1.1,
                              p1[i]) for i in range(n)]).round()
    # note: uv1 computed with the COMPOSITE camera of seq0 is what BA
    # sees; emulate a slightly off chain by projecting through gt
    Rp0 = R1[0] @ np.asarray(gtT.R).T
    tp0 = -Rp0 @ np.asarray(gtT.t) + float(gtT.s) * t1[0]
    c.uv1 = np.stack([project(Rp0, tp0, pts_w[i]) for i in range(n)])
    c.uv2 = np.stack([project(R1[1], t1[1], pts_w[i]) for i in range(n)])
    c.mask = np.ones(n, bool)
    cands.append((0, 1, c))

    init = [gtT, Similarity.identity()]
    out1, m1 = refine_with_ba(seqs, cands, init, iters=8)
    mesh = make_mesh(8, ("views",))
    out2, m2 = refine_with_ba(seqs, cands, init, iters=8, mesh=mesh)
    # pixel-identity keying may merge points that truncate to the same
    # integer source pixel — both paths must agree, and nearly all of the
    # n synthetic points must survive as tracks
    assert m1["ba_tracks"] == m2["ba_tracks"] >= n - 3
    np.testing.assert_allclose(m1["ba_rmse_px"], m2["ba_rmse_px"],
                               atol=5e-3)
    np.testing.assert_allclose(np.asarray(out1[0].R),
                               np.asarray(out2[0].R), atol=1e-3)


def test_refine_skips_on_mismatched_intrinsics():
    """BA shares one K across all composite cameras; a participating frame
    with different intrinsics must skip BA (ba_skipped=1, chain returned)
    rather than silently projecting through the wrong K (round-5 advisor:
    build_ba_problem used seqs[0].cams.K[0] unconditionally)."""
    from multiviewstitch_tpu.core.transforms import inverse
    rng = np.random.default_rng(5)
    n = 20
    R1 = np.stack([_rand_rot(rng) for _ in range(2)])
    t1 = rng.normal(size=(2, 3)) * 0.1 + np.asarray([0, 0, 2.0])
    K = np.asarray([[80.0, 0, 31.5], [0, 80.0, 23.5], [0, 0, 1]],
                   np.float32)

    class _KC:
        def __init__(self, R, t, Ks):
            self.R = jnp.asarray(R)
            self.t = jnp.asarray(t)
            self.K = jnp.asarray(Ks)

    class _S:
        def __init__(self, cams):
            self.cams = cams

    pts_w = rng.normal(size=(n, 3)) * 0.4
    gtT = Similarity(jnp.asarray(1.1, jnp.float32),
                     jnp.asarray(_rand_rot(rng), jnp.float32),
                     jnp.asarray([0.1, 0.05, -0.08], jnp.float32))
    Tinv = inverse(gtT)

    def project(Rf, tf, X):
        pc = Rf @ X + tf
        return np.asarray([K[0, 0] * pc[0] / pc[2] + K[0, 2],
                           K[1, 1] * pc[1] / pc[2] + K[1, 2]])

    class _C:
        pass

    c = _C()
    c.frame_i, c.frame_j = 0, 1
    p1 = np.asarray([np.asarray(
        jnp.einsum("ij,j->i", Tinv.R, jnp.asarray(p)) * Tinv.s +
        np.asarray(Tinv.t)) for p in pts_w])
    c.p1, c.p2 = p1, pts_w
    Rp0 = R1[0] @ np.asarray(gtT.R).T
    tp0 = -Rp0 @ np.asarray(gtT.t) + float(gtT.s) * t1[0]
    c.uv1 = np.stack([project(Rp0, tp0, pts_w[i]) for i in range(n)])
    c.uv2 = np.stack([project(R1[1], t1[1], pts_w[i]) for i in range(n)])
    c.mask = np.ones(n, bool)
    cands = [(0, 1, c)]
    init = [gtT, Similarity.identity()]
    Ks_same = np.tile(K, (2, 1, 1))
    # participating camera (seq 1, frame 1 = c.frame_j) with a different fx
    Ks_diff = Ks_same.copy()
    Ks_diff[1, 0, 0] = 95.0
    seqs = [_S(_KC(R1, t1, Ks_same)),
            _S(_KC(R1.copy(), t1.copy(), Ks_diff))]
    out, m = refine_with_ba(seqs, cands, init, iters=4)
    assert m.get("ba_skipped") == 1.0
    assert float(out[0].s) == float(gtT.s)
    # non-participating frame K (seq 0, frame 1) may differ freely
    Ks_np = Ks_same.copy()
    Ks_np[1, 0, 0] = 95.0
    seqs2 = [_S(_KC(R1, t1, Ks_np)),
             _S(_KC(R1.copy(), t1.copy(), Ks_same))]
    out2, m2 = refine_with_ba(seqs2, cands, init, iters=4)
    assert "ba_rmse_px" in m2 and m2.get("ba_skipped", 0) == 0
