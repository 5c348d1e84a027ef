import numpy as np
import jax.numpy as jnp
import pytest

from multiviewstitch_tpu.core.transforms import Similarity, apply_points
from multiviewstitch_tpu.solvers.pose_graph import (build_data,
                                                    refine_pose_graph)


def rand_sim(seed, s=1.0):
    rng = np.random.default_rng(seed)
    A = rng.normal(size=(3, 3))
    Q, _ = np.linalg.qr(A)
    if np.linalg.det(Q) < 0:
        Q[:, 0] *= -1
    return Similarity(jnp.asarray(s, jnp.float32),
                      jnp.asarray(Q, jnp.float32),
                      jnp.asarray(rng.normal(size=3) * 0.2, jnp.float32))


def make_graph(n_seqs=3, matches_per_pair=80, noise=0.0, seed=0):
    """GT transforms T_k (last = identity); match blocks for consecutive
    AND skip pairs so the graph is over-determined."""
    rng = np.random.default_rng(seed)
    gt = [rand_sim(10 + k, s=1.0 + 0.15 * k) for k in range(n_seqs - 1)]
    gt.append(Similarity.identity())

    world = rng.normal(size=(400, 3)).astype(np.float32)
    pairs = []
    edges = [(k, k + 1) for k in range(n_seqs - 1)] + \
            [(k, k + 2) for k in range(n_seqs - 2)]
    from multiviewstitch_tpu.core.transforms import inverse
    for k, l in edges:
        sel = rng.choice(400, matches_per_pair, replace=False)
        w = world[sel]
        p = np.asarray(apply_points(inverse(gt[k]), jnp.asarray(w)))
        q = np.asarray(apply_points(inverse(gt[l]), jnp.asarray(w)))
        if noise:
            q = q + rng.normal(size=q.shape).astype(np.float32) * noise
        pairs.append((k, l, p, q, np.ones(matches_per_pair, bool)))
    return gt, pairs


def perturb(T: Similarity, seed, mag=0.05):
    rng = np.random.default_rng(seed)
    dR = rng.normal(size=3) * mag
    from multiviewstitch_tpu.solvers.ba import rodrigues
    Rp = np.asarray(rodrigues(jnp.asarray(dR, jnp.float32)))
    return Similarity(jnp.asarray(float(T.s) * (1 + mag * rng.normal()),
                                  jnp.float32),
                      jnp.asarray(Rp @ np.asarray(T.R), jnp.float32),
                      T.t + jnp.asarray(rng.normal(size=3) * mag,
                                        jnp.float32))


def test_pose_graph_zero_residual_at_gt():
    gt, pairs = make_graph()
    data = build_data(pairs, max_matches=128)
    out, rmse = refine_pose_graph(gt, data, iters=2)
    assert rmse < 1e-4


def test_pose_graph_recovers_from_perturbation():
    gt, pairs = make_graph(noise=0.001)
    data = build_data(pairs, max_matches=128)
    init = [perturb(T, 50 + i) for i, T in enumerate(gt[:-1])] + [gt[-1]]
    out, rmse = refine_pose_graph(init, data, iters=30)
    assert rmse < 0.01
    for To, Tg in zip(out[:-1], gt[:-1]):
        np.testing.assert_allclose(float(To.s), float(Tg.s), rtol=0.02)
        dR = np.asarray(To.R) @ np.asarray(Tg.R).T
        ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
        assert ang < 1.0
        assert np.linalg.norm(np.asarray(To.t) - np.asarray(Tg.t)) < 0.02


def test_pose_graph_gauge_fixed():
    gt, pairs = make_graph()
    data = build_data(pairs, max_matches=128)
    init = [perturb(T, 99 + i) for i, T in enumerate(gt[:-1])] + [gt[-1]]
    out, _ = refine_pose_graph(init, data, iters=10)
    # last sequence stays identity
    np.testing.assert_allclose(float(out[-1].s), 1.0, rtol=1e-6)
    np.testing.assert_allclose(np.asarray(out[-1].R), np.eye(3), atol=1e-6)
