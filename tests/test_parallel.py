"""Sharded-vs-unsharded golden tests on the 8-virtual-device CPU mesh
(SURVEY §4: 'golden-value tests that a sharded BA ... matches the unsharded
solve')."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multiviewstitch_tpu.parallel.mesh import (make_mesh, shard_along,
                                               replicated, pad_to_multiple)
from multiviewstitch_tpu.parallel import ba_dist
from multiviewstitch_tpu.solvers import ba
from tests.test_ba import synth_ba_problem


@pytest.fixture(scope="module")
def mesh():
    assert len(jax.devices()) >= 8, "conftest must provide 8 CPU devices"
    return make_mesh(8, ("views",))


def test_mesh_setup(mesh):
    assert mesh.shape["views"] == 8


def test_pad_to_multiple():
    x = np.arange(10)
    p, n = pad_to_multiple(x, 8)
    assert p.shape[0] == 16 and n == 10


def test_sharded_ba_matches_unsharded(mesh):
    prob, gt, init = synth_ba_problem(n_cams=6, n_pts=64, pose_noise=0.01,
                                      pt_noise=0.02)
    # unsharded reference result
    st_ref, rmse_ref = ba.solve_ba(prob, init, iters=15)

    # same problem in per-point grouped layout (64 pts / 8 devices)
    K = np.asarray(prob.K)
    cam_idx = np.asarray(prob.cam_idx)
    pt_idx = np.asarray(prob.pt_idx)
    uv = np.asarray(prob.uv)
    blocks = ba_dist.group_by_point(K, cam_idx, pt_idx, uv, 64, 6,
                                    max_obs_per_point=6)
    st_sh, rmse_sh = ba_dist.solve_ba_sharded(blocks, init, mesh, iters=15)

    # both converge to the same optimum (exact synthetic data -> ~0)
    assert rmse_sh < 0.2
    assert abs(rmse_sh - rmse_ref) < 0.1
    np.testing.assert_allclose(np.asarray(st_sh.rvec),
                               np.asarray(st_ref.rvec), atol=2e-3)
    np.testing.assert_allclose(np.asarray(st_sh.tvec),
                               np.asarray(st_ref.tvec), atol=2e-2)


def test_sharded_step_deterministic(mesh):
    prob, gt, init = synth_ba_problem(n_cams=4, n_pts=64, pose_noise=0.005)
    blocks = ba_dist.group_by_point(
        np.asarray(prob.K), np.asarray(prob.cam_idx),
        np.asarray(prob.pt_idx), np.asarray(prob.uv), 64, 4,
        max_obs_per_point=4)
    s1 = ba_dist.gn_step_sharded(blocks, init, jnp.asarray(1e-3),
                                 mesh=mesh, num_cams=4)
    s2 = ba_dist.gn_step_sharded(blocks, init, jnp.asarray(1e-3),
                                 mesh=mesh, num_cams=4)
    np.testing.assert_array_equal(np.asarray(s1.points),
                                  np.asarray(s2.points))
    np.testing.assert_array_equal(np.asarray(s1.rvec), np.asarray(s2.rvec))


def test_frame_sharded_frontend_matches_single_device(mesh):
    """Consistency + sampling sharded over frames == unsharded results."""
    from jax.sharding import NamedSharding, PartitionSpec as P
    from multiviewstitch_tpu.core.cameras import CameraBatch
    from multiviewstitch_tpu.ops.consistency import check_consistency

    n, h, w = 8, 48, 64
    rng = np.random.default_rng(0)
    disp = rng.uniform(0.2, 0.4, size=(n, h, w)).astype(np.float32)
    K = np.zeros((n, 3, 3), np.float32)
    K[:, 0, 0] = K[:, 1, 1] = 60.0
    K[:, 0, 2] = (w - 1) / 2
    K[:, 1, 2] = (h - 1) / 2
    K[:, 2, 2] = 1
    R = np.broadcast_to(np.eye(3, dtype=np.float32), (n, 3, 3)).copy()
    t = np.zeros((n, 3), np.float32)
    t[:, 0] = np.linspace(0, 0.2, n)

    def run(sharding=None):
        args = [jnp.asarray(x) for x in (disp, K, R, t)]
        if sharding is not None:
            args = [jax.device_put(a, sharding) for a in args]
        cams = CameraBatch(args[1], args[2], args[3], w, h)
        return np.asarray(check_consistency(
            args[0], cams, min_dsp=1e-3, max_dsp=10.0, reproj_err=4))

    ref = run()
    sharded = run(shard_along(mesh, "views"))
    np.testing.assert_array_equal(ref, sharded)


def test_sharded_arap_matches_unsharded(mesh):
    """Edge-sharded ARAP == single-device ARAP (deformation-graph blocks)."""
    import jax.numpy as jnp
    from multiviewstitch_tpu.pipeline.fixtures import uv_sphere
    from multiviewstitch_tpu.solvers import deformation as D
    from multiviewstitch_tpu.parallel.arap_dist import (arap_solve_sharded,
                                                        pad_edges)

    v, f = uv_sphere(16, 22, radius=1.0)
    edges = D.mesh_edges(f)
    w = D.cotangent_weights(v, f, edges)
    ang = np.radians(25)
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    moved = (R @ v.T).T + np.array([0.2, -0.1, 0.3], np.float32)
    constrained = np.zeros(len(v), bool)
    constrained[D.uniform_sampling(v)] = True
    targets = jnp.asarray(np.where(constrained[:, None], moved, 0.0))

    prob = D.ARAPProblem(jnp.asarray(v), jnp.asarray(edges), jnp.asarray(w),
                         jnp.asarray(constrained), targets)
    ref = np.asarray(D.arap_solve(prob, outer_iters=6, cg_iters=200))

    ep, wp = pad_edges(edges, w, 8)
    prob_p = D.ARAPProblem(jnp.asarray(v), jnp.asarray(ep), jnp.asarray(wp),
                           jnp.asarray(constrained), targets)
    out = np.asarray(arap_solve_sharded(prob_p, mesh=mesh, outer_iters=6,
                                        cg_iters=200))
    # same optimum: rigid motion reproduced everywhere, and the sharded
    # solve agrees with the unsharded one to reduction-order tolerance
    np.testing.assert_allclose(out, moved, atol=0.03)
    np.testing.assert_allclose(out, ref, atol=5e-3)


def test_block_partitioned_arap_matches_unsharded(mesh):
    """Vertex-block ARAP (halo exchange, sharded state) == single-device
    ARAP, and the per-device vertex working set is a small fraction of V."""
    import jax.numpy as jnp
    from multiviewstitch_tpu.pipeline.fixtures import uv_sphere
    from multiviewstitch_tpu.solvers import deformation as D
    from multiviewstitch_tpu.parallel.arap_blocks import (
        build_blocks, arap_solve_blocks, per_device_state_bytes)

    v, f = uv_sphere(16, 22, radius=1.0)
    edges = D.mesh_edges(f)
    w = D.cotangent_weights(v, f, edges)
    ang = np.radians(25)
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]], np.float32)
    moved = (R @ v.T).T + np.array([0.2, -0.1, 0.3], np.float32)
    constrained = np.zeros(len(v), bool)
    constrained[D.uniform_sampling(v)] = True
    targets = np.where(constrained[:, None], moved, 0.0)

    prob = D.ARAPProblem(jnp.asarray(v), jnp.asarray(edges), jnp.asarray(w),
                         jnp.asarray(constrained), jnp.asarray(targets))
    ref = np.asarray(D.arap_solve(prob, outer_iters=6, cg_iters=200))

    blocks = build_blocks(v, edges, w, constrained, targets, 8)
    out = np.asarray(arap_solve_blocks(blocks, mesh=mesh, outer_iters=6,
                                       cg_iters=200))
    np.testing.assert_allclose(out, moved, atol=0.03)
    np.testing.assert_allclose(out, ref, atol=5e-3)


def test_block_arap_memory_scales_100k(mesh):
    """100k-vertex strip graph over 8 devices: per-device vertex state
    (block + halo) must be a small fraction of the replicated V x 3 state,
    and one sharded local-global iteration must execute."""
    import jax.numpy as jnp
    from multiviewstitch_tpu.parallel.arap_blocks import (
        build_blocks, arap_solve_blocks, per_device_state_bytes)

    # 1000 x 100 grid strip: contiguous row blocks have ~100-vertex cuts
    rows, cols = 1000, 100
    V = rows * cols
    yy, xx = np.mgrid[0:rows, 0:cols]
    v = np.stack([xx.ravel(), yy.ravel(), np.zeros(V)], -1).astype(
        np.float32) * 0.01
    idx = np.arange(V).reshape(rows, cols)
    e_h = np.stack([idx[:, :-1].ravel(), idx[:, 1:].ravel()], -1)
    e_v = np.stack([idx[:-1, :].ravel(), idx[1:, :].ravel()], -1)
    edges = np.concatenate([e_h, e_v]).astype(np.int32)
    w = np.ones(len(edges), np.float32)
    constrained = np.zeros(V, bool)
    constrained[idx[0]] = True       # pin the first row
    targets = np.where(constrained[:, None], v + np.array([0.05, 0, 0.02],
                                                          np.float32), 0.0)

    blocks = build_blocks(v, edges, w, constrained, targets, 8)
    per_dev = per_device_state_bytes(blocks)
    replicated = V * 3 * 4
    assert per_dev < replicated / 4, (per_dev, replicated)

    out = np.asarray(arap_solve_blocks(blocks, mesh=mesh, outer_iters=1,
                                       cg_iters=15))
    assert out.shape == (V, 3)
    assert np.isfinite(out).all()
    # pinned row moved to its target; far rows barely move in 1 iteration
    np.testing.assert_allclose(out[idx[0]], np.asarray(targets)[idx[0]],
                               atol=1e-5)
