import numpy as np
import jax
import jax.numpy as jnp

from multiviewstitch_tpu.ops.poisson import reconstruct_poisson
from multiviewstitch_tpu.pipeline.fixtures import uv_sphere
from multiviewstitch_tpu.ops.mesh_normals import vertex_normals
from multiviewstitch_tpu.solvers.essential import (remove_outliers_essential,
                                                   rays_from_pixels,
                                                   _eight_point,
                                                   _epipolar_err)


def test_poisson_sphere():
    v, f = uv_sphere(40, 56, radius=0.5)
    n = np.asarray(vertex_normals(jnp.asarray(v), jnp.asarray(f)))
    verts, faces = reconstruct_poisson(v, n, depth=6, cg_iters=200)
    assert len(verts) > 300 and len(faces) > 300
    r = np.linalg.norm(verts, axis=1)
    assert abs(np.median(r) - 0.5) < 0.05
    assert (np.abs(r - 0.5) < 0.1).mean() > 0.9


def make_two_view(n=100, outliers=0, seed=0):
    """Two cameras with relative pose (R,t); returns rays + pixels."""
    rng = np.random.default_rng(seed)
    K = np.array([[150.0, 0, 80.0], [0, 150.0, 60.0], [0, 0, 1]])
    pts = rng.uniform(-0.5, 0.5, size=(n, 3))
    pts[:, 2] += 3.0
    ang = 0.15
    R = np.array([[np.cos(ang), 0, np.sin(ang)], [0, 1, 0],
                  [-np.sin(ang), 0, np.cos(ang)]])
    t = np.array([0.3, 0.05, 0.0])
    p1 = pts
    p2 = (R @ pts.T).T + t
    uv1 = np.stack([K[0, 0] * p1[:, 0] / p1[:, 2] + K[0, 2],
                    K[1, 1] * p1[:, 1] / p1[:, 2] + K[1, 2]], -1)
    uv2 = np.stack([K[0, 0] * p2[:, 0] / p2[:, 2] + K[0, 2],
                    K[1, 1] * p2[:, 1] / p2[:, 2] + K[1, 2]], -1)
    if outliers:
        uv2[:outliers] += rng.uniform(20, 60, size=(outliers, 2))
    r1 = rays_from_pixels(jnp.asarray(uv1, jnp.float32), jnp.asarray(K))
    r2 = rays_from_pixels(jnp.asarray(uv2, jnp.float32), jnp.asarray(K))
    return r1, r2, jnp.asarray(uv1, jnp.float32), jnp.asarray(uv2,
                                                              jnp.float32)


def test_eight_point_exact_epipolar():
    r1, r2, uv1, uv2 = make_two_view(8)
    E = _eight_point(r1, r2)
    err = np.asarray(_epipolar_err(E, r1, r2))
    assert err.max() < 1e-4


def test_essential_ransac_keeps_inliers():
    n, n_out = 120, 30
    r1, r2, uv1, uv2 = make_two_view(n, outliers=n_out, seed=1)
    mask, E, err = remove_outliers_essential(
        r1, r2, uv1, uv2, jnp.ones(n, bool), jax.random.key(0),
        iters=64, pixel_err=0.003)
    m = np.asarray(mask)
    assert m[n_out:].mean() > 0.9       # inliers kept
    assert m[:n_out].mean() < 0.1       # outliers dropped


def test_essential_ransac_area_scoring_runs():
    # reference-faithful experimental scoring: API parity smoke test (the
    # criterion itself degenerates on synthetic data, as it did upstream)
    n = 60
    r1, r2, uv1, uv2 = make_two_view(n, seed=2)
    mask, E, err = remove_outliers_essential(
        r1, r2, uv1, uv2, jnp.ones(n, bool), jax.random.key(1),
        iters=32, pixel_err=0.3, score="area")
    assert np.asarray(mask).sum() >= 2
    assert np.isfinite(float(err))
