import numpy as np
import jax.numpy as jnp
import pytest

from multiviewstitch_tpu.ops.tsdf import fuse_tsdf, surface_nets, reconstruct
from multiviewstitch_tpu.solvers.unionfind import (UnionFind,
                                                   retain_largest_component,
                                                   largest_point_component)
from multiviewstitch_tpu.pipeline.fixtures import make_scene


@pytest.fixture(scope="module")
def sphere_scene():
    return make_scene(n_frames=8, width=128, height=96, bumps=0.0,
                      n_lat=48, n_lon=64)


def test_tsdf_sign_structure(sphere_scene):
    scene = sphere_scene
    origin = jnp.asarray([-0.7, -0.7, -0.7])
    spacing = jnp.asarray(1.4 / 63)
    t = fuse_tsdf(jnp.asarray(scene.disparity), scene.cams, origin, spacing,
                  grid=64, min_dsp=1e-3, max_dsp=10.0)
    v = np.asarray(t.values)
    w = np.asarray(t.weights)
    g = np.arange(64)
    zz, yy, xx = np.meshgrid(g, g, g, indexing="ij")
    pts = np.asarray(origin) + float(spacing) * np.stack([xx, yy, zz], -1)
    r = np.linalg.norm(pts, axis=-1)
    # voxels just inside the r=0.5 sphere and observed -> negative
    inside = (r < 0.45) & (r > 0.35) & (w > 0)
    outside = (r > 0.55) & (r < 0.65) & (w > 0)
    assert inside.sum() > 100 and outside.sum() > 100
    assert (v[inside] < 0).mean() > 0.9
    assert (v[outside] > 0).mean() > 0.9


def test_reconstruct_sphere_geometry(sphere_scene):
    scene = sphere_scene
    verts, faces, tsdf = reconstruct(scene.disparity, scene.cams, grid=96,
                                     min_dsp=1e-3, max_dsp=10.0)
    assert len(verts) > 1000
    assert len(faces) > 1000
    r = np.linalg.norm(verts, axis=1)
    # extracted surface lies on the unit-0.5 sphere
    assert abs(np.median(r) - 0.5) < 0.02
    assert (np.abs(r - 0.5) < 0.05).mean() > 0.9
    # faces index valid vertices
    assert faces.min() >= 0 and faces.max() < len(verts)


def test_reconstruct_watertight_largest_component(sphere_scene):
    scene = sphere_scene
    verts, faces, _ = reconstruct(scene.disparity, scene.cams, grid=64,
                                  min_dsp=1e-3, max_dsp=10.0)
    v2, f2, _ = retain_largest_component(verts, faces)
    # sphere is one component; trim keeps almost everything
    assert len(f2) > 0.9 * len(faces)
    # every vertex used
    assert f2.max() < len(v2)


def test_union_find_basics():
    uf = UnionFind(6)
    uf.union(0, 1)
    uf.union(1, 2)
    uf.union(4, 5)
    assert uf.find(0) == uf.find(2)
    assert uf.find(3) != uf.find(0)
    assert uf.prominent() == uf.find(0)


def test_retain_largest_component_two_blobs():
    # two triangles sharing nothing: keep the 2-triangle component
    verts = np.array([[0, 0, 0], [1, 0, 0], [0, 1, 0], [1, 1, 0],
                      [5, 5, 5], [6, 5, 5], [5, 6, 5]], np.float32)
    faces = np.array([[0, 1, 2], [1, 3, 2], [4, 5, 6]], np.int32)
    v2, f2, _ = retain_largest_component(verts, faces)
    assert len(f2) == 2 and len(v2) == 4


def test_largest_point_component():
    pts = np.concatenate([
        np.random.default_rng(0).normal(size=(50, 3)) * 0.05,
        np.array([[5.0, 5, 5]]) +
        np.random.default_rng(1).normal(size=(10, 3)) * 0.05])
    mask = largest_point_component(pts, radius=0.5)
    assert mask[:50].all() and not mask[50:].any()
