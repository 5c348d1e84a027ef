import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multiviewstitch_tpu.core import cameras as C
from multiviewstitch_tpu.core.cameras import CameraBatch


def make_camera(n=1, w=64, h=48, seed=0):
    rng = np.random.default_rng(seed)
    K = np.zeros((n, 3, 3), np.float32)
    K[:, 0, 0] = 50.0
    K[:, 1, 1] = 52.0
    K[:, 0, 2] = (w - 1) / 2.0
    K[:, 1, 2] = (h - 1) / 2.0
    K[:, 2, 2] = 1.0
    Rs = []
    for _ in range(n):
        A = rng.normal(size=(3, 3))
        Q, _ = np.linalg.qr(A)
        if np.linalg.det(Q) < 0:
            Q[:, 0] *= -1
        Rs.append(Q)
    R = np.stack(Rs).astype(np.float32)
    t = rng.normal(size=(n, 3)).astype(np.float32) * 0.1
    return CameraBatch(jnp.asarray(K), jnp.asarray(R), jnp.asarray(t), w, h)


def test_world_cam_roundtrip():
    cam = make_camera()[0]
    pts = jnp.asarray(np.random.default_rng(1).normal(size=(100, 3)),
                      jnp.float32)
    pc = C.world_to_cam(cam, pts)
    back = C.cam_to_world(cam, pc)
    np.testing.assert_allclose(np.asarray(back), np.asarray(pts), atol=1e-5)


def test_project_unproject_roundtrip():
    cam = make_camera()[0]
    rng = np.random.default_rng(2)
    uv = jnp.asarray(rng.uniform(0, 48, size=(200, 2)), jnp.float32)
    depth = jnp.asarray(rng.uniform(0.5, 3.0, size=(200,)), jnp.float32)
    pts = C.unproject(cam, uv, depth)
    uv2, z = C.project(cam, pts)
    np.testing.assert_allclose(np.asarray(uv2), np.asarray(uv), atol=1e-3)
    np.testing.assert_allclose(np.asarray(z), np.asarray(depth), atol=1e-4)


def test_unproject_depth_map_valid_mask():
    cam = make_camera(w=16, h=12)[0]
    disp = np.full((12, 16), 0.5, np.float32)
    disp[0, 0] = 0.0       # below min
    disp[5, 5] = 2.0       # above max
    pts, valid = C.unproject_depth_map(cam, jnp.asarray(disp),
                                       min_dsp=0.01, max_dsp=1.0)
    valid = np.asarray(valid)
    assert not valid[0, 0] and not valid[5, 5]
    assert valid.sum() == 12 * 16 - 2
    # valid points are at depth 2 (1/0.5) in front of the camera
    pc = C.world_to_cam(cam, pts)
    np.testing.assert_allclose(np.asarray(pc[1, 1, 2]), 2.0, atol=1e-5)


def test_act_roundtrip(tmp_path):
    cam = make_camera(n=4)
    p = str(tmp_path / "cal.act")
    C.save_act(p, cam, start=0, step=1)
    cam2 = C.load_act(p)
    assert len(cam2) == 4
    assert (cam2.width, cam2.height) == (cam.width, cam.height)
    np.testing.assert_allclose(np.asarray(cam2.R), np.asarray(cam.R), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cam2.t), np.asarray(cam.t), atol=1e-5)
    np.testing.assert_allclose(np.asarray(cam2.K), np.asarray(cam.K), atol=1e-4)


def test_camera_centers_and_rays():
    cam = make_camera(n=3)
    Ctr = np.asarray(cam.centers())
    R = np.asarray(cam.R)
    t = np.asarray(cam.t)
    for i in range(3):
        np.testing.assert_allclose(Ctr[i], -R[i].T @ t[i], atol=1e-6)
    rays = np.asarray(cam.view_rays())
    np.testing.assert_allclose(rays, R[:, 2, :], atol=1e-7)


def test_batched_project_vmap_consistency():
    cams = make_camera(n=5)
    pts = jnp.asarray(np.random.default_rng(3).normal(size=(5, 7, 3)) +
                      np.array([0, 0, 3.0]), jnp.float32)
    # batched: cam batch B=[5], points [5,7,3] -> expand cam over points dim
    def one(i):
        uv, z = C.project(cams[i], pts[i])
        return uv, z
    uv_loop = np.stack([np.asarray(one(i)[0]) for i in range(5)])
    cam_exp = CameraBatch(cams.K[:, None], cams.R[:, None], cams.t[:, None],
                          cams.width, cams.height)
    uv_b, _ = C.project(cam_exp, pts)
    np.testing.assert_allclose(np.asarray(uv_b), uv_loop, atol=1e-4)
