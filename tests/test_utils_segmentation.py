import os

import numpy as np
import jax.numpy as jnp

from multiviewstitch_tpu.ops.segmentation import (segment_foreground,
                                                  foreground_from_disparity,
                                                  trim_mesh_by_all_cameras)
from multiviewstitch_tpu.core.transforms import Similarity
from multiviewstitch_tpu.pipeline.fixtures import make_scene
from multiviewstitch_tpu.utils.metrics import (MetricsLogger,
                                               point_to_surface_rmse,
                                               trajectory_ate)
from multiviewstitch_tpu.utils import debug_artifacts as da


def test_segment_foreground_bright_object():
    h, w = 60, 80
    img = np.zeros((h, w), np.float32) + 0.1
    img += np.random.default_rng(0).normal(size=(h, w)).astype(np.float32) \
        * 0.01
    img[20:40, 30:55] = 0.9  # bright foreground inside the rect
    mask = np.asarray(segment_foreground(jnp.asarray(img), hl=0.1, hr=0.1,
                                         vl=0.1, vr=0.1))
    assert mask[25:35, 35:50].mean() > 0.9
    assert mask[:5].mean() == 0.0        # outside rect = background


def test_foreground_from_disparity():
    d = np.zeros((2, 4, 4), np.float32)
    d[0, 1, 1] = 0.3
    m = np.asarray(foreground_from_disparity(jnp.asarray(d), 0.1, 1.0))
    assert m[0, 1, 1] and m.sum() == 1


def test_trim_mesh_by_all_cameras():
    scene = make_scene(n_frames=6, width=96, height=72, bumps=0.0,
                       n_lat=32, n_lon=48)
    verts = scene.vertices
    faces = scene.faces
    # append a far-away vertex cluster that no camera sees within bounds
    far = np.array([[50.0, 50.0, 50.0], [50.2, 50, 50], [50, 50.2, 50]],
                   np.float32)
    v2 = np.concatenate([verts, far])
    f2 = np.concatenate([faces,
                         np.asarray([[len(verts), len(verts) + 1,
                                      len(verts) + 2]], np.int32)])
    out_v, out_f, _ = trim_mesh_by_all_cameras(
        v2, f2, None, [Similarity.identity()], [scene.cams])
    assert len(out_v) <= len(verts)      # far cluster dropped
    assert len(out_v) > 0.5 * len(verts)
    assert out_f.max() < len(out_v)


def test_metrics_logger(tmp_path):
    p = str(tmp_path / "metrics.jsonl")
    ml = MetricsLogger(p, echo=False)
    ml.log("match", count=42, residual=1.5)
    with ml.timed("stage2"):
        pass
    lines = open(p).read().strip().splitlines()
    assert len(lines) == 2
    import json
    rec = json.loads(lines[0])
    assert rec["stage"] == "match" and rec["count"] == 42.0


def test_point_to_surface_rmse():
    surf = np.random.default_rng(0).normal(size=(500, 3)).astype(np.float32)
    assert point_to_surface_rmse(surf[:100], surf) == 0.0
    off = surf[:100] + np.array([0.1, 0, 0], np.float32)
    # rmse bounded by the offset magnitude
    assert 0 < point_to_surface_rmse(off, surf) <= 0.11


def test_trajectory_ate_invariant_to_similarity():
    rng = np.random.default_rng(1)
    gt = rng.normal(size=(10, 3))
    ang = 0.7
    R = np.array([[np.cos(ang), -np.sin(ang), 0],
                  [np.sin(ang), np.cos(ang), 0], [0, 0, 1]])
    est = 2.0 * (R @ gt.T).T + np.array([1, 2, 3])
    assert trajectory_ate(est, gt) < 1e-6
    est_noisy = est + rng.normal(size=est.shape) * 0.05
    assert 0.01 < trajectory_ate(est_noisy, gt) < 0.2


def test_debug_artifacts(tmp_path):
    g = np.random.default_rng(2).normal(size=(30, 40)).astype(np.float32)
    uv = np.asarray([[5, 5], [20, 10]], np.int32)
    da.save_keypoint_overlay(str(tmp_path / "kp.png"), g, uv)
    da.save_match_visualization(str(tmp_path / "match.png"), g, g, uv, uv)
    da.save_depth_image(str(tmp_path / "d.png"), np.abs(g))
    da.save_mesh(str(tmp_path / "m.obj"), np.eye(3),
                 faces=np.asarray([[0, 1, 2]]))
    files = os.listdir(tmp_path)
    assert any(f.startswith("kp") for f in files)
    assert any(f.startswith("match") for f in files)
    assert "m.obj" in files
