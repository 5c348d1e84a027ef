"""Multi-sequence TSDF fusion in the reference frame: two transformed
copies of the same scene must fuse into ONE clean surface."""

import numpy as np
import jax.numpy as jnp
import pytest

from multiviewstitch_tpu.core.transforms import Similarity, inverse
from multiviewstitch_tpu.ops.tsdf import fuse_multi_sequence, reconstruct
from multiviewstitch_tpu.pipeline.fixtures import make_scene

pytestmark = pytest.mark.slow


def test_two_sequence_fusion_single_surface():
    gt = Similarity(jnp.asarray(1.3, jnp.float32),
                    jnp.asarray(np.array(
                        [[0.9689124, 0.0, 0.24740396],
                         [0.0, 1.0, 0.0],
                         [-0.24740396, 0.0, 0.9689124]], np.float32)),
                    jnp.asarray([0.12, -0.06, 0.18], jnp.float32))
    base = make_scene(n_frames=5, width=96, height=72, bumps=0.0,
                      n_lat=48, n_lon=64, arc_deg=120.0)
    moved = make_scene(n_frames=5, width=96, height=72, bumps=0.0,
                       n_lat=48, n_lon=64, arc_deg=120.0, transform=gt)

    # seq "base" maps into the reference (moved) frame via gt; seq "moved"
    # IS the reference frame
    verts, faces, tsdf = fuse_multi_sequence(
        [base.disparity, moved.disparity],
        [base.cams, moved.cams],
        [gt, Similarity.identity()],
        grid=96, min_dsp=1e-3, max_dsp=10.0)

    assert len(verts) > 800
    # the fused surface is the moved scene's sphere: center gt.t,
    # radius 0.5*1.3
    c = np.asarray(gt.t)
    r = np.linalg.norm(verts - c, axis=1)
    assert abs(np.median(r) - 0.65) < 0.03
    assert (np.abs(r - 0.65) < 0.08).mean() > 0.85


def test_fusion_covers_more_than_single_sequence():
    # partial arcs: each sequence sees only one side; fusion sees both
    gt = Similarity.identity()
    a = make_scene(n_frames=4, width=96, height=72, bumps=0.0,
                   n_lat=48, n_lon=64, arc_deg=60.0)
    # second rig on the opposite side of the object
    b = make_scene(n_frames=4, width=96, height=72, bumps=0.0,
                   n_lat=48, n_lon=64, arc_deg=60.0, arc_center_deg=180.0)
    cams_b, disp_b = b.cams, b.disparity

    v1, f1, t1 = reconstruct(a.disparity, a.cams, grid=80,
                             min_dsp=1e-3, max_dsp=10.0)
    vf, ff, tf = fuse_multi_sequence(
        [a.disparity, disp_b], [a.cams, cams_b],
        [gt, gt], grid=80, min_dsp=1e-3, max_dsp=10.0)
    # rig a looks from +x, rig b from -x: the single-sequence surface is
    # (mostly) the x>0 hemisphere; the fused surface covers both sides
    far_single = (v1[:, 0] < -0.2).mean()
    far_fused = (vf[:, 0] < -0.2).mean()
    assert far_fused > far_single + 0.1
    assert far_fused > 0.2
