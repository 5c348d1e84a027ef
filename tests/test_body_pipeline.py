"""BASELINE config-4 shape: body-scan sequence -> reconstruction ->
part-recognition-gated template alignment -> ARAP fit (16 views)."""

import numpy as np
import jax.numpy as jnp
import pytest

from multiviewstitch_tpu.models.template_body import (make_template,
                                                      pose_template)
from multiviewstitch_tpu.models.parts import part_recog
from multiviewstitch_tpu.ops.rasterizer import render_sequence
from multiviewstitch_tpu.ops.tsdf import reconstruct
from multiviewstitch_tpu.pipeline.fixtures import ring_cameras
from multiviewstitch_tpu.pipeline.deform_render import deform_stage
from multiviewstitch_tpu.solvers.unionfind import retain_largest_component

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def body_scan():
    """A posed, scaled body 'scan': the template posed + similarity-mapped,
    rendered from 16 ring cameras at body height, reconstructed."""
    tv, tf, tl = make_template()
    posed = pose_template(tv, tl, arm_angle_deg=15.0)
    s_gt = 1.08
    t_gt = np.array([0.1, 0.0, -0.05], np.float32)
    scan_gt = (s_gt * posed + t_gt).astype(np.float32)

    center = scan_gt.mean(0)
    cams = ring_cameras(16, radius=2.8, width=128, img_height=160,
                        look_at=tuple(center.tolist()),
                        height=float(center[1]))
    disp = np.asarray(render_sequence(
        jnp.asarray(scan_gt), jnp.asarray(tf), jnp.ones(len(tf), bool),
        cams, height=160, width=128))

    scan_v, scan_f, _ = reconstruct(disp, cams, grid=128,
                                    min_dsp=1e-3, max_dsp=10.0)
    scan_v, scan_f, _ = retain_largest_component(scan_v, scan_f)
    return (tv, tf, tl), (scan_v, scan_f), scan_gt, (s_gt, t_gt), cams


def test_scan_reconstruction(body_scan):
    (tv, tf, tl), (scan_v, scan_f), scan_gt, _, cams = body_scan
    assert len(scan_v) > 3000
    # reconstructed points lie near the GT body surface
    d = []
    for c in range(0, len(scan_v), 4096):
        blk = scan_v[c:c + 4096]
        d2 = ((blk[:, None, :] - scan_gt[None]) ** 2).sum(-1)
        d.append(np.sqrt(d2.min(1)))
    rmse = float(np.sqrt((np.concatenate(d) ** 2).mean()))
    assert rmse < 0.06, rmse


def test_part_recognition_on_scan(body_scan):
    (tv, tf, tl), (scan_v, scan_f), scan_gt, (s_gt, t_gt), cams = body_scan
    # align-free label sanity: transfer labels from the GT-aligned template
    labels = part_recog(scan_gt, tl, scan_v)
    # the scan's top region is labeled head, the bottom legs/feet
    top = scan_v[:, 1] > np.percentile(scan_v[:, 1], 95)
    bot = scan_v[:, 1] < np.percentile(scan_v[:, 1], 5)
    assert (labels[top] == 0).mean() > 0.6           # HEAD
    assert np.isin(labels[bot], (9, 10, 12, 13)).mean() > 0.6  # shank/foot


def test_full_body_fit(body_scan):
    (tv, tf, tl), (scan_v, scan_f), scan_gt, (s_gt, t_gt), cams = body_scan
    res = deform_stage(tv, tf, tl, scan_v, scan_f,
                       view_ray=np.array([0.0, 0.0, 1.0]),
                       deform_passes=2)

    def rms_to(pts, ref):
        out = []
        for c in range(0, len(pts), 2048):
            blk = pts[c:c + 2048]
            d2 = ((blk[:, None, :] - ref[None]) ** 2).sum(-1)
            out.append(np.sqrt(d2.min(1)))
        return float(np.sqrt((np.concatenate(out) ** 2).mean()))

    fit_rms = rms_to(res.vertices, scan_v)
    # template is ~1.8m; the fitted surface must sit within ~4cm RMS of
    # the scan after rigid+limb alignment and two ARAP passes
    assert fit_rms < 0.045, fit_rms


def test_scan_mesh_render_control(body_scan):
    """CONTROL (VERDICT r4 weak #5b): rendering the SCAN mesh back through
    the render chain must overlap the measured foreground nearly fully
    (the scan mesh IS the measured depth, so any chain error would show
    here) — which isolates template-render overlap deficits as template
    thinness rather than SRT/render-chain error."""
    from multiviewstitch_tpu.core.transforms import Similarity
    from multiviewstitch_tpu.pipeline.deform_render import render_stage

    (tv, tf, tl), (scan_v, scan_f), scan_gt, _, cams = body_scan
    disp = np.asarray(render_sequence(
        jnp.asarray(scan_gt), jnp.asarray(tf), jnp.ones(len(tf), bool),
        cams, height=160, width=128))
    metrics = {}
    render_stage(jnp.asarray(scan_v), jnp.asarray(scan_f),
                 [Similarity.identity()], [cams],
                 measured_disparity=[disp], metrics=metrics)
    assert metrics["measured_overlap"] > 0.9, metrics
    assert metrics["render_coverage"] > 0.01, metrics
