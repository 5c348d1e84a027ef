import os

import pytest
import numpy as np
import jax.numpy as jnp

from multiviewstitch_tpu.core.transforms import Similarity
from multiviewstitch_tpu.io.srt import save_srt, load_srt
from multiviewstitch_tpu.ops.depth_refine import refine_depth
from multiviewstitch_tpu.pipeline.deform_render import render_stage
from multiviewstitch_tpu.pipeline.fixtures import make_scene, uv_sphere

pytestmark = pytest.mark.slow


def test_srt_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    Ts = []
    for i in range(3):
        A = rng.normal(size=(3, 3))
        Q, _ = np.linalg.qr(A)
        Ts.append(Similarity(jnp.asarray(1.0 + i * 0.1, jnp.float32),
                             jnp.asarray(Q, jnp.float32),
                             jnp.asarray(rng.normal(size=3), jnp.float32)))
    p = str(tmp_path / "SRT.txt")
    save_srt(p, Ts)
    out = load_srt(p)
    assert len(out) == 3
    for a, b in zip(Ts, out):
        np.testing.assert_allclose(float(a.s), float(b.s), rtol=1e-6)
        np.testing.assert_allclose(np.asarray(a.R), np.asarray(b.R),
                                   atol=1e-6)
        np.testing.assert_allclose(np.asarray(a.t), np.asarray(b.t),
                                   atol=1e-6)


def test_depth_refine_fills_holes_keeps_data():
    n, h, w = 2, 32, 40
    d_meas = np.full((n, h, w), 0.25, np.float32)
    d_meas[:, 10:20, 10:20] = 0.0          # hole
    d_model = np.full((n, h, w), 0.27, np.float32)
    out = np.asarray(refine_depth(jnp.asarray(d_meas), jnp.asarray(d_model),
                                  lam_model=0.5, lam_smooth=0.1, iters=150))
    # measured regions stay close to measurement (weight 1 vs 0.5)
    assert abs(out[0, 2, 2] - 0.25) < 0.01
    # holes are filled from the model + smoothness (between 0.25 and 0.27)
    assert 0.24 < out[0, 15, 15] < 0.28
    assert out[0, 15, 15] > 0.25  # pulled toward model in the hole


def test_depth_refine_both_invalid_stays_zero():
    d = np.zeros((1, 8, 8), np.float32)
    out = np.asarray(refine_depth(jnp.asarray(d), jnp.asarray(d)))
    assert (out == 0).all()


def test_render_stage_roundtrip(tmp_path):
    # render a known sphere through identity transform; disparity must match
    # the fixture renderer's output
    scene = make_scene(n_frames=2, width=96, height=72, bumps=0.0,
                       n_lat=48, n_lon=64)
    rm = {}
    outs = render_stage(scene.vertices, scene.faces,
                        [Similarity.identity()], [scene.cams],
                        out_dirs=[str(tmp_path)],
                        measured_disparity=[scene.disparity], metrics=rm)
    got = outs[0]
    ref = scene.disparity
    both = (got > 0) & (ref > 0)
    assert both.mean() > 0.05
    # coverage metric floors (VERDICT r3 item 8): the render must cover
    # the frame substantially and nearly all of the measured foreground
    assert rm["render_coverage"] > 0.05, rm
    assert rm["measured_overlap"] > 0.9, rm
    np.testing.assert_allclose(got[both], ref[both], rtol=1e-3)
    assert os.path.exists(str(tmp_path / "DATA" / "Render" / "_depth0.raw"))


def test_cli_demo_align(tmp_path):
    from multiviewstitch_tpu.cli import main
    rc = main(["align", "--demo", "--workdir", str(tmp_path), "--grid",
               "64"])
    assert rc == 0
    assert os.path.exists(str(tmp_path / "Result" / "SRT.txt"))
    assert os.path.exists(str(tmp_path / "Result" / "Model.obj"))
    assert os.path.exists(str(tmp_path / "Result" / "PSR.npts"))
    # SRT.txt: 2 sequences; transform 0 recovers the demo similarity scale
    Ts = load_srt(str(tmp_path / "Result" / "SRT.txt"))
    assert len(Ts) == 2
    assert abs(float(Ts[0].s) - 1.25) < 0.1
    assert float(Ts[1].s) == 1.0


def test_cli_knobs_change_output(tmp_path):
    """The four previously-dead reference knobs are observable end to end:
    --backend poisson (PsnDpt* reconstruction path), --write-mesh
    (per-frame Depth2Model dumps), --set all_seq_proj=true (AllSeqProj
    trim), and PsnDptMax driving the default grid."""
    from multiviewstitch_tpu.cli import main
    from multiviewstitch_tpu.io.meshio import read_obj

    base = tmp_path / "base"
    rc = main(["align", "--demo", "--workdir", str(base), "--grid", "64"])
    assert rc == 0
    v_base, _, _ = read_obj(str(base / "Result" / "Model.obj"))

    # poisson backend produces a different (but valid) reconstruction
    pois = tmp_path / "pois"
    rc = main(["align", "--demo", "--workdir", str(pois),
               "--backend", "poisson", "--set", "psn_dpt_max=6"])
    assert rc == 0
    v_p, _, f_p = read_obj(str(pois / "Result" / "Model.obj"))
    assert len(v_p) > 100 and len(f_p) > 100
    assert len(v_p) != len(v_base)

    # WriteMesh dumps one OBJ per (sequence, frame)
    wm = tmp_path / "wm"
    rc = main(["align", "--demo", "--workdir", str(wm), "--grid", "64",
               "--write-mesh"])
    assert rc == 0
    dumps = sorted((wm / "Models").glob("model*_*.obj"))
    assert len(dumps) == 10  # 2 sequences x 5 demo frames
    mv, _, mf = read_obj(str(dumps[0]))
    assert len(mv) > 0 and len(mf) > 0

    # AllSeqProj trims vertices that fall outside any sequence's cameras
    asp = tmp_path / "asp"
    rc = main(["align", "--demo", "--workdir", str(asp), "--grid", "64",
               "--set", "all_seq_proj=true"])
    assert rc == 0
    v_t, _, _ = read_obj(str(asp / "Result" / "Model.obj"))
    assert len(v_t) <= len(v_base)
