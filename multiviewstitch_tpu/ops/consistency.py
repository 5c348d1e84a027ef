"""Cross-view depth-consistency filtering.

TPU-native re-design of Processor::CheckConsistency[Core]
(Processor.cpp:29-115): the reference walks every pixel of every frame in
serial C++ (O(h*w*refs) scalar loop), unprojects it, reprojects into the ±1
neighbor frames, and zeroes the disparity unless the round trip lands within
``reproj_err`` pixels and the neighbor pixel is itself valid. Here the whole
sequence is one fused jitted op over ``[N,H,W]`` disparity tensors — the
per-pixel loop becomes batched gathers + elementwise math on the VPU.

Semantics match the reference exactly:
  - pixel valid iff disparity ∈ [min_dsp, max_dsp]   (Processor.cpp:79)
  - neighbor sampling is nearest (int round)          (Camera.cpp:46-49)
  - a pixel is killed if, for ANY existing neighbor: its projection leaves
    the neighbor image, the neighbor pixel is invalid, the round-trip
    reprojection leaves the current image, or the round-trip pixel error
    exceeds ``reproj_err``                            (Processor.cpp:82-108)
  - neighbors that don't exist (sequence ends) don't participate
                                                      (Processor.cpp:49-55)
"""

from __future__ import annotations

from functools import partial
from typing import Sequence, Tuple

import jax
import jax.numpy as jnp

from ..core.cameras import CameraBatch, project, unproject, pixel_grid


def _use_mxu_gather() -> bool:
    """The banded one-hot-matmul gather wins on TPU (XLA's scalar gather
    path is ~12ns/element there); on CPU the plain gather is faster.
    MVS_DISABLE_MXU_GATHER=1 forces the plain path (e.g. for quick compile
    checks — the banded program takes minutes through a remote compiler)."""
    import os as _os
    if _os.environ.get("MVS_DISABLE_MXU_GATHER") == "1":
        return False
    import jax as _jax
    return _jax.default_backend() in ("tpu", "axon")


def _gather_px(img2d, vy, vx):
    """img [H,W] sampled at integer (vy [H,W], vx [H,W]) -> (vals, ok).

    On TPU this is the banded MXU gather WITHOUT the exact patch-up: a
    pixel whose target row leaves its band window (violent depth outlier)
    comes back ok=False and the consistency/agreement tests treat it as
    invalid — the conservative direction for both users of this helper.
    It runs in "split2" precision (hi/lo bf16 decomposition, relative error
    <= ~2^-17 = 1e-5): the gathered disparities feed threshold tests with
    ~1e-2 tolerances, so the rounding is immaterial while costing ~2.5x
    less than the bit-exact 3-pass mode (0.12 vs 0.29 ms per VGA gather,
    v5e; see ops/gather2d.py).
    """
    h, w = img2d.shape
    if _use_mxu_gather():
        from .gather2d import gather_image_banded
        return gather_image_banded(img2d, vy, vx, mode="split2")
    vals = img2d[jnp.clip(vy, 0, h - 1), jnp.clip(vx, 0, w - 1)]
    return vals, jnp.ones_like(vy, bool)


def _gather_px_frames(imgs, vy, vx, window_rows: int = 24):
    """Per-frame image gather: imgs [N,H,W] sampled at (vy, vx) [N,Ho,Wo]
    within each frame -> (vals, ok). Ho/Wo may differ from H/W (strided
    query grids).

    ``window_rows`` bounds each 8-row output band's source window — the
    MXU passes scale with it, and the round-5 profile put ~4 ms of the
    7.45 ms consistency stage in ONE full-res gather at the old default
    48. The window must cover the band's intra-band target-row spread:
    ~8-10 rows for unstrided consumers (consistency passes 16), ~8*stride
    + margin for strided ones (sampling passes 8*stride+16). Misses stay
    conservative (masked invalid); the accuracy ladder measured
    bit-identical at 16 vs 48 on the sphere fixture.

    TPU path: ONE banded gather on the frame-stacked [N*H, W] image with
    row indices offset by n*H. Bands (8 rows) never span frames when H is
    a multiple of 8 (VGA is), and the per-pixel row targets stay inside
    their own frame, so this is exactly the per-frame gather — WITHOUT
    vmapping the banded kernel over frames, which lowered the per-band
    window slices to a scalar gather path (measured ~0.5 ms per VGA frame
    vmapped vs 0.07 ms stacked on v5e)."""
    n, h, w = imgs.shape
    ho, wo = vy.shape[-2:]
    if _use_mxu_gather() and ho % 8 == 0:
        import os as _os
        from .gather2d import gather_image_banded
        off = (jnp.arange(n, dtype=jnp.int32) * h)[:, None, None]
        # MVS_GATHER_WINDOW overrides for A/B runs
        wr = int(_os.environ.get("MVS_GATHER_WINDOW", str(window_rows)))
        vals, ok = gather_image_banded(
            imgs.reshape(n * h, w),
            (jnp.clip(vy, 0, h - 1) + off).reshape(n * ho, wo),
            vx.reshape(n * ho, wo), mode="split2", window_rows=wr)
        return vals.reshape(n, ho, wo), ok.reshape(n, ho, wo)
    return jax.vmap(_gather_px)(imgs, vy, vx)


def _round_px(x):
    """C++ ``(int)(x + 0.5)`` for the in-bounds positive coords we test."""
    return jnp.floor(x + 0.5).astype(jnp.int32)


def _offset_check(pts, cam_pix: CameraBatch, uv, ndisp, ncams: CameraBatch,
                  *, min_dsp, max_dsp, reproj_err):
    """Round-trip consistency test of every pixel against ONE neighbor
    assignment (Processor.cpp:82-108): project current-frame world points
    [N,H,W,3] into the neighbor cameras, nearest-sample the neighbor
    disparity, unproject, reproject back, threshold the pixel error.
    Shared by the fused sequence op below and the window-sharded variant
    (parallel/view_windows.py). Returns ok [N,H,W]."""
    h, w = ndisp.shape[-2:]
    ncams_pix = CameraBatch(ncams.K[:, None, None], ncams.R[:, None, None],
                            ncams.t[:, None, None], ncams.width,
                            ncams.height)

    # project current-frame points into the neighbor camera
    uvn, zn = project(ncams_pix, pts)
    un, vn = _round_px(uvn[..., 0]), _round_px(uvn[..., 1])
    inb1 = (un >= 0) & (un <= w - 1) & (vn >= 0) & (vn <= h - 1) & (zn > 0)

    # nearest-sample the neighbor disparity (clipped gather; masked later)
    uc = jnp.clip(un, 0, w - 1)
    vc = jnp.clip(vn, 0, h - 1)
    dn, gok = _gather_px_frames(ndisp, vc, uc, window_rows=16)
    ref_valid = (dn >= min_dsp) & (dn <= max_dsp) & gok

    # round trip: unproject the neighbor pixel, project into current cam
    uvn_f = jnp.stack([uc, vc], -1).astype(ndisp.dtype)
    ptsn = unproject(ncams_pix, uvn_f, 1.0 / jnp.where(ref_valid, dn, 1.0))
    uvb, zb = project(cam_pix, ptsn)
    ub, vb = _round_px(uvb[..., 0]), _round_px(uvb[..., 1])
    inb2 = (ub >= 0) & (ub <= w - 1) & (vb >= 0) & (vb <= h - 1)

    du = (uv[None, ..., 0].astype(jnp.int32) - ub).astype(ndisp.dtype)
    dv = (uv[None, ..., 1].astype(jnp.int32) - vb).astype(ndisp.dtype)
    err_ok = du * du + dv * dv <= reproj_err * reproj_err
    return inb1 & ref_valid & inb2 & err_ok


@partial(jax.jit, static_argnames=("offsets", "min_dsp", "max_dsp",
                                   "reproj_err"))
def check_consistency(
    disparity: jnp.ndarray,          # [N,H,W] float32
    cams: CameraBatch,               # batch N
    *,
    min_dsp: float,
    max_dsp: float,
    reproj_err: float,
    offsets: Tuple[int, ...] = (-1, 1),
) -> jnp.ndarray:
    """Filter a sequence of disparity maps by cross-view consistency.

    Returns [N,H,W] disparities with inconsistent pixels set to 0
    (the reference's convention for "invalid", Processor.cpp:84-105).
    """
    n, h, w = disparity.shape
    valid = (disparity >= min_dsp) & (disparity <= max_dsp)

    # world point of every pixel of every frame: [N,H,W,3]
    uv = pixel_grid(h, w, disparity.dtype)
    depth = 1.0 / jnp.where(valid, disparity, 1.0)
    cam_pix = CameraBatch(cams.K[:, None, None], cams.R[:, None, None],
                          cams.t[:, None, None], cams.width, cams.height)
    pts = unproject(cam_pix, uv[None], depth)

    keep = valid
    for off in offsets:
        nbr = jnp.clip(jnp.arange(n) + off, 0, n - 1)
        exists = ((jnp.arange(n) + off >= 0) &
                  (jnp.arange(n) + off < n))[:, None, None]
        ncams = CameraBatch(cams.K[nbr], cams.R[nbr], cams.t[nbr],
                            cams.width, cams.height)
        ok = _offset_check(pts, cam_pix, uv, disparity[nbr], ncams,
                           min_dsp=min_dsp, max_dsp=max_dsp,
                           reproj_err=reproj_err)
        keep = keep & jnp.where(exists, ok, True)

    return jnp.where(keep, disparity, 0.0)


def consistency_stats(before: jnp.ndarray, after: jnp.ndarray,
                      min_dsp: float, max_dsp: float):
    """Per-sequence metrics: valid fraction before/after filtering."""
    v0 = ((before >= min_dsp) & (before <= max_dsp)).mean()
    v1 = ((after >= min_dsp) & (after <= max_dsp)).mean()
    return {"valid_before": float(v0), "valid_after": float(v1)}
