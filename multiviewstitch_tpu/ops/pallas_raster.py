"""Pallas rasterizer kernels for the small/mid face bulk — the round-5
VMEM-tile ATTEMPT (VERDICT r4 item 1), kept as measured, oracle-tested
design explorations. OUTCOME (v5e, VGA@100k faces, quiet-host same-process
A/B): xla tile passes 12.6 ms vs pallas face-order 15.7 vs pallas
sorted-strips 18.8 — the XLA path stays production (_auto_impl). The
decisive lever found during the hunt was NOT a kernel at all: gating the
scatter ladder's per-rung compactions behind their class-occupancy cond
(rasterizer.gated_pass) removed ~6 ms of cumsum+element-scatter scaffolding
and took the XLA path from 18.8 to 12.6. The kernels document why the
obvious Pallas designs lose here:

  - sorted-strips (below): the kernel itself runs the bbox<15 bulk in
    ~4 ms — faster than any XLA pass — but its XLA-side grouping costs
    5.7 ms of device sort (600k keys is NOT free; the round-4 "sort is
    ~free" probe was 400k and loop-hoisted) plus 6.3 ms of random 64B
    row gathers, 3x the kernel.
  - face-order (raster_faces): no sort, no gather, z-buffer resident in
    VMEM — but the sequential per-face loop floors at ~120 cycles/face
    of scalar addressing + dynamic-offset RMW overhead (12.8 ms at
    100k), insensitive to the vector work inside (8/16/24-row windows
    and low-register incremental eval moved it <1 ms; a paired
    two-faces-per-record variant was SLOWER at 19.1 — doubled in-flight
    eval state doubled the VREG spills).

The round-4 XLA tile-local pass (ops/rasterizer._raster_tiled) made the
small-face bulk scatter-free but still paid for (a) 4 unconditional
candidate-tile evaluations per face and (b) one [256]-lane row scatter-max
per candidate into the [T+1,256] tile buffer. The strip kernel removes
both:

  1. XLA side: every face with bbox < `cls` emits its actually-touched
     (face, 8x128-image-strip) candidates (<=3 row-strips x <=2
     col-strips; invalid slots get a sentinel id). One device sort by
     strip id groups candidates (sort of ~600k keys is ~free on TPU —
     CLAUDE round-4 probe), a row gather + transpose packs face records
     into sorted candidate-major columns, and `searchsorted` yields
     per-strip [start,end) ranges.
  2. Pallas: the grid walks image strips; each program owns ONE (8,128)
     output block — exactly one f32 VPU tile — as its z-buffer in VMEM
     and double-buffer-DMAs its candidate range from HBM in chunks of
     `chunk` records. The eval lays CANDIDATES ON LANES and the strip's
     1024 PIXELS ON SUBLANES: each field is a [1,chunk] sublane-row
     slice broadcast down (free), each pixel coordinate a [1024,1]
     column broadcast across (free), so the [1024,chunk] edge/disparity
     planes evaluate with ZERO relayouts. (The first cut put candidates
     on the batch dim — every field access was a sublane-scalar ->
     whole-tile broadcast relayout, and measured 26.4 ms vs the XLA
     path's 19.4.) The accumulator [1024,chunk] folds per chunk with an
     elementwise max and reduces over lanes ONCE per strip; the z-test
     never touches a scatter — grouping replaced it.

Face records carry the raw projected vertices (u0,v0,u1,v1,u2,v2), the
premultiplied disparity-plane coefficients iz_k/denom, and the winding
sign, so the in-kernel edge functions use the same operand order as the
XLA passes and the brute-force oracle tests.

Reference contract: Model2Depth/Model2Depth.cpp:118-156 (GL z-buffer ->
eye-space 1/z disparity); this kernel covers the bbox<15 bulk, the
scatter ladder (ops/rasterizer.py) keeps rendering the big-face tail.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_SH = 8         # strip rows (f32 sublane tile)
_SW = 128       # strip cols (lane tile)
_P = _SH * _SW  # pixels per strip
_NF = 16        # record fields (10 used; row count of the [16,NC] layout)


def _strip_kernel(nsx: int, chunk: int,
                  off_ref, rec_ref, out_ref, scratch, sems):
    """One image strip: z-max its candidate range into the (8,128) block."""
    i = pl.program_id(0)
    base = off_ref[i]
    end = off_ref[i + 1]
    sy = i // nsx
    sx = i % nsx
    # strip pixel p = r*_SW + c on sublanes: px/py as [P,1] columns
    ii = jax.lax.broadcasted_iota(jnp.int32, (_P, 1), 0)
    px = (sx * _SW + ii % _SW).astype(jnp.float32)
    py = (sy * _SH + ii // _SW).astype(jnp.float32)

    # chunk starts stay 128-lane aligned for the dynamic DMA offset
    cstart = pl.multiple_of((base // _SW) * _SW, _SW)
    nch = (end - cstart + chunk - 1) // chunk

    def dma(slot, k):
        return pltpu.make_async_copy(
            rec_ref.at[:, pl.ds(cstart + k * chunk, chunk)],
            scratch.at[slot], sems.at[slot])

    @pl.when(nch > 0)
    def _():
        dma(0, 0).start()

    lane = jax.lax.broadcasted_iota(jnp.int32, (1, chunk), 1)

    def body(k, acc):
        slot = jax.lax.rem(k, 2)

        @pl.when(k + 1 < nch)
        def _():
            dma(jax.lax.rem(k + 1, 2), k + 1).start()

        dma(slot, k).wait()
        rec = scratch[slot]                              # [16, chunk]
        ridx = (cstart + k * chunk) + lane               # [1, chunk]
        valid = (ridx >= base) & (ridx < end)

        def fld(j):
            return rec[j:j + 1, :]                       # [1, chunk]

        u0, v0, u1, v1 = fld(0), fld(1), fld(2), fld(3)
        u2, v2 = fld(4), fld(5)
        # same operand order as rasterizer._raster_pass / the oracle;
        # [1,chunk] x [P,1] -> [P,chunk] with only free broadcasts
        e0 = (u1 - u0) * (py - v0) - (v1 - v0) * (px - u0)
        e1 = (u2 - u1) * (py - v1) - (v2 - v1) * (px - u1)
        e2 = (u0 - u2) * (py - v2) - (v0 - v2) * (px - u2)
        sgn = fld(9)
        emin = jnp.minimum(sgn * e0, jnp.minimum(sgn * e1, sgn * e2))
        disp = e1 * fld(6) + e2 * fld(7) + e0 * fld(8)
        hit = valid & (emin >= 0) & (disp > 0)
        return jnp.maximum(acc, jnp.where(hit, disp, 0.0))

    acc = jax.lax.fori_loop(
        0, nch, body, jnp.zeros((_P, chunk), jnp.float32))
    out_ref[:] = jnp.max(acc, axis=1).reshape(_SH, _SW)


@partial(jax.jit, static_argnames=("h", "w", "cls", "chunk", "interpret"))
def raster_strips(uvz, faces, face_ok, *, h: int, w: int, cls: int = 15,
                  chunk: int = 128, interpret: bool = False):
    """Rasterize every valid face with bbox < `cls` (must be <= 113 so the
    column span stays within 2 strips) into an [h,w] disparity image.

    Returns (disparity [h,w] f32, handled [F] bool); faces NOT handled
    (bbox >= cls or invalid) are the caller's (scatter ladder's) job.
    """
    assert cls <= _SW - 14, "column span must fit 2 strips"
    nf = faces.shape[0]
    u, v, invz = uvz[:, 0], uvz[:, 1], uvz[:, 2]
    f = faces
    ua, va, za = u[f], v[f], invz[f]                     # [F,3]
    minu, maxu = jnp.min(ua, 1), jnp.max(ua, 1)
    minv, maxv = jnp.min(va, 1), jnp.max(va, 1)
    bw = (jnp.clip(maxu, 0, w - 1) - jnp.clip(minu, 0, w - 1))
    bh = (jnp.clip(maxv, 0, h - 1) - jnp.clip(minv, 0, h - 1))
    bb = jnp.maximum(bw, bh)

    area = ((ua[:, 1] - ua[:, 0]) * (va[:, 2] - va[:, 0]) -
            (va[:, 1] - va[:, 0]) * (ua[:, 2] - ua[:, 0]))
    nondeg = jnp.abs(area) > 1e-12
    handled = face_ok & nondeg & (bb < cls)
    denom = jnp.where(nondeg, area, 1.0)
    sgn = jnp.where(area >= 0, 1.0, -1.0)

    rec = jnp.zeros((nf, _NF), jnp.float32)
    rec = rec.at[:, 0].set(ua[:, 0]).at[:, 1].set(va[:, 0])
    rec = rec.at[:, 2].set(ua[:, 1]).at[:, 3].set(va[:, 1])
    rec = rec.at[:, 4].set(ua[:, 2]).at[:, 5].set(va[:, 2])
    rec = rec.at[:, 6].set(za[:, 0] / denom)
    rec = rec.at[:, 7].set(za[:, 1] / denom)
    rec = rec.at[:, 8].set(za[:, 2] / denom)
    rec = rec.at[:, 9].set(sgn)

    nsy = -(-h // _SH)
    nsx = -(-w // _SW)
    S = nsy * nsx
    nrs = (cls - 2) // _SH + 2          # row-strip slots (3 for cls=15)
    ncs = 2                              # col-strip slots

    ty0 = jnp.floor(minv / _SH).astype(jnp.int32)
    ty1 = jnp.floor(maxv / _SH).astype(jnp.int32)
    tx0 = jnp.floor(minu / _SW).astype(jnp.int32)
    tx1 = jnp.floor(maxu / _SW).astype(jnp.int32)
    ids = []
    for dy in range(nrs):
        ty = ty0 + dy
        okr = handled & (ty <= ty1) & (ty >= 0) & (ty < nsy)
        for dx in range(ncs):
            tx = tx0 + dx
            ok = okr & (tx <= tx1) & (tx >= 0) & (tx < nsx)
            ids.append(jnp.where(ok, ty * nsx + tx, S))
    ids = jnp.stack(ids, 1).reshape(-1)                  # [F*nslots]
    order = jnp.argsort(ids)
    sorted_ids = ids[order]
    # row gather into sorted candidate order, then transpose to the
    # field-major [16, NC] layout the kernel's lane-parallel eval wants;
    # DMA chunks may run past the last strip's end: pad with zeros
    rec_sorted = rec[order // (nrs * ncs)].T             # [16, F*nslots]
    rec_sorted = jnp.concatenate(
        [rec_sorted, jnp.zeros((_NF, chunk + _SW), jnp.float32)], axis=1)
    offsets = jnp.searchsorted(sorted_ids,
                               jnp.arange(S + 1, dtype=jnp.int32)
                               ).astype(jnp.int32)

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(S,),
        in_specs=[pl.BlockSpec(memory_space=pltpu.ANY)],
        out_specs=pl.BlockSpec((_SH, _SW),
                               lambda i, off: (i // nsx, i % nsx)),
        scratch_shapes=[pltpu.VMEM((2, _NF, chunk), jnp.float32),
                        pltpu.SemaphoreType.DMA((2,))],
    )
    img = pl.pallas_call(
        partial(_strip_kernel, nsx, chunk),
        out_shape=jax.ShapeDtypeStruct((nsy * _SH, nsx * _SW), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(offsets, rec_sorted)
    return img[:h, :w], handled




def _face_kernel(wrows_by_flag, rec_ref, img_ref):
    """Sequential per-face z-max into the VMEM-resident whole image.

    rec block [16, C] sits in SMEM (the kernel consumes it as scalars at
    dynamic face indices, which lane-tiled VMEM cannot serve); the whole
    padded image is ONE out block revisited by every grid step, so it
    stays resident in VMEM and flushes once at the end.

    This face-order design replaces the sorted-candidate variant's XLA
    prep (5.7 ms device sort + 6.3 ms random 64B row gathers per VGA
    frame at 100k faces, 3x its own kernel time): records stream
    sequentially; grouping is unnecessary because the z-buffer lives
    on-chip. Window classes 8/16/24 rows keep live vector registers low
    (a (16,128) eval with all three edge planes live spilled VREGs; the
    edge terms here fold into emin/disp immediately and die). A paired
    two-faces-per-record variant measured SLOWER (19.1 vs 12.8 ms:
    doubling the in-flight eval doubled the spills), so one face per
    iteration it is."""
    k = pl.program_id(0)

    @pl.when(k == 0)
    def _():
        img_ref[:] = jnp.zeros_like(img_ref)

    C = rec_ref.shape[1]

    def eval_strip(i, cs, y0, wrows):
        py = (y0 + jax.lax.broadcasted_iota(
            jnp.int32, (wrows, _SW), 0)).astype(jnp.float32)
        px = (cs * _SW + jax.lax.broadcasted_iota(
            jnp.int32, (wrows, _SW), 1)).astype(jnp.float32)
        sgn = rec_ref[9, i]
        u0 = rec_ref[0, i]
        v0 = rec_ref[1, i]
        u1 = rec_ref[2, i]
        v1 = rec_ref[3, i]
        # incremental fold: each edge plane feeds emin/disp and dies
        # (same per-edge operand order as rasterizer._raster_pass)
        e = (u1 - u0) * (py - v0) - (v1 - v0) * (px - u0)      # e0
        emin = sgn * e
        disp = e * rec_ref[8, i]                               # c2*e0
        u2 = rec_ref[4, i]
        v2 = rec_ref[5, i]
        e = (u2 - u1) * (py - v1) - (v2 - v1) * (px - u1)      # e1
        emin = jnp.minimum(emin, sgn * e)
        disp = disp + e * rec_ref[6, i]                        # c0*e1
        e = (u0 - u2) * (py - v2) - (v0 - v2) * (px - u2)      # e2
        emin = jnp.minimum(emin, sgn * e)
        disp = disp + e * rec_ref[7, i]                        # c1*e2
        contrib = jnp.where((emin >= 0) & (disp > 0), disp, 0.0)
        win = img_ref[pl.ds(y0, wrows), pl.ds(cs * _SW, _SW)]
        img_ref[pl.ds(y0, wrows), pl.ds(cs * _SW, _SW)] = \
            jnp.maximum(win, contrib)

    def face(i, _):
        flag = rec_ref[13, i]

        def strips(wrows):
            y0 = pl.multiple_of(rec_ref[10, i].astype(jnp.int32), 8)
            cs = rec_ref[11, i].astype(jnp.int32)
            eval_strip(i, cs, y0, wrows)

            @pl.when(rec_ref[12, i] > 0)        # column-seam straddle
            def _():
                eval_strip(i, cs + 1, y0, wrows)

        for fl, wrows in wrows_by_flag:
            @pl.when(flag == float(fl))
            def _(wrows=wrows):
                strips(wrows)

        return 0

    jax.lax.fori_loop(0, C, face, 0)


@partial(jax.jit, static_argnames=("h", "w", "cls", "chunk", "interpret"))
def raster_faces(uvz, faces, face_ok, *, h: int, w: int, cls: int = 15,
                 chunk: int = 512, interpret: bool = False):
    """Face-order Pallas rasterizer for bbox < `cls` (<= 113): whole-image
    VMEM z-buffer + sequential per-face windowed RMW (see _face_kernel).
    Returns (disparity [h,w] f32, handled [F] bool); unhandled faces are
    the caller's (scatter ladder's) job."""
    assert cls <= _SW - 14, "column span must fit 2 strips"
    nf = faces.shape[0]
    u, v, invz = uvz[:, 0], uvz[:, 1], uvz[:, 2]
    f = faces
    ua, va, za = u[f], v[f], invz[f]                     # [F,3]
    minu, maxu = jnp.min(ua, 1), jnp.max(ua, 1)
    minv, maxv = jnp.min(va, 1), jnp.max(va, 1)
    bw = (jnp.clip(maxu, 0, w - 1) - jnp.clip(minu, 0, w - 1))
    bh = (jnp.clip(maxv, 0, h - 1) - jnp.clip(minv, 0, h - 1))
    bb = jnp.maximum(bw, bh)

    area = ((ua[:, 1] - ua[:, 0]) * (va[:, 2] - va[:, 0]) -
            (va[:, 1] - va[:, 0]) * (ua[:, 2] - ua[:, 0]))
    nondeg = jnp.abs(area) > 1e-12
    handled = face_ok & nondeg & (bb < cls)
    denom = jnp.where(nondeg, area, 1.0)
    sgn = jnp.where(area >= 0, 1.0, -1.0)

    nsx = -(-w // _SW)
    # window classes: 8-aligned anchor; flag 1 -> the face fits one
    # (8,128) sublane tile (the bulk: ~half of <7px faces), flag 2 ->
    # (16,128) covers any bbox<7 face, flag 3 -> (24,128) any bbox<15.
    wrows_mid = (cls - 1 + 7) // 8 * 8 + 8
    hp = -(-h // 8) * 8 + wrows_mid                      # clamp headroom
    y0a = jnp.clip((jnp.floor(minv).astype(jnp.int32) // 8) * 8,
                   0, hp - wrows_mid)
    small = bb < 7.0
    fits8 = small & (maxv < (y0a + 8).astype(jnp.float32)) & (minv >= 0)
    cs0 = jnp.clip(jnp.floor(minu / _SW).astype(jnp.int32), 0, nsx - 1)
    cs1 = jnp.floor(maxu / _SW).astype(jnp.int32)
    straddle = (cs1 > cs0) & (cs1 < nsx)
    offscreen = (maxu < 0) | (minu > w - 1) | (maxv < 0) | (minv > h - 1)
    handled = handled & ~offscreen
    flag = jnp.where(
        handled,
        jnp.where(fits8, 1.0, jnp.where(small, 2.0, 3.0)), 0.0)

    rec = jnp.stack([
        ua[:, 0], va[:, 0], ua[:, 1], va[:, 1], ua[:, 2], va[:, 2],
        za[:, 0] / denom, za[:, 1] / denom, za[:, 2] / denom, sgn,
        y0a.astype(jnp.float32), cs0.astype(jnp.float32),
        straddle.astype(jnp.float32), flag,
        jnp.zeros((nf,), jnp.float32), jnp.zeros((nf,), jnp.float32),
    ])                                                   # [16, F]
    pad = (-nf) % chunk
    if pad:
        rec = jnp.concatenate(
            [rec, jnp.zeros((_NF, pad), jnp.float32)], axis=1)
    nch = rec.shape[1] // chunk

    img = pl.pallas_call(
        partial(_face_kernel, ((1, 8), (2, 16), (3, wrows_mid))),
        out_shape=jax.ShapeDtypeStruct((hp, nsx * _SW), jnp.float32),
        grid=(nch,),
        in_specs=[pl.BlockSpec((_NF, chunk), lambda k: (0, k),
                               memory_space=pltpu.SMEM)],
        out_specs=pl.BlockSpec((hp, nsx * _SW), lambda k: (0, 0)),
        interpret=interpret,
    )(rec)
    return img[:h, :w], handled
