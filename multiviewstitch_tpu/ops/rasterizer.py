"""On-device depth rasterizer (the reference's Model2Depth, GL-free).

Re-design of Model2Depth.{h,cpp}: the reference renders the deformed mesh
with fixed-function OpenGL per (sequence, frame), reads back the z-buffer
and stores eye-space disparity ``1/z_e`` rasters (RenderDepth,
Model2Depth.cpp:118-156, z formula 134-140). That needs a GLUT window and a
GPU context; here rasterization is fully on-device ("Model2Depth
re-rendering fused on-device" per BASELINE's north star):

  1. project vertices through the pinhole camera (continuous pixel coords)
  2. the small-face bulk (bbox < `tile`) renders SCATTER-FREE through a
     sort-binned tile pass (_raster_tiled): one device sort bins faces to
     ts x ts image tiles, row-gathers pack each tile's face records, and
     the z-test is a dense masked max over the tile's pixels on the VPU
     — TPU scatters run on the scalar path at ~6 ns/element and were 77
     of the round-3 80 ms/frame
  3. bigger faces walk a compacted scatter-max tile ladder with spill
     chaining; edge-function coverage + screen-space linear interpolation
     of 1/z everywhere (exact perspective-correct disparity).

Faces larger than `tile_large` (close-up cameras — the reference's GL
path rasterizes any triangle, Model2Depth.cpp:58-79) are COMPACTED into a
fixed-capacity buffer and rasterized with full-frame coverage in a final
pass, so they render exactly; only faces beyond `overflow_capacity` are
counted in `overflow` (round-2 verdict: a counter alone silently dropped
geometry). Output matches the reference's convention: disparity 1/z_cam,
0 = no hit.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.cameras import CameraBatch, world_to_cam


class RenderResult(NamedTuple):
    disparity: jnp.ndarray   # [H,W] f32, 0 where empty
    overflow: jnp.ndarray    # scalar i32: faces too large for tile_large


def _raster_pass(uvz, faces, face_ok, h, w, tile, zbuf, chunk):
    """Scatter-max one pass of triangles with bboxes <= tile px."""
    nf = faces.shape[0]
    u = uvz[:, 0]
    v = uvz[:, 1]
    invz = uvz[:, 2]

    # pad face count to a multiple of chunk with invalid faces
    pad = (-nf) % chunk
    faces = jnp.concatenate(
        [faces, jnp.zeros((pad, 3), faces.dtype)], axis=0)
    face_ok = jnp.concatenate(
        [face_ok, jnp.zeros((pad,), face_ok.dtype)], axis=0)
    faces = faces.reshape(-1, chunk, 3)
    face_ok = face_ok.reshape(-1, chunk)

    dy, dx = jnp.meshgrid(jnp.arange(tile, dtype=jnp.float32),
                          jnp.arange(tile, dtype=jnp.float32), indexing="ij")
    offs = jnp.stack([dx.ravel(), dy.ravel()], axis=-1)     # [tile*tile, 2]

    def body(zb, inp):
        f, ok = inp                                        # [C,3], [C]
        ua = u[f]                                          # [C,3]
        va = v[f]
        za = invz[f]
        # tile anchored at the image-clipped bbox corner (offscreen extents
        # don't cost coverage; fully-offscreen faces drop via the pixel mask)
        x0 = jnp.clip(jnp.floor(jnp.min(ua, axis=1)), 0, w - 1)
        y0 = jnp.clip(jnp.floor(jnp.min(va, axis=1)), 0, h - 1)
        # pixel centers covered by this face's tile
        px = x0[:, None] + offs[None, :, 0]                # [C,T]
        py = y0[:, None] + offs[None, :, 1]

        # edge functions e(a,b,p) = cross(b-a, p-a), either winding
        def edge(ax, ay, bx, by, px_, py_):
            return (bx - ax)[:, None] * (py_ - ay[:, None]) - \
                   (by - ay)[:, None] * (px_ - ax[:, None])

        e0 = edge(ua[:, 0], va[:, 0], ua[:, 1], va[:, 1], px, py)
        e1 = edge(ua[:, 1], va[:, 1], ua[:, 2], va[:, 2], px, py)
        e2 = edge(ua[:, 2], va[:, 2], ua[:, 0], va[:, 0], px, py)
        area = ((ua[:, 1] - ua[:, 0]) * (va[:, 2] - va[:, 0]) -
                (va[:, 1] - va[:, 0]) * (ua[:, 2] - ua[:, 0]))[:, None]
        inside = jnp.where(
            area >= 0,
            (e0 >= 0) & (e1 >= 0) & (e2 >= 0),
            (e0 <= 0) & (e1 <= 0) & (e2 <= 0))
        denom = jnp.where(jnp.abs(area) < 1e-12, 1.0, area)
        w0 = e1 / denom                                   # weight of vertex 0
        w1 = e2 / denom
        w2 = e0 / denom
        # screen-space linear interp of 1/z == perspective-correct disparity
        disp = w0 * za[:, 0:1] + w1 * za[:, 1:2] + w2 * za[:, 2:3]

        okpix = (inside & ok[:, None] &
                 (jnp.abs(area) > 1e-12) &
                 (px >= 0) & (px <= w - 1) & (py >= 0) & (py <= h - 1) &
                 (disp > 0))
        idx = (py.astype(jnp.int32) * w + px.astype(jnp.int32))
        idx = jnp.where(okpix, idx, h * w)                # OOB -> dropped
        zb = zb.at[idx.ravel()].max(disp.ravel(), mode="drop")
        return zb, None

    zbuf, _ = jax.lax.scan(body, zbuf, (faces, face_ok))
    return zbuf


def _raster_pass_fullframe(uvz, faces, face_ok, h, w, zbuf, chunk):
    """Full-frame coverage per face: for the (compacted, few) faces whose
    bbox exceeds tile_large, every pixel of the image is tested — exact
    for arbitrarily large triangles at O(capacity/chunk) scan steps."""
    u = uvz[:, 0]
    v = uvz[:, 1]
    invz = uvz[:, 2]
    pad = (-faces.shape[0]) % chunk
    if pad:
        faces = jnp.concatenate([faces, jnp.zeros((pad, 3), faces.dtype)])
        face_ok = jnp.concatenate([face_ok, jnp.zeros((pad,),
                                                      face_ok.dtype)])
    faces = faces.reshape(-1, chunk, 3)
    face_ok = face_ok.reshape(-1, chunk)
    py_full, px_full = jnp.meshgrid(jnp.arange(h, dtype=jnp.float32),
                                    jnp.arange(w, dtype=jnp.float32),
                                    indexing="ij")
    px_full = px_full.ravel()[None]                       # [1, H*W]
    py_full = py_full.ravel()[None]
    idx_full = jnp.arange(h * w, dtype=jnp.int32)[None]

    def body(zb, inp):
        f, ok = inp
        ua, va, za = u[f], v[f], invz[f]                  # [C,3]

        def edge(ax, ay, bx, by):
            return ((bx - ax)[:, None] * (py_full - ay[:, None]) -
                    (by - ay)[:, None] * (px_full - ax[:, None]))

        e0 = edge(ua[:, 0], va[:, 0], ua[:, 1], va[:, 1])
        e1 = edge(ua[:, 1], va[:, 1], ua[:, 2], va[:, 2])
        e2 = edge(ua[:, 2], va[:, 2], ua[:, 0], va[:, 0])
        area = ((ua[:, 1] - ua[:, 0]) * (va[:, 2] - va[:, 0]) -
                (va[:, 1] - va[:, 0]) * (ua[:, 2] - ua[:, 0]))[:, None]
        inside = jnp.where(
            area >= 0,
            (e0 >= 0) & (e1 >= 0) & (e2 >= 0),
            (e0 <= 0) & (e1 <= 0) & (e2 <= 0))
        denom = jnp.where(jnp.abs(area) < 1e-12, 1.0, area)
        disp = (e1 / denom * za[:, 0:1] + e2 / denom * za[:, 1:2] +
                e0 / denom * za[:, 2:3])
        okpix = (inside & ok[:, None] & (jnp.abs(area) > 1e-12) &
                 (disp > 0))
        idx = jnp.where(okpix, idx_full, h * w)
        zb = zb.at[idx.ravel()].max(disp.ravel(), mode="drop")
        return zb, None

    zbuf, _ = jax.lax.scan(body, zbuf, (faces, face_ok))
    return zbuf


def _raster_tiled(uvz, faces, face_ok, h, w, zbuf_flat, *,
                  ts: int = 16, chunk: int = 8192):
    """Tile-local rasterization for faces with bbox < ts (round 4).

    Replaces the per-face scatter-max sweep for the small-face bulk. TPU
    scatter-max of scalar PIXELS costs ~6 ns/element on the scalar unit
    (~77 of the round-3 80 ms/frame: every face paid its pass's full
    tile^2 slots), but on-chip probes show ROW scatters (aligned minor
    dim) and dense elementwise eval are ~free. So: each face emits its
    <=4 touched ts x ts image tiles (a face with bbox < ts overlaps at
    most 2x2 tiles); each (face, tile) candidate evaluates edge-function
    coverage + disparity over that tile's ts*ts pixel block and
    scatter-maxes ONE [ts*ts]-lane row into a [T+1, ts*ts] tile buffer
    (duplicate tile rows combine by the scatter's max). No sort, no
    per-tile capacity, no spill: work scales with face count, not tile
    occupancy, so silhouette-dense tiles (measured 2.7k faces/tile on
    the 100k-face sphere) cost the same as uniform ones. Candidates stay
    in face order, so face records need no gather at all.

    Returns (zbuf_flat updated via elementwise max, spill_mask [F] —
    always all-False; kept for the caller's ladder-chaining interface)."""
    nf = faces.shape[0]
    u, v, invz = uvz[:, 0], uvz[:, 1], uvz[:, 2]
    f = faces
    ua, va, za = u[f], v[f], invz[f]                      # [F,3]
    minu = jnp.min(ua, axis=1)
    minv = jnp.min(va, axis=1)
    maxu = jnp.max(ua, axis=1)
    maxv = jnp.max(va, axis=1)
    # visible-tile grid (ceil); faces fully offscreen get no valid tile
    ntx = -(-w // ts)
    nty = -(-h // ts)
    T = nty * ntx
    P = ts * ts

    tx0 = jnp.floor(minu / ts).astype(jnp.int32)
    ty0 = jnp.floor(minv / ts).astype(jnp.int32)
    tx1 = jnp.floor(maxu / ts).astype(jnp.int32)
    ty1 = jnp.floor(maxv / ts).astype(jnp.int32)

    def tile_id(ty, tx, extra_ok):
        ok = (face_ok & extra_ok & (tx >= 0) & (tx < ntx) &
              (ty >= 0) & (ty < nty))
        return jnp.where(ok, ty * ntx + tx, T)            # T = dropped row

    cands = [
        tile_id(ty0, tx0, jnp.ones_like(face_ok)),
        tile_id(ty0, tx1, tx1 != tx0),
        tile_id(ty1, tx0, ty1 != ty0),
        tile_id(ty1, tx1, (tx1 != tx0) & (ty1 != ty0)),
    ]                                                     # 4 x [F]

    dy, dx = jnp.meshgrid(jnp.arange(ts, dtype=jnp.float32),
                          jnp.arange(ts, dtype=jnp.float32), indexing="ij")
    dxr = dx.ravel()[None]                                # [1,P]
    dyr = dy.ravel()[None]

    # pad face count to a chunk multiple; padded rows carry tile T
    pad = (-nf) % chunk
    def padf(a, fill=0.0):
        return jnp.pad(a, ((0, pad),) + ((0, 0),) * (a.ndim - 1),
                       constant_values=fill)
    uaP, vaP, zaP = padf(ua), padf(va), padf(za)
    nrows = (nf + pad) // chunk

    def split(a):
        return a.reshape(nrows, chunk, *a.shape[1:])
    uaC, vaC, zaC = split(uaP), split(vaP), split(zaP)
    candC = [split(padf(c, T)) for c in cands]            # 4 x [R,chunk]

    zb2d = jnp.zeros((T + 1, P), jnp.float32)

    def body(zb, inp):
        au, av, az, t0, t1, t2, t3 = inp                  # [C,3] x3, [C] x4
        area = ((au[:, 1] - au[:, 0]) * (av[:, 2] - av[:, 0]) -
                (av[:, 1] - av[:, 0]) * (au[:, 2] - au[:, 0]))[:, None]
        denom = jnp.where(jnp.abs(area) < 1e-12, 1.0, area)
        rows, vals = [], []
        for tid in (t0, t1, t2, t3):
            px = ((tid % ntx) * ts).astype(jnp.float32)[:, None] + dxr
            py = ((tid // ntx) * ts).astype(jnp.float32)[:, None] + dyr

            def edge(i, j):
                return ((au[:, j] - au[:, i])[:, None] *
                        (py - av[:, i][:, None]) -
                        (av[:, j] - av[:, i])[:, None] *
                        (px - au[:, i][:, None]))

            e0 = edge(0, 1)
            e1 = edge(1, 2)
            e2 = edge(2, 0)                               # [C,P]
            inside = jnp.where(
                area >= 0,
                (e0 >= 0) & (e1 >= 0) & (e2 >= 0),
                (e0 <= 0) & (e1 <= 0) & (e2 <= 0))
            disp = (e1 / denom * az[:, 0:1] + e2 / denom * az[:, 1:2] +
                    e0 / denom * az[:, 2:3])
            okp = (inside & (jnp.abs(area) > 1e-12) & (disp > 0) &
                   (px <= w - 1) & (py <= h - 1))
            rows.append(jnp.minimum(tid, T))
            vals.append(jnp.where(okp, disp, 0.0))
        # one row scatter for all four candidate slots (round 5: four
        # separate scatter ops per scan step paid four op overheads)
        zb = zb.at[jnp.concatenate(rows)].max(
            jnp.concatenate(vals), mode="drop")
        return zb, None

    zb2d, _ = jax.lax.scan(
        body, zb2d, (uaC, vaC, zaC, *candC))
    # [T, P] -> padded image -> crop; then fold into the flat zbuf
    img = (zb2d[:T].reshape(nty, ntx, ts, ts).transpose(0, 2, 1, 3)
           .reshape(nty * ts, ntx * ts)[:h, :w])
    zbuf_flat = zbuf_flat.at[:h * w].max(img.ravel())
    return zbuf_flat, jnp.zeros((nf,), bool)


def _auto_impl() -> str:
    """The XLA tile passes stay production on every backend (round-5
    v5e A/B at VGA@100k faces, quiet host, one process: xla 12.6 ms vs
    pallas face-order 15.7 vs pallas sorted-strips 18.8 — after gating
    the ladder compactions the XLA path's scatter cost is no longer the
    bottleneck, while the Pallas kernels pay either ~120 cycles/face of
    sequential loop+RMW overhead or 12 ms of XLA-side sort+gather prep;
    see ops/pallas_raster.py for the measured design space)."""
    return "xla"


@partial(jax.jit, static_argnames=("height", "width", "tile", "tile_large",
                                   "chunk", "znear", "overflow_capacity",
                                   "mid_capacity", "impl"))
def render_disparity(
    vertices: jnp.ndarray,     # [V,3] world-space
    faces: jnp.ndarray,        # [F,3] int32 (padding rows: any id, masked)
    face_mask: jnp.ndarray,    # [F] bool
    cam: CameraBatch,          # single camera
    *,
    height: int,
    width: int,
    tile: int = 16,
    tile_large: int = 128,
    chunk: int = 2048,
    znear: float = 1e-4,
    overflow_capacity: int = 256,
    mid_capacity: int = 16384,
    impl: str | None = None,   # None=auto, "pallas", "xla"
) -> RenderResult:
    pc = world_to_cam(cam, vertices)                       # [V,3]
    z = pc[:, 2]
    zsafe = jnp.where(jnp.abs(z) < znear, znear, z)
    u = cam.fx * pc[:, 0] / zsafe + cam.cx
    v = cam.fy * pc[:, 1] / zsafe + cam.cy
    invz = jnp.where(z > znear, 1.0 / zsafe, 0.0)
    uvz = jnp.stack([u, v, invz], axis=-1)                 # [V,3]

    f = jnp.clip(faces, 0, vertices.shape[0] - 1)
    # cull faces with any vertex behind the near plane (the reference's GL
    # frustum similarly clips at znear, Model2Depth.cpp:100-116)
    zs = z[f]                                              # [F,3]
    ok = face_mask & jnp.all(zs > znear, axis=1)

    ua, va = u[f], v[f]
    bw = (jnp.clip(jnp.max(ua, axis=1), 0, width - 1) -
          jnp.clip(jnp.min(ua, axis=1), 0, width - 1))
    bh = (jnp.clip(jnp.max(va, axis=1), 0, height - 1) -
          jnp.clip(jnp.min(va, axis=1), 0, height - 1))
    bb = jnp.maximum(bw, bh)

    # Round 4: the small-face BULK renders through the sort-binned tiled
    # pass (_raster_tiled — no scatters; on-chip probes: sort/row-gather/
    # dense-eval are ~free while scatter-max costs ~6 ns/element, which
    # made the old t8 base sweep 77 of the 80 ms/frame). Larger classes
    # keep the round-3 compacted scatter ladder with SPILL CHAINING:
    # every class is COMPACTED to a fixed capacity behind a lax.cond (an
    # all-small mesh pays nothing), a class that overflows spills upward
    # (a t-tile pass is exact for any face with bbox < t-1), and only the
    # final full-frame pass counts drops. Tile-pass capacity overflows
    # spill into the first ladder rung the same way.
    zbuf = jnp.zeros((height * width + 1,), jnp.float32)
    base = max(tile, 8)
    if impl is None:
        impl = _auto_impl()
    if impl in ("pallas", "pallas_strips"):
        # round 5: the whole bbox < base-1 bulk renders through a Pallas
        # kernel; the scatter ladder below keeps the >= base-1 tail.
        # "pallas" = face-order kernel with the whole image resident in
        # VMEM (no sort, no gather); "pallas_strips" = the sorted-
        # candidate per-strip variant kept for A/B (its XLA-side sort +
        # record gather measured 12.5 of its 16.5 ms/frame).
        from .pallas_raster import raster_faces, raster_strips
        kern = raster_faces if impl == "pallas" else raster_strips
        img, _ = kern(
            uvz, f, ok, h=height, w=width, cls=base - 1,
            interpret=jax.default_backend() != "tpu")
        zbuf = zbuf.at[:height * width].max(img.ravel())
        spill0 = jnp.zeros((f.shape[0],), bool)
        spill_mid = spill0
    else:
        # ts=8 tiles for the finest class (bbox < 7): 64-pixel blocks per
        # candidate, 4x less dense-eval work than ts=16 (A/B on the 100k
        # 3-px-face sphere: 10.3 vs 14.5 ms). The mid class (7 <= bbox <
        # base-1) runs a COMPACTED, cond-gated ts=base tiled pass below,
        # so an all-small mesh pays nothing for it.
        zbuf, spill0 = _raster_tiled(uvz, f, ok & (bb < 7), height,
                                     width, zbuf, ts=8, chunk=16384)

    def compact(sel, cap):
        pos = jnp.cumsum(sel.astype(jnp.int32)) - 1
        slot = jnp.where(sel & (pos < cap), pos, cap)
        buf = jnp.zeros((cap + 1,), jnp.int32).at[slot].set(
            jnp.arange(f.shape[0], dtype=jnp.int32), mode="drop")
        filled = jnp.zeros((cap + 1,), bool).at[slot].set(True, mode="drop")
        spilled = sel & (pos >= cap)
        return f[buf[:cap]], filled[:cap], spilled

    def gated_pass(zbuf, sel, cap, run):
        # the COMPACTION lives inside the cond too (round 5): its cumsum
        # + two element scatters over [F] run on the scalar path and cost
        # ~1.5 ms/rung at 100k faces — an empty class must cost one
        # reduction, not a compaction (the ladder scaffolding was ~6 of
        # the 22.6 ms in the first Pallas A/B)
        def go(zb):
            fsel, oksel, spilled = compact(sel, cap)
            return run(zb, fsel, oksel), spilled

        def skip(zb):
            return zb, jnp.zeros_like(sel)

        return jax.lax.cond(sel.any(), go, skip, zbuf)

    if impl not in ("pallas", "pallas_strips"):
        # mid class through the tiled pass too (compacted + gated);
        # overflow beyond the cap spills to the scatter ladder like any
        # other class
        mid_cap = min(f.shape[0], mid_capacity)
        zbuf, spill_mid = gated_pass(
            zbuf, ok & (bb >= 7) & (bb < base - 1), mid_cap,
            lambda zb, fs, os_: _raster_tiled(uvz, fs, os_, height, width,
                                              zb, ts=base, chunk=8192)[0])

    ladder = []
    t = 2 * base
    while t < tile_large:
        ladder.append(t)
        t *= 2
    ladder.append(tile_large)
    spill = spill0 | spill_mid
    lower = bb < base - 1
    for t in ladder:
        cls = ok & ~lower & (bb < t - 1)
        lower = lower | (bb < t - 1)
        # equal worst-case index volume per gated pass: cap * t^2 ~ 8.4M
        cap = min(f.shape[0], max(512, (32768 * 256) // (t * t)))
        zbuf, spill = gated_pass(
            zbuf, cls | spill, cap,
            lambda zb, fs, os_, t=t: _raster_pass(
                uvz, fs, os_, height, width, t, zb,
                max((2048 * 256) // (t * t), 8)))
    # full-frame pass: exact for arbitrarily large triangles (the GL
    # reference renders any triangle)
    cap = max(overflow_capacity, 1)
    zbuf, spill = gated_pass(
        zbuf, (ok & ~lower) | spill, cap,
        lambda zb, fs, os_: _raster_pass_fullframe(uvz, fs, os_, height,
                                                   width, zb,
                                                   min(4, cap)))
    overflow = spill.sum().astype(jnp.int32)
    return RenderResult(zbuf[:height * width].reshape(height, width), overflow)


def render_sequence(vertices, faces, face_mask, cams: CameraBatch, *,
                    height: int, width: int, **kw):
    """Render all frames of a camera batch -> [N,H,W] disparities.

    Equivalent of the reference's per-frame GLUT loop over
    Model2Depth::RenderSence (Model2Depth.cpp:81-156). Uses lax.map (a
    scan), NOT vmap: under vmap the lax.cond gates around the compacted
    big-face passes batch into selects that execute BOTH branches, which
    reintroduces the empty-pass cost the gates exist to remove."""
    def one(krt):
        K, R, t = krt
        c = CameraBatch(K, R, t, width, height)
        return render_disparity(vertices, faces, face_mask, c,
                                height=height, width=width, **kw).disparity
    return jax.lax.map(one, (cams.K, cams.R, cams.t))
