"""Structured image gather: spatially-coherent 2D gathers on the MXU.

Every hot stage of this framework (cross-view consistency, multi-frame
agreement sampling, homography warps, SSD windows) needs
``out[y,x] = src[iy[y,x], ix[y,x]]`` with *spatially coherent* index fields
(smooth reprojection/warp maps). XLA lowers such gathers to a scalar
per-element path on TPU (~12 ns/element measured — SURVEY perf note), which
made the front-end ~100x slower than the hardware allows.

This module reformulates the gather as dense math the MXU/VPU like:

  1. split the output into row bands; each band reads a WY-row source
     window whose base row is the band's min(iy) (computed with a cheap
     XLA reduce — indices are data-dependent but coherent)
  2. within a band: one-hot(ix) [P, W] @ window^T [W, WY] -> tmp [P, WY]
     (a real matmul — the "gather" runs on the MXU at matmul speed;
     one-hot entries are exact 1.0 so selection is bit-exact)
  3. select the row with a WY-wide masked sum on the VPU (no gather).

Pixels whose iy falls outside their band's window (violent depth edges,
window too small) are reported in a mask; callers either enlarge WY or
fall back to the XLA gather for those pixels (`gather_image` does this
automatically so results are ALWAYS exact).
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp


@partial(jax.jit, static_argnames=("band_rows", "window_rows",
                                   "tile_cols", "window_cols", "mode"))
def gather_image_banded(src: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray,
                        *, band_rows: int = 8, window_rows: int = 48,
                        tile_cols: int = 1 << 30,
                        window_cols: int = 1 << 30,
                        mode: str = "exact"):
    """Banded + column-tiled MXU gather.

    src [H,W] float; iy/ix [Ho,Wo] int32 (any values; out-of-src-bounds
    handled). Returns (values [Ho,Wo], in_window [Ho,Wo] bool). Values for
    pixels with in_window=False are 0 and must be patched by the caller.

    Tiles are (band_rows x tile_cols) output pixels; each reads a source
    window of window_rows rows centered on the band's MEAN target row
    (mean, not median: median = full sort, slow on TPU; a few wild pixels
    shift the mean by at most k*H/P rows and become the misses instead of
    evicting the tile). With tile_cols/window_cols set, columns tile
    STATICALLY: tile tx reads the fixed window around its own columns —
    measured v5e: split2 full-width 0.32 ms vs col-tiled (128/256) 0.28 ms
    per VGA gather, i.e. the op is not MAC-bound at these shapes, so
    full-width stays the default and the tiled mode is available for
    larger widths. (Round 1's DYNAMIC per-tile xbase windows were slower
    than full-width; that path is replaced by the static tiling.)
    """
    H, W = src.shape
    Ho, Wo = iy.shape
    window_rows = min(window_rows, H)
    window_cols = min(window_cols, W)
    tile_cols = min(tile_cols, Wo)
    pad_rows = (-Ho) % band_rows
    pad_cols = (-Wo) % tile_cols
    if pad_rows or pad_cols:
        # edge padding: zero-padded indices would drag the tile means and
        # evict real pixels from their windows
        iy = jnp.pad(iy, ((0, pad_rows), (0, pad_cols)), mode="edge")
        ix = jnp.pad(ix, ((0, pad_rows), (0, pad_cols)), mode="edge")
    nb = iy.shape[0] // band_rows
    nt = iy.shape[1] // tile_cols
    P = band_rows * tile_cols

    def tilefy(a):
        return a.reshape(nb, band_rows, nt, tile_cols).transpose(
            0, 2, 1, 3).reshape(nb, nt, P)

    iy_cl = jnp.clip(tilefy(iy), 0, H - 1)
    ix_cl = jnp.clip(tilefy(ix), 0, W - 1)

    static_cols = nt > 1 and window_cols < W
    if static_cols:
        # one row window per BAND (all column tiles share it)
        ybase = jnp.clip(
            jnp.mean(iy_cl.astype(jnp.float32), axis=(1, 2))
            .astype(jnp.int32) - window_rows // 2,
            0, max(H - window_rows, 0))[:, None]                # [nb,1]
        ybase = jnp.broadcast_to(ybase, (nb, nt))
    else:
        ybase = jnp.clip(jnp.mean(iy_cl.astype(jnp.float32), axis=2)
                         .astype(jnp.int32) - window_rows // 2,
                         0, max(H - window_rows, 0))            # [nb,nt]

    rel_y = iy_cl - ybase[:, :, None]
    in_win = (rel_y >= 0) & (rel_y < window_rows)
    rel_y = jnp.clip(rel_y, 0, window_rows - 1)

    if static_cols:
        # STATIC column tiling: output-column tile tx reads the fixed
        # source window [tx*tile - pad, tx*tile + tile + pad) (source
        # zero-padded at the borders) — the windows are static slices of
        # the dynamically row-sliced band, so the narrower one-hot costs
        # no extra dynamic slicing. (Round 1 tried DYNAMIC per-tile xbase
        # windows; the per-tile dynamic slices cost more than the
        # narrower matmul saved — this static variant has none.)
        cpad = (window_cols - tile_cols) // 2
        xbase = (jnp.arange(nt, dtype=jnp.int32) * tile_cols - cpad)[None]
        srcp = jnp.pad(src, ((0, 0),
                             (cpad, max(nt * tile_cols + cpad - W, cpad))))

        def slice_rows(yb):
            return jax.lax.dynamic_slice(
                srcp, (yb, 0), (window_rows, srcp.shape[1]))
        rows_w = jax.vmap(slice_rows)(ybase[:, 0])     # [nb, WY, Wp]
        win = jnp.stack([
            jax.lax.slice_in_dim(rows_w, tx * tile_cols,
                                 tx * tile_cols + window_cols, axis=2)
            for tx in range(nt)], axis=1)              # [nb, nt, WY, WC]
    else:
        xbase = jnp.clip(jnp.mean(ix_cl.astype(jnp.float32), axis=2)
                         .astype(jnp.int32) - window_cols // 2,
                         0, max(W - window_cols, 0))            # [nb,nt]

        # per-tile source windows [nb, nt, WY, WX]
        def slice_tile(yb, xb):
            return jax.lax.dynamic_slice(src, (yb, xb),
                                         (window_rows, window_cols))
        win = jax.vmap(jax.vmap(slice_tile))(ybase, xbase)

    rel_x = ix_cl - xbase[..., None]
    in_win = in_win & (rel_x >= 0) & (rel_x < window_cols)
    rel_x = jnp.clip(rel_x, 0, window_cols - 1)

    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, window_cols), 3)
    # selection precision (the one-hot side is 0.0/1.0, exact in bf16; every
    # row has ONE nonzero so there is no accumulation rounding — only the
    # bf16 rounding of the window VALUES matters, measured v5e per-VGA-call):
    #   "exact"  bit-exact f32: XLA's 3-way rhs split       0.29 ms
    #   "split2" manual hi/lo bf16 split, 2 single passes,
    #            relative error <= ~2^-17 (1e-5; far below any sensor
    #            noise this framework gathers)              ~0.12 ms
    #   "fast"   single bf16 pass, ~8-bit value mantissa
    #            (relative error ~4e-3)                     ~0.05 ms
    # The bit-exact VMEM-resident Pallas kernel (ops/pallas_gather.py)
    # measured 0.42 ms — MXU-bound (output lanes pad to 128), so the XLA
    # formulation stays the production path (VERDICT r1 item 8 measurement).
    def sel(onehot_b, rhs, prec):
        return jax.lax.dot_general(
            onehot_b, rhs,
            dimension_numbers=(((3,), (2,)), ((0, 1), (0, 1))),
            precision=prec,
            preferred_element_type=jnp.float32)             # [nb,nt,P,WY]

    winT = jnp.swapaxes(win, 2, 3)
    onehot = (rel_x[:, :, :, None] == cols)
    if mode == "exact":
        tmp = sel(onehot.astype(src.dtype), winT,
                  (jax.lax.Precision.DEFAULT, jax.lax.Precision.HIGHEST))
    elif mode == "split2":
        # hi/lo parts CONCATENATED along the WY axis: one single-pass
        # matmul with 2*WY output lanes (<=128 for the default window, so
        # the MXU pads to 128 either way — the second part rides free),
        # then recombined with one add. Measured ~the 1-pass cost.
        hi = winT.astype(jnp.bfloat16)
        lo = (winT - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        ob = onehot.astype(jnp.bfloat16)
        both = sel(ob, jnp.concatenate([hi, lo], axis=-1),
                   jax.lax.Precision.DEFAULT)
        tmp = both[..., :window_rows] + both[..., window_rows:]
    else:  # "fast"
        tmp = sel(onehot.astype(src.dtype), winT,
                  jax.lax.Precision.DEFAULT)

    # row select: masked sum over the WY axis (VPU)
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, 1, 1, window_rows), 3)
    rowsel = (rel_y[:, :, :, None] == rows)
    vals = jnp.sum(jnp.where(rowsel, tmp, 0.0), axis=3)     # [nb,nt,P]

    def untile(a):
        return a.reshape(nb, nt, band_rows, tile_cols).transpose(
            0, 2, 1, 3).reshape(nb * band_rows, nt * tile_cols)

    vals = untile(vals)[:Ho, :Wo]
    in_win = untile(in_win)[:Ho, :Wo]
    return jnp.where(in_win, vals, 0.0), in_win


@partial(jax.jit, static_argnames=("band_rows", "window_rows",
                                   "miss_capacity"))
def gather_image(src: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray,
                 *, band_rows: int = 8, window_rows: int = 48,
                 miss_capacity: int = 4096):
    """Exact-within-capacity 2D gather: banded MXU fast path + a
    capacity-bounded scalar patch-up for out-of-window pixels.

    src [H,W]; iy/ix [Ho,Wo] int32 (clamped to bounds). Returns
    (values [Ho,Wo], ok [Ho,Wo]): ok=False only for misses beyond
    `miss_capacity` (coherent index fields have ~0 misses; a wild field
    degrades to masked, never to wrong values).
    """
    H, W = src.shape
    Ho, Wo = iy.shape
    vals, in_win = gather_image_banded(src, iy, ix, band_rows=band_rows,
                                       window_rows=window_rows)
    iy_cl = jnp.clip(iy, 0, H - 1)
    ix_cl = jnp.clip(ix, 0, W - 1)
    flat_src = src.reshape(-1)
    flat_idx = (iy_cl * W + ix_cl).reshape(-1)
    miss = (~in_win).reshape(-1)

    # compact the miss positions into a fixed-size buffer
    pos = jnp.cumsum(miss.astype(jnp.int32)) - 1                # [P]
    n_miss = miss.sum()
    slot = jnp.where(miss & (pos < miss_capacity), pos, miss_capacity)
    buf_idx = jnp.zeros((miss_capacity + 1,), jnp.int32).at[slot].set(
        flat_idx, mode="drop")
    buf_pix = jnp.full((miss_capacity + 1,), Ho * Wo,
                       jnp.int32).at[slot].set(
        jnp.arange(Ho * Wo, dtype=jnp.int32), mode="drop")
    patched_vals = flat_src[buf_idx[:miss_capacity]]            # small gather
    out = vals.reshape(-1).at[buf_pix[:miss_capacity]].set(
        patched_vals, mode="drop")
    ok = in_win.reshape(-1).at[buf_pix[:miss_capacity]].set(
        True, mode="drop")
    return out.reshape(Ho, Wo), ok.reshape(Ho, Wo)


def gather_batched(src: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray,
                   **kw):
    """vmap over a leading batch: src [N,H,W], iy/ix [N,Ho,Wo]."""
    return jax.vmap(lambda s, y, x: gather_image(s, y, x, **kw))(
        src, iy, ix)


@partial(jax.jit, static_argnames=("band_rows", "tile_cols", "window_rows",
                                   "window_cols", "miss_capacity"))
def gather_images_bilinear(srcs: jnp.ndarray, sy: jnp.ndarray,
                           sx: jnp.ndarray,
                           valid: jnp.ndarray | None = None,
                           *, band_rows: int = 8,
                           tile_cols: int = 128,
                           window_rows: int = 48,
                           window_cols: int = 0,
                           miss_capacity: int = 4096):
    """Bilinear sampling of C channels through ONE shared banded MXU
    selector (rounds 3-4).

    srcs [C,H,W]; sy/sx [Ho,Wo] float32 continuous source coords (edge-
    clamped). Same banding idea as gather_image_banded, but the one-hot
    carries the TWO x-interpolation weights (1-fx at x0, fx at x0+1) so
    the matmul computes the x-interp, and the row selection carries
    (1-fy, fy) over two rows — a full bilinear tap in one pass. Unlike
    the exact-0/1 banded gather, the WEIGHTS are bf16-split too, so the
    honest bound is ~2^-13 relative (golden-tested), ample for image
    values. All channels ride the SAME selector
    matmul: their hi/lo window parts are concatenated along the output-
    lane axis, so the big [nb,P,*] selector operand — the dominant
    memory/bandwidth cost — is materialized once, not per channel.

    Three differences from the plain banded gather, all forced by warp
    FIELDS (homographies) rather than per-row index vectors:
      - bands are band_rows x tile_cols TILES, not full rows: under a
        projective warp the source row varies with the output COLUMN
        (at 48 deg yaw: ~±70 rows across a 2x-VGA width), so full-row
        bands overflow any window; per-tile windows track it.
      - windows are extracted by an exact 0/1 row-selector MATMUL
        (one-hot [nb,WY,H] against src, hi/lo parts separately — 0/1
        times bf16 accumulated in f32 is exact), NOT vmapped
        dynamic_slice: per-band dynamic slices lower badly (round-1
        lesson), and with column tiles there are Wo/tile_cols times more
        bands.
      - window_cols > 0 additionally column-windows each tile (a second
        exact 0/1 selector matmul): the weight operand of the big matmul
        shrinks from [nb,P,2W] to [nb,P,2*WC] — at VGA with WC=256 that
        is 2.5x less HBM traffic and FLOPs on the dominant op (round-4
        view-synthesis lever, VERDICT r3 item 1). 0 = full width.

    Out-of-window pixels (incoherent fields, <= miss_capacity) are
    patched with the exact 4-tap scalar path. Returns
    (values [C,Ho,Wo], ok [Ho,Wo]); ok=False marks pixels beyond the
    patch capacity (banded value only).

    ``valid`` [Ho,Wo] bool (optional): pixels whose sampled value the
    caller will DISCARD (e.g. outside a warp's source range, coords
    clipped to garbage). They are excluded from each band's window mean
    and never consume patch capacity — without this, a warp whose invalid
    half clips to row 0 drags ybase off the coherent rows and floods the
    patch budget (the 56-deg view-synthesis failure mode).
    """
    C, H, W = srcs.shape
    Ho, Wo = sy.shape
    window_rows = min(window_rows, H)
    WC = W if window_cols == 0 else min(window_cols, W)
    x0f = jnp.clip(jnp.floor(sx), 0.0, W - 2)
    y0f = jnp.clip(jnp.floor(sy), 0.0, H - 2)
    fx = jnp.clip(sx - x0f, 0.0, 1.0)
    fy = jnp.clip(sy - y0f, 0.0, 1.0)
    x0 = x0f.astype(jnp.int32)
    y0 = y0f.astype(jnp.int32)
    x0u, y0u, fxu, fyu = x0, y0, fx, fy                   # unpadded copies
    if valid is None:
        valid = jnp.ones((Ho, Wo), bool)

    tile_cols = min(tile_cols, Wo)
    pad_r = (-Ho) % band_rows
    pad_c = (-Wo) % tile_cols
    if pad_r or pad_c:
        pads = ((0, pad_r), (0, pad_c))
        x0 = jnp.pad(x0, pads, mode="edge")
        y0 = jnp.pad(y0, pads, mode="edge")
        fx = jnp.pad(fx, pads)
        fy = jnp.pad(fy, pads)
        valid = jnp.pad(valid, pads)                      # pads invalid
    Hp, Wp = y0.shape
    nby = Hp // band_rows
    nbx = Wp // tile_cols
    nb = nby * nbx
    P = band_rows * tile_cols

    def bandify(a):
        return (a.reshape(nby, band_rows, nbx, tile_cols)
                .transpose(0, 2, 1, 3).reshape(nb, P))

    y0b, x0b = bandify(y0), bandify(x0)
    fxb, fyb = bandify(fx), bandify(fy)
    vb = bandify(valid)
    nvalid = jnp.maximum(vb.sum(axis=1), 1)
    ymean = (jnp.sum(y0b * vb, axis=1).astype(jnp.float32) /
             nvalid)                                      # valid-only mean
    ybase = jnp.clip(ymean.astype(jnp.int32) - window_rows // 2,
                     0, max(H - window_rows, 0))          # [nb]
    rel_y = y0b - ybase[:, None]
    # invalid pixels count as hits: their value is discarded by the
    # caller, so they must not consume patch capacity
    in_win = ((rel_y >= 0) & (rel_y < window_rows - 1)) | ~vb
    rel_y = jnp.clip(rel_y, 0, window_rows - 2)

    # window extraction as an exact one-hot matmul: rowsel [nb, WY, H];
    # channels fold into the source column axis so ONE einsum extracts
    # every channel's rows (0/1 bf16 selector x bf16 values accumulated
    # in f32 is exact, so the f32 -> bf16 recast below is lossless)
    hrows = jax.lax.broadcasted_iota(jnp.int32, (1, 1, H), 2)
    wrows = jax.lax.broadcasted_iota(jnp.int32, (1, window_rows, 1), 1)
    rowsel = (hrows == ybase[:, None, None] + wrows).astype(jnp.bfloat16)
    src_hi = srcs.astype(jnp.bfloat16)
    src_lo = (srcs - src_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    # [2C, H, W] hi parts then lo parts, as one stacked operand
    src2 = jnp.concatenate([src_hi, src_lo], 0)
    winr = jnp.einsum("brh,chw->cbrw", rowsel, src2,
                      preferred_element_type=jnp.float32)  # [2C,nb,WY,W]

    if WC < W:
        # second exact 0/1 selector: column window [xbase, xbase+WC) per
        # band (valid-only mean center, clipped inside the source)
        xmean = (jnp.sum(x0b * vb, axis=1).astype(jnp.float32) / nvalid)
        xbase = jnp.clip(xmean.astype(jnp.int32) - WC // 2,
                         0, max(W - WC, 0))               # [nb]
        wcols = jax.lax.broadcasted_iota(jnp.int32, (1, W, 1), 1)
        ccols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, WC), 2)
        colsel = (wcols == xbase[:, None, None] + ccols).astype(
            jnp.bfloat16)                                 # [nb,W,WC]
        # fold channels into the row axis: a plain BATCHED dot (batch nb)
        # — the 4D free-dim einsum has no bf16 CPU lowering
        wr = (jnp.moveaxis(winr, 0, 1)                    # [nb,2C,WY,W]
              .reshape(nb, 2 * C * window_rows, W).astype(jnp.bfloat16))
        win = jax.lax.dot_general(
            wr, colsel,
            dimension_numbers=(((2,), (1,)), ((0,), (0,))),
            preferred_element_type=jnp.float32)           # [nb,2C*WY,WC]
        win = jnp.moveaxis(
            win.reshape(nb, 2 * C, window_rows, WC), 1, 0)  # [2C,nb,WY,WC]
        rel_x = x0b - xbase[:, None]
        in_win = in_win & (((rel_x >= 0) & (rel_x < WC - 1)) | ~vb)
        rel_x = jnp.clip(rel_x, 0, WC - 2)
    else:
        win = winr
        rel_x = x0b

    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, WC), 2)
    A = (jnp.where(cols == rel_x[..., None], 1.0 - fxb[..., None], 0.0) +
         jnp.where(cols == rel_x[..., None] + 1, fxb[..., None], 0.0))

    # split2 on BOTH operands, still one MXU pass: the weights (fx) carry
    # real fractions, so bf16 weight quantization (2^-9) times the
    # neighbor-value delta is visible — unlike gather_image_banded's exact
    # 0/1 one-hots. Trick: contract [A_hi | A_lo] against
    # [[hi|lo] ; [hi|0]] — the doubled contraction axis sums
    # A_hi*hi + A_lo*hi (first half lanes) and A_hi*lo (second half);
    # only A_lo*lo (~2^-17 relative) is dropped. Channels concatenate
    # along the output lanes (C*2*WY), sharing the A2 operand.
    hi = jnp.swapaxes(win[:C], 2, 3).astype(jnp.bfloat16)   # [C,nb,WC,WY]
    lo = jnp.swapaxes(win[C:], 2, 3).astype(jnp.bfloat16)
    A_hi = A.astype(jnp.bfloat16)
    A_lo = (A - A_hi.astype(jnp.float32)).astype(jnp.bfloat16)
    A2 = jnp.concatenate([A_hi, A_lo], -1)                  # [nb,P,2WC]

    def lanes(h_, l_):
        # [C,nb,WC,WY] pairs -> [nb,WC,C*2WY]
        return jnp.concatenate(
            [jnp.concatenate([h_[c], l_[c]], -1) for c in range(C)], -1)
    V2 = jnp.concatenate([lanes(hi, lo),
                          lanes(hi, jnp.zeros_like(lo))], 1)
    both = jax.lax.dot_general(
        A2, V2,
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        precision=jax.lax.Precision.DEFAULT,
        preferred_element_type=jnp.float32)               # [nb,P,C*2WY]
    W2 = 2 * window_rows
    tmp = jnp.stack([both[..., c * W2:c * W2 + window_rows] +
                     both[..., c * W2 + window_rows:(c + 1) * W2]
                     for c in range(C)])                  # [C,nb,P,WY]

    rows = jax.lax.broadcasted_iota(jnp.int32, (1, 1, window_rows), 2)
    B = (jnp.where(rows == rel_y[..., None], 1.0 - fyb[..., None], 0.0) +
         jnp.where(rows == rel_y[..., None] + 1, fyb[..., None], 0.0))
    vals = jnp.sum(B[None] * tmp, -1)                     # [C,nb,P]

    def unbandify(a):
        return (a.reshape(nby, nbx, band_rows, tile_cols)
                .transpose(0, 2, 1, 3).reshape(Hp, Wp)[:Ho, :Wo])

    vals = jax.vmap(unbandify)(vals)
    in_win = unbandify(in_win)

    if miss_capacity == 0:
        # no patch-up: callers treat ok=False pixels as unmapped. The
        # patch machinery below costs FIVE full-grid scatters per call
        # (~307k scattered elements each at VGA — the TPU scalar path)
        # whether or not any miss exists; skipping it is the round-4
        # view-synthesis lever (misses are ~0 for coherent warps, and
        # synthesize_views marks the rest invalid in texIndex).
        return vals, in_win

    # exact scalar patch-up for out-of-window pixels (capacity-bounded)
    x0c, y0c, fxc, fyc = x0u, y0u, fxu, fyu
    miss = (~in_win).reshape(-1)
    pos = jnp.cumsum(miss.astype(jnp.int32)) - 1
    slot = jnp.where(miss & (pos < miss_capacity), pos, miss_capacity)
    n_pix = Ho * Wo

    def buf(vec, fill=0):
        return jnp.full((miss_capacity + 1,), fill, vec.dtype).at[slot].set(
            vec.reshape(-1), mode="drop")[:miss_capacity]
    bx0 = buf(x0c)
    by0 = buf(y0c)
    bfx = buf(fxc.astype(jnp.float32))
    bfy = buf(fyc.astype(jnp.float32))
    bpix = jnp.full((miss_capacity + 1,), n_pix, jnp.int32).at[slot].set(
        jnp.arange(n_pix, dtype=jnp.int32), mode="drop")[:miss_capacity]
    v00 = srcs[:, by0, bx0]
    v01 = srcs[:, by0, bx0 + 1]
    v10 = srcs[:, by0 + 1, bx0]
    v11 = srcs[:, by0 + 1, bx0 + 1]
    pv = (v00 * (1 - bfx) * (1 - bfy) + v01 * bfx * (1 - bfy) +
          v10 * (1 - bfx) * bfy + v11 * bfx * bfy)        # [C,cap]
    out = jax.vmap(lambda v, p: v.at[bpix].set(p, mode="drop"))(
        vals.reshape(C, -1), pv)
    ok = in_win.reshape(-1).at[bpix].set(True, mode="drop")
    return out.reshape(C, Ho, Wo), ok.reshape(Ho, Wo)


def gather_image_bilinear(src: jnp.ndarray, sy: jnp.ndarray,
                          sx: jnp.ndarray, valid: jnp.ndarray | None = None,
                          **kw):
    """Single-channel wrapper over gather_images_bilinear (src [H,W])."""
    vals, ok = gather_images_bilinear(src[None], sy, sx, valid, **kw)
    return vals[0], ok
