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


@partial(jax.jit, static_argnames=("band_rows", "window_rows"))
def gather_image_banded(src: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray,
                        *, band_rows: int = 8, window_rows: int = 48):
    """Banded MXU gather.

    src [H,W] float; iy/ix [Ho,Wo] int32 (any values; out-of-src-bounds
    handled). Returns (values [Ho,Wo], in_window [Ho,Wo] bool). Values for
    pixels with in_window=False are 0 and must be patched by the caller.
    """
    H, W = src.shape
    Ho, Wo = iy.shape
    window_rows = min(window_rows, H)
    pad_rows = (-Ho) % band_rows
    if pad_rows:
        iy = jnp.pad(iy, ((0, pad_rows), (0, 0)))
        ix = jnp.pad(ix, ((0, pad_rows), (0, 0)))
    nb = iy.shape[0] // band_rows

    iyb = iy.reshape(nb, band_rows * Wo)
    ixb = ix.reshape(nb, band_rows * Wo)

    iy_cl = jnp.clip(iyb, 0, H - 1)
    ix_cl = jnp.clip(ixb, 0, W - 1)
    # robust window placement: center on the band's MEAN target row — a few
    # wild pixels shift the mean by at most k*H/P rows (k outliers among
    # P=band_rows*W pixels), so they become the misses instead of evicting
    # the whole band. (Mean, not median: median = full sort, slow on TPU.)
    ctr = jnp.mean(iy_cl.astype(jnp.float32), axis=1).astype(jnp.int32)
    base = jnp.clip(ctr - window_rows // 2, 0,
                    max(H - window_rows, 0))                   # [nb]

    rel_y = iy_cl - base[:, None]                               # [nb,P]
    in_win = (rel_y >= 0) & (rel_y < window_rows)
    rel_y = jnp.clip(rel_y, 0, window_rows - 1)

    # per-band source windows [nb, WY, W]
    def slice_band(b):
        return jax.lax.dynamic_slice_in_dim(src, b, window_rows, axis=0)
    win = jax.vmap(slice_band)(base)

    # one-hot(ix) matmul: [nb, P, W] x [nb, W, WY] -> [nb, P, WY]
    # one-hot and window stay f32: the matmul is a SELECTION and must be
    # bit-exact (1.0 * x sums over one term); bf16 would round the data
    cols = jax.lax.broadcasted_iota(jnp.int32, (1, 1, W), 2)
    onehot = (ix_cl[:, :, None] == cols).astype(src.dtype)
    tmp = jax.lax.dot_general(
        onehot, jnp.swapaxes(win, 1, 2),
        dimension_numbers=(((2,), (1,)), ((0,), (0,))),
        preferred_element_type=jnp.float32)                     # [nb,P,WY]

    # row select: masked sum over the WY axis (VPU)
    rows = jax.lax.broadcasted_iota(jnp.int32, (1, 1, window_rows), 2)
    rowsel = (rel_y[:, :, None] == rows)
    vals = jnp.sum(jnp.where(rowsel, tmp, 0.0), axis=2)         # [nb,P]

    vals = vals.reshape(nb * band_rows, Wo)[:Ho]
    in_win = in_win.reshape(nb * band_rows, Wo)[:Ho]
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
