"""Pallas TPU kernel for the banded image gather.

The XLA formulation in ops/gather2d.py materializes the one-hot selection
matrices in HBM (the matmul operands must exist as buffers), costing
~2*P*W*4 bytes of traffic per band. This kernel builds the one-hot tiles
directly in VMEM and DMAs only the source windows, so HBM traffic drops to
the window rows + indices + outputs:

  grid = (n_bands,); per band:
    - scalar-prefetched window base row (computed by a cheap XLA min pass)
    - async-copy the [WY, W] source window HBM -> VMEM
    - BATCHED selection over chunks of band rows (no per-row serial loop):
        (1) row select: one-hot(rel = iy - base) [CR*W, WY] @ window
            [WY, W] on the MXU -> per-entry source ROWS [CR*W, W]
        (2) column pick: masked reduce over W on the VPU
            (iota == ix compare, where + sum).
      WY defaults to 128 so the matmul contraction fills the MXU exactly;
      the chunk size CR is chosen so the [CR*W, W] intermediate plus the
      column mask stay well inside the ~16 MB VMEM budget.

Numerics identical to gather2d.gather_image_banded (f32 selection is
exact). Use `pallas_gather_available()` to check the backend; the caller
(ops/consistency._gather_px) falls back to the XLA path elsewhere.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for the per-chunk intermediates ([CR*W, W] rows matrix, the
# same-shaped column mask, and the [CR*W, WY] one-hot). ~16 MB/core total;
# leave room for the window, the index blocks, and double buffering.
_CHUNK_VMEM_BUDGET = 8 << 20


def _chunk_rows(band_rows: int, w: int, wy: int) -> int:
    """Largest divisor of band_rows whose intermediates fit the budget."""
    for cr in (16, 8, 4, 2):
        if band_rows % cr == 0 and \
                cr * w * (2 * w + wy) * 4 <= _CHUNK_VMEM_BUDGET:
            return cr
    return 1


def _kernel(base_ref, iy_ref, ix_ref, src_ref, out_ref, ok_ref, win, sem,
            *, chunk_rows):
    b = pl.program_id(0)
    base = pl.multiple_of(base_ref[b], 8)
    wy, w = win.shape
    bh = iy_ref.shape[0]

    dma = pltpu.make_async_copy(src_ref.at[pl.ds(base, wy), :], win, sem)
    dma.start()
    dma.wait()

    iy = iy_ref[:]
    ix = ix_ref[:]
    ok_ref[:] = (iy >= base) & (iy < base + wy)
    rel = jnp.clip(iy - base, 0, wy - 1)                      # [BH, W]

    cr = chunk_rows
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (cr, w, wy), 2)
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (cr, w, w), 2)
    # static unroll: bh // cr is tiny (1-4) and each body is one big matmul
    for c0 in range(0, bh, cr):
        rel_c = jnp.expand_dims(
            jax.lax.slice_in_dim(rel, c0, c0 + cr, axis=0), 2)  # [cr,W,1]
        onehot = (rel_c == k_iota).astype(jnp.float32)
        # Precision.HIGHEST: the MXU's default single-bf16-pass matmul
        # rounds the window VALUES (measured 1.5e-2 abs err on v5e), which
        # would make the "gather" lossy. Mosaic doesn't support per-operand
        # precision (the one-hot side alone would be exact in one pass), so
        # the whole dot runs at full f32 precision.
        rows = jax.lax.dot_general(
            onehot.reshape(cr * w, wy), win[:],
            dimension_numbers=(((1,), (0,)), ((), ())),
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32).reshape(cr, w, w)
        ix_c = jnp.expand_dims(
            jax.lax.slice_in_dim(ix, c0, c0 + cr, axis=0), 2)
        sel = ix_c == c_iota
        out_ref[c0:c0 + cr, :] = jnp.sum(jnp.where(sel, rows, 0.0), axis=2)


@partial(jax.jit, static_argnames=("band_rows", "window_rows", "interpret"))
def pallas_gather_banded(src: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray,
                         *, band_rows: int = 8, window_rows: int = 120,
                         interpret: bool = False):
    """src [H,W] f32; iy/ix [H,W] i32 -> (values [H,W], ok [H,W]).

    window_rows defaults to 120: +8 alignment headroom makes the DMA'd
    window 128 rows, so the selection matmul's contraction dim fills the
    128-wide MXU exactly (a 64-row window pads K to 128 and wastes half
    the array for a smaller hit window).
    """
    H, W = src.shape
    Ho = iy.shape[0]
    # +8 headroom compensates the sublane alignment of the window base
    window_rows = min(window_rows + 8, H)
    pad = (-Ho) % band_rows
    if pad:
        iy = jnp.pad(iy, ((0, pad), (0, 0)))
        ix = jnp.pad(ix, ((0, pad), (0, 0)))
    nb = iy.shape[0] // band_rows

    iy_cl = jnp.clip(iy, 0, H - 1)
    ix_cl = jnp.clip(ix, 0, W - 1)
    # per-band window base (cheap XLA reduction, prefetched as scalars)
    ctr = jnp.mean(iy_cl.reshape(nb, -1).astype(jnp.float32),
                   axis=1).astype(jnp.int32)
    base = jnp.clip(ctr - window_rows // 2, 0, max(H - window_rows, 0))
    # Mosaic requires the dynamic DMA row offset to be sublane-aligned
    base = jnp.clip((base // 8) * 8, 0, max(((H - window_rows) // 8) * 8, 0))

    kernel = partial(_kernel,
                     chunk_rows=_chunk_rows(band_rows, W, window_rows))

    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=1,
        grid=(nb,),
        in_specs=[
            pl.BlockSpec((band_rows, W), lambda b, base_r: (b, 0),
                         memory_space=pltpu.VMEM),       # iy
            pl.BlockSpec((band_rows, W), lambda b, base_r: (b, 0),
                         memory_space=pltpu.VMEM),       # ix
            pl.BlockSpec(memory_space=pl.ANY),           # src stays in HBM
        ],
        out_specs=[
            pl.BlockSpec((band_rows, W), lambda b, base_r: (b, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((band_rows, W), lambda b, base_r: (b, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((window_rows, W), jnp.float32),
            pltpu.SemaphoreType.DMA,
        ],
    )

    vals, ok = pl.pallas_call(
        kernel,
        out_shape=(jax.ShapeDtypeStruct((nb * band_rows, W), jnp.float32),
                   jax.ShapeDtypeStruct((nb * band_rows, W), jnp.bool_)),
        grid_spec=grid_spec,
        interpret=interpret,
    )(base, iy_cl, ix_cl, src)
    return vals[:Ho], ok[:Ho]


def pallas_gather_available() -> bool:
    return jax.default_backend() in ("tpu", "axon")
