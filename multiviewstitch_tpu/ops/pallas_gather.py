"""Pallas TPU kernel for the banded image gather.

The XLA formulation in ops/gather2d.py must materialize the one-hot
selection matrices in HBM (matmul operands are buffers) and, because a
bit-exact f32 selection on the bf16 MXU needs a 3-way operand split, it
streams that ~P*W-sized one-hot from HBM three times per gather. This
kernel keeps the entire selection in VMEM, so HBM traffic drops to the
window rows + index blocks + outputs:

  grid = (n_bands,); per band:
    - scalar-prefetched window base row (computed by a cheap XLA mean pass,
      8-aligned for the DMA)
    - async-copy the [WY, W] source window HBM -> VMEM
    - split the window ONCE into an exact triple-bf16 decomposition
      (hi + mid + lo == f32 window bitwise: 8+8+8 mantissa bits)
    - batched column selection over chunks of band rows:
        one-hot(ix) [CR*W, W] (built in VMEM, bf16) contracted against each
        bf16 window part on the MXU -> [CR*W, WY]; summing the three
        single-pass products reproduces the f32 window values exactly
        (every one-hot row has exactly one nonzero, so no accumulation
        rounding anywhere)
    - row select: WY-wide masked reduce on the VPU.

  The window defaults to 128 DMA'd rows so the [CR*W, WY] product tile
  fills the MXU's 128 output lanes exactly; the chunk size CR keeps the
  one-hot + product inside the ~16 MB VMEM budget.

Numerics identical to gather2d.gather_image_banded (bit-exact selection).
Use `pallas_gather_available()` to check the backend; callers fall back to
the XLA path elsewhere.
"""

from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

# VMEM budget for the per-chunk intermediates (the [CR*W, W] bf16 one-hot,
# the [CR*W, WY] f32 product, the row-select mask). ~16 MB/core total;
# leave room for the window + its bf16 parts and the index blocks.
_CHUNK_VMEM_BUDGET = 10 << 20


def _chunk_rows(band_rows: int, w: int, wy: int) -> int:
    """Largest divisor of band_rows whose intermediates fit the budget."""
    for cr in (16, 8, 4, 2):
        if band_rows % cr == 0 and \
                cr * w * (2 * w + 6 * wy) <= _CHUNK_VMEM_BUDGET:
            return cr
    return 1


def _split3(w32):
    """Exact triple-bf16 decomposition: hi + mid + lo == w32 in f32."""
    hi = w32.astype(jnp.bfloat16)
    r1 = w32 - hi.astype(jnp.float32)
    mid = r1.astype(jnp.bfloat16)
    lo = (r1 - mid.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, mid, lo


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

    hi, mid, lo = _split3(win[:])

    cr = chunk_rows
    c_iota = jax.lax.broadcasted_iota(jnp.int32, (cr, w, w), 2)
    k_iota = jax.lax.broadcasted_iota(jnp.int32, (cr, w, wy), 2)
    # static unroll: bh // cr is tiny (1-4) and each body is 3 big matmuls
    for c0 in range(0, bh, cr):
        ix_c = jnp.expand_dims(
            jax.lax.slice_in_dim(ix, c0, c0 + cr, axis=0), 2)  # [cr,W,1]
        onehot = (ix_c == c_iota).astype(jnp.bfloat16).reshape(cr * w, w)

        def sel(part):
            # contract the one-hot's column axis with the window's column
            # axis: [cr*W, W] x [WY, W] -> [cr*W, WY]. One nonzero per row
            # => each single-pass bf16 product is the bf16 part verbatim.
            return jax.lax.dot_general(
                onehot, part,
                dimension_numbers=(((1,), (1,)), ((), ())),
                preferred_element_type=jnp.float32)

        tmp = ((sel(hi) + sel(mid)) + sel(lo)).reshape(cr, w, wy)
        rel_c = jnp.expand_dims(
            jax.lax.slice_in_dim(rel, c0, c0 + cr, axis=0), 2)
        rowsel = rel_c == k_iota
        out_ref[c0:c0 + cr, :] = jnp.sum(jnp.where(rowsel, tmp, 0.0), axis=2)


@partial(jax.jit, static_argnames=("band_rows", "window_rows", "interpret"))
def pallas_gather_banded(src: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray,
                         *, band_rows: int = 8, window_rows: int = 120,
                         interpret: bool = False):
    """src [H,W] f32; iy/ix [H,W] i32 -> (values [H,W], ok [H,W]).

    window_rows defaults to 120: +8 alignment headroom makes the DMA'd
    window 128 rows, so the selection product's output lane dim fills the
    MXU exactly (any smaller window pads to 128 lanes anyway — a 128-row
    window is the free maximum hit window).
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
