"""Pallas TPU kernel for the banded image gather.

The XLA formulation in ops/gather2d.py materializes the one-hot selection
matrices in HBM (the matmul operands must exist as buffers), costing
~2*P*W*4 bytes of traffic per band. This kernel builds the one-hot tiles
directly in VMEM and DMAs only the source windows, so HBM traffic drops to
the window rows + indices + outputs:

  grid = (n_bands,); per band:
    - scalar-prefetched window base row (computed by a cheap XLA min pass)
    - async-copy the [WY, W] source window HBM -> VMEM
    - for each band row: one-hot(ix_row) [W, W] in VMEM (iota compare),
      tmp = one-hot @ window^T on the MXU, row-select by masked sum.

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


def _kernel(base_ref, iy_ref, ix_ref, src_ref, out_ref, ok_ref, win, sem):
    b = pl.program_id(0)
    base = pl.multiple_of(base_ref[b], 8)
    wy, w = win.shape
    bh = iy_ref.shape[0]

    dma = pltpu.make_async_copy(src_ref.at[pl.ds(base, wy), :], win, sem)
    dma.start()
    dma.wait()

    ok = (iy_ref[:] >= base) & (iy_ref[:] < base + wy)
    ok_ref[:] = ok

    cols = jax.lax.broadcasted_iota(jnp.int32, (w, w), 1)
    rows_iota = jax.lax.broadcasted_iota(jnp.int32, (w, wy), 1)

    def row_body(r, _):
        # read refs with dynamic slices (values can't be dynamically
        # indexed inside Pallas TPU kernels)
        ix_row = ix_ref[pl.ds(r, 1), :]                          # [1,W]
        iy_row = iy_ref[pl.ds(r, 1), :]
        rel_row = jnp.clip(iy_row - base, 0, wy - 1)             # [1,W]
        onehot = (ix_row.reshape(w, 1) == cols).astype(jnp.float32)  # [W,W]
        tmp = jnp.dot(onehot, win[:].T,
                      preferred_element_type=jnp.float32)        # [W,WY]
        sel = rel_row.reshape(w, 1) == rows_iota                 # [W,WY]
        out_ref[pl.ds(r, 1), :] = jnp.sum(
            jnp.where(sel, tmp, 0.0), axis=1).reshape(1, w)
        return 0

    jax.lax.fori_loop(0, bh, row_body, 0)


@partial(jax.jit, static_argnames=("band_rows", "window_rows", "interpret"))
def pallas_gather_banded(src: jnp.ndarray, iy: jnp.ndarray, ix: jnp.ndarray,
                         *, band_rows: int = 8, window_rows: int = 64,
                         interpret: bool = False):
    """src [H,W] f32; iy/ix [H,W] i32 -> (values [H,W], ok [H,W])."""
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
        _kernel,
        out_shape=(jax.ShapeDtypeStruct((nb * band_rows, W), jnp.float32),
                   jax.ShapeDtypeStruct((nb * band_rows, W), jnp.bool_)),
        grid_spec=grid_spec,
        interpret=interpret,
    )(base, iy_cl, ix_cl, src)
    return vals[:Ho], ok[:Ho]


def pallas_gather_available() -> bool:
    return jax.default_backend() in ("tpu", "axon")
