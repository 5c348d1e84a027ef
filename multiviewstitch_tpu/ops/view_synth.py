"""Virtual-view synthesis by homography warp (the reference's GenNewViews).

Re-design of Image3D::GenNewViews (Image3D.cpp:109-222): for each of
``view_count`` angles about the camera's ``axis``-th basis vector, the
reference builds H = K * R(angle) * K^-1, inverse-warps over a 2x-expanded
destination grid, re-centers the valid region, bilinear-resamples the RGB
image, and keeps a ``texIndex`` map from each synthesized pixel back to its
nearest source pixel (used later to dedup matches, Processor.cpp:649-680).

Here all views are one vmapped jitted op over the angle batch: the serial
per-pixel double loop becomes gathers + elementwise math. Semantics match:
same H, same 2x expanded grid with the same centering rule, same bilinear
weights, same nearest-pixel texIndex convention (-1 = unmapped).
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..core.transforms import rotation_about_axis


class SynthViews(NamedTuple):
    images: jnp.ndarray      # [V,H,W,C] warped views (0 outside coverage)
    tex_index: jnp.ndarray   # [V,H,W] i32 source pixel id v*W+u, -1 invalid


def view_angles(view_count: int, rot_angle_deg: float):
    """The reference's angle list (Image3D.cpp:131-133):
    [-a*(c/2), ..., -a, 0, a, ..., a*(c/2)] covering view_count entries."""
    half = view_count // 2
    return jnp.asarray(
        [-rot_angle_deg * i for i in range(half, 0, -1)] +
        [rot_angle_deg * i for i in range(0, half + 1)],
        jnp.float32)[:view_count] * (jnp.pi / 180.0)


@partial(jax.jit, static_argnames=("axis", "max_angle_deg"))
def synthesize_views(
    image: jnp.ndarray,        # [H,W,C] float
    K: jnp.ndarray,            # [3,3]
    R: jnp.ndarray,            # [3,3] camera rotation (world->cam rows)
    angles: jnp.ndarray,       # [V] radians
    *,
    axis: int = 1,
    max_angle_deg: float | None = None,
) -> SynthViews:
    """``max_angle_deg``: static bound on |angles| (the caller knows it —
    view_angles' extreme is rot_angle * (view_count // 2)). Small bounds
    (<= 25 deg) let the banded gather use wide 128-column tiles with
    48-row windows (measured 12.6 ms per 3-view VGA RGB); larger or
    unknown bounds use 64/64 tiles whose per-tile warp span stays inside
    the windows at 56-deg wide-FOV homographies (23.7 ms). Either way
    uncoverable pixels are masked in texIndex, never wrong."""
    h, w = image.shape[:2]
    wide_warp = max_angle_deg is None or max_angle_deg > 25.0
    # rotation axis = camera's axis-th basis vector in world coords
    # (Image3D.cpp:129: R.row(axis))
    ax = R[axis, :]
    Kinv = jnp.asarray(
        [[1.0 / K[0, 0], 0.0, -K[0, 2] / K[0, 0]],
         [0.0, 1.0 / K[1, 1], -K[1, 2] / K[1, 1]],
         [0.0, 0.0, 1.0]], K.dtype)                  # (Image3D.cpp:123-126)

    # 2x expanded destination grid with origin shifted by (w/2, h/2)
    # (Image3D.cpp:118-121,152-153: scale=2, u = i%W2 - W2/4)
    w2, h2 = 2 * w, 2 * h
    uu = (jnp.arange(w2, dtype=jnp.float32) - w * 0.5)
    vv = (jnp.arange(h2, dtype=jnp.float32) - h * 0.5)
    gv, gu = jnp.meshgrid(vv, uu, indexing="ij")      # [H2,W2]

    imgs_chw = jnp.moveaxis(image.astype(jnp.float32), -1, 0)  # [C,H,W]

    def warp_field(Hm, gu_, gv_):
        wf = Hm[2, 0] * gu_ + Hm[2, 1] * gv_ + Hm[2, 2]
        uf = (Hm[0, 0] * gu_ + Hm[0, 1] * gv_ + Hm[0, 2]) / wf
        vf = (Hm[1, 0] * gu_ + Hm[1, 1] * gv_ + Hm[1, 2]) / wf
        return uf, vf

    def one_view(angle):
        Rr = rotation_about_axis(ax, angle)
        H = K @ Rr @ Kinv                             # (Image3D.cpp:144)

        # pass 1 (elementwise + reductions only, no gathers): centering —
        # bbox (in expanded-grid coords + offset back) of dest pixels
        # whose source lies in range (Image3D.cpp:147-167); the eps
        # absorbs float32 roundoff in H (K@R@Kinv) at the image border
        uf, vf = warp_field(H, gu, gv)
        eps = 1e-3
        inr = ((uf >= -eps) & (uf <= w - 1 + eps) &
               (vf >= -eps) & (vf <= h - 1 + eps))
        gu_abs = gu + w * 0.5
        gv_abs = gv + h * 0.5
        big = jnp.float32(1e9)
        minu = jnp.min(jnp.where(inr, gu_abs, big))
        maxu = jnp.max(jnp.where(inr, gu_abs, -big))
        minv = jnp.min(jnp.where(inr, gv_abs, big))
        maxv = jnp.max(jnp.where(inr, gv_abs, -big))
        # integer centering so the zero-angle view is exactly the identity
        # (the reference's float centering, Image3D.cpp:166-169, carries an
        # intrinsic +1px shift from int truncation — an artifact we fix)
        offx = jnp.floor((maxu + minu) * 0.5 - (w - 1) * 0.5 + 0.5)
        offy = jnp.floor((maxv + minv) * 0.5 - (h - 1) * 0.5 + 0.5)

        # pass 2: evaluate the warp field ONLY on the final [h,w]
        # destination window. Window pixel (r,c) sits at expanded-grid
        # coords (offx + c - w/2, offy + r - h/2) — offx/offy are
        # integer-valued traced scalars, so the window field is analytic
        # and nothing of the 2x grid is ever sampled or sliced. (Round 3
        # sampled the full 2x grid then dynamic-sliced: 4x the gather
        # work and ~1.5 GB of selector temporaries per frame — the
        # config-2 HBM OOM. This pass-2 is the round-4 fix.)
        cu = jnp.arange(w, dtype=jnp.float32) + (offx - w * 0.5)
        cv = jnp.arange(h, dtype=jnp.float32) + (offy - h * 0.5)
        gvw, guw = jnp.meshgrid(cv, cu, indexing="ij")    # [h,w]
        ufw, vfw = warp_field(H, guw, gvw)
        inrw = ((ufw >= -eps) & (ufw <= w - 1 + eps) &
                (vfw >= -eps) & (vfw <= h - 1 + eps))

        # bilinear sample source at (ufw, vfw) (Image3D.cpp:178-211): one
        # column-windowed banded MXU matmul shared by all channels
        # (round 3: the 4-tap advanced-index gathers ran the TPU scalar
        # path — measured 250 ms per 3-view VGA synthesis; the homography
        # warp field is exactly the coherent-index case gather2d was
        # built for). Sanitize: wf ~ 0 rows produce inf/NaN coords; they
        # are outside `inrw` (never written) but would poison the banded
        # gather's per-band window means.
        from .gather2d import gather_images_bilinear
        ufc = jnp.clip(jnp.where(jnp.isfinite(ufw), ufw, 0.0), 0.0, w - 1.0)
        vfc = jnp.clip(jnp.where(jnp.isfinite(vfw), vfw, 0.0), 0.0, h - 1.0)
        # tile_cols=64 keeps the per-tile warp span inside the windows at
        # extreme angles (56 deg yaw x wide FOV: the y-span across a tile
        # scales with its width); window_rows=64 is free on the MXU (the
        # 2*WY output lanes pad to 128 either way). At small static angle
        # bounds the wide 128/48 geometry is ~2x faster (see docstring).
        vals, okg = gather_images_bilinear(
            imgs_chw, vfc, ufc, inrw,
            tile_cols=64 if wide_warp else 128,
            window_rows=64 if wide_warp else 48,
            window_cols=min(192, w), miss_capacity=0)
        sample = jnp.moveaxis(vals, 0, -1)                # [h,w,C]

        # texIndex: nearest source pixel, computed analytically from the
        # window warp field (-1 = unmapped); no gather needed. Pixels the
        # banded gather could not cover (okg False — incoherent warp
        # corners beyond the row/column windows, ~0 at product angles)
        # are honestly unmapped instead of scalar-patched: the patch-up's
        # five full-grid scatters per view cost more than the entire
        # gather (round-4 measurement).
        tex = jnp.where(inrw & okg,
                        jnp.floor(vfw + 0.5).astype(jnp.int32) * w +
                        jnp.floor(ufw + 0.5).astype(jnp.int32),
                        -1)
        out = jnp.where((tex >= 0)[..., None], sample, 0.0)
        return out, tex

    imgs, tex = jax.vmap(one_view)(angles)
    return SynthViews(imgs, tex)
