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


@partial(jax.jit, static_argnames=("axis",))
def synthesize_views(
    image: jnp.ndarray,        # [H,W,C] float
    K: jnp.ndarray,            # [3,3]
    R: jnp.ndarray,            # [3,3] camera rotation (world->cam rows)
    angles: jnp.ndarray,       # [V] radians
    *,
    axis: int = 1,
) -> SynthViews:
    h, w = image.shape[:2]
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

    def one_view(angle):
        Rr = rotation_about_axis(ax, angle)
        H = K @ Rr @ Kinv                             # (Image3D.cpp:144)
        wf = H[2, 0] * gu + H[2, 1] * gv + H[2, 2]
        uf = (H[0, 0] * gu + H[0, 1] * gv + H[0, 2]) / wf
        vf = (H[1, 0] * gu + H[1, 1] * gv + H[1, 2]) / wf

        # centering: bbox (in expanded-grid coords + offset back) of dest
        # pixels whose source lies in range (Image3D.cpp:147-167); the eps
        # absorbs float32 roundoff in H (K@R@Kinv) at the image border
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

        # bilinear sample source at (uf, vf) (Image3D.cpp:178-211), one
        # banded MXU matmul per channel (round 3: the 4-tap advanced-index
        # gathers over the 2x grid ran the TPU scalar path — measured
        # 250 ms per 3-view VGA synthesis; the homography warp field is
        # exactly the coherent-index case gather2d was built for)
        from .gather2d import gather_image_bilinear
        img = image.astype(jnp.float32)
        # sanitize: wf ~ 0 rows produce inf/NaN coords; they are outside
        # `inr` (never written) but would poison the banded gather's
        # per-band window means
        ufc = jnp.clip(jnp.where(jnp.isfinite(uf), uf, 0.0), 0.0, w - 1.0)
        vfc = jnp.clip(jnp.where(jnp.isfinite(vf), vf, 0.0), 0.0, h - 1.0)
        chans = [gather_image_bilinear(img[..., c], vfc, ufc, inr)[0]
                 for c in range(image.shape[-1])]
        sample = jnp.stack(chans, -1)

        # destination write as ONE dynamic slice, not a scatter: du/dv are
        # an exact integer TRANSLATION of the regular expanded grid
        # (gu_abs = arange(w2), offx integer-valued), so "scatter sample
        # to (dv,du)" == "slice the grid at (offy, offx)". The two
        # 1.2M-element scalar-path scatters this replaces were ~2/3 of the
        # measured 305 ms per 3-view VGA synthesis (round 3). Padding by
        # (h, w) keeps every reachable offset in range (off ∈
        # [-d/2, 3d/2] from the bbox-centering formula).
        src = jnp.where(inr,
                        jnp.floor(vf + 0.5).astype(jnp.int32) * w +
                        jnp.floor(uf + 0.5).astype(jnp.int32),
                        -1)                            # texIndex w/ invalid
        sample = jnp.where(inr[..., None], sample, 0.0)
        stack = jnp.concatenate(
            [sample, src[..., None].astype(jnp.float32)], -1)
        stack = jnp.pad(stack, ((h, h), (w, w), (0, 0)),
                        constant_values=-1.0)
        # pad fills sample channels with -1 too; they are masked by tex<0
        # at the consumer (tex == -1 marks "no source pixel") but zero them
        # anyway to keep image semantics
        oy = offy.astype(jnp.int32) + h
        ox = offx.astype(jnp.int32) + w
        win = jax.lax.dynamic_slice(
            stack, (oy, ox, 0), (h, w, stack.shape[-1]))
        tex = win[..., -1].astype(jnp.int32)
        out = jnp.where((tex >= 0)[..., None], win[..., :-1], 0.0)
        return out, tex

    imgs, tex = jax.vmap(one_view)(angles)
    return SynthViews(imgs, tex)
