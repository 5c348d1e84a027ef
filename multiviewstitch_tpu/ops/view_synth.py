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

        # dest pixel for each expanded-grid sample (Image3D.cpp:175-177)
        du = jnp.floor(gu_abs - offx + 0.5).astype(jnp.int32)
        dv = jnp.floor(gv_abs - offy + 0.5).astype(jnp.int32)

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

        ok = (inr & (du >= 0) & (du <= w - 1) & (dv >= 0) & (dv <= h - 1))
        flat = jnp.where(ok, dv * w + du, h * w)      # OOB slot dropped

        out = jnp.zeros((h * w + 1, image.shape[-1]), jnp.float32)
        out = out.at[flat.ravel()].set(sample.reshape(-1, image.shape[-1]),
                                       mode="drop")
        # texIndex: nearest source pixel (Image3D.cpp:181,213)
        src = (jnp.floor(vf + 0.5).astype(jnp.int32) * w +
               jnp.floor(uf + 0.5).astype(jnp.int32))
        tex = jnp.full((h * w + 1,), -1, jnp.int32)
        tex = tex.at[flat.ravel()].set(src.ravel(), mode="drop")
        return out[:h * w].reshape(h, w, -1), tex[:h * w].reshape(h, w)

    imgs, tex = jax.vmap(one_view)(angles)
    return SynthViews(imgs, tex)
