"""Feature detection + SIFT-style descriptors, fully jitted.

TPU-native replacement for FeatureProc.{h,cpp}, which shells out to the
prebuilt SiftGPU OpenGL library (DetectFeatureSingleView,
FeatureProc.cpp:14-75). Here detection and description are batched JAX ops:

  - scale space: separable Gaussian pyramid (static octave/scale counts)
  - detector: multi-scale Harris corner response, 3x3 NMS via max-pool
    equality, margin bands zeroed exactly like the reference's pre-blanking
    (FeatureProc.cpp:28-43 -> filters.margin_mask)
  - fixed-capacity top-K keypoints across all levels (static shapes)
  - descriptors: 4x4x8 gradient-orientation histograms over a 16x16 patch
    resampled at the keypoint's scale and dominant orientation (the SIFT
    layout SiftGPU produces), L2-normalized with 0.2 clipping

The MXU-friendly matcher lives in ops/match.py. Keypoint capacity K and
pyramid shape are static; validity masks carry the dynamic counts.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import jax
import jax.numpy as jnp


class Keypoints(NamedTuple):
    uv: jnp.ndarray        # [K,2] float32 source-image pixel coords
    scale: jnp.ndarray     # [K] float32 (pyramid sampling step)
    angle: jnp.ndarray     # [K] float32 dominant orientation (rad)
    score: jnp.ndarray     # [K] float32 detector response
    valid: jnp.ndarray     # [K] bool
    desc: jnp.ndarray      # [K,128] float32 L2-normalized descriptors


def _gauss_kernel1d(sigma: float, radius: int):
    x = jnp.arange(-radius, radius + 1, dtype=jnp.float32)
    k = jnp.exp(-0.5 * (x / sigma) ** 2)
    return k / k.sum()


def gaussian_blur(img: jnp.ndarray, sigma: float, radius: int | None = None):
    """Separable Gaussian blur of [H,W] (edge-replicate padding)."""
    radius = radius or max(1, int(3.0 * sigma + 0.5))
    k = _gauss_kernel1d(sigma, radius)
    pad = [(radius, radius)]
    x = jnp.pad(img, pad + [(0, 0)], mode="edge")
    x = jax.vmap(lambda col: jnp.convolve(col, k, mode="valid"),
                 in_axes=1, out_axes=1)(x)
    x = jnp.pad(x, [(0, 0)] + pad, mode="edge")
    x = jax.vmap(lambda row: jnp.convolve(row, k, mode="valid"))(x)
    return x


def _downsample2(img):
    return img[::2, ::2]


def _harris(img: jnp.ndarray, k: float = 0.04, sigma: float = 1.5):
    """Harris corner response of [H,W]."""
    dx = (jnp.roll(img, -1, 1) - jnp.roll(img, 1, 1)) * 0.5
    dy = (jnp.roll(img, -1, 0) - jnp.roll(img, 1, 0)) * 0.5
    a = gaussian_blur(dx * dx, sigma)
    b = gaussian_blur(dy * dy, sigma)
    c = gaussian_blur(dx * dy, sigma)
    det = a * b - c * c
    tr = a + b
    return det - k * tr * tr


def _nms3(r: jnp.ndarray):
    """True where r equals the 3x3 neighborhood max."""
    neg = -jnp.inf
    m = r
    for sy in (-1, 0, 1):
        for sx in (-1, 0, 1):
            if sy == 0 and sx == 0:
                continue
            sh = jnp.roll(jnp.roll(r, sy, 0), sx, 1)
            m = jnp.maximum(m, sh)
    return r >= m


def _bilinear(img, yy, xx):
    h, w = img.shape
    x0 = jnp.clip(jnp.floor(xx).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(yy).astype(jnp.int32), 0, h - 2)
    fx = jnp.clip(xx - x0, 0.0, 1.0)
    fy = jnp.clip(yy - y0, 0.0, 1.0)
    v00 = img[y0, x0]
    v01 = img[y0, x0 + 1]
    v10 = img[y0 + 1, x0]
    v11 = img[y0 + 1, x0 + 1]
    return (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy) +
            v10 * (1 - fx) * fy + v11 * fx * fy)


def _bilinear_stack(stack, lvl, yy, xx):
    """Bilinear sample stack [L,H,W] at level `lvl` (scalar int) and
    continuous (yy, xx): one flat gather on [L*H, W] so a traced per-
    keypoint level never materializes a full [H,W] slice under vmap."""
    L, h, w = stack.shape
    flat = stack.reshape(L * h, w)
    x0 = jnp.clip(jnp.floor(xx).astype(jnp.int32), 0, w - 2)
    y0 = jnp.clip(jnp.floor(yy).astype(jnp.int32), 0, h - 2)
    fx = jnp.clip(xx - x0, 0.0, 1.0)
    fy = jnp.clip(yy - y0, 0.0, 1.0)
    r0 = lvl * h + y0
    v00 = flat[r0, x0]
    v01 = flat[r0, x0 + 1]
    v10 = flat[r0 + 1, x0]
    v11 = flat[r0 + 1, x0 + 1]
    return (v00 * (1 - fx) * (1 - fy) + v01 * fx * (1 - fy) +
            v10 * (1 - fx) * fy + v11 * fx * fy)


def _grad_level(scale, num_grad_levels: int):
    """Gradient-stack level whose smoothing matches the keypoint scale
    (half-octave steps: sigma_l = 1.6 * 2^(l/2))."""
    l = jnp.round(2.0 * jnp.log2(jnp.maximum(scale, 1e-6)))
    return jnp.clip(l.astype(jnp.int32), 0, num_grad_levels - 1)


def _orientation(gx_stack, gy_stack, lvl, uv, scale, radius: int = 8):
    """Dominant gradient orientation (36-bin Gaussian-weighted histogram,
    like SIFT). The window is SCALE-ADAPTIVE: gradients are sampled on a
    grid spaced by the keypoint's scale, FROM the Gaussian-smoothed
    gradient field matched to that scale (gx/gy stacks). Sampling the raw
    image instead (round-1 behavior) made the orientation anisotropic —
    bilinear interpolation biases gradient direction toward the pixel
    axes, which measured as a ~10 deg median orientation error between
    rotated views and capped matching recall at ~0.63
    (tests/test_feature_recall.py)."""
    d = jnp.arange(-radius, radius, dtype=jnp.float32) + 0.5
    dy, dx = jnp.meshgrid(d, d, indexing="ij")
    sx = uv[0] + scale * dx
    sy = uv[1] + scale * dy
    gx = _bilinear_stack(gx_stack, lvl, sy, sx)
    gy = _bilinear_stack(gy_stack, lvl, sy, sx)
    mag = jnp.sqrt(gx * gx + gy * gy)
    ang = jnp.arctan2(gy, gx)
    wgt = jnp.exp(-0.5 * ((dx ** 2 + dy ** 2) / (radius * radius / 2.25)))
    # soft-bin the angle into the two nearest of 36 bins (linear split)
    pos = (ang + jnp.pi) / (2 * jnp.pi) * 36.0 - 0.5
    b0 = jnp.floor(pos)
    f = pos - b0
    b0i = b0.astype(jnp.int32) % 36
    b1i = (b0i + 1) % 36
    contrib = mag * wgt
    hist = jnp.zeros((36,)).at[b0i.ravel()].add(
        (contrib * (1 - f)).ravel()).at[b1i.ravel()].add(
        (contrib * f).ravel())
    # smooth circularly (Lowe smooths the histogram several times; one
    # pass left ~1/3 of repeated keypoints picking a different peak under
    # rotation) then take the peaks with parabolic interpolation
    for _ in range(4):
        hist = (jnp.roll(hist, 1) + hist + jnp.roll(hist, -1)) / 3.0

    def refine(peak):
        hl = hist[(peak - 1) % 36]
        hc = hist[peak]
        hr = hist[(peak + 1) % 36]
        den = hl - 2 * hc + hr
        off = jnp.where(jnp.abs(den) < 1e-12, 0.0,
                        jnp.clip(0.5 * (hl - hr) / den, -0.5, 0.5))
        return ((peak.astype(jnp.float32) + 0.5 + off) / 36.0 *
                2 * jnp.pi - jnp.pi)

    peak = jnp.argmax(hist)
    # second peak (local max outside +-1 bin of the first), SIFT-style:
    # a keypoint whose histogram has a rival peak >= 0.8*max is ambiguous
    # in orientation; the caller may emit a duplicate keypoint at angle2
    bins = jnp.arange(36)
    near = jnp.minimum((bins - peak) % 36, (peak - bins) % 36) <= 1
    is_lmax = (hist >= jnp.roll(hist, 1)) & (hist >= jnp.roll(hist, -1))
    h2 = jnp.where(near | ~is_lmax, -jnp.inf, hist)
    peak2 = jnp.argmax(h2)
    ratio2 = jnp.where(jnp.isfinite(h2[peak2]),
                       h2[peak2] / jnp.maximum(hist[peak], 1e-12), 0.0)
    return refine(peak), refine(peak2), ratio2


def _descriptor(gx_stack, gy_stack, lvl, uv, scale, angle):
    """128-d SIFT-layout descriptor at (uv, scale, angle).

    Gradient samples are TRILINEARLY soft-binned (bilinear across the 4x4
    spatial cells x linear across the 8 orientation bins), the scheme
    Lowe's SIFT uses: hard binning makes the descriptor discontinuous in
    keypoint position/orientation and measurably costs matching recall
    under rotation. Gradients come from the scale-matched Gaussian
    gradient field (same stacks as _orientation) — sampling the raw image
    aliased large-scale keypoints and biased directions toward the pixel
    axes (harness: tests/test_feature_recall.py)."""
    # 16x16 sampling grid rotated by angle, spaced by MAGNIF * scale
    # (0.75 measured best on the recall harness: the tighter support
    # improves the scale-change cases ~+3-4 points at ~-1 point on pure
    # rotation — see tests/test_feature_recall.py thresholds)
    MAGNIF = 0.75
    g = (jnp.arange(16, dtype=jnp.float32) - 7.5)
    gy, gx = jnp.meshgrid(g, g, indexing="ij")
    ca, sa = jnp.cos(angle), jnp.sin(angle)
    sx = uv[0] + MAGNIF * scale * (ca * gx - sa * gy)
    sy = uv[1] + MAGNIF * scale * (sa * gx + ca * gy)

    # gradients rotated into the keypoint frame (sample the grid-gradient
    # field along image axes, rotate the vector by -angle)
    gxi = _bilinear_stack(gx_stack, lvl, sy, sx)
    gyi = _bilinear_stack(gy_stack, lvl, sy, sx)
    gxv = ca * gxi + sa * gyi
    gyv = -sa * gxi + ca * gyi
    mag = jnp.sqrt(gxv * gxv + gyv * gyv)
    ang = jnp.arctan2(gyv, gxv)

    wgt = jnp.exp(-0.5 * ((gx ** 2 + gy ** 2) / 64.0))
    contrib = (mag * wgt).ravel()

    # trilinear soft binning
    opos = (ang + jnp.pi) / (2 * jnp.pi) * 8.0 - 0.5
    ob0 = jnp.floor(opos)
    of = (opos - ob0).ravel()
    ob0 = ob0.astype(jnp.int32).ravel() % 8
    ob1 = (ob0 + 1) % 8

    # cell-space coordinates: cells are 4 samples wide, centers at
    # -6,-2,2,6 in grid units -> continuous cell index in [-0.5, 3.5]
    cxpos = (gx.ravel() + 6.0) / 4.0
    cypos = (gy.ravel() + 6.0) / 4.0
    cx0 = jnp.floor(cxpos)
    cy0 = jnp.floor(cypos)
    fx = cxpos - cx0
    fy = cypos - cy0
    cx0 = cx0.astype(jnp.int32)
    cy0 = cy0.astype(jnp.int32)

    desc = jnp.zeros((128,))
    for dcy, wy_ in ((0, 1.0 - fy), (1, fy)):
        cy = cy0 + dcy
        okY = (cy >= 0) & (cy <= 3)
        for dcx, wx_ in ((0, 1.0 - fx), (1, fx)):
            cx = cx0 + dcx
            okX = (cx >= 0) & (cx <= 3)
            cell = (jnp.clip(cy, 0, 3) * 4 + jnp.clip(cx, 0, 3))
            ww = jnp.where(okY & okX, wy_ * wx_, 0.0) * contrib
            desc = desc.at[cell * 8 + ob0].add(ww * (1.0 - of))
            desc = desc.at[cell * 8 + ob1].add(ww * of)
    n = jnp.maximum(jnp.linalg.norm(desc), 1e-8)
    desc = jnp.minimum(desc / n, 0.2)
    return desc / jnp.maximum(jnp.linalg.norm(desc), 1e-8)


def _dog_extrema(dogs, contrast_thresh: float, edge_ratio: float = 10.0):
    """Scale-space extrema of a DoG stack [S,H,W]: 26-neighborhood max/min
    on the middle scales, contrast threshold, and 2x2 Hessian edge
    rejection (the SIFT detector's acceptance rules; the reference gets
    these from SiftGPU, FeatureProc.cpp:20)."""
    S = dogs.shape[0]
    resp = []
    for s in range(1, S - 1):
        d = dogs[s]
        mx = jnp.full_like(d, -jnp.inf)
        mn = jnp.full_like(d, jnp.inf)
        for ds in (-1, 0, 1):
            lvl = dogs[s + ds]
            for dy in (-1, 0, 1):
                for dx in (-1, 0, 1):
                    if ds == 0 and dy == 0 and dx == 0:
                        continue
                    sh = jnp.roll(jnp.roll(lvl, dy, 0), dx, 1)
                    mx = jnp.maximum(mx, sh)
                    mn = jnp.minimum(mn, sh)
        is_ext = ((d > mx) & (d > contrast_thresh)) | \
                 ((d < mn) & (d < -contrast_thresh))

        # edge rejection via the spatial Hessian trace^2/det ratio
        dxx = jnp.roll(d, -1, 1) + jnp.roll(d, 1, 1) - 2 * d
        dyy = jnp.roll(d, -1, 0) + jnp.roll(d, 1, 0) - 2 * d
        dxy = (jnp.roll(jnp.roll(d, -1, 0), -1, 1) -
               jnp.roll(jnp.roll(d, -1, 0), 1, 1) -
               jnp.roll(jnp.roll(d, 1, 0), -1, 1) +
               jnp.roll(jnp.roll(d, 1, 0), 1, 1)) * 0.25
        tr = dxx + dyy
        det = dxx * dyy - dxy * dxy
        r1 = (edge_ratio + 1.0) ** 2 / edge_ratio
        not_edge = (det > 0) & (tr * tr < r1 * det)
        resp.append(jnp.where(is_ext & not_edge, jnp.abs(d), -jnp.inf))
    return jnp.stack(resp)            # [S-2,H,W]


@partial(jax.jit, static_argnames=("max_keypoints", "num_levels", "margins",
                                   "detector", "scales_per_octave"))
def detect_and_describe(
    gray: jnp.ndarray,            # [H,W] float32 (any consistent scale)
    *,
    max_keypoints: int = 512,
    num_levels: int = 3,
    margins: Tuple[float, float, float, float] = (0.0, 0.0, 0.0, 0.0),
    min_score: float = 1e-7,
    detector: str = "dog",
    scales_per_octave: int = 3,
) -> Keypoints:
    """Detect up to K keypoints and compute SIFT-layout descriptors.

    detector="dog" (default): difference-of-Gaussians scale-space extrema
    with contrast + edge rejection — the detector SiftGPU implements.
    detector="harris": the original multi-scale corner stopgap.
    margins = (hl, hr, vl, vr) ratios (FeatureProc.cpp:28-43)."""
    from .filters import margin_mask

    h, w = gray.shape
    img = gray.astype(jnp.float32)
    img = img / jnp.maximum(jnp.max(jnp.abs(img)), 1e-8)

    hl, hr, vl, vr = margins
    all_uv, all_score, all_scale = [], [], []

    if detector == "dog":
        sigma0 = 1.6
        k = 2.0 ** (1.0 / scales_per_octave)
        base = gaussian_blur(img, sigma0)
        for octave in range(num_levels):
            oh, ow = base.shape
            # gaussian stack for this octave
            gs = [base]
            sig = sigma0
            for s in range(scales_per_octave + 2):
                # incremental blur so level s has total sigma sigma0 * k^s
                gs.append(gaussian_blur(gs[-1],
                                        float(sig * (k * k - 1.0) ** 0.5)))
                sig *= k
            dogs = jnp.stack([gs[i + 1] - gs[i] for i in range(len(gs) - 1)])
            resp = _dog_extrema(dogs, contrast_thresh=0.005)
            mm = margin_mask(oh, ow, hl, hr, vl, vr)
            mm = mm * margin_mask(oh, ow, 8.0 / ow, 8.0 / ow, 8.0 / oh,
                                  8.0 / oh)
            resp = jnp.where(mm[None] > 0, resp, -jnp.inf)
            kk = max_keypoints
            score, flat = jax.lax.top_k(resp.reshape(-1), kk)
            per = oh * ow
            sflat = flat % per
            sidx = flat // per
            ui = (sflat % ow).astype(jnp.int32)
            vi = (sflat // ow).astype(jnp.int32)

            # subpixel refinement: 2D quadratic fit on the keypoint's DoG
            # response neighborhood (offset = -H^-1 g, clamped to +-0.5)
            dsel = jnp.abs(dogs[jnp.clip(sidx + 1, 0, dogs.shape[0] - 1)])

            def at(dy, dx):
                yy2 = jnp.clip(vi + dy, 0, oh - 1)
                xx2 = jnp.clip(ui + dx, 0, ow - 1)
                return dsel[jnp.arange(kk), yy2, xx2]

            gx = 0.5 * (at(0, 1) - at(0, -1))
            gy = 0.5 * (at(1, 0) - at(-1, 0))
            hxx = at(0, 1) + at(0, -1) - 2 * at(0, 0)
            hyy = at(1, 0) + at(-1, 0) - 2 * at(0, 0)
            hxy = 0.25 * (at(1, 1) - at(1, -1) - at(-1, 1) + at(-1, -1))
            det = hxx * hyy - hxy * hxy
            det = jnp.where(jnp.abs(det) < 1e-12, 1e-12, det)
            offx = jnp.clip(-(hyy * gx - hxy * gy) / det, -0.5, 0.5)
            offy = jnp.clip(-(hxx * gy - hxy * gx) / det, -0.5, 0.5)

            uu = (ui.astype(jnp.float32) + offx) * (2.0 ** octave)
            vv = (vi.astype(jnp.float32) + offy) * (2.0 ** octave)
            all_uv.append(jnp.stack([uu, vv], -1))
            all_score.append(score)

            # scale interpolation: 1D quadratic fit along the DoG scale
            # axis at the keypoint pixel (same -g/H recipe as the spatial
            # fit), so sigma lands between discrete pyramid levels
            def at_s(ds):
                ss = jnp.clip(sidx + 1 + ds, 0, dogs.shape[0] - 1)
                return jnp.abs(dogs[ss, jnp.clip(vi, 0, oh - 1),
                                    jnp.clip(ui, 0, ow - 1)])

            gs1 = 0.5 * (at_s(1) - at_s(-1))
            hss = at_s(1) + at_s(-1) - 2 * at_s(0)
            hss = jnp.where(jnp.abs(hss) < 1e-12, -1e-12, hss)
            offs = jnp.clip(-gs1 / hss, -0.5, 0.5)

            # sampling step ~ the level's sigma in source pixels
            lvl_sigma = sigma0 * (k ** (sidx.astype(jnp.float32) + 1.0 +
                                        offs))
            all_scale.append(lvl_sigma / sigma0 * (2.0 ** octave))
            if octave + 1 < num_levels:
                base = _downsample2(gs[scales_per_octave])
    else:
        levels = []
        cur = gaussian_blur(img, 1.0)
        for lv in range(num_levels):
            levels.append(cur)
            if lv + 1 < num_levels:
                cur = _downsample2(gaussian_blur(cur, 1.2))
        for lv, lim in enumerate(levels):
            lh, lw = lim.shape
            r = _harris(lim)
            mm = margin_mask(lh, lw, hl, hr, vl, vr)
            mm = mm * margin_mask(lh, lw, 8.0 / lw, 8.0 / lw, 8.0 / lh,
                                  8.0 / lh)
            r = jnp.where((mm > 0) & _nms3(r), r, -jnp.inf)
            score, flat = jax.lax.top_k(r.ravel(), max_keypoints)
            uu = (flat % lw).astype(jnp.float32) * (2.0 ** lv)
            vv = (flat // lw).astype(jnp.float32) * (2.0 ** lv)
            all_uv.append(jnp.stack([uu, vv], -1))
            all_score.append(score)
            all_scale.append(jnp.full((max_keypoints,), 2.0 ** lv))

    uv = jnp.concatenate(all_uv)
    score = jnp.concatenate(all_score)
    scale = jnp.concatenate(all_scale)
    score_top, sel = jax.lax.top_k(score, max_keypoints)
    uv = uv[sel]
    scale = scale[sel]

    # full-resolution Gaussian gradient stacks in half-octave sigma steps
    # (sigma_l = 1.6 * 2^(l/2)); every keypoint samples orientation and
    # descriptor gradients from the level matching its scale — the
    # Lowe-correct smoothing that keeps gradient directions isotropic
    n_glv = max(2 * num_levels, 2)
    blur = gaussian_blur(img, 1.6)
    gx_list, gy_list = [], []
    sig = 1.6
    for _ in range(n_glv):
        gx_list.append((jnp.roll(blur, -1, 1) - jnp.roll(blur, 1, 1)) * 0.5)
        gy_list.append((jnp.roll(blur, -1, 0) - jnp.roll(blur, 1, 0)) * 0.5)
        nxt = sig * (2.0 ** 0.5)
        blur = gaussian_blur(blur, float((nxt * nxt - sig * sig) ** 0.5))
        sig = nxt
    gx_stack = jnp.stack(gx_list)
    gy_stack = jnp.stack(gy_list)
    glvl = _grad_level(scale, n_glv)

    ang1, ang2, ratio2 = jax.vmap(
        lambda lv, p, s: _orientation(gx_stack, gy_stack, lv, p, s))(
        glvl, uv, scale)
    # dual orientation (SIFT): keypoints with a rival histogram peak
    # >= 0.8*max also enter at the second angle; the final top-K keeps
    # capacity static (secondary copies get an epsilon score penalty so
    # they never evict their primaries)
    score2 = jnp.where(ratio2 >= 0.8, score_top * (1.0 - 1e-6), -jnp.inf)
    uv = jnp.concatenate([uv, uv])
    scale = jnp.concatenate([scale, scale])
    ang = jnp.concatenate([ang1, ang2])
    score_all = jnp.concatenate([score_top, score2])
    score_top, sel = jax.lax.top_k(score_all, max_keypoints)
    uv = uv[sel]
    scale = scale[sel]
    ang = ang[sel]
    valid = jnp.isfinite(score_top) & (score_top > min_score)

    glvl = _grad_level(scale, n_glv)
    desc = jax.vmap(
        lambda lv, p, s, a: _descriptor(gx_stack, gy_stack, lv, p, s, a))(
        glvl, uv, scale, ang)
    desc = jnp.where(valid[:, None], desc, 0.0)
    return Keypoints(uv, scale, ang, score_top, valid, desc)


def detect_batch(grays: jnp.ndarray, **kw) -> Keypoints:
    """vmap detect_and_describe over a batch of images [N,H,W] — the
    equivalent of DetectFeature's loop (FeatureProc.cpp:103-112)."""
    return jax.vmap(lambda g: detect_and_describe(g, **kw))(grays)
