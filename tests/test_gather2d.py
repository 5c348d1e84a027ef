import numpy as np
import jax.numpy as jnp

from multiviewstitch_tpu.ops.gather2d import (gather_image,
                                              gather_image_banded,
                                              gather_batched)


def ref_gather(src, iy, ix):
    H, W = src.shape
    return src[np.clip(iy, 0, H - 1), np.clip(ix, 0, W - 1)]


def test_identity_gather():
    rng = np.random.default_rng(0)
    src = rng.normal(size=(48, 64)).astype(np.float32)
    yy, xx = np.mgrid[0:48, 0:64].astype(np.int32)
    out, ok = gather_image(jnp.asarray(src), jnp.asarray(yy),
                           jnp.asarray(xx))
    assert np.asarray(ok).all()
    np.testing.assert_allclose(np.asarray(out), src, atol=1e-6)


def test_coherent_warp_exact():
    rng = np.random.default_rng(1)
    src = rng.normal(size=(96, 128)).astype(np.float32)
    yy, xx = np.mgrid[0:96, 0:128]
    # smooth warp: global shift + sinusoidal wobble (video-like reprojection)
    iy = np.clip(yy + 7 + (3 * np.sin(xx / 17.0)).astype(int), 0, 95)
    ix = np.clip(xx - 12 + (4 * np.cos(yy / 13.0)).astype(int), 0, 127)
    out, ok = gather_image(jnp.asarray(src), jnp.asarray(iy.astype(np.int32)),
                           jnp.asarray(ix.astype(np.int32)))
    assert np.asarray(ok).all()
    np.testing.assert_allclose(np.asarray(out), ref_gather(src, iy, ix),
                               atol=1e-6)


def test_banded_marks_out_of_window():
    src = np.arange(64 * 64, dtype=np.float32).reshape(64, 64)
    yy, xx = np.mgrid[0:64, 0:64]
    iy = yy.copy()
    iy[10, 5] = 63          # one violent jump out of its band's window
    out, ok = gather_image_banded(jnp.asarray(src),
                                  jnp.asarray(iy.astype(np.int32)),
                                  jnp.asarray(xx.astype(np.int32)),
                                  window_rows=16)
    ok = np.asarray(ok)
    assert not ok[10, 5]
    assert ok.mean() > 0.99


def test_patchup_fixes_misses_exactly():
    rng = np.random.default_rng(2)
    src = rng.normal(size=(80, 96)).astype(np.float32)
    yy, xx = np.mgrid[0:80, 0:96]
    iy = yy.copy()
    # 50 wild pixels
    ys = rng.integers(0, 80, 50)
    xs = rng.integers(0, 96, 50)
    iy[ys, xs] = rng.integers(0, 80, 50)
    out, ok = gather_image(jnp.asarray(src), jnp.asarray(iy.astype(np.int32)),
                           jnp.asarray(xx.astype(np.int32)),
                           window_rows=16)
    assert np.asarray(ok).all()
    np.testing.assert_allclose(np.asarray(out), ref_gather(src, iy, xx),
                               atol=1e-6)


def test_fully_random_field_degrades_to_masked_not_wrong():
    rng = np.random.default_rng(3)
    src = rng.normal(size=(64, 64)).astype(np.float32)
    iy = rng.integers(0, 64, size=(64, 64)).astype(np.int32)
    ix = rng.integers(0, 64, size=(64, 64)).astype(np.int32)
    out, ok = gather_image(jnp.asarray(src), jnp.asarray(iy),
                           jnp.asarray(ix), window_rows=16,
                           miss_capacity=256)
    ok = np.asarray(ok)
    ref = ref_gather(src, np.asarray(iy), np.asarray(ix))
    # where ok, values are exact; where not ok, they're masked (never wrong)
    np.testing.assert_allclose(np.asarray(out)[ok], ref[ok], atol=1e-6)


def test_batched_matches_loop():
    rng = np.random.default_rng(4)
    src = rng.normal(size=(3, 40, 56)).astype(np.float32)
    yy, xx = np.mgrid[0:40, 0:56]
    iy = np.stack([np.clip(yy + s, 0, 39) for s in (0, 3, -2)]).astype(
        np.int32)
    ix = np.tile(xx.astype(np.int32), (3, 1, 1))
    out, ok = gather_batched(jnp.asarray(src), jnp.asarray(iy),
                             jnp.asarray(ix))
    for n in range(3):
        np.testing.assert_allclose(np.asarray(out[n]),
                                   ref_gather(src[n], iy[n], ix[n]),
                                   atol=1e-6)


def test_precision_modes_error_bounds():
    """split2 (hi/lo bf16 decomposition) must be f32-faithful to <= ~2^-17
    (~1e-5) relative; fast (single bf16 quantization) to ~4e-3. Both bounds hold on
    any backend (the decomposition happens in the op, not the MXU)."""
    from multiviewstitch_tpu.ops.gather2d import gather_image_banded
    H, W = 64, 96
    rng = np.random.default_rng(3)
    src = (rng.normal(size=(H, W)) * 7.3 + 0.1).astype(np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    iy = np.clip(yy + rng.integers(-4, 5, size=(H, W)), 0, H - 1)
    ix = np.clip(xx + rng.integers(-4, 5, size=(H, W)), 0, W - 1)
    ref = src[iy, ix]

    for mode, bound in (("exact", 0.0), ("split2", 1e-5), ("fast", 8e-3)):
        vals, ok = gather_image_banded(
            jnp.asarray(src), jnp.asarray(iy.astype(np.int32)),
            jnp.asarray(ix.astype(np.int32)), mode=mode)
        ok = np.asarray(ok)
        assert ok.mean() > 0.99
        rel = np.abs(np.asarray(vals)[ok] - ref[ok]) / np.abs(ref[ok])
        assert rel.max() <= bound, (mode, rel.max())


def test_static_column_tiles_match_full_width():
    """Static column-tiled mode (tile_cols/window_cols) equals the
    full-width gather wherever its (column) window covers the target;
    out-of-window pixels are masked, never wrong."""
    from multiviewstitch_tpu.ops.gather2d import gather_image_banded
    H, W = 64, 256
    rng = np.random.default_rng(5)
    src = rng.normal(size=(H, W)).astype(np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    iy = np.clip(yy + (4 * np.sin(xx / 19.0)).astype(int), 0, H - 1)
    ix = np.clip(xx + (11 * np.cos(yy / 13.0)).astype(int), 0, W - 1)
    ref = src[iy, ix]
    for mode in ("exact", "split2"):
        vals, ok = gather_image_banded(
            jnp.asarray(src), jnp.asarray(iy.astype(np.int32)),
            jnp.asarray(ix.astype(np.int32)), tile_cols=64,
            window_cols=128, mode=mode)
        ok = np.asarray(ok)
        assert ok.mean() > 0.98, ok.mean()     # 11px swing, 32px pad
        tol = 0 if mode == "exact" else 1e-4
        np.testing.assert_allclose(np.asarray(vals)[ok], ref[ok], atol=tol)
    # a violent column jump must be masked
    ix2 = ix.copy()
    ix2[10, 10] = W - 1
    vals, ok = gather_image_banded(
        jnp.asarray(src), jnp.asarray(iy.astype(np.int32)),
        jnp.asarray(ix2.astype(np.int32)), tile_cols=64, window_cols=128)
    assert not np.asarray(ok)[10, 10]


def ref_bilinear(src, sy, sx):
    H, W = src.shape
    x0 = np.clip(np.floor(sx), 0, W - 2).astype(np.int64)
    y0 = np.clip(np.floor(sy), 0, H - 2).astype(np.int64)
    fx = np.clip(sx - x0, 0.0, 1.0)
    fy = np.clip(sy - y0, 0.0, 1.0)
    return (src[y0, x0] * (1 - fx) * (1 - fy) +
            src[y0, x0 + 1] * fx * (1 - fy) +
            src[y0 + 1, x0] * (1 - fx) * fy +
            src[y0 + 1, x0 + 1] * fx * fy)


def test_bilinear_multichannel_smooth_warp():
    """gather_images_bilinear vs the exact 4-tap on a smooth warp field,
    all channels through the shared selector, with and without column
    windows."""
    from multiviewstitch_tpu.ops.gather2d import gather_images_bilinear
    H, W, C = 96, 160, 3
    rng = np.random.default_rng(7)
    srcs = (rng.normal(size=(C, H, W)) * 11.0 + 3.0).astype(np.float32)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    sy = np.clip(yy + 5.25 + 3.0 * np.sin(xx / 23.0), 0, H - 1)
    sx = np.clip(xx - 7.75 + 6.0 * np.cos(yy / 17.0), 0, W - 1)
    ref = np.stack([ref_bilinear(srcs[c], sy, sx) for c in range(C)])
    for wc in (0, 64):
        vals, ok = gather_images_bilinear(
            jnp.asarray(srcs), jnp.asarray(sy), jnp.asarray(sx),
            tile_cols=32, window_rows=32, window_cols=wc)
        assert np.asarray(ok).all(), wc
        scale = np.maximum(np.abs(ref), 1.0)
        err = np.abs(np.asarray(vals) - ref) / scale
        assert err.max() < 5e-4, (wc, err.max())  # ~2^-13: weights are bf16-split too


def test_bilinear_valid_mask_excludes_garbage():
    """Pixels marked invalid must not drag the window means nor flood
    the patch capacity; valid pixels stay exact."""
    from multiviewstitch_tpu.ops.gather2d import gather_images_bilinear
    H, W = 64, 128
    rng = np.random.default_rng(8)
    src = rng.normal(size=(1, H, W)).astype(np.float32)
    yy, xx = np.mgrid[0:H, 0:W].astype(np.float32)
    sy = yy.copy()
    sx = xx.copy()
    valid = np.ones((H, W), bool)
    # left half: garbage coords (all clipped to a far corner), invalid
    valid[:, : W // 2] = False
    sy[:, : W // 2] = H - 1.0
    sx[:, : W // 2] = W - 1.0
    vals, ok = gather_images_bilinear(
        jnp.asarray(src), jnp.asarray(sy), jnp.asarray(sx),
        jnp.asarray(valid), tile_cols=32, window_rows=16,
        window_cols=64, miss_capacity=16)
    ok = np.asarray(ok)
    assert ok.all()          # invalid pixels count as hits by contract
    ref = ref_bilinear(src[0], sy, sx)
    np.testing.assert_allclose(np.asarray(vals)[0][valid], ref[valid],
                               atol=1e-4)
