"""Pallas banded-gather kernel, validated in interpreter mode on CPU
(the compiled path runs on TPU; numerics are identical by construction)."""

import numpy as np
import jax.numpy as jnp

from multiviewstitch_tpu.ops.pallas_gather import pallas_gather_banded


def test_pallas_gather_matches_reference():
    H, W = 48, 64
    rng = np.random.default_rng(0)
    src = rng.normal(size=(H, W)).astype(np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    iy = np.clip(yy + 3 + (2 * np.sin(xx / 9.0)).astype(int), 0,
                 H - 1).astype(np.int32)
    ix = np.clip(xx - 5 + (3 * np.cos(yy / 7.0)).astype(int), 0,
                 W - 1).astype(np.int32)
    vals, ok = pallas_gather_banded(jnp.asarray(src), jnp.asarray(iy),
                                    jnp.asarray(ix), window_rows=16,
                                    interpret=True)
    ref = src[iy, ix]
    assert np.asarray(ok).all()
    np.testing.assert_allclose(np.asarray(vals), ref, atol=1e-6)


def test_pallas_gather_marks_out_of_window():
    H, W = 32, 32
    src = np.arange(H * W, dtype=np.float32).reshape(H, W)
    yy, xx = np.mgrid[0:H, 0:W]
    iy = yy.copy()
    iy[4, 4] = H - 1          # violent jump
    vals, ok = pallas_gather_banded(jnp.asarray(src),
                                    jnp.asarray(iy.astype(np.int32)),
                                    jnp.asarray(xx.astype(np.int32)),
                                    window_rows=8, interpret=True)
    ok = np.asarray(ok)
    assert not ok[4, 4]
    v = np.asarray(vals)
    np.testing.assert_allclose(v[ok], src[iy, xx][ok], atol=1e-6)


def test_pallas_gather_agrees_with_xla_banded():
    from multiviewstitch_tpu.ops.gather2d import gather_image_banded
    H, W = 40, 48
    rng = np.random.default_rng(1)
    src = rng.normal(size=(H, W)).astype(np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    iy = np.clip(yy + rng.integers(-3, 4, size=(H, W)), 0, H - 1).astype(
        np.int32)
    ix = np.clip(xx + rng.integers(-3, 4, size=(H, W)), 0, W - 1).astype(
        np.int32)
    v1, ok1 = pallas_gather_banded(jnp.asarray(src), jnp.asarray(iy),
                                   jnp.asarray(ix), window_rows=16,
                                   interpret=True)
    v2, ok2 = gather_image_banded(jnp.asarray(src), jnp.asarray(iy),
                                  jnp.asarray(ix), window_rows=16)
    both = np.asarray(ok1) & np.asarray(ok2)
    np.testing.assert_allclose(np.asarray(v1)[both], np.asarray(v2)[both],
                               atol=1e-6)
