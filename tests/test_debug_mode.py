"""Numeric debug mode + elastic stage retry (SURVEY §5.2-5.3)."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multiviewstitch_tpu.utils.debug_mode import (debug_numerics,
                                                  check_finite, run_stage)


def test_debug_numerics_catches_nan_inside_jit():
    @jax.jit
    def bad(x):
        return jnp.log(x - 2.0)          # NaN for x < 2

    with debug_numerics():
        with pytest.raises((FloatingPointError, Exception)) as ei:
            jax.block_until_ready(bad(jnp.asarray([1.0])))
        assert "nan" in str(ei.value).lower()
    # and the flag is restored afterwards
    jax.block_until_ready(bad(jnp.asarray([1.0])))


def test_check_finite_names_offender():
    check_finite("ok", a=np.ones(3))
    with pytest.raises(FloatingPointError, match="'b'"):
        check_finite("stagex", a=np.ones(3),
                     b=np.array([1.0, np.nan, np.inf]))


def test_run_stage_retries_transient_and_raises_real():
    calls = {"n": 0}

    def flaky():
        calls["n"] += 1
        if calls["n"] < 3:
            raise RuntimeError("RPC UNAVAILABLE: socket closed (preempt)")
        return 42

    assert run_stage(flaky, stage="t", retries=3, backoff_s=0.01) == 42
    assert calls["n"] == 3

    def real_bug():
        raise ValueError("shape mismatch")

    with pytest.raises(ValueError, match="shape mismatch"):
        run_stage(real_bug, stage="t", retries=3, backoff_s=0.01)

    def always_down():
        raise RuntimeError("DEADLINE_EXCEEDED")

    with pytest.raises(RuntimeError, match="DEADLINE_EXCEEDED"):
        run_stage(always_down, stage="t", retries=2, backoff_s=0.01)
