"""Gather microbenchmark on the real chip: XLA banded (exact 3-pass vs
lossy 1-pass) vs the Pallas VMEM kernel, on VGA-sized warps.

Methodology (see CLAUDE.md): each variant is timed as a lax.scan chain of
K dependent gathers (src carried through, so XLA cannot CSE or overlap
across steps), synchronized with a host fetch; the warmed tiny-probe round
trip is subtracted. Run: python bench/gather_bench.py [--iters 32]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(
    __file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--iters", type=int, default=32)
    ap.add_argument("--height", type=int, default=480)
    ap.add_argument("--width", type=int, default=640)
    ap.add_argument("--reps", type=int, default=5)
    args = ap.parse_args()

    import numpy as np
    import jax
    import jax.numpy as jnp
    from functools import partial
    from multiviewstitch_tpu.ops.gather2d import gather_image_banded
    from multiviewstitch_tpu.ops.pallas_gather import pallas_gather_banded

    H, W, K = args.height, args.width, args.iters
    rng = np.random.default_rng(0)
    src = jnp.asarray(rng.normal(size=(H, W)).astype(np.float32))
    yy, xx = np.mgrid[0:H, 0:W]
    iy = jnp.asarray(np.clip(yy + (6 * np.sin(xx / 23.0)).astype(int), 0,
                             H - 1).astype(np.int32))
    ix = jnp.asarray(np.clip(xx + (9 * np.cos(yy / 17.0)).astype(int), 0,
                             W - 1).astype(np.int32))

    def chain(gather_fn):
        @jax.jit
        def run(s):
            def body(carry, _):
                v, _ok = gather_fn(carry, iy, ix)
                return v, ()
            out, _ = jax.lax.scan(body, s, None, length=K)
            return out
        return run

    # warmed tiny probe measures the host round trip through the relay
    probe = jax.jit(lambda x: x + 1.0)
    p = probe(jnp.ones(8))
    float(p[0])
    t0 = time.perf_counter()
    for _ in range(8):
        float(probe(jnp.ones(8))[0])
    rt = (time.perf_counter() - t0) / 8

    variants = {
        "xla_exact_3pass": chain(partial(gather_image_banded, mode="exact")),
        "xla_split2": chain(partial(gather_image_banded, mode="split2")),
        "xla_split2_coltiled": chain(partial(
            gather_image_banded, mode="split2", tile_cols=128,
            window_cols=256)),
        "xla_lossy_1pass": chain(partial(gather_image_banded, mode="fast")),
        "pallas_exact": chain(pallas_gather_banded),
    }
    results = {}
    for name, fn in variants.items():
        try:
            out = fn(src)
            float(np.asarray(out[0, 0]))        # force completion
            times = []
            for _ in range(args.reps):
                t0 = time.perf_counter()
                out = fn(src)
                float(np.asarray(out[0, 0]))
                times.append(time.perf_counter() - t0)
            per_call_ms = (np.median(times) - rt) / K * 1e3
            results[name] = per_call_ms
            print(json.dumps({"metric": f"gather_{name}",
                              "value": round(per_call_ms, 4),
                              "unit": f"ms per {H}x{W} gather",
                              "all_ms": [round((t - rt) / K * 1e3, 4)
                                         for t in times]}), flush=True)
        except Exception as e:  # keep going if one variant fails to compile
            results[name] = None
            print(json.dumps({"metric": f"gather_{name}",
                              "error": repr(e)[:500]}), flush=True)
    return results


if __name__ == "__main__":
    main()
