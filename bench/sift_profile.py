"""Per-stage SIFT profile on the chip: detection pyramid vs gradient
stacks vs orientation vs descriptor vs match. Relative numbers guide the
round-3 feature-kernel rework (VERDICT r2 item 2).

Each stage is timed as an on-device lax.scan chain with a real data
dependency, reduced to a scalar on device (never fetch tensors — CLAUDE.md),
minus the measured host round trip.

Usage: python bench/sift_profile.py [--cpu]
"""

import argparse
import json
import sys
import time
from pathlib import Path

import numpy as np

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))
sys.path.insert(0, str(Path(__file__).resolve().parent))
from sift_bench import make_frames


def timeit(fn, *args, reps=3):
    out = fn(*args)
    float(out)                      # warm + sync
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        out = fn(*args)
        float(out)
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--cpu", action="store_true")
    ap.add_argument("--kp", type=int, default=512)
    ap.add_argument("--reps", type=int, default=8)
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
        from jax._src import xla_bridge
        xla_bridge._backend_factories.pop("axon", None)
    jax.config.update("jax_compilation_cache_dir", "/tmp/mvs_jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 5.0)
    import jax.numpy as jnp
    from multiviewstitch_tpu.ops import features as F

    n, h, w = 8, 480, 640
    frames = jnp.asarray(make_frames(n, h, w))
    REPS = args.reps
    K = args.kp

    # host round trip probe
    tiny = jax.jit(lambda x: x + 1.0)
    float(tiny(jnp.float32(1.0)))
    t0 = time.perf_counter()
    for _ in range(20):
        float(tiny(jnp.float32(1.0)))
    rt = (time.perf_counter() - t0) / 20
    print(f"host round trip: {rt*1e3:.1f} ms", file=sys.stderr)

    def chain(body):
        @jax.jit
        def run(fr):
            def step(carry, _):
                s = body(carry)
                return carry + s * 1e-20, s
            out, _ = jax.lax.scan(step, fr, None, length=REPS)
            return jnp.sum(out) * 1e-20
        return run

    results = {}

    # full detect+describe per frame (vmapped over 8)
    def full(fr):
        kp = F.detect_batch(fr, max_keypoints=K)
        return kp.desc.sum() + kp.uv.sum()
    results["full_detect_describe"] = (
        timeit(chain(full), frames) - rt) / REPS

    # detection only (pyramid + DoG + extrema + topk): call the internals
    # by running detect with a descriptor-free variant — approximate by
    # timing the pieces directly.
    def pyramid_only(fr):
        def one(img):
            img = img / jnp.maximum(jnp.max(jnp.abs(img)), 1e-8)
            sigma0, spo = 1.6, 3
            kfac = 2.0 ** (1.0 / spo)
            base = F.gaussian_blur(img, sigma0)
            acc = 0.0
            for octave in range(3):
                gs = [base]
                sig = sigma0
                for s in range(spo + 2):
                    gs.append(F.gaussian_blur(
                        gs[-1], float(sig * (kfac * kfac - 1.0) ** 0.5)))
                    sig *= kfac
                dogs = jnp.stack([gs[i + 1] - gs[i]
                                  for i in range(len(gs) - 1)])
                acc = acc + dogs.sum()
                if octave + 1 < 3:
                    base = F._downsample2(gs[spo])
            return acc
        return jax.vmap(one)(fr).sum()
    results["pyramid_dog"] = (timeit(chain(pyramid_only), frames) - rt) / REPS

    def extrema_only(fr):
        def one(img):
            img = img / jnp.maximum(jnp.max(jnp.abs(img)), 1e-8)
            base = F.gaussian_blur(img, 1.6)
            gs = [base]
            sig = 1.6
            kfac = 2.0 ** (1.0 / 3)
            for s in range(5):
                gs.append(F.gaussian_blur(
                    gs[-1], float(sig * (kfac * kfac - 1.0) ** 0.5)))
                sig *= kfac
            dogs = jnp.stack([gs[i + 1] - gs[i] for i in range(len(gs) - 1)])
            resp = F._dog_extrema(dogs, contrast_thresh=0.005)
            # approx_max_k like production (round 5: this stage previously
            # measured the EXACT top_k production no longer runs, which
            # overstated extrema by the ~10 ms sort)
            score, flat = jax.lax.approx_max_k(resp.reshape(-1), K,
                                               recall_target=0.99)
            return score.sum() + flat.sum()
        return jax.vmap(one)(fr).sum()
    results["extrema_topk_oct0"] = (
        timeit(chain(extrema_only), frames) - rt) / REPS

    # gradient stacks
    def grads_only(fr):
        def one(img):
            img = img / jnp.maximum(jnp.max(jnp.abs(img)), 1e-8)
            gxa, gya, _ = F._grad_pyramid(img, 3)
            return gxa.sum() + gya.sum()
        return jax.vmap(one)(fr).sum()
    results["gradient_stacks"] = (
        timeit(chain(grads_only), frames) - rt) / REPS

    # orientation + descriptor on synthetic keypoints (the gather path)
    rng = np.random.default_rng(0)
    uv = jnp.asarray(rng.uniform(20, 400, size=(n, K, 2)).astype(np.float32))
    scale = jnp.asarray(rng.uniform(1.0, 4.0, size=(n, K)).astype(np.float32))
    ang = jnp.asarray(
        rng.uniform(-np.pi, np.pi, size=(n, K)).astype(np.float32))

    def make_stacks(img):
        img = img / jnp.maximum(jnp.max(jnp.abs(img)), 1e-8)
        return F._grad_pyramid(img, 3)

    def orient_only(fr):
        def one(img, uv1, sc1):
            gxa, gya, meta = make_stacks(img)
            lvl = F._grad_level(sc1, 6)
            cache = F._build_window_cache(gxa, gya, meta, lvl, uv1)
            a1, a2, r2 = F._orientation_batch(cache, meta, lvl, uv1, sc1)
            return a1.sum() + r2.sum()
        return jax.vmap(one)(fr, uv, scale).sum()
    results["stacks_plus_orientation"] = (
        timeit(chain(orient_only), frames) - rt) / REPS

    def desc_only(fr):
        def one(img, uv1, sc1, an1):
            gxa, gya, meta = make_stacks(img)
            lvl = F._grad_level(sc1, 6)
            cache = F._build_window_cache(gxa, gya, meta, lvl, uv1)
            d = F._descriptor_batch(cache, meta, lvl, uv1, sc1, an1)
            return d.sum()
        return jax.vmap(one)(fr, uv, scale, ang).sum()
    results["stacks_plus_descriptor"] = (
        timeit(chain(desc_only), frames) - rt) / REPS

    # match only
    from multiviewstitch_tpu.ops.match import match_descriptors
    desc = jnp.asarray(rng.normal(size=(n, K, 128)).astype(np.float32))
    validm = jnp.ones((n, K), bool)

    def match_only(d):
        m = jax.vmap(lambda a, va, b, vb: match_descriptors(
            a, va, b, vb).valid.sum())(
            d[:-1], validm[:-1], d[1:], validm[1:])
        return m.sum().astype(jnp.float32)
    results["match"] = (timeit(chain(match_only), desc) - rt) / REPS

    for k, v in results.items():
        print(f"{k:28s} {v*1e3:8.1f} ms per 8-frame call")
    print(json.dumps({k: round(v * 1e3, 2) for k, v in results.items()}))


if __name__ == "__main__":
    main()
