"""Scaling-efficiency benchmark: sharded pipeline throughput vs device count.

BASELINE config 5 requires >=0.8 scaling efficiency at N>=2 hosts for the
partitioned view graph + Schur-complement BA. Real multi-chip hardware is
not attached to this container (single tunneled chip), so this harness
measures the same sharded programs on an N-virtual-device CPU mesh —
validating the sharding/collective structure and the efficiency
methodology; on a pod slice the identical code runs over ICI.

Virtual CPU devices share one host's cores, so WALL-CLOCK cannot improve
with N here; the meaningful simulator-side metric is *partitioning
efficiency*: per-device compiled FLOPs should shrink as 1/N (collective
overhead shows up as excess). That is what this harness reports, plus wall
times for reference. On real hardware the same code yields true scaling
curves.

Run:  python bench/scaling.py [--devices 8] [--frames 16]
Emits one JSON line per stage: partition efficiency + wall times.
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
    ap.add_argument("--devices", type=int, default=8)
    ap.add_argument("--frames", type=int, default=16)
    ap.add_argument("--height", type=int, default=96)
    ap.add_argument("--width", type=int, default=128)
    ap.add_argument("--skip-e2e", action="store_true",
                    help="skip the config-5 64-view end-to-end block")
    args = ap.parse_args()

    os.environ["XLA_FLAGS"] = (os.environ.get("XLA_FLAGS", "") +
                               f" --xla_force_host_platform_device_count="
                               f"{args.devices}")
    import jax
    jax.config.update("jax_platforms", "cpu")
    try:
        from jax._src import xla_bridge
        xla_bridge._backend_factories.pop("axon", None)
    except Exception:
        pass
    import numpy as np
    import jax.numpy as jnp
    from jax.sharding import NamedSharding, PartitionSpec as P
    from multiviewstitch_tpu.parallel.mesh import make_mesh
    from multiviewstitch_tpu.core.cameras import CameraBatch
    from multiviewstitch_tpu.ops.consistency import check_consistency
    from multiviewstitch_tpu.parallel import ba_dist
    from multiviewstitch_tpu.solvers.ba import BAState

    n, h, w = args.frames, args.height, args.width
    rng = np.random.default_rng(0)
    disp = rng.uniform(0.2, 0.4, size=(n, h, w)).astype(np.float32)
    K = np.zeros((n, 3, 3), np.float32)
    K[:, 0, 0] = K[:, 1, 1] = 100.0
    K[:, 0, 2] = (w - 1) / 2
    K[:, 1, 2] = (h - 1) / 2
    K[:, 2, 2] = 1
    R = np.broadcast_to(np.eye(3, dtype=np.float32), (n, 3, 3)).copy()
    t = np.zeros((n, 3), np.float32)
    t[:, 0] = np.linspace(0, 0.3, n)

    def time_frontend(nd):
        mesh = make_mesh(nd, ("views",))
        sh = NamedSharding(mesh, P("views"))
        arrs = [jax.device_put(jnp.asarray(x), sh)
                for x in (disp, K, R, t)]
        cams = CameraBatch(arrs[1], arrs[2], arrs[3], w, h)
        f = jax.jit(lambda d: check_consistency(
            d, cams, min_dsp=1e-3, max_dsp=10.0, reproj_err=4))
        lowered = f.lower(arrs[0]).compile()
        flops = lowered.cost_analysis().get("flops", 0.0)
        o = f(arrs[0])
        jax.block_until_ready(o)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            o = f(arrs[0])
            jax.block_until_ready(o)
            ts.append(time.perf_counter() - t0)
        return min(ts), float(flops)

    def time_ba(nd):
        mesh = make_mesh(nd, ("views",))
        n_cams, n_pts = 6, 64 * args.devices
        Kb = np.array([[100.0, 0, 32.0], [0, 100.0, 24.0], [0, 0, 1]],
                      np.float32)
        pts = rng.uniform(-0.5, 0.5, size=(n_pts, 3)).astype(np.float32)
        pts[:, 2] += 4.0
        ci, pi, uvs = [], [], []
        for c in range(n_cams):
            tv = np.array([0.1 * c, 0, 0], np.float32)
            pc = pts + tv
            uv = np.stack([Kb[0, 0] * pc[:, 0] / pc[:, 2] + Kb[0, 2],
                           Kb[1, 1] * pc[:, 1] / pc[:, 2] + Kb[1, 2]], -1)
            ci += [c] * n_pts
            pi += list(range(n_pts))
            uvs += list(uv)
        blocks = ba_dist.group_by_point(Kb, ci, pi, np.asarray(uvs),
                                        n_pts, n_cams, max_obs_per_point=6)
        st = BAState(jnp.zeros((n_cams, 3)),
                     jnp.asarray([[0.1 * c, 0, 0] for c in range(n_cams)],
                                 jnp.float32),
                     jnp.asarray(pts + 0.01))
        from functools import partial as _part
        stepf = jax.jit(_part(ba_dist.gn_step_sharded.__wrapped__,
                              mesh=mesh, num_cams=n_cams))
        lowered = stepf.lower(blocks, st, jnp.asarray(1e-3)).compile()
        flops = lowered.cost_analysis().get("flops", 0.0)
        step = lambda: stepf(blocks, st, jnp.asarray(1e-3))
        o = step()
        jax.block_until_ready(o.points)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            o = step()
            jax.block_until_ready(o.points)
            ts.append(time.perf_counter() - t0)
        return min(ts), float(flops)

    def time_edges(nd):
        """Edge-sharded all-pairs matching sweep (parallel/match_dist.py):
        16 frames x 2 frames = 32 view-graph edges over the mesh."""
        from functools import partial as _part
        from multiviewstitch_tpu.pipeline.match_edges import SequencePrep
        from multiviewstitch_tpu.parallel.match_dist import \
            match_edges_sharded

        mesh = make_mesh(nd, ("views",))
        kk, hh, ww = 128, 64, 96

        def prep(nf, seed):
            r = np.random.default_rng(seed)
            d = r.normal(size=(nf, 1, kk, 128)).astype(np.float32)
            d /= np.linalg.norm(d, axis=-1, keepdims=True)
            uv = np.stack([r.uniform(0, ww - 1, (nf, 1, kk)),
                           r.uniform(0, hh - 1, (nf, 1, kk))],
                          -1).astype(np.float32)
            tex = np.broadcast_to(
                np.arange(hh * ww, dtype=np.int32).reshape(1, 1, hh, ww),
                (nf, 1, hh, ww)).copy()
            gray = r.uniform(0, 255, (nf, hh, ww)).astype(np.float32)
            pts = r.normal(size=(nf, hh, ww, 3)).astype(np.float32)
            Kc = np.zeros((nf, 3, 3), np.float32)
            Kc[:, 0, 0] = Kc[:, 1, 1] = 80.0
            Kc[:, 0, 2] = (ww - 1) / 2
            Kc[:, 1, 2] = (hh - 1) / 2
            Kc[:, 2, 2] = 1
            cams = CameraBatch(
                jnp.asarray(Kc),
                jnp.asarray(np.broadcast_to(np.eye(3, dtype=np.float32),
                                            (nf, 3, 3)).copy()),
                jnp.asarray(np.zeros((nf, 3), np.float32)), ww, hh)
            return SequencePrep(jnp.asarray(d),
                                jnp.ones((nf, 1, kk), bool),
                                jnp.asarray(uv), jnp.asarray(tex),
                                jnp.asarray(gray), jnp.asarray(pts),
                                jnp.ones((nf, hh, ww), bool), cams)

        p1, p2 = prep(16, 0), prep(2, 1)
        key = jax.random.key(0)
        # edge_chunk >= local edge count: one vmapped call per device, so
        # cost_analysis sees the real per-device program (a lax.map scan
        # body would be counted once regardless of trip count)
        kn = dict(view_count=1, distmax=1.2, ratiomax=0.95, ssd_win=2,
                  ssd_err=1e9, min_gap_sq=1.0, pixel_err=12.0,
                  adapt_ratio=0.6, iter_num=64, rounds=2, edge_chunk=32)
        f = jax.jit(_part(match_edges_sharded.__wrapped__, mesh=mesh, **kn))
        lowered = f.lower(p1, p2, key).compile()
        flops = lowered.cost_analysis().get("flops", 0.0)
        o = f(p1, p2, key)
        jax.block_until_ready(o.residual)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            o = f(p1, p2, key)
            jax.block_until_ready(o.residual)
            ts.append(time.perf_counter() - t0)
        return min(ts), float(flops)

    def time_winconsistency(nd):
        """Window-sharded consistency at config-5 shape (64 frames,
        parallel/view_windows.py) — the sequence-length scaling axis."""
        from multiviewstitch_tpu.parallel.view_windows import \
            check_consistency_windowed
        from functools import partial as _part
        nf = 64
        mesh = make_mesh(nd, ("views",))
        sh = NamedSharding(mesh, P("views"))
        rng2 = np.random.default_rng(7)
        d64 = rng2.uniform(0.2, 0.4, size=(nf, h, w)).astype(np.float32)
        K64 = np.broadcast_to(K[0], (nf, 3, 3)).copy()
        R64 = np.broadcast_to(np.eye(3, dtype=np.float32), (nf, 3, 3)).copy()
        t64 = np.zeros((nf, 3), np.float32)
        t64[:, 0] = np.linspace(0, 0.6, nf)
        arrs = [jax.device_put(jnp.asarray(x), sh)
                for x in (d64, K64, R64, t64)]
        cams = CameraBatch(arrs[1], arrs[2], arrs[3], w, h)
        f = jax.jit(_part(check_consistency_windowed.__wrapped__
                          if hasattr(check_consistency_windowed,
                                     "__wrapped__")
                          else check_consistency_windowed,
                          mesh=mesh, min_dsp=1e-3, max_dsp=10.0,
                          reproj_err=4))
        lowered = f.lower(arrs[0], cams).compile()
        flops = lowered.cost_analysis().get("flops", 0.0)
        o = f(arrs[0], cams)
        jax.block_until_ready(o)
        ts = []
        for _ in range(5):
            t0 = time.perf_counter()
            o = f(arrs[0], cams)
            jax.block_until_ready(o)
            ts.append(time.perf_counter() - t0)
        return min(ts), float(flops)

    results = {}
    for name, fn in (("frontend", time_frontend), ("ba_step", time_ba),
                     ("match_edges", time_edges),
                     ("windowed_consistency", time_winconsistency)):
        times, flops = {}, {}
        for nd in (1, 2, 4, args.devices):
            if nd > args.devices:
                continue
            times[nd], flops[nd] = fn(nd)
        nmax = max(times)
        # per-device flop share: ideal = total/N; efficiency = ideal/actual
        # (cost_analysis reports the per-device program under SPMD)
        part_eff = {nd: (flops[1] / nd) / max(flops[nd], 1.0)
                    for nd in times}
        results[name] = {"times_s": times, "flops": flops,
                         "partition_efficiency": part_eff}
        print(json.dumps({
            "metric": f"scaling_{name}",
            "value": round(part_eff[nmax], 3),
            "unit": f"flop-partition efficiency at {nmax} devices "
                    f"(cpu-mesh sim; wall-clock needs real chips)",
            "times_ms": {str(k): round(v * 1e3, 2)
                         for k, v in times.items()},
            "per_device_gflops": {str(k): round(v / 1e9, 4)
                                  for k, v in flops.items()},
        }))

    # --- config-5 end to end (round-3 verdict item 8): the FULL 64-view
    # align path — features -> window/edge-sharded sweep -> cascade ->
    # RANSAC -> keyframe -> SRT -> fusion — through the public API on the
    # mesh, one JSON block. Peak per-device memory is read from the live
    # backend after the run.
    if not args.skip_e2e:
        from multiviewstitch_tpu.core.transforms import Similarity
        from multiviewstitch_tpu.pipeline.fixtures import (make_scene,
                                                           textured_views)
        from multiviewstitch_tpu.pipeline.align_seq import (
            Sequence, align_sequences, fuse_sequences)
        from tests.test_e2e_align import CFG

        cfg = CFG.replace(max_keypoints=128, iter_num=64)
        gt = Similarity(jnp.asarray(1.15, jnp.float32),
                        jnp.asarray(np.array(
                            [[0.9848, 0.0, 0.1736], [0.0, 1.0, 0.0],
                             [-0.1736, 0.0, 0.9848]], np.float32)),
                        jnp.asarray([0.1, -0.05, 0.15], jnp.float32))
        sc1 = make_scene(n_frames=32, width=96, height=72, bumps=0.15,
                         n_lat=48, n_lon=64, arc_deg=120.0)
        sc2 = make_scene(n_frames=32, width=96, height=72, bumps=0.15,
                         n_lat=48, n_lon=64, arc_deg=120.0, transform=gt)
        seqs = [Sequence(jnp.asarray(textured_views(sc1)),
                         jnp.asarray(sc1.disparity), sc1.cams),
                Sequence(jnp.asarray(textured_views(sc2)),
                         jnp.asarray(sc2.disparity), sc2.cams)]

        def run_e2e(mesh):
            t0 = time.perf_counter()
            res = align_sequences(seqs, cfg, seed=0, mesh=mesh)
            pts, nrm = fuse_sequences(seqs, res, cfg)
            np.asarray(pts[:1])
            return time.perf_counter() - t0, res

        mesh8 = make_mesh(args.devices, ("views",))
        run_e2e(mesh8)                               # warm/compile
        wall8, res8 = run_e2e(mesh8)
        T = res8.transforms[0]
        dR = np.asarray(T.R) @ np.asarray(gt.R).T
        ang = float(np.degrees(np.arccos(
            np.clip((np.trace(dR) - 1) / 2, -1, 1))))
        mem = {}
        try:
            stats = jax.local_devices()[0].memory_stats()
            if stats:
                mem = {"peak_bytes_device0": int(
                    stats.get("peak_bytes_in_use", 0))}
        except Exception:
            pass
        print(json.dumps({
            "metric": "scaling_config5_e2e",
            "value": round(wall8, 2),
            "unit": f"s wall, 64-view align+fuse on {args.devices}-device "
                    "cpu mesh (sharded edge sweep; wall-clock needs real "
                    "chips)",
            "rotation_err_deg": round(ang, 3),
            "scale_rel_err": round(abs(float(T.s) - float(gt.s)) /
                                   float(gt.s), 4),
            **mem,
        }))
    return results


if __name__ == "__main__":
    main()
