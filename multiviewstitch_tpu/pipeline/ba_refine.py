"""Bundle-adjustment refinement of the sequence chain — the product path.

SURVEY §7 step 6: reprojection BA over the view graph supersedes the
reference's greedy single-keyframe SRT chain (Processor.cpp:813-826 — the
reference never refines; every pose is one RANSAC solve). Round 3 left the
BA solver (solvers/ba.py, parallel/ba_dist.py) reachable only from benches;
this module wires it into ``align_sequences(refine="ba")`` / the CLI's
``--refine ba`` (VERDICT r3 item 4).

Pipeline-level formulation:
  - every keyframe (seq, frame) that carries surviving cross-sequence
    matches becomes a BA camera, initialized from the SRT chain: a point
    X in the REFERENCE frame projects into frame f of sequence q (chain
    transform T_q = (s, R_T, t_T), seq world -> reference) through the
    composite rigid camera
        R' = R_f R_T^T,   t' = -R' t_T + s t_f
    (the similarity's scale folds into the projective depth, so the
    composite camera is rigid and solve_ba's 6-dof parameterization
    applies exactly).
  - matches merge into TRACKS by their source-pixel identity (seq, frame,
    u, v) via union-find, so a pixel matched in several edges becomes one
    multi-view point, not many 2-view points.
  - track points initialize from the depth lifts mapped into the
    reference frame (mean over member observations).
  - gauge: all cameras of the reference sequence (identity chain
    transform) are held fixed.
  - after the LM solve, each sequence's refined similarity is re-fit from
    its refined cameras: R_T = nearest-rotation(mean_f R'_f^T R_f), and
    (s, t_T) from the stacked linear system  s t_f - R'_f t_T = t'_f
    (3 rows per observed frame). A sequence with a single observed frame
    cannot determine s (reprojection BA's per-rig scale needs >=2
    baselines), so the chain scale is kept and only R_T/t_T update —
    the honest fallback, also used when the LS scale fails sanity gates.
"""

from __future__ import annotations

from typing import Dict, List, Optional, Tuple

import numpy as np
import jax.numpy as jnp

from ..core.transforms import Similarity, apply_points
from ..solvers.ba import BAState, make_problem, solve_ba
from ..solvers.unionfind import UnionFind


def _rotmat_to_rvec(R: np.ndarray) -> np.ndarray:
    """Host-side SO(3) log map [3,3] -> axis-angle [3] (inverse of
    solvers.ba.rodrigues) via Shepperd's quaternion extraction — stable at
    every angle (the direct arccos/sin form loses ~3 digits near pi)."""
    R = np.asarray(R, np.float64)
    t = np.trace(R)
    # pick the largest of (trace, R00, R11, R22) to divide by
    choices = np.r_[t, np.diag(R)]
    k = int(np.argmax(choices))
    if k == 0:
        r = np.sqrt(max(1.0 + t, 0.0))
        q = 0.5 * np.array([r, (R[2, 1] - R[1, 2]) / r,
                            (R[0, 2] - R[2, 0]) / r,
                            (R[1, 0] - R[0, 1]) / r])
    else:
        i = k - 1
        j, l = (i + 1) % 3, (i + 2) % 3
        r = np.sqrt(max(1.0 + R[i, i] - R[j, j] - R[l, l], 1e-24))
        q = np.empty(4)
        q[0] = (R[l, j] - R[j, l]) / (2 * r)
        q[1 + i] = 0.5 * r
        q[1 + j] = (R[j, i] + R[i, j]) / (2 * r)
        q[1 + l] = (R[l, i] + R[i, l]) / (2 * r)
    if q[0] < 0:
        q = -q
    q /= np.linalg.norm(q)
    nv = np.linalg.norm(q[1:])
    if nv < 1e-12:
        return np.zeros(3, np.float32)
    theta = 2.0 * np.arctan2(nv, q[0])
    return (q[1:] / nv * theta).astype(np.float32)


def _nearest_rotation(M: np.ndarray) -> np.ndarray:
    """Nearest SO(3) matrix to M (host-side, tiny): R = U V^T with the
    det sign fix — the same optimum solvers.deformation.fit_rotation
    computes on device; here a plain SVD on one 3x3 is fine."""
    U, _, Vt = np.linalg.svd(M)
    d = np.sign(np.linalg.det(U @ Vt))
    return (U @ np.diag([1.0, 1.0, d]) @ Vt).astype(np.float32)


def build_ba_problem(seqs, pairs, transforms, *, min_obs: int = 2):
    """Assemble the BA problem from the edge sweep's surviving matches.

    ``pairs``: list of (k, l, PairCandidate) with frame_i in seq k /
    frame_j in seq l, uv1/uv2 [M,2] int source pixels, p1/p2 [M,3] depth
    lifts in each sequence's own world, mask [M].
    ``transforms``: chain init (per-seq Similarity into the ref frame).

    Returns (prob, st0, cam_map) or None when no usable matches exist;
    cam_map is {(seq, frame): cam_id}.
    """
    # 1. collect observations keyed by source-pixel identity
    obs_key: Dict[Tuple[int, int, int, int], int] = {}
    obs_uv: List[Tuple[float, float]] = []
    obs_cam_key: List[Tuple[int, int]] = []
    obs_lift: List[np.ndarray] = []     # lift in REFERENCE frame
    links: List[Tuple[int, int]] = []

    host_T = [(float(T.s), np.asarray(T.R, np.float64),
               np.asarray(T.t, np.float64)) for T in transforms]

    def lift_to_ref(q, p):
        s, R, t = host_T[q]
        return s * (R @ p) + t

    def obs_id(q, f, uv, p):
        key = (q, f, int(uv[0]), int(uv[1]))
        if key not in obs_key:
            obs_key[key] = len(obs_uv)
            obs_uv.append((float(uv[0]), float(uv[1])))
            obs_cam_key.append((q, f))
            obs_lift.append(lift_to_ref(q, np.asarray(p, np.float64)))
        return obs_key[key]

    for k, l, c in pairs:
        m = np.asarray(c.mask, bool)
        uv1 = np.asarray(c.uv1)[m]
        uv2 = np.asarray(c.uv2)[m]
        p1 = np.asarray(c.p1)[m]
        p2 = np.asarray(c.p2)[m]
        for a in range(len(uv1)):
            ia = obs_id(k, c.frame_i, uv1[a], p1[a])
            ib = obs_id(l, c.frame_j, uv2[a], p2[a])
            links.append((ia, ib))
    n_obs = len(obs_uv)
    if n_obs == 0 or not links:
        return None

    # 2. union-find merge into tracks
    uf = UnionFind(n_obs)
    for a, b in links:
        uf.union(a, b)
    root = np.asarray([uf.find(i) for i in range(n_obs)])
    uniq, track_of = np.unique(root, return_inverse=True)
    n_tracks = len(uniq)

    # drop tracks with < min_obs observations (singletons can't happen via
    # links, but defensive) and tracks whose obs all share one camera
    cams_sorted = sorted(set(obs_cam_key))
    cam_map = {ck: i for i, ck in enumerate(cams_sorted)}
    cam_of_obs = np.asarray([cam_map[ck] for ck in obs_cam_key])
    keep_track = np.zeros(n_tracks, bool)
    for tid in range(n_tracks):
        sel = track_of == tid
        if sel.sum() >= min_obs and len(np.unique(cam_of_obs[sel])) >= 2:
            keep_track[tid] = True
    new_tid = np.cumsum(keep_track) - 1
    keep_obs = keep_track[track_of]
    if not keep_obs.any():
        return None
    pt_idx = new_tid[track_of[keep_obs]].astype(np.int32)
    cam_idx = cam_of_obs[keep_obs].astype(np.int32)
    uv = np.asarray(obs_uv, np.float32)[keep_obs]
    n_points = int(keep_track.sum())

    # 3. init points: mean of member lifts in the reference frame
    lifts = np.asarray(obs_lift, np.float64)[keep_obs]
    pts0 = np.zeros((n_points, 3))
    cnt = np.zeros(n_points)
    np.add.at(pts0, pt_idx, lifts)
    np.add.at(cnt, pt_idx, 1.0)
    pts0 /= np.maximum(cnt[:, None], 1.0)

    # 4. composite cameras from the chain init
    rvec0 = np.zeros((len(cams_sorted), 3), np.float32)
    tvec0 = np.zeros((len(cams_sorted), 3), np.float32)
    fixed = np.zeros(len(cams_sorted), bool)
    ref_seq = _reference_sequence(transforms)
    # BA shares one K across all cameras (make_problem takes a single
    # intrinsics matrix). Real .act calibrations can differ per frame —
    # projecting through the wrong K would silently degrade the refit, so
    # any participating frame whose K deviates from K0 skips BA (the
    # caller falls back to the chain with ba_skipped=1).
    K0 = np.asarray(seqs[0].cams.K[0])
    for (q, f) in cam_map:
        Kqf = np.asarray(seqs[q].cams.K[f])
        if not np.allclose(Kqf, K0, rtol=1e-4, atol=1e-3 * abs(K0[0, 0])):
            return None
    for (q, f), cid in cam_map.items():
        s, R_T, t_T = host_T[q]
        R_f = np.asarray(seqs[q].cams.R[f], np.float64)
        t_f = np.asarray(seqs[q].cams.t[f], np.float64)
        Rp = R_f @ R_T.T
        tp = -Rp @ t_T + s * t_f
        rvec0[cid] = _rotmat_to_rvec(Rp.astype(np.float32))
        tvec0[cid] = tp.astype(np.float32)
        fixed[cid] = q == ref_seq

    if not fixed.any():                      # gauge must be pinned
        fixed[0] = True
    prob = make_problem(K0, cam_idx, pt_idx, uv, n_points,
                        fixed_cams=np.flatnonzero(fixed),
                        n_cams=len(cams_sorted))
    st0 = BAState(jnp.asarray(rvec0), jnp.asarray(tvec0),
                  jnp.asarray(pts0, jnp.float32))
    return prob, st0, cam_map


def _reference_sequence(transforms) -> int:
    """The sequence whose chain transform is the identity (the last one,
    Processor.cpp:819-823) — its cameras pin the gauge."""
    best, berr = len(transforms) - 1, np.inf
    for q, T in enumerate(transforms):
        err = (abs(float(T.s) - 1.0) +
               float(np.abs(np.asarray(T.R) - np.eye(3)).sum()) +
               float(np.abs(np.asarray(T.t)).sum()))
        if err < berr:
            best, berr = q, err
    return best


def refit_similarities(seqs, transforms, st: BAState, cam_map
                       ) -> List[Similarity]:
    """Per-sequence similarity re-fit from the refined composite cameras
    (see module docstring for the algebra)."""
    ref_seq = _reference_sequence(transforms)
    rvec = np.asarray(st.rvec, np.float64)
    tvec = np.asarray(st.tvec, np.float64)
    from ..solvers.ba import rodrigues
    out: List[Similarity] = []
    for q, T in enumerate(transforms):
        frames = [f for (qq, f) in cam_map if qq == q]
        if q == ref_seq or not frames:
            out.append(T)
            continue
        s_chain = float(T.s)
        Rsum = np.zeros((3, 3))
        Rps, tps, Rfs, tfs = [], [], [], []
        for f in frames:
            cid = cam_map[(q, f)]
            Rp = np.asarray(rodrigues(jnp.asarray(rvec[cid])), np.float64)
            tp = tvec[cid]
            R_f = np.asarray(seqs[q].cams.R[f], np.float64)
            t_f = np.asarray(seqs[q].cams.t[f], np.float64)
            Rsum += Rp.T @ R_f
            Rps.append(Rp)
            tps.append(tp)
            Rfs.append(R_f)
            tfs.append(t_f)
        R_T = _nearest_rotation(Rsum / len(frames)).astype(np.float64)

        # stacked LS for (s, t_T):  s t_f - R'_f t_T = t'_f
        if len(frames) >= 2:
            A = np.concatenate(
                [np.concatenate([t[:, None], -Rp], 1)
                 for t, Rp in zip(tfs, Rps)], 0)          # [3F, 4]
            b = np.concatenate(tps)
            x, _, rank, _ = np.linalg.lstsq(A, b, rcond=None)
            s_new = float(x[0])
            t_T = x[1:]
            bad = (rank < 4 or s_new <= 0 or
                   abs(np.log(max(s_new, 1e-12) / s_chain)) > 0.7)
        else:
            bad = True
        if bad:
            # keep the chain's (RANSAC 3D-3D) scale; solve t_T exactly
            # from each frame and average:  t_T = R'^T (s t_f - t')
            s_new = s_chain
            t_T = np.mean([Rp.T @ (s_new * t - tp)
                           for Rp, t, tp in zip(Rps, tfs, tps)], 0)
        out.append(Similarity(jnp.asarray(s_new, jnp.float32),
                              jnp.asarray(R_T, jnp.float32),
                              jnp.asarray(t_T, jnp.float32)))
    return out


def refine_with_ba(seqs, pairs, transforms, *, iters: int = 30,
                   mesh=None, verbose: bool = False
                   ) -> Tuple[List[Similarity], Dict[str, float]]:
    """Run the flagship BA on the chain's surviving matches and re-fit the
    per-sequence similarities. Returns (new_transforms, metrics); falls
    back to the input chain (with a metric flag) when no usable tracks
    exist. With ``mesh``, the LM solve shards point blocks over the
    mesh's 'views' axis (parallel/ba_dist.py)."""
    built = build_ba_problem(seqs, pairs, transforms)
    if built is None:
        return list(transforms), {"ba_skipped": 1.0}
    prob, st0, cam_map = built
    from ..solvers.ba import reprojection_rmse
    rmse0 = float(reprojection_rmse(prob, st0))
    if mesh is not None:
        from ..parallel.ba_dist import group_by_point, solve_ba_sharded
        # shard_map partitions point blocks: pad the point count to a
        # multiple of the mesh size with zero-observation dummies (their
        # masks are all False, so they contribute nothing and their
        # updates are discarded)
        n_dev = int(mesh.devices.size)
        n_pts = st0.points.shape[0]
        n_pad = (-n_pts) % n_dev
        pt_idx = np.asarray(prob.pt_idx)
        counts = np.bincount(pt_idx, minlength=n_pts)
        blocks = group_by_point(
            np.asarray(prob.K), np.asarray(prob.cam_idx),
            pt_idx, np.asarray(prob.uv), n_pts + n_pad,
            st0.rvec.shape[0],
            max_obs_per_point=max(int(counts.max(initial=1)), 1),
            fixed_cams=np.flatnonzero(np.asarray(prob.fixed_cams)))
        stp = st0._replace(points=jnp.concatenate(
            [st0.points, jnp.zeros((n_pad, 3), jnp.float32)]))
        st, rmse = solve_ba_sharded(blocks, stp, mesh, iters=iters)
        st = st._replace(points=st.points[:n_pts])
    else:
        st, rmse = solve_ba(prob, st0, iters=iters, verbose=verbose)
    refined = refit_similarities(seqs, transforms, st, cam_map)
    metrics = {"ba_rmse_init_px": rmse0, "ba_rmse_px": rmse,
               "ba_cams": float(st.rvec.shape[0]),
               "ba_tracks": float(st.points.shape[0]),
               "ba_obs": float(int(np.asarray(prob.mask).sum()))}
    return refined, metrics
