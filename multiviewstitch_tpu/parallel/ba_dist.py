"""Distributed bundle adjustment: point-sharded Schur reduction over psum.

The BASELINE north-star pattern: "views/keyframes ... partitioned per host,
distributed BA ... via Schur-complement reduction over psum/all-gather
collectives". Sharding layout:

  - POINTS (and their observation lists) are sharded across the mesh's
    'views' axis — each device owns a contiguous point block with all of
    that point's observations (per-point grouping is what the Schur cross
    terms need, so this layout makes the reduction local-then-psum).
  - CAMERAS are replicated (6C dof is tiny).
  - Each device assembles its partial reduced camera system S_part/b_part;
    one psum produces the full S on every device; the dense solve is
    replicated; point back-substitution is local to each shard.

The observation data here uses a per-point padded layout [P, M] (camera id,
uv, mask per slot) rather than solvers/ba.py's flat [O] layout — the
grouped layout IS the distribution strategy. A golden test checks the
sharded solve matches the single-device solver (SURVEY §4: "sharded
BA/deformation solve matches the unsharded solve").
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..solvers.ba import BAState, rodrigues, _residual_one


class BAPointBlocks(NamedTuple):
    """Per-point grouped observations, padded to [P, M]."""
    K: jnp.ndarray          # [3,3]
    cam_of: jnp.ndarray     # [P,M] int32 camera per obs slot
    uv: jnp.ndarray         # [P,M,2]
    mask: jnp.ndarray       # [P,M] bool
    fixed_cams: jnp.ndarray  # [C] bool


def group_by_point(K, cam_idx, pt_idx, uv, n_points, n_cams,
                   max_obs_per_point=16, fixed_cams=(0,)) -> BAPointBlocks:
    cam_idx = np.asarray(cam_idx)
    pt_idx = np.asarray(pt_idx)
    uv = np.asarray(uv, np.float32)
    cam_of = np.zeros((n_points, max_obs_per_point), np.int32)
    uvp = np.zeros((n_points, max_obs_per_point, 2), np.float32)
    mask = np.zeros((n_points, max_obs_per_point), bool)
    # vectorized group-by-point (same capacity semantics as the old
    # per-observation loop: first max_obs per point, observation order)
    from ..solvers.ba import _group_ranks
    slot, keep = _group_ranks(pt_idx, max_obs_per_point)
    obs_ids = np.argsort(pt_idx, kind="stable")
    sel = obs_ids[keep]
    cam_of[pt_idx[sel], slot[keep]] = cam_idx[sel]
    uvp[pt_idx[sel], slot[keep]] = uv[sel]
    mask[pt_idx[sel], slot[keep]] = True
    fc = np.zeros(n_cams, bool)
    fc[list(fixed_cams)] = True
    return BAPointBlocks(jnp.asarray(K, jnp.float32), jnp.asarray(cam_of),
                         jnp.asarray(uvp), jnp.asarray(mask),
                         jnp.asarray(fc))


def _point_block_terms(K, rvec, tvec, points, cam_of, uv, mask, lam):
    """Per-point-shard GN terms (scatter-free MXU assembly, shared with
    the single-chip solver — solvers/ba.py::_grouped_schur_terms).
    points [p,3] local; cam_of/uv/mask [p,M]. Returns PARTIAL
    (S [C,C,6,6], b [C,6]) — valid to psum across point shards — plus the
    local back-substitution operands (Hpp_inv, W, bp, onehot)."""
    from ..solvers.ba import _grouped_schur_terms
    num_cams = rvec.shape[0]
    return _grouped_schur_terms(K, rvec, tvec, points, cam_of, uv, mask,
                                lam, num_cams)


@partial(jax.jit, static_argnames=("mesh", "num_cams"))
def gn_step_sharded(prob: BAPointBlocks, st: BAState, lam, *, mesh: Mesh,
                    num_cams: int) -> BAState:
    """One damped GN/Schur step with points sharded over mesh axis 'views'."""

    def shard_fn(K, cam_of, uv, mask, fixed, rvec, tvec, points):
        S, b, Hpp_inv, W, bp, oh = _point_block_terms(
            K, rvec, tvec, points, cam_of, uv, mask, lam)
        # global reduction of the camera system across point shards
        S = jax.lax.psum(S, "views")
        b = jax.lax.psum(b, "views")
        S = S + lam * jnp.eye(6)[None, None] * jnp.eye(num_cams)[
            :, :, None, None]

        ffree = (~fixed).astype(S.dtype)
        S = S * ffree[:, None, None, None] * ffree[None, :, None, None]
        S = S.at[jnp.arange(num_cams), jnp.arange(num_cams)].add(
            jnp.eye(6) * fixed[:, None, None])
        b = b * ffree[:, None]

        Sd = S.transpose(0, 2, 1, 3).reshape(num_cams * 6, num_cams * 6)
        dc = jnp.linalg.solve(Sd + 1e-9 * jnp.eye(num_cams * 6),
                              b.reshape(-1)).reshape(num_cams, 6)
        dc = dc * ffree[:, None]

        # local point back-substitution
        from ..solvers.ba import back_substitute_points
        dp = back_substitute_points(W, Hpp_inv, bp, oh, dc)
        return dc, points + dp

    pspec = P("views")
    rspec = P()
    dc, new_pts = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(rspec, pspec, pspec, pspec, rspec, rspec, rspec, pspec),
        out_specs=(rspec, pspec),
    )(prob.K, prob.cam_of, prob.uv, prob.mask, prob.fixed_cams,
      st.rvec, st.tvec, st.points)

    return BAState(st.rvec + dc[:, :3], st.tvec + dc[:, 3:], new_pts)


def reprojection_rmse_blocks(prob: BAPointBlocks, st: BAState):
    def one(pt, c, uv1, m):
        r = _residual_one(prob.K, st.rvec[c], st.tvec[c], pt, uv1)
        return jnp.where(m, (r ** 2).sum(), 0.0)
    e = jax.vmap(lambda p, cs, us, ms: jax.vmap(
        lambda c, u, m: one(p, c, u, m))(cs, us, ms))(
        st.points, prob.cam_of, prob.uv, prob.mask)
    n = jnp.maximum(prob.mask.sum(), 1)
    return jnp.sqrt(e.sum() / (2 * n))


def solve_ba_sharded(prob: BAPointBlocks, st: BAState, mesh: Mesh, *,
                     iters: int = 20, lam0: float = 1e-3
                     ) -> Tuple[BAState, float]:
    """LM loop around the sharded step (host-controlled damping)."""
    num_cams = st.rvec.shape[0]
    lam = lam0
    best = float(reprojection_rmse_blocks(prob, st))
    for _ in range(iters):
        cand = gn_step_sharded(prob, st, jnp.asarray(lam, jnp.float32),
                               mesh=mesh, num_cams=num_cams)
        err = float(reprojection_rmse_blocks(prob, cand))
        if err < best:
            st, best = cand, err
            lam = max(lam * 0.5, 1e-7)
        else:
            lam = min(lam * 4.0, 1e3)
        if lam >= 1e3:
            break
    return st, best
