"""View-graph window partitioning: contiguous frame windows + halos.

SURVEY §5.7's long-sequence scaling design ("each host holds a contiguous
frame window plus boundary keyframes (halo), analogous to context
parallelism"). The reference caps at a handful of serially-processed
directories (imgPathList.txt:1-6); this module is the sharding spec that
lets the front-end scale to BASELINE config 5 (64+ views over a mesh):

  - ``WindowSpec`` — the partitioning: frame f is owned by device
    f // (N/D); each device's *working set* is its window plus ``halo``
    boundary frames on each side (the neighbor frames the consistency
    check and multi-frame disparity-agreement voting need).
  - ``check_consistency_windowed`` — the depth-consistency stage
    (ops/consistency.py) with frames sharded over mesh axis 'views' and the
    halo frames exchanged via ``ppermute`` along the window chain, so each
    device only ever holds window+halo frames. Golden-matches the fused
    unsharded op.
  - Edge alignment: the edge-sharded matcher (parallel/match_dist.py)
    block-shards edge ids e = i*n2 + j, so when n1 divides by the mesh each
    device's edges have their i-endpoints exactly inside ONE window —
    ``edge_window_aligned`` states/validates that invariant, which is what
    keeps per-edge frame data host-local at multi-host scale.
"""

from __future__ import annotations

from functools import partial
from typing import NamedTuple, Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P
from jax import shard_map

from ..core.cameras import CameraBatch, unproject, pixel_grid
from ..ops.consistency import _offset_check


class WindowSpec(NamedTuple):
    n_frames: int
    n_devices: int
    halo: int

    @property
    def window_len(self) -> int:
        return self.n_frames // self.n_devices

    def window(self, d: int) -> Tuple[int, int]:
        """[start, stop) of device d's owned frames."""
        L = self.window_len
        return d * L, (d + 1) * L

    def working_set(self, d: int) -> Tuple[int, int]:
        """[start, stop) of owned + halo frames (clipped at sequence ends)."""
        s, e = self.window(d)
        return max(0, s - self.halo), min(self.n_frames, e + self.halo)

    def owner_of_frame(self, f) -> int:
        return int(f) // self.window_len

    def owner_of_edge(self, i, j, n2: int) -> int:
        """Edge (i, j) of an n1 x n2 edge grid lives with frame i's window
        (row-major block sharding, matching parallel/match_dist.py)."""
        return self.owner_of_frame(i)


def make_window_spec(n_frames: int, n_devices: int, halo: int = 1
                     ) -> WindowSpec:
    if n_frames % n_devices:
        raise ValueError(
            f"n_frames={n_frames} must divide over n_devices={n_devices} "
            "(pad the sequence, parallel/mesh.py::pad_to_multiple)")
    return WindowSpec(n_frames, n_devices, halo)


def edge_window_aligned(spec: WindowSpec, n2: int, mesh_size: int) -> bool:
    """True iff block-sharding the row-major edge grid [n1*n2] over
    ``mesh_size`` devices gives every device edges whose i-endpoints fall in
    a single frame window — i.e. the edge sharding and the frame-window
    sharding agree, so edge work only touches host-local frames."""
    E = spec.n_frames * n2
    if E % mesh_size:
        return False
    per = E // mesh_size
    for d in range(mesh_size):
        i_lo = (d * per) // n2
        i_hi = ((d + 1) * per - 1) // n2
        # all i endpoints of device d's edge block inside one frame window
        if spec.owner_of_frame(i_lo) != spec.owner_of_frame(i_hi):
            return False
    return True


@partial(jax.jit, static_argnames=("mesh", "min_dsp", "max_dsp",
                                   "reproj_err", "halo"))
def check_consistency_windowed(
    disparity: jnp.ndarray,          # [N,H,W] sharded over 'views'
    cams: CameraBatch,               # batch N (sharded like disparity)
    *,
    mesh: Mesh,
    min_dsp: float,
    max_dsp: float,
    reproj_err: float,
    halo: int = 1,
) -> jnp.ndarray:
    """Depth-consistency filter with frames window-sharded over mesh axis
    'views': each device holds its window of frames; the ±halo neighbor
    frames (disparity + cameras) are exchanged with two ppermute shifts
    along the window chain. Output matches check_consistency with
    offsets=(-halo..-1, 1..halo) exactly."""
    n, h, w = disparity.shape
    D = mesh.shape["views"]
    if n % D:
        raise ValueError(f"frames ({n}) must divide mesh size ({D})")
    L = n // D
    if halo > L:
        raise ValueError("halo larger than the window is not supported")
    offsets = tuple(o for o in range(-halo, halo + 1) if o)

    def fn(disp_l, K_l, R_l, t_l):
        d = jax.lax.axis_index("views")
        g0 = d * L                                 # global index of frame 0

        def shift(x, direction):
            """Halo block from the neighbor device: direction=+1 pulls the
            next device's first `halo` frames (right halo), -1 pulls the
            previous device's last `halo` frames. Chain (non-circular)
            ppermute: edge devices receive zeros — masked by `exists`."""
            if direction > 0:
                src = x[:halo]
                perm = [(i + 1, i) for i in range(D - 1)]
            else:
                src = x[-halo:]
                perm = [(i, i + 1) for i in range(D - 1)]
            return jax.lax.ppermute(src, "views", perm)

        ext = {}
        for name, x in (("disp", disp_l), ("K", K_l), ("R", R_l),
                        ("t", t_l)):
            ext[name] = jnp.concatenate(
                [shift(x, -1), x, shift(x, +1)], axis=0)  # [L+2*halo, ...]

        valid = (disp_l >= min_dsp) & (disp_l <= max_dsp)
        uv = pixel_grid(h, w, disp_l.dtype)
        depth = 1.0 / jnp.where(valid, disp_l, 1.0)
        cam_pix = CameraBatch(K_l[:, None, None], R_l[:, None, None],
                              t_l[:, None, None], cams.width, cams.height)
        pts = unproject(cam_pix, uv[None], depth)

        keep = valid
        for off in offsets:
            # local index into the extended (halo-padded) block
            lo = halo + off
            ndisp = jax.lax.slice_in_dim(ext["disp"], lo, lo + L)
            ncams = CameraBatch(
                jax.lax.slice_in_dim(ext["K"], lo, lo + L),
                jax.lax.slice_in_dim(ext["R"], lo, lo + L),
                jax.lax.slice_in_dim(ext["t"], lo, lo + L),
                cams.width, cams.height)
            gidx = g0 + jnp.arange(L) + off
            exists = ((gidx >= 0) & (gidx < n))[:, None, None]
            ok = _offset_check(pts, cam_pix, uv, ndisp, ncams,
                               min_dsp=min_dsp, max_dsp=max_dsp,
                               reproj_err=reproj_err)
            keep = keep & jnp.where(exists, ok, True)
        return jnp.where(keep, disp_l, 0.0)

    vspec = P("views")
    return shard_map(fn, mesh=mesh,
                     in_specs=(vspec, vspec, vspec, vspec),
                     out_specs=vspec)(disparity, cams.K, cams.R, cams.t)
