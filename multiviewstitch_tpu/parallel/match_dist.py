"""Edge-sharded all-pairs matching: view-graph edges over the device mesh.

SURVEY §2's parallelism table makes "pairwise-work parallelism" a
first-class component: the reference's all-pairs MatchFeature loop
(FeatureProc.cpp:114-129) and per-pair RANSAC cascade (Processor.cpp:629-833)
become a batch of independent view-graph EDGES, sharded across the mesh's
'views' axis with shard_map. Each device sweeps its contiguous edge block
using the same per-edge program as the single-device batched matcher
(pipeline/match_edges._edge_fn) with the same fold_in(key, edge_id) RANSAC
keys — so the sharded sweep is reproducible against the unsharded one
(golden-tested in tests/test_parallel.py style).

Frame-level inputs (descriptors, texIndex, gray, unprojection maps) are
replicated here; at multi-host scale they arrive pre-partitioned by the
view-window sharding spec (parallel/view_windows.py), which assigns each
host a contiguous frame window plus boundary keyframes so that every edge's
endpoints are host-local.
"""

from __future__ import annotations

from functools import partial
from typing import Tuple

import numpy as np
import jax
import jax.numpy as jnp
from jax.sharding import Mesh, PartitionSpec as P
from jax import shard_map

from ..pipeline.match_edges import SequencePrep, EdgeBatch, _edge_fn


@partial(jax.jit, static_argnames=("mesh", "view_count", "ssd_win",
                                   "iter_num", "rounds", "edge_chunk"))
def match_edges_sharded(prep1: SequencePrep, prep2: SequencePrep, key, *,
                        mesh: Mesh, view_count: int, distmax, ratiomax,
                        ssd_win: int, ssd_err, min_gap_sq, pixel_err,
                        adapt_ratio, iter_num: int, rounds: int,
                        edge_chunk: int = 8) -> EdgeBatch:
    """All n1*n2 edges of a sequence pair, block-sharded over mesh axis
    'views'. Edge count is padded to a multiple of the mesh size; padded
    edges are computed against frame (0,0) and invalidated on the way out
    (inf residual, zero count)."""
    n1 = prep1.gray.shape[0]
    n2 = prep2.gray.shape[0]
    n_dev = mesh.shape["views"]
    E = n1 * n2
    Ep = E + (-E) % n_dev

    eids = jnp.arange(Ep, dtype=jnp.int32)
    real = eids < E
    ei = jnp.where(real, eids // n2, 0)
    ej = jnp.where(real, eids % n2, 0)
    keys = jax.vmap(lambda e: jax.random.fold_in(key, e.astype(jnp.uint32)))(
        jnp.minimum(eids, E - 1))

    def shard_fn(ei_l, ej_l, keys_l, real_l, p1: SequencePrep,
                 p2: SequencePrep):
        def body(args):
            i, j, k = args
            return _edge_fn(i, j, k, p1, p2, view_count=view_count,
                            distmax=distmax, ratiomax=ratiomax,
                            ssd_win=ssd_win, ssd_err=ssd_err,
                            min_gap_sq=min_gap_sq, pixel_err=pixel_err,
                            adapt_ratio=adapt_ratio, iter_num=iter_num,
                            rounds=rounds)

        uv1, uv2, q1, q2, mask, res, nm = jax.lax.map(
            body, (ei_l, ej_l, keys_l),
            batch_size=min(edge_chunk, ei_l.shape[0]))
        mask = mask & real_l[:, None]
        res = jnp.where(real_l, res, jnp.inf)
        nm = jnp.where(real_l, nm, 0)
        return uv1, uv2, q1, q2, mask, res, nm

    espec = P("views")
    rspec = P()
    prep_specs = jax.tree_util.tree_map(lambda _: rspec, prep1)
    uv1, uv2, q1, q2, mask, res, nm = shard_map(
        shard_fn, mesh=mesh,
        in_specs=(espec, espec, espec, espec, prep_specs, prep_specs),
        out_specs=(espec,) * 7,
    )(ei, ej, keys, real, prep1, prep2)

    return EdgeBatch(ei[:E], ej[:E], uv1[:E], uv2[:E], q1[:E], q2[:E],
                     mask[:E], res[:E], nm[:E])
