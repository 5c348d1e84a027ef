"""Batched edge-sweep front-end: golden vs the explicit per-pair loop, and
structural guarantees (zero per-pair host syncs, fixed-shape outputs).

The production matcher (pipeline/match_edges.py) replaces the reference's
serial per-frame-pair loop (Processor.cpp:629-833) with one vmapped device
program over all n1*n2 view-graph edges. These tests pin it against the
retained loop oracle (pipeline.align_seq.match_sequence_pair_loop), which
shares the fold_in(key, edge_id) RANSAC key discipline."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multiviewstitch_tpu.pipeline.align_seq import (
    Sequence, match_sequence_pair, match_sequence_pair_loop)
from multiviewstitch_tpu.pipeline.match_edges import (
    prep_sequence, match_edges, edge_knobs, select_keyframe)
from tests.test_e2e_align import build_two_sequences, CFG


@pytest.fixture(scope="module")
def pair():
    seq1, seq2, gt, *_ = build_two_sequences()
    return seq1, seq2, gt


def test_batched_matches_loop_golden(pair):
    """Same keyframe, same surviving-match masks, same transforms as the
    per-pair loop oracle."""
    seq1, seq2, gt = pair
    key = jax.random.key(7)
    T_b, best_b, cands_b = match_sequence_pair(seq1, seq2, CFG, key)
    T_l, best_l, cands_l = match_sequence_pair_loop(seq1, seq2, CFG, key)

    assert (best_b.frame_i, best_b.frame_j) == (best_l.frame_i, best_l.frame_j)
    assert len(cands_b) == len(cands_l)
    by_edge_l = {(c.frame_i, c.frame_j): c for c in cands_l}
    for cb in cands_b:
        cl = by_edge_l[(cb.frame_i, cb.frame_j)]
        assert cb.num_matches == cl.num_matches, (cb.frame_i, cb.frame_j)
        np.testing.assert_allclose(cb.residual, cl.residual, rtol=1e-4,
                                   atol=1e-4)
        # identical match sets after the cascade (dedup sorts canonically)
        np.testing.assert_array_equal(cb.mask, cl.mask)
        np.testing.assert_array_equal(cb.uv1[cb.mask], cl.uv1[cl.mask])
        np.testing.assert_array_equal(cb.uv2[cb.mask], cl.uv2[cl.mask])

    np.testing.assert_allclose(np.asarray(T_b.R), np.asarray(T_l.R),
                               atol=1e-5)
    np.testing.assert_allclose(float(T_b.s), float(T_l.s), rtol=1e-5)
    np.testing.assert_allclose(np.asarray(T_b.t), np.asarray(T_l.t),
                               atol=1e-5)


def test_edge_sweep_is_one_dispatch(pair):
    """The full n1*n2 sweep runs without ANY host transfer: everything up to
    keyframe selection stays on device (jax transfer guard)."""
    seq1, seq2, _ = pair
    prep1 = prep_sequence(seq1, CFG)
    prep2 = prep_sequence(seq2, CFG)
    jax.block_until_ready((prep1, prep2))
    key = jax.random.key(7)
    # pre-transfer the scalar knobs so the guard only sees the sweep itself
    kn = {k: (jnp.asarray(v, jnp.float32) if isinstance(v, float) else v)
          for k, v in edge_knobs(CFG).items()}
    with jax.transfer_guard("disallow"):
        eb = match_edges(prep1, prep2, key, **kn)
        jax.block_until_ready(eb)
    # selection itself costs exactly one pull of two [E] vectors
    best_e, nm, res = select_keyframe(eb, CFG.min_match_count)
    assert nm.shape == (seq1.gray.shape[0] * seq2.gray.shape[0],)
    assert np.isfinite(res[best_e])


def test_sharded_edges_match_unsharded(pair):
    """parallel/match_dist.py: edge-sharded sweep over the 8-device CPU mesh
    returns the same masks/residuals/counts as the single-device batch
    (identical fold_in edge keys, E=16 edges pad to 8 devices)."""
    from multiviewstitch_tpu.parallel.mesh import make_mesh
    from multiviewstitch_tpu.parallel.match_dist import match_edges_sharded
    seq1, seq2, _ = pair
    prep1 = prep_sequence(seq1, CFG)
    prep2 = prep_sequence(seq2, CFG)
    key = jax.random.key(7)
    kn = edge_knobs(CFG)
    gold = match_edges(prep1, prep2, key, **kn)
    mesh = make_mesh(8, ("views",))
    sh = match_edges_sharded(prep1, prep2, key, mesh=mesh, **kn)
    np.testing.assert_array_equal(np.asarray(sh.num_matches),
                                  np.asarray(gold.num_matches))
    np.testing.assert_array_equal(np.asarray(sh.mask), np.asarray(gold.mask))
    np.testing.assert_allclose(np.asarray(sh.residual),
                               np.asarray(gold.residual), rtol=1e-5)
    np.testing.assert_array_equal(np.asarray(sh.uv1), np.asarray(gold.uv1))
    np.testing.assert_allclose(np.asarray(sh.p1), np.asarray(gold.p1),
                               atol=1e-6)


def test_ineligible_edges_are_masked_not_nan(pair):
    """Edges with <3 lifted matches must come back with inf residual, zero
    count, all-false masks — and no NaNs anywhere (straight-line program)."""
    seq1, seq2, _ = pair
    # starve matching so most/all edges are ineligible
    cfg = CFG.replace(distmax=1e-6, ratiomax=1e-6)
    prep1 = prep_sequence(seq1, cfg)
    prep2 = prep_sequence(seq2, cfg)
    eb = match_edges(prep1, prep2, jax.random.key(0), **edge_knobs(cfg))
    nm = np.asarray(eb.num_matches)
    res = np.asarray(eb.residual)
    bad = nm < 3
    assert bad.any()
    assert np.all(np.isinf(res[bad]))
    assert np.all(nm[bad] == 0)
    assert not np.isnan(res).any()
    assert not np.asarray(eb.mask)[bad].any()
    with pytest.raises(RuntimeError):
        if bad.all():
            select_keyframe(eb, cfg.min_match_count)
        else:
            raise RuntimeError("fixture unexpectedly matched")
