"""View-graph window partitioning (SURVEY §5.7 / BASELINE config 5 shape):
64 frames over 8 devices with halo exchange, plus the full align path with
the edge sweep sharded over the mesh."""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

from multiviewstitch_tpu.core.cameras import CameraBatch
from multiviewstitch_tpu.ops.consistency import check_consistency
from multiviewstitch_tpu.parallel.mesh import make_mesh
from multiviewstitch_tpu.parallel.view_windows import (
    WindowSpec, make_window_spec, edge_window_aligned,
    check_consistency_windowed)

pytestmark = pytest.mark.slow


@pytest.fixture(scope="module")
def mesh():
    return make_mesh(8, ("views",))


def _ring_sequence(n, h, w, seed=0):
    """Geometrically meaningful disparity + translating cameras."""
    rng = np.random.default_rng(seed)
    # smooth disparity field (consistency filters real structure, not noise)
    base = rng.uniform(0.25, 0.3, size=(1, h, w)).astype(np.float32)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    disp = base + 0.05 * np.sin(xx / 17.0)[None] * np.cos(yy / 13.0)[None]
    disp = np.broadcast_to(disp, (n, h, w)).copy()
    # per-frame depth disagreement on a patch so the filter kills pixels
    ph = np.linspace(0, 3.0, n, dtype=np.float32)[:, None, None]
    disp[:, h // 4:h // 2, w // 4:w // 2] *= (1.0 + 0.4 * np.sin(ph))
    K = np.zeros((n, 3, 3), np.float32)
    K[:, 0, 0] = K[:, 1, 1] = 80.0
    K[:, 0, 2] = (w - 1) / 2
    K[:, 1, 2] = (h - 1) / 2
    K[:, 2, 2] = 1
    R = np.broadcast_to(np.eye(3, dtype=np.float32), (n, 3, 3)).copy()
    t = np.zeros((n, 3), np.float32)
    t[:, 0] = np.linspace(0, 12.0, n)   # ~0.19 baseline/frame: the depth
    # disagreement patch reprojects several px off and gets filtered
    cams = CameraBatch(jnp.asarray(K), jnp.asarray(R), jnp.asarray(t), w, h)
    return jnp.asarray(disp), cams


def test_window_spec_partitioning():
    spec = make_window_spec(64, 8, halo=1)
    assert spec.window_len == 8
    assert spec.window(3) == (24, 32)
    assert spec.working_set(0) == (0, 9)       # clipped at the start
    assert spec.working_set(7) == (55, 64)     # clipped at the end
    assert spec.working_set(4) == (31, 41)     # one halo frame each side
    owners = [spec.owner_of_frame(f) for f in range(64)]
    # contiguous, balanced ownership
    assert owners == sorted(owners)
    assert all(owners.count(d) == 8 for d in range(8))
    with pytest.raises(ValueError):
        make_window_spec(63, 8)


def test_edge_sharding_window_aligned():
    # block-sharded row-major edges agree with the frame windows whenever
    # n1 divides the mesh — the invariant match_dist.py relies on
    assert edge_window_aligned(make_window_spec(64, 8), n2=64, mesh_size=8)
    assert edge_window_aligned(make_window_spec(64, 8), n2=4, mesh_size=8)
    assert edge_window_aligned(make_window_spec(32, 8), n2=32, mesh_size=8)


def test_windowed_consistency_matches_fused(mesh):
    """Config-5 shape: 64 frames window-sharded over 8 devices; the
    ppermute-halo'd consistency filter equals the fused op exactly."""
    disp, cams = _ring_sequence(64, 48, 64)
    gold = check_consistency(disp, cams, min_dsp=1e-3, max_dsp=10.0,
                             reproj_err=2)
    win = check_consistency_windowed(disp, cams, mesh=mesh, min_dsp=1e-3,
                                     max_dsp=10.0, reproj_err=2, halo=1)
    np.testing.assert_array_equal(np.asarray(win), np.asarray(gold))
    # the filter must be doing real work on this fixture
    kept = (np.asarray(gold) > 0).mean()
    assert 0.05 < kept < 1.0


def test_config5_shaped_align_sharded(mesh):
    """Full align path (features -> edge sweep -> cascade -> RANSAC ->
    keyframe -> SRT) with the edge sweep sharded over the 8-device mesh,
    at a 64-view scale (32+32 frames => 1024 edges)."""
    from multiviewstitch_tpu.core.transforms import Similarity
    from multiviewstitch_tpu.pipeline.fixtures import make_scene, \
        textured_views
    from multiviewstitch_tpu.pipeline.align_seq import (Sequence,
                                                        align_sequences)
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
    result = align_sequences(seqs, cfg, seed=0, mesh=mesh)
    # scene 2 is the SAME base world mapped through gt (cameras included),
    # so the seq1 -> seq2 map is gt itself (same convention as
    # tests/test_e2e_align.py::test_recover_similarity_between_sequences)
    T = result.transforms[0]
    assert abs(float(T.s) - float(gt.s)) / float(gt.s) < 0.08
    dR = np.asarray(T.R) @ np.asarray(gt.R).T
    ang = np.degrees(np.arccos(np.clip((np.trace(dR) - 1) / 2, -1, 1)))
    assert ang < 4.0
