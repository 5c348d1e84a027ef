import numpy as np
import jax.numpy as jnp

from multiviewstitch_tpu.ops.consistency import (check_consistency,
                                                 consistency_stats)
from multiviewstitch_tpu.pipeline.fixtures import make_scene

MIN_DSP, MAX_DSP = 1e-3, 10.0


def test_consistent_scene_survives():
    # 12 ring cameras = 30 deg neighbor baseline (video-like; the check is
    # built for small-baseline sequences, Processor.cpp:49-55)
    scene = make_scene(n_frames=12, width=96, height=72, bumps=0.0,
                       n_lat=48, n_lon=64)
    d = jnp.asarray(scene.disparity)
    out = check_consistency(d, scene.cams, min_dsp=MIN_DSP, max_dsp=MAX_DSP,
                            reproj_err=4)
    before = (scene.disparity >= MIN_DSP) & (scene.disparity <= MAX_DSP)
    after = np.asarray(out) > 0
    # a geometrically consistent scene keeps the bulk of its valid pixels
    # (silhouette pixels die: neighbors see past the rim — correct behavior)
    assert after.sum() > 0.5 * before.sum()
    # every surviving pixel was valid before and keeps its exact disparity
    assert np.all(before[after])
    np.testing.assert_array_equal(np.asarray(out)[after],
                                  scene.disparity[after])


def test_corrupted_frame_pixels_killed():
    scene = make_scene(n_frames=12, width=96, height=72, bumps=0.0,
                       n_lat=48, n_lon=64)
    d = scene.disparity.copy()
    clean = check_consistency(jnp.asarray(d), scene.cams, min_dsp=MIN_DSP,
                              max_dsp=MAX_DSP, reproj_err=4)
    clean_mask = np.asarray(clean)[1] > 0
    # corrupt frame 1's depths in a block that survives the clean pass:
    # halving the disparity doubles the depth -> inconsistent with neighbors
    ys, xs = np.where(clean_mask)
    yc, xc = int(np.median(ys)), int(np.median(xs))
    sel = (slice(yc - 4, yc + 4), slice(xc - 4, xc + 4))
    assert clean_mask[sel].sum() > 16  # block sits on surviving surface
    d1 = d.copy()
    d1[1][sel] = d1[1][sel] * 0.5
    out = np.asarray(check_consistency(jnp.asarray(d1), scene.cams,
                                       min_dsp=MIN_DSP, max_dsp=MAX_DSP,
                                       reproj_err=4))
    corrupted_then = d[1][sel] > 0
    survived = out[1][sel][corrupted_then] > 0
    assert survived.mean() < 0.2  # corrupted pixels overwhelmingly killed


def test_out_of_range_zeroed():
    scene = make_scene(n_frames=3, width=64, height=48, bumps=0.0,
                       n_lat=32, n_lon=48)
    d = scene.disparity.copy()
    d[0, 0, 0] = 100.0  # out of range
    out = np.asarray(check_consistency(jnp.asarray(d), scene.cams,
                                       min_dsp=MIN_DSP, max_dsp=MAX_DSP,
                                       reproj_err=4))
    assert out[0, 0, 0] == 0.0


def test_single_frame_passthrough():
    # with one frame there are no neighbors: valid pixels survive untouched
    scene = make_scene(n_frames=1, width=64, height=48, bumps=0.0,
                       n_lat=32, n_lon=48)
    d = jnp.asarray(scene.disparity)
    out = np.asarray(check_consistency(d, scene.cams, min_dsp=MIN_DSP,
                                       max_dsp=MAX_DSP, reproj_err=4))
    valid = (scene.disparity >= MIN_DSP) & (scene.disparity <= MAX_DSP)
    np.testing.assert_array_equal(out[valid], scene.disparity[valid])
    assert np.all(out[~valid] == 0)


def test_stats():
    scene = make_scene(n_frames=2, width=64, height=48, bumps=0.0,
                       n_lat=32, n_lon=48)
    d = jnp.asarray(scene.disparity)
    out = check_consistency(d, scene.cams, min_dsp=MIN_DSP, max_dsp=MAX_DSP,
                            reproj_err=4)
    s = consistency_stats(d, out, MIN_DSP, MAX_DSP)
    assert 0 < s["valid_after"] <= s["valid_before"] < 1
