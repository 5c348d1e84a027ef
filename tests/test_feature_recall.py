"""Feature matching recall under known warps (quality regression guard).

The reference gets detection/description from SiftGPU (FeatureProc.cpp:20)
and never measures quality; this harness renders a textured image, warps it
by a known similarity, runs detect+describe+match on both, and checks
matching recall/precision against the ground-truth correspondence. Pins the
descriptor improvements (trilinear soft binning, scale-adaptive
orientation) at measured-minus-margin thresholds.
"""

import numpy as np
import jax.numpy as jnp

from multiviewstitch_tpu.ops.features import detect_and_describe
from multiviewstitch_tpu.ops.match import match_descriptors


def _texture(h=240, w=320, seed=0):
    rng = np.random.default_rng(seed)
    img = np.zeros((h, w), np.float32)
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    for _ in range(120):
        cy, cx = rng.uniform(20, h - 20), rng.uniform(20, w - 20)
        s = rng.uniform(2.0, 9.0)
        a = rng.uniform(-1.0, 1.0)
        img += a * np.exp(-((yy - cy) ** 2 + (xx - cx) ** 2) / (2 * s * s))
    img += 0.02 * rng.normal(size=(h, w)).astype(np.float32)
    return img.astype(np.float32)


def _warp(img, A, b):
    h, w = img.shape
    yy, xx = np.mgrid[0:h, 0:w].astype(np.float32)
    Ai = np.linalg.inv(A)
    sx = Ai[0, 0] * (xx - b[0]) + Ai[0, 1] * (yy - b[1])
    sy = Ai[1, 0] * (xx - b[0]) + Ai[1, 1] * (yy - b[1])
    x0 = np.clip(np.floor(sx).astype(int), 0, w - 2)
    y0 = np.clip(np.floor(sy).astype(int), 0, h - 2)
    fx = np.clip(sx - x0, 0, 1)
    fy = np.clip(sy - y0, 0, 1)
    v = (img[y0, x0] * (1 - fx) * (1 - fy) + img[y0, x0 + 1] * fx * (1 - fy)
         + img[y0 + 1, x0] * (1 - fx) * fy + img[y0 + 1, x0 + 1] * fx * fy)
    inside = (sx >= 0) & (sx <= w - 1) & (sy >= 0) & (sy <= h - 1)
    return (v * inside).astype(np.float32)


def _recall(theta_deg, scale, tol=3.0):
    """Matching recall/precision over DISTINCT keypoint positions (the
    standard protocol): dual-orientation duplicates of one detection count
    once, and a position is recalled if ANY of its copies matches
    correctly. Precision stays per emitted match."""
    img = _texture()
    h, w = img.shape
    th = np.deg2rad(theta_deg)
    A = scale * np.array([[np.cos(th), -np.sin(th)],
                          [np.sin(th), np.cos(th)]], np.float32)
    c = np.array([w / 2, h / 2], np.float32)
    b = c - A @ c
    img2 = _warp(img, A, b)

    kp1 = detect_and_describe(jnp.asarray(img), max_keypoints=256)
    kp2 = detect_and_describe(jnp.asarray(img2), max_keypoints=256)
    m = match_descriptors(kp1.desc, kp1.valid, kp2.desc, kp2.valid)

    uv1, uv2 = np.asarray(kp1.uv), np.asarray(kp2.uv)
    v1 = np.asarray(kp1.valid)
    gt = (A @ uv1.T).T + b
    inside = (gt[:, 0] > 8) & (gt[:, 0] < w - 8) & (gt[:, 1] > 8) & \
             (gt[:, 1] < h - 8) & v1
    mi1, mi2 = np.asarray(m.idx1), np.asarray(m.idx2)
    mok = np.asarray(m.valid) & inside[mi1]
    err = np.linalg.norm(gt[mi1] - uv2[mi2], axis=1)
    correct = mok & (err < tol)
    precision = correct.sum() / max(int(mok.sum()), 1)

    # group copies by (sub-pixel) position
    key = np.round(uv1 * 8).astype(np.int64)
    key = key[:, 0] * (1 << 20) + key[:, 1]
    pos_inside = np.unique(key[inside])
    pos_correct = np.unique(key[mi1][correct])
    recall = np.isin(pos_inside, pos_correct).mean() if len(pos_inside) \
        else 0.0
    return recall, precision


def test_recall_identity():
    r, p = _recall(0, 1.0)
    assert r >= 0.95 and p >= 0.95, (r, p)


def test_recall_rot30():
    # round-5 measurement: 0.847 / 0.967 (round 1: 0.636 sampling the raw
    # image). Gate = measured minus noise (VERDICT r4 item 8 ratchet; the
    # old 0.80 floor would have passed a 4-point regression silently).
    # Aspirational target >= 0.85 at 30 deg: the remaining misses are
    # dual-orientation flips near the 36-bin histogram's 0.8-peak
    # threshold, not description errors.
    r, p = _recall(30, 1.0)
    assert r >= 0.82 and p >= 0.96, (r, p)


def test_recall_rot_and_scale():
    # round-5 measurement: 0.776 / 0.968 (round 1: 0.62)
    r, p = _recall(30, 1.25)
    assert r >= 0.75 and p >= 0.96, (r, p)


def test_recall_wide_baseline_rot45():
    # VERDICT r4 item 8: a wide-baseline case with a recorded number.
    # round-5 measurement: 0.895 / 0.967 — 45 deg is STRONGER than 30 on
    # this fixture (45 sits exactly between two 10-deg histogram bin
    # centers, so the dominant-orientation vote splits less often than at
    # 30's bin-edge alignment).
    r, p = _recall(45, 1.0)
    assert r >= 0.85 and p >= 0.96, (r, p)


def test_recall_wide_baseline_rot45_scale():
    # round-5 measurement: 0.813 / 0.967
    r, p = _recall(45, 1.25)
    assert r >= 0.78 and p >= 0.96, (r, p)
