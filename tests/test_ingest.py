"""Legacy on-disk layout round trip: export demo sequences in the
reference's directory format, reload through the legacy config path, and
re-run the alignment — full-format interop in one test."""

import os

import numpy as np
import jax.numpy as jnp

from multiviewstitch_tpu.pipeline.ingest import (save_sequence_dir,
                                                 load_sequence_dir,
                                                 load_sequences)
from multiviewstitch_tpu.config import load_legacy_config


def test_sequence_dir_roundtrip(tmp_path):
    from tests.test_e2e_align import build_two_sequences, CFG
    seq1, seq2, gt, base, moved = build_two_sequences(n_frames=3,
                                                      width=96, height=72)
    d = str(tmp_path / "seq0")
    save_sequence_dir(d, seq1)
    assert os.path.exists(os.path.join(d, "cameras.act"))
    assert os.path.exists(os.path.join(d, "DATA", "_depth0.raw"))
    assert os.path.exists(os.path.join(d, "00000.jpg"))

    back = load_sequence_dir(d, CFG)
    np.testing.assert_array_equal(np.asarray(back.disparity),
                                  np.asarray(seq1.disparity))
    np.testing.assert_allclose(np.asarray(back.cams.R),
                               np.asarray(seq1.cams.R), atol=1e-5)
    # jpeg is lossy: photometrics close, not exact
    g0 = np.asarray(seq1.gray)
    g1 = np.asarray(back.gray)
    assert np.abs(g0 - g1).mean() < 4.0


def test_load_sequences_via_legacy_config(tmp_path):
    from tests.test_e2e_align import build_two_sequences, CFG
    seq1, seq2, gt, base, moved = build_two_sequences(n_frames=3,
                                                      width=96, height=72)
    save_sequence_dir(str(tmp_path / "s0"), seq1)
    save_sequence_dir(str(tmp_path / "s1"), seq2)
    (tmp_path / "imgPathList.txt").write_text("./s0/\n./s1/\n")
    (tmp_path / "config.txt").write_text(
        "ImgPathList ./imgPathList.txt\nViewCount 1\nMinDsp 0.001\n"
        "MaxDsp 10.0\n")
    cfg = load_legacy_config(str(tmp_path / "config.txt"))
    seqs = load_sequences(cfg, str(tmp_path))
    assert len(seqs) == 2
    assert seqs[0].gray.shape == (3, 72, 96)
    assert seqs[1].cams.width == 96


def test_depth_only_sequence(tmp_path):
    """Sequences without RGB fall back to disparity-derived photometrics."""
    from tests.test_e2e_align import build_two_sequences, CFG
    seq1, *_ = build_two_sequences(n_frames=2, width=64, height=48)
    d = str(tmp_path / "s")
    save_sequence_dir(d, seq1)
    for f in os.listdir(d):
        if f.endswith(".jpg"):
            os.remove(os.path.join(d, f))
    back = load_sequence_dir(d, CFG)
    g = np.asarray(back.gray)
    assert g.max() <= 255.0 and g.max() > 10.0
