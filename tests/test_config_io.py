import numpy as np

from multiviewstitch_tpu.config import StitchConfig, load_legacy_config
from multiviewstitch_tpu.io import (read_obj, write_obj, read_npts,
                                    write_npts, load_depth_raw,
                                    save_depth_raw, depth_to_image)
from multiviewstitch_tpu.io.manifest import StageManifest, hash_arrays

REF_CONFIG = """\
#parameters for sequence alignment
ImgPathList ./imgPathList.txt
ViewCount 3
MinMatchCount 7
Segment 0
IterNum 200
SSDError 40.0
RotAngle 10.0
MinDsp 0.0025
MaxDsp 0.3
PsnDptMax 10
DistThreshold 0.81
SmoothThreshold 0.12
"""


def test_legacy_config_parse(tmp_path):
    p = tmp_path / "config.txt"
    p.write_text(REF_CONFIG)
    lst = tmp_path / "imgPathList.txt"
    lst.write_text("#../data/body1/\n../data/body3/00/\n../data/body3/01/\n")
    cfg = load_legacy_config(str(p))
    assert cfg.view_count == 3
    assert cfg.min_match_count == 7
    assert cfg.segment is False
    assert cfg.iter_num == 200
    assert abs(cfg.ssd_err - 40.0) < 1e-9
    assert abs(cfg.min_dsp - 0.0025) < 1e-12
    assert cfg.psn_dpt_max == 10
    assert abs(cfg.dist_thres - 0.81) < 1e-9
    assert cfg.image_dirs == ("../data/body3/00/", "../data/body3/01/")
    # untouched keys keep reference defaults (ParamParser.cpp:5-43)
    assert cfg.sample_radius == 2
    assert cfg.nbr_frm_num == 5


def test_config_immutable_replace():
    cfg = StitchConfig()
    cfg2 = cfg.replace(view_count=5)
    assert cfg.view_count == 1 and cfg2.view_count == 5


def test_obj_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    v = rng.normal(size=(10, 3)).astype(np.float32)
    n = rng.normal(size=(10, 3)).astype(np.float32)
    f = np.array([[0, 1, 2], [3, 4, 5]], np.int32)
    p = str(tmp_path / "m.obj")
    write_obj(p, v, n, f)
    v2, n2, f2 = read_obj(p)
    np.testing.assert_allclose(v2, v, atol=1e-5)
    np.testing.assert_allclose(n2, n, atol=1e-5)
    np.testing.assert_array_equal(f2, f)


def test_obj_no_normals(tmp_path):
    v = np.eye(3, dtype=np.float32)
    f = np.array([[0, 1, 2]], np.int32)
    p = str(tmp_path / "m.obj")
    write_obj(p, v, None, f)
    v2, n2, f2 = read_obj(p)
    np.testing.assert_allclose(v2, v)
    assert n2 is None
    np.testing.assert_array_equal(f2, f)


def test_npts_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(20, 3)).astype(np.float32)
    nrm = rng.normal(size=(20, 3)).astype(np.float32)
    p = str(tmp_path / "a.npts")
    write_npts(p, pts, nrm)
    p2, n2 = read_npts(p)
    np.testing.assert_allclose(p2, pts, atol=1e-5)
    np.testing.assert_allclose(n2, nrm, atol=1e-5)


def test_raw_depth_roundtrip(tmp_path):
    d = np.random.default_rng(2).uniform(0, 0.5, size=(12, 16)).astype(np.float32)
    p = str(tmp_path / "d.raw")
    save_depth_raw(p, d)
    d2 = load_depth_raw(p, 16, 12)
    np.testing.assert_array_equal(d2, d)
    img = depth_to_image(d2)
    assert img.dtype == np.uint8 and img.shape == (12, 16)


def test_manifest_stages(tmp_path):
    m = StageManifest(str(tmp_path / "work"))
    assert not m.is_done("consistency")
    art = m.save_arrays("consistency", "depths", d=np.ones((4, 4)))
    m.mark_done("consistency", [art], input_hash="abc",
                metrics={"valid_frac": 0.9})
    m2 = StageManifest(str(tmp_path / "work"))
    assert m2.is_done("consistency", "abc")
    assert not m2.is_done("consistency", "other-hash")
    assert m2.metrics("consistency")["valid_frac"] == 0.9
    # corrupting the artifact invalidates the stage
    with open(art, "ab") as f:
        f.write(b"x")
    assert not StageManifest(str(tmp_path / "work")).is_done("consistency", "abc")


def test_hash_arrays_deterministic():
    a = np.arange(10)
    assert hash_arrays(x=a) == hash_arrays(x=a.copy())
    assert hash_arrays(x=a) != hash_arrays(x=a + 1)
