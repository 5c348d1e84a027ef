import numpy as np
import pytest

from multiviewstitch_tpu.io import native_loader as nl
from multiviewstitch_tpu.io.meshio import write_obj, write_npts, read_obj
from multiviewstitch_tpu.io.rawdepth import save_depth_raw


@pytest.fixture(scope="module", autouse=True)
def require_native():
    assert nl.native_available(), "native build failed (g++ present?)"


def test_raw_batch_matches_python(tmp_path):
    rng = np.random.default_rng(0)
    paths = []
    ref = []
    for i in range(6):
        d = rng.uniform(0, 0.5, size=(24, 32)).astype(np.float32)
        p = str(tmp_path / f"_depth{i}.raw")
        save_depth_raw(p, d)
        paths.append(p)
        ref.append(d)
    out = nl.load_raw_batch(paths, 32, 24)
    np.testing.assert_array_equal(out, np.stack(ref))


def test_raw_batch_reports_failure(tmp_path):
    p = str(tmp_path / "missing.raw")
    with pytest.raises(IOError):
        nl.load_raw_batch([p], 8, 8)


def test_npts_matches_python(tmp_path):
    rng = np.random.default_rng(1)
    pts = rng.normal(size=(500, 3)).astype(np.float32)
    nrm = rng.normal(size=(500, 3)).astype(np.float32)
    p = str(tmp_path / "a.npts")
    write_npts(p, pts, nrm)
    p2, n2 = nl.parse_npts(p)
    np.testing.assert_allclose(p2, pts, rtol=1e-6)
    np.testing.assert_allclose(n2, nrm, rtol=1e-6)


def test_obj_matches_python(tmp_path):
    rng = np.random.default_rng(2)
    v = rng.normal(size=(40, 3)).astype(np.float32)
    n = rng.normal(size=(40, 3)).astype(np.float32)
    f = rng.integers(0, 40, size=(60, 3)).astype(np.int32)
    p = str(tmp_path / "m.obj")
    write_obj(p, v, n, f)
    vp, np_, fp = read_obj(p)
    vn, nn, fn = nl.parse_obj(p)
    np.testing.assert_allclose(vn, vp, rtol=1e-6)
    np.testing.assert_allclose(nn, np_, rtol=1e-6)
    np.testing.assert_array_equal(fn, fp)


def test_write_raw_roundtrip(tmp_path):
    d = np.random.default_rng(3).normal(size=(16, 20)).astype(np.float32)
    p = str(tmp_path / "w.raw")
    nl.write_raw(p, d)
    out = nl.load_raw_batch([p], 20, 16)
    np.testing.assert_array_equal(out[0], d)
