"""Native C++ .npy batch loader tests: parity with np.load, parallelism,
fallback behavior, and its use inside the dataset."""
import os

import numpy as np
import pytest

from facl_tpu.data import native


@pytest.fixture(scope="module")
def npy_files(tmp_path_factory):
    d = tmp_path_factory.mktemp("npys")
    arrays = {
        "f32_2d.npy": np.random.default_rng(0).normal(
            size=(128, 8)).astype(np.float32),
        "f64_2d.npy": np.random.default_rng(1).normal(
            size=(64, 5)).astype(np.float64),
        "i32_1d.npy": np.arange(100, dtype=np.int32),
        "f32_3d.npy": np.random.default_rng(2).normal(
            size=(4, 32, 4)).astype(np.float32),
    }
    paths = {}
    for name, arr in arrays.items():
        p = str(d / name)
        np.save(p, arr)
        paths[p] = arr
    return paths


def test_native_builds():
    assert native.native_available(), "g++ build of npy_loader.cc failed"


def test_load_batch_matches_numpy(npy_files):
    paths = list(npy_files)
    max_elems = max(a.size for a in npy_files.values())
    buf, shapes = native.load_batch(paths, max_elems, num_threads=2)
    for i, p in enumerate(paths):
        exp = npy_files[p].astype(np.float32)
        assert shapes[i] == exp.shape
        np.testing.assert_array_equal(buf[i, :exp.size],
                                      exp.reshape(-1))


def test_load_batch_fallback_on_bad_file(tmp_path, npy_files):
    bad = str(tmp_path / "not_npy.npy")
    with open(bad, "wb") as f:
        f.write(b"garbage")
    good = list(npy_files)[0]
    with pytest.raises(Exception):
        native.load_batch([good, bad], 2048)


def test_probe(npy_files):
    lib = native.get_lib()
    assert lib is not None
    import ctypes
    p = list(npy_files)[0]
    shape = np.zeros(4, np.int64)
    ndim = np.zeros(1, np.int32)
    elems = lib.nl_probe(
        p.encode(), shape.ctypes.data_as(ctypes.POINTER(ctypes.c_int64)),
        ndim.ctypes.data_as(ctypes.POINTER(ctypes.c_int32)))
    exp = npy_files[p]
    assert elems == exp.size
    assert tuple(shape[:ndim[0]]) == exp.shape
