"""MATLAB v7.3 (HDF5) .mat loading: the transpose-back-to-MATLAB-order
path (utils/sci_dataloader.py:188-210 semantics)."""

import h5py
import numpy as np
import scipy.io as sio

from deqsci_tpu.data.sci_mat import load_mat, load_test_data


def _write_v73(path, arrays):
    """Write a v7.3-style .mat: HDF5 with MATLAB column-major layout,
    i.e. datasets stored transposed relative to the logical array."""
    with h5py.File(path, "w") as f:
        for k, v in arrays.items():
            f.create_dataset(k, data=np.ascontiguousarray(v.T))


def test_v73_roundtrip(tmp_path, rng):
    gt = (rng.random((16, 16, 8)) * 255).astype(np.float64)
    path = str(tmp_path / "sample_v73.mat")
    _write_v73(path, {"patch_save": gt})
    got = load_mat(path, "gt")
    np.testing.assert_allclose(got, np.float32(gt / 255), rtol=1e-6)


def test_v73_test_data(tmp_path, rng):
    arrays = {
        "orig": (rng.random((16, 16, 16)) * 255).astype(np.float64),
        "meas": (rng.random((16, 16, 2)) * 255).astype(np.float64),
        "mask": (rng.random((16, 16, 8)) > 0.5).astype(np.float64),
    }
    path = str(tmp_path / "clip_v73.mat")
    _write_v73(path, arrays)
    got = load_test_data(path)
    np.testing.assert_allclose(got["gt"], np.float32(arrays["orig"]) / 255,
                               rtol=1e-6)
    np.testing.assert_allclose(got["meas"], np.float32(arrays["meas"]) / 255,
                               rtol=1e-6)
    np.testing.assert_array_equal(got["mask"], np.float32(arrays["mask"]))


def test_v72_still_works(tmp_path, rng):
    gt = (rng.random((8, 8, 8)) * 255).astype(np.float64)
    path = str(tmp_path / "sample_v72.mat")
    sio.savemat(path, {"p1": gt})
    got = load_mat(path, "gt")
    np.testing.assert_allclose(got, np.float32(gt / 255), rtol=1e-6)
