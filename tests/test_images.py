"""Image-dataset loaders driven by tiny on-disk corpora in the upstream
formats (closes the 'synthetic-fallback only' coverage gap: the real
CelebA/FastMRI/BSD500 corpora are absent from the sandbox, but the
FORMATS — image folders, FastMRI-layout h5 k-space, patch grids — are
fully exercisable with generated fixtures).

Reference semantics: utils/celeba_dataloader.py:75-155 (split indices),
utils/fastmri_dataloader.py:96-171 (ifft + center-crop + real-view),
utils/bsd500.py:9-107 (patch grid), utils/sci_dataloader.py:81-161
(folder listing)."""

import os

import numpy as np
import pytest

from deqsci_tpu.data import images as di


@pytest.fixture
def img_dir(tmp_path, rng):
    import cv2
    d = tmp_path / "imgs"
    d.mkdir()
    arrs = []
    for i in range(4):
        a = (rng.random((24, 20, 3)) * 255).astype(np.uint8)
        cv2.imwrite(str(d / f"im_{i:03d}.png"), a)
        arrs.append(a)
    (d / "notes.txt").write_text("ignored")  # non-image files are skipped
    return str(d), arrs


def test_folder_dataset_listing_resize_normalize(img_dir):
    d, arrs = img_dir
    ds = di.FolderDataset(d, size=16)
    assert len(ds) == 4
    x = ds[0]
    assert x.shape == (16, 16, 3) and x.dtype == np.float32
    assert x.min() >= -1.0 and x.max() <= 1.0  # Normalize((0.5),(0.5))
    # unnormalized + gray path
    ds_g = di.FolderDataset(d, gray=True, normalize=False)
    g = ds_g[1]
    assert g.shape == (24, 20, 1)
    assert g.min() >= 0.0 and g.max() <= 1.0
    # deterministic sorted order: file 0 decodes to its own pixels (BGR
    # roundtrip through cv2, so compare against the RGB-flipped source)
    x0 = di.FolderDataset(d, normalize=False)[0]
    np.testing.assert_allclose(x0 * 255, arrs[0][..., ::-1], atol=1.0)


def test_celeba_split_semantics(img_dir, monkeypatch):
    d, _ = img_dir
    # scale the canonical 162770/182638 boundaries down to the fixture
    monkeypatch.setattr(di, "CELEBA_TRAIN_END", 2)
    monkeypatch.setattr(di, "CELEBA_VAL_END", 3)
    train = di.CelebaDataset(d, split="train")
    val = di.CelebaDataset(d, split="val")
    test = di.CelebaDataset(d, split="test")
    assert (len(train), len(val), len(test)) == (2, 1, 1)
    # disjoint cover in sorted order
    assert train.files + val.files + test.files == \
        di.FolderDataset(d).files
    with pytest.raises(ValueError):
        di.CelebaDataset(d, split="everything")
    assert train[0].shape == (64, 64, 3)  # canonical 64^2 resize


def test_fastmri_h5_roundtrip(tmp_path, rng):
    h5py = pytest.importorskip("h5py")
    d = tmp_path / "mri"
    d.mkdir()
    # ground-truth complex images; k-space laid out so the loader's
    # ifftshift(ifft2(k, ortho)) reproduces them exactly
    gts = []
    for fi, n_slices in enumerate((2, 3)):
        vol = (rng.random((n_slices, 32, 32))
               + 1j * rng.random((n_slices, 32, 32))).astype(np.complex64)
        k = np.fft.fft2(np.fft.fftshift(vol, axes=(-2, -1)), norm="ortho")
        with h5py.File(d / f"file{fi}.h5", "w") as h:
            h.create_dataset("kspace", data=k.astype(np.complex64))
        gts.extend(vol)
    ds = di.FastMRIDataset(str(d), crop=16)
    assert len(ds) == 5  # slice index spans both files
    x = ds[0]
    assert x.shape == (16, 16, 2) and x.dtype == np.float32
    want = di.center_crop(gts[0], (16, 16))
    np.testing.assert_allclose(x[..., 0], want.real, atol=1e-5)
    np.testing.assert_allclose(x[..., 1], want.imag, atol=1e-5)
    # instance norm: zero mean / unit std over the real view
    xn = di.FastMRIDataset(str(d), crop=16, instance_norm=True)[3]
    assert abs(float(xn.mean())) < 1e-5
    np.testing.assert_allclose(float(xn.std()), 1.0, atol=1e-3)


def test_bsd500_patch_grid(tmp_path, rng):
    import cv2
    d = tmp_path / "bsd"
    d.mkdir()
    for i in range(2):
        a = (rng.random((50, 60)) * 255).astype(np.uint8)
        cv2.imwrite(str(d / f"bsd_{i}.png"), a)
    ds = di.BSD500PatchDataset(str(d), patch_size=40, stride=10)
    p = ds[0]
    assert p.shape[:2] == (40, 40)
    # grid count: positions are range(0, dim - patch + 1, stride)
    per_img = len(range(0, 50 - 40 + 1, 10)) * len(range(0, 60 - 40 + 1, 10))
    assert len(ds) == 2 * per_img
