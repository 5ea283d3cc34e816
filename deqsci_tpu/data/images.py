"""Image datasets for the upstream (non-SCI) capability surface.

Torch-free rebuilds of utils/celeba_dataloader.py:75-155,
utils/fastmri_dataloader.py:96-171, utils/bsd500.py:9-107 and the generic
``FolderDataset`` (utils/sci_dataloader.py:81-161). All yield float32
numpy NHWC; none of the corpora are bundled with the reference checkout,
so these gate cleanly on directory existence.
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Optional, Tuple

import numpy as np

# CelebA's canonical split boundaries (celeba_dataloader.py:95-101)
CELEBA_TRAIN_END = 162770
CELEBA_VAL_END = 182638


def _imread_float(path: str, gray: bool = False) -> np.ndarray:
    import cv2
    flag = cv2.IMREAD_GRAYSCALE if gray else cv2.IMREAD_COLOR
    img = cv2.imread(path, flag)
    if img is None:
        raise IOError(f"failed to read {path}")
    if not gray:
        img = cv2.cvtColor(img, cv2.COLOR_BGR2RGB)
    return np.float32(img) / 255.0


def normalize_pm1(x: np.ndarray, mean: float = 0.5, std: float = 0.5
                  ) -> np.ndarray:
    """The reference's Normalize((0.5,...), (0.5,...)): [0,1] -> [-1,1]."""
    return (x - mean) / std


@dataclass
class FolderDataset:
    """All images in a directory, optionally square-resized."""

    directory: str
    size: Optional[int] = None
    gray: bool = False
    normalize: bool = True

    def __post_init__(self):
        self.files = sorted(
            os.path.join(self.directory, f)
            for f in os.listdir(self.directory)
            if f.lower().endswith((".png", ".jpg", ".jpeg", ".bmp")))

    def __len__(self):
        return len(self.files)

    def __getitem__(self, i: int) -> np.ndarray:
        import cv2
        img = _imread_float(self.files[i], self.gray)
        if self.size is not None:
            img = cv2.resize(img, (self.size, self.size),
                             interpolation=cv2.INTER_AREA)
        if img.ndim == 2:
            img = img[..., None]
        return normalize_pm1(img) if self.normalize else img


@dataclass
class CelebaDataset(FolderDataset):
    """CelebA with the canonical train/val/test index split."""

    split: str = "train"
    size: Optional[int] = 64

    def __post_init__(self):
        super().__post_init__()
        if self.split == "train":
            self.files = self.files[:CELEBA_TRAIN_END]
        elif self.split == "val":
            self.files = self.files[CELEBA_TRAIN_END:CELEBA_VAL_END]
        elif self.split == "test":
            self.files = self.files[CELEBA_VAL_END:]
        else:
            raise ValueError(self.split)


def center_crop(x: np.ndarray, size: Tuple[int, int]) -> np.ndarray:
    h, w = x.shape[-2], x.shape[-1]
    th, tw = size
    i = (h - th) // 2
    j = (w - tw) // 2
    return x[..., i:i + th, j:j + tw]


@dataclass
class FastMRIDataset:
    """Single-coil FastMRI h5 slices, center-cropped to 320^2, returned as
    (H, W, 2) real-view complex with optional instance norm."""

    directory: str
    crop: int = 320
    instance_norm: bool = False

    def __post_init__(self):
        self.files = sorted(
            os.path.join(self.directory, f)
            for f in os.listdir(self.directory) if f.endswith(".h5"))
        self._index = []
        import h5py
        for f in self.files:
            with h5py.File(f, "r") as h:
                n = h["kspace"].shape[0]
            self._index += [(f, s) for s in range(n)]

    def __len__(self):
        return len(self._index)

    def __getitem__(self, i: int) -> np.ndarray:
        import h5py
        path, sl = self._index[i]
        with h5py.File(path, "r") as h:
            kspace = np.asarray(h["kspace"][sl])
        img = np.fft.ifftshift(np.fft.ifft2(kspace, norm="ortho"))
        img = center_crop(img, (self.crop, self.crop))
        out = np.stack([img.real, img.imag], axis=-1).astype(np.float32)
        if self.instance_norm:
            out = (out - out.mean()) / (out.std() + 1e-8)
        return out


@dataclass
class BSD500PatchDataset:
    """BSD500-style gray patch set from an image directory."""

    directory: str
    patch_size: int = 40
    stride: int = 20

    def __post_init__(self):
        from deqsci_tpu.data.patches import build_patch_set
        files = sorted(
            os.path.join(self.directory, f)
            for f in os.listdir(self.directory)
            if f.lower().endswith((".png", ".jpg", ".jpeg")))
        imgs = [_imread_float(f, gray=True) for f in files]
        self.patches = build_patch_set(imgs, self.patch_size, self.stride)

    def __len__(self):
        return len(self.patches)

    def __getitem__(self, i: int) -> np.ndarray:
        return self.patches[i]
