"""MATLAB .mat loaders for SCI data (torch-free, matching reference keys).

Reproduces the behavior of utils/sci_dataloader.py:163-274:

* v7.2-and-below files via scipy.io, v7.3 (HDF5) via h5py with a transpose
  back to MATLAB column order;
* ground-truth key sniffing over ``patch_save | p1 | p2 | p3``;
* gt and measurements scaled by /255, masks kept as-is;
* test files carry ``{meas/255, orig/255, mask}``.

Outputs are float32 numpy arrays in the channel-last layout the whole
framework uses: mask (H, W, T), gt (H, W, T*S), meas (H, W, S) for S
snapshots (squeezed shapes mirror what the reference's DataLoader yields).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Dict, List

import numpy as np

_GT_KEYS = ("patch_save", "p1", "p2", "p3")


def _load_raw(path: str) -> Dict[str, np.ndarray]:
    """Load a .mat of either vintage into a plain dict of arrays."""
    import scipy.io as sio
    try:
        file = sio.loadmat(path)
        return {k: v for k, v in file.items() if not k.startswith("__")}
    except (NotImplementedError, ValueError):
        # v7.3 (scipy raises NotImplementedError with the MATLAB userblock,
        # ValueError on a bare HDF5 file)
        import h5py
        with h5py.File(path, "r") as f:
            # MATLAB v7.3 stores column-major; transpose restores the
            # reference's layout (utils/sci_dataloader.py:209-210).
            return {k: np.asarray(f[k]).transpose() for k in f.keys()}


def load_mat(path: str, key: str) -> np.ndarray:
    """Load one array with the reference's key handling (gt/meas/mask)."""
    file = _load_raw(path)
    if key == "gt":
        for k in _GT_KEYS:
            if k in file:
                return np.float32(file[k] / 255)
        raise KeyError(f"no gt key in {path}: {list(file)}")
    if key == "meas":
        return np.float32(file["meas"] / 255)
    if key == "mask":
        return np.float32(file["mask"])
    raise KeyError(f"unknown key {key!r}")


def load_test_data(path: str) -> Dict[str, np.ndarray]:
    """Load a ``*_cacti.mat`` benchmark file: {gt, mask, meas}."""
    file = _load_raw(path)
    return {
        "gt": np.float32(file["orig"]) / 255,
        "mask": np.float32(file["mask"]),
        "meas": np.float32(file["meas"]) / 255,
    }


def directory_filelist(directory: str) -> List[str]:
    """Sorted non-hidden regular files (reference's directory_filelist)."""
    return sorted(
        f for f in os.listdir(directory)
        if not f.startswith(".")
        and os.path.isfile(os.path.join(directory, f))
    )


@dataclass
class SCITestDataset:
    """Iterates benchmark .mat files in a directory (bsz-1 semantics)."""

    directory: str

    def __post_init__(self):
        self.files = directory_filelist(self.directory)

    def __len__(self):
        return len(self.files)

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        data = load_test_data(os.path.join(self.directory, self.files[i]))
        data["file"] = self.files[i]
        return data

    def __iter__(self):
        for i in range(len(self)):
            yield self[i]


@dataclass
class SCITrainingDataset:
    """Paired gt/measurement .mat dirs with a shared mask
    (reference SCITrainingDatasetSubset, utils/sci_dataloader.py:218-239).

    ``cache_clips`` memoizes each decoded clip in RAM (float32): a
    256x256x8 gt+meas pair is ~2.3 MB, so even a ~1500-clip corpus is
    ~3.4 GB — decode cost is paid once per clip instead of once per
    epoch (~20 ms/clip uncontended, much worse when the training
    process competes for a 1-vCPU host). ``preload()`` pays the whole
    cost up front so training steps never share the host with decode
    work. Host-side knob only — sample values are identical either way.
    """

    gt_directory: str
    meas_directory: str
    mask_location: str
    cache_clips: bool = False

    def __post_init__(self):
        names = directory_filelist(self.gt_directory)
        self.gt_files = [os.path.join(self.gt_directory, n) for n in names]
        self.meas_files = [os.path.join(self.meas_directory, n) for n in names]
        self.mask = load_mat(self.mask_location, "mask")
        self._cache: Dict[int, Dict[str, np.ndarray]] = {}

    def __len__(self):
        return len(self.gt_files)

    def preload(self) -> None:
        """Decode every clip into the RAM cache (implies cache_clips)."""
        self.cache_clips = True
        for i in range(len(self)):
            self[i]

    def __getitem__(self, i: int) -> Dict[str, np.ndarray]:
        if self.cache_clips and i in self._cache:
            return dict(self._cache[i])
        sample = {
            "gt": load_mat(self.gt_files[i], "gt"),
            "meas": load_mat(self.meas_files[i], "meas"),
            "mask": self.mask,
        }
        if self.cache_clips:
            # Freeze the cached arrays and hand out a shallow copy per
            # access: a consumer mutating a sample in place (future
            # augmentation, scaling) must not silently corrupt the corpus
            # for every later epoch — writes now raise instead.
            for arr in sample.values():
                arr.flags.writeable = False
            self._cache[i] = sample
            return dict(sample)
        return sample
