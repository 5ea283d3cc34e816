"""Patch-based denoiser-pretraining data (FFDNet training kit).

Rebuild of networks/ffdnet/dataset.py + prepare_patches.py: extract
``patch_size`` x ``patch_size`` patches on a ``stride`` grid from gray
images, optionally scaled copies, shuffled; yields float32 in [0, 1],
NHWC. Two storage modes:

* in-memory (``build_patch_set`` + ``batch_iterator``) for corpora that
  fit in RAM (the bundled benchmarks);
* h5-backed (``prepare_patches`` + ``H5PatchDataset``), the reference's
  one-dataset-per-patch layout (dataset.py:47-117), for large-corpus
  pretraining that must stream from disk.
"""

from __future__ import annotations

from typing import Iterator, List, Sequence

import numpy as np


def img_to_patches(img: np.ndarray, patch_size: int, stride: int
                   ) -> np.ndarray:
    """(H, W) -> (n_patches, p, p) over the stride grid."""
    h, w = img.shape[:2]
    ps = []
    for i in range(0, h - patch_size + 1, stride):
        for j in range(0, w - patch_size + 1, stride):
            ps.append(img[i:i + patch_size, j:j + patch_size])
    if not ps:
        return np.zeros((0, patch_size, patch_size), img.dtype)
    return np.stack(ps)


def build_patch_set(images: Sequence[np.ndarray], patch_size: int = 50,
                    stride: int = 25, scales: Sequence[float] = (1.0,),
                    max_patches: int | None = None,
                    seed: int = 0) -> np.ndarray:
    """(N, p, p, 1) float32 patches from a list of gray images in [0,1]."""
    import cv2
    out: List[np.ndarray] = []
    for img in images:
        img = np.asarray(img, np.float32)
        for s in scales:
            if s != 1.0:
                scaled = cv2.resize(img, None, fx=s, fy=s,
                                    interpolation=cv2.INTER_CUBIC)
            else:
                scaled = img
            out.append(img_to_patches(scaled, patch_size, stride))
    patches = np.concatenate([p for p in out if len(p)], axis=0)
    rng = np.random.default_rng(seed)
    perm = rng.permutation(len(patches))
    patches = patches[perm]
    if max_patches is not None:
        patches = patches[:max_patches]
    return patches[..., None]


def batch_iterator(data: np.ndarray, batch_size: int, seed: int = 0,
                   shuffle: bool = True) -> Iterator[np.ndarray]:
    """One epoch of batches (drop_last semantics)."""
    idx = np.arange(len(data))
    if shuffle:
        np.random.default_rng(seed).shuffle(idx)
    for i in range(0, len(idx) - batch_size + 1, batch_size):
        yield data[idx[i:i + batch_size]]


def batch_patch_swap(batch: np.ndarray, patch_size: int, n_swaps: int = 1,
                     seed: int = 0) -> np.ndarray:
    """Augmentation from utils/sci_dataloader.py:13-62: swap random
    same-location square patches between pairs of samples in a batch."""
    out = batch.copy()
    rng = np.random.default_rng(seed)
    n, h, w = batch.shape[:3]
    for _ in range(n_swaps):
        a, b = rng.choice(n, 2, replace=False)
        i = rng.integers(0, h - patch_size + 1)
        j = rng.integers(0, w - patch_size + 1)
        tmp = out[a, i:i + patch_size, j:j + patch_size].copy()
        out[a, i:i + patch_size, j:j + patch_size] = \
            out[b, i:i + patch_size, j:j + patch_size]
        out[b, i:i + patch_size, j:j + patch_size] = tmp
    return out


def data_augmentation(image: np.ndarray, mode: int) -> np.ndarray:
    """The Tassano kit's 8 dihedral modes (networks/ffdnet/utils.py:23-57):
    0 identity, 1 flipud, 2 rot90, 3 rot90+flipud, 4 rot180,
    5 rot180+flipud, 6 rot270, 7 rot270+flipud. Image is (C, H, W)."""
    out = np.transpose(image, (1, 2, 0))
    if mode == 1:
        out = np.flipud(out)
    elif mode == 2:
        out = np.rot90(out)
    elif mode == 3:
        out = np.flipud(np.rot90(out))
    elif mode == 4:
        out = np.rot90(out, k=2)
    elif mode == 5:
        out = np.flipud(np.rot90(out, k=2))
    elif mode == 6:
        out = np.rot90(out, k=3)
    elif mode == 7:
        out = np.flipud(np.rot90(out, k=3))
    elif mode != 0:
        raise ValueError(f"invalid augmentation mode {mode}")
    return np.ascontiguousarray(np.transpose(out, (2, 0, 1)))


def prepare_patches(files: Sequence[str], out_h5: str,
                    patch_size: int = 50, stride: int = 25,
                    scales: Sequence[float] = (1.0, 0.9, 0.8, 0.7),
                    max_patches: int = 5_000_000, aug_times: int = 1,
                    gray: bool = True, seed: int = 0) -> int:
    """Build an h5 patch database in the reference layout: one dataset per
    patch keyed by its running index, values (C, p, p) float32 in [0, 1]
    with a random dihedral augmentation applied (networks/ffdnet/
    dataset.py:47-117 semantics; here seeded for reproducibility).

    Unlike the in-memory ``build_patch_set``, this scales to corpora that
    do not fit in RAM — the large-corpus pretraining path.
    """
    import cv2
    import h5py
    rng = np.random.default_rng(seed)
    n = 0
    with h5py.File(out_h5, "w") as h5f:
        for path in files:
            if n >= max_patches:
                break
            img = cv2.imread(path, cv2.IMREAD_GRAYSCALE if gray
                             else cv2.IMREAD_COLOR)
            if img is None:
                continue
            for s in scales:
                scaled = cv2.resize(img, (0, 0), fx=s, fy=s,
                                    interpolation=cv2.INTER_CUBIC) \
                    if s != 1.0 else img
                arr = (np.asarray(scaled, np.float32) / 255.0)
                if arr.ndim == 2:
                    arr = arr[None]                     # (1, H, W)
                else:
                    arr = cv2.cvtColor(scaled, cv2.COLOR_BGR2RGB)
                    arr = (np.asarray(arr, np.float32) / 255.0
                           ).transpose(2, 0, 1)          # (3, H, W)
                pats = img_to_patches(arr[0], patch_size, stride) \
                    if gray else None
                if gray:
                    pats = pats[:, None]                 # (N, 1, p, p)
                else:
                    chans = [img_to_patches(c, patch_size, stride)
                             for c in arr]
                    pats = np.stack(chans, axis=1)       # (N, C, p, p)
                for p in pats:
                    if n >= max_patches:
                        break
                    # reference draws np.random.randint(0, 7) — EXCLUSIVE
                    # high, so base modes are 0..6 and mode 7 (rot270 +
                    # flip) is never drawn (dataset.py:110); matched here.
                    # Key layout also matches dataset.py:108-117: the
                    # index increments per augmented patch too, and aug
                    # keys use the incremented index with an _aug_ suffix.
                    data = data_augmentation(p, int(rng.integers(0, 7)))
                    h5f.create_dataset(str(n), data=data)
                    n += 1
                    for mx in range(aug_times - 1):
                        if n >= max_patches:
                            break
                        h5f.create_dataset(
                            f"{n}_aug_{mx + 1}",
                            data=data_augmentation(
                                data, int(rng.integers(1, 4))))
                        n += 1
    return n


class H5PatchDataset:
    """Streaming view over a :func:`prepare_patches` database.

    Yields (p, p, C) float32 NHWC patches; ``batches(batch_size, seed)``
    gives one shuffled epoch of (B, p, p, C) arrays without loading the
    whole database in memory (reference Dataset semantics, numpy-native).
    """

    def __init__(self, path: str):
        import h5py
        self.path = path
        with h5py.File(path, "r") as f:
            self.keys = sorted(f.keys())

    def __len__(self) -> int:
        return len(self.keys)

    def __getitem__(self, i: int) -> np.ndarray:
        import h5py
        with h5py.File(self.path, "r") as f:
            data = np.asarray(f[self.keys[i]], np.float32)
        return data.transpose(1, 2, 0)

    def batches(self, batch_size: int, seed: int = 0
                ) -> Iterator[np.ndarray]:
        import h5py
        idx = np.random.default_rng(seed).permutation(len(self.keys))
        with h5py.File(self.path, "r") as f:
            for i in range(0, len(idx) - batch_size + 1, batch_size):
                chunk = [np.asarray(f[self.keys[j]], np.float32)
                         for j in idx[i:i + batch_size]]
                yield np.stack(chunk).transpose(0, 2, 3, 1)
