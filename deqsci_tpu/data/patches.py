"""Patch-based denoiser-pretraining data (FFDNet training kit).

Rebuild of networks/ffdnet/dataset.py + prepare_patches.py: extract
``patch_size`` x ``patch_size`` patches on a ``stride`` grid from gray
images, optionally scaled copies, shuffled; yields float32 in [0, 1],
NHWC. The h5 intermediate file of the reference is dropped — patches are
built in memory (the bundled corpora are small) and batched by a plain
numpy iterator.
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
