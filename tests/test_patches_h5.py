"""h5 patch pipeline + logging auxiliaries (FFDNet kit parity)."""

import logging
import os

import numpy as np
import pytest

from deqsci_tpu.data.patches import (H5PatchDataset, data_augmentation,
                                     prepare_patches)
from deqsci_tpu.utils.logging import init_logger, log_image_grid, make_grid


def test_data_augmentation_modes_are_bijective():
    rng = np.random.default_rng(0)
    img = rng.random((1, 6, 6)).astype(np.float32)
    outs = [data_augmentation(img, m) for m in range(8)]
    # all modes produce distinct images of the same multiset of values
    for o in outs:
        assert o.shape == (1, 6, 6)
        np.testing.assert_allclose(np.sort(o.ravel()),
                                   np.sort(img.ravel()))
    flat = {o.tobytes() for o in outs}
    assert len(flat) == 8
    with pytest.raises(ValueError):
        data_augmentation(img, 9)


def test_prepare_patches_roundtrip(tmp_path):
    import cv2
    rng = np.random.default_rng(1)
    files = []
    for i in range(3):
        img = (rng.random((40, 52)) * 255).astype(np.uint8)
        p = str(tmp_path / f"im{i}.png")
        cv2.imwrite(p, img)
        files.append(p)
    out = str(tmp_path / "train_gray.h5")
    n = prepare_patches(files, out, patch_size=16, stride=16,
                        scales=(1.0,), aug_times=2, seed=3)
    ds = H5PatchDataset(out)
    assert len(ds) == n > 0
    sample = ds[0]
    assert sample.shape == (16, 16, 1)
    assert sample.dtype == np.float32
    assert 0.0 <= sample.min() and sample.max() <= 1.0
    batches = list(ds.batches(4, seed=0))
    assert batches and all(b.shape == (4, 16, 16, 1) for b in batches)
    # max_patches cap respected
    n2 = prepare_patches(files, str(tmp_path / "cap.h5"), patch_size=16,
                         stride=16, scales=(1.0,), max_patches=5)
    assert n2 == 5


def test_make_grid_and_logger(tmp_path):
    imgs = [np.full((4, 4), v, np.float32) for v in (0.2, 0.4, 0.6)]
    grid = make_grid(imgs, nrow=2, padding=1)
    assert grid.shape == (1 + 2 * 5, 1 + 2 * 5, 1)
    assert grid[1, 1, 0] == pytest.approx(0.2)

    class W:
        def __init__(self):
            self.calls = []

        def add_image(self, tag, img, step, dataformats=None):
            self.calls.append((tag, img.shape, step, dataformats))

    w = W()
    log_image_grid(w, "t", imgs, 0, nrow=3)
    assert w.calls and w.calls[0][3] == "HWC"
    log_image_grid(None, "t", imgs, 0)  # no-op without a writer

    logger = init_logger(str(tmp_path), {"lr": 1e-3})
    logger.info("hello")
    for h in logger.handlers:
        h.flush()
    text = (tmp_path / "log.txt").read_text()
    assert "lr" in text and "hello" in text
    logging.getLogger().handlers.clear()
