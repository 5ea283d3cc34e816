"""File logger + TensorBoard image grids (FFDNet training kit parity).

Rebuilds the reference's logging auxiliaries:

* ``init_logger`` — networks/ffdnet/utils.py:129-152: a logging.Logger
  with a timestamped ``log.txt`` FileHandler that records the run's
  arguments (the git-commit line is kept best-effort);
* ``make_grid`` / ``log_image_grid`` — the torchvision ``utils.make_grid``
  + ``writer.add_image`` pattern of networks/ffdnet/train.py:195-216,
  as a pure-numpy grid builder feeding tensorboardX.
"""

from __future__ import annotations

import logging
import os
import subprocess
from typing import Any, Dict, Optional, Sequence

import numpy as np


def init_logger(log_dir: str, args: Optional[Dict[str, Any]] = None,
                name: str = "deqsci_tpu") -> logging.Logger:
    """Logger writing ``log_dir/log.txt`` ('%(asctime)s - %(message)s'),
    recording the current git commit (best-effort) and all run arguments,
    mirroring the reference's init_logger."""
    os.makedirs(log_dir, exist_ok=True)
    logger = logging.getLogger(f"{name}:{log_dir}")
    logger.setLevel(logging.INFO)
    if not logger.handlers:
        fh = logging.FileHandler(os.path.join(log_dir, "log.txt"), mode="a")
        fh.setFormatter(logging.Formatter("%(asctime)s - %(message)s"))
        logger.addHandler(fh)
    try:
        rev = subprocess.check_output(
            ["git", "rev-parse", "--short", "HEAD"],
            cwd=os.path.dirname(os.path.abspath(__file__)),
            stderr=subprocess.DEVNULL).decode().strip()
        logger.info("Commit: %s", rev)
    except Exception as e:  # noqa: BLE001 — parity with the reference
        logger.error("Couldn't get commit number: %s", e)
    if args:
        logger.info("Arguments: ")
        items = args.items() if isinstance(args, dict) else vars(args).items()
        for k, v in items:
            logger.info("\t%s: %s", k, v)
    return logger


def make_grid(images: Sequence[np.ndarray], nrow: int = 8,
              padding: int = 2, pad_value: float = 0.0,
              normalize: bool = False) -> np.ndarray:
    """(N, H, W[, C]) -> one (H', W', C) grid image in [0, 1].

    Numpy restatement of torchvision.utils.make_grid (row-major layout,
    ``padding`` pixels between tiles; ``normalize`` rescales each tile to
    its own [min, max] as torchvision's scale_each)."""
    imgs = [np.asarray(im, np.float32) for im in images]
    imgs = [im[..., None] if im.ndim == 2 else im for im in imgs]
    if normalize:
        imgs = [(im - im.min()) / (np.ptp(im) + 1e-8) for im in imgs]
    else:
        imgs = [np.clip(im, 0.0, 1.0) for im in imgs]
    n = len(imgs)
    h, w, c = imgs[0].shape
    ncol = min(nrow, n)
    nrows = -(-n // ncol)
    grid = np.full((padding + nrows * (h + padding),
                    padding + ncol * (w + padding), c),
                   pad_value, np.float32)
    for idx, im in enumerate(imgs):
        r, col = divmod(idx, ncol)
        y = padding + r * (h + padding)
        x = padding + col * (w + padding)
        grid[y:y + h, x:x + w] = im
    return grid


def log_image_grid(writer, tag: str, images: Sequence[np.ndarray],
                   step: int, nrow: int = 8, **grid_kw) -> None:
    """Write an image grid to a tensorboardX SummaryWriter (HWC)."""
    if writer is None:
        return
    grid = make_grid(images, nrow=nrow, **grid_kw)
    writer.add_image(tag, grid, step, dataformats="HWC")
