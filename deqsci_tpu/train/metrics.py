"""Image metrics: PSNR (skimage-compatible) and SSIM (pytorch_ssim-compatible).

The reference's protocol is skimage ``peak_signal_noise_ratio`` on the
clipped reconstruction vs ground truth with inferred ``data_range=1``
(training/sci_equilibrium_training.py:182-183: float inputs with min >= 0
resolve to dmax = 1 in skimage's dtype_range logic). SSIM mirrors the
vendored pytorch_ssim module (Gaussian 11x11 window, sigma 1.5,
C1=0.01^2, C2=0.03^2, per-channel depthwise filtering, SAME padding) —
vendored in the reference but reported in the paper, so first-class here.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def psnr(image_true, image_test, data_range: float = 1.0):
    """PSNR over the full arrays (single scalar), matching skimage."""
    t = jnp.asarray(image_true, jnp.float32)
    e = jnp.asarray(image_test, jnp.float32)
    mse = jnp.mean((t - e) ** 2)
    return 10.0 * jnp.log10((data_range ** 2) / mse)


def _gaussian_window(size: int = 11, sigma: float = 1.5) -> jnp.ndarray:
    x = jnp.arange(size, dtype=jnp.float32) - size // 2
    g = jnp.exp(-(x ** 2) / (2 * sigma ** 2))
    g = g / g.sum()
    return jnp.outer(g, g)


def ssim(img1, img2, window_size: int = 11, data_range: float = 1.0):
    """Mean SSIM. Inputs (H, W), (H, W, C) or (N, H, W, C), range [0, dr]."""
    a = jnp.asarray(img1, jnp.float32)
    b = jnp.asarray(img2, jnp.float32)
    if a.ndim == 2:
        a, b = a[None, :, :, None], b[None, :, :, None]
    elif a.ndim == 3:
        a, b = a[None], b[None]

    c = a.shape[-1]
    win = _gaussian_window(window_size)
    kernel = jnp.tile(win[:, :, None, None], (1, 1, 1, c))  # HWIO depthwise

    def filt(x):
        return jax.lax.conv_general_dilated(
            x, kernel, window_strides=(1, 1), padding="SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
            precision=jax.lax.Precision.HIGHEST)

    mu1, mu2 = filt(a), filt(b)
    mu1_sq, mu2_sq, mu12 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    s1 = filt(a * a) - mu1_sq
    s2 = filt(b * b) - mu2_sq
    s12 = filt(a * b) - mu12

    c1 = (0.01 * data_range) ** 2
    c2 = (0.03 * data_range) ** 2
    ssim_map = ((2 * mu12 + c1) * (2 * s12 + c2)) / (
        (mu1_sq + mu2_sq + c1) * (s1 + s2 + c2))
    return jnp.mean(ssim_map)


def psnr_np(image_true, image_test, data_range: float = 1.0) -> float:
    """Host-side PSNR for logging paths that already hold numpy arrays."""
    t = np.asarray(image_true, np.float64)
    e = np.asarray(image_test, np.float64)
    mse = np.mean((t - e) ** 2)
    if mse == 0:
        return float("inf")
    return float(10.0 * np.log10((data_range ** 2) / mse))
