"""Blur operators (deblurring capability surface).

Rebuild of operators/blurs.py:9-74 in NHWC:

* ``gaussian_blur``: depthwise Gaussian kernel (product of per-axis
  un-normalized Gaussians, normalized to sum 1) — self-adjoint because the
  kernel is symmetric;
* ``motion_blur``: a length-k horizontal line rotated by ``angle`` (cv2
  affine warp, exactly the reference construction). Deliberate fix: the
  reference "adjoint" correlates with the H/W-*transposed* kernel
  (operators/blurs.py:71-74), which is not the adjoint of its forward
  (a horizontal line becomes a vertical one); the true adjoint of
  cross-correlation is correlation with the 180-degree-rotated kernel,
  which is what we use — verified against the autodiff transpose.
"""

from __future__ import annotations


import jax
import jax.numpy as jnp
import numpy as np

from deqsci_tpu.ops.linops import LinearOperator


def _depthwise_conv(x: jnp.ndarray, kernel_hw: jnp.ndarray) -> jnp.ndarray:
    """SAME depthwise conv of NHWC x with one (kh, kw) kernel per channel."""
    c = x.shape[-1]
    k = jnp.tile(kernel_hw[:, :, None, None], (1, 1, 1, c))
    return jax.lax.conv_general_dilated(
        x, k, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=c,
        precision=jax.lax.Precision.HIGHEST)


def gaussian_kernel(sigma: float, kernel_size: int = 5) -> np.ndarray:
    ax = np.arange(kernel_size, dtype=np.float32)
    mean = (kernel_size - 1) / 2
    g = np.exp(-(((ax - mean) / sigma) ** 2) / 2)
    k = np.outer(g, g)
    return (k / k.sum()).astype(np.float32)


def gaussian_blur(sigma: float, kernel_size: int = 5) -> LinearOperator:
    k = jnp.asarray(gaussian_kernel(sigma, kernel_size))
    f = lambda x: _depthwise_conv(x, k)
    return LinearOperator(forward=f, adjoint=f)


def motion_kernel(angle: float, kernel_size: int = 5) -> np.ndarray:
    import cv2
    k = np.zeros((kernel_size, kernel_size), np.float32)
    k[(kernel_size - 1) // 2, :] = 1.0
    center = (kernel_size / 2 - 0.5, kernel_size / 2 - 0.5)
    k = cv2.warpAffine(k, cv2.getRotationMatrix2D(center, angle, 1.0),
                       (kernel_size, kernel_size))
    return (k / k.sum()).astype(np.float32)


def motion_blur(angle: float, kernel_size: int = 5) -> LinearOperator:
    k = jnp.asarray(motion_kernel(angle, kernel_size))
    fwd = lambda x: _depthwise_conv(x, k)
    adj = lambda x: _depthwise_conv(x, jnp.flip(k, (0, 1)))
    return LinearOperator(forward=fwd, adjoint=adj)
