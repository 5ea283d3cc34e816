"""Single-coil Cartesian MRI operator (k-space column undersampling).

Rebuild of operators/singlecoil_mri.py:368-486 on ``jnp.fft``:

* images are (N, H, W, 2) real-view of a complex image (real/imag as the
  trailing channel pair — the layout the 2-channel denoisers consume);
* forward = centered, ortho-normalized 2-D FFT followed by the column
  mask; adjoint = the exact adjoint (masked inverse centered FFT). Note:
  the reference's ``adjoint`` (lines 478-486) omits the mask and one
  fftshift relative to the true adjoint of its ``forward`` — here the pair
  is exactly adjoint (verified by test against the autodiff transpose),
  which is what CG/gramian-based maps assume;
* ``create_mask`` reproduces the reference's Gaussian-density exhaustive
  column sampler (lines 350-393) including the fixed-seed RNG protocol.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np

from deqsci_tpu.ops.linops import LinearOperator


def _to_complex(x: jnp.ndarray) -> jnp.ndarray:
    # lax.complex, not `re + 1j*im`: complex python constants hit an
    # unimplemented constant-materialization path on some TPU runtimes
    return jax.lax.complex(x[..., 0], x[..., 1])


def _to_real(x: jnp.ndarray) -> jnp.ndarray:
    return jnp.stack([jnp.real(x), jnp.imag(x)], axis=-1)


def _fft2c(img: jnp.ndarray) -> jnp.ndarray:
    """Centered ortho 2-D FFT over the last two axes of a complex array."""
    x = jnp.fft.ifftshift(img, axes=(-2, -1))
    k = jnp.fft.fft2(x, axes=(-2, -1), norm="ortho")
    return jnp.fft.fftshift(k, axes=(-2, -1))


def _ifft2c(k: jnp.ndarray) -> jnp.ndarray:
    x = jnp.fft.ifftshift(k, axes=(-2, -1))
    img = jnp.fft.ifft2(x, axes=(-2, -1), norm="ortho")
    return jnp.fft.fftshift(img, axes=(-2, -1))


def exhaustive_sample(center_frac: float, acceleration: float, n_cols: int,
                      seed: int = 0) -> np.ndarray:
    """Gaussian-density column sampling until the target acceleration."""
    grid = np.linspace(-3.0, 3.0, n_cols)
    sample_grid = np.zeros((n_cols,))
    num_low_freqs = int(round(n_cols * center_frac))
    pad = (n_cols - num_low_freqs + 1) // 2
    sample_grid[pad:pad + num_low_freqs] = 1.0
    rng = np.random.RandomState(seed=seed)
    while True:
        p = rng.standard_normal()
        if np.abs(p) < 3.0:
            sample_grid[int(np.abs(p - grid).argmin())] = 1.0
        if acceleration > n_cols / sample_grid.sum():
            return sample_grid


def create_mask(shape, center_fraction: float, acceleration: float,
                seed: int = 0) -> np.ndarray:
    """Column mask broadcastable over (..., H, W) k-space."""
    num_cols = shape[-1]
    cols = exhaustive_sample(center_fraction, acceleration, num_cols, seed)
    return cols.reshape((1,) * (len(shape) - 1) + (num_cols,)).astype(
        np.float32)


def cartesian_single_coil_mri(mask) -> LinearOperator:
    """mask broadcastable over the complex (N, H, W) k-space."""
    m = jnp.asarray(mask)

    def forward(x):
        return _to_real(_fft2c(_to_complex(x)) * m)

    def adjoint(y):
        return _to_real(_ifft2c(_to_complex(y) * m))

    def gramian(x):
        # mask is 0/1 so m*m = m: one round trip
        return _to_real(_ifft2c(_fft2c(_to_complex(x)) * m))

    return LinearOperator(forward=forward, adjoint=adjoint,
                          _gramian=gramian)
