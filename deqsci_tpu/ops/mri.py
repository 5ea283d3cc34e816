"""Single-coil Cartesian MRI operator (k-space column undersampling).

Rebuild of operators/singlecoil_mri.py:368-486, TPU-first: the centered,
ortho-normalized 2-D Fourier transform is implemented as **real-valued
matmuls with precomputed centered-DFT matrices** instead of complex FFTs.
Rationale:

* complex dtypes are second-class on TPU runtimes (and entirely broken on
  some PJRT backends); a (..., 2) real layout is what the 2-channel
  denoisers consume anyway (the reference's ``view_as_complex`` dance,
  lines 448-486);
* for MRI-scale images (256-320 px) the O(N^3) DFT-by-matmul is a few
  MFLOP — microseconds on the MXU — and XLA fuses the mask multiply in;
  the reference itself ships learnable DFT-matrix variants
  (utils/forward_models_mri.py:432-633);
* forward/adjoint form an exact adjoint pair (the reference's ``adjoint``
  omits the mask and a shift relative to the true adjoint of its forward —
  fixed here, verified against the autodiff transpose).

``create_mask`` reproduces the reference's Gaussian-density exhaustive
column sampler (lines 350-393) including the fixed-seed RNG protocol.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from deqsci_tpu.ops.linops import LinearOperator

_HI = jax.lax.Precision.HIGHEST


def centered_dft_matrix(n: int) -> Tuple[np.ndarray, np.ndarray]:
    """(re, im) of the centered ortho DFT matrix S_fft F S_ifft."""
    eye = np.eye(n)
    m = np.fft.fftshift(
        np.fft.fft(np.fft.ifftshift(eye, axes=0), axis=0, norm="ortho"),
        axes=0)
    return (np.ascontiguousarray(m.real.astype(np.float32)),
            np.ascontiguousarray(m.imag.astype(np.float32)))


def _cmatmul_axis(mr: jnp.ndarray, mi: jnp.ndarray, xr: jnp.ndarray,
                  xi: jnp.ndarray, axis: int):
    """Complex matmul (mr + i mi) @ x along ``axis`` of (N, H, W) parts."""
    eq = "ab,nbw->naw" if axis == 1 else "ab,nhb->nha"
    f = lambda m, x: jnp.einsum(eq, m, x, precision=_HI)
    return (f(mr, xr) - f(mi, xi), f(mr, xi) + f(mi, xr))


def _fft2c(xr, xi, mats):
    (hr, hi), (wr, wi) = mats
    xr, xi = _cmatmul_axis(hr, hi, xr, xi, axis=1)
    return _cmatmul_axis(wr, wi, xr, xi, axis=2)


def _ifft2c(xr, xi, mats):
    # inverse of a unitary matrix = conjugate transpose
    (hr, hi), (wr, wi) = mats
    xr, xi = _cmatmul_axis(hr.T, -hi.T, xr, xi, axis=1)
    return _cmatmul_axis(wr.T, -wi.T, xr, xi, axis=2)


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


def cartesian_single_coil_mri(mask, h: int = None, w: int = None
                              ) -> LinearOperator:
    """Build the operator. ``mask`` broadcastable over (N, H, W) k-space;
    h/w default to the mask's trailing dims (w = mask.shape[-1])."""
    m = jnp.asarray(np.asarray(mask, np.float32))
    w = w if w is not None else m.shape[-1]
    h = h if h is not None else (m.shape[-2] if m.ndim >= 2 and
                                 m.shape[-2] > 1 else w)
    mats = (tuple(map(jnp.asarray, centered_dft_matrix(h))),
            tuple(map(jnp.asarray, centered_dft_matrix(w))))

    def forward(x):
        kr, ki = _fft2c(x[..., 0], x[..., 1], mats)
        return jnp.stack([kr * m, ki * m], axis=-1)

    def adjoint(y):
        xr, xi = _ifft2c(y[..., 0] * m, y[..., 1] * m, mats)
        return jnp.stack([xr, xi], axis=-1)

    def gramian(x):
        kr, ki = _fft2c(x[..., 0], x[..., 1], mats)
        xr, xi = _ifft2c(kr * m, ki * m, mats)  # mask is 0/1: m*m = m
        return jnp.stack([xr, xi], axis=-1)

    return LinearOperator(forward=forward, adjoint=adjoint,
                          _gramian=gramian)


def learnable_mri_operator(mask, h: int = None, w: int = None):
    """The reference's learnable-DFT variants (utils/forward_models_mri.py:
    432-633, ``subsampledKspace``/``zeroFillin``) expose the transform
    matrices as trainable parameters. Our matmul-DFT representation IS
    that form; this returns initial params + pure functions over them.

    Returns ``(params, forward(params, x), adjoint(params, y))`` where
    ``params = {'h_re','h_im','w_re','w_im','mask'}``.
    """
    m = np.asarray(mask, np.float32)
    w = w if w is not None else m.shape[-1]
    h = h if h is not None else (m.shape[-2] if m.ndim >= 2 and
                                 m.shape[-2] > 1 else w)
    hr, hi = centered_dft_matrix(h)
    wr, wi = centered_dft_matrix(w)
    params = {"h_re": jnp.asarray(hr), "h_im": jnp.asarray(hi),
              "w_re": jnp.asarray(wr), "w_im": jnp.asarray(wi),
              "mask": jnp.asarray(m)}

    def forward(p, x):
        mats = ((p["h_re"], p["h_im"]), (p["w_re"], p["w_im"]))
        kr, ki = _fft2c(x[..., 0], x[..., 1], mats)
        return jnp.stack([kr * p["mask"], ki * p["mask"]], axis=-1)

    def adjoint(p, y):
        mats = ((p["h_re"], p["h_im"]), (p["w_re"], p["w_im"]))
        xr, xi = _ifft2c(y[..., 0] * p["mask"], y[..., 1] * p["mask"], mats)
        return jnp.stack([xr, xi], axis=-1)

    return params, forward, adjoint
