"""Snapshot-compressive-imaging (SCI) sensing operators.

The SCI camera multiplexes ``T`` video frames into one 2-D measurement using
per-frame binary shifting masks ``Phi``:

    y = A(x, Phi) = sum_t x[..., t] * Phi[..., t]          (forward)
    x = At(y, Phi) = y[..., None] * Phi                    (adjoint)

Layout is channel-last ``(batch, H, W, T)`` throughout — both the natural
layout of the .mat data and the TPU-friendly layout (the frame axis T=8 maps
onto vector lanes after the spatial dims are tiled).

Reference behavior: ``A_torch_`` at utils/cg_utils.py:85-90 and ``At_torch_``
at utils/cg_utils.py:124-129 of the upstream repo; the initial point is
``At(y, Phi)`` (utils/cg_utils.py:228-229) and the ADMM initial point is
``[At(y, Phi), 0]`` (utils/cg_utils.py:238-239).
"""

from __future__ import annotations

import jax.numpy as jnp


def A(x: jnp.ndarray, Phi: jnp.ndarray) -> jnp.ndarray:
    """SCI forward model: collapse coded frames into a snapshot.

    x: (..., H, W, T) video, Phi: broadcastable mask -> (..., H, W).
    """
    return jnp.sum(x * Phi, axis=-1)


def At(y: jnp.ndarray, Phi: jnp.ndarray) -> jnp.ndarray:
    """Adjoint of the SCI forward model.

    y: (..., H, W) measurement, Phi: (..., H, W, T) -> (..., H, W, T).
    """
    return y[..., None] * Phi


def phi_sum(Phi: jnp.ndarray, zero_to_one: bool = True) -> jnp.ndarray:
    """Per-pixel mask coverage ``sum_t Phi[..., t]`` with the zero guard.

    The reference computes ``Phi_sum = sum(Phi, axis=3); Phi_sum[Phi_sum==0]=1``
    before every solve (training/sci_equilibrium_training.py:61-62).
    """
    s = jnp.sum(Phi, axis=-1)
    if zero_to_one:
        s = jnp.where(s == 0, jnp.ones_like(s), s)
    return s


def initial_point(y: jnp.ndarray, Phi: jnp.ndarray) -> jnp.ndarray:
    """Initial iterate for the fixed-point solve: ``At(y, Phi)``."""
    return At(y, Phi)


def initial_point_admm(y: jnp.ndarray, Phi: jnp.ndarray):
    """ADMM initial carry ``(z0, u0) = (At(y, Phi), 0)``."""
    z0 = At(y, Phi)
    return z0, jnp.zeros_like(z0)


def gap_update(z: jnp.ndarray, y: jnp.ndarray, Phi: jnp.ndarray,
               Phi_sum: jnp.ndarray) -> jnp.ndarray:
    """One GAP (generalized alternating projection) physics step.

    ``z <- z + At((y - A(z, Phi)) / Phi_sum, Phi)``
    (solvers/equilibrium_solvers_yaping.py:399-400). XLA fuses the whole
    expression into a single elementwise pass over HBM; see
    ops/pallas/gap_step.py for the hand-fused kernel variant.
    """
    fb = A(z, Phi)
    return z + At((y - fb) / Phi_sum, Phi)
