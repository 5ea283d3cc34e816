"""Batched conjugate gradient for ``(A^T A + lam I) x = b``.

Rebuild of utils/cg_utils.py:18-76 (duplicated at
solvers/new_equilibrium_utils_yaping.py:19-111 and solvers/cg_utils.py):
fixed iteration count, fully differentiable (``lax.scan`` unrolls cleanly
under reverse-mode AD), per-sample step sizes.

Two variants, matching the two reference formulations:
* ``conjugate_gradient``   — the real-valued variant used by ADMM /
  DouglasRachford maps (b = initial_point, x0 = 0);
* ``conjugate_gradient_mri`` — the MoDL-style variant whose inner products
  conjugate the first argument (complex data in (..., 2) real view).
"""

from __future__ import annotations

from typing import Callable

import jax
import jax.numpy as jnp


def _dot(x: jnp.ndarray, y: jnp.ndarray) -> jnp.ndarray:
    """Per-sample dot product over all non-batch axes -> (bsz, 1, 1, ...)."""
    axes = tuple(range(1, x.ndim))
    return jnp.sum(x * y, axis=axes, keepdims=True)


def conjugate_gradient(initial_point: jnp.ndarray, ATA: Callable,
                       regularization_lambda: float,
                       n_iterations: int = 10) -> jnp.ndarray:
    """Solve ``(ATA + lam I) x = initial_point`` starting from x = 0."""
    reg = lambda v: ATA(v) + regularization_lambda * v
    b = initial_point

    def body(carry, _):
        x, d, g = carry
        Qd = reg(d)
        alpha = -_dot(g, d) / _dot(d, Qd)
        x = x + alpha * d
        g = reg(x) - b
        beta = _dot(g, Qd) / _dot(d, Qd)
        d = -g + beta * d
        return (x, d, g), None

    x0 = jnp.zeros_like(b)
    (x, _, _), _ = jax.lax.scan(body, (x0, b, -b), None,
                                length=n_iterations)
    return x


def _complex_conj(x: jnp.ndarray) -> jnp.ndarray:
    """(..., 2) real-view conjugate (channel-last real/imag)."""
    return jnp.stack([x[..., 0], -x[..., 1]], axis=-1)


def conjugate_gradient_mri(initial_point: jnp.ndarray, ATA: Callable,
                           regularization_lambda: float,
                           n_iterations: int = 10) -> jnp.ndarray:
    """MoDL-style CG with conjugated inner products; data (N, H, W, 2)."""
    reg = lambda v: ATA(v) + regularization_lambda * v

    def cdot(x, y):
        return _dot(_complex_conj(x), y)

    def body(carry, _):
        rTr, x, r, p = carry
        Ap = reg(p)
        alpha = rTr / cdot(p, Ap)
        x = x + alpha * p
        r_new = r - alpha * Ap
        rTr_new = cdot(r_new, r_new)
        beta = rTr_new / rTr
        p = r + beta * p
        return (rTr_new, x, r_new, p), None

    b = initial_point
    init = (cdot(b, b), jnp.zeros_like(b), b, b)
    (_, x, _, _), _ = jax.lax.scan(body, init, None, length=n_iterations)
    return x
