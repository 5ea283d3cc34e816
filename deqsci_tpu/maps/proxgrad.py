"""Generic (non-SCI) iteration maps: Grad / ProxGrad / ProxPnP / DR.

Rebuild of solvers/equilibrium_solvers.py:9-168 as pure step functions over
``params = {'eta': scalar, 'net': variables}``:

* ``grad_step``      z - eta*(A^T A z - A^T y - f(z)), clamp  (lines 38-44;
  learnable eta, and the denoiser output *is part of the gradient*)
* ``proxgrad_step``  g = z - eta*(A^T A z - A^T y); g + f(g), clamp
  (lines 70-81; learnable eta)
* ``proxgrad_mri_step``  same with fixed eta (lines 107-114)
* ``proxpnp_step``   same structure, no clamp (lines 132-139)
* ``douglas_rachford_step``  prox_f via CG on (A^T A + lam I), reflection,
  half-averaged update, clamp (lines 155-168)

All take ``step(params, z, k, y)`` so they slot into the same DEQ engine
(``k`` unused — these nets carry no per-call state).
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp

from deqsci_tpu.ops.cg import conjugate_gradient
from deqsci_tpu.ops.linops import LinearOperator


def _clamp(x, minval, maxval):
    return jnp.clip(x, minval, maxval)


def make_grad_step(op: LinearOperator, denoise: Callable,
                   minval=-1.0, maxval=1.0):
    """Learnable-eta gradient map; denoiser contributes to the gradient."""
    def step(params: Any, z, k, y):
        del k
        eta = params["eta"]
        grad = op.gramian(z) - op.adjoint(y) - denoise(params["net"], z)
        return _clamp(z - eta * grad, minval, maxval)
    return step


def make_proxgrad_step(op: LinearOperator, denoise: Callable,
                       minval=-1.0, maxval=1.0, clamp: bool = True):
    """Proximal-gradient map: gradient step then residual denoiser.

    ``clamp=False`` yields ProxPnP (identical structure, no clamp)."""
    def step(params: Any, z, k, y):
        del k
        eta = params["eta"]
        gradstep = z - eta * (op.gramian(z) - op.adjoint(y))
        out = gradstep + denoise(params["net"], gradstep)
        return _clamp(out, minval, maxval) if clamp else out
    return step


def make_proxpnp_step(op: LinearOperator, denoise: Callable):
    return make_proxgrad_step(op, denoise, clamp=False)


def make_douglas_rachford_step(op: LinearOperator, denoise: Callable,
                               lam: float = 0.1, max_cg_iterations: int = 10,
                               minval=-1.0, maxval=1.0):
    """DR splitting with a CG data-fidelity prox."""
    def step(params: Any, z, k, y):
        del k
        init = op.adjoint(y) + lam * z
        prox_f = conjugate_gradient(init, op.gramian, lam,
                                    n_iterations=max_cg_iterations)
        net_input = 2 * prox_f - z
        out = (z + 2 * (denoise(params["net"], net_input) + net_input)
               - net_input) / 2.0
        return _clamp(out, minval, maxval)
    return step
