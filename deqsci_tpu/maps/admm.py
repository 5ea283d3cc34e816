"""Generic CG-based ADMM maps over the (z, u) carry.

Rebuild of solvers/equilibrium_solvers.py:170-376, four variants differing
in update order and denoiser sign:

* ``admm``       x: CG((A^T A + a I) x = A^T y + a(z-u)); z: (x+u)+f(x+u);
                 u: u + eta(x-z); carry (clamp(z), u)         (lines 170-220)
* ``admm2``      same but z: (x+u)-f(x+u)                     (lines 222-272)
* ``admm_minus`` x: (z-u)-f(z-u); z: CG(A^T y + a(x+u)); u: u + eta(x-z)
                                                              (lines 274-324)
* ``admm_plus``  x: (z-u)+f(z-u); z: CG(...); u: u + eta(x-z) (lines 326-376)
"""

from __future__ import annotations

from typing import Any, Callable

import jax.numpy as jnp

from deqsci_tpu.ops.cg import conjugate_gradient
from deqsci_tpu.ops.linops import LinearOperator


def make_admm_step(op: LinearOperator, denoise: Callable,
                   variant: str = "admm", max_cg_iterations: int = 20,
                   x_alpha: float = 0.4, eta: float = 0.1,
                   minval=-1.0, maxval=1.0):
    assert variant in ("admm", "admm2", "admm_minus", "admm_plus")

    def cg_solve(rhs):
        return conjugate_gradient(rhs, op.gramian, x_alpha,
                                  n_iterations=max_cg_iterations)

    def step(params: Any, carry, k, y):
        del k
        z, u = carry
        net = params["net"]
        if variant in ("admm", "admm2"):
            x = cg_solve(op.adjoint(y) + x_alpha * (z - u))
            ni = x + u
            z_new = ni + denoise(net, ni) if variant == "admm" \
                else ni - denoise(net, ni)
        else:
            ni = z - u
            x = ni - denoise(net, ni) if variant == "admm_minus" \
                else ni + denoise(net, ni)
            z_new = cg_solve(op.adjoint(y) + x_alpha * (x + u))
        u_new = u + eta * (x - z_new)
        return jnp.clip(z_new, minval, maxval), u_new

    return step
