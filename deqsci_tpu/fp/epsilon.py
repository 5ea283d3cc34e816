"""Vector-epsilon (epsilon2) fixed-point acceleration.

TPU rebuild of ``epsilon2`` (solvers/new_equilibrium_utils_yaping.py:194-211):

    x+ = f(x) + (df * |dx|^2 - dx * |df|^2) / (|d2x|^2 + lam)

with dx = f(x) - x, df = f(f(x)) - f(x), d2x = df - dx, and the squared
norms taken per sample over all non-batch axes (``L2Norm``, line 191-192).
Residual ``||x+ - x|| / ||x+||`` (global), on-device early exit. Each
iteration consumes two calls of f.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import jax
import jax.numpy as jnp

from deqsci_tpu.fp.common import FPInfo, StepFn, batch_flatten, global_norm


def epsilon2(f: StepFn, x0: Any, *, max_iter: int = 50, tol: float = 1e-2,
             lam: float = 1e-4, **_ignored) -> Tuple[Any, FPInfo]:
    x0f, unflatten = batch_flatten(x0)
    dtype = x0f.dtype

    def f_flat(xf, k):
        yf, _ = batch_flatten(f(unflatten(xf), k))
        return yf

    def sqnorm(v):  # per-sample |v|^2, keepdims for broadcasting
        return jnp.sum(v * v, axis=1, keepdims=True)

    def cond(c):
        k, _, _, done = c
        return jnp.logical_and(k < max_iter, jnp.logical_not(done))

    def body(c):
        k, x, res, done = c
        fx = f_flat(x, 2 * k)
        dx = fx - x
        df = f_flat(fx, 2 * k + 1) - fx
        d2x = df - dx
        x_new = fx + (df * sqnorm(dx) - dx * sqnorm(df)) / (sqnorm(d2x) + lam)
        new_res = global_norm(x_new - x) / global_norm(x_new)
        x = jnp.where(done, x, x_new)
        res = jnp.where(done, res, new_res)
        done = jnp.logical_or(done, new_res < tol)
        return k + 1, x, res, done

    init = (jnp.int32(0), x0f, jnp.array(jnp.inf, dtype), jnp.array(False))
    k, x, res, done = jax.lax.while_loop(cond, body, init)
    info = FPInfo(residual=res, iterations=k, next_call=2 * k,
                  converged=done)
    return unflatten(x), info


def epsilon2_solver(**kwargs):
    return partial(epsilon2, **kwargs)
