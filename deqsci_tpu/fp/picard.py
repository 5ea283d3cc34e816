"""Plain fixed-point (Picard) iteration with on-device early exit.

TPU rebuild of the reference's ``forward_iteration``
(solvers/new_equilibrium_utils_yaping.py:213-222): call indices 0..K, the
residual ``||f(x)-x|| / (1e-7 + ||f(x)||)`` is global and checked on device,
and the returned iterate is the last *output* of f.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import jax
import jax.numpy as jnp

from deqsci_tpu.fp.common import FPInfo, StepFn, batch_flatten, global_norm


def picard(f: StepFn, x0: Any, *, max_iter: int = 50, tol: float = 1e-5,
           **_ignored) -> Tuple[Any, FPInfo]:
    """Solve ``z = f(z, k)`` by plain iteration.

    Extra kwargs (m/lam/beta) are accepted and ignored so Picard is a drop-in
    replacement for Anderson in the DEQ module.
    """
    x0f, unflatten = batch_flatten(x0)
    dtype = x0f.dtype

    def f_flat(xf, k):
        yf, _ = batch_flatten(f(unflatten(xf), k))
        return yf

    fx = f_flat(x0f, jnp.int32(0))           # call index 0

    def cond(c):
        k, _, _, done = c
        return jnp.logical_and(k < max_iter, jnp.logical_not(done))

    def body(c):
        k, fx, res, done = c
        new_fx = f_flat(fx, k + 1)           # call indices 1..max_iter
        new_res = global_norm(new_fx - fx) / (1e-7 + global_norm(new_fx))
        fx = jnp.where(done, fx, new_fx)
        res = jnp.where(done, res, new_res)
        done = jnp.logical_or(done, new_res < tol)
        return k + 1, fx, res, done

    init = (jnp.int32(0), fx, jnp.array(jnp.inf, dtype), jnp.array(False))
    k, fx, res, done = jax.lax.while_loop(cond, body, init)

    info = FPInfo(residual=res, iterations=k,
                  next_call=k + 1, converged=done)
    return unflatten(fx), info


def picard_solver(**kwargs):
    return partial(picard, **kwargs)
