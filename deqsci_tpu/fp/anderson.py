"""Anderson acceleration as a single compiled ``lax.while_loop``.

Re-designs the reference's ``andersonexp``
(solvers/new_equilibrium_utils_yaping.py:153-189) for TPU:

* fixed-size ring buffers ``X, F`` of shape ``(bsz, m, N)`` live on device
  for the whole solve;
* the regularized normal-equation system is always padded to the full
  ``(m+1, m+1)`` bordered shape with an activity mask, so the program has
  one static shape instead of per-``k`` Python re-tracing;
* the relative-residual tolerance check stays on device — the reference's
  per-iteration ``.item()`` host sync (line 184) is the single biggest
  throughput bug this rebuild removes;
* a ``done`` flag freezes the carry once converged so that a ``vmap`` of
  the solver over snapshots reproduces per-snapshot iterate counts exactly
  (finished lanes keep running in lockstep but their state stops updating).

Semantics matched to the reference:
* history slots 0/1 seeded with ``x0, f(x0)`` and ``f(x0), f(f(x0))``;
* main loop runs k = 2 .. max_iter-1;
* the least-squares system uses only the first ``min(k, m)`` history rows;
* the residual is computed on the *post-update* pair ``(F_k, X_k)`` with the
  global (not per-batch) norm, relative with the reference's 1e-5 fudge;
* the returned iterate is ``X[k_last % m]`` — the last solver *input*, not
  its image under f.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import jax
import jax.numpy as jnp

from deqsci_tpu.fp.common import FPInfo, StepFn, batch_flatten, global_norm


def anderson(f: StepFn, x0: Any, *, m: int = 5, lam: float = 1e-4,
             max_iter: int = 50, tol: float = 1e-5,
             beta: float = 1.0,
             record_trace: bool = False) -> Tuple[Any, FPInfo]:
    """Solve ``z = f(z, k)`` by Anderson acceleration.

    ``x0`` is a pytree with shared leading batch dim; ``f`` maps pytree ->
    pytree at call index ``k``. The mixing coefficients are solved per batch
    element; the stopping residual is global, as in the reference.

    ``record_trace=True`` additionally returns the per-iteration residual
    curve in ``info.trace`` (the reference's ``anderson`` res list,
    solvers/new_equilibrium_utils_yaping.py:131-150 — a first-class metric
    here, stored on device in a fixed (max_iter,) buffer, inf-padded).
    """
    x0f, unflatten = batch_flatten(x0)
    bsz, n_flat = x0f.shape
    dtype = x0f.dtype

    def f_flat(xf, k):
        yf, _ = batch_flatten(f(unflatten(xf), k))
        return yf

    X = jnp.zeros((bsz, m, n_flat), dtype)
    F = jnp.zeros((bsz, m, n_flat), dtype)

    f0 = f_flat(x0f, jnp.int32(0))
    f1 = f_flat(f0, jnp.int32(1))
    X = X.at[:, 0].set(x0f).at[:, 1].set(f0)
    F = F.at[:, 0].set(f0).at[:, 1].set(f1)

    eye_m = jnp.eye(m, dtype=dtype)
    rhs = jnp.zeros((bsz, m + 1), dtype).at[:, 0].set(1.0)

    trace0 = jnp.full((max_iter,), jnp.inf, dtype) if record_trace else None

    def cond(c):
        k, done = c[0], c[-1]
        return jnp.logical_and(k < max_iter, jnp.logical_not(done))

    def body(c):
        if record_trace:
            k, last_k, X, F, res, trace, done = c
        else:
            k, last_k, X, F, res, done = c
        act = (jnp.arange(m) < k).astype(dtype)          # min(k, m) active rows

        G = F - X                                        # inactive rows are 0
        # full-fp32 matmuls: TPU-default bf16 here perturbs the mixing
        # coefficients every iteration and drifts the fixed point
        GGt = jnp.einsum("bmn,bln->bml", G, G,
                         preferred_element_type=dtype,
                         precision=jax.lax.Precision.HIGHEST)
        H = jnp.zeros((bsz, m + 1, m + 1), dtype)
        H = H.at[:, 0, 1:].set(act)
        H = H.at[:, 1:, 0].set(act)
        H = H.at[:, 1:, 1:].set(GGt + lam * eye_m)       # inactive diag = lam -> alpha_i = 0

        with jax.default_matmul_precision("highest"):
            # the LU solve lowers to small matmuls on TPU; keep them fp32
            alpha = jnp.linalg.solve(H, rhs[..., None])[:, 1:, 0]  # (bsz, m)

        hi = jax.lax.Precision.HIGHEST
        xk = (beta * jnp.einsum("bm,bmn->bn", alpha, F, precision=hi)
              + (1.0 - beta) * jnp.einsum("bm,bmn->bn", alpha, X,
                                          precision=hi))
        fk = f_flat(xk, k)

        slot = k % m
        new_res = global_norm(fk - xk) / (1e-5 + global_norm(fk))

        X_new = jax.lax.dynamic_update_index_in_dim(X, xk, slot, axis=1)
        F_new = jax.lax.dynamic_update_index_in_dim(F, fk, slot, axis=1)

        # Freeze the carry once converged (exact per-lane semantics under vmap).
        X = jnp.where(done, X, X_new)
        F = jnp.where(done, F, F_new)
        res = jnp.where(done, res, new_res)
        last_k = jnp.where(done, last_k, k)
        if record_trace:
            trace = jnp.where(done, trace, trace.at[k].set(new_res))
        done = jnp.logical_or(done, new_res < tol)
        if record_trace:
            return k + 1, last_k, X, F, res, trace, done
        return k + 1, last_k, X, F, res, done

    if record_trace:
        init = (jnp.int32(2), jnp.int32(0), X, F,
                jnp.array(jnp.inf, dtype), trace0, jnp.array(False))
        k, last_k, X, F, res, trace, done = jax.lax.while_loop(
            cond, body, init)
    else:
        trace = None
        init = (jnp.int32(2), jnp.int32(0), X, F,
                jnp.array(jnp.inf, dtype), jnp.array(False))
        k, last_k, X, F, res, done = jax.lax.while_loop(cond, body, init)

    x_star = jax.lax.dynamic_index_in_dim(X, last_k % m, axis=1,
                                          keepdims=False)
    # Call indices consumed so far: 0..last_k when the loop ran, else {0, 1}.
    next_call = jnp.maximum(last_k + 1, 2)
    info = FPInfo(residual=res, iterations=last_k,
                  next_call=next_call, converged=done, trace=trace)
    return unflatten(x_star), info


def anderson_solver(**kwargs):
    """Bind solver hyperparameters, returning ``solver(f, x0)``."""
    return partial(anderson, **kwargs)
