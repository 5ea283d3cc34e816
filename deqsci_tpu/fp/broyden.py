"""Broyden's method with L-BFGS-style low-rank inverse-Jacobian updates.

TPU rebuild of the reference ``broyden``
(solvers/broyd_equilibrium_utils.py:117-181) as one ``lax.while_loop``:

* solves the residual equation ``g(x) = f(x) - x = 0``;
* inverse Jacobian approximated as ``-I + U V^T`` with fixed-size buffers
  ``U (bsz, N, L)``, ``V^T (bsz, L, N)``, L = min(threshold, 27)
  (reference line 127). Slots are zero until written, so the reference's
  Python-level prefix slicing ``Us[..., :nstep-1]`` is a no-op here —
  zero slots contribute nothing to the einsums;
* rank-one update ``v^T = (-I + UV^T)^T dx``, ``u = (dx - (-I+UV^T) dgx) /
  <v^T, dgx>`` with the NaN guard (lines 170-176);
* best-iterate tracking: the returned point is the lowest-objective
  iterate, not the last (lines 154-157, 180);
* protective breaks: stall (<1.3x range over the last 30 objectives once
  past step 30 and within 3*eps) and explosion (objective above
  ``1e6 * n_elem`` times the initial one) — lines 161-168;
* all stopping logic stays on device (the reference syncs ``.item()``
  every iteration).

Line search is omitted: every reference call site uses the default
``ls=False`` (Armijo exists upstream but is dead in all wired configs).
"""

from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import jax
import jax.numpy as jnp

from deqsci_tpu.fp.common import FPInfo, StepFn, batch_flatten, global_norm

_STALL_WINDOW = 30


def broyden(f: StepFn, x0: Any, *, threshold: int = 40, eps: float = 1e-5,
            **_ignored) -> Tuple[Any, FPInfo]:
    """Find ``x`` with ``f(x, k) = x`` via Broyden on the residual.

    ``threshold`` is the max step count (reference naming); extra kwargs
    (m/lam/beta/max_iter/tol) are accepted for solver interchangeability —
    ``max_iter``/``tol`` map onto threshold/eps when given.
    """
    threshold = _ignored.get("max_iter", threshold)
    eps = _ignored.get("tol", eps)

    x0f, unflatten = batch_flatten(x0)
    bsz, n_flat = x0f.shape
    dtype = x0f.dtype
    L = min(threshold, 27)

    def g_flat(xf, k):
        yf, _ = batch_flatten(f(unflatten(xf), k))
        return yf - xf

    def rmatvec(Us, VTs, x):
        xTU = jnp.einsum("bn,bnl->bl", x, Us,
                         precision=jax.lax.Precision.HIGHEST)
        return -x + jnp.einsum("bl,bln->bn", xTU, VTs,
                               precision=jax.lax.Precision.HIGHEST)

    def matvec(Us, VTs, x):
        VTx = jnp.einsum("bln,bn->bl", VTs, x,
                         precision=jax.lax.Precision.HIGHEST)
        return -x + jnp.einsum("bnl,bl->bn", Us, VTx,
                               precision=jax.lax.Precision.HIGHEST)

    gx0 = g_flat(x0f, jnp.int32(0))
    init_obj = global_norm(gx0)
    protect = init_obj * (1e6 * 1.0)  # n_elem = 1 after (bsz, N) flatten

    Us = jnp.zeros((bsz, n_flat, L), dtype)
    VTs = jnp.zeros((bsz, L, n_flat), dtype)
    window = jnp.full((_STALL_WINDOW,), jnp.inf, dtype)

    # carry: step, x, gx, update, Us, VTs, lowest(obj,x,gx,step), window, stop
    init = (jnp.int32(0), x0f, gx0, gx0, Us, VTs,
            init_obj, x0f, gx0, jnp.int32(0), window, jnp.array(False))

    def cond(c):
        nstep, _, gx, *_, stop = c
        return jnp.logical_and(
            jnp.logical_and(nstep < threshold, jnp.logical_not(stop)),
            global_norm(gx) >= eps)

    def body(c):
        (nstep, x, gx, update, Us, VTs,
         low_obj, low_x, low_gx, low_step, window, stop) = c

        # ls=False: full step along the Broyden direction
        x_new = x + update
        gx_new = g_flat(x_new, nstep + 1)
        delta_x = x_new - x
        delta_gx = gx_new - gx
        nstep = nstep + 1

        obj = global_norm(gx_new)
        window = window.at[(nstep - 1) % _STALL_WINDOW].set(obj)

        better = obj < low_obj
        low_obj = jnp.where(better, obj, low_obj)
        low_x = jnp.where(better, x_new, low_x)
        low_gx = jnp.where(better, gx_new, low_gx)
        low_step = jnp.where(better, nstep, low_step)

        stalled = jnp.logical_and(
            jnp.logical_and(obj < 3 * eps, nstep > _STALL_WINDOW),
            jnp.max(window) / jnp.maximum(jnp.min(window), 1e-30) < 1.3)
        exploded = obj > protect
        stop = jnp.logical_or(stalled, exploded)

        vT = rmatvec(Us, VTs, delta_x)
        denom = jnp.einsum("bn,bn->b", vT, delta_gx,
                           precision=jax.lax.Precision.HIGHEST)
        u = (delta_x - matvec(Us, VTs, delta_gx)) / denom[:, None]
        vT = jnp.where(jnp.isnan(vT), 0.0, vT)
        u = jnp.where(jnp.isnan(u), 0.0, u)
        slot = (nstep - 1) % L
        VTs = jax.lax.dynamic_update_index_in_dim(VTs, vT, slot, axis=1)
        Us = jax.lax.dynamic_update_index_in_dim(
            Us, u, slot, axis=2)
        update = -matvec(Us, VTs, gx_new)

        return (nstep, x_new, gx_new, update, Us, VTs,
                low_obj, low_x, low_gx, low_step, window, stop)

    (nstep, _, _, _, _, _, low_obj, low_x, _, low_step, _,
     _) = jax.lax.while_loop(cond, body, init)

    info = FPInfo(residual=low_obj, iterations=low_step,
                  next_call=nstep + 1, converged=low_obj < eps)
    return unflatten(low_x), info


def broyden_solver(**kwargs):
    return partial(broyden, **kwargs)
