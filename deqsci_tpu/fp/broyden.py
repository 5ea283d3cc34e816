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

Armijo line search (``ls=True``) is implemented as a bounded inner
``lax.while_loop`` replicating ``scalar_search_armijo``/``line_search``
(solvers/broyd_equilibrium_utils.py:17-92): phi(s) = ||g(x + s*update)||^2
with the GLOBAL norm (a single scalar step shared across the batch, as the
reference's ``torch.norm`` over the whole tensor), derphi0 = -phi0,
first-try s=1, quadratic interpolant, then the cubic loop — whose
"safeguard" (lines 47-48) always fires, halving alpha each round, so the
loop is bounded by log2(alpha1/amin) evaluations; on failure (alpha <=
amin = 1e-2) the full step s=1 is taken (lines 83-85). Every reference
call site uses the default ``ls=False``, so full-step remains the default
here too.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Tuple

import jax
import jax.numpy as jnp

from deqsci_tpu.fp.common import FPInfo, StepFn, batch_flatten, global_norm

_STALL_WINDOW = 30
_ARMIJO_C1 = 1e-4
_ARMIJO_AMIN = 1e-2
_ARMIJO_MAX_ITE = 12  # alpha at least halves per round; 0.5 -> <1e-2 in 6


def _armijo(g, x, gx, update, k):
    """One Armijo line search along ``update``; returns (x_new, gx_new).

    Pure-function rebuild of the reference's ``line_search`` +
    ``scalar_search_armijo`` (broyd_equilibrium_utils.py:17-92). All
    branching is on device; non-finite interpolant alphas fall back to
    alpha/2 (the value the reference's safeguard would assign anyway).
    """
    phi0 = jnp.sum(gx * gx)
    derphi0 = -phi0

    def phi(s):
        gnew = g(x + s * update, k)
        return jnp.sum(gnew * gnew), gnew

    # first try the full step (reference line 19-22)
    phi_1, g_1 = phi(jnp.asarray(1.0, x.dtype))
    ok1 = phi_1 <= phi0 + _ARMIJO_C1 * derphi0

    # quadratic interpolant (line 24-25); failed full step bounds it <~0.5
    alpha1 = -derphi0 / 2.0 / (phi_1 - phi0 - derphi0)
    phi_a1, _ = phi(alpha1)

    zero = jnp.asarray(0.0, x.dtype)

    def cond(c):
        ite, a0, a1, p_a0, p_a1, s_acc, g_acc, found = c
        return jnp.logical_and(
            jnp.logical_and(jnp.logical_not(found), a1 > _ARMIJO_AMIN),
            ite < _ARMIJO_MAX_ITE)

    def body(c):
        ite, a0, a1, p_a0, p_a1, s_acc, g_acc, found = c
        # cubic interpolant (reference lines 31-40)
        factor = a0 ** 2 * a1 ** 2 * (a1 - a0)
        a = (a0 ** 2 * (p_a1 - phi0 - derphi0 * a1)
             - a1 ** 2 * (p_a0 - phi0 - derphi0 * a0)) / factor
        b = (-a0 ** 3 * (p_a1 - phi0 - derphi0 * a1)
             + a1 ** 3 * (p_a0 - phi0 - derphi0 * a0)) / factor
        a2 = (-b + jnp.sqrt(jnp.abs(b ** 2 - 3 * a * derphi0))) / (3.0 * a)
        a2 = jnp.where(jnp.isfinite(a2), a2, a1 / 2.0)
        p_a2, g_a2 = phi(a2)
        good = p_a2 <= phi0 + _ARMIJO_C1 * a2 * derphi0
        s_acc = jnp.where(good, a2, s_acc)
        g_acc = jnp.where(good, g_a2, g_acc)
        found = jnp.logical_or(found, good)
        # the reference's safeguard (lines 47-48) covers a2 < a1/2 and
        # a2 > 0.04*a1 — i.e. always — so alpha halves every round
        a2 = a1 / 2.0
        return (ite + 1, a1, a2, p_a1, p_a2, s_acc, g_acc, found)

    init = (jnp.int32(0), jnp.asarray(1.0, x.dtype), alpha1, phi_1, phi_a1,
            zero, jnp.zeros_like(gx), jnp.array(False))
    (_, _, _, _, _, s_acc, g_acc, found) = jax.lax.while_loop(
        cond, body, init)

    # acceptance order: full step, else cubic-loop hit, else fall back to
    # the full step s=1 (reference lines 56, 83-85)
    use_full = jnp.logical_or(ok1, jnp.logical_not(found))
    s = jnp.where(use_full, jnp.asarray(1.0, x.dtype), s_acc)
    gx_new = jnp.where(use_full, g_1, g_acc)
    return x + s * update, gx_new


def broyden(f: StepFn, x0: Any, *, threshold: int = 40, eps: float = 1e-5,
            ls: bool = False, **_ignored) -> Tuple[Any, FPInfo]:
    """Find ``x`` with ``f(x, k) = x`` via Broyden on the residual.

    ``threshold`` is the max step count (reference naming); ``ls`` enables
    the Armijo line search (reference default False); extra kwargs
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

        if ls:
            x_new, gx_new = _armijo(g_flat, x, gx, update, nstep + 1)
        else:
            # full step along the Broyden direction
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
