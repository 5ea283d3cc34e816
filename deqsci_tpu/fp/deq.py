"""Deep-equilibrium module: fixed-point forward + implicit-function backward.

This is the TPU-native core of the framework — the re-design of the
reference's ``DEQFixedPoint`` (solvers/new_equilibrium_utils_yaping.py:241-281),
whose PyTorch incarnation is a no-grad solver call, one graph-re-attaching
step, and a ``register_hook`` that swaps the incoming gradient for the
solution of the transpose-Jacobian equation. Here all three become one
``jax.custom_vjp``:

forward
    ``z* = solver(lambda z,k: step(params, z, k, args), z0)`` with no
    gradient tracing, then one differentiable step
    ``z = step(params, z*, K+1, args)`` (reference line 268). ``K+1`` is the
    solver's ``next_call`` index so per-call state (the FFDNet sigma decay)
    lines up with the reference exactly.

backward (implicit function theorem)
    Solve ``g = J_z^T g + g_in`` with the *same* solver and hyperparameters,
    where ``J_z`` is the Jacobian of one step linearized at the forward
    output with call index ``K+2`` (the reference's ``f0 = f(z0)``, line
    272); then the parameter/argument cotangents are one VJP of the
    re-attach step applied to ``g`` (what autograd does from the hook at
    lines 274-280).

The initial iterate ``z0`` receives a zero cotangent — the reference
computes it under ``no_grad`` (training/sci_equilibrium_training.py:63-64).
"""

from __future__ import annotations

from typing import Any, Callable

import jax
import jax.numpy as jnp

from deqsci_tpu.fp.anderson import anderson

# step signature: step(params, z, k, args) -> z_next
StepWithParams = Callable[[Any, Any, jnp.ndarray, Any], Any]


def make_deq(step: StepWithParams, solver: Callable = anderson,
             backward: str = "solver", neumann_k: int = 10,
             **solver_kwargs):
    """Build ``deq(params, z0, args) -> z`` with IFT gradients.

    ``solver_kwargs`` (m, lam, beta, max_iter, tol) are shared by the
    forward root-find and the backward transpose-Jacobian solve, as in the
    reference (``**self.kwargs`` at lines 265 and 275).

    ``backward`` selects the gradient scheme:
    * ``"solver"``      IFT solve with the same root-finder (DEQFixedPoint);
    * ``"neumann"``     truncated Neumann series ``sum_i (J^T)^i g`` with
                        ``neumann_k`` terms (DEQFixedPointNeumann,
                        solvers/new_equilibrium_utils_yaping.py:331-365);
    * ``"passthrough"`` gradient of the single re-attach step only, no
                        replacement (hook-less DEQ — the forward-only
                        DEQFixedPointADMM variant, lines 414-451).

    The returned function also has a ``.with_info`` attribute:
    ``deq.with_info(params, z0, args) -> (z, FPInfo)`` for residual
    diagnostics (the reference's ``forward_res``).
    """
    assert backward in ("solver", "neumann", "passthrough")

    def _solve(params, z0, args):
        f = lambda z, k: step(params, z, k, args)
        return solver(f, z0, **solver_kwargs)

    @jax.custom_vjp
    def deq(params, z0, args):
        z_star, info = _solve(params, z0, args)
        return step(params, z_star, info.next_call, args)

    def deq_fwd(params, z0, args):
        z_star, info = _solve(params, z0, args)
        k1 = info.next_call
        z = step(params, z_star, k1, args)
        return z, (params, z_star, z, k1, args)

    def deq_bwd(residuals, g):
        params, z_star, z_out, k1, args = residuals

        # Linearize one step at the forward output (reference's f0 = f(z0)).
        _, vjp_z = jax.vjp(lambda zz: step(params, zz, k1 + 1, args), z_out)

        if backward == "solver":
            def grad_map(y, k):
                del k  # the linear map has no per-call state
                return jax.tree.map(jnp.add, vjp_z(y)[0], g)

            g_star, _ = solver(grad_map, g, **solver_kwargs)
        elif backward == "neumann":
            def neumann_body(carry, _):
                acc, cur = carry
                cur = vjp_z(cur)[0]
                return (jax.tree.map(jnp.add, acc, cur), cur), None

            (g_star, _), _ = jax.lax.scan(neumann_body, (g, g), None,
                                          length=neumann_k)
        else:  # passthrough
            g_star = g

        # Cotangents for params/args via the re-attach step at (z_star, k1).
        _, vjp_pa = jax.vjp(lambda p, a: step(p, z_star, k1, a), params, args)
        d_params, d_args = vjp_pa(g_star)
        d_z0 = jax.tree.map(jnp.zeros_like, z_star)
        return d_params, d_z0, d_args

    deq.defvjp(deq_fwd, deq_bwd)

    def with_info(params, z0, args):
        z_star, info = _solve(params, z0, args)
        return step(params, z_star, info.next_call, args), info

    deq.with_info = with_info
    return deq
