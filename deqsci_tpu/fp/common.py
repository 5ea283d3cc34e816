"""Shared helpers for the fixed-point solvers.

All solvers share one calling convention:

    f(z, k) -> z_next

where ``z`` is a pytree whose leaves share a leading batch dimension and
``k`` is the (traced int32) *call index* within the current solve. Threading
the call index through the solver is how the reference's object state (the
FFDNet noise-sigma decay, solvers/equilibrium_solvers_yaping.py:408-413)
becomes pure loop-carried state under ``jit``.

Solvers return ``(z_star, FPInfo)``. ``FPInfo.next_call`` is the call index
the *next* application of ``f`` should use — the DEQ module uses it for the
re-attach step so the sigma schedule lines up exactly with the reference's
per-call decay.
"""

from __future__ import annotations

import math
from typing import Any, Callable, NamedTuple

import jax
import jax.numpy as jnp


class FPInfo(NamedTuple):
    """Solver diagnostics, all on-device scalars (plus optional trace)."""

    residual: jnp.ndarray      # final relative residual (f32 scalar)
    iterations: jnp.ndarray    # last executed iteration index (i32 scalar)
    next_call: jnp.ndarray     # call index for the next application of f
    converged: jnp.ndarray     # residual < tol at exit (bool scalar)
    trace: Any = None          # (max_iter,) residual curve if recorded


def batch_flatten(tree: Any):
    """Flatten a pytree with a shared leading batch dim to ``(bsz, N)``.

    Returns the flat array and an ``unflatten`` closure. This is the pytree
    generalization of the reference's ``x0.reshape(bsz, -1)``
    (solvers/new_equilibrium_utils_yaping.py:158-163); it lets the same
    Anderson routine drive single-tensor GAP solves and tuple-carry ADMM
    solves.
    """
    leaves, treedef = jax.tree.flatten(tree)
    bsz = leaves[0].shape[0]
    sizes = [math.prod(l.shape[1:]) for l in leaves]
    flat = jnp.concatenate(
        [l.reshape(bsz, -1) for l in leaves], axis=1
    )

    shapes = [l.shape for l in leaves]

    def unflatten(fv: jnp.ndarray):
        out, i = [], 0
        for shape, n in zip(shapes, sizes):
            out.append(fv[:, i:i + n].reshape(shape))
            i += n
        return jax.tree.unflatten(treedef, out)

    return flat, unflatten


def global_norm(x: jnp.ndarray) -> jnp.ndarray:
    """Frobenius norm over the whole array (the reference's ``.norm()``)."""
    return jnp.sqrt(jnp.sum(x * x))


StepFn = Callable[[Any, jnp.ndarray], Any]
