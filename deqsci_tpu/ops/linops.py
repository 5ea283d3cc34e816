"""Linear operator protocol + basic operators (functional, pytree-friendly).

Rebuild of operators/operator.py:3-32. An operator is a frozen dataclass of
pure callables; ``gramian`` defaults to ``adjoint(forward(x))``. The
measurement process ``OperatorPlusNoise`` takes an explicit PRNG key —
stochastic state is never hidden (reference adds torch.randn_like noise,
operators/operator.py:20-32).
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax
import jax.numpy as jnp


@dataclasses.dataclass(frozen=True)
class LinearOperator:
    forward: Callable[[jnp.ndarray], jnp.ndarray]
    adjoint: Callable[[jnp.ndarray], jnp.ndarray]
    _gramian: Optional[Callable[[jnp.ndarray], jnp.ndarray]] = None

    def gramian(self, x: jnp.ndarray) -> jnp.ndarray:
        if self._gramian is not None:
            return self._gramian(x)
        return self.adjoint(self.forward(x))


def identity() -> LinearOperator:
    f = lambda x: x
    return LinearOperator(forward=f, adjoint=f)


def self_adjoint(forward: Callable) -> LinearOperator:
    return LinearOperator(forward=forward, adjoint=forward)


def operator_plus_noise(op: LinearOperator, noise_sigma: float):
    """Measurement process y = A x + sigma * eps."""
    def measure(key, x):
        ax = op.forward(x)
        return ax + noise_sigma * jax.random.normal(key, ax.shape, ax.dtype)
    return measure
