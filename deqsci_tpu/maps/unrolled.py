"""Fixed-depth unrolled baselines: ProxgradNet / GradNet / PrecondNeumannNet.

Rebuild of solvers/proxgrad.py:9-86, solvers/gradnet.py:8-55 and
solvers/equilibrium_nets.py:40-82. These are the non-equilibrium ablations:
a Python-fixed number of iterations compiled as one ``lax.scan`` (fully
differentiable — ordinary backprop through the unrolled graph, no IFT).

* ``proxgrad_net``: CG-preconditioned init (60 CG iters at lam=eta), then
  N x [gradient step; x + f(x)];
* ``grad_net``: same init, N x [x - eta*(A^T A x - A^T y - f(x))];
* ``precond_neumann_net``: Neumann-series net — init = eta*CG(y), blocks
  ``eta*CG(x) - f(x)`` accumulated over N terms.

``params = {'eta': scalar, 'net': variables}`` with eta learnable, exactly
as the reference registers it.
"""

from __future__ import annotations

from typing import Any, Callable

import jax

from deqsci_tpu.ops.cg import conjugate_gradient
from deqsci_tpu.ops.linops import LinearOperator


def make_proxgrad_net(op: LinearOperator, denoise: Callable,
                      precond_iterations: int = 60):
    def forward(params: Any, y, iterations: int):
        eta, net = params["eta"], params["net"]
        init = conjugate_gradient(op.adjoint(y), op.gramian, eta,
                                  n_iterations=precond_iterations)

        def block(x, _):
            g = x - eta * (op.gramian(x) - op.adjoint(y))
            return denoise(net, g) + g, None

        out, _ = jax.lax.scan(block, init, None, length=iterations)
        return out
    return forward


def make_grad_net(op: LinearOperator, denoise: Callable,
                  precond_iterations: int = 60):
    def forward(params: Any, y, iterations: int):
        eta, net = params["eta"], params["net"]
        init = conjugate_gradient(op.adjoint(y), op.gramian, eta,
                                  n_iterations=precond_iterations)

        def block(x, _):
            g = op.gramian(x) - op.adjoint(y) - denoise(net, x)
            return x - eta * g, None

        out, _ = jax.lax.scan(block, init, None, length=iterations)
        return out
    return forward


def make_precond_neumann_net(op: LinearOperator, denoise: Callable,
                             cg_iterations: int = 10):
    def forward(params: Any, y, iterations: int):
        eta, net = params["eta"], params["net"]
        init = eta * conjugate_gradient(y, op.gramian, eta,
                                        n_iterations=cg_iterations)

        def block(carry, _):
            running, acc = carry
            running = eta * conjugate_gradient(
                running, op.gramian, eta, n_iterations=cg_iterations) \
                - denoise(net, running)
            return (running, acc + running), None

        (_, acc), _ = jax.lax.scan(block, (init, init), None,
                                   length=iterations)
        return acc
    return forward
