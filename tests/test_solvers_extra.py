"""Broyden and vector-epsilon solvers; generic maps through the DEQ engine."""

import jax
import jax.numpy as jnp
import numpy as np

from deqsci_tpu.fp.broyden import broyden
from deqsci_tpu.fp.deq import make_deq
from deqsci_tpu.fp.epsilon import epsilon2


def _contraction(rng, d=16, rate=0.6):
    M = rng.standard_normal((d, d))
    u, _, vt = np.linalg.svd(M)
    M = (u * (rate * rng.random(d))) @ vt
    b = rng.standard_normal(d)
    return M.astype(np.float32), b.astype(np.float32)


def test_broyden_converges(rng):
    M, b = _contraction(rng)
    f = lambda z, k: z @ jnp.asarray(M).T + jnp.asarray(b)
    z, info = jax.jit(lambda x: broyden(f, x, threshold=40, eps=1e-6))(
        jnp.zeros((2, M.shape[0])))
    z_true = np.linalg.solve(np.eye(M.shape[0]) - M, b)
    np.testing.assert_allclose(np.asarray(z), np.broadcast_to(z_true, z.shape),
                               rtol=1e-3, atol=1e-4)
    assert bool(info.converged)


def test_broyden_best_iterate_on_nonconvergence(rng):
    """With an expansive map, the returned point is the best seen."""
    d = 8
    M = 1.5 * np.eye(d, dtype=np.float32)
    f = lambda z, k: z @ jnp.asarray(M).T + 1.0
    z, info = broyden(f, jnp.zeros((1, d)), threshold=10, eps=1e-9)
    assert np.isfinite(np.asarray(z)).all()
    assert float(info.residual) <= 1e6  # best-iterate, not the last blow-up


def test_epsilon2_converges(rng):
    M, b = _contraction(rng, rate=0.5)
    f = lambda z, k: z @ jnp.asarray(M).T + jnp.asarray(b)
    z, info = epsilon2(f, jnp.zeros((2, M.shape[0])), max_iter=100,
                       tol=1e-7, lam=1e-8)
    z_true = np.linalg.solve(np.eye(M.shape[0]) - M, b)
    np.testing.assert_allclose(np.asarray(z), np.broadcast_to(z_true, z.shape),
                               rtol=1e-3, atol=1e-3)


def test_deq_with_broyden_gradients(rng):
    """The DEQ engine accepts Broyden as its solver (fwd + IFT bwd)."""
    d = 8
    W = jnp.asarray(rng.standard_normal((d, d)) / (2 * np.sqrt(d)),
                    jnp.float32)

    def step(params, z, k, args):
        del k
        return jnp.tanh(z @ params["W"].T * 0.5 + args)

    deq = make_deq(step, solver=broyden, threshold=40, eps=1e-9)
    args = jnp.asarray(rng.standard_normal((1, d)), jnp.float32)
    g = jax.grad(lambda p: jnp.sum(deq(p, jnp.zeros((1, d)), args) ** 2))(
        {"W": W})
    # compare against unrolled
    def loss_unrolled(p):
        z = jnp.zeros((1, d))
        for _ in range(100):
            z = step(p, z, 0, args)
        return jnp.sum(z ** 2)
    g_u = jax.grad(loss_unrolled)({"W": W})
    np.testing.assert_allclose(np.asarray(g["W"]), np.asarray(g_u["W"]),
                               rtol=5e-3, atol=5e-4)


def test_broyden_armijo_converges(rng):
    """ls=True still solves a well-behaved contraction exactly."""
    M, b = _contraction(rng)
    f = lambda z, k: z @ jnp.asarray(M).T + jnp.asarray(b)
    z, info = jax.jit(lambda x: broyden(f, x, threshold=40, eps=1e-6,
                                        ls=True))(jnp.zeros((2, M.shape[0])))
    z_true = np.linalg.solve(np.eye(M.shape[0]) - M, b)
    np.testing.assert_allclose(np.asarray(z), np.broadcast_to(z_true, z.shape),
                               rtol=1e-3, atol=1e-4)
    assert bool(info.converged)


def test_broyden_armijo_damps_overshoot(rng):
    """On a stiff nonlinear residual where the full Broyden step overshoots,
    the Armijo search keeps iterates bounded and reaches a better residual
    than the same budget without it (reference scalar_search_armijo,
    broyd_equilibrium_utils.py:17-56)."""
    d = 8
    scale = jnp.asarray(np.linspace(1.0, 40.0, d), jnp.float32)

    def f(z, k):  # fixed point of a saturating map with wildly mixed scales
        return jnp.tanh(scale * z) * 0.9 / scale + 0.05

    x0 = jnp.full((1, d), 2.0, jnp.float32)
    _, info_ls = broyden(f, x0, threshold=25, eps=1e-8, ls=True)
    _, info_plain = broyden(f, x0, threshold=25, eps=1e-8)
    assert np.isfinite(float(info_ls.residual))
    assert float(info_ls.residual) <= float(info_plain.residual) * 1.000001
