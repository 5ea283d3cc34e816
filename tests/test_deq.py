"""DEQ core: IFT gradients vs unrolled autodiff and finite differences."""

import jax
import jax.numpy as jnp
import numpy as np

from deqsci_tpu.fp.anderson import anderson
from deqsci_tpu.fp.deq import make_deq
from deqsci_tpu.fp.picard import picard


def _toy_step(rng, d=8):
    """step(params, z, k, args) = tanh(z @ W.T * s + args) — a contraction
    for small s, parameterized by W (matrix) and s (scalar)."""
    W = jnp.asarray(rng.standard_normal((d, d)) / (2 * np.sqrt(d)),
                    jnp.float32)

    def step(params, z, k, args):
        del k
        W, s = params["W"], params["s"]
        return jnp.tanh(z @ W.T * s + args)

    params = {"W": W, "s": jnp.float32(0.7)}
    return step, params


def _unrolled_loss(step, params, z0, args, n_iter=80):
    z = z0
    for _ in range(n_iter):
        z = step(params, z, 0, args)
    return jnp.sum(z ** 2)


def test_forward_matches_unrolled(rng):
    step, params = _toy_step(rng)
    z0 = jnp.zeros((2, 8))
    args = jnp.asarray(rng.standard_normal((2, 8)), jnp.float32)

    deq = make_deq(step, solver=anderson, m=5, max_iter=100, tol=1e-9)
    z = deq(params, z0, args)
    z_unrolled = z0
    for _ in range(300):
        z_unrolled = step(params, z_unrolled, 0, args)
    np.testing.assert_allclose(np.asarray(z), np.asarray(z_unrolled),
                               rtol=1e-5, atol=1e-6)


def test_ift_gradient_matches_unrolled(rng):
    step, params = _toy_step(rng)
    z0 = jnp.zeros((2, 8))
    args = jnp.asarray(rng.standard_normal((2, 8)), jnp.float32)

    deq = make_deq(step, solver=anderson, m=5, max_iter=120, tol=1e-10)
    loss_ift = lambda p: jnp.sum(deq(p, z0, args) ** 2)
    loss_unrolled = lambda p: _unrolled_loss(step, p, z0, args, n_iter=120)

    g_ift = jax.grad(loss_ift)(params)
    g_unr = jax.grad(loss_unrolled)(params)
    np.testing.assert_allclose(np.asarray(g_ift["W"]),
                               np.asarray(g_unr["W"]), rtol=2e-3, atol=2e-4)
    np.testing.assert_allclose(float(g_ift["s"]), float(g_unr["s"]),
                               rtol=2e-3)


def test_ift_gradient_matches_finite_differences(rng):
    step, params = _toy_step(rng, d=6)
    z0 = jnp.zeros((1, 6))
    args = jnp.asarray(rng.standard_normal((1, 6)), jnp.float32)

    deq = make_deq(step, solver=anderson, m=5, max_iter=120, tol=1e-11)
    loss = lambda s: jnp.sum(deq({"W": params["W"], "s": s}, z0, args) ** 2)
    g = float(jax.grad(loss)(params["s"]))
    eps = 1e-3
    fd = (float(loss(params["s"] + eps)) - float(loss(params["s"] - eps))) \
        / (2 * eps)
    np.testing.assert_allclose(g, fd, rtol=5e-3, atol=5e-4)


def test_args_cotangent_is_ift_consistent(rng):
    """d(loss)/d(args) through the fixed point, checked vs finite diff."""
    step, params = _toy_step(rng, d=6)
    z0 = jnp.zeros((1, 6))
    args = jnp.asarray(rng.standard_normal((1, 6)), jnp.float32)

    deq = make_deq(step, solver=anderson, m=5, max_iter=120, tol=1e-11)
    loss = lambda a: jnp.sum(deq(params, z0, a) ** 2)
    g = np.asarray(jax.grad(loss)(args))[0]
    eps = 1e-3
    for i in range(3):
        e = jnp.zeros_like(args).at[0, i].set(eps)
        fd = (float(loss(args + e)) - float(loss(args - e))) / (2 * eps)
        np.testing.assert_allclose(g[i], fd, rtol=5e-3, atol=5e-4)


def test_deq_with_picard_and_jit(rng):
    step, params = _toy_step(rng)
    z0 = jnp.zeros((2, 8))
    args = jnp.asarray(rng.standard_normal((2, 8)), jnp.float32)
    deq = make_deq(step, solver=picard, max_iter=400, tol=1e-10)
    g = jax.jit(jax.grad(lambda p: jnp.sum(deq(p, z0, args) ** 2)))(params)
    assert np.isfinite(np.asarray(g["W"])).all()


def test_init_point_gets_zero_gradient(rng):
    """The reference computes the init point under no_grad."""
    step, params = _toy_step(rng)
    z0 = jnp.ones((1, 8))
    args = jnp.zeros((1, 8))
    deq = make_deq(step, solver=anderson, m=5, max_iter=60, tol=1e-9)
    g = jax.grad(lambda z: jnp.sum(deq(params, z, args)), argnums=0)(z0)
    np.testing.assert_array_equal(np.asarray(g), 0.0)
