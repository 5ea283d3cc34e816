"""DEQ backward variants: Neumann series and passthrough."""

import jax
import jax.numpy as jnp
import numpy as np

from deqsci_tpu.fp.deq import make_deq


def _toy(rng, d=8):
    W = jnp.asarray(rng.standard_normal((d, d)) / (2 * np.sqrt(d)),
                    jnp.float32)

    def step(params, z, k, args):
        del k
        return jnp.tanh(z @ params["W"].T * 0.6 + args)

    return step, {"W": W}


def test_neumann_backward_approximates_ift(rng):
    step, params = _toy(rng)
    z0 = jnp.zeros((1, 8))
    args = jnp.asarray(rng.standard_normal((1, 8)), jnp.float32)

    deq_ift = make_deq(step, m=5, max_iter=100, tol=1e-10)
    deq_neu = make_deq(step, backward="neumann", neumann_k=60,
                       m=5, max_iter=100, tol=1e-10)
    g_ift = jax.grad(lambda p: jnp.sum(deq_ift(p, z0, args) ** 2))(params)
    g_neu = jax.grad(lambda p: jnp.sum(deq_neu(p, z0, args) ** 2))(params)
    np.testing.assert_allclose(np.asarray(g_neu["W"]),
                               np.asarray(g_ift["W"]), rtol=1e-3, atol=1e-4)


def test_passthrough_backward_is_one_step_grad(rng):
    step, params = _toy(rng)
    z0 = jnp.zeros((1, 8))
    args = jnp.asarray(rng.standard_normal((1, 8)), jnp.float32)

    deq_pt = make_deq(step, backward="passthrough", m=5, max_iter=60,
                      tol=1e-9)
    g = jax.grad(lambda p: jnp.sum(deq_pt(p, z0, args) ** 2))(params)
    assert np.isfinite(np.asarray(g["W"])).all()
    # passthrough must differ from full IFT (sanity that it's not the same)
    deq_ift = make_deq(step, m=5, max_iter=60, tol=1e-9)
    g_ift = jax.grad(lambda p: jnp.sum(deq_ift(p, z0, args) ** 2))(params)
    assert not np.allclose(np.asarray(g["W"]), np.asarray(g_ift["W"]),
                           rtol=1e-3)
