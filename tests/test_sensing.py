"""Operator unit tests: adjointness, mask-sum guard, GAP step."""

import jax
import jax.numpy as jnp
import numpy as np

from deqsci_tpu.ops import sensing


def _random_problem(rng, b=2, h=16, w=16, t=8):
    x = jnp.asarray(rng.standard_normal((b, h, w, t)), jnp.float32)
    y = jnp.asarray(rng.standard_normal((b, h, w)), jnp.float32)
    Phi = jnp.asarray((rng.random((b, h, w, t)) > 0.5), jnp.float32)
    return x, y, Phi


def test_adjointness(rng):
    """<A x, y> == <x, At y> for all x, y."""
    x, y, Phi = _random_problem(rng)
    lhs = jnp.vdot(sensing.A(x, Phi), y)
    rhs = jnp.vdot(x, sensing.At(y, Phi))
    np.testing.assert_allclose(lhs, rhs, rtol=1e-5)


def test_adjoint_is_jax_transpose(rng):
    """At equals the autodiff transpose of A."""
    x, y, Phi = _random_problem(rng)
    _, vjp = jax.vjp(lambda v: sensing.A(v, Phi), x)
    np.testing.assert_allclose(np.asarray(vjp(y)[0]),
                               np.asarray(sensing.At(y, Phi)), rtol=1e-5)


def test_phi_sum_zero_guard(rng):
    Phi = jnp.zeros((1, 4, 4, 8))
    s = sensing.phi_sum(Phi)
    np.testing.assert_array_equal(np.asarray(s), np.ones((1, 4, 4)))


def test_gap_update_matches_naive(rng):
    x, y, Phi = _random_problem(rng)
    ps = sensing.phi_sum(Phi)
    got = sensing.gap_update(x, y, Phi, ps)
    fb = np.sum(np.asarray(x) * np.asarray(Phi), axis=-1)
    want = np.asarray(x) + ((np.asarray(y) - fb) / np.asarray(ps))[..., None] \
        * np.asarray(Phi)
    np.testing.assert_allclose(np.asarray(got), want, rtol=1e-5, atol=1e-6)


def test_initial_point(rng):
    _, y, Phi = _random_problem(rng)
    np.testing.assert_allclose(np.asarray(sensing.initial_point(y, Phi)),
                               np.asarray(y)[..., None] * np.asarray(Phi))
    z0, u0 = sensing.initial_point_admm(y, Phi)
    assert u0.shape == z0.shape and float(jnp.sum(jnp.abs(u0))) == 0.0
