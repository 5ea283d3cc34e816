"""Operator library: CG vs dense solve, blur/MRI adjointness."""

import jax
import jax.numpy as jnp
import numpy as np

from deqsci_tpu.ops.blur import gaussian_blur, motion_blur
from deqsci_tpu.ops.cg import conjugate_gradient, conjugate_gradient_mri
from deqsci_tpu.ops.linops import identity, operator_plus_noise
from deqsci_tpu.ops.mri import cartesian_single_coil_mri, create_mask


def test_cg_matches_dense_solve(rng):
    d = 16
    M = rng.standard_normal((d, d)).astype(np.float32)
    ATA_mat = M.T @ M
    lam = 0.5
    b = rng.standard_normal((2, d)).astype(np.float32)

    ATA = lambda x: x @ jnp.asarray(ATA_mat).T
    x = conjugate_gradient(jnp.asarray(b)[:, :, None, None],
                           lambda v: ATA(v[..., 0, 0])[..., None, None],
                           lam, n_iterations=40)
    want = np.linalg.solve(ATA_mat + lam * np.eye(d), b.T).T
    np.testing.assert_allclose(np.asarray(x)[..., 0, 0], want,
                               rtol=1e-3, atol=1e-4)


def test_cg_is_differentiable(rng):
    d = 8
    M = jnp.asarray(rng.standard_normal((d, d)).astype(np.float32))

    def loss(scale):
        ATA = lambda x: (x @ (scale * M).T) @ (scale * M)
        b = jnp.ones((1, d))
        return jnp.sum(conjugate_gradient(b[:, :, None, None],
                                          lambda v: ATA(v[..., 0, 0])[..., None, None],
                                          0.5, 10) ** 2)
    g = jax.grad(loss)(jnp.float32(1.0))
    assert np.isfinite(float(g))


def _check_adjoint(op, shape, rng, rtol=1e-4):
    x = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    y_shape = op.forward(x).shape
    y = jnp.asarray(rng.standard_normal(y_shape).astype(np.float32))
    lhs = float(jnp.vdot(op.forward(x), y))
    rhs = float(jnp.vdot(x, op.adjoint(y)))
    np.testing.assert_allclose(lhs, rhs, rtol=rtol)


def test_gaussian_blur_self_adjoint(rng):
    _check_adjoint(gaussian_blur(1.5, 5), (2, 16, 16, 3), rng)


def test_motion_blur_adjoint(rng):
    # true adjoint (180-degree-rotated kernel) at an asymmetric angle
    _check_adjoint(motion_blur(30.0, 5), (2, 16, 16, 1), rng)
    _check_adjoint(motion_blur(0.0, 5), (2, 16, 16, 1), rng)


def test_mri_adjointness(rng):
    mask = create_mask((32, 32), center_fraction=0.1, acceleration=4)
    op = cartesian_single_coil_mri(mask)
    _check_adjoint(op, (2, 32, 32, 2), rng)


def test_mri_gramian_consistent(rng):
    mask = create_mask((16, 16), center_fraction=0.2, acceleration=2)
    op = cartesian_single_coil_mri(mask)
    x = jnp.asarray(rng.standard_normal((1, 16, 16, 2)).astype(np.float32))
    np.testing.assert_allclose(np.asarray(op.gramian(x)),
                               np.asarray(op.adjoint(op.forward(x))),
                               rtol=1e-4, atol=1e-5)


def test_mri_cg_solves_normal_equations(rng):
    mask = create_mask((16, 16), center_fraction=0.3, acceleration=2)
    op = cartesian_single_coil_mri(mask)
    x_true = jnp.asarray(rng.standard_normal((1, 16, 16, 2)).astype(np.float32))
    y = op.forward(x_true)
    lam = 0.05
    b = op.adjoint(y)
    x = conjugate_gradient_mri(b, op.gramian, lam, n_iterations=30)
    # residual of the regularized normal equations should be tiny
    res = op.gramian(x) + lam * x - b
    assert float(jnp.linalg.norm(res)) < 1e-3 * float(jnp.linalg.norm(b))


def test_operator_plus_noise(rng):
    meas = operator_plus_noise(identity(), 0.5)
    x = jnp.zeros((4, 8, 8, 1))
    y = meas(jax.random.key(0), x)
    assert 0.3 < float(jnp.std(y)) < 0.7
