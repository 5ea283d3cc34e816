"""Dihedral self-ensemble: exact equivariance of the transform plumbing.

With a dihedral-EQUIVARIANT denoiser (isotropic box filter), every
transformed solve is exactly the transform of the base solve, so the
8-way ensemble must equal the plain reconstruction to float tolerance.
That pins down the (meas, Phi, output) transform/inverse pairing; any
axis or inverse mistake breaks the identity by whole pixels.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from deqsci_tpu.maps.gap_sci import make_gap_sci_step
from deqsci_tpu.ops.sensing import A
from deqsci_tpu.recon import make_reconstructor, make_self_ensemble


def _box_denoise(params, x, *a, **k):
    kern = jnp.ones((3, 3, 1, 1), x.dtype) / 9.0
    blur = jax.lax.conv_general_dilated(
        x, kern, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"))
    return x - params["w"] * (x - blur)


def _problem(rng, h, w, t=4, s=2):
    xx, yy = np.meshgrid(np.arange(w), np.arange(h))
    gt = np.stack([0.5 + 0.4 * np.sin(2 * np.pi * (xx + 3 * ti + yy) / 24)
                   for ti in range(t * s)], -1).astype(np.float32)
    Phi = (rng.random((h, w, t)) > 0.5).astype(np.float32)
    meas = np.stack([np.asarray(A(jnp.asarray(gt[..., i * t:(i + 1) * t])[None],
                                  jnp.asarray(Phi)[None])[0])
                     for i in range(s)])
    return meas, Phi


@pytest.mark.parametrize("hw", [(32, 32), (32, 48)])
def test_ensemble_equals_base_for_equivariant_denoiser(hw):
    rng = np.random.default_rng(0)
    meas, Phi = _problem(rng, *hw)
    recon = make_reconstructor(make_gap_sci_step(_box_denoise,
                                                 tag="denoiser"),
                               m=3, lam=1e-2, max_iter=12, tol=0.0)
    params = {"w": jnp.float32(0.5)}
    base = np.asarray(recon(params, jnp.asarray(meas), jnp.asarray(Phi)))
    se = np.asarray(make_self_ensemble(recon)(
        params, jnp.asarray(meas), jnp.asarray(Phi)))
    assert se.shape == base.shape
    np.testing.assert_allclose(se, base, atol=2e-5)


@pytest.mark.parametrize("hw", [(32, 32), (32, 48)])
def test_batched_ensemble_matches_sequential(hw):
    """The single-program batched path (recon.multi over 8 per-lane-mask
    problems, VERDICT r4 stretch #8) must reproduce the sequential
    8-solve ensemble: lane-frozen Anderson runs each problem its solo
    iterate count, so only XLA reduction order may differ."""

    def aniso(params, x, *a, **k):
        kern = jnp.zeros((1, 3, 1, 1), x.dtype).at[0, :, 0, 0].set(
            jnp.array([0.8, 0.2, 0.0]))
        blur = jax.lax.conv_general_dilated(
            x, kern, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return x - params["w"] * (x - blur)

    rng = np.random.default_rng(2)
    meas, Phi = _problem(rng, *hw)
    recon = make_reconstructor(make_gap_sci_step(aniso, tag="denoiser"),
                               m=3, lam=1e-2, max_iter=12, tol=0.0)
    params = {"w": jnp.float32(0.5)}
    seq = np.asarray(make_self_ensemble(recon)(
        params, jnp.asarray(meas), jnp.asarray(Phi)))
    bat = np.asarray(make_self_ensemble(recon, batched=True)(
        params, jnp.asarray(meas), jnp.asarray(Phi)))
    np.testing.assert_allclose(bat, seq, atol=2e-5)


def test_ensemble_changes_output_for_anisotropic_denoiser():
    """A directional filter is NOT equivariant; the ensemble must differ
    from the base solve (i.e. the 8 branches genuinely differ)."""

    def aniso(params, x, *a, **k):
        kern = jnp.zeros((1, 3, 1, 1), x.dtype).at[0, :, 0, 0].set(
            jnp.array([0.8, 0.2, 0.0]))
        blur = jax.lax.conv_general_dilated(
            x, kern, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return x - params["w"] * (x - blur)

    rng = np.random.default_rng(1)
    meas, Phi = _problem(rng, 32, 32)
    recon = make_reconstructor(make_gap_sci_step(aniso, tag="denoiser"),
                               m=3, lam=1e-2, max_iter=12, tol=0.0)
    params = {"w": jnp.float32(0.5)}
    base = np.asarray(recon(params, jnp.asarray(meas), jnp.asarray(Phi)))
    se = np.asarray(make_self_ensemble(recon)(
        params, jnp.asarray(meas), jnp.asarray(Phi)))
    assert np.abs(se - base).max() > 1e-4
