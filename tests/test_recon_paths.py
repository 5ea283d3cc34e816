"""Reconstructor variants: multi-mask batching and warm-start sequential."""

import jax.numpy as jnp
import numpy as np
import pytest

from deqsci_tpu.maps.gap_sci import make_gap_sci_step
from deqsci_tpu.ops.sensing import A
from deqsci_tpu.recon import make_reconstructor


def _setup(rng, h=16, w=16, t=8):
    def denoise(params, x):
        k = jnp.ones((3, 3, 1, 1), x.dtype) / 9.0
        import jax
        blur = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return 0.3 * (x - blur)

    step = make_gap_sci_step(denoise, tag="denoiser")
    recon = make_reconstructor(step, m=5, lam=1e-2, max_iter=15, tol=1e-6)
    gt = rng.random((2, h, w, t)).astype(np.float32)
    Phi = (rng.random((2, h, w, t)) > 0.5).astype(np.float32)
    y = np.asarray(A(jnp.asarray(gt), jnp.asarray(Phi)))
    return recon, gt, Phi, y


def test_multi_matches_per_clip(rng):
    recon, gt, Phi, y = _setup(rng)
    multi = np.asarray(recon.multi({}, jnp.asarray(y), jnp.asarray(Phi)))
    for i in range(2):
        solo = np.asarray(recon({}, jnp.asarray(y[i])[None],
                                jnp.asarray(Phi[i])))[0]
        np.testing.assert_allclose(multi[i], solo, rtol=1e-4, atol=1e-5)


@pytest.mark.slow
def test_warm_start_runs_and_is_close(rng):
    recon, gt, Phi, y = _setup(rng)
    # same mask across snapshots for the sequential path
    cold = np.asarray(recon({}, jnp.asarray(y), jnp.asarray(Phi[0])))
    warm = np.asarray(recon.warm({}, jnp.asarray(y), jnp.asarray(Phi[0])))
    assert warm.shape == cold.shape
    # both should be valid reconstructions (close, not identical)
    assert np.abs(warm - cold).max() < 0.15
