"""Pallas kernels: interpret-mode correctness vs the jnp reference path."""

import jax.numpy as jnp
import numpy as np

from deqsci_tpu.ops.pallas.gap_step import gap_update_pallas
from deqsci_tpu.ops.sensing import gap_update, phi_sum


def test_gap_kernel_matches_jnp(rng):
    b, h, w, t = 2, 64, 128, 8
    z = jnp.asarray(rng.standard_normal((b, h, w, t)).astype(np.float32))
    Phi = jnp.asarray((rng.random((b, h, w, t)) > 0.5).astype(np.float32))
    y = jnp.asarray(rng.standard_normal((b, h, w)).astype(np.float32))
    ps = phi_sum(Phi)

    want = gap_update(z, y, Phi, ps)
    got = gap_update_pallas(z, y, Phi, ps, tile_h=32, interpret=True)
    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=1e-5, atol=1e-6)
