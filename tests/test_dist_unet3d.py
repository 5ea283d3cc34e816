"""Frame-axis (sequence/context-parallel analog) sharding of the 3-D U-Net.

The (3,3,3) convs couple neighboring frames; sharding the frame axis makes
GSPMD insert halo exchanges (collective-permute) automatically — the SCI
analog of context parallelism (SURVEY.md §5). The sharded result must
match the single-device one.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import NamedSharding, PartitionSpec as P

from deqsci_tpu.dist.mesh import make_mesh, replicated
from deqsci_tpu.nets.unet import UNet

needs_8 = pytest.mark.skipif(len(jax.devices()) < 8,
                             reason="needs 8 virtual devices")


@pytest.mark.slow
@needs_8
def test_unet3d_frame_sharded_matches(rng):
    net = UNet(out_chans=1, chans=4, num_pool_layers=2, conv3d=True)
    x = jnp.asarray(rng.random((2, 8, 32, 32, 1)).astype(np.float32))
    v = net.init(jax.random.key(0), x)

    apply_jit = jax.jit(lambda v, x: net.apply(v, x))
    want = apply_jit(v, x)

    mesh = make_mesh(n_data=2, n_frame=4)
    with mesh:
        xs = jax.device_put(x, NamedSharding(
            mesh, P("data", "frame", None, None, None)))
        vs = jax.device_put(v, replicated(mesh))
        got = apply_jit(vs, xs)

    np.testing.assert_allclose(np.asarray(got), np.asarray(want),
                               rtol=2e-5, atol=2e-6)


@pytest.mark.slow
@needs_8
def test_unet3d_frame_sharded_trained_weights(rng):
    """Same GSPMD halo-exchange equivalence, but through the FULL DEQ
    reconstruction on the TRAINED 3-D operating point (models/unet3d_r5,
    VERDICT r4 #3) — system-level, not unit-level: the whole
    Anderson-accelerated GAP solve runs with the frame axis sharded."""
    import os

    import orbax.checkpoint as ocp

    from deqsci_tpu.maps.gap_sci import make_gap_sci_step
    from deqsci_tpu.recon import make_reconstructor
    from deqsci_tpu.zoo import infer_unet_spec

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    ckpt = os.path.join(repo, "models", "unet3d_r5")
    if not os.path.isdir(ckpt):
        pytest.skip("models/unet3d_r5 not shipped")
    v = jax.tree.map(jnp.asarray,
                     ocp.StandardCheckpointer().restore(
                         os.path.abspath(ckpt))["params"])
    net = UNet(out_chans=1, conv3d=True, **infer_unet_spec(v))
    step = make_gap_sci_step(lambda p, x: net.apply(p, x),
                             tag="3d_denoiser")
    recon = make_reconstructor(step, m=5, lam=1e-2, beta=1.0,
                               max_iter=8, tol=1e-5)

    h = w = 64
    gt = rng.random((2, h, w, 8)).astype(np.float32)
    Phi = (rng.random((2, h, w, 8)) > 0.5).astype(np.float32)
    y = np.sum(gt * Phi, axis=-1)

    want = np.asarray(recon.multi(v, jnp.asarray(y), jnp.asarray(Phi)))

    mesh = make_mesh(n_data=2, n_frame=4)
    with mesh:
        ys = jax.device_put(jnp.asarray(y),
                            NamedSharding(mesh, P("data", None, None)))
        Ps = jax.device_put(jnp.asarray(Phi),
                            NamedSharding(mesh, P("data", None, None,
                                                  "frame")))
        got = np.asarray(recon.multi(jax.device_put(v, replicated(mesh)),
                                     ys, Ps))
    np.testing.assert_allclose(got, want, rtol=2e-5, atol=2e-5)
