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
