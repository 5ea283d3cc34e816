"""Two-layer MLP (the reference's MNIST-era LinearNet,
networks/twolayer_linear_net.py:12-38): flatten -> dense(hidden) -> ReLU ->
dense(out) reshaped back to the input image shape."""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class LinearNet(nn.Module):
    hidden: int = 512

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        shape = x.shape
        h = x.reshape(shape[0], -1)
        out_dim = h.shape[1]
        h = nn.relu(nn.Dense(self.hidden, name="fc0")(h))
        h = nn.Dense(out_dim, name="fc1")(h)
        return h.reshape(shape)
