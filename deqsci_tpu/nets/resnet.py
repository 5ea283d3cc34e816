"""ResNet denoiser (networks/resnet.py:15-60).

mean-subtract -> 1x1 conv to 128 feats -> N residual blocks
[conv3x3-BN-LeakyReLU(0.1) x2, clamp(in+out, -1, 1)] -> three 1x1 convs
with LeakyReLU(0.1) -> add the mean back.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


class ResidualBlock(nn.Module):
    features: int
    precision: str = "high"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        h = x
        for i in range(2):
            h = nn.Conv(self.features, (3, 3), padding="SAME",
                        name=f"conv{i}", precision=self.precision)(h)
            h = nn.BatchNorm(use_running_average=not train, momentum=0.9,
                             epsilon=1e-5, name=f"bn{i}")(h)
            h = nn.leaky_relu(h, 0.1)
        return jnp.clip(x + h, -1.0, 1.0)


class NBlockResNet(nn.Module):
    out_chans: int = 1
    n_residual_blocks: int = 2
    features: int = 128
    precision: str = "high"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        mean = jnp.mean(x, axis=(1, 2), keepdims=True)
        h = x - mean
        h = nn.Conv(self.features, (1, 1), name="init",
                    precision=self.precision)(h)
        for i in range(self.n_residual_blocks):
            h = ResidualBlock(self.features, self.precision,
                              name=f"block{i}")(h, train=train)
        for i in range(2):
            h = nn.Conv(self.features, (1, 1), name=f"post{i}",
                        precision=self.precision)(h)
            h = nn.leaky_relu(h, 0.1)
        h = nn.Conv(self.out_chans, (1, 1), name="head",
                    precision=self.precision)(h)
        h = nn.leaky_relu(h, 0.1)
        return mean + h
