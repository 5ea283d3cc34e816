"""DnCNN denoiser family (SimpleCNN / RealSN-SimpleCNN / 17-layer DnCNN).

Covers the reference's provable-model zoo with one parameterized module:

* ``SimpleCNN``      = DnCNN(layers=4, use_bn=False)  — bias-free, plain
  (networks/provable/model/SimpleCNN_models.py:6-61, lip=0 path).
* ``RealSN_SimpleCNN`` = same architecture; the Lipschitz control is a
  *parameter transform* (see nets/sn.py), not an architectural change —
  at inference the normalized weights are identical plain convs, which is
  why the ckpt's precomputed ``weight`` buffers load into this module
  directly.
* ``DnCNN`` / ``RealSN_DnCNN`` = 17-layer variants with BatchNorm
  (networks/provable/model/models.py:5-23, networks/realSN_models.py).

All convs are 3x3, padding SAME, bias-free, NHWC.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp

from deqsci_tpu.ops.pallas.small_conv import (conv3x3_cin1_depthwise,
                                              conv3x3_small_cout_depthwise)


class FastInputConv(nn.Module):
    """3x3 bias-free conv for a single-input-channel layer via the exact
    broadcast+depthwise decomposition (ops/pallas/small_conv.py). Param
    tree identical to nn.Conv's."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, x.shape[-1], self.features))
        return conv3x3_cin1_depthwise(x, kernel)


class StencilHeadConv(nn.Module):
    """3x3 bias-free conv for heads with few output channels, computed as
    an exact depthwise-conv + channel-reduce decomposition — 2.5x faster
    than the MXU conv at Cout=1 (see ops/pallas/small_conv.py). Param tree
    identical to nn.Conv's."""

    features: int

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, x.shape[-1], self.features))
        return conv3x3_small_cout_depthwise(x, kernel)


class DnCNN(nn.Module):
    """Bias-free conv stack: conv-relu, (layers-2) x [conv (bn) relu], conv.

    Precision policy (measured on drop8, 100 DEQ iterations — PARITY.md):
    TPU-default bf16 convs cost ~1.9 dB; 'high' (3-pass bf16, fp32-rate
    error) costs 0.001 dB at ~1.9x the speed of 'highest' (true fp32).
    Default 'high'; use 'highest' for bitwise-level parity studies.
    """

    channels: int = 1
    features: int = 64
    num_layers: int = 4
    use_bn: bool = False
    precision: str = "high"
    fast_head: bool = True

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        conv = lambda feats, name: nn.Conv(
            feats, (3, 3), padding="SAME", use_bias=False, name=name,
            precision=self.precision)
        if self.fast_head and x.shape[-1] == 1:
            x = nn.relu(FastInputConv(self.features, name="conv0")(x))
        else:
            x = nn.relu(conv(self.features, "conv0")(x))
        for i in range(1, self.num_layers - 1):
            x = conv(self.features, f"conv{i}")(x)
            if self.use_bn:
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5,
                                 name=f"bn{i}")(x)
            x = nn.relu(x)
        head = f"conv{self.num_layers - 1}"
        if self.fast_head and self.channels <= 8:
            return StencilHeadConv(self.channels, name=head)(x)
        return conv(self.channels, head)(x)
