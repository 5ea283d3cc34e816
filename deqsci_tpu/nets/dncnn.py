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


class DnCNN(nn.Module):
    """Bias-free conv stack: conv-relu, (layers-2) x [conv (bn) relu], conv.

    ``precision`` defaults to 'highest' (full fp32 on the MXU): the DEQ runs
    O(100) amplifying iterations through this net, and TPU-default bf16
    convs cost ~2 dB PSNR on the benchmarks (measured; see PARITY.md).
    """

    channels: int = 1
    features: int = 64
    num_layers: int = 4
    use_bn: bool = False
    precision: str = "highest"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        conv = lambda feats, name: nn.Conv(
            feats, (3, 3), padding="SAME", use_bias=False, name=name,
            precision=self.precision)
        x = nn.relu(conv(self.features, "conv0")(x))
        for i in range(1, self.num_layers - 1):
            x = conv(self.features, f"conv{i}")(x)
            if self.use_bn:
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5,
                                 name=f"bn{i}")(x)
            x = nn.relu(x)
        return conv(self.channels, f"conv{self.num_layers - 1}")(x)
