"""FFDNet: sigma-conditioned denoiser with 2x2 space-to-depth mosaicing.

TPU rebuild of networks/ffdnet/models.py:70-108 and functions.py:16-104.
The custom CUDA-era autograd functions (interleaved space-to-depth /
depth-to-space) become pure reshapes/transposes, which XLA compiles to
layout changes — effectively free on TPU.

Channel-order parity (checkpoint fidelity): the reference populates
downsampled channel ``4*c + idx`` from input channel ``c`` and patch
``idx in [(0,0),(0,1),(1,0),(1,1)]`` (functions.py:48-50), i.e. ordering
``(c, i, j)``, and concatenates the noise map FIRST (functions.py:53).

Architecture (grayscale): space-to-depth(2) + sigma map -> 5-channel input;
15 conv layers (64 feats, 3x3, bias-free; BatchNorm on the 13 middle
layers) -> 4 channels; depth-to-space(2) -> predicted noise.
"""

from __future__ import annotations

import flax.linen as nn
import jax.numpy as jnp


def space_to_depth(x: jnp.ndarray) -> jnp.ndarray:
    """(N, H, W, C) -> (N, H/2, W/2, 4C) with channel order (c, i, j)."""
    n, h, w, c = x.shape
    x = x.reshape(n, h // 2, 2, w // 2, 2, c)
    # -> (N, H/2, W/2, C, 2i, 2j), flatten last three as (c, i, j)
    x = jnp.transpose(x, (0, 1, 3, 5, 2, 4))
    return x.reshape(n, h // 2, w // 2, 4 * c)


def depth_to_space(x: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`space_to_depth`; (N, H, W, 4C) -> (N, 2H, 2W, C)."""
    n, h, w, c4 = x.shape
    c = c4 // 4
    x = x.reshape(n, h, w, c, 2, 2)
    x = jnp.transpose(x, (0, 1, 4, 2, 5, 3))
    return x.reshape(n, 2 * h, 2 * w, c)


class FFDNet(nn.Module):
    """Predicts the noise in ``x`` at level ``sigma`` (per-sample scalar).

    Conv precision defaults to 'high' (fp32-rate accuracy at ~2x 'highest'
    speed; TPU-default bf16 diverges the fixed point — see nets/dncnn.py).
    """

    in_channels: int = 1
    precision: str = "packed"
    fast_head: bool = True
    bn_fold: bool = False  # inference-only: load dncnn.fold_batchnorm()
    # params — the 13 body BNs become conv scale+bias (VERDICT r2 lever)
    feats: int = 0  # hidden width override (0 = family default); wider
    # bodies fill more of the MXU's 128 lanes (PARITY.md round-4 probes:
    # 96 ch = 102 TF/s, 128 ch = 160 TF/s vs 56 at the reference's 64)

    @property
    def _cfg(self):
        if self.in_channels == 1:
            cfg = dict(feats=64, layers=15, down_ch=5, out_ch=4)
        elif self.in_channels == 3:
            cfg = dict(feats=96, layers=12, down_ch=15, out_ch=12)
        else:
            raise ValueError("in_channels must be 1 or 3")
        if self.feats:
            cfg["feats"] = self.feats
        return cfg

    @nn.compact
    def __call__(self, x: jnp.ndarray, sigma: jnp.ndarray,
                 train: bool = False) -> jnp.ndarray:
        cfg = self._cfg
        n, h, w, c = x.shape
        down = space_to_depth(x)
        noise_map = jnp.broadcast_to(
            sigma.reshape(n, 1, 1, 1).astype(x.dtype),
            (n, h // 2, w // 2, c))
        y = jnp.concatenate([noise_map, down], axis=-1)

        packed = self.precision == "packed"
        conv = lambda feats, name, bias=False: nn.Conv(
            feats, (3, 3), padding="SAME", use_bias=bias, name=name,
            precision="high" if packed else self.precision)
        y = nn.relu(conv(cfg["feats"], "conv0")(y))
        if packed:
            from deqsci_tpu.nets.dncnn import PackedBodyConv, split_pack
            y = split_pack(y)
        for i in range(1, cfg["layers"] - 1):
            if packed:
                y = PackedBodyConv(cfg["feats"], name=f"conv{i}",
                                   use_bias=self.bn_fold)(y)
            else:
                y = conv(cfg["feats"], f"conv{i}", bias=self.bn_fold)(y)
            if not self.bn_fold:
                y = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5,
                                 name=f"bn{i}")(y)
            y = nn.relu(y)
            # final body layer feeds the f32 head directly — skip the
            # pack/unpack round-trip (round-3 advisor fix)
            if packed and i < cfg["layers"] - 2:
                y = split_pack(y)
        head = f"conv{cfg['layers'] - 1}"
        if self.fast_head:
            from deqsci_tpu.nets.dncnn import StencilHeadConv
            y = StencilHeadConv(cfg["out_ch"], name=head)(y)
        else:
            y = conv(cfg["out_ch"], head)(y)
        return depth_to_space(y)
