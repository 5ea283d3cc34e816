"""Parameterized U-Net covering the reference's four variants.

One flax module replaces UnetModel / UnetNorm / Unet3D / the upstream
plain U-Net (networks/normalized_equilibrium_u_net_yaping.py:104-402,
networks/normalized_equilibrium_u_net.py, networks/u_net.py):

* ConvBlock = 2 x [conv3x3 (bias-free) + LeakyReLU(0.2)];
* encoder: block -> skip -> avg-pool 2x2 (3-D: (1,2,2) — the frame axis is
  never pooled);
* decoder: transpose-conv 2x up (3-D: kernel (3,2,2), stride (1,2,2),
  torch-padding (1,0,0)) + LeakyReLU, reflect-pad right/bottom on odd
  sizes, concat skip, ConvBlock; final 1x1 conv (with bias);
* ``final_clamp`` reproduces UnetModel's clamp(-1, 1)
  (normalized_equilibrium_u_net_yaping.py:186); UnetNorm/Unet3D omit it.

Spectral normalization is a parameter transform (nets/sn.py), not part of
the architecture — at inference the reference's SN convs are plain convs
with the stored normalized weights.

Layout: NHWC (2-D) / NDHWC (3-D, D = frames).
"""

from __future__ import annotations



import flax.linen as nn
import jax.numpy as jnp


class ConvBlock(nn.Module):
    out_chans: int
    conv3d: bool = False
    precision: str = "high"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        k = (3, 3, 3) if self.conv3d else (3, 3)
        for i in range(2):
            x = nn.Conv(self.out_chans, k, padding="SAME", use_bias=False,
                        name=f"conv{i}", precision=self.precision)(x)
            x = nn.leaky_relu(x, 0.2)
        return x


class TransposeConvBlock(nn.Module):
    out_chans: int
    conv3d: bool = False
    precision: str = "high"

    @nn.compact
    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        if self.conv3d:
            # torch ConvTranspose3d(kernel=(3,2,2), stride=(1,2,2),
            # padding=(1,0,0)): depth preserved, H/W exactly doubled.
            # flax ConvTranspose explicit padding is subtractive relative
            # to the fully-dilated output, so torch padding p maps to
            # (k-1-p, k-1-p): depth (3,1) -> (1,1); H/W (2,0) -> (1,1).
            x = nn.ConvTranspose(self.out_chans, (3, 2, 2),
                                 strides=(1, 2, 2),
                                 padding=((1, 1), (1, 1), (1, 1)),
                                 use_bias=False, name="tconv",
                                 precision=self.precision)(x)
        else:
            x = nn.ConvTranspose(self.out_chans, (2, 2), strides=(2, 2),
                                 padding="VALID", use_bias=False,
                                 name="tconv", precision=self.precision)(x)
        return nn.leaky_relu(x, 0.2)


def _avg_pool(x: jnp.ndarray, conv3d: bool) -> jnp.ndarray:
    if conv3d:
        return nn.avg_pool(x, (1, 2, 2), strides=(1, 2, 2))
    return nn.avg_pool(x, (2, 2), strides=(2, 2))


def _pad_to_match(x: jnp.ndarray, ref: jnp.ndarray) -> jnp.ndarray:
    """Reflect-pad right/bottom so x's spatial dims match the skip (the
    reference's odd-size fix, normalized_equilibrium_u_net_yaping.py:176-182)."""
    pads = [(0, 0)] * x.ndim
    changed = False
    for ax in (-3, -2):  # H, W (channel-last)
        d = ref.shape[ax] - x.shape[ax]
        if d:
            pads[ax] = (0, d)
            changed = True
    if changed:
        x = jnp.pad(x, pads, mode="reflect")
    return x


class UNet(nn.Module):
    """U-Net denoiser; set (conv3d, final_clamp) to select the variant:
    (False, True) = UnetModel, (False, False) = UnetNorm,
    (True, False) = Unet3D."""

    out_chans: int = 1
    chans: int = 32
    num_pool_layers: int = 4
    conv3d: bool = False
    final_clamp: bool = False
    precision: str = "high"

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        del train  # dropout is disabled in every reference config
        stack = []
        ch = self.chans
        out = ConvBlock(ch, self.conv3d, self.precision, name="down0")(x)
        stack.append(out)
        out = _avg_pool(out, self.conv3d)
        for i in range(1, self.num_pool_layers):
            ch *= 2
            out = ConvBlock(ch, self.conv3d, self.precision,
                            name=f"down{i}")(out)
            stack.append(out)
            out = _avg_pool(out, self.conv3d)

        out = ConvBlock(ch * 2, self.conv3d, self.precision,
                        name="bottleneck")(out)

        for i in range(self.num_pool_layers):
            skip = stack.pop()
            out = TransposeConvBlock(ch, self.conv3d, self.precision,
                                     name=f"up_t{i}")(out)
            out = _pad_to_match(out, skip)
            out = jnp.concatenate([out, skip], axis=-1)
            out = ConvBlock(ch, self.conv3d, self.precision,
                            name=f"up{i}")(out)
            ch //= 2

        k1 = (1, 1, 1) if self.conv3d else (1, 1)
        out = nn.Conv(self.out_chans, k1, name="head",
                      precision=self.precision)(out)
        if self.final_clamp:
            out = jnp.clip(out, -1.0, 1.0)
        return out
