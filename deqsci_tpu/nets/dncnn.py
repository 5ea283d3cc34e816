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
import jax
import jax.numpy as jnp
from jax import lax

from deqsci_tpu.ops.pallas.small_conv import (conv3x3_cin1_depthwise,
                                              conv3x3_small_cout_depthwise)


def split_pack(y: jnp.ndarray) -> jnp.ndarray:
    """f32 (..., C) -> bf16 (..., 2C) packed [hi | lo] with y ~= hi + lo.

    ``lax.reduce_precision`` (not an astype round-trip, which XLA's
    excess-precision simplifier folds to zero) extracts the bf16-exact
    part; the residual is itself bf16-representable to ~f32 accuracy.
    """
    hi = lax.reduce_precision(y, exponent_bits=8, mantissa_bits=7)
    lo = (y - hi).astype(jnp.bfloat16)
    return jnp.concatenate([hi.astype(jnp.bfloat16), lo], axis=-1)


def unpack_sum(z: jnp.ndarray) -> jnp.ndarray:
    """Inverse of :func:`split_pack` up to the lo-part rounding."""
    c = z.shape[-1] // 2
    return z[..., :c].astype(jnp.float32) + z[..., c:].astype(jnp.float32)


def _conv_same(z, w):
    dn = lax.conv_dimension_numbers(z.shape, w.shape,
                                    ("NHWC", "HWIO", "NHWC"))
    return lax.conv_general_dilated(z, w, (1, 1), "SAME",
                                    dimension_numbers=dn,
                                    preferred_element_type=jnp.float32)


@jax.custom_vjp
def _packed_conv(z, wcat):
    """bf16 x bf16 -> f32 SAME conv with an f32 backward.

    XLA's transpose rule for a mixed-dtype conv (f32 cotangent against the
    bf16 kernel) rejects the operand pair, so the VJP re-linearizes in f32
    — also the numerically right choice for the IFT backward, whose
    transpose-Jacobian solve amplifies cotangent rounding.
    """
    return _conv_same(z, wcat)


def _packed_conv_fwd(z, wcat):
    return _conv_same(z, wcat), (z, wcat)


def _packed_conv_bwd(res, g):
    z, wcat = res
    _, vjp = jax.vjp(_conv_same, z.astype(jnp.float32),
                     wcat.astype(jnp.float32))
    dz, dw = vjp(g)
    return dz.astype(z.dtype), dw.astype(wcat.dtype)


_packed_conv.defvjp(_packed_conv_fwd, _packed_conv_bwd)


class PackedBodyConv(nn.Module):
    """3x3 conv evaluated in the packed-split2 scheme (bias-free unless
    ``use_bias`` — the BN-folded inference path).

    Consumes a packed (..., 2C) bf16 activation, contracts hi and lo parts
    against the SAME bf16-rounded kernel in ONE 2C-input-channel conv
    (y = conv(x_hi, Wb) + conv(x_lo, Wb)), returning the f32 accumulator.

    Numerics: corrects the dynamic activation rounding that compounds over
    the fixed-point iteration; the static bf16 weight rounding is a fixed
    map perturbation, measured at -0.003 dB end to end vs Precision.HIGH
    on the DE-GAP-CNN golden configs at 1.25x the throughput (STATUS.md).
    Parameter tree is identical to nn.Conv's (kernel (3, 3, C, C)), so
    converted reference checkpoints load unchanged.
    """

    features: int
    use_bias: bool = False

    @nn.compact
    def __call__(self, z: jnp.ndarray) -> jnp.ndarray:
        c = z.shape[-1] // 2
        kernel = self.param("kernel", nn.initializers.lecun_normal(),
                            (3, 3, c, self.features))
        wb = kernel.astype(jnp.bfloat16)
        wcat = jnp.concatenate([wb, wb], axis=2)     # (3, 3, 2C, Co)
        y = _packed_conv(z, wcat)
        if self.use_bias:
            # bias stays f32, added to the f32 accumulator (folded-BN
            # shift is NOT bf16-rounded)
            y = y + self.param("bias", nn.initializers.zeros,
                               (self.features,))
        return y


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


def fold_batchnorm(variables, eps: float = 1e-5):
    """Fold inference-mode BatchNorms into the adjacent conv kernels.

    For every ``bn{i}``/``conv{i}`` pair (DnCNN/FFDNet body layout,
    reference networks/ffdnet/models.py:27-68), inference BN is the pure
    affine ``y = s*h + b`` with ``s = gamma/sqrt(var+eps)`` and
    ``b = beta - s*mean``; folding scales the conv kernel per OUTPUT
    channel (HWIO: last axis) in f32 — which also pre-scales the bf16
    packed weights before their single rounding — and moves the shift
    into a conv bias. Returns variables for the ``bn_fold=True`` module
    (inference only: running stats are frozen by construction).
    """
    params = dict(variables["params"])
    stats = variables.get("batch_stats", {})
    for name in [n for n in params if n.startswith("bn")]:
        conv = "conv" + name[2:]
        gamma = params[name]["scale"]
        beta = params[name]["bias"]
        mean = stats[name]["mean"]
        var = stats[name]["var"]
        s = gamma / jnp.sqrt(var + eps)
        params[conv] = {"kernel": params[conv]["kernel"] * s,
                        "bias": beta - s * mean}
        del params[name]
    return {"params": params}


class DnCNN(nn.Module):
    """Bias-free conv stack: conv-relu, (layers-2) x [conv (bn) relu], conv.

    Precision policy (measured end to end on the golden configs, 100 DEQ
    iterations — PARITY.md/STATUS.md):
    * 'packed' (default): split2 scheme via PackedBodyConv — -0.003 dB vs
      'high' at 1.25x throughput (20.3 vs 16.2 frames/s);
    * 'high': 3-pass bf16 conv, fp32-rate error (the exact-parity path);
    * 'highest': true fp32, for bitwise-level oracle comparisons;
    * TPU-default 1-pass bf16 was measured at -0.47 dB and rejected.
    """

    channels: int = 1
    features: int = 64
    num_layers: int = 4
    use_bn: bool = False
    precision: str = "packed"
    fast_head: bool = True
    bn_fold: bool = False  # inference-only: load fold_batchnorm() params

    @nn.compact
    def __call__(self, x: jnp.ndarray, train: bool = False) -> jnp.ndarray:
        packed = self.precision == "packed"
        folded = self.use_bn and self.bn_fold
        conv = lambda feats, name, bias=False: nn.Conv(
            feats, (3, 3), padding="SAME", use_bias=bias, name=name,
            precision="high" if packed else self.precision)
        if self.fast_head and x.shape[-1] == 1:
            x = nn.relu(FastInputConv(self.features, name="conv0")(x))
        else:
            x = nn.relu(conv(self.features, "conv0")(x))
        # pack only if a body layer exists to consume it (the head reads
        # f32; a 2-layer net would otherwise hand it packed activations)
        if packed and self.num_layers > 2:
            x = split_pack(x)
        for i in range(1, self.num_layers - 1):
            if packed:
                x = PackedBodyConv(self.features, name=f"conv{i}",
                                   use_bias=folded)(x)
            else:
                x = conv(self.features, f"conv{i}", bias=folded)(x)
            if self.use_bn and not folded:
                x = nn.BatchNorm(use_running_average=not train,
                                 momentum=0.9, epsilon=1e-5,
                                 name=f"bn{i}")(x)
            x = nn.relu(x)
            # the head consumes f32, so the final body layer skips the
            # pack (a split_pack/unpack_sum round-trip would only add one
            # lo-part rounding; round-3 advisor fix)
            if packed and i < self.num_layers - 2:
                x = split_pack(x)
        head = f"conv{self.num_layers - 1}"
        if self.fast_head and self.channels <= 8:
            return StencilHeadConv(self.channels, name=head)(x)
        return conv(self.channels, head)(x)
