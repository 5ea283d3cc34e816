"""Small-output-channel 3x3 conv: XLA stencil (production) + Pallas kernel
(experimental).

Why: XLA lowers convs to MXU matmuls with the output-channel dim on the
128-wide systolic axis — a Cout=1 head (the DnCNN/FFDNet final noise
layer) wastes >99% of the MXU and measures ~4 ms per DEQ iteration at
(8, 256, 256, 64), as slow as the 64->64 body convs (measured, v5e).

``conv3x3_small_cout_depthwise`` decomposes the head exactly into a
depthwise 3x3 conv (per-channel, VPU-friendly) followed by a channel
reduction — 1.60 ms/iter vs 2.36 for the 9-offset static-slice stencil
(``conv3x3_small_cout_stencil``) and 4.03 for the plain conv (measured).
This is the production path (nets use it for heads with few output
channels).

``conv3x3_small_cout`` is the single-pass Pallas version (manual HBM->VMEM
DMA + lane-reduction stencil, theoretically ~0.8 ms). It is correct in
interpret mode but **faults the TPU worker on the axon remote runtime in
this sandbox** (DMA from an ANY-space ref); kept non-default until the
runtime path is debugged on a directly attached chip.

Contract: x (N, H, W, C) fp32, kernel (3, 3, C, Co) with small Co;
output (N, H, W, Co). H must be divisible by tile_h (Pallas variant).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def conv3x3_small_cout_depthwise(x: jnp.ndarray,
                                 kernel: jnp.ndarray) -> jnp.ndarray:
    """Exact decomposition: per-output-channel depthwise conv + channel
    reduce. SAME 3x3, NHWC; kernel (3, 3, C, Co) with small Co."""
    c = x.shape[-1]
    outs = []
    for o in range(kernel.shape[-1]):
        kdw = jnp.transpose(kernel[:, :, :, o:o + 1], (0, 1, 3, 2))
        dw = jax.lax.conv_general_dilated(
            x, kdw, (1, 1), "SAME",
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            feature_group_count=c,
            precision=jax.lax.Precision.HIGHEST)
        outs.append(jnp.sum(dw, axis=-1))
    return jnp.stack(outs, axis=-1)


def conv3x3_cin1_depthwise(x: jnp.ndarray,
                           kernel: jnp.ndarray) -> jnp.ndarray:
    """Exact 3x3 SAME conv for single-input-channel layers: broadcast the
    input over the output channels and run one depthwise conv — 0.66 ms vs
    1.15 ms for the MXU conv at (8, 256, 256, 1->64) (measured; the K=9
    contraction wastes the systolic array). x (N, H, W, 1), kernel
    (3, 3, 1, Co)."""
    co = kernel.shape[-1]
    xb = jnp.broadcast_to(x, x.shape[:-1] + (co,))
    return jax.lax.conv_general_dilated(
        xb, kernel, (1, 1), "SAME",
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        feature_group_count=co,
        precision=jax.lax.Precision.HIGHEST)


def conv3x3_small_cout_stencil(x: jnp.ndarray,
                               kernel: jnp.ndarray) -> jnp.ndarray:
    """9-offset static-slice stencil; exact conv semantics (SAME, NHWC)."""
    n, h, w, c = x.shape
    co = kernel.shape[-1]
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
    out = None
    for dy in range(3):
        for dx in range(3):
            t = jnp.einsum("nhwc,co->nhwo", xp[:, dy:dy + h, dx:dx + w, :],
                           kernel[dy, dx],
                           precision=jax.lax.Precision.HIGHEST)
            out = t if out is None else out + t
    return out


def _make_kernel(tile_h: int, w: int, c: int, co: int):
    def kernel(x_hbm, k_ref, out_ref, scratch, sem):
        n = pl.program_id(0)
        i = pl.program_id(1)
        cp = pltpu.make_async_copy(
            x_hbm.at[n, pl.ds(i * tile_h, tile_h + 2)], scratch, sem)
        cp.start()
        cp.wait()
        for o in range(co):
            acc = jnp.zeros((tile_h, w), jnp.float32)
            for dy in range(3):
                for dx in range(3):
                    xs = scratch[pl.ds(dy, tile_h), pl.ds(dx, w), :]
                    acc = acc + jnp.sum(xs * k_ref[dy, dx, :, o],
                                        axis=-1)
            out_ref[0, :, :, o] = acc

    return kernel


@functools.partial(jax.jit,
                   static_argnames=("tile_h", "interpret"))
def conv3x3_small_cout(x: jnp.ndarray, kernel: jnp.ndarray,
                       tile_h: int = 32,
                       interpret: bool = False) -> jnp.ndarray:
    n, h, w, c = x.shape
    co = kernel.shape[-1]
    assert h % tile_h == 0, (h, tile_h)
    # Mosaic DMA wants the lane (channel) dim 128-aligned
    if c % 128:
        pad_c = 128 - c % 128
        x = jnp.pad(x, ((0, 0), (0, 0), (0, 0), (0, pad_c)))
        kernel = jnp.pad(kernel, ((0, 0), (0, 0), (0, pad_c), (0, 0)))
        c = c + pad_c
    xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))

    return pl.pallas_call(
        _make_kernel(tile_h, w, c, co),
        out_shape=jax.ShapeDtypeStruct((n, h, w, co), x.dtype),
        grid=(n, h // tile_h),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.ANY),     # padded x in HBM
            pl.BlockSpec(memory_space=pltpu.VMEM),    # whole kernel
        ],
        out_specs=pl.BlockSpec((1, tile_h, w, co),
                               lambda nn, ii: (nn, ii, 0, 0),
                               memory_space=pltpu.VMEM),
        scratch_shapes=[
            pltpu.VMEM((tile_h + 2, w + 2, c), jnp.float32),
            pltpu.SemaphoreType.DMA(()),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(xp, kernel)
