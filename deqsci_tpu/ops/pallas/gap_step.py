"""Pallas TPU kernel: fused GAP physics update.

Computes ``z' = z + At((y - A(z, Phi)) / Phi_sum, Phi)`` in ONE pass over
HBM per operand (XLA's fusion typically splits the frame-axis reduction
and the broadcast update into separate passes). The kernel operates in a
frame-major (T, H, W) per-sample layout so the T-reduction runs across a
major axis while W=lane stays dense; the public wrapper accepts the
framework's channel-last (B, H, W, T) and inserts the two (cheap) layout
transposes.

This op is bandwidth-bound (~4 ops/byte below 1): the win over XLA is
bounded by the saved memory passes. Benchmarks in tests/test_pallas.py
compare against the jnp path; the reconstructor always uses the jnp path —
this kernel is benchmark/test-only and kept as the template for fused
physics-step variants (SURVEY.md §7 step 9: Pallas kept only where it
wins, and on the measured shapes XLA's fusion is at parity).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _gap_kernel(z_ref, phi_ref, y_ref, ps_ref, out_ref):
    z = z_ref[:]                       # (T, TILE_H, W)
    phi = phi_ref[:]
    fb = jnp.sum(z * phi, axis=0)      # (TILE_H, W)
    r = (y_ref[:] - fb) / ps_ref[:]
    out_ref[:] = z + r[None, :, :] * phi


@functools.partial(jax.jit, static_argnames=("tile_h", "interpret"))
def gap_update_tmajor(z: jnp.ndarray, y: jnp.ndarray, Phi: jnp.ndarray,
                      Phi_sum: jnp.ndarray, tile_h: int = 32,
                      interpret: bool = False) -> jnp.ndarray:
    """Frame-major single-sample update: z, Phi (T, H, W); y, Phi_sum (H, W)."""
    t, h, w = z.shape
    assert h % tile_h == 0, (h, tile_h)
    grid = (h // tile_h,)
    spec3 = pl.BlockSpec((t, tile_h, w), lambda i: (0, i, 0),
                         memory_space=pltpu.VMEM)
    spec2 = pl.BlockSpec((tile_h, w), lambda i: (i, 0),
                         memory_space=pltpu.VMEM)
    return pl.pallas_call(
        _gap_kernel,
        out_shape=jax.ShapeDtypeStruct(z.shape, z.dtype),
        grid=grid,
        in_specs=[spec3, spec3, spec2, spec2],
        out_specs=spec3,
        interpret=interpret,
    )(z, Phi, y, Phi_sum)


def gap_update_pallas(z: jnp.ndarray, y: jnp.ndarray, Phi: jnp.ndarray,
                      Phi_sum: jnp.ndarray, tile_h: int = 32,
                      interpret: bool = False) -> jnp.ndarray:
    """Channel-last batched wrapper: z, Phi (B, H, W, T); y, ps (B, H, W)."""
    zt = jnp.transpose(z, (0, 3, 1, 2))
    pt = jnp.transpose(Phi, (0, 3, 1, 2))
    f = jax.vmap(functools.partial(gap_update_tmajor, tile_h=tile_h,
                                   interpret=interpret))
    out = f(zt, y, pt, Phi_sum)
    return jnp.transpose(out, (0, 2, 3, 1))
