"""GAP / proximal-gradient SCI iteration map (physics step + learned prior).

TPU re-design of ``EquilibriumProxGradSCI``
(solvers/equilibrium_solvers_yaping.py:382-436). One fixed-point step is

    z <- z + At((y - A(z, Phi)) / Phi_sum, Phi)     # GAP physics step
    z <- denoise(z)                                 # learned prior

where the denoiser is dispatched by a string ``tag`` exactly as the
reference does (lines 402-425):

``'conv2d'``      2-D net applied per frame (frames folded into batch),
                  output used directly.
``'denoiser'``    2-D net predicts noise; ``z - net(z)``.
``'ffdnet'``      sigma-conditioned FFDNet noise prediction with the decaying
                  schedule sigma_k = (60/255) * 0.971**k (lines 394, 408-417);
                  the reference keeps sigma as module state reset whenever a
                  new measurement arrives — here each solve starts at call
                  index 0, so the schedule is the pure function of ``k``.
``'conv3d'``      3-D net over the (frame, H, W) volume, direct output.
``'3d_denoiser'`` 3-D net, residual form.

Note the SCI path applies no clamp (the reference's minval/maxval are unused
in ``EquilibriumProxGradSCI.forward``, unlike the generic maps at line 80).
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Optional

import jax.numpy as jnp

from deqsci_tpu.ops.sensing import gap_update

# apply signature: (params, x, sigma_or_None) -> output, NHWC / NDHWC
DenoiseApply = Callable[..., jnp.ndarray]

TAGS_2D = ("conv2d", "denoiser", "ffdnet")
TAGS_3D = ("conv3d", "3d_denoiser")
ALL_TAGS = TAGS_2D + TAGS_3D


def frames_to_batch(z: jnp.ndarray) -> jnp.ndarray:
    """(b, H, W, T) -> (b*T, H, W, 1), frame-major within each sample.

    Mirrors the reference's ``permute(0,3,1,2).view(b*c,1,w,h)`` so per-frame
    nets see the same batch ordering (line 403).
    """
    b, h, w, t = z.shape
    return jnp.transpose(z, (0, 3, 1, 2)).reshape(b * t, h, w, 1)


def batch_to_frames(x: jnp.ndarray, b: int) -> jnp.ndarray:
    """(b*T, H, W, 1) -> (b, H, W, T)."""
    bt, h, w, _ = x.shape
    t = bt // b
    return jnp.transpose(x.reshape(b, t, h, w), (0, 2, 3, 1))


def frames_to_volume(z: jnp.ndarray) -> jnp.ndarray:
    """(b, H, W, T) -> (b, T, H, W, 1) NDHWC volume (reference line 406)."""
    return jnp.transpose(z, (0, 3, 1, 2))[..., None]


def volume_to_frames(x: jnp.ndarray) -> jnp.ndarray:
    """(b, T, H, W, 1) -> (b, H, W, T)."""
    return jnp.transpose(x[..., 0], (0, 2, 3, 1))


@dataclasses.dataclass(frozen=True)
class GapSCI:
    """The GAP-SCI step as a pure function of (params, z, k, args).

    ``args = (y, Phi, Phi_sum)`` with y (b, H, W), Phi/z (b, H, W, T).
    """

    denoise: DenoiseApply
    tag: str
    sigma0: float = 60.0 / 255.0
    sigma_decay: float = 0.971
    # optional floor for the decayed sigma. The reference decays without
    # bound (sigma -> 1e-3 by iter 180); denoisers that are not contractive
    # at tiny sigma make the GAP iteration diverge there. None = reference
    # semantics.
    sigma_min: Optional[float] = None

    def __post_init__(self):
        if self.tag not in ALL_TAGS:
            raise ValueError(f"unknown nonlinear_op tag: {self.tag!r}")

    def __call__(self, params: Any, z: jnp.ndarray, k: jnp.ndarray,
                 args) -> jnp.ndarray:
        y, Phi, Phi_sum = args
        b = z.shape[0]
        z = gap_update(z, y, Phi, Phi_sum)

        if self.tag == "conv2d":
            out = self.denoise(params, frames_to_batch(z))
            return batch_to_frames(out, b)
        if self.tag == "denoiser":
            noise = self.denoise(params, frames_to_batch(z))
            return z - batch_to_frames(noise, b)
        if self.tag == "ffdnet":
            x = frames_to_batch(z)
            sigma = self.sigma0 * jnp.power(
                jnp.asarray(self.sigma_decay, z.dtype), k.astype(z.dtype))
            if self.sigma_min is not None:
                sigma = jnp.maximum(sigma, self.sigma_min)
            sigma = jnp.full((x.shape[0],), sigma, dtype=z.dtype)
            noise = self.denoise(params, x, sigma)
            return z - batch_to_frames(noise, b)
        if self.tag == "conv3d":
            out = self.denoise(params, frames_to_volume(z))
            return volume_to_frames(out)
        # '3d_denoiser'
        noise = self.denoise(params, frames_to_volume(z))
        return z - volume_to_frames(noise)


def make_gap_sci_step(denoise: DenoiseApply, tag: str, **kw) -> GapSCI:
    return GapSCI(denoise=denoise, tag=tag, **kw)
