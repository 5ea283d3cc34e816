"""ADMM SCI iteration map with the two-tensor (z, u) carry.

TPU re-design of ``EquilibriumADMMSCI``
(solvers/equilibrium_solvers_yaping.py:438-465):

    zbar <- (z+u) + At((y - A(z+u, Phi)) / (Phi_sum + 1e-8), Phi)
    z+   <- denoise(zbar - u)
    u+   <- u - (zbar - z+)

returning the carry ``(zbar, u+)`` — note the reference returns the
*pre-denoise* ``z`` (its local variable after the physics step) paired with
the updated dual, exactly as lines 453-465 do. The denoiser is a plain net
for ``conv3d=False`` nets and a 3-D net otherwise; residual ('denoiser')
tags are also supported for symmetry with the GAP map.

The reference never wires this map to an entry script (it is only importable
+ used by training/sci_equilibrium_training_admm.py); here it is first-class.
"""

from __future__ import annotations

import dataclasses
from typing import Any, Optional

import jax.numpy as jnp

from deqsci_tpu.maps.gap_sci import (ALL_TAGS, DenoiseApply, batch_to_frames,
                                     frames_to_batch, frames_to_volume,
                                     volume_to_frames)
from deqsci_tpu.ops.sensing import A, At


@dataclasses.dataclass(frozen=True)
class AdmmSCI:
    """ADMM-SCI step over carry pytree ``(z, u)``.

    The ``ffdnet`` tag adds the GAP map's per-call-index sigma schedule
    (sigma0 x decay^k, optionally floored) to the ADMM family. The
    reference's ADMM map has NO sigma path at all — its forward only
    switches on ``conv3d`` (equilibrium_solvers_yaping.py:455-462), so
    DE-ADMM-FFDNet is unreachable upstream; here the sigma-conditioned
    denoiser composes with the ADMM carry exactly as it does with GAP.
    """

    denoise: DenoiseApply
    tag: str
    sigma0: float = 60.0 / 255.0
    sigma_decay: float = 0.971
    sigma_min: Optional[float] = None
    sigma_dual_coef: Optional[float] = None
    # Cap on the DUAL-FLOOR term coef*RMS(u) (round-5 tail finding): the
    # Anderson-path dual trace shows RMS(u) grows monotonically along the
    # solve (drop8: 0.080 @k=100 -> 0.115 @180 -> 0.147 @260), so past
    # the knee sigma_eff == RMS(u) keeps climbing and over-smooths the
    # iterates (drop8 decays most — the saturated-file signature).
    # Capping the dual term at its knee-region value pins the late-
    # iteration denoiser strength without touching the decaying base
    # schedule (the early-iteration curriculum), so iterates where the
    # schedule or an un-capped-size dual dominates are bit-identical.
    sigma_max: Optional[float] = None

    def __post_init__(self):
        if self.tag not in ALL_TAGS:
            raise ValueError(f"unknown nonlinear_op tag: {self.tag!r}")

    def _apply_denoiser(self, params, x, k, u=None):
        b = x.shape[0]
        if self.tag == "conv2d":
            return batch_to_frames(self.denoise(params, frames_to_batch(x)), b)
        if self.tag == "denoiser":
            return x - batch_to_frames(
                self.denoise(params, frames_to_batch(x)), b)
        if self.tag == "ffdnet":
            xb = frames_to_batch(x)
            sigma = self.sigma0 * jnp.power(
                jnp.asarray(self.sigma_decay, x.dtype), k.astype(x.dtype))
            if self.sigma_min is not None:
                sigma = jnp.maximum(sigma, self.sigma_min)
            sigma = jnp.full((xb.shape[0],), sigma, dtype=x.dtype)
            if self.sigma_dual_coef is not None and u is not None:
                # ADMM-native sigma floor: the dual's RMS measures the
                # constraint violation |zbar - z|, which the scaled-dual
                # update accumulates. Flooring sigma at coef*RMS(u) keeps
                # the denoiser strong while the splitting disagrees and
                # anneals automatically as the fixed point is approached —
                # a self-tuning curriculum no external schedule provides
                # (VERDICT r3 #6; no upstream analog: the reference ADMM
                # map has no sigma path at all).
                dual_rms = jnp.sqrt(jnp.mean(
                    u.astype(jnp.float32) ** 2, axis=(1, 2, 3))
                ).astype(x.dtype)  # (b,)
                per_frame = jnp.repeat(dual_rms, xb.shape[0] // u.shape[0])
                dual_term = self.sigma_dual_coef * per_frame
                if self.sigma_max is not None:
                    # Cap the DUAL-FLOOR term only: the decaying base
                    # schedule (the early-iteration curriculum) is never
                    # touched, so iterates where the schedule dominates
                    # are bit-identical with or without the cap.
                    dual_term = jnp.minimum(dual_term, self.sigma_max)
                sigma = jnp.maximum(sigma, dual_term)
            return x - batch_to_frames(self.denoise(params, xb, sigma), b)
        if self.tag == "conv3d":
            return volume_to_frames(self.denoise(params, frames_to_volume(x)))
        if self.tag == "3d_denoiser":
            return x - volume_to_frames(
                self.denoise(params, frames_to_volume(x)))
        raise ValueError(self.tag)

    def __call__(self, params: Any, carry, k: jnp.ndarray, args):
        z, u = carry
        y, Phi, Phi_sum = args

        zu = z + u
        fb = A(zu, Phi)
        zbar = zu + At((y - fb) / (Phi_sum + 1e-8), Phi)

        z_new = self._apply_denoiser(params, zbar - u, k, u=u)
        u_new = u - (zbar - z_new)
        return zbar, u_new


def make_admm_sci_step(denoise: DenoiseApply, tag: str,
                       **sigma_kw) -> AdmmSCI:
    return AdmmSCI(denoise=denoise, tag=tag, **sigma_kw)
