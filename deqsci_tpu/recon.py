"""Whole-clip SCI reconstruction: one jitted XLA program per clip.

The reference reconstructs a clip with a sequential Python loop over
snapshots, each solve itself syncing to host every Anderson iteration
(training/sci_equilibrium_training.py:171-181 and
solvers/new_equilibrium_utils_yaping.py:184). Here the per-snapshot DEQ
solve is ``vmap``-ped over the snapshot axis, so a whole clip compiles to a
single program with no host round-trips. The solvers freeze converged lanes
(fp/anderson.py), so every snapshot runs exactly the iterate count it would
have run solo — batched execution is bit-equivalent modulo XLA reduction
order.
"""

from __future__ import annotations

from functools import partial
from typing import Any, Callable

import jax
import jax.numpy as jnp

from deqsci_tpu.fp.anderson import anderson
from deqsci_tpu.fp.deq import make_deq
from deqsci_tpu.ops.sensing import initial_point, phi_sum


def make_reconstructor(step: Callable, solver: Callable = anderson,
                       init_fn: Callable = initial_point,
                       output_fn: Callable = lambda z: z,
                       warmup_step: Callable = None,
                       warmup_iters: int = 0,
                       **solver_kwargs):
    """Build ``recon(params, meas, Phi) -> frames``.

    ``meas``: (S, H, W) snapshots of one clip; ``Phi``: (H, W, T) shared
    mask. Returns (S, H, W, T) reconstructed frames. Each snapshot is an
    independent bsz-1 DEQ solve, exactly as the reference's per-``fi`` loop.

    ``init_fn(y, Phi)`` builds the initial carry (``initial_point_admm``
    for the two-tensor ADMM carry) and ``output_fn`` extracts the frame
    estimate from the final carry (``lambda c: c[0]`` for ADMM).

    Two-phase precision (opt-in throughput mode): when ``warmup_step`` is
    given, the first ``warmup_iters`` call indices run that step (e.g. the
    same map with bf16 convs) under the same solver, then the solve
    re-converges with the exact ``step`` for the remaining budget. Call
    indices continue across the phase boundary, so per-call state (the
    FFDNet sigma schedule) sees exactly the reference's index sequence;
    the total number of map calls equals the single-phase count. The
    Anderson history restarts at the boundary, so iterates differ from the
    single-phase trajectory — quality parity is measured, not bitwise
    (scripts/twophase_probe.py).
    """
    total_iters = solver_kwargs.get("max_iter", 50)
    if warmup_step is not None and warmup_iters > 0:
        # Anderson always consumes call indices {0, 1} seeding its history,
        # so a warmup shorter than 2 cannot hold the index accounting.
        assert 2 <= warmup_iters < total_iters, (warmup_iters, total_iters)
        shifted = lambda p, z, k, a: step(p, z, k + warmup_iters, a)
        main_kwargs = dict(solver_kwargs, max_iter=total_iters - warmup_iters)
        deq = make_deq(shifted, solver=solver, **main_kwargs)
        warm_kwargs = dict(solver_kwargs, max_iter=warmup_iters, tol=0.0)
        warm_kwargs.pop("record_trace", None)

        def presolve(params, z0, args):
            fw = lambda z, k: warmup_step(params, z, k, args)
            z1, _ = solver(fw, z0, **warm_kwargs)
            return z1
    else:
        deq = make_deq(step, solver=solver, **solver_kwargs)
        presolve = None

    def recon_one(params: Any, y: jnp.ndarray, Phi: jnp.ndarray,
                  Phi_s: jnp.ndarray) -> jnp.ndarray:
        yb, Phib, Psb = y[None], Phi[None], Phi_s[None]
        z0 = init_fn(yb, Phib)
        if presolve is not None:
            z0 = presolve(params, z0, (yb, Phib, Psb))
        out = output_fn(deq(params, z0, (yb, Phib, Psb)))
        return out[0]

    @partial(jax.jit, static_argnums=())
    def recon(params: Any, meas: jnp.ndarray, Phi: jnp.ndarray) -> jnp.ndarray:
        Phi_s = phi_sum(Phi)
        return jax.vmap(recon_one, in_axes=(None, 0, None, None))(
            params, meas, Phi, Phi_s)

    @partial(jax.jit, static_argnums=())
    def recon_multi(params: Any, meas: jnp.ndarray,
                    Phi: jnp.ndarray) -> jnp.ndarray:
        """Per-lane masks: meas (B, H, W) with Phi (B, H, W, T) — lets
        snapshots from *different clips* (different masks) batch into one
        XLA program. Throughput path: a whole benchmark suite is one solve."""
        Phi_s = phi_sum(Phi)
        return jax.vmap(recon_one, in_axes=(None, 0, 0, 0))(
            params, meas, Phi, Phi_s)

    @partial(jax.jit, static_argnums=())
    def recon_warm(params: Any, meas: jnp.ndarray,
                   Phi: jnp.ndarray) -> jnp.ndarray:
        """Sequential warm start: snapshot i's solve starts from snapshot
        i-1's final carry. Opt-in deviation from the reference protocol
        (which always starts from At(y, Phi)). Measured on traffic with
        DE-GAP-CNN: quality -0.14 dB, wall ~neutral — the benchmark solves
        never reach tol within the iteration budget, so no early exit
        fires. Useful only for workloads where solves do converge early.

        The raw deq output (which may be a multi-tensor carry, e.g. the
        ADMM (z, u) pair) is threaded as the scan carry; ``output_fn``
        only extracts the stacked per-snapshot frames. With a two-phase
        ``warmup_step`` configured, each snapshot's solve runs the warmup
        presolve from the warm carry first (the main-phase deq is built
        shifted by ``warmup_iters``, so skipping presolve would silently
        truncate the budget and misalign the sigma schedule)."""
        Phi_s = phi_sum(Phi)
        Phib, Psb = Phi[None], Phi_s[None]

        def body(carry, y):
            a = (y[None], Phib, Psb)
            if presolve is not None:
                carry = presolve(params, carry, a)
            out = deq(params, carry, a)
            return out, output_fn(out)[0]

        z0 = init_fn(meas[0][None], Phib)
        _, frames = jax.lax.scan(body, z0, meas)
        return frames

    recon.multi = recon_multi
    recon.warm = recon_warm
    return recon


def _dihedral_fwd(x: jnp.ndarray, k: int, flip: bool, axes) -> jnp.ndarray:
    if k:
        x = jnp.rot90(x, k, axes)
    if flip:
        x = jnp.flip(x, axes[0])
    return x


def _dihedral_inv(x: jnp.ndarray, k: int, flip: bool, axes) -> jnp.ndarray:
    if flip:
        x = jnp.flip(x, axes[0])
    if k:
        x = jnp.rot90(x, -k, axes)
    return x


def make_self_ensemble(recon: Callable, batched: bool = False) -> Callable:
    """Dihedral test-time self-ensemble around a reconstructor.

    The SCI forward model ``y = sum_t Phi_t * x_t`` is elementwise in the
    spatial dims, so it is *exactly* equivariant under any spatial dihedral
    transform applied jointly to (meas, Phi): each transformed problem is
    the same physical reconstruction posed in a rotated/flipped frame. A
    learned CNN denoiser is NOT equivariant, so the 8 solves differ only
    through denoiser bias — averaging them cancels part of it (the classic
    geometric self-ensemble of restoration nets). Pure inference-time
    lever, no reference analog (the protocol number stays the plain
    ``recon``); opt-in via ``--self_ensemble``.

    Non-square inputs use the 4 shape-preserving transforms (180-degree
    rotation x flip); square inputs use all 8. Each transformed solve
    reuses the wrapped reconstructor's cached executable (same shapes).

    ``batched=True`` (VERDICT r4 stretch #8) solves all 8 transformed
    problems in ONE XLA program via the wrapped reconstructor's per-lane
    ``recon.multi`` path (each transform has its own mask, so the
    per-lane-Phi form is exactly what self-ensembling needs) instead of a
    sequential Python loop — trading the 8x dispatch for one wide vmapped
    solve. Lane-frozen Anderson means every transformed problem still
    runs exactly its solo iterate count; numerics differ from the
    sequential path only by XLA reduction order.
    """

    def _transforms(H, W):
        ks = (0, 1, 2, 3) if H == W else (0, 2)
        return [(k, flip) for k in ks for flip in (False, True)]

    def recon_se(params: Any, meas: jnp.ndarray,
                 Phi: jnp.ndarray) -> jnp.ndarray:
        acc = None
        for k, flip in _transforms(meas.shape[1], meas.shape[2]):
            mg = _dihedral_fwd(meas, k, flip, (1, 2))
            Pg = _dihedral_fwd(Phi, k, flip, (0, 1))
            out = _dihedral_inv(recon(params, mg, Pg), k, flip, (1, 2))
            acc = out if acc is None else acc + out
        return acc / len(_transforms(meas.shape[1], meas.shape[2]))

    def recon_se_batched(params: Any, meas: jnp.ndarray,
                         Phi: jnp.ndarray) -> jnp.ndarray:
        S = meas.shape[0]
        tfs = _transforms(meas.shape[1], meas.shape[2])
        megs = jnp.concatenate(
            [_dihedral_fwd(meas, k, f, (1, 2)) for k, f in tfs], axis=0)
        Pgs = jnp.concatenate(
            [jnp.broadcast_to(_dihedral_fwd(Phi, k, f, (0, 1))[None],
                              (S,) + Phi.shape) for k, f in tfs], axis=0)
        out = recon.multi(params, megs, Pgs)  # (len(tfs)*S, H, W, T)
        acc = None
        for i, (k, f) in enumerate(tfs):
            o = _dihedral_inv(out[i * S:(i + 1) * S], k, f, (1, 2))
            acc = o if acc is None else acc + o
        return acc / len(tfs)

    return recon_se_batched if batched else recon_se
