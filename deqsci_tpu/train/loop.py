"""End-to-end equilibrium training: optax step, NaN-reset, best-ckpt loop.

TPU rebuild of ``train_solver_sci`` (training/sci_equilibrium_training.py:28-150)
and the reference's Adam + StepLR recipe (video_sci_proxgrad.py:201-202):

* one jitted train step: no-grad init point, DEQ forward (IFT backward),
  mean-MSE loss, Adam update — optionally sharded over a (data, frame) mesh
  (gradient psum inserted by XLA);
* StepLR(step_size, gamma) as a per-epoch learning-rate schedule via
  ``optax.inject_hyperparams``;
* the reference's failure-recovery mechanism: on NaN loss (or loss explosion
  ``(prev-cur)/prev < -10``) abort the epoch and restore the last checkpoint
  including optimizer state (lines 46-49, 70-73, 137-138);
* periodic full-test-set eval keeping ``best`` state (lines 105-130).
"""

from __future__ import annotations

import time
from dataclasses import dataclass
from typing import Any, Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deqsci_tpu.ops.sensing import initial_point, phi_sum
from deqsci_tpu.train.metrics import psnr


def steplr(base_lr: float, step_size: int, gamma: float):
    """StepLR-equivalent: lr(epoch) = base * gamma**(epoch // step_size)."""
    def lr_for_epoch(epoch: int) -> float:
        return base_lr * (gamma ** (epoch // step_size))
    return lr_for_epoch


def make_optimizer(base_lr: float = 1e-4, grad_clip: float = 0.0):
    """Adam with injected lr (StepLR support). ``grad_clip`` > 0 adds
    global-norm clipping — not part of the reference recipe (which has no
    clipping), but necessary for long-horizon equilibrium training where
    the IFT system (I - J) turns near-singular and gradients spike
    (scripts/ffdnet_curriculum.py); off by default."""
    if grad_clip and grad_clip > 0:
        def tx(learning_rate):
            return optax.chain(optax.clip_by_global_norm(grad_clip),
                               optax.adam(learning_rate))
        return optax.inject_hyperparams(tx)(learning_rate=base_lr)
    return optax.inject_hyperparams(optax.adam)(learning_rate=base_lr)


@dataclass
class TrainState:
    params: Any
    opt_state: Any
    epoch: int = 0

    def snapshot(self) -> Dict[str, Any]:
        return {"params": jax.tree.map(np.asarray, self.params),
                "opt_state": jax.tree.map(
                    lambda x: np.asarray(x) if hasattr(x, "shape") else x,
                    self.opt_state),
                "epoch": self.epoch}


def make_train_step(deq: Callable, optimizer,
                    init_fn: Callable = initial_point,
                    output_fn: Callable = lambda z: z) -> Callable:
    """Build the jitted train step.

    ``deq(params, z0, (y, Phi, Phi_sum))`` is the DEQ forward with IFT
    gradients. The batch is ``(gt, y, Phi)``, all device arrays; with
    sharded inputs the gradient all-reduce is inserted by XLA.
    ``init_fn``/``output_fn`` generalize to non-trivial carries (ADMM).
    """

    def loss_fn(params, gt, y, Phi, ps):
        z0 = jax.lax.stop_gradient(init_fn(y, Phi))
        rec = output_fn(deq(params, z0, (y, Phi, ps)))
        return jnp.mean((rec - gt) ** 2), rec

    @jax.jit
    def train_step(params, opt_state, gt, y, Phi):
        ps = phi_sum(Phi)
        (loss, rec), grads = jax.value_and_grad(loss_fn, has_aux=True)(
            params, gt, y, Phi, ps)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        params = optax.apply_updates(params, updates)
        batch_psnr = psnr(jnp.clip(rec, 0, 1), gt)
        return params, opt_state, loss, batch_psnr

    return train_step


def train_solver_sci(deq: Callable, params, dataset, *,
                     n_epochs: int = 80, base_lr: float = 1e-4,
                     sched_step: int = 10, lr_gamma: float = 0.9,
                     start_epoch: int = 0,
                     eval_fn: Optional[Callable] = None,
                     save_fn: Optional[Callable] = None,
                     save_every_n_steps: int = 50,
                     print_every_n_steps: int = 1,
                     explosion_threshold: float = -10.0,
                     init_fn: Callable = initial_point,
                     output_fn: Callable = lambda z: z,
                     grad_clip: float = 0.0,
                     skip_loss_threshold: float = 0.0,
                     ema_decay: float = 0.0,
                     writer=None) -> Dict[str, Any]:
    """The full training loop with NaN-reset-from-checkpoint semantics.

    ``dataset`` yields dicts {gt, meas, mask} (numpy, unbatched);
    ``eval_fn(params) -> avg_psnr`` runs the test protocol;
    ``save_fn(tag, state_snapshot)`` persists checkpoints.

    ``skip_loss_threshold`` > 0 discards the parameter update of any batch
    whose loss exceeds it (framework extension, off by default = reference
    semantics). Rationale: on a hard sample the 180-iteration forward
    solve can diverge without NaN-ing — the loss spikes ~1000x and the
    gradient, though clipped, points nowhere useful; dropping the update
    is strictly safer than stepping on it.

    ``ema_decay`` > 0 (framework extension, off by default) additionally
    tracks an exponential moving average of the weights, evaluates it at
    every eval point alongside the raw weights, and lets it compete for
    the ``best`` checkpoint. Near a stability cliff (180-iteration
    equilibrium polish) the EMA smooths the oscillation of raw SGD
    iterates across the cliff; the saved ``best`` snapshot carries
    whichever weights scored higher.

    ``deq`` may also be a dict ``{max_iter: deq_fn}`` (mixed-horizon
    training, VERDICT r4 #5): each batch samples one horizon uniformly
    (deterministic np RNG), training the SAME weights to be a fixed point
    at every budget in the set rather than only at one — the lever for
    flattening a quality-vs-iterations tail that decays past the single
    training horizon. One XLA program per distinct horizon.
    """
    optimizer = make_optimizer(base_lr, grad_clip=grad_clip)
    opt_state = optimizer.init(params)
    if isinstance(deq, dict):
        horizon_steps = {h: make_train_step(d, optimizer, init_fn=init_fn,
                                            output_fn=output_fn)
                         for h, d in deq.items()}
        horizons = sorted(horizon_steps)
        horizon_rng = np.random.default_rng(971 + start_epoch)
        train_step = None
    else:
        horizon_steps = None
        train_step = make_train_step(deq, optimizer, init_fn=init_fn,
                                     output_fn=output_fn)
    lr_of = steplr(base_lr, sched_step, lr_gamma)

    state = TrainState(params, opt_state, start_epoch)
    last_good = state.snapshot()
    best_psnr = -np.inf
    cur_nimg = 0
    start_time = time.time()
    reset_flag = False

    ema_params = None
    if ema_decay and ema_decay > 0:
        ema_params = jax.tree.map(jnp.asarray, params)

        @jax.jit
        def _ema_step(ema, p):
            return jax.tree.map(
                lambda e, q: ema_decay * e + (1.0 - ema_decay) * q, ema, p)

    def run_evals(tag_epoch):
        """Evaluate raw (and EMA) weights; update best + save. Returns the
        raw-weights score (callers' explosion logic keys off raw)."""
        nonlocal best_psnr
        cur = eval_fn(state.params)
        if cur is not None and cur > best_psnr:
            best_psnr = cur
            if save_fn is not None:
                save_fn("best", state.snapshot())
        if ema_params is not None:
            cur_ema = eval_fn(ema_params)
            print(f"EMA eval: {cur_ema:.2f} dB (raw {cur:.2f})", flush=True)
            if cur_ema is not None and cur_ema > best_psnr:
                best_psnr = cur_ema
                snap = state.snapshot()
                snap["params"] = jax.tree.map(np.asarray, ema_params)
                if save_fn is not None:
                    save_fn("best", snap)
        return cur

    for epoch in range(start_epoch, n_epochs):
        if reset_flag:
            print("NaN/explosion reset: restoring last checkpoint",
                  flush=True)
            state = TrainState(
                jax.tree.map(jnp.asarray, last_good["params"]),
                jax.tree.map(
                    lambda x: jnp.asarray(x) if hasattr(x, "shape") else x,
                    last_good["opt_state"]),
                epoch)
            if ema_params is not None:
                ema_params = jax.tree.map(jnp.asarray, last_good["params"])
        reset_flag = False

        # StepLR: set this epoch's lr inside the injected hyperparams.
        state.opt_state.hyperparams["learning_rate"] = jnp.asarray(
            lr_of(epoch), jnp.float32)

        previous_loss = None
        loss_v = np.nan
        for ii, sample in enumerate(dataset):
            gt = jnp.asarray(sample["gt"])
            y = jnp.asarray(sample["meas"])
            Phi = jnp.asarray(sample["mask"])
            if gt.ndim == 3:  # unbatched sample -> bsz 1
                gt, y, Phi = gt[None], y[None], Phi[None]
            cur_nimg += gt.shape[0]

            if horizon_steps is not None:
                h = horizons[int(horizon_rng.integers(len(horizons)))]
                step_fn = horizon_steps[h]
            else:
                step_fn = train_step
            p, o, loss, batch_psnr = step_fn(
                state.params, state.opt_state, gt, y, Phi)
            loss_v = float(loss)
            if np.isnan(loss_v):
                print("Loss is nan!", flush=True)
                reset_flag = True
                break
            if skip_loss_threshold and loss_v > skip_loss_threshold:
                print(f"skipped outlier batch (loss {loss_v:.4f} > "
                      f"{skip_loss_threshold})", flush=True)
            else:
                state.params, state.opt_state = p, o
                if ema_params is not None:
                    ema_params = _ema_step(ema_params, state.params)
            if ii == 0:
                previous_loss = loss_v

            if writer is not None:
                wall = time.time() - start_time
                writer.add_scalar("main/PSNR", float(batch_psnr),
                                  global_step=cur_nimg, walltime=wall)
                writer.add_scalar("main/loss", loss_v,
                                  global_step=cur_nimg, walltime=wall)
                writer.add_scalar("config/lr", lr_of(epoch),
                                  global_step=cur_nimg, walltime=wall)
                writer.add_scalar("main/best_PSNR", best_psnr,
                                  global_step=cur_nimg, walltime=wall)

            if ii % print_every_n_steps == 0:
                print(f"Epoch: {epoch} Step: {ii} Loss: {loss_v:.6f} "
                      f"PSNR: {float(batch_psnr):.2f} dB "
                      f"best PSNR (test): {best_psnr:.2f} dB "
                      f"lr: {lr_of(epoch):.8f}", flush=True)

            if eval_fn is not None and (ii + 1) % save_every_n_steps == 0:
                run_evals(epoch)

        if previous_loss is not None and not np.isnan(loss_v) and \
                previous_loss != 0 and \
                (previous_loss - loss_v) / previous_loss < explosion_threshold:
            reset_flag = True
        if np.isnan(loss_v):
            reset_flag = True

        if not reset_flag:
            state.epoch = epoch
            last_good = state.snapshot()
            if save_fn is not None:
                save_fn(f"epoch_{epoch}", last_good)
        if eval_fn is not None:
            # the reference's epoch-end test pass discards its score
            # (sci_equilibrium_training.py:149-150); here it also feeds
            # the best-checkpoint tracker — strictly better capture.
            # After a reset the eval still runs (reference behavior) but
            # must not crown diverged weights.
            if reset_flag:
                eval_fn(state.params)
            else:
                run_evals(epoch)

    return {"params": state.params, "opt_state": state.opt_state,
            "best_psnr": best_psnr}
