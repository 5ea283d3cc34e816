"""Denoiser pretraining: generic noise2clean + the FFDNet recipe.

Rebuilds two reference subsystems:

* ``train_denoiser`` — training/denoiser_training.py:25-125: per batch
  ``y = x + sigma*eps``; MSE(net(y), x) for direct denoisers or
  MSE(net(y), eps*sigma) for noise-predicting ones; Adam; periodic ckpt.
* ``train_ffdnet`` — networks/ffdnet/train.py:36-234 (Tassano kit):
  per-batch random sigma in [0, 75]/255, FFDNet predicts the noise,
  ``MSE(out, noise)/2`` loss, optional per-epoch SVD orthogonalization of
  all intermediate 3x3 conv kernels (utils.py:196-257: replace each
  kernel's matrix factor by the nearest orthonormal matrix U V^T).
"""

from __future__ import annotations

from typing import Callable, Dict, Iterable, Optional

import jax
import jax.numpy as jnp
import numpy as np
import optax

from deqsci_tpu.train.metrics import psnr


def svd_orthogonalization(params: Dict) -> Dict:
    """Replace every conv kernel, reshaped (kh*kw*ci, co), by its nearest
    semi-orthogonal factor U V^T — the reference applies this to every Conv
    layer with no shape exclusions (networks/ffdnet/utils.py:196-225; the
    HWIO flatten order here matches its permute(2,3,1,0) flatten)."""
    def orth(leaf_path, kernel):
        if kernel.ndim != 4:
            return kernel
        kh, kw, ci, co = kernel.shape
        mat = kernel.reshape(kh * kw * ci, co)
        u, _, vt = jnp.linalg.svd(mat, full_matrices=False)
        return (u @ vt).reshape(kernel.shape)

    return jax.tree_util.tree_map_with_path(orth, params)


def make_denoiser_train_step(apply_fn: Callable, optimizer,
                             noise_sigma: float,
                             residual: bool = False):
    """Generic pretraining step: fixed sigma, noise2clean (or noise) MSE."""

    def loss_fn(params, x, eps):
        y = x + noise_sigma * eps
        out = apply_fn(params, y)
        target = noise_sigma * eps if residual else x
        return jnp.mean((out - target) ** 2)

    @jax.jit
    def step(params, opt_state, x, key):
        eps = jax.random.normal(key, x.shape, x.dtype)
        loss, grads = jax.value_and_grad(loss_fn)(params, x, eps)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    return step


def small_sigma_mixture(sigma_max=75.0 / 255.0, frac_small=0.5):
    """Sigma sampler emphasizing tiny noise levels: with prob
    ``frac_small`` draw ``sigma_max * u^3`` (density ~sigma^{-2/3} near 0),
    else uniform — the reference's uniform [0, 75]/255
    (networks/ffdnet/train.py) gives tiny sigmas almost no mass, yet the
    DE-GAP schedule spends iterations ~47..180 below 15/255, where an
    undertrained denoiser stops being contractive and the 180-iteration
    flagship solve diverges (PARITY.md round 1)."""

    def sample(key, n, dtype):
        k1, k2, k3 = jax.random.split(key, 3)
        u = jax.random.uniform(k1, (n,), dtype)
        uni = jax.random.uniform(k2, (n,), dtype, 0.0, sigma_max)
        small = sigma_max * u ** 3
        pick = jax.random.bernoulli(k3, frac_small, (n,))
        return jnp.where(pick, small, uni)

    return sample


def make_ffdnet_train_step(net, optimizer,
                           sigma_range=(0.0, 75.0 / 255.0),
                           sigma_sampler=None):
    """FFDNet step: per-sample random sigma, predict the noise.

    Trains BatchNorm properly: batch statistics in the forward pass,
    running averages threaded through as mutable state (torch-equivalent
    train/eval semantics). ``sigma_sampler(key, n, dtype)`` overrides the
    uniform sigma draw (see :func:`small_sigma_mixture`)."""

    def loss_fn(params, batch_stats, x, eps, sigma):
        noise = sigma[:, None, None, None] * eps
        out, mutated = net.apply(
            {"params": params, "batch_stats": batch_stats},
            x + noise, sigma, train=True, mutable=["batch_stats"])
        return jnp.mean((out - noise) ** 2) / 2.0, mutated["batch_stats"]

    @jax.jit
    def step(params, batch_stats, opt_state, x, key):
        k1, k2 = jax.random.split(key)
        eps = jax.random.normal(k1, x.shape, x.dtype)
        if sigma_sampler is not None:
            sigma = sigma_sampler(k2, x.shape[0], x.dtype)
        else:
            sigma = jax.random.uniform(k2, (x.shape[0],), x.dtype,
                                       sigma_range[0], sigma_range[1])
        (loss, batch_stats), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats, x, eps, sigma)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), batch_stats,
                opt_state, loss)

    return step


def recalibrate_batch_stats(net, variables: Dict, batches: Iterable,
                            sigma_range=(0.0, 75.0 / 255.0),
                            seed: int = 123) -> Dict:
    """Refresh BatchNorm running averages with forward passes in train mode
    (no gradient). Needed after parameter transforms (SVD orthogonalization)
    invalidate the statistics the running averages were tracking."""
    params = variables["params"]
    batch_stats = variables["batch_stats"]
    key = jax.random.key(seed)

    @jax.jit
    def fwd(batch_stats, x, key):
        k1, k2 = jax.random.split(key)
        eps = jax.random.normal(k1, x.shape, x.dtype)
        sigma = jax.random.uniform(k2, (x.shape[0],), x.dtype,
                                   sigma_range[0], sigma_range[1])
        _, mutated = net.apply(
            {"params": params, "batch_stats": batch_stats},
            x + sigma[:, None, None, None] * eps, sigma,
            train=True, mutable=["batch_stats"])
        return mutated["batch_stats"]

    for x in batches:
        key, sub = jax.random.split(key)
        batch_stats = fwd(batch_stats, jnp.asarray(x), sub)
    return {"params": params, "batch_stats": batch_stats}


def train_ffdnet(net, variables: Dict, patch_epochs: Iterable,
                 *, lr: float = 1e-3, orthogonalize: bool = True,
                 val_fn: Optional[Callable] = None,
                 log_every: int = 50, sigma_sampler=None,
                 writer=None, val_images: Optional[np.ndarray] = None,
                 val_sigma: float = 25.0 / 255.0) -> Dict:
    """Run the FFDNet pretraining loop over an iterable of epochs, each an
    iterable of (N, p, p, 1) numpy batches. ``variables`` is the full flax
    tree {'params', 'batch_stats'}; returns the trained tree.

    ``writer`` (tensorboardX SummaryWriter) gets the reference trainer's
    scalars ('loss', 'PSNR on validation data') and per-epoch image grids
    of clean/noisy/reconstructed ``val_images`` (networks/ffdnet/
    train.py:169-216 semantics)."""
    params = variables["params"]
    batch_stats = variables["batch_stats"]
    optimizer = optax.adam(lr)
    opt_state = optimizer.init(params)
    step = make_ffdnet_train_step(net, optimizer,
                                  sigma_sampler=sigma_sampler)
    key = jax.random.key(0)
    it = 0
    for epoch, batches in enumerate(patch_epochs):
        for x in batches:
            key, sub = jax.random.split(key)
            params, batch_stats, opt_state, loss = step(
                params, batch_stats, opt_state, jnp.asarray(x), sub)
            if it % log_every == 0:
                print(f"[ffdnet] epoch {epoch} it {it} "
                      f"loss {float(loss):.6f}", flush=True)
                if writer is not None:
                    writer.add_scalar("loss", float(loss), it)
            it += 1
        if orthogonalize:
            params = svd_orthogonalization(params)
        if val_fn is not None:
            val_psnr = val_fn({"params": params,
                               "batch_stats": batch_stats})
            print(f"[ffdnet] epoch {epoch} val PSNR {val_psnr:.2f} dB",
                  flush=True)
            if writer is not None:
                writer.add_scalar("PSNR on validation data", val_psnr,
                                  epoch)
        if writer is not None and val_images is not None:
            from deqsci_tpu.utils.logging import log_image_grid
            v = {"params": params, "batch_stats": batch_stats}
            clean = jnp.asarray(val_images)
            sig = jnp.full((clean.shape[0],), val_sigma, clean.dtype)
            noise = val_sigma * jax.random.normal(jax.random.key(7),
                                                  clean.shape, clean.dtype)
            noisy = clean + noise
            recon = jnp.clip(noisy - net.apply(v, noisy, sig), 0, 1)
            if epoch == 0:
                log_image_grid(writer, "Clean validation images",
                               np.asarray(clean)[..., 0], epoch)
                log_image_grid(writer, "Noisy validation images",
                               np.clip(np.asarray(noisy), 0, 1)[..., 0],
                               epoch)
            log_image_grid(writer, "Reconstructed validation images",
                           np.asarray(recon)[..., 0], epoch)
    return {"params": params, "batch_stats": batch_stats}
