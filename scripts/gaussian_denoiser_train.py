"""Gaussian denoiser pretraining driver (upstream denoising scripts).

Rebuild of scripts/denoising/gaussian_dncnn_norm_denoise_yaping.py:78-147:
train a (spectrally normalized) DnCNN to denoise sigma-noised images with
MSE, the reference's CelebA 64x64 +-0.5-normalized recipe. Runs on a
CelebA directory when given, otherwise on synthetic texture images (smoke
mode). Spectral normalization (lip=1) is applied as the per-step parameter
transform from nets/sn.py.

Usage: python scripts/gaussian_denoiser_train.py [--datapath DIR]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synthetic_textures(n, size, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.linspace(0, 1, size), np.linspace(0, 1, size))
    out = []
    for _ in range(n):
        img = np.zeros((size, size), np.float32)
        for _ in range(6):
            fx, fy = rng.uniform(1, 12, 2)
            ph = rng.uniform(0, 2 * np.pi)
            img += rng.uniform(0.1, 0.5) * np.sin(
                2 * np.pi * (fx * xx + fy * yy) + ph)
        img = (img - img.min()) / (np.ptp(img) + 1e-6)
        out.append((img * 2 - 1)[..., None])  # +-1 normalized, (H, W, 1)
    return np.stack(out).astype(np.float32)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--datapath", default="")
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--batch", type=int, default=32)
    ap.add_argument("--steps", type=int, default=100)
    ap.add_argument("--noise_sigma", type=float, default=0.1)
    ap.add_argument("--lip", type=float, default=1.0)
    ap.add_argument("--layers", type=int, default=6)
    ap.add_argument("--lr", type=float, default=1e-4)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import optax
    from deqsci_tpu.nets.dncnn import DnCNN
    from deqsci_tpu.nets.sn import (init_sn_state, normalize_params,
                                    simplecnn_sigma_targets)

    if args.datapath and os.path.isdir(args.datapath):
        from deqsci_tpu.data.images import CelebaDataset
        ds = CelebaDataset(args.datapath, size=args.size, gray=True)
        data = np.stack([ds[i] for i in range(min(len(ds), 512))])
    else:
        print("no CelebA data; using synthetic textures (smoke mode)",
              flush=True)
        data = synthetic_textures(128, args.size)

    net = DnCNN(channels=1, num_layers=args.layers, use_bn=False)
    variables = net.init(jax.random.key(0),
                         jnp.zeros((1, args.size, args.size, 1)))
    params = variables["params"]

    use_sn = args.lip > 0
    targets = simplecnn_sigma_targets(args.lip, args.layers) if use_sn else {}
    sn_state = init_sn_state(jax.random.key(7), params, targets,
                             size=min(args.size, 40)) if use_sn else {}

    optimizer = optax.adam(args.lr)
    opt_state = optimizer.init(params)

    @jax.jit
    def train_step(params, sn_state, opt_state, x, key):
        eps = jax.random.normal(key, x.shape)

        def loss_fn(p, state):
            if use_sn:
                p_bar, state = normalize_params(p, state, targets,
                                                n_power_iterations=2)
            else:
                p_bar = p
            y = x + args.noise_sigma * eps
            recon = net.apply({"params": p_bar}, y)
            return jnp.mean((recon - x) ** 2), state

        (loss, sn_state), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, sn_state)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), sn_state, \
            opt_state, loss

    key = jax.random.key(1)
    rng = np.random.default_rng(0)
    for it in range(args.steps):
        idx = rng.choice(len(data), args.batch, replace=False)
        key, sub = jax.random.split(key)
        params, sn_state, opt_state, loss = train_step(
            params, sn_state, opt_state, jnp.asarray(data[idx]), sub)
        if it % 10 == 0:
            print(f"step {it} loss {float(loss):.6f}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
