"""Train the ``--sigma`` pretrained denoisers upstream ships as stripped
blobs (networks/provable/Pretrained_models/RealSN_DnCNN_noise{5,15,40}.pth).

Reference semantics being restored: video_sci_proxgrad.py:206-207 rewrites
``--loadpath`` to that Pretrained_models file whenever ``--sigma N`` is
passed; networks/provable/model/realSN_models.py:4-22 defines the 17-layer
conv-SN DnCNN those files hold; the upstream pretraining recipe is
scripts/denoising/gaussian_dncnn_norm_denoise_yaping.py (CelebA 64x64,
fixed-sigma Gaussian noise, MSE). None of the three .pth files (nor
CelebA) exists in this sandbox (.MISSING_LARGE_BLOBS), so the CLI's
``--sigma`` path has never had usable weights — this script closes it:

* corpus: 64x64 patches of the bundled benchmark gt frames (multi-scale,
  the only natural images here) + procedural textures;
* net: the zoo's 'RealSN_DnCNN' spec (17-layer BN DnCNN) so the saved
  param tree loads through the normal CLI path byte-for-byte;
* SN: lip**(1/17) per-layer conv spectral norm applied as the per-step
  parameter transform (nets/sn.py); the SAVED kernels are the normalized
  ones — mirroring the reference's eval semantics where the stored
  ``weight`` is the hook's normalized output (utils/spectral_norm.py:268);
* target: predict the noise (tag 'denoiser' -> the GAP map computes
  ``z - f(z)``, maps/gap_sci.py).

Saves a NATIVE checkpoint directory at the exact rewrite path (the
``..._noise{N}.pth`` name becomes a directory; the CLI's isdir branch
loads it), so ``--denoiser RealSN_DnCNN --sigma N --inference True`` now
works end to end.

Usage: python scripts/train_sigma_denoisers.py [--sigmas 5,15,40]
"""

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
REFERENCE = "/root/reference"


def corpus(seed=3):
    from deqsci_tpu.data.patches import build_patch_set
    from deqsci_tpu.data.sci_mat import SCITestDataset
    from scripts.gaussian_denoiser_train import synthetic_textures

    imgs = []
    for data in SCITestDataset(os.path.join(REFERENCE, "data/test_gray")):
        gt = np.asarray(data["gt"], np.float32)  # (H, W, F) in [0,1]
        imgs.extend(gt[..., i] for i in range(gt.shape[-1]))
    patches = build_patch_set(imgs, patch_size=64, stride=24,
                              scales=(1.0, 0.75, 0.5), seed=seed)
    tex = (synthetic_textures(256, 64, seed=seed) + 1.0) / 2.0  # [0,1]
    data = np.concatenate([patches, tex.astype(np.float32)], 0)
    rng = np.random.default_rng(seed)
    rng.shuffle(data)
    return data


def train_one(noise_level, data, steps, lip, lr, seed=0):
    import jax
    import jax.numpy as jnp
    import optax
    from deqsci_tpu.nets.sn import (init_sn_state, normalize_params,
                                    simplecnn_sigma_targets)
    from deqsci_tpu.zoo import build_denoiser

    spec = build_denoiser("RealSN_DnCNN")
    net = spec.module
    sigma = noise_level / 255.0
    variables = spec.init_variables(jax.random.key(seed))
    params, batch_stats = variables["params"], variables.get(
        "batch_stats", {})

    targets = simplecnn_sigma_targets(lip, num_layers=17)
    sn_state = init_sn_state(jax.random.key(seed + 7), params, targets)

    optimizer = optax.adam(
        optax.cosine_decay_schedule(lr, steps, alpha=0.1))
    opt_state = optimizer.init(params)

    @jax.jit
    def step(params, batch_stats, sn_state, opt_state, x, key):
        eps = jax.random.normal(key, x.shape, x.dtype)

        def loss_fn(p, stats, state):
            p_bar, state = normalize_params(p, state, targets,
                                            n_power_iterations=2)
            out, mut = net.apply(
                {"params": p_bar, "batch_stats": stats}, x + sigma * eps,
                train=True, mutable=["batch_stats"])
            return jnp.mean((out - sigma * eps) ** 2), \
                (mut["batch_stats"], state)

        (loss, (batch_stats, sn_state)), grads = jax.value_and_grad(
            loss_fn, has_aux=True)(params, batch_stats, sn_state)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return (optax.apply_updates(params, updates), batch_stats,
                sn_state, opt_state, loss)

    key = jax.random.key(seed + 1)
    rng = np.random.default_rng(seed)
    n_val = 256
    val = jnp.asarray(data[:n_val])
    train = data[n_val:]
    for it in range(steps):
        idx = rng.choice(len(train), 64, replace=False)
        key, sub = jax.random.split(key)
        params, batch_stats, sn_state, opt_state, loss = step(
            params, batch_stats, sn_state, opt_state,
            jnp.asarray(train[idx]), sub)
        if it % 200 == 0:
            print(f"  sigma={noise_level} step {it} "
                  f"loss {float(loss):.6f}", flush=True)

    # bake the normalized kernels (reference eval: stored weight = the
    # hook's last normalized output) and measure val PSNR
    p_bar, _ = normalize_params(params, sn_state, targets,
                                n_power_iterations=5)
    final = {"params": p_bar, "batch_stats": batch_stats}
    eps = jax.random.normal(jax.random.key(99), val.shape, val.dtype)
    den = val + sigma * eps - net.apply(final, val + sigma * eps)
    mse = float(jnp.mean((den - val) ** 2))
    noisy_psnr = -10 * np.log10(float(jnp.mean((sigma * eps) ** 2)))
    psnr = -10 * np.log10(mse)
    print(f"  sigma={noise_level}: val PSNR {psnr:.2f} dB "
          f"(noisy input: {noisy_psnr:.2f})", flush=True)
    return final, psnr


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--sigmas", default="5,15,40")
    ap.add_argument("--steps", type=int, default=1500)
    ap.add_argument("--lip", type=float, default=1.0)
    ap.add_argument("--lr", type=float, default=1e-3)
    ap.add_argument("--outdir",
                    default="networks/provable/Pretrained_models")
    args = ap.parse_args()

    from deqsci_tpu.io.checkpoint import CheckpointManager

    data = corpus()
    print(f"{len(data)} training patches", flush=True)
    outdir = os.path.join(REPO, args.outdir)
    os.makedirs(outdir, exist_ok=True)
    mgr = CheckpointManager(outdir)
    for s in (int(v) for v in args.sigmas.split(",")):
        print(f"=== RealSN_DnCNN_noise{s} ===", flush=True)
        final, psnr = train_one(s, data, args.steps, args.lip, args.lr)
        name = f"RealSN_DnCNN_noise{s}.pth"
        tgt = os.path.join(outdir, name)
        if os.path.isdir(tgt):
            shutil.rmtree(tgt)
        mgr.save(name, {"params": final, "epoch": 0,
                        "val_psnr": float(psnr)})
        print(f"saved {tgt}", flush=True)


if __name__ == "__main__":
    main()
