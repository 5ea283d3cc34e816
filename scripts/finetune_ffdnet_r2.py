"""Round-2 FFDNet fine-tune: small-sigma emphasis on the extended corpus.

Why: the 180-iteration flagship schedule decays sigma to ~1.25e-3 by the
end; the round-1 demo weights are not contractive at tiny sigma and the
GAP iteration diverges there (PARITY.md: 6.18 dB at 180 iters). Uniform
[0, 75]/255 sigma sampling (the Tassano kit default) barely trains that
regime, so this stage resamples sigma from a small-biased mixture
(train/denoiser.small_sigma_mixture) over patches of the extended
(500-clip) corpus, starting from the equilibrium-trained demo weights.

Writes models/ffdnet_smallsig. Follow with the equilibrium curriculum
(CLI training at --and_maxiters 120 then 180).

Usage: python scripts/finetune_ffdnet_r2.py [--epochs 6]
"""

import argparse
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def gather_frames(gt_dir, limit=None):
    from deqsci_tpu.data.sci_mat import load_mat
    frames = []
    names = sorted(os.listdir(gt_dir))
    if limit:
        names = names[:limit]
    for n in names:
        clip = load_mat(os.path.join(gt_dir, n), "gt")  # (H, W, 8), [0,1]
        for t in range(clip.shape[-1]):
            frames.append(np.asarray(clip[..., t], np.float32))
    return frames


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--epochs", type=int, default=6)
    ap.add_argument("--batch", type=int, default=128)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--clips", type=int, default=250,
                    help="clips to draw patches from (memory bound)")
    ap.add_argument("--init", default="ffdnet_demo_ft")
    ap.add_argument("--out", default="ffdnet_smallsig")
    ap.add_argument("--gt", default=os.path.join(REPO,
                                                 "data/sci_train_r2x/gt"))
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    from deqsci_tpu.data.patches import batch_iterator, build_patch_set
    from deqsci_tpu.io.checkpoint import CheckpointManager
    from deqsci_tpu.nets.ffdnet import FFDNet
    from deqsci_tpu.train.denoiser import (recalibrate_batch_stats,
                                           small_sigma_mixture,
                                           train_ffdnet)
    from deqsci_tpu.train.metrics import psnr

    frames = gather_frames(args.gt, limit=args.clips)
    print(f"{len(frames)} frames from {args.gt}", flush=True)
    patches = build_patch_set(frames, patch_size=50, stride=31,
                              scales=(1.0, 0.8), max_patches=110000)
    print(f"{len(patches)} patches", flush=True)
    val = patches[:64]
    train = patches[64:]

    net = FFDNet(in_channels=1)
    mgr = CheckpointManager(os.path.join(REPO, "models"))
    snap = mgr.restore(args.init, with_optimizer=False)
    variables = snap["params"]
    print(f"init from models/{args.init}", flush=True)

    def val_fn(v, sig):
        sigma = jnp.full((len(val),), sig)
        noise = sigma[:, None, None, None] * jax.random.normal(
            jax.random.key(42), val.shape)
        noisy = jnp.asarray(val) + noise
        den = noisy - net.apply(v, noisy, sigma)
        return float(psnr(jnp.clip(den, 0, 1), jnp.asarray(val)))

    for sig in (2.0, 10.0, 25.0):
        print(f"pre  val PSNR @ sigma={sig}/255: "
              f"{val_fn(variables, sig / 255.0):.2f} dB", flush=True)

    t0 = time.time()
    epochs = (batch_iterator(train, args.batch, seed=100 + e)
              for e in range(args.epochs))
    variables = train_ffdnet(
        net, variables, epochs, lr=args.lr, orthogonalize=False,
        sigma_sampler=small_sigma_mixture(),
        val_fn=lambda v: val_fn(v, 25.0 / 255.0), log_every=400)
    variables = recalibrate_batch_stats(
        net, variables,
        batch_iterator(train[:args.batch * 80], args.batch, shuffle=False))
    print(f"wall {time.time() - t0:.0f}s", flush=True)
    for sig in (2.0, 10.0, 25.0):
        print(f"post val PSNR @ sigma={sig}/255: "
              f"{val_fn(variables, sig / 255.0):.2f} dB", flush=True)

    mgr.save(args.out, {"params": jax.tree.map(np.asarray, variables),
                        "epoch": args.epochs - 1})
    print(f"saved models/{args.out}", flush=True)


if __name__ == "__main__":
    main()
