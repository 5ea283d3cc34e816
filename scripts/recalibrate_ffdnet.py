"""Recalibrate the demo FFDNet's BatchNorm running stats and re-evaluate.

The per-epoch SVD orthogonalization invalidates BN running averages; this
refreshes them with train-mode forward passes (no gradients), re-saves the
checkpoint, and re-runs the σ=25 validation plus the DE-GAP-FFDNet
benchmark protocol.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from deqsci_tpu.data.patches import batch_iterator, build_patch_set
    from deqsci_tpu.io.checkpoint import CheckpointManager
    from deqsci_tpu.nets.ffdnet import FFDNet
    from deqsci_tpu.train.denoiser import recalibrate_batch_stats
    from deqsci_tpu.train.metrics import psnr
    from scripts.train_ffdnet_demo import gather_gt_frames

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    path = os.path.join(repo, "models", "ffdnet_demo")
    snap = ocp.StandardCheckpointer().restore(os.path.abspath(path))
    variables = snap["params"]

    frames = gather_gt_frames()
    patches = build_patch_set(frames, patch_size=50, stride=15,
                              scales=(1.0, 0.85, 0.7), max_patches=60000)
    net = FFDNet(in_channels=1)

    val = patches[:64]

    def val_fn(v):
        sigma = jnp.full((len(val),), 25.0 / 255.0)
        noise = sigma[:, None, None, None] * jax.random.normal(
            jax.random.key(42), val.shape)
        noisy = jnp.asarray(val) + noise
        den = noisy - net.apply(v, noisy, sigma)
        return float(psnr(jnp.clip(den, 0, 1), jnp.asarray(val)))

    print(f"pre-recalibration val PSNR: {val_fn(variables):.2f} dB",
          flush=True)
    variables = recalibrate_batch_stats(
        net, variables, batch_iterator(patches[64:64 + 128 * 100], 128,
                                       shuffle=False))
    print(f"post-recalibration val PSNR: {val_fn(variables):.2f} dB",
          flush=True)

    mgr = CheckpointManager(os.path.join(repo, "models"))
    mgr.save("ffdnet_demo", {"params": jax.tree.map(np.asarray, variables),
                             "epoch": snap.get("epoch", 0)})
    print("re-saved models/ffdnet_demo", flush=True)

    from deqsci_tpu.data.sci_mat import SCITestDataset
    from deqsci_tpu.maps.gap_sci import make_gap_sci_step
    from deqsci_tpu.recon import make_reconstructor
    from deqsci_tpu.train.eval import evaluate_dataset

    step = make_gap_sci_step(lambda v, x, s: net.apply(v, x, s),
                             tag="ffdnet")
    recon = make_reconstructor(step, m=5, lam=1e-2, beta=1.0,
                               max_iter=180, tol=1e-5)
    summary = evaluate_dataset(
        recon, variables,
        SCITestDataset("/root/reference/data/test_gray"), verbose=True)
    print("DE-GAP-FFDNet (demo weights, train-on-test):",
          f"{summary['avg_psnr']:.2f} dB", flush=True)


if __name__ == "__main__":
    main()
