"""Two-phase precision: PSNR + throughput vs split point (DE-GAP-CNN).

Phase 1 runs the GAP step with bf16 convs for W call indices, phase 2
re-converges with the production HIGH-precision map for the remaining
100 - W budget (same total map calls as single-phase). Sweeps W.

Usage: python scripts/twophase_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REFERENCE = "/root/reference"


def main():
    import jax.numpy as jnp
    from deqsci_tpu.data.sci_mat import SCITestDataset
    from deqsci_tpu.io.torch_ckpt import convert_dncnn
    from deqsci_tpu.maps.gap_sci import make_gap_sci_step
    from deqsci_tpu.nets.dncnn import DnCNN
    from deqsci_tpu.recon import make_reconstructor
    from deqsci_tpu.train.eval import FIRST_SNAPSHOT_ONLY, snapshots_of
    from deqsci_tpu.train.metrics import psnr

    variables, _ = convert_dncnn(os.path.join(REFERENCE, "models/cnn.ckpt"))
    net_hi = DnCNN(num_layers=4, use_bn=False, precision="high")
    net_fast = DnCNN(num_layers=4, use_bn=False, precision="default")
    step_hi = make_gap_sci_step(lambda p, x: net_hi.apply(p, x),
                                tag="denoiser")
    step_fast = make_gap_sci_step(lambda p, x: net_fast.apply(p, x),
                                  tag="denoiser")

    ds = SCITestDataset(os.path.join(REFERENCE, "data/test_gray"))
    clips = []
    for data in ds:
        meas = snapshots_of(data["meas"])
        if any(pat in data["file"] for pat in FIRST_SNAPSHOT_ONLY):
            meas = meas[:1]
        clips.append((data["file"], jnp.asarray(meas),
                      jnp.asarray(data["mask"]), np.asarray(data["gt"])))

    def evaluate(recon, label):
        scores, total_t, frames = [], 0.0, 0
        for fname, meas, mask, gt in clips:
            float(jnp.sum(recon(variables, meas, mask)))
        for fname, meas, mask, gt in clips:
            t0 = time.perf_counter()
            out = recon(variables, meas, mask)
            float(jnp.sum(out))
            total_t += time.perf_counter() - t0
            frames += out.shape[0] * out.shape[-1]
            o = np.clip(np.asarray(out), 0, 1)
            ps = [float(psnr(jnp.asarray(o[fi]),
                             jnp.asarray(gt[..., fi * 8:(fi + 1) * 8])))
                  for fi in range(out.shape[0])]
            scores.append(np.mean(ps))
        print(f"{label:16s} avg {np.mean(scores):.3f} dB "
              f"({', '.join(f'{s:.3f}' for s in scores)})  "
              f"{frames / total_t:.1f} frames/s", flush=True)

    evaluate(make_reconstructor(step_hi, m=5, lam=1e-2, beta=1.0,
                                max_iter=100, tol=1e-5), "single high")
    for w in [50, 70, 80, 90]:
        recon = make_reconstructor(step_hi, m=5, lam=1e-2, beta=1.0,
                                   max_iter=100, tol=1e-5,
                                   warmup_step=step_fast, warmup_iters=w)
        evaluate(recon, f"bf16x{w}+high")


if __name__ == "__main__":
    main()
