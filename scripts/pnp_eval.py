"""Raw plug-and-play baseline: an UNfinetuned denoiser inside the DEQ.

The reference's flagship ships a DEQ-finetuned ffdnet.ckpt (stripped blob
upstream), but the IPOL-pretrained `networks/ffdnet/models/net_gray.pth`
is intact — running it raw in the GAP DEQ at the exact flagship schedule
(test_ffdnet.sh: Anderson m=5, beta=1, lam=1e-2, tol=1e-5, max_iter=180,
sigma 60/255 x 0.971^k unbounded) gives the PnP baseline that equilibrium
finetuning is measured against (PARITY.md raw-PnP section).

Usage:
  python scripts/pnp_eval.py                      # all three gray clips
  python scripts/pnp_eval.py --files traffic      # one clip
  python scripts/pnp_eval.py --weights <path.pth> --solver admm
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REFERENCE = "/root/reference"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--weights", default=os.path.join(
        REFERENCE, "networks/ffdnet/models/net_gray.pth"))
    ap.add_argument("--denoiser", default="ffdnet")
    ap.add_argument("--solver", default="gap", choices=["gap", "admm"])
    ap.add_argument("--maxiter", type=int, default=180)
    ap.add_argument("--files", default="",
                    help="comma list of substrings; empty = all")
    ap.add_argument("--testpath", default=os.path.join(
        REFERENCE, "data/test_gray"))
    args = ap.parse_args()

    from deqsci_tpu.data.sci_mat import SCITestDataset
    from deqsci_tpu.recon import make_reconstructor
    from deqsci_tpu.train.eval import evaluate_file
    from deqsci_tpu.zoo import build_denoiser, load_reference_weights

    spec = build_denoiser(args.denoiser)
    variables, _ = load_reference_weights(args.denoiser, args.weights)

    if args.solver == "admm":
        from deqsci_tpu.maps.admm_sci import make_admm_sci_step
        from deqsci_tpu.ops.sensing import initial_point_admm
        step = make_admm_sci_step(spec.apply_fn(), tag=spec.tag)
        recon_kw = dict(init_fn=initial_point_admm, output_fn=lambda c: c[0])
    else:
        from deqsci_tpu.maps.gap_sci import make_gap_sci_step
        step = make_gap_sci_step(spec.apply_fn(), tag=spec.tag)
        recon_kw = {}
    recon = make_reconstructor(step, m=5, lam=1e-2, beta=1.0,
                               max_iter=args.maxiter, tol=1e-5, **recon_kw)

    wanted = [f for f in args.files.split(",") if f]
    per = {}
    for data in SCITestDataset(args.testpath):
        if wanted and not any(w in data["file"] for w in wanted):
            continue
        r = evaluate_file(recon, variables, data, compute_ssim=True)
        per[data["file"]] = r
        print(f"{data['file']}  PSNR: {r['psnr']:.2f} dB  "
              f"SSIM: {r['ssim']:.4f}", flush=True)
    if per:
        print(f"avg PSNR: {np.mean([r['psnr'] for r in per.values()]):.2f} "
              f"dB  avg SSIM: "
              f"{np.mean([r['ssim'] for r in per.values()]):.4f}", flush=True)


if __name__ == "__main__":
    main()
