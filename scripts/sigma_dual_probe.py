"""Pick the sigma_dual coefficient for the DE-ADMM-FFDNet walk.

Inference-only sweep: the raw IPOL prior (net_gray.pth, zero equilibrium
finetuning) under the ADMM carry at the full 180-iteration schedule, with
sigma floored at coef*RMS(dual). The best coef seeds the round-4 training
walk (VERDICT r3 #6); coef=0 is the un-floored baseline whose fragility
the curriculum is meant to fix.

Usage: python scripts/sigma_dual_probe.py [--files drop8_cacti.mat]
       [--coefs 0,0.25,0.5,1,2] [--maxiter 180]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--files", default="drop8_cacti.mat,runner8_cacti.mat")
    ap.add_argument("--coefs", default="0,0.25,0.5,1,2")
    ap.add_argument("--maxiter", type=int, default=180)
    ap.add_argument("--init", default="/root/reference/networks/ffdnet/"
                                      "models/net_gray.pth")
    args = ap.parse_args()

    import jax.numpy as jnp

    from deqsci_tpu.data.sci_mat import load_test_data
    from deqsci_tpu.maps.admm_sci import make_admm_sci_step
    from deqsci_tpu.ops.sensing import initial_point_admm
    from deqsci_tpu.recon import make_reconstructor
    from deqsci_tpu.train.eval import evaluate_file
    from deqsci_tpu.zoo import build_denoiser, load_reference_weights

    spec = build_denoiser("ffdnet")
    variables, _ = load_reference_weights("ffdnet", args.init)
    test_dir = "/root/reference/data/test_gray/"

    for coef in (float(c) for c in args.coefs.split(",")):
        kw = {"sigma_dual_coef": coef} if coef else {}
        step = make_admm_sci_step(spec.apply_fn(), tag=spec.tag, **kw)
        recon = make_reconstructor(
            step, init_fn=initial_point_admm, output_fn=lambda c: c[0],
            m=5, beta=1.0, lam=1e-2, max_iter=args.maxiter, tol=1e-5)
        scores = []
        for fname in args.files.split(","):
            data = load_test_data(os.path.join(test_dir, fname))
            data["file"] = fname
            r = evaluate_file(recon, variables, data, compute_ssim=False)
            scores.append(r["psnr"])
            print(f"coef={coef:4.2f} {fname}: {r['psnr']:.2f} dB",
                  flush=True)
        print(f"coef={coef:4.2f} avg: {sum(scores)/len(scores):.2f} dB",
              flush=True)


if __name__ == "__main__":
    main()
