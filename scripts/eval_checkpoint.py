"""Evaluate a shipped checkpoint on benchmark files; print one JSON line.

The standalone quality-regression driver behind tests/test_zoo_quality.py
(run there in a subprocess so it executes on the default platform — the
TPU chip when present — instead of the test suite's pinned-CPU backend,
where one 180-iteration FFDNet solve costs ~35 min).

Usage:
  python scripts/eval_checkpoint.py --model models/ffdnet_r3 \
      --solver gap --denoiser ffdnet --maxiter 180 \
      --files drop8_cacti.mat,runner8_cacti.mat
Prints: {"drop8_cacti.mat": 38.17, "runner8_cacti.mat": 31.71}
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TEST_GRAY = "/root/reference/data/test_gray"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", required=True)
    ap.add_argument("--solver", default="gap", choices=["gap", "admm"])
    ap.add_argument("--denoiser", default="ffdnet")
    ap.add_argument("--maxiter", type=int, default=180)
    ap.add_argument("--files", default="drop8_cacti.mat,runner8_cacti.mat")
    ap.add_argument("--sigma_dual", type=float, default=0.0,
                    help="ADMM+ffdnet dual-RMS sigma floor coefficient; "
                         "must match what the model was trained with")
    ap.add_argument("--sigma_min", type=float, default=0.0,
                    help="freeze the sigma schedule at this floor past "
                         "the point where sigma0*decay^k falls below it "
                         "(bit-identical below; autonomous map past it — "
                         "the DEQ-native fix for past-horizon tail decay)")
    ap.add_argument("--sigma_max", type=float, default=0.0,
                    help="cap the effective sigma (applied after both "
                         "floors): the round-5 dual-trace shows RMS(u) "
                         "grows monotonically past the knee, so the "
                         "dual-RMS sigma floor over-smooths late "
                         "iterations; capping at the knee-region value "
                         "stabilizes the tail")
    args = ap.parse_args()

    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from deqsci_tpu.data.sci_mat import load_test_data
    from deqsci_tpu.io.checkpoint import CheckpointManager
    from deqsci_tpu.maps.gap_sci import make_gap_sci_step
    from deqsci_tpu.recon import make_reconstructor
    from deqsci_tpu.train.eval import evaluate_file
    from deqsci_tpu.zoo import build_denoiser, infer_denoiser_feats

    mgr = CheckpointManager(os.path.join("/tmp", "eval_ckpt_scratch"))
    path = args.model if os.path.isabs(args.model) \
        else os.path.join(REPO, args.model)
    if mgr.exists(path):
        variables = mgr.restore(path, with_optimizer=False)["params"]
    else:
        variables = ocp.StandardCheckpointer().restore(
            os.path.abspath(path))["params"]

    spec = build_denoiser(args.denoiser,
                          feats=infer_denoiser_feats(variables))
    solver_kw = dict(m=5, beta=1.0, lam=1e-2, max_iter=args.maxiter,
                     tol=1e-5)
    if args.solver == "admm":
        from deqsci_tpu.maps.admm_sci import make_admm_sci_step
        from deqsci_tpu.ops.sensing import initial_point_admm
        sigma_kw = ({"sigma_dual_coef": args.sigma_dual}
                    if args.sigma_dual else {})
        if args.sigma_min:
            sigma_kw["sigma_min"] = args.sigma_min
        if args.sigma_max:
            sigma_kw["sigma_max"] = args.sigma_max
        step = make_admm_sci_step(spec.apply_fn(), tag=spec.tag, **sigma_kw)
        recon = make_reconstructor(step, init_fn=initial_point_admm,
                                   output_fn=lambda c: c[0], **solver_kw)
    else:
        step = make_gap_sci_step(spec.apply_fn(), tag=spec.tag)
        recon = make_reconstructor(step, **solver_kw)

    out = {}
    for fname in args.files.split(","):
        data = load_test_data(os.path.join(TEST_GRAY, fname))
        data["file"] = fname  # drives the drop/runner first-snapshot rule
        r = evaluate_file(recon, variables, data, compute_ssim=False)
        out[fname] = round(float(r["psnr"]), 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
