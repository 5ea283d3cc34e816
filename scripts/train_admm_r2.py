"""Train the first DE-ADMM weights (VERDICT round-1 item 7).

The reference ships EquilibriumADMMSCI + DEQFixedPointADMM but never
wires them to an entry point and never produced ADMM-trained weights
(solvers/equilibrium_solvers_yaping.py:438-465, new_equilibrium_utils_
yaping.py:414-451). Two facts measured here explain why it never could:

1. the hook-disabled ("passthrough") ADMM backward has EXACTLY ZERO
   parameter gradient: the returned carry component is the pre-denoise
   physics update ``zbar = physics(z* + u*)`` of stop-gradded fixed-point
   state — the denoiser only feeds the dual. Training with the reference
   scheme is a no-op (verified: loss sequence bitwise-identical across
   epochs).
2. GAP-trained cnn.ckpt weights under the ADMM map improve to ~18 dB by
   iteration 10 and then drift — at max_iter=100 the forward solve is
   fully diverged (4.89 dB), so long-horizon gradients are garbage.

So this trainer uses the truncated-Neumann backward (the reference's own
DEQFixedPointNeumann scheme, wired via --backward neumann) and a horizon
curriculum 10 -> 30 -> 60 -> 100, each leg initialized from the previous
best. Writes models/admm_cnn_r2 and prints the final 100-iteration
DE-ADMM benchmark scores.

Usage: python scripts/train_admm_r2.py
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--legs", default="10:2,30:2,60:2,100:2",
                    help="comma list of maxiter:epochs")
    ap.add_argument("--trainpath",
                    default=os.path.join(REPO, "data/sci_train_r2sub"))
    args = ap.parse_args()

    from deqsci_tpu.cli import video_sci

    load = "/root/reference/models/cnn.ckpt"
    legs = [tuple(int(v) for v in leg.split(":"))
            for leg in args.legs.split(",")]
    epoch_base = 0
    for li, (maxiter, eps) in enumerate(legs):
        save = os.path.join(REPO, f"save/admm_r2_leg{li}_it{maxiter}")
        n_epochs = epoch_base + eps
        argv = ["--sci_solver", "admm",
                "--denoiser", "SimpleCNN",
                "--loadpath", load,
                "--trainpath", args.trainpath,
                "--testpath", "/root/reference/data/test_gray/",
                "--savepath", save,
                "--and_maxiters", str(maxiter),
                "--n_epochs", str(n_epochs),
                "--save_every_n_steps", "2000",
                "--print_every_n_steps", "25",
                "--backward", "neumann",
                "--neumann_k", "15",
                "--grad_clip", "1.0"]
        print(f"=== DE-ADMM leg {li}: maxiter={maxiter} epochs={eps} ===",
              flush=True)
        video_sci.main(argv)
        model_dir = os.path.join(save, "model")
        cands = sorted((d for d in os.listdir(model_dir)
                        if d.startswith("epoch_")),
                       key=lambda d: int(d.split("_")[1]))
        if not cands:
            print(f"leg {li}: no checkpoint produced; stopping", flush=True)
            return
        load = os.path.join(model_dir, cands[-1])
        epoch_base = int(cands[-1].split("_")[1]) + 1

    import orbax.checkpoint as ocp
    from deqsci_tpu.io.checkpoint import CheckpointManager
    snap = ocp.StandardCheckpointer().restore(os.path.abspath(load))
    mgr = CheckpointManager(os.path.join(REPO, "models"))
    mgr.save("admm_cnn_r2", {"params": snap["params"],
                             "epoch": int(snap.get("epoch", 0))})
    print("saved models/admm_cnn_r2", flush=True)

    print("=== final DE-ADMM eval (100 iterations) ===", flush=True)
    video_sci.main(["--sci_solver", "admm",
                    "--denoiser", "SimpleCNN",
                    "--loadpath", os.path.join(REPO, "models/admm_cnn_r2"),
                    "--testpath", "/root/reference/data/test_gray/",
                    "--savepath", os.path.join(REPO, "save/admm_r2_eval"),
                    "--inference", "True",
                    "--and_maxiters", "100"])


if __name__ == "__main__":
    main()
