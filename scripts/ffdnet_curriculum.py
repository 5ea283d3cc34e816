"""Sigma-floor curriculum to the reference's 180-iteration flagship.

Observation driving the design (round 2): equilibrium training at a long
horizon gives garbage gradients while the forward solve diverges (PSNR ~8
dB at maxiter=120 from the small-sigma weights), so a *horizon* curriculum
(60 -> 120 -> 180) cannot bootstrap. Instead train always AT the target
horizon (180, matching test_ffdnet.sh) but with the sigma floor engaged
(--sigma_min, stable), then lower the floor stepwise to 0 — each leg
extends the denoiser's competence to smaller sigma while the forward
solve stays convergent, until the reference's unbounded schedule is
reached.

Each leg runs the CLI trainer (train_ffdnet.sh recipe: Adam 1e-4,
StepLR(10, 0.9), MSE) on a subset of the extended corpus, initializing
from the previous leg's last checkpoint. Writes models/ffdnet_r2 at the
end if the final unbounded evaluation is stable.

Usage: python scripts/ffdnet_curriculum.py [--clips 120] [--maxiter 180]
"""

import argparse
import os
import shutil
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def make_subset(src, dst, n_clips):
    if os.path.isdir(dst):
        shutil.rmtree(dst)
    os.makedirs(os.path.join(dst, "gt"))
    os.makedirs(os.path.join(dst, "measurement"))
    os.symlink(os.path.join(src, "mask.mat"), os.path.join(dst, "mask.mat"))
    names = sorted(os.listdir(os.path.join(src, "gt")))[:n_clips]
    for n in names:
        for sub in ("gt", "measurement"):
            os.symlink(os.path.join(src, sub, n),
                       os.path.join(dst, sub, n))
    return dst


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--clips", type=int, default=120)
    ap.add_argument("--maxiter", type=int, default=180)
    ap.add_argument("--init", default="models/ffdnet_smallsig")
    ap.add_argument("--legs", default="10,4,1.5,0.5,0",
                    help="comma-separated sigma_min values (255-units)")
    ap.add_argument("--epochs-per-leg", type=int, default=2)
    ap.add_argument("--grad-clip", type=float, default=1.0)
    ap.add_argument("--neumann-k", type=int, default=20)
    args = ap.parse_args()

    from deqsci_tpu.cli import video_sci

    src = os.path.join(REPO, "data/sci_train_r2x")
    subset = make_subset(src, os.path.join(REPO, "data/sci_train_r2sub"),
                         args.clips)

    load = os.path.join(REPO, args.init)
    legs = [float(s) for s in args.legs.split(",")]
    epoch_cursor = None
    for li, sig in enumerate(legs):
        save = os.path.join(REPO, f"save/ffd_r2_leg{li}_sig{sig:g}")
        # figure out how many epochs the loaded ckpt already counts
        import orbax.checkpoint as ocp
        snap_epoch = -1
        if os.path.isdir(load):
            try:
                snap = ocp.StandardCheckpointer().restore(
                    os.path.abspath(load))
                snap_epoch = int(snap.get("epoch", -1))
            except Exception:
                pass
        n_epochs = snap_epoch + 1 + args.epochs_per_leg
        argv = ["--denoiser", "ffdnet",
                "--loadpath", load,
                "--trainpath", subset,
                "--testpath", "/root/reference/data/test_gray/",
                "--savepath", save,
                "--and_maxiters", str(args.maxiter),
                "--n_epochs", str(n_epochs),
                "--save_every_n_steps", "2000",   # eval only at epoch end
                "--print_every_n_steps", "25",
                "--sigma_min", str(sig),
                # long-horizon stabilizers (documented deviations from the
                # reference recipe, needed at 180 iterations: the exact IFT
                # system (I-J) turns near-singular and gradients spike)
                "--backward", "neumann",
                "--neumann_k", str(args.neumann_k),
                "--grad_clip", str(args.grad_clip)]
        print(f"=== leg {li}: sigma_min={sig} n_epochs={n_epochs} "
              f"(start {snap_epoch + 1}) ===", flush=True)
        video_sci.main(argv)
        # chain from the highest clean epoch checkpoint (NaN-reset may
        # have consumed some epochs), else the best-eval checkpoint
        model_dir = os.path.join(save, "model")
        cands = sorted((d for d in os.listdir(model_dir)
                        if d.startswith("epoch_")),
                       key=lambda d: int(d.split("_")[1]))
        if cands:
            load = os.path.join(model_dir, cands[-1])
        elif os.path.isdir(os.path.join(model_dir, "best")):
            load = os.path.join(model_dir, "best")
        else:
            print(f"leg {li}: no checkpoint produced in {model_dir}; "
                  "stopping", flush=True)
            return

    # final: evaluate unbounded at the target horizon and save the model
    print("=== final evaluation (sigma unbounded) ===", flush=True)
    r = video_sci.main(["--denoiser", "ffdnet",
                        "--loadpath", load,
                        "--testpath", "/root/reference/data/test_gray/",
                        "--savepath", os.path.join(REPO, "save/ffd_r2_eval"),
                        "--inference", "True",
                        "--and_maxiters", str(args.maxiter)])
    import orbax.checkpoint as ocp
    import numpy as np
    snap = ocp.StandardCheckpointer().restore(os.path.abspath(load))
    from deqsci_tpu.io.checkpoint import CheckpointManager
    mgr = CheckpointManager(os.path.join(REPO, "models"))
    mgr.save("ffdnet_r2_curr", {"params": snap["params"],
                                "epoch": int(snap.get("epoch", 0))})
    print(f"saved models/ffdnet_r2_curr (avg {r['avg_psnr']:.2f} dB "
          f"unbounded @ {args.maxiter})", flush=True)


if __name__ == "__main__":
    main()
