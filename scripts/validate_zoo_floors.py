"""Prove the ZOO regression floors have teeth (VERDICT r4 #4 'done' bar).

Perturbs a shipped checkpoint with small Gaussian weight noise, runs the
full protocol on all three floored files, and reports which floors the
perturbed weights violate vs the intact ones. The intact weights must
pass every floor; the perturbed ones must fail at least traffic (the
least-saturated file — 180 amplifying iterations turn a tiny weight
perturbation into dB-scale quality loss there first).

Usage: python scripts/validate_zoo_floors.py [--model ffdnet_ipol]
           [--noise 2e-3]
"""

import argparse
import json
import os
import shutil
import subprocess
import sys
import tempfile

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def eval_files(model_path, entry):
    extra = [f"--{k}={v}" for k, v in entry.get("eval_kwargs", {}).items()]
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "eval_checkpoint.py"),
         "--model", model_path,
         "--solver", entry["solver"], "--denoiser", entry["denoiser"],
         "--maxiter", str(entry["maxiter"]),
         "--files", ",".join(entry["regression"])] + extra,
        capture_output=True, text=True, timeout=3600, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-2000:]
    return json.loads(proc.stdout.strip().splitlines()[-1])


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="ffdnet_ipol")
    ap.add_argument("--noise", type=float, default=2e-3,
                    help="relative Gaussian weight noise (per-leaf std = "
                    "noise * leaf RMS)")
    ap.add_argument("--skip_intact", action="store_true",
                    help="skip the intact-weights pass (already verified "
                    "by tests/test_zoo_quality.py)")
    args = ap.parse_args()

    import jax
    import numpy as np
    import orbax.checkpoint as ocp
    from deqsci_tpu.io.checkpoint import CheckpointManager

    with open(os.path.join(REPO, "models", "ZOO.json")) as f:
        entry = json.load(f)[args.model]
    floors = entry["regression"]

    if not args.skip_intact:
        scores = eval_files(os.path.join("models", args.model), entry)
        print("intact:", json.dumps(scores), flush=True)
        for fname, floor in floors.items():
            assert scores[fname] >= floor, (fname, scores[fname], floor)
        print("intact weights pass every floor", flush=True)

    snap = ocp.StandardCheckpointer().restore(
        os.path.abspath(os.path.join(REPO, "models", args.model)))
    rng = np.random.default_rng(0)

    def perturb(leaf):
        a = np.asarray(leaf)
        if not np.issubdtype(a.dtype, np.floating):
            return a
        rms = float(np.sqrt(np.mean(a ** 2))) or 1.0
        return a + (args.noise * rms) * rng.standard_normal(
            a.shape).astype(a.dtype)

    bad = jax.tree.map(perturb, snap["params"])
    tmp = tempfile.mkdtemp(prefix="zoo_perturb_")
    try:
        CheckpointManager(tmp).save("perturbed",
                                    {"params": bad,
                                     "epoch": int(snap.get("epoch", 0))})
        scores = eval_files(os.path.join(tmp, "perturbed"), entry)
    finally:
        shutil.rmtree(tmp, ignore_errors=True)
    print("perturbed:", json.dumps(scores), flush=True)
    failed = [f for f, fl in floors.items() if scores[f] < fl]
    print(f"perturbed weights violate floors on: {failed or 'NOTHING'}",
          flush=True)
    assert "traffic_cacti.mat" in failed, (
        "traffic floor did not catch the perturbation — floors too loose")
    print("floor validation OK: the traffic floor catches a "
          f"{args.noise:g} relative weight perturbation", flush=True)


if __name__ == "__main__":
    main()
