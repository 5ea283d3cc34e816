"""Recorded deblurring DEQ operating point (round 5).

The upstream deblur surface is exercised by real experiment drivers
(/root/reference/scripts/fixedpoint/deblur_proxgrad_fixedeta_pre.py
pattern); here scripts/deblur_deq_train.py trains the equivalent on
synthetic textures (no CelebA corpus in the sandbox) and ships weights +
held-out scores to ``models/deblur_deq_demo``. This test re-runs the
deterministic eval protocol (disjoint texture seed 1000, fixed noise
key) on the shipped weights and asserts the recorded PSNR floors.
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
CKPT = os.path.join(REPO, "models", "deblur_deq_demo")

pytestmark = pytest.mark.skipif(not os.path.isdir(CKPT),
                                reason="models/deblur_deq_demo not shipped")


@pytest.mark.slow
def test_deblur_deq_operating_point():
    import orbax.checkpoint as ocp
    meta = ocp.StandardCheckpointer().restore(os.path.abspath(CKPT))["meta"]

    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts",
                                      "deblur_deq_train.py"),
         "--load", CKPT, "--eval_n", "16",
         "--size", str(int(meta["size"])),
         "--kernel_sigma", str(float(meta["kernel_sigma"])),
         "--kernel_size", str(int(meta["kernel_size"])),
         "--noise_sigma", str(float(meta["noise_sigma"]))],
        capture_output=True, text=True, timeout=1800, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-2000:]
    scores = json.loads(proc.stdout.strip().splitlines()[-1])

    best_budget = max(meta["psnr"], key=lambda k: float(meta["psnr"][k]))
    recorded = float(meta["psnr"][best_budget])
    measured = float(scores["psnr"][best_budget])
    baseline = float(scores["baseline_psnr"])
    # 0.3 dB tolerance: platform numerics only — the protocol itself is
    # deterministic
    assert measured >= recorded - 0.3, (
        f"deblur DEQ @{best_budget} iters {measured:.2f} dB below the "
        f"shipped {recorded:.2f} dB operating point")
    assert measured >= baseline + 1.5, (
        f"DEQ recon ({measured:.2f}) no longer meaningfully beats the "
        f"blurred-adjoint baseline ({baseline:.2f})")
