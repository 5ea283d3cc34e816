"""Shipped-weights quality regression (VERDICT r3 #4).

Loads the committed headline checkpoints and asserts per-file PSNR floors
at the full 180-iteration protocol, mirroring the reference's
``test_solver_sci`` semantics (training/sci_equilibrium_training.py:152-205)
via the framework's public ``make_reconstructor`` + ``evaluate_file`` path
(driven by ``scripts/eval_checkpoint.py``).

A silently-broken checkpoint blob, a converter regression, or a quality
regression in the packed-precision conv path all fail these floors. The
floors live in ``models/ZOO.json`` (``regression`` block per entry) so they
ship with the weights; every trained operating point floors ALL THREE
benchmark files (VERDICT r4 #4 — traffic is the hardest file, furthest
from saturation, so a regression shows there first; round-4 blocks
skipped it and would have missed a traffic-only regression).

The eval runs in a SUBPROCESS on the default JAX platform: the suite's
conftest pins the CPU backend, where one 180-iteration FFDNet solve costs
~35 min; on the TPU chip the whole check is ~a minute. Skips when no
accelerator is reachable rather than burning an hour of CPU.
"""

import json
import os
import subprocess
import sys

import pytest

from tests.conftest import has_reference

pytestmark = pytest.mark.skipif(not has_reference(),
                                reason="reference checkout not present")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ZOO_PATH = os.path.join(REPO, "models", "ZOO.json")


def _zoo_regression_entries():
    with open(ZOO_PATH) as f:
        zoo = json.load(f)
    return [(name, entry) for name, entry in zoo.items()
            if isinstance(entry, dict) and "regression" in entry]


def _default_platform_has_accelerator():
    code = ("import os; os.environ.pop('JAX_PLATFORMS', None); "
            "import jax; d = jax.devices()[0].platform; "
            "print(d)")
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    try:
        out = subprocess.run([sys.executable, "-c", code], env=env,
                             capture_output=True, text=True, timeout=120)
        return out.stdout.strip() not in ("", "cpu")
    except Exception:
        return False


@pytest.mark.slow
@pytest.mark.parametrize("name,entry", _zoo_regression_entries())
def test_shipped_checkpoint_quality(name, entry):
    if not _default_platform_has_accelerator():
        pytest.skip("no accelerator on the default platform; the full "
                    "180-iteration protocol is impractical on CPU")
    ckpt = os.path.join(REPO, "models", name)
    assert os.path.isdir(ckpt), f"shipped checkpoint missing: {ckpt}"

    floors = entry["regression"]
    env = {k: v for k, v in os.environ.items()
           if k not in ("JAX_PLATFORMS", "XLA_FLAGS")}
    extra = [f"--{k}={v}" for k, v in entry.get("eval_kwargs", {}).items()]
    proc = subprocess.run(
        [sys.executable, os.path.join(REPO, "scripts", "eval_checkpoint.py"),
         "--model", os.path.join("models", name),
         "--solver", entry["solver"], "--denoiser", entry["denoiser"],
         "--maxiter", str(entry["maxiter"]),
         "--files", ",".join(floors)] + extra,
        env=env, capture_output=True, text=True, timeout=1800, cwd=REPO)
    assert proc.returncode == 0, proc.stderr[-2000:]
    scores = json.loads(proc.stdout.strip().splitlines()[-1])
    for fname, floor in floors.items():
        assert scores[fname] >= floor, (
            f"{name}/{fname}: PSNR {scores[fname]:.2f} dB below the shipped "
            f"floor {floor} — checkpoint or precision-path regression")
