"""Shipped-weights quality regression (VERDICT r3 #4).

Loads the committed headline checkpoints and asserts per-file PSNR floors
at the full 180-iteration protocol, mirroring the reference's
``test_solver_sci`` semantics (training/sci_equilibrium_training.py:152-205)
via the framework's public ``make_reconstructor`` + ``evaluate_file`` path.

A silently-broken checkpoint blob, a converter regression, or a quality
regression in the packed-precision conv path all fail these floors. The
floors live in ``models/ZOO.json`` (``regression`` block per entry) so they
ship with the weights; only single-snapshot files (drop8/runner8) are
asserted to bound CPU runtime — traffic's 6 snapshots are covered by the
chip-run shell protocols (test_ffdnet.sh / test_admm.sh).
"""

import json
import os

import pytest

from tests.conftest import REFERENCE_ROOT, has_reference

pytestmark = pytest.mark.skipif(not has_reference(),
                                reason="reference checkout not present")

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
ZOO_PATH = os.path.join(REPO, "models", "ZOO.json")
TEST_GRAY = os.path.join(REFERENCE_ROOT, "data", "test_gray")


def _zoo_regression_entries():
    with open(ZOO_PATH) as f:
        zoo = json.load(f)
    return [(name, entry) for name, entry in zoo.items()
            if isinstance(entry, dict) and "regression" in entry]


def _build_recon(entry):
    from deqsci_tpu.maps.gap_sci import make_gap_sci_step
    from deqsci_tpu.recon import make_reconstructor
    from deqsci_tpu.zoo import build_denoiser

    spec = build_denoiser(entry["denoiser"])
    solver_kw = dict(m=5, beta=1.0, lam=1e-2,
                     max_iter=int(entry["maxiter"]), tol=1e-5)
    if entry["solver"] == "admm":
        from deqsci_tpu.maps.admm_sci import make_admm_sci_step
        from deqsci_tpu.ops.sensing import initial_point_admm
        step = make_admm_sci_step(spec.apply_fn(), tag=spec.tag)
        return make_reconstructor(step, init_fn=initial_point_admm,
                                  output_fn=lambda c: c[0], **solver_kw)
    step = make_gap_sci_step(spec.apply_fn(), tag=spec.tag)
    return make_reconstructor(step, **solver_kw)


def _load_native(path):
    import orbax.checkpoint as ocp

    from deqsci_tpu.io.checkpoint import CheckpointManager
    mgr = CheckpointManager(os.path.join("/tmp", "zoo_quality_ckpt"))
    if mgr.exists(path):
        return mgr.restore(path, with_optimizer=False)["params"]
    return ocp.StandardCheckpointer().restore(os.path.abspath(path))["params"]


@pytest.mark.slow
@pytest.mark.parametrize("name,entry", _zoo_regression_entries())
def test_shipped_checkpoint_quality(name, entry):
    from deqsci_tpu.data.sci_mat import load_test_data
    from deqsci_tpu.train.eval import evaluate_file

    ckpt = os.path.join(REPO, "models", name)
    assert os.path.isdir(ckpt), f"shipped checkpoint missing: {ckpt}"
    variables = _load_native(ckpt)
    recon = _build_recon(entry)

    floors = entry["regression"]
    for fname, floor in floors.items():
        data = load_test_data(os.path.join(TEST_GRAY, fname))
        r = evaluate_file(recon, variables, data, compute_ssim=False)
        assert r["psnr"] >= floor, (
            f"{name}/{fname}: PSNR {r['psnr']:.2f} dB below the shipped "
            f"floor {floor} — checkpoint or precision-path regression")
