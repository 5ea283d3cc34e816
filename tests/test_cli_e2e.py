"""End-to-end CLI inference as a subprocess on CPU (tiny synthetic data)."""

import os
import subprocess
import sys

import numpy as np
import pytest
import scipy.io as sio

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


@pytest.fixture
def tiny_testdir(tmp_path, rng):
    gt = rng.random((64, 64, 8)).astype(np.float64)
    mask = (rng.random((64, 64, 8)) > 0.5).astype(np.float64)
    meas = np.sum(gt * mask, axis=-1)
    sio.savemat(tmp_path / "tiny_cacti.mat",
                {"orig": gt * 255, "meas": meas * 255, "mask": mask})
    return str(tmp_path)


@pytest.mark.slow
def test_cli_inference_e2e(tiny_testdir, tmp_path):
    env = dict(os.environ)
    env["JAX_PLATFORMS"] = "cpu"
    cmd = [sys.executable, "-c",
           "import sys; import jax;"
           "jax.config.update('jax_platforms','cpu');"
           "from deqsci_tpu.cli.video_sci import main;"
           f"main(['--denoiser','SimpleCNN','--and_maxiters','6',"
           f"'--testpath','{tiny_testdir}/',"
           f"'--savepath','{tmp_path}/out/','--inference','True'])"]
    r = subprocess.run(cmd, capture_output=True, text=True, cwd=REPO,
                       env=env, timeout=600)
    assert r.returncode == 0, r.stderr[-2000:]
    assert "Total Average PSNR" in r.stdout
    pngs = os.listdir(os.path.join(str(tmp_path), "out", "img", "test"))
    assert len(pngs) == 8  # one snapshot x 8 frames
