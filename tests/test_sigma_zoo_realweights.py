"""The fixed-sigma denoiser zoo: parity with the INTACT reference blobs.

The reference's --sigma path loads
networks/provable/Pretrained_models/{denoiser}_noise{sigma}.pth
(video_sci_proxgrad.py:207). Upstream strips only the RealSN_DnCNN
triple (.MISSING_LARGE_BLOBS); the SimpleCNN, RealSN_SimpleCNN, and
plain-DnCNN nine ship INTACT — so real-weight conversion is testable:

* SimpleCNN / RealSN_SimpleCNN (bias-free 4-layer stacks; SN stores the
  already-normalized ``weight``): exact forward parity vs the torch
  oracle loaded with the same tensors;
* DnCNN (17 layers, BN): conversion structure + behavioral check (the
  sigma-15 net must denoise sigma-15 noise).
"""

import os

import numpy as np
import pytest

DIR = "/root/reference/networks/provable/Pretrained_models"

pytestmark = pytest.mark.skipif(
    not os.path.exists(os.path.join(DIR, "SimpleCNN_noise15.pth")),
    reason="reference fixed-sigma zoo not present")


def _forward_jax(name, path, x_nchw):
    import jax.numpy as jnp
    from deqsci_tpu.zoo import build_denoiser, load_reference_weights

    spec = build_denoiser(name, precision="highest")
    variables, _ = load_reference_weights(name, path)
    out = spec.apply_fn()(variables, jnp.asarray(x_nchw.transpose(0, 2, 3, 1)))
    return np.asarray(out).transpose(0, 3, 1, 2)


@pytest.mark.parametrize("arch", ["SimpleCNN", "RealSN_SimpleCNN"])
@pytest.mark.parametrize("sigma", [5, 15, 40])
def test_simplecnn_family_matches_oracle(arch, sigma):
    import torch

    from tests.oracle.torch_pipeline import SimpleCNNOracle

    path = os.path.join(DIR, f"{arch}_noise{sigma}.pth")
    rng = np.random.default_rng(sigma)
    x = rng.random((1, 1, 32, 32)).astype(np.float32)

    out_j = _forward_jax(arch, path, x)

    sd = torch.load(path, map_location="cpu", weights_only=False)
    # the oracle loader expects the solver-wrapped prefix
    sd = {f"nonlinear_op.{k}": v for k, v in sd.items()}
    orc = SimpleCNNOracle()
    orc.load_reference(_save_tmp(sd))
    orc.eval()
    with torch.no_grad():
        out_t = orc(torch.from_numpy(x)).numpy()
    np.testing.assert_allclose(out_j, out_t, atol=5e-6)


def _save_tmp(sd):
    import tempfile

    import torch
    f = tempfile.NamedTemporaryFile(suffix=".pth", delete=False)
    torch.save(sd, f.name)
    return f.name


@pytest.mark.parametrize("sigma", [5, 15, 40])
def test_plain_dncnn_converts_and_denoises(sigma):
    path = os.path.join(DIR, f"DnCNN_noise{sigma}.pth")
    from deqsci_tpu.zoo import load_reference_weights

    variables, sn = load_reference_weights("DnCNN", path)
    p = variables["params"]
    assert len([k for k in p if k.startswith("conv")]) == 17
    assert len([k for k in p if k.startswith("bn")]) == 15
    assert "batch_stats" in variables and not sn

    # behavioral: x - net(x) must denoise sigma-level noise
    rng = np.random.default_rng(0)
    xx, yy = np.meshgrid(np.arange(64), np.arange(64))
    clean = (0.5 + 0.4 * np.sin(2 * np.pi * xx / 24)
             * np.cos(2 * np.pi * yy / 18)).astype(np.float32)[None, ..., None]
    noisy = clean + (sigma / 255.0) * rng.standard_normal(
        clean.shape).astype(np.float32)

    import jax.numpy as jnp
    from deqsci_tpu.zoo import build_denoiser
    spec = build_denoiser("DnCNN", precision="highest")
    den = noisy - np.asarray(spec.apply_fn()(variables, jnp.asarray(noisy)))

    def psnr(a, b):
        return -10 * np.log10(np.mean((np.clip(a, 0, 1)
                                       - np.clip(b, 0, 1)) ** 2))

    gain = psnr(clean, den) - psnr(clean, noisy)
    assert gain > 3.0, f"DnCNN_noise{sigma} should denoise; gain {gain:.2f}"
