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


@pytest.mark.slow
def test_short_deq_parity_realsn_simplecnn_noise15():
    """8-iteration DE-GAP solve with the REAL RealSN_SimpleCNN_noise15
    weights matches the torch oracle end to end on drop8 — a third
    end-to-end golden config with true reference weights (alongside
    cnn.ckpt and rsn_cnn.ckpt)."""
    import torch

    import jax.numpy as jnp
    from deqsci_tpu.data.sci_mat import load_test_data
    from deqsci_tpu.maps.gap_sci import make_gap_sci_step
    from deqsci_tpu.recon import make_reconstructor
    from deqsci_tpu.zoo import build_denoiser, load_reference_weights
    from tests.oracle.torch_pipeline import (GapSCIOracle, SimpleCNNOracle,
                                             deq_infer_oracle)

    drop8 = "/root/reference/data/test_gray/drop8_cacti.mat"
    if not os.path.exists(drop8):
        pytest.skip("drop8 benchmark not present")
    data = load_test_data(drop8)
    mask = data["mask"]
    y = data["meas"][..., 0] if data["meas"].ndim == 3 else data["meas"]

    path = os.path.join(DIR, "RealSN_SimpleCNN_noise15.pth")
    sd = torch.load(path, map_location="cpu", weights_only=False)
    orc = SimpleCNNOracle().load_reference(
        _save_tmp({f"nonlinear_op.{k}": v for k, v in sd.items()}))
    orc.eval()
    tm = torch.from_numpy(mask)[None]
    ty = torch.from_numpy(y)[None]
    tps = torch.sum(tm, dim=3)
    tps[tps == 0] = 1
    with torch.no_grad():
        want, _, _ = deq_infer_oracle(GapSCIOracle(orc, "denoiser"),
                                      ty, tm, tps, ty.unsqueeze(3) * tm,
                                      max_iter=8)

    spec = build_denoiser("RealSN_SimpleCNN", precision="highest")
    variables, _ = load_reference_weights("RealSN_SimpleCNN", path)
    step = make_gap_sci_step(spec.apply_fn(), tag="denoiser")
    recon = make_reconstructor(step, m=5, lam=1e-2, max_iter=8, tol=1e-5,
                               beta=1.0)
    got = np.asarray(recon(variables, jnp.asarray(y)[None],
                           jnp.asarray(mask)))[0]
    np.testing.assert_allclose(got, want[0].numpy(), rtol=1e-3, atol=5e-4)
