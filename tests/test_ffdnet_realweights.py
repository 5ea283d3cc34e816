"""Golden parity with the REAL reference FFDNet weights.

Unlike models/ffdnet.ckpt (a stripped blob upstream), the IPOL pretrained
denoisers networks/ffdnet/models/net_{gray,rgb}.pth ship intact in the
reference tree. That makes a true reference-weight conversion test
possible: the gray net's forward through our flax FFDNet must match the
torch oracle loaded with the same state dict to float tolerance, and the
rgb net (96 feats, 12 layers, 15->12 channels) must actually denoise.
Reference: networks/ffdnet/test_ffdnet_ipol.py:183-195 (model_fn
selection), networks/ffdnet/models.py (architecture).
"""

import os

import numpy as np
import pytest

GRAY = "/root/reference/networks/ffdnet/models/net_gray.pth"
RGB = "/root/reference/networks/ffdnet/models/net_rgb.pth"

pytestmark = pytest.mark.skipif(
    not (os.path.exists(GRAY) and os.path.exists(RGB)),
    reason="reference IPOL FFDNet weights not present")


def test_net_gray_matches_torch_oracle():
    import torch

    import jax.numpy as jnp
    from deqsci_tpu.io.torch_ckpt import convert_ffdnet
    from deqsci_tpu.nets.ffdnet import FFDNet
    from tests.oracle.torch_pipeline import FFDNetOracle

    sd = torch.load(GRAY, map_location="cpu", weights_only=False)
    if isinstance(sd, dict) and "state_dict" in sd:
        sd = sd["state_dict"]

    rng = np.random.default_rng(0)
    x = rng.random((2, 1, 48, 48)).astype(np.float32)
    sigma = np.float32(25 / 255.0)

    orc = FFDNetOracle().load_reference_state(sd)
    orc.eval()
    with torch.no_grad():
        out_t = orc(torch.from_numpy(x),
                    torch.full((2,), float(sigma))).numpy()

    variables, _ = convert_ffdnet(GRAY)
    net = FFDNet(in_channels=1, precision="highest")
    out_j = np.asarray(net.apply(variables,
                                 jnp.asarray(x.transpose(0, 2, 3, 1)),
                                 jnp.full((2,), sigma)))
    np.testing.assert_allclose(out_j.transpose(0, 3, 1, 2), out_t,
                               atol=5e-6)


def test_net_rgb_converts_and_denoises():
    import jax.numpy as jnp
    from deqsci_tpu.io.torch_ckpt import convert_ffdnet
    from deqsci_tpu.nets.ffdnet import FFDNet
    from deqsci_tpu.train.metrics import psnr_np

    variables, _ = convert_ffdnet(RGB)
    net = FFDNet(in_channels=3, precision="highest")
    rng = np.random.default_rng(0)
    xx, yy = np.meshgrid(np.arange(64), np.arange(64))
    clean = np.stack(
        [0.5 + 0.4 * np.sin(2 * np.pi * (xx + 20 * i) / 32)
         * np.cos(2 * np.pi * yy / 24) for i in range(3)],
        -1).astype(np.float32)[None]
    sigma = np.float32(25 / 255.0)
    noisy = clean + sigma * rng.standard_normal(clean.shape).astype(
        np.float32)
    den = noisy - np.asarray(net.apply(variables, jnp.asarray(noisy),
                                       jnp.full((1,), sigma)))
    gain = psnr_np(clean[0], np.clip(den, 0, 1)[0]) - \
        psnr_np(clean[0], np.clip(noisy, 0, 1)[0])
    assert gain > 5.0, f"rgb FFDNet should denoise; PSNR gain {gain:.2f}"
