"""U-Net torch-ckpt conversion round trip.

No pretrained U-Net ckpts exist upstream (the family is constructible but
unused in the wired configs), so the torch oracle *generates* reference-
layout checkpoints — UnetModel / UnetNorm / Unet3D key structure incl.
DataParallel prefixes and SN weight_orig/weight/weight_u triplets
(networks/normalized_equilibrium_u_net_yaping.py:104-402) — and the
converted flax UNet must match the torch output exactly.
"""

import os
import tempfile

import jax
import jax.numpy as jnp
import numpy as np
import pytest
import torch

from deqsci_tpu.io.torch_ckpt import convert_unet
from deqsci_tpu.nets.unet import UNet
from tests.oracle.torch_pipeline import UNetOracle


def _save_ckpt(oracle, path, sn_names=(), module_prefix=False):
    """Persist the oracle in the reference's on-disk format. ``sn_names``:
    key stems whose conv gets a fabricated SN triplet (weight = stored
    normalized weight, weight_orig = unnormalized, weight_u = power-iter
    state), as utils/spectral_norm.py:288 lays them out."""
    sd = {}
    g = torch.Generator().manual_seed(7)
    for k, v in oracle.state_dict().items():
        stem = k.rsplit(".", 1)[0]
        if k.endswith(".weight") and stem in sn_names:
            sd[f"{stem}.weight_orig"] = v * 1.37
            sd[f"{stem}.weight"] = v
            sd[f"{stem}.weight_u"] = torch.randn(
                1, v.shape[0], 40, 40, generator=g)
        else:
            sd[k] = v
    pre = "module.nonlinear_op." if module_prefix else "nonlinear_op."
    torch.save({"solver_state_dict": {pre + k: v for k, v in sd.items()},
                "epoch": 0}, path)


@pytest.mark.parametrize(
    "variant", ["model", pytest.param("norm", marks=pytest.mark.slow),
                pytest.param("3d", marks=pytest.mark.slow)])
def test_unet_convert_round_trip(variant, rng):
    conv3d = variant == "3d"
    clamp = variant == "model"
    L = 3
    torch.manual_seed(3)
    oracle = UNetOracle(chans=8, num_pool_layers=L, conv3d=conv3d,
                        final_clamp=clamp).eval()

    sn_names = ()
    if variant == "model":  # UnetModel: every conv except the 1x1 head
        sn_names = tuple(k.rsplit(".", 1)[0]
                         for k in oracle.state_dict()
                         if k.endswith(".weight")
                         and not k.startswith(f"up_conv.{L - 1}.1."))
    elif variant == "norm":  # UnetNorm: head SN-wrapped too
        sn_names = tuple(k.rsplit(".", 1)[0]
                         for k in oracle.state_dict()
                         if k.endswith(".weight"))

    with tempfile.TemporaryDirectory() as tmp:
        path = os.path.join(tmp, "unet.ckpt")
        _save_ckpt(oracle, path, sn_names=sn_names,
                   module_prefix=(variant == "model"))
        variables, sn_state = convert_unet(path, num_pool_layers=L)

    if conv3d:
        # the reference's Unet3D supports 2^n resolutions only
        xt = torch.randn(1, 1, 4, 64, 64)
        xj = jnp.asarray(np.transpose(xt.numpy(), (0, 2, 3, 4, 1)))
    else:
        # odd spatial size exercises the reflect-pad odd-size fix
        xt = torch.randn(2, 1, 52, 52)
        xj = jnp.asarray(np.transpose(xt.numpy(), (0, 2, 3, 1)))
    with torch.no_grad():
        yt = oracle(xt).numpy()

    net = UNet(chans=8, num_pool_layers=L, conv3d=conv3d, final_clamp=clamp)
    yj = np.asarray(jax.jit(net.apply)(variables, xj))
    yj = np.moveaxis(yj, -1, 1)

    np.testing.assert_allclose(yj, yt, rtol=1e-4, atol=2e-5)

    if sn_names:  # triplets surfaced for training-mode continuation
        n_triplets = sum(len(v) for v in sn_state.values())
        assert n_triplets == len(sn_names)
        any_block = next(iter(sn_state.values()))
        any_conv = next(iter(any_block.values()))
        assert set(any_conv) == {"weight_orig", "weight_u"}
