"""Denoiser zoo: the reference CLI's 13 string options -> framework nets.

Mirrors the factory at video_sci_proxgrad.py:145-185. Each entry yields
``(module, tag, apply_fn, init_shapes)``; checkpoint loading goes through
io/torch_ckpt.py for reference .ckpt/.pth files or io/checkpoint.py for
native ones.

Option notes (faithful to the reference):
* 'SimpleCNN'        4-layer bias-free DnCNN, no BN, lip=0 (plain)
* 'RealSN_SimpleCNN' same net; SN is a train-time transform (nets/sn.py)
* 'DnCNN'/'RealSN_DnCNN'  17-layer with BN
* 'dncnn_norm'       17-layer SN DnCNN — broken import upstream
  (networks/realSN_models.py:2); implemented (not broken) here
* 'ffdnet'           sigma-conditioned FFDNet (the flagship)
* 'unet'/'unet_norm'/'unet3d'/'unet3d_noise'/'unetnorm_noise'  U-Net family
* 'resnet'/'resnet_noise'   n-block ResNet
"""

from __future__ import annotations

import dataclasses
from typing import Any, Callable, Tuple

import jax
import jax.numpy as jnp


@dataclasses.dataclass
class DenoiserSpec:
    module: Any
    tag: str
    needs_sigma: bool = False
    conv3d: bool = False

    def apply_fn(self) -> Callable:
        mod = self.module
        if self.needs_sigma:
            return lambda params, x, sigma: mod.apply(params, x, sigma)
        return lambda params, x: mod.apply(params, x)

    def init_variables(self, rng_key=None, h: int = 64, w: int = 64,
                       t: int = 8):
        rng_key = rng_key if rng_key is not None else jax.random.key(0)
        if self.conv3d:
            x = jnp.zeros((1, t, h, w, 1))
        else:
            x = jnp.zeros((t, h, w, 1))
        if self.needs_sigma:
            return self.module.init(rng_key, x, jnp.zeros((x.shape[0],)))
        return self.module.init(rng_key, x)


def infer_unet_spec(variables) -> dict:
    """(chans, num_pool_layers) recorded in a loaded UNet variables tree:
    chans = down0's output dim, pools = number of down{i} blocks. Lets
    checkpoint consumers (dryrun, dist tests, eval drivers) rebuild the
    module at the size the weights were trained at."""
    p = variables.get("params", variables)
    chans = int(p["down0"]["conv0"]["kernel"].shape[-1])
    pools = len([k for k in p if k.startswith("down")])
    return {"chans": chans, "num_pool_layers": pools}


def infer_denoiser_feats(variables) -> int:
    """Hidden width recorded in a loaded variables tree (conv0's output
    dim), or 0 if the tree has no conv0. Lets checkpoint loaders rebuild
    the module at the width the weights were trained at (e.g. a widened
    FFDNet from scripts/widen_ffdnet.py) without a user-facing flag."""
    try:
        return int(variables["params"]["conv0"]["kernel"].shape[-1])
    except (KeyError, TypeError, IndexError, AttributeError):
        return 0


def build_denoiser(name: str, n_channels: int = 1,
                   precision: str = "packed",
                   bn_fold: bool = False,
                   feats: int = 0) -> DenoiserSpec:
    """``precision``: conv scheme for the DnCNN/FFDNet families —
    'packed' (split2, the production default: -0.003 dB / 1.25x speed vs
    'high', see nets/dncnn.PackedBodyConv), 'high', or 'highest' (for
    bitwise-level oracle comparisons). ``bn_fold``: inference-only module
    variant expecting nets/dncnn.fold_batchnorm() parameters (BN-carrying
    families only). ``feats``: hidden-width override for the ffdnet
    family (0 = the reference's 64); see infer_denoiser_feats."""
    from deqsci_tpu.nets.dncnn import DnCNN
    from deqsci_tpu.nets.ffdnet import FFDNet
    from deqsci_tpu.nets.resnet import NBlockResNet
    from deqsci_tpu.nets.unet import UNet

    if name == "unet":
        return DenoiserSpec(UNet(out_chans=n_channels, chans=32,
                                 num_pool_layers=4, final_clamp=True),
                            tag="conv2d")
    if name == "unet3d":
        return DenoiserSpec(UNet(out_chans=n_channels, chans=32,
                                 num_pool_layers=4, conv3d=True),
                            tag="conv3d", conv3d=True)
    if name == "unet_norm":
        return DenoiserSpec(UNet(out_chans=n_channels, chans=32,
                                 num_pool_layers=4), tag="conv2d")
    if name == "unet3d_noise":
        return DenoiserSpec(UNet(out_chans=n_channels, chans=32,
                                 num_pool_layers=4, conv3d=True),
                            tag="3d_denoiser", conv3d=True)
    if name == "unet3d_noise_small":
        # capacity-reduced 3-D variant ("small Unet3D"): same architecture
        # family, sized so the first trained 3-D operating point is
        # practical — the axon runtime hangs compiling the full-size
        # conv3d UNet (round-5 probe), so this trains on the CPU backend
        return DenoiserSpec(UNet(out_chans=n_channels, chans=16,
                                 num_pool_layers=2, conv3d=True),
                            tag="3d_denoiser", conv3d=True)
    if name == "unetnorm_noise":
        return DenoiserSpec(UNet(out_chans=n_channels, chans=32,
                                 num_pool_layers=4), tag="denoiser")
    if name == "resnet":
        return DenoiserSpec(NBlockResNet(out_chans=n_channels), tag="conv2d")
    if name == "resnet_noise":
        return DenoiserSpec(NBlockResNet(out_chans=n_channels),
                            tag="denoiser")
    if name == "ffdnet":
        return DenoiserSpec(FFDNet(in_channels=n_channels,
                                   precision=precision, bn_fold=bn_fold,
                                   feats=feats),
                            tag="ffdnet", needs_sigma=True)
    if name in ("DnCNN", "RealSN_DnCNN", "dncnn_norm"):
        return DenoiserSpec(DnCNN(channels=n_channels, num_layers=17,
                                  use_bn=True, precision=precision,
                                  bn_fold=bn_fold),
                            tag="denoiser")
    if name in ("SimpleCNN", "RealSN_SimpleCNN"):
        return DenoiserSpec(DnCNN(channels=n_channels, num_layers=4,
                                  use_bn=False, precision=precision),
                            tag="denoiser")
    raise NotImplementedError(f"unknown denoiser: {name!r}")


def load_reference_weights(name: str, path: str) -> Tuple[Any, dict]:
    """Load a reference torch checkpoint for denoiser ``name``."""
    from deqsci_tpu.io import torch_ckpt

    if name == "ffdnet":
        return torch_ckpt.convert_ffdnet(path)
    return torch_ckpt.convert_dncnn(path)
