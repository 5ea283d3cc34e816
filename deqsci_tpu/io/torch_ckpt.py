"""One-way converter: reference PyTorch checkpoints -> flax param pytrees.

The reference persists ``{'solver_state_dict', 'epoch', 'optimizer_state_dict',
'scheduler_state_dict'}`` via ``torch.save`` (training/sci_equilibrium_training.py:126-147),
with solver keys prefixed ``nonlinear_op.*`` and optional ``module.`` prefixes
from DataParallel (video_sci_proxgrad.py:217-222). Spectral-normalized convs
persist the ``weight_orig / weight / weight_u`` triplet
(networks/provable/model/conv_sn_chen.py:82-90); at inference the reference
uses the stored, already-normalized ``weight`` buffer (eval branch of
ConvSpectralNorm.__call__, lines 65-67), so that is what we load here. The
triplet is also surfaced for training-mode continuation (nets/sn.py).

Layout conversion: torch conv weights are OIHW; flax NHWC convs take HWIO
kernels -> transpose (2, 3, 1, 0). torch is used only here, offline, on CPU.
"""

from __future__ import annotations

import re
from typing import Any, Dict, Tuple

import numpy as np


def _torch_load(path: str) -> Dict[str, np.ndarray]:
    import torch  # local import: torch is an offline-only dependency

    obj = torch.load(path, map_location="cpu", weights_only=False)
    if isinstance(obj, dict) and "solver_state_dict" in obj:
        sd = obj["solver_state_dict"]
    else:
        sd = obj
    out = {}
    for k, v in sd.items():
        if k.startswith("module."):
            k = k[len("module."):]
        out[k] = np.asarray(v.detach().cpu().numpy())
    return out


def load_solver_state(path: str) -> Dict[str, np.ndarray]:
    """Load a reference ckpt and strip DataParallel prefixes."""
    return _torch_load(path)


def conv_kernel(w_oihw: np.ndarray) -> np.ndarray:
    """torch (out, in, *spatial) -> flax (*spatial, in, out) — OIHW -> HWIO
    for 2-D convs, OIDHW -> DHWIO for 3-D."""
    nsp = w_oihw.ndim - 2
    axes = tuple(range(2, 2 + nsp)) + (1, 0)
    return np.ascontiguousarray(np.transpose(w_oihw, axes))


def convert_sequential(sd: Dict[str, np.ndarray], prefix: str
                       ) -> Tuple[Dict[str, Any], Dict[str, Any], Dict[str, Any]]:
    """Convert a torch ``nn.Sequential`` conv/bn stack under ``prefix``.

    Returns ``(params, batch_stats, sn_state)`` named to match the flax
    modules in nets/ (``conv0..convN``, ``bn{i}`` following ``conv{i}``).
    ``sn_state`` carries the raw spectral-norm triplets keyed by conv name.
    """
    pat = re.compile(rf"^{re.escape(prefix)}\.(\d+)\.(.+)$")
    by_idx: Dict[int, Dict[str, np.ndarray]] = {}
    for k, v in sd.items():
        m = pat.match(k)
        if m:
            by_idx.setdefault(int(m.group(1)), {})[m.group(2)] = v

    params: Dict[str, Any] = {}
    stats: Dict[str, Any] = {}
    sn: Dict[str, Any] = {}
    conv_i = 0
    for idx in sorted(by_idx):
        entry = by_idx[idx]
        if "running_mean" in entry:  # BatchNorm (follows conv conv_i-1)
            name = f"bn{conv_i - 1}"
            params[name] = {"scale": entry["weight"], "bias": entry["bias"]}
            stats[name] = {"mean": entry["running_mean"],
                           "var": entry["running_var"]}
        else:  # conv (possibly spectral-normalized)
            name = f"conv{conv_i}"
            w = entry["weight"]  # SN layers: precomputed normalized weight
            params[name] = {"kernel": conv_kernel(w)}
            if "bias" in entry:
                params[name]["bias"] = entry["bias"]
            if "weight_orig" in entry:
                sn[name] = {"weight_orig": entry["weight_orig"],
                            "weight_u": entry["weight_u"]}
            conv_i += 1
    return params, stats, sn


def _variables(params, stats):
    out = {"params": params}
    if stats:
        out["batch_stats"] = stats
    return out


def convert_dncnn(path: str, prefix: str = "nonlinear_op.dncnn"):
    """Convert a SimpleCNN / DnCNN-family ckpt to flax variables.

    Works for cnn.ckpt (plain) and rsn_cnn.ckpt (spectral-normalized —
    the stored normalized weights are loaded, matching eval semantics),
    and for the BARE denoiser state dicts of the fixed-sigma zoo
    (networks/provable/Pretrained_models/{SimpleCNN,RealSN_SimpleCNN,
    DnCNN}_noise{5,15,40}.pth — keys ``dncnn.N.*``, the format the
    reference's --sigma path loads at video_sci_proxgrad.py:207).
    Returns ``(variables, sn_state)``.
    """
    sd = load_solver_state(path)
    if not any(k.startswith(prefix) for k in sd):
        prefix = "dncnn"
    params, stats, sn = convert_sequential(sd, prefix)
    return _variables(params, stats), sn


def tconv_kernel(w: np.ndarray) -> np.ndarray:
    """torch ConvTranspose weight -> flax ConvTranspose kernel.

    torch stores (in, out, *spatial); flax ``nn.ConvTranspose``
    (transpose_kernel=False) cross-correlates the dilated input with the
    kernel as given, while torch's transposed conv convolves — so the
    spatial axes must be flipped in addition to the (*spatial, in, out)
    transpose. Verified exact vs torch for both the 2-D (2,2)/s2 and 3-D
    (3,2,2)/s(1,2,2)/p(1,0,0) reference layouts
    (networks/normalized_equilibrium_u_net_yaping.py:81,85).
    """
    nsp = w.ndim - 2
    axes = tuple(range(2, 2 + nsp)) + (0, 1)
    k = np.transpose(w, axes)
    return np.ascontiguousarray(k[(slice(None, None, -1),) * nsp])


def _conv_entry(entry: Dict[str, np.ndarray], transpose_conv: bool = False
                ) -> Tuple[Dict[str, np.ndarray], Dict[str, np.ndarray]]:
    """One torch conv's tensors -> (flax params, sn triplet or {})."""
    w = entry["weight"]  # SN layers: the stored, already-normalized weight
    p = {"kernel": tconv_kernel(w) if transpose_conv else conv_kernel(w)}
    if "bias" in entry:
        p["bias"] = entry["bias"]
    sn = ({"weight_orig": entry["weight_orig"], "weight_u": entry["weight_u"]}
          if "weight_orig" in entry else {})
    return p, sn


def convert_unet(path: str, prefix: str = "nonlinear_op",
                 num_pool_layers: int = 4):
    """Convert a reference U-Net-family ckpt (UnetModel / UnetNorm / Unet3D,
    networks/normalized_equilibrium_u_net_yaping.py:104-402) to the flax
    ``nets.unet.UNet`` param tree.

    All three variants share the module-name layout
    ``down_sample_layers.{i}.layers.{0,2}`` / ``conv.layers.{0,2}`` /
    ``up_transpose_conv.{i}.layers.0`` / ``up_conv.{i}.layers.{0,2}`` with
    the LAST up_conv a Sequential of (ConvBlock, 1x1 head) keyed
    ``up_conv.{L-1}.0.layers.{0,2}`` and ``up_conv.{L-1}.1``. SN-wrapped
    convs store ``weight_orig/weight/weight_u``; the normalized ``weight``
    is loaded (eval semantics) and the triplet returned as ``sn_state``.

    Returns ``(variables, sn_state)``.
    """
    sd = load_solver_state(path)
    keys = list(sd)
    if not any(k.startswith(f"{prefix}.down_sample_layers.") for k in keys):
        prefix = ""  # bare network state dict

    def group(stem: str) -> Dict[str, np.ndarray]:
        full = f"{prefix}.{stem}." if prefix else f"{stem}."
        return {k[len(full):]: v for k, v in sd.items() if k.startswith(full)}

    L = num_pool_layers
    params: Dict[str, Any] = {}
    sn: Dict[str, Any] = {}

    def put(name: str, entry: Dict[str, np.ndarray], tconv: bool = False):
        block, leaf = name.split("/")
        p, s = _conv_entry(entry, transpose_conv=tconv)
        params.setdefault(block, {})[leaf] = p
        if s:
            sn.setdefault(block, {})[leaf] = s

    for i in range(L):
        g = group(f"down_sample_layers.{i}.layers")
        put(f"down{i}/conv0", {k[2:]: v for k, v in g.items()
                               if k.startswith("0.")})
        put(f"down{i}/conv1", {k[2:]: v for k, v in g.items()
                               if k.startswith("2.")})
    g = group("conv.layers")
    put("bottleneck/conv0", {k[2:]: v for k, v in g.items()
                             if k.startswith("0.")})
    put("bottleneck/conv1", {k[2:]: v for k, v in g.items()
                             if k.startswith("2.")})
    for i in range(L):
        g = group(f"up_transpose_conv.{i}.layers")
        put(f"up_t{i}/tconv", {k[2:]: v for k, v in g.items()
                               if k.startswith("0.")}, tconv=True)
    for i in range(L - 1):
        g = group(f"up_conv.{i}.layers")
        put(f"up{i}/conv0", {k[2:]: v for k, v in g.items()
                             if k.startswith("0.")})
        put(f"up{i}/conv1", {k[2:]: v for k, v in g.items()
                             if k.startswith("2.")})
    g = group(f"up_conv.{L - 1}")
    put(f"up{L - 1}/conv0", {k[len("0.layers.0."):]: v for k, v in g.items()
                             if k.startswith("0.layers.0.")})
    put(f"up{L - 1}/conv1", {k[len("0.layers.2."):]: v for k, v in g.items()
                             if k.startswith("0.layers.2.")})
    head = {k[2:]: v for k, v in g.items() if k.startswith("1.")}
    hp, hs = _conv_entry(head)
    params["head"] = hp
    if hs:
        sn["head"] = {"conv": hs}

    return {"params": params}, sn


def convert_ffdnet(path: str,
                   prefix: str = "nonlinear_op.intermediate_dncnn.itermediate_dncnn"):
    """Convert an FFDNet ckpt (solver-wrapped or bare denoiser) to flax vars."""
    sd = load_solver_state(path)
    if not any(k.startswith(prefix) for k in sd):
        # bare FFDNet state dict from the pretraining kit
        prefix = "intermediate_dncnn.itermediate_dncnn"
    params, stats, sn = convert_sequential(sd, prefix)
    return _variables(params, stats), sn
