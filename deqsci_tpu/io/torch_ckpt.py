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
    """OIHW -> HWIO."""
    return np.ascontiguousarray(np.transpose(w_oihw, (2, 3, 1, 0)))


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
    the stored normalized weights are loaded, matching eval semantics).
    Returns ``(variables, sn_state)``.
    """
    sd = load_solver_state(path)
    params, stats, sn = convert_sequential(sd, prefix)
    return _variables(params, stats), sn


def convert_ffdnet(path: str,
                   prefix: str = "nonlinear_op.intermediate_dncnn.itermediate_dncnn"):
    """Convert an FFDNet ckpt (solver-wrapped or bare denoiser) to flax vars."""
    sd = load_solver_state(path)
    if not any(k.startswith(prefix) for k in sd):
        # bare FFDNet state dict from the pretraining kit
        prefix = "intermediate_dncnn.itermediate_dncnn"
    params, stats, sn = convert_sequential(sd, prefix)
    return _variables(params, stats), sn
