"""Function-preserving widening (Net2WiderNet) for the DnCNN/FFDNet body.

PARITY.md round-4 MXU probes: the reference's 64-channel body convs
(networks/ffdnet/models.py:27-68) fill half of the MXU's 128 lanes
(56 TF/s useful); 96/128-channel convs reach 102/160 TF/s. This module
widens a trained checkpoint's hidden layers WITHOUT changing the function
it computes, so a DEQ finetune can start from the flagship's quality
instead of restarting the lineage from scratch:

* each widened layer duplicates ``k`` of its output channels (chosen
  uniformly without replacement);
* the interposed BatchNorm duplicates the matching scale/bias and
  running mean/var entries (BN is per-channel, so BN(copy) == BN(src));
* every consumer of that layer splits the duplicated channel's outgoing
  weights asymmetrically: ``w -> (alpha*w, (1-alpha)*w)`` with
  ``alpha ~ U[0.4, 0.6]``. Since ReLU(src) == ReLU(copy), the consumer's
  pre-activation is ``alpha*w*a + (1-alpha)*w*a = w*a`` — exact — while
  the asymmetric split breaks the gradient symmetry that would otherwise
  keep the pair identical forever (the classic Net2Net dead-twin issue).

Exactness caveat: under the packed-split2 conv scheme the bf16 weight
rounding of ``alpha*w`` differs from ``alpha * bf16(w)``, and the f32
accumulation order changes, so widened-vs-original agreement is to
accumulation noise (~1e-6 relative at 'highest', ~1e-3 at 'packed'),
not bitwise.

Layer layout assumed (nets/ffdnet.FFDNet gray, nets/dncnn.DnCNN):
``conv0 .. conv{L-1}`` with optional ``bn1 .. bn{L-2}``; hidden width =
conv0's output dim; conv{L-1} is the head (output dim preserved).
"""

from __future__ import annotations

import numpy as np


def _widen_inputs(kernel: np.ndarray, idx: np.ndarray,
                  alpha: np.ndarray) -> np.ndarray:
    """Split consumer rows: (3,3,Cin,Co) -> (3,3,Cin+k,Co), exact."""
    kernel = np.array(kernel, dtype=np.float32, copy=True)
    extra = kernel[:, :, idx, :] * (1.0 - alpha)[None, None, :, None]
    kernel[:, :, idx, :] *= alpha[None, None, :, None]
    return np.concatenate([kernel, extra], axis=2)


def widen_hidden(variables, new_feats: int, seed: int = 0):
    """Widen every hidden layer of a conv0..convN stack to ``new_feats``.

    ``variables``: flax variables dict ({'params': ..., 'batch_stats': ...})
    as stored in native checkpoints. Returns a new variables dict of the
    same structure; does not mutate the input.
    """
    rng = np.random.default_rng(seed)
    params = {k: dict(v) for k, v in variables["params"].items()}
    stats = {k: dict(v) for k, v in
             variables.get("batch_stats", {}).items()}

    conv_ids = sorted(int(n[4:]) for n in params if n.startswith("conv"))
    if conv_ids != list(range(len(conv_ids))):
        raise ValueError(f"non-contiguous conv stack: {conv_ids}")
    head = conv_ids[-1]
    old = int(params["conv0"]["kernel"].shape[-1])
    k = int(new_feats) - old
    if k <= 0:
        raise ValueError(f"new_feats {new_feats} must exceed current {old}")

    prev_idx = prev_alpha = None
    for i in conv_ids:
        name = f"conv{i}"
        kernel = np.asarray(params[name]["kernel"], dtype=np.float32)
        if prev_idx is not None:
            kernel = _widen_inputs(kernel, prev_idx, prev_alpha)
        if i < head:
            idx = rng.choice(kernel.shape[-1], size=k, replace=False)
            alpha = rng.uniform(0.4, 0.6, size=k).astype(np.float32)
            kernel = np.concatenate([kernel, kernel[..., idx]], axis=-1)
            bn = f"bn{i}"
            if bn in params:
                params[bn] = {key: np.concatenate(
                    [np.asarray(v), np.asarray(v)[idx]])
                    for key, v in params[bn].items()}
            if bn in stats:
                stats[bn] = {key: np.concatenate(
                    [np.asarray(v), np.asarray(v)[idx]])
                    for key, v in stats[bn].items()}
            prev_idx, prev_alpha = idx, alpha
        params[name] = dict(params[name], kernel=kernel)

    out = dict(variables)
    out["params"] = params
    if stats:
        out["batch_stats"] = stats
    return out
