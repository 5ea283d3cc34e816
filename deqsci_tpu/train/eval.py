"""Benchmark evaluation protocol — PSNR/SSIM over the gray SCI test set.

Reproduces ``test_solver_sci`` (training/sci_equilibrium_training.py:152-205):

* per .mat file, snapshots are reconstructed independently;
* files whose name contains ``drop`` or ``runner`` are evaluated on the
  first snapshot only (lines 167-168);
* per-snapshot PSNR = psnr(recon.clip(0,1), gt_slice) over the full
  (H, W, T) arrays; per-file score = mean over snapshots; overall = mean
  over files ("Total Average PSNR", line 198-200);
* SSIM added with the same averaging (paper metric; vendored-but-unused in
  the reference).
"""

from __future__ import annotations

from typing import Callable, Dict, Optional

import jax
import jax.numpy as jnp
import numpy as np

from deqsci_tpu.train.metrics import psnr, ssim

FIRST_SNAPSHOT_ONLY = ("drop", "runner")


def snapshots_of(meas: np.ndarray) -> np.ndarray:
    """(H, W) or (H, W, S) measurement -> (S, H, W)."""
    if meas.ndim == 2:
        return meas[None]
    return np.moveaxis(meas, -1, 0)


def evaluate_file(recon: Callable, params, data: Dict[str, np.ndarray],
                  frames_per_snapshot: Optional[int] = None,
                  compute_ssim: bool = True) -> Dict[str, object]:
    """Reconstruct one benchmark file and score it.

    ``frames_per_snapshot`` defaults to the mask's temporal depth
    (``mask.shape[-1]``); the reference hardcodes 8
    (training/sci_equilibrium_training.py:172,185) but the framework
    supports arbitrary T.
    """
    name = data.get("file", "")
    meas = snapshots_of(data["meas"])
    if any(p in name for p in FIRST_SNAPSHOT_ONLY):
        meas = meas[:1]
    s = meas.shape[0]
    t = (frames_per_snapshot if frames_per_snapshot is not None
         else data["mask"].shape[-1])

    rec = recon(params, jnp.asarray(meas), jnp.asarray(data["mask"]))
    gt = np.moveaxis(
        data["gt"][..., : s * t].reshape(data["gt"].shape[0],
                                         data["gt"].shape[1], s, t),
        2, 0)  # (S, H, W, T)

    rec_c = jnp.clip(rec, 0, 1)
    gt_j = jnp.asarray(gt)
    psnrs = jax.vmap(psnr)(rec_c, gt_j)
    out = {
        "file": name,
        "psnr": float(jnp.mean(psnrs)),
        "psnr_per_snapshot": np.asarray(psnrs).tolist(),
        "recon": np.asarray(rec),
    }
    if compute_ssim:
        # (H, W, T) with frames as channels — pytorch_ssim's per-channel
        # Gaussian filtering treats the frame axis the same way.
        ssims = jax.vmap(ssim)(rec_c, gt_j)
        out["ssim"] = float(jnp.mean(ssims))
    return out


def evaluate_dataset(recon: Callable, params, dataset,
                     verbose: bool = True,
                     compute_ssim: bool = True) -> Dict[str, object]:
    """Run the full protocol; returns per-file and average scores."""
    results = []
    for data in dataset:
        r = evaluate_file(recon, params, data, compute_ssim=compute_ssim)
        results.append(r)
        if verbose:
            extra = f"  SSIM: {r['ssim']:.4f}" if compute_ssim else ""
            print(f"{r['file']}  PSNR: {r['psnr']:.2f} dB{extra}", flush=True)
    avg_psnr = float(np.mean([r["psnr"] for r in results]))
    summary = {"files": [{k: v for k, v in r.items() if k != "recon"}
                         for r in results],
               "avg_psnr": avg_psnr}
    if compute_ssim:
        summary["avg_ssim"] = float(np.mean([r["ssim"] for r in results]))
    if verbose:
        print("---------------------------------",
              f"Total Average PSNR: {avg_psnr:.2f} dB", flush=True)
    return summary
