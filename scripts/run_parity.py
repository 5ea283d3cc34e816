"""Full-protocol parity + baseline measurement.

Runs the torch-CPU oracle (tests/oracle/torch_pipeline.py — the reference
semantics; the upstream code itself cannot run here: hard-coded .cuda() and
the removed torch.solve API) and the deqsci_tpu pipeline on TPU over the
bundled gray benchmarks, with the reference protocol (drop/runner: first
snapshot only). Writes PARITY.md and BASELINE_MEASURED.json at the repo
root.

Usage:  python scripts/run_parity.py [--skip-oracle]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REFERENCE = "/root/reference"
TEST_DIR = os.path.join(REFERENCE, "data/test_gray")
CONFIGS = {
    "DE-GAP-CNN": dict(ckpt=os.path.join(REFERENCE, "models/cnn.ckpt"),
                       max_iter=100),
    "DE-GAP-RSN-CNN": dict(ckpt=os.path.join(REFERENCE, "models/rsn_cnn.ckpt"),
                           max_iter=100),
}


def run_oracle(cfg):
    import torch
    torch.set_num_threads(os.cpu_count())
    from tests.oracle.torch_pipeline import (SimpleCNNOracle,
                                             reconstruct_clip_oracle)
    from deqsci_tpu.data.sci_mat import SCITestDataset

    net = SimpleCNNOracle().load_reference(cfg["ckpt"]).eval()
    ds = SCITestDataset(TEST_DIR)
    out = {}
    total_frames = 0
    t0 = time.time()
    for data in ds:
        name = data["file"]
        first = ("drop" in name) or ("runner" in name)
        recs, psnrs = reconstruct_clip_oracle(net, "denoiser", data,
                                              max_iter=cfg["max_iter"],
                                              first_only=first)
        out[name] = dict(psnr=float(np.mean(psnrs)),
                         psnr_per_snapshot=[float(p) for p in psnrs])
        total_frames += recs.shape[0] * recs.shape[-1]
        print(f"[oracle] {name}: {np.mean(psnrs):.3f} dB", flush=True)
    dt = time.time() - t0
    return dict(files=out,
                avg_psnr=float(np.mean([v["psnr"] for v in out.values()])),
                wall_s=dt, frames=total_frames,
                frames_per_s=total_frames / dt)


def run_tpu(cfg):
    import jax
    import jax.numpy as jnp
    from deqsci_tpu.data.sci_mat import SCITestDataset
    from deqsci_tpu.io.torch_ckpt import convert_dncnn
    from deqsci_tpu.maps.gap_sci import make_gap_sci_step
    from deqsci_tpu.nets.dncnn import DnCNN
    from deqsci_tpu.recon import make_reconstructor
    from deqsci_tpu.train.eval import evaluate_dataset, evaluate_file

    print("[tpu] devices:", jax.devices(), flush=True)
    variables, _ = convert_dncnn(cfg["ckpt"])
    net = DnCNN(num_layers=4, use_bn=False, precision="high")  # exact-parity path
    step = make_gap_sci_step(lambda p, x: net.apply(p, x), tag="denoiser")
    recon = make_reconstructor(step, m=5, lam=1e-2, beta=1.0,
                               max_iter=cfg["max_iter"], tol=1e-5)
    ds = SCITestDataset(TEST_DIR)

    # warm-up/compile pass
    summary = evaluate_dataset(recon, variables, ds, verbose=True)

    # timed pass (compile cached)
    t0 = time.time()
    total_frames = 0
    for data in ds:
        r = evaluate_file(recon, variables, data, compute_ssim=False)
        total_frames += r["recon"].shape[0] * r["recon"].shape[-1]
    dt = time.time() - t0
    summary["wall_s"] = dt
    summary["frames"] = total_frames
    summary["frames_per_s"] = total_frames / dt
    return summary


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--skip-oracle", action="store_true",
                    help="reuse oracle numbers from BASELINE_MEASURED.json")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    prior = {}
    prior_path = os.path.join(repo, "BASELINE_MEASURED.json")
    if args.skip_oracle and os.path.exists(prior_path):
        with open(prior_path) as f:
            prior = json.load(f)

    results = {}
    for name, cfg in CONFIGS.items():
        print(f"===== {name} =====", flush=True)
        entry = {}
        entry["tpu"] = run_tpu(cfg)
        if args.skip_oracle:
            if name in prior and "oracle" in prior[name]:
                entry["oracle"] = prior[name]["oracle"]
        else:
            entry["oracle"] = run_oracle(cfg)
        results[name] = entry
    with open(os.path.join(repo, "BASELINE_MEASURED.json"), "w") as f:
        json.dump(results, f, indent=2)

    lines = ["# PARITY — deqsci_tpu (TPU) vs reference semantics (torch-CPU oracle)",
             "",
             "Oracle = tests/oracle/torch_pipeline.py (reference semantics on",
             "torch CPU; the upstream code cannot run here). Protocol =",
             "training/sci_equilibrium_training.py:152-205 (drop/runner first",
             "snapshot only, PSNR on clip(0,1), data_range 1).", ""]
    for name, entry in results.items():
        lines.append(f"## {name}")
        lines.append("")
        lines.append("| file | TPU PSNR (dB) | oracle PSNR (dB) | gap |")
        lines.append("|---|---|---|---|")
        tpu_files = {f["file"]: f for f in entry["tpu"]["files"]}
        oracle_files = entry.get("oracle", {}).get("files", {})
        for fname, tf in tpu_files.items():
            of = oracle_files.get(fname)
            if of:
                lines.append(f"| {fname} | {tf['psnr']:.3f} | {of['psnr']:.3f} "
                             f"| {tf['psnr'] - of['psnr']:+.3f} |")
            else:
                lines.append(f"| {fname} | {tf['psnr']:.3f} | — | — |")
        t = entry["tpu"]
        lines.append("")
        lines.append(f"TPU avg {t['avg_psnr']:.3f} dB, "
                     f"{t['frames_per_s']:.1f} frames/s (1 chip).")
        if "oracle" in entry:
            o = entry["oracle"]
            lines.append(f"Oracle avg {o['avg_psnr']:.3f} dB, "
                         f"{o['frames_per_s']:.2f} frames/s (torch CPU, "
                         f"{os.cpu_count()} threads). "
                         f"Speedup: {t['frames_per_s'] / o['frames_per_s']:.1f}x.")
        lines.append("")
    extra = os.path.join(repo, "PARITY_ffdnet.md")
    if os.path.exists(extra):
        with open(extra) as f:
            lines.append(f.read())
    # measurement notes and per-round results added by hand live BELOW
    # the marker in the existing PARITY.md — regenerating the golden
    # tables must not clobber them
    marker = ("<!-- hand-maintained sections below: "
              "preserved by scripts/run_parity.py -->")
    parity_path = os.path.join(repo, "PARITY.md")
    if os.path.exists(parity_path):
        with open(parity_path) as f:
            old = f.read()
        if marker in old:
            lines.append(old[old.index(marker):])
    with open(parity_path, "w") as f:
        f.write("\n".join(lines))
    print("wrote PARITY.md and BASELINE_MEASURED.json", flush=True)


if __name__ == "__main__":
    main()
