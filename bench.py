"""Benchmark: SCI reconstruction throughput on one TPU chip.

Measures frames/sec of the runnable-now flagship (DE-GAP-CNN, cnn.ckpt,
Anderson m=5 max_iter=100 tol=1e-5 — test_cnn.sh config) over the bundled
gray benchmarks with the reference protocol. ``vs_baseline`` is the ratio
to the reference-semantics torch pipeline measured on this host's CPU
(BASELINE_MEASURED.json, produced by scripts/run_parity.py; the upstream
repo publishes no throughput numbers and its CUDA path cannot run here).

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
"""

import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.abspath(__file__)))

REFERENCE = "/root/reference"


def main():
    import jax.numpy as jnp
    from deqsci_tpu.data.sci_mat import SCITestDataset
    from deqsci_tpu.io.torch_ckpt import convert_dncnn
    from deqsci_tpu.maps.gap_sci import make_gap_sci_step
    from deqsci_tpu.nets.dncnn import DnCNN
    from deqsci_tpu.recon import make_reconstructor
    from deqsci_tpu.train.eval import FIRST_SNAPSHOT_ONLY, snapshots_of

    variables, _ = convert_dncnn(os.path.join(REFERENCE, "models/cnn.ckpt"))
    net = DnCNN(num_layers=4, use_bn=False)
    step = make_gap_sci_step(lambda p, x: net.apply(p, x), tag="denoiser")
    recon = make_reconstructor(step, m=5, lam=1e-2, beta=1.0,
                               max_iter=100, tol=1e-5)

    ds = SCITestDataset(os.path.join(REFERENCE, "data/test_gray"))
    clips = []
    for data in ds:
        meas = snapshots_of(data["meas"])
        if any(p in data["file"] for p in FIRST_SNAPSHOT_ONLY):
            meas = meas[:1]
        clips.append((jnp.asarray(meas), jnp.asarray(data["mask"])))

    # compile + warm-up (float() forces a real device->host sync; on some
    # tunnel runtimes block_until_ready returns before execution retires)
    import jax.numpy as _jnp
    for meas, mask in clips:
        float(_jnp.sum(recon(variables, meas, mask)))

    n_rounds = 3
    t0 = time.time()
    frames = 0
    checksum = _jnp.float32(0)
    for _ in range(n_rounds):
        for meas, mask in clips:
            out = recon(variables, meas, mask)
            checksum = checksum + _jnp.sum(out)
            frames += out.shape[0] * out.shape[-1]
    float(checksum)  # single synchronizing read after all work
    dt = time.time() - t0
    fps = frames / dt

    vs_baseline = None
    baseline_path = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                                 "BASELINE_MEASURED.json")
    if os.path.exists(baseline_path):
        with open(baseline_path) as f:
            base = json.load(f)
        ref_fps = base.get("DE-GAP-CNN", {}).get("oracle", {}).get(
            "frames_per_s")
        if ref_fps:
            vs_baseline = fps / ref_fps

    print(json.dumps({"metric": "sci_recon_throughput",
                      "value": round(fps, 3),
                      "unit": "frames/sec/chip",
                      "vs_baseline": (round(vs_baseline, 2)
                                      if vs_baseline else None)}))


if __name__ == "__main__":
    main()
