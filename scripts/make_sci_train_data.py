"""Synthesize a DAVIS-style SCI training set from the bundled clips.

The reference trains on gt/measurement .mat pairs plus a shared mask.mat
(utils/sci_dataloader.py:218-239); the DAVIS data is not bundled. This
cuts the bundled benchmark gt videos into 8-frame (H, W, 8) samples,
simulates measurements with a shared random binary mask, and writes
scipy .mat files in the exact directory layout the training CLI expects.

Usage: python scripts/make_sci_train_data.py --out ./data/sci_train
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import scipy.io as sio


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="./data/sci_train")
    ap.add_argument("--source", default="/root/reference/data/test_gray")
    ap.add_argument("--seed", type=int, default=7)
    args = ap.parse_args()

    from deqsci_tpu.data.sci_mat import SCITestDataset

    gt_dir = os.path.join(args.out, "gt")
    meas_dir = os.path.join(args.out, "measurement")
    os.makedirs(gt_dir, exist_ok=True)
    os.makedirs(meas_dir, exist_ok=True)

    rng = np.random.default_rng(args.seed)
    mask = (rng.random((256, 256, 8)) > 0.5).astype(np.float64)
    sio.savemat(os.path.join(args.out, "mask.mat"), {"mask": mask})

    n = 0
    for data in SCITestDataset(args.source):
        gt = data["gt"]  # (H, W, F) in [0,1]
        for s in range(gt.shape[-1] // 8):
            sample = gt[..., s * 8:(s + 1) * 8]
            meas = np.sum(sample * mask, axis=-1)
            name = f"sample_{n:04d}.mat"
            # loaders divide by 255 (utils/sci_dataloader.py:169,179)
            sio.savemat(os.path.join(gt_dir, name),
                        {"patch_save": sample * 255.0})
            sio.savemat(os.path.join(meas_dir, name),
                        {"meas": meas * 255.0})
            n += 1
    print(f"wrote {n} samples + mask.mat under {args.out}", flush=True)


if __name__ == "__main__":
    main()
