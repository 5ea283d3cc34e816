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


def synthetic_clip(rng, h=256, w=256, t=8):
    """Procedural 8-frame gray clip: translating sine textures + moving
    shapes with varied contrast (diversifies the tiny bundled corpus)."""
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    base = np.zeros((h, w), np.float32)
    for _ in range(rng.integers(2, 5)):
        fx, fy = rng.uniform(0.5, 8, 2) / 256.0
        ph = rng.uniform(0, 2 * np.pi)
        base += rng.uniform(0.1, 0.4) * np.sin(
            2 * np.pi * (fx * xx + fy * yy) + ph)
    vx, vy = rng.uniform(-4, 4, 2)
    frames = []
    shapes = []
    for _ in range(rng.integers(1, 4)):
        cx, cy = rng.uniform(40, 216, 2)
        r = rng.uniform(10, 50)
        sv = rng.uniform(-6, 6, 2)
        a = rng.uniform(0.2, 0.8)
        shapes.append([cx, cy, r, sv[0], sv[1], a])
    for ti in range(t):
        f = np.roll(np.roll(base, int(ti * vy), 0), int(ti * vx), 1).copy()
        for cx, cy, r, svx, svy, a in shapes:
            m = ((xx - (cx + ti * svx)) ** 2
                 + (yy - (cy + ti * svy)) ** 2) < r ** 2
            f = f + a * m
        f = (f - f.min()) / (np.ptp(f) + 1e-6)
        frames.append(f)
    return np.stack(frames, -1).astype(np.float64)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--out", default="./data/sci_train")
    ap.add_argument("--source", default="/root/reference/data/test_gray")
    ap.add_argument("--seed", type=int, default=7)
    ap.add_argument("--synthetic", type=int, default=0,
                    help="additionally generate N procedural clips")
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
    for _ in range(args.synthetic):
        sample = synthetic_clip(rng)
        meas = np.sum(sample * mask, axis=-1)
        name = f"synth_{n:04d}.mat"
        sio.savemat(os.path.join(gt_dir, name),
                    {"patch_save": sample * 255.0})
        sio.savemat(os.path.join(meas_dir, name), {"meas": meas * 255.0})
        n += 1
    print(f"wrote {n} samples + mask.mat under {args.out}", flush=True)


if __name__ == "__main__":
    main()
