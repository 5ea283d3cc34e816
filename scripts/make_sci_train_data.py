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


def _smooth_noise(rng, h, w, cells):
    """Multi-scale smooth random texture: bilinear-upsampled coarse grids
    (a cheap Perlin analog) — natural-image-like piecewise-smooth content."""
    out = np.zeros((h, w), np.float32)
    amp = 1.0
    for c in cells:
        g = rng.standard_normal((c + 1, c + 1)).astype(np.float32)
        ys = np.linspace(0, c, h, dtype=np.float32)
        xs = np.linspace(0, c, w, dtype=np.float32)
        y0 = np.minimum(ys.astype(np.int32), c - 1)
        x0 = np.minimum(xs.astype(np.int32), c - 1)
        fy = (ys - y0)[:, None]
        fx = (xs - x0)[None, :]
        out += amp * ((1 - fy) * (1 - fx) * g[y0[:, None], x0[None, :]]
                      + (1 - fy) * fx * g[y0[:, None], x0[None, :] + 1]
                      + fy * (1 - fx) * g[y0[:, None] + 1, x0[None, :]]
                      + fy * fx * g[y0[:, None] + 1, x0[None, :] + 1])
        amp *= 0.55
    return out


def synthetic_clip(rng, h=256, w=256, t=8):
    """Procedural 8-frame gray clip: a translating multi-scale smooth
    texture plus sine gratings and moving occluders (discs, rectangles,
    bars) with varied contrast and velocities. Diversifies the tiny bundled
    corpus toward natural-video statistics: piecewise-smooth backgrounds,
    sharp moving edges, occlusion."""
    yy, xx = np.meshgrid(np.arange(h, dtype=np.float32),
                         np.arange(w, dtype=np.float32), indexing="ij")
    base = _smooth_noise(rng, h, w, cells=(4, 8, 16, 32))
    base = base / (np.abs(base).max() + 1e-6)
    for _ in range(rng.integers(0, 3)):
        fx, fy = rng.uniform(0.5, 8, 2) / 256.0
        ph = rng.uniform(0, 2 * np.pi)
        base += rng.uniform(0.05, 0.25) * np.sin(
            2 * np.pi * (fx * xx + fy * yy) + ph)
    vx, vy = rng.uniform(-5, 5, 2)

    shapes = []
    for _ in range(rng.integers(1, 5)):
        kind = rng.choice(["disc", "rect", "bar"])
        cx, cy = rng.uniform(30, min(h, w) - 30, 2)
        sv = rng.uniform(-7, 7, 2)
        a = rng.uniform(-0.8, 0.8)
        if abs(a) < 0.2:
            a = np.sign(a or 1) * 0.2
        if kind == "disc":
            geo = (rng.uniform(8, 55),)
        elif kind == "rect":
            geo = (rng.uniform(10, 60), rng.uniform(10, 60))
        else:  # bar
            geo = (rng.uniform(4, 14), rng.uniform(0, np.pi))
        shapes.append((kind, cx, cy, sv, a, geo))

    gain = rng.uniform(0.85, 1.15)          # per-clip contrast
    drift = rng.uniform(-0.02, 0.02)        # per-frame brightness drift
    frames = []
    for ti in range(t):
        f = np.roll(np.roll(base, int(round(ti * vy)), 0),
                    int(round(ti * vx)), 1).copy()
        for kind, cx, cy, sv, a, geo in shapes:
            px, py = cx + ti * sv[0], cy + ti * sv[1]
            if kind == "disc":
                m = ((xx - px) ** 2 + (yy - py) ** 2) < geo[0] ** 2
            elif kind == "rect":
                m = ((np.abs(xx - px) < geo[0] / 2)
                     & (np.abs(yy - py) < geo[1] / 2))
            else:
                th = geo[1]
                d = np.abs((xx - px) * np.sin(th) - (yy - py) * np.cos(th))
                m = d < geo[0] / 2
            f = np.where(m, f * 0.3 + a, f)  # occlusion, not pure additive
        f = f * gain + ti * drift
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
