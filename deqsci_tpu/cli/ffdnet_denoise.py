"""Standalone FFDNet denoising CLI (the IPOL demo surface).

Rebuild of networks/ffdnet/test_ffdnet_ipol.py: denoise a grayscale image
(or every frame of a directory of frames — the ``ffdnet_vdenoiser`` video
path, lines 99-175) at a given noise level, optionally adding the noise
first for evaluation.

  python -m deqsci_tpu.cli.ffdnet_denoise --input img.png --sigma 25 \
      --ckpt models/ffdnet_demo [--add_noise]
"""

from __future__ import annotations

import argparse
import os


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True,
                    help="image file or directory of frames")
    ap.add_argument("--output", default="")
    ap.add_argument("--sigma", type=float, default=25.0,
                    help="noise level in [0, 255] units")
    ap.add_argument("--ckpt", required=True,
                    help="orbax dir (native) or torch .ckpt/.pth")
    ap.add_argument("--add_noise", action="store_true")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deqsci_tpu.nets.ffdnet import FFDNet
    from deqsci_tpu.train.metrics import psnr_np

    net = FFDNet(in_channels=1)
    if os.path.isdir(args.ckpt):
        import orbax.checkpoint as ocp
        snap = ocp.StandardCheckpointer().restore(os.path.abspath(args.ckpt))
        variables = snap["params"]
        if "params" not in variables:
            variables = {"params": variables}
    else:
        from deqsci_tpu.io.torch_ckpt import convert_ffdnet
        variables, _ = convert_ffdnet(args.ckpt)

    sigma = args.sigma / 255.0

    if os.path.isdir(args.input):
        files = sorted(os.path.join(args.input, f)
                       for f in os.listdir(args.input)
                       if f.lower().endswith((".png", ".jpg", ".jpeg")))
    else:
        files = [args.input]

    @jax.jit
    def denoise(x):
        s = jnp.full((x.shape[0],), sigma, x.dtype)
        return x - net.apply(variables, x, s)

    rng = np.random.default_rng(args.seed)
    outdir = args.output or os.path.dirname(files[0]) or "."
    os.makedirs(outdir, exist_ok=True)
    for f in files:
        img = cv2.imread(f, cv2.IMREAD_GRAYSCALE)
        x = np.float32(img) / 255.0
        # pad to even dims for the 2x2 mosaic
        ph, pw = x.shape[0] % 2, x.shape[1] % 2
        if ph or pw:
            x = np.pad(x, ((0, ph), (0, pw)), mode="edge")
        clean = x.copy()
        if args.add_noise:
            x = x + sigma * rng.standard_normal(x.shape).astype(np.float32)
        den = np.asarray(denoise(jnp.asarray(x)[None, ..., None]))[0, ..., 0]
        den = den[: den.shape[0] - ph, : den.shape[1] - pw]
        name = os.path.splitext(os.path.basename(f))[0]
        out_path = os.path.join(outdir, f"{name}_ffdnet.png")
        cv2.imwrite(out_path, np.round(np.clip(den, 0, 1) * 255)
                    .astype(np.uint8))
        msg = f"{f} -> {out_path}"
        if args.add_noise:
            msg += (f"  noisy {psnr_np(clean, np.clip(x, 0, 1)):.2f} dB"
                    f" -> denoised {psnr_np(clean, np.clip(den, 0, 1)):.2f} dB")
        print(msg, flush=True)


if __name__ == "__main__":
    main()
