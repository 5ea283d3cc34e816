"""Standalone FFDNet denoising CLI (the IPOL demo surface).

Rebuild of networks/ffdnet/test_ffdnet_ipol.py: denoise an image (or
every frame of a directory of frames — the ``ffdnet_vdenoiser`` video
path, lines 99-175) at a given noise level, optionally adding the noise
first for evaluation. Color inputs are autodetected and routed through
the 3-channel FFDNet (the reference's is_rgb/net_rgb.pth dispatch,
test_ffdnet_ipol.py:183-195); --gray forces the grayscale path.

  python -m deqsci_tpu.cli.ffdnet_denoise --input img.png --sigma 25 \
      --ckpt models/ffdnet_demo [--add_noise] [--gray]
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
    ap.add_argument("--gray", action="store_true",
                    help="force the grayscale path (default: color "
                    "inputs autodetect the 3-channel FFDNet, mirroring "
                    "the reference's is_rgb dispatch)")
    ap.add_argument("--seed", type=int, default=0)
    args = ap.parse_args(argv)

    import cv2
    import jax
    import jax.numpy as jnp
    import numpy as np

    from deqsci_tpu.nets.ffdnet import FFDNet
    from deqsci_tpu.train.metrics import psnr_np

    if os.path.isdir(args.input):
        files = sorted(os.path.join(args.input, f)
                       for f in os.listdir(args.input)
                       if f.lower().endswith((".png", ".jpg", ".jpeg")))
    else:
        files = [args.input]

    probe = cv2.imread(files[0], cv2.IMREAD_UNCHANGED)
    rgb = (not args.gray and probe is not None and probe.ndim == 3
           and probe.shape[2] >= 3
           and not (probe[..., 0] == probe[..., 1]).all())
    net = FFDNet(in_channels=3 if rgb else 1)
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

    @jax.jit
    def denoise(x):
        s = jnp.full((x.shape[0],), sigma, x.dtype)
        return x - net.apply(variables, x, s)

    rng = np.random.default_rng(args.seed)
    outdir = args.output or os.path.dirname(files[0]) or "."
    os.makedirs(outdir, exist_ok=True)
    for f in files:
        if rgb:
            img = cv2.cvtColor(cv2.imread(f, cv2.IMREAD_COLOR),
                               cv2.COLOR_BGR2RGB)
            x = np.float32(img) / 255.0
        else:
            img = cv2.imread(f, cv2.IMREAD_GRAYSCALE)
            x = np.float32(img)[..., None] / 255.0
        # pad to even dims for the 2x2 mosaic
        ph, pw = x.shape[0] % 2, x.shape[1] % 2
        if ph or pw:
            x = np.pad(x, ((0, ph), (0, pw), (0, 0)), mode="edge")
        clean = x.copy()
        if args.add_noise:
            x = x + sigma * rng.standard_normal(x.shape).astype(np.float32)
        den = np.asarray(denoise(jnp.asarray(x)[None]))[0]
        h0, w0 = den.shape[0] - ph, den.shape[1] - pw
        den, clean, x = den[:h0, :w0], clean[:h0, :w0], x[:h0, :w0]
        name = os.path.splitext(os.path.basename(f))[0]
        out_path = os.path.join(outdir, f"{name}_ffdnet.png")
        out_img = np.round(np.clip(den, 0, 1) * 255).astype(np.uint8)
        out_img = cv2.cvtColor(out_img, cv2.COLOR_RGB2BGR) if rgb \
            else out_img[..., 0]
        cv2.imwrite(out_path, out_img)
        msg = f"{f} -> {out_path}"
        if args.add_noise:
            msg += (f"  noisy {psnr_np(clean, np.clip(x, 0, 1)):.2f} dB"
                    f" -> denoised {psnr_np(clean, np.clip(den, 0, 1)):.2f} dB")
        print(msg, flush=True)


if __name__ == "__main__":
    main()
