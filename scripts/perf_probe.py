"""Decompose the DE-GAP-CNN solve cost and test precision/solver variants.

Variants probed (each timed on the real chip, compile excluded):
  conv-only        100 sequential denoiser applications (lax.scan)
  gap+conv         + the GAP physics step (no Anderson algebra)
  full             the production Anderson solve
  full@HIGH        convs at Precision.HIGH (3-pass bf16) + PSNR delta
  full@DEFAULT     convs at bf16 (1-pass) + PSNR delta

Usage: python scripts/perf_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    import jax
    import jax.numpy as jnp
    from deqsci_tpu.data.sci_mat import load_test_data
    from deqsci_tpu.io.torch_ckpt import convert_dncnn
    from deqsci_tpu.maps.gap_sci import make_gap_sci_step
    from deqsci_tpu.nets.dncnn import DnCNN
    from deqsci_tpu.recon import make_reconstructor
    from deqsci_tpu.train.metrics import psnr
    from deqsci_tpu.utils.profiling import time_fn

    d = load_test_data("/root/reference/data/test_gray/drop8_cacti.mat")
    meas = d["meas"] if d["meas"].ndim == 3 else d["meas"][..., None]
    meas = np.moveaxis(meas, -1, 0)[:1]
    mask = jnp.asarray(d["mask"])
    gt = jnp.asarray(d["gt"][..., :8])
    y = jnp.asarray(meas)

    variables, _ = convert_dncnn("/root/reference/models/cnn.ckpt")

    def build(precision):
        net = DnCNN(num_layers=4, use_bn=False, precision=precision)
        step = make_gap_sci_step(lambda p, x: net.apply(p, x),
                                 tag="denoiser")
        recon = make_reconstructor(step, m=5, lam=1e-2, beta=1.0,
                                   max_iter=100, tol=1e-5)
        return net, step, recon

    net, step, recon = build("highest")

    # conv-only: 100 sequential denoiser calls on the frame batch
    x0 = jnp.zeros((8, 256, 256, 1))

    @jax.jit
    def conv_only(p, x):
        def body(c, _):
            return net.apply(p, c), None
        out, _ = jax.lax.scan(body, x, None, length=100)
        return out

    t = time_fn(conv_only, variables, x0)
    print(f"conv-only 100x: {t*1000:.1f} ms", flush=True)

    # gap+conv without Anderson (picard-style scan)
    from deqsci_tpu.ops.sensing import initial_point, phi_sum
    Phi = mask[None]
    ps = phi_sum(Phi)

    @jax.jit
    def gap_conv(p, y):
        z = initial_point(y, Phi)

        def body(c, k):
            return step(p, c, k, (y, Phi, ps)), None
        out, _ = jax.lax.scan(body, z, jnp.arange(100))
        return out

    t = time_fn(gap_conv, variables, y)
    print(f"gap+conv 100x (scan): {t*1000:.1f} ms", flush=True)

    for label, prec in [("full@HIGHEST", "highest"),
                        ("full@HIGH", "high"),
                        ("full@DEFAULT", "default")]:
        _, _, rc = build(prec)
        out = rc(variables, y, mask)
        p = float(psnr(jnp.clip(out[0], 0, 1), gt))
        t = time_fn(rc, variables, y, mask)
        print(f"{label}: {t*1000:.1f} ms  PSNR {p:.3f} dB", flush=True)


if __name__ == "__main__":
    main()
