"""End-to-end verify drive on the default platform (the real chip).

The .claude/skills/verify recipe as a runnable file: synthetic
random-mask SCI reconstruction through the public API
(make_gap_sci_step + make_reconstructor) must beat the initial point by
a wide margin, and a jax.grad through make_deq (exact-IFT solver
backward) must be finite. Exists so the post-outage chip queue
(scripts/tpu_queue_r5c.sh) can re-certify the tunnel + compute path
before burning hours on training stages.
"""
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np
import jax
import jax.numpy as jnp

from deqsci_tpu.maps.gap_sci import make_gap_sci_step
from deqsci_tpu.recon import make_reconstructor
from deqsci_tpu.ops.sensing import A, initial_point, phi_sum
from deqsci_tpu.fp.deq import make_deq


def main():
    print("devices:", jax.devices(), flush=True)
    rng = np.random.default_rng(1)
    H = W = 64
    T = 8
    xx, yy = np.meshgrid(np.arange(W), np.arange(H))
    gt = np.stack(
        [0.5 + 0.4 * np.sin(2 * np.pi * (xx + 3 * t) / 32)
         * np.cos(2 * np.pi * (yy + 2 * t) / 32) for t in range(T)],
        -1).astype(np.float32)
    Phi = (rng.random((H, W, T)) > 0.5).astype(np.float32)
    y = A(jnp.asarray(gt)[None], jnp.asarray(Phi)[None])[0]

    def denoise(p, x):
        k = jnp.ones((3, 3, 1, 1), x.dtype) / 9.0
        blur = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME", dimension_numbers=("NHWC", "HWIO", "NHWC"))
        return (x - blur) * p["w"]

    recon = make_reconstructor(make_gap_sci_step(denoise, tag="denoiser"),
                               m=5, lam=1e-2, max_iter=60, tol=1e-5)
    out = recon({"w": jnp.float32(0.5)}, y[None], jnp.asarray(Phi))
    psnr = float(-10 * jnp.log10(jnp.mean((jnp.clip(out[0], 0, 1) - gt) ** 2)))
    print("recon PSNR:", psnr, flush=True)
    assert psnr > 18.0, psnr

    step = make_gap_sci_step(denoise, tag="denoiser")
    deq = make_deq(step, m=5, lam=1e-2, max_iter=30, tol=1e-5,
                   backward="solver")
    yb, Phib = y[None], jnp.asarray(Phi)[None]
    z0 = initial_point(yb, Phib)
    args = (yb, Phib, phi_sum(Phib))

    def loss(p):
        return jnp.mean((deq(p, z0, args)[0] - gt) ** 2)

    v, g = jax.value_and_grad(loss)({"w": jnp.float32(0.5)})
    print("loss", float(v), "grad", float(g["w"]), flush=True)
    assert np.isfinite(float(v)) and np.isfinite(float(g["w"]))
    print("VERIFY_OK", flush=True)


if __name__ == "__main__":
    main()
