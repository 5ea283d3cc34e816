"""End-to-end PSNR + speed of body-conv precision schemes (DE-GAP-CNN).

Schemes (64->64 body convs only; edges stay at the production fast paths):
  high     f32 activations, Precision.HIGH (production default)
  bf16     one-pass bf16 (round-1: rejected at -0.67 dB)
  split2   x split into bf16 hi+lo via lax.reduce_precision, W rounded to
           bf16 once: y = conv(xh, Wb) + conv(xl, Wb). Corrects the
           *dynamic* activation rounding (the part that compounds over the
           fixed-point iteration) but keeps the *static* weight rounding.
  split3   + conv(xh, Wl): the full 3-pass HIGH decomposition, done
           manually (sanity check — should match `high` closely).

Protocol: cnn.ckpt, Anderson m=5 max_iter=100 tol=1e-5, drop8/runner8/
traffic, PSNR on clip(0,1) (reference protocol). Times are full-solve,
host-fetch synced.

Usage: python scripts/precision_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REFERENCE = "/root/reference"


def main():
    import flax.linen as nn
    import jax
    import jax.numpy as jnp
    from jax import lax
    from deqsci_tpu.data.sci_mat import SCITestDataset
    from deqsci_tpu.io.torch_ckpt import convert_dncnn
    from deqsci_tpu.maps.gap_sci import make_gap_sci_step
    from deqsci_tpu.nets.dncnn import FastInputConv, StencilHeadConv
    from deqsci_tpu.recon import make_reconstructor
    from deqsci_tpu.train.eval import FIRST_SNAPSHOT_ONLY, snapshots_of
    from deqsci_tpu.train.metrics import psnr

    def body_conv(x, w, mode):
        dn = lax.conv_dimension_numbers(x.shape, w.shape,
                                        ("NHWC", "HWIO", "NHWC"))

        def c(a, b, **kw):
            return lax.conv_general_dilated(a, b, (1, 1), "SAME",
                                            dimension_numbers=dn, **kw)
        if mode == "high":
            return c(x, w, precision=lax.Precision.HIGH)
        wb = w.astype(jnp.bfloat16)
        if mode == "bf16":
            return c(x.astype(jnp.bfloat16), wb,
                     preferred_element_type=jnp.float32)
        xh = lax.reduce_precision(x, 8, 7)
        xl = (x - xh).astype(jnp.bfloat16)
        xh = xh.astype(jnp.bfloat16)
        y = (c(xh, wb, preferred_element_type=jnp.float32)
             + c(xl, wb, preferred_element_type=jnp.float32))
        if mode == "split2":
            return y
        # split3: + xh against the weight low part
        wh = lax.reduce_precision(w, 8, 7)
        wl = (w - wh).astype(jnp.bfloat16)
        return y + c(xh, wl, preferred_element_type=jnp.float32)

    class VarDnCNN(nn.Module):
        mode: str = "high"
        features: int = 64
        num_layers: int = 4

        @nn.compact
        def __call__(self, x):
            x = nn.relu(FastInputConv(self.features, name="conv0")(x))
            for i in range(1, self.num_layers - 1):
                w = self.param(f"conv{i}_kernel",
                               nn.initializers.lecun_normal(),
                               (3, 3, self.features, self.features))
                x = nn.relu(body_conv(x, w, self.mode))
            return StencilHeadConv(1, name=f"conv{self.num_layers - 1}")(x)

    variables, _ = convert_dncnn(os.path.join(REFERENCE, "models/cnn.ckpt"))
    # remap param tree: nn.Conv stores kernel under conv{i}/kernel
    p = variables["params"]
    newp = {}
    for k, v in p.items():
        if k in ("conv1", "conv2"):
            newp[f"{k}_kernel"] = v["kernel"]
        else:
            newp[k] = v
    var2 = {"params": newp}

    ds = SCITestDataset(os.path.join(REFERENCE, "data/test_gray"))
    clips = []
    for data in ds:
        meas = snapshots_of(data["meas"])
        if any(pat in data["file"] for pat in FIRST_SNAPSHOT_ONLY):
            meas = meas[:1]
        clips.append((data["file"], jnp.asarray(meas),
                      jnp.asarray(data["mask"]), np.asarray(data["gt"])))

    for mode in ["high", "bf16", "split2", "split3"]:
        net = VarDnCNN(mode=mode)
        step = make_gap_sci_step(lambda pp, x: net.apply(pp, x),
                                 tag="denoiser")
        recon = make_reconstructor(step, m=5, lam=1e-2, beta=1.0,
                                   max_iter=100, tol=1e-5)
        scores, total_t, frames = [], 0.0, 0
        for fname, meas, mask, gt in clips:
            float(jnp.sum(recon(var2, meas, mask)))  # compile
        for fname, meas, mask, gt in clips:
            t0 = time.perf_counter()
            out = recon(var2, meas, mask)
            s = float(jnp.sum(out))
            total_t += time.perf_counter() - t0
            frames += out.shape[0] * out.shape[-1]
            o = np.clip(np.asarray(out), 0, 1)
            ps = []
            for fi in range(out.shape[0]):
                g = gt[..., fi * 8:(fi + 1) * 8]
                ps.append(float(psnr(jnp.asarray(o[fi]), jnp.asarray(g))))
            scores.append(np.mean(ps))
        print(f"{mode:8s} avg {np.mean(scores):.3f} dB "
              f"({', '.join(f'{s:.3f}' for s in scores)})  "
              f"{frames / total_t:.1f} frames/s", flush=True)


if __name__ == "__main__":
    main()
