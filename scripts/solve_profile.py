"""Apportion the DE-GAP-CNN / DE-GAP-FFDNet solve cost by component.

Differential timing (t(2K iters) - t(K iters)) removes the per-call
overhead of the axon runtime (~30-40 ms per jit call) and the fixed
head/tail work, giving honest per-iteration costs. Variants:

  full            production reconstructor (Anderson)
  picard          same step, plain iteration (isolates Anderson algebra)
  gap-only        identity denoiser (isolates physics + solver)
  net-only        denoiser without the GAP physics step

Usage: python scripts/solve_profile.py [cnn|ffdnet]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

REFERENCE = "/root/reference"


def sync_time(fn, *args, reps=3):
    import jax.numpy as jnp
    float(jnp.sum(fn(*args)))
    ts = []
    for _ in range(reps):
        t0 = time.perf_counter()
        float(jnp.sum(fn(*args)))
        ts.append(time.perf_counter() - t0)
    return min(ts)


def main():
    which = sys.argv[1] if len(sys.argv) > 1 else "cnn"
    import jax
    import jax.numpy as jnp
    from deqsci_tpu.data.sci_mat import load_test_data
    from deqsci_tpu.fp.picard import picard
    from deqsci_tpu.io.torch_ckpt import convert_dncnn
    from deqsci_tpu.maps.gap_sci import make_gap_sci_step
    from deqsci_tpu.nets.dncnn import DnCNN
    from deqsci_tpu.ops.sensing import gap_update
    from deqsci_tpu.recon import make_reconstructor
    from deqsci_tpu.train.metrics import psnr

    d = load_test_data(os.path.join(REFERENCE,
                                    "data/test_gray/drop8_cacti.mat"))
    meas = d["meas"] if d["meas"].ndim == 3 else d["meas"][..., None]
    meas = np.moveaxis(meas, -1, 0)[:1]
    mask = jnp.asarray(d["mask"])
    gt = jnp.asarray(d["gt"][..., :8])
    y = jnp.asarray(meas)

    if which == "cnn":
        variables, _ = convert_dncnn(os.path.join(REFERENCE,
                                                  "models/cnn.ckpt"))
        net = DnCNN(num_layers=4, use_bn=False)
        base_step = make_gap_sci_step(lambda p, x: net.apply(p, x),
                                      tag="denoiser")
        k1, k2 = 50, 100

        def net_only_step(params, z, k, args):
            from deqsci_tpu.maps.gap_sci import (batch_to_frames,
                                                 frames_to_batch)
            b = z.shape[0]
            return z - batch_to_frames(
                net.apply(params, frames_to_batch(z)), b)
    else:
        import orbax.checkpoint as ocp
        from deqsci_tpu.nets.ffdnet import FFDNet
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        snap = ocp.StandardCheckpointer().restore(
            os.path.abspath(os.path.join(repo, "models/ffdnet_demo_ft")))
        variables = snap["params"] if "params" in snap else snap
        net = FFDNet(in_channels=1)
        base_step = make_gap_sci_step(lambda p, x, s: net.apply(p, x, s),
                                      tag="ffdnet", sigma_min=10.0 / 255.0)
        k1, k2 = 90, 180

        def net_only_step(params, z, k, args):
            from deqsci_tpu.maps.gap_sci import (batch_to_frames,
                                                 frames_to_batch)
            b = z.shape[0]
            x = frames_to_batch(z)
            sigma = jnp.full((x.shape[0],), 0.1, dtype=z.dtype)
            return z - batch_to_frames(net.apply(params, x, sigma), b)

    def gap_only_step(params, z, k, args):
        yv, Phi, Phi_sum = args
        return gap_update(z, yv, Phi, Phi_sum)

    variants = [
        ("full (anderson)", base_step, {}),
        ("picard same step", base_step, dict(solver=picard)),
        ("gap-only (anderson)", gap_only_step, {}),
        ("net-only (picard)", net_only_step, dict(solver=picard)),
    ]

    for name, step, kw in variants:
        r1 = make_reconstructor(step, m=5, lam=1e-2, beta=1.0,
                                max_iter=k1, tol=0.0, **kw)
        r2 = make_reconstructor(step, m=5, lam=1e-2, beta=1.0,
                                max_iter=k2, tol=0.0, **kw)
        t1 = sync_time(r1, variables, y, mask)
        t2 = sync_time(r2, variables, y, mask)
        per = (t2 - t1) / (k2 - k1)
        print(f"{name:28s} {per*1e3:7.3f} ms/iter "
              f"(t{k1}={t1*1e3:.0f} ms, t{k2}={t2*1e3:.0f} ms)", flush=True)

    full = make_reconstructor(base_step, m=5, lam=1e-2, beta=1.0,
                              max_iter=k2 if which == "ffdnet" else 100,
                              tol=1e-5)
    out = full(variables, y, mask)
    print(f"PSNR check: {float(psnr(jnp.clip(out[0], 0, 1), gt)):.3f} dB",
          flush=True)


if __name__ == "__main__":
    main()
