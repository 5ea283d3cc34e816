"""Diagnostic: per-iteration dual-RMS / effective-sigma / PSNR trajectory
of the DE-ADMM-FFDNet solve (round-5 tail investigation).

Round-5 finding so far: sigma_min floors at the k=180 and k=100 schedule
values change NOTHING about the 100/180/260 curve (32.28/32.01/31.41
bit-identical) — so the dual-RMS floor coef*RMS(u) >= 0.0124 dominates the
decayed schedule everywhere past the knee, and the >180-iteration decay
must live in the dual trajectory itself. This script runs one unrolled
solve on drop8 and records, at every iteration k: RMS(u), the effective
sigma the denoiser saw, and PSNR vs gt — one chip program via lax.scan.

Usage: python scripts/admm_dual_trace.py [--maxiter 260] [--sigma_max 0]
"""

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TEST_GRAY = "/root/reference/data/test_gray"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="models/admm_ffdnet_r4")
    ap.add_argument("--maxiter", type=int, default=260)
    ap.add_argument("--sigma_dual", type=float, default=1.0)
    ap.add_argument("--sigma_max", type=float, default=0.0,
                    help="optional CAP on the effective sigma (0 = off): "
                         "sigma = min(max(sched, coef*RMS(u)), sigma_max)")
    ap.add_argument("--file", default="drop8_cacti.mat")
    ap.add_argument("--every", type=int, default=10)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    from deqsci_tpu.data.sci_mat import load_test_data
    from deqsci_tpu.maps.admm_sci import make_admm_sci_step
    from deqsci_tpu.ops.sensing import A as A_op
    from deqsci_tpu.ops.sensing import initial_point_admm, phi_sum
    from deqsci_tpu.train.metrics import psnr as psnr_fn
    from deqsci_tpu.zoo import build_denoiser, infer_denoiser_feats

    snap = ocp.StandardCheckpointer().restore(
        os.path.abspath(os.path.join(REPO, args.model)))
    variables = snap["params"] if "params" in snap else snap
    spec = build_denoiser("ffdnet", feats=infer_denoiser_feats(variables))
    step = make_admm_sci_step(spec.apply_fn(), tag=spec.tag,
                              sigma_dual_coef=args.sigma_dual,
                              **({"sigma_max": args.sigma_max}
                                 if args.sigma_max else {}))

    data = load_test_data(os.path.join(TEST_GRAY, args.file))
    gt = jnp.asarray(data["gt"][..., :8])[None]          # (1, H, W, 8)
    meas = jnp.asarray(data["meas"][..., 0])[None]       # (1, H, W)
    Phi = jnp.asarray(data["mask"])[None]                # (1, H, W, 8)
    ps = phi_sum(Phi)
    y = meas

    def body(carry, k):
        z, u = carry
        new = step(variables, (z, u), k, (y, Phi, ps))
        zn, un = new
        rms_u = jnp.sqrt(jnp.mean(un.astype(jnp.float32) ** 2))
        p = psnr_fn(zn, gt)
        return new, (rms_u, p)

    @jax.jit
    def run():
        carry = initial_point_admm(y, Phi)
        ks = jnp.arange(args.maxiter, dtype=jnp.int32)
        final, (rms, psnrs) = jax.lax.scan(
            lambda c, k: body(c, k), carry, ks)
        return rms, psnrs

    rms, psnrs = run()
    rms = np.asarray(rms)
    psnrs = np.asarray(psnrs)
    print(f"{'k':>5} {'RMS(u)':>9} {'PSNR':>7}", flush=True)
    for k in range(0, args.maxiter, args.every):
        print(f"{k:>5} {rms[k]:>9.5f} {psnrs[k]:>7.2f}", flush=True)
    k = args.maxiter - 1
    print(f"{k:>5} {rms[k]:>9.5f} {psnrs[k]:>7.2f}", flush=True)
    print(json.dumps({
        "file": args.file, "maxiter": args.maxiter,
        "sigma_max": args.sigma_max,
        "rms_u_at": {str(k): float(rms[k])
                     for k in (0, 50, 100, 150, 180, 220, args.maxiter - 1)},
        "psnr_at": {str(k): float(psnrs[k])
                    for k in (100, 180, args.maxiter - 1)}}), flush=True)


if __name__ == "__main__" and "sweep" not in sys.argv:
    main()


def anderson_sweep():
    """RMS(u) and PSNR at several budgets along the REAL Anderson solve
    (the plain-Picard trace above is a different trajectory — the
    production path is Anderson m=5, so diagnostics must ride it)."""
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="models/admm_ffdnet_r4")
    ap.add_argument("--sigma_dual", type=float, default=1.0)
    ap.add_argument("--sigma_max", type=float, default=0.0)
    ap.add_argument("--budgets", default="60,100,140,180,220,260")
    ap.add_argument("--file", default="drop8_cacti.mat")
    ap.add_argument("mode")
    args = ap.parse_args()

    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    from deqsci_tpu.data.sci_mat import load_test_data
    from deqsci_tpu.maps.admm_sci import make_admm_sci_step
    from deqsci_tpu.ops.sensing import initial_point_admm
    from deqsci_tpu.recon import make_reconstructor
    from deqsci_tpu.train.metrics import psnr_np
    from deqsci_tpu.zoo import build_denoiser, infer_denoiser_feats

    snap = ocp.StandardCheckpointer().restore(
        os.path.abspath(os.path.join(REPO, args.model)))
    variables = snap["params"] if "params" in snap else snap
    spec = build_denoiser("ffdnet", feats=infer_denoiser_feats(variables))
    step = make_admm_sci_step(spec.apply_fn(), tag=spec.tag,
                              sigma_dual_coef=args.sigma_dual,
                              **({"sigma_max": args.sigma_max}
                                 if args.sigma_max else {}))

    data = load_test_data(os.path.join(TEST_GRAY, args.file))
    gt = np.asarray(data["gt"][..., :8])
    meas = jnp.asarray(data["meas"][..., 0])[None]
    mask = jnp.asarray(data["mask"])

    print(f"{'iters':>6} {'PSNR':>7} {'RMS(u)':>9}", flush=True)
    out = {}
    for b in (int(x) for x in args.budgets.split(",")):
        recon = make_reconstructor(
            step, m=5, lam=1e-2, beta=1.0, max_iter=b, tol=1e-5,
            init_fn=initial_point_admm,
            # recon_one returns output_fn(carry)[0], so diagnostics must
            # ride along INSIDE one array: pack (z, u) on the frame axis.
            output_fn=lambda c: jnp.concatenate([c[0], c[1]], axis=-1))
        zu = np.asarray(recon(variables, meas, mask))[0]
        t = zu.shape[-1] // 2
        z, u = zu[..., :t], zu[..., t:]
        rms = float(np.sqrt(np.mean(u.astype(np.float64) ** 2)))
        p = psnr_np(gt, z)
        out[b] = {"psnr": round(p, 2), "rms_u": round(rms, 5)}
        print(f"{b:>6} {p:>7.2f} {rms:>9.5f}", flush=True)
    print(json.dumps({"file": args.file, "sigma_max": args.sigma_max,
                      "sweep": out}), flush=True)


if __name__ == "__main__" and "sweep" in sys.argv:
    anderson_sweep()
