"""Chip timing: batched vs sequential dihedral self-ensemble (VERDICT r4 #8).

The sequential ensemble (``--self_ensemble 1``) runs 8 independent solves,
one per dihedral transform of the measurement/mask; the batched mode
(``--self_ensemble 2``) stacks all 8 into extra vmap lanes of ONE XLA
program (deqsci_tpu/recon.py:make_self_ensemble(batched=True)).  On a
single chip the batched program trades 8 kernel launches + 8 tunnel RTTs
for one larger program whose convs have 8x the batch — MXU-friendlier.
This probe measures both on the flagship knee config and prints one JSON
line for PARITY.md.

Usage: python scripts/ensemble_timing.py [--maxiter 120] [--reps 3]
"""

import argparse
import json
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
TEST_GRAY = "/root/reference/data/test_gray"


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--model", default="models/ffdnet_ipol")
    ap.add_argument("--maxiter", type=int, default=120)
    ap.add_argument("--reps", type=int, default=3)
    args = ap.parse_args()

    import jax
    import jax.numpy as jnp
    import orbax.checkpoint as ocp

    from deqsci_tpu.data.sci_mat import load_test_data
    from deqsci_tpu.maps.gap_sci import make_gap_sci_step
    from deqsci_tpu.recon import make_reconstructor, make_self_ensemble
    from deqsci_tpu.zoo import build_denoiser, infer_denoiser_feats

    print("devices:", jax.devices(), flush=True)
    snap = ocp.StandardCheckpointer().restore(
        os.path.abspath(os.path.join(REPO, args.model)))
    variables = snap["params"] if "params" in snap else snap
    spec = build_denoiser("ffdnet", feats=infer_denoiser_feats(variables))
    step = make_gap_sci_step(spec.apply_fn(), tag=spec.tag)
    recon = make_reconstructor(step, m=5, beta=1.0, lam=1e-2,
                               max_iter=args.maxiter, tol=1e-5)

    data = load_test_data(os.path.join(TEST_GRAY, "drop8_cacti.mat"))
    meas = jnp.asarray(data["meas"][..., 0])[None]  # (1, H, W) snapshot axis
    mask = jnp.asarray(data["mask"])                # (H, W, 8)

    out = {"model": args.model, "maxiter": args.maxiter}
    for name, batched in (("sequential", False), ("batched", True)):
        se = make_self_ensemble(recon, batched=batched)
        r = se(variables, meas, mask)
        float(jnp.sum(r))  # compile + settle (host-fetch is the only
        # reliable sync on the axon tunnel runtime — STATUS round-2)
        times = []
        for _ in range(args.reps):
            t0 = time.time()
            r = se(variables, meas, mask)
            float(jnp.sum(r))
            times.append(time.time() - t0)
        out[name + "_s"] = round(min(times), 3)
    out["speedup"] = round(out["sequential_s"] / out["batched_s"], 2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
