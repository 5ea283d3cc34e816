"""Widen a trained FFDNet checkpoint (Net2WiderNet) and verify exactness.

Produces the init for a wider-body DEQ finetune walk (PARITY.md round-4
MXU probes: 96/128-channel bodies reach 102/160 TF/s useful vs 56 at the
reference's 64). The widened net computes the SAME function as the
source (nets/widen.py), so the walk starts at the flagship's quality.

Usage:
  python scripts/widen_ffdnet.py --src models/ffdnet_ipol --feats 96 \
      --out save/ffdnet_ipol_w96
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--src", default="models/ffdnet_ipol")
    ap.add_argument("--feats", type=int, default=96)
    ap.add_argument("--out", default="")
    ap.add_argument("--seed", type=int, default=0)
    ap.add_argument("--cpu", type=int, default=1,
                    help="run the self-check on CPU (tiny shapes; keeps "
                         "the chip free for a concurrent training walk)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import numpy as np
    import orbax.checkpoint as ocp

    from deqsci_tpu.nets.widen import widen_hidden
    from deqsci_tpu.zoo import build_denoiser, infer_denoiser_feats

    src = args.src if os.path.isabs(args.src) \
        else os.path.join(REPO, args.src)
    snap = ocp.StandardCheckpointer().restore(os.path.abspath(src))
    variables = snap["params"] if "params" in snap else snap
    old = infer_denoiser_feats(variables)
    wide = widen_hidden(variables, args.feats, seed=args.seed)

    # self-check: function preservation at fp32 on a random input
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.random((2, 32, 32, 1)), jnp.float32)
    sig = jnp.asarray([0.1, 0.05], jnp.float32)
    base = build_denoiser("ffdnet", precision="highest", feats=old)
    wider = build_denoiser("ffdnet", precision="highest", feats=args.feats)
    y0 = base.module.apply(variables, x, sig)
    y1 = wider.module.apply(wide, x, sig)
    err = float(jnp.max(jnp.abs(y1 - y0)))
    rel = err / float(jnp.max(jnp.abs(y0)))
    print(f"widen {old} -> {args.feats}: max abs err {err:.3e} "
          f"(rel {rel:.3e})", flush=True)
    assert rel < 1e-4, "widening is not function-preserving"

    out = args.out or f"save/ffdnet_w{args.feats}_init"
    out = out if os.path.isabs(out) else os.path.join(REPO, out)
    ckptr = ocp.StandardCheckpointer()
    ckptr.save(os.path.abspath(out),
               {"params": wide, "epoch": int(snap.get("epoch", -1))},
               force=True)
    ckptr.wait_until_finished()
    print(f"saved widened init: {out}", flush=True)


if __name__ == "__main__":
    main()
