"""MRI DEQ training driver — the upstream fixed-point experiment pattern.

Rebuild of scripts/fixedpoint/mri_prox_fixedeta_pre_and.py:57-161: an 8x
undersampled single-coil MRI operator with additive measurement noise, a
DnCNN denoiser inside an EquilibriumProxGradMRI map, Anderson DEQ with IFT
training. Runs on FastMRI h5 data when ``--datapath`` exists, otherwise on
a synthetic phantom set so the full path is exercisable in this sandbox
(no FastMRI corpus; VERDICT r4 #6 asks for a *recorded* operating point on
synthetic k-space rather than smoke-only coverage).

With ``--eval_n`` > 0 the driver holds out that many phantoms, reports
magnitude PSNR of the trained DEQ reconstruction vs the zero-filled
adjoint baseline on them, sweeps an iteration-budget curve, and (with
``--save``) ships the weights + scores to ``models/<save>`` for the
regression floor in tests/test_mri_operating_point.py.

Usage: python scripts/mri_deq_train.py [--datapath DIR] [--steps N]
           [--eval_n 8] [--save mri_deq_demo]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def synthetic_phantoms(n, size, seed=0):
    rng = np.random.default_rng(seed)
    xs = []
    for _ in range(n):
        img = np.zeros((size, size), np.float32)
        for _ in range(rng.integers(3, 8)):
            cx, cy = rng.uniform(-0.6, 0.6, 2)
            r = rng.uniform(0.1, 0.4)
            a = rng.uniform(0.2, 1.0)
            yy, xx = np.meshgrid(np.linspace(-1, 1, size),
                                 np.linspace(-1, 1, size))
            img += a * (((xx - cx) ** 2 + (yy - cy) ** 2) < r ** 2)
        img = img / max(img.max(), 1e-6)
        xs.append(np.stack([img, np.zeros_like(img)], -1))
    return np.stack(xs)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--datapath", default="")
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--batch", type=int, default=4)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--accel", type=float, default=8.0)
    ap.add_argument("--center_frac", type=float, default=0.04)
    ap.add_argument("--noise_sigma", type=float, default=0.01)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--train_n", type=int, default=32,
                    help="synthetic training phantoms")
    ap.add_argument("--eval_n", type=int, default=0,
                    help="held-out phantoms (disjoint seed); >0 records "
                    "PSNR vs the zero-filled baseline + a budget curve")
    ap.add_argument("--save", default="",
                    help="ship weights + scores to models/<save>")
    ap.add_argument("--load", default="",
                    help="eval-only: restore a shipped checkpoint, skip "
                    "training, and print a JSON score line (the "
                    "regression-test entry point)")
    ap.add_argument("--init_from", default="",
                    help="warm-start training from a shipped checkpoint "
                    "(unlike --load, training still runs)")
    ap.add_argument("--maxiter_mix", default="",
                    help="comma list of training horizons sampled per "
                    "step (mixed-horizon curriculum — flattens the "
                    "decay past a single trained horizon)")
    ap.add_argument("--cpu", type=int, default=0,
                    help="force the CPU backend (the 64x64 problem is "
                    "small; lets the chip keep a concurrent walk)")
    args = ap.parse_args()

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax
    from deqsci_tpu.fp.deq import make_deq
    from deqsci_tpu.maps.proxgrad import make_proxgrad_step
    from deqsci_tpu.nets.dncnn import DnCNN
    from deqsci_tpu.ops.mri import cartesian_single_coil_mri, create_mask

    if args.datapath and os.path.isdir(args.datapath):
        from deqsci_tpu.data.images import FastMRIDataset
        ds = FastMRIDataset(args.datapath, crop=args.size)
        data = np.stack([ds[i] for i in range(min(len(ds), 64))])
    else:
        print("no FastMRI data; using synthetic phantoms", flush=True)
        data = synthetic_phantoms(args.train_n, args.size)
    eval_data = synthetic_phantoms(args.eval_n, args.size, seed=1000) \
        if args.eval_n else None

    mask = create_mask((args.size, args.size), args.center_frac, args.accel)
    op = cartesian_single_coil_mri(mask, h=args.size, w=args.size)

    net = DnCNN(channels=2, num_layers=6, use_bn=False)
    variables = net.init(jax.random.key(0),
                         jnp.zeros((1, args.size, args.size, 2)))
    # 2-channel residual denoiser inside the prox-grad map, fixed eta=0.4
    denoise = lambda p, x: net.apply(p, x)
    step = make_proxgrad_step(op, denoise, minval=-1.0, maxval=1.0)
    deq = make_deq(step, m=5, lam=1e-4, max_iter=40, tol=1e-4)

    params = {"eta": jnp.float32(0.4), "net": variables}

    if args.load or args.init_from:
        import orbax.checkpoint as ocp
        snap = ocp.StandardCheckpointer().restore(
            os.path.abspath(args.load or args.init_from))
        params = jax.tree.map(jnp.asarray, snap["params"])
        if args.load:
            args.steps = 0
    optimizer = optax.adam(args.lr)
    opt_state = optimizer.init(params)

    def make_step(deq_h):
        @jax.jit
        def train_step(params, opt_state, x, key):
            y = op.forward(x)
            y = y + args.noise_sigma * jax.random.normal(key, y.shape)

            def loss_fn(p):
                z0 = jax.lax.stop_gradient(op.adjoint(y))
                rec = deq_h(p, z0, y)
                return jnp.mean((rec - x) ** 2)

            loss, grads = jax.value_and_grad(loss_fn)(params)
            updates, opt_state = optimizer.update(grads, opt_state, params)
            return optax.apply_updates(params, updates), opt_state, loss
        return train_step

    if args.maxiter_mix:
        horizons = sorted({int(v) for v in args.maxiter_mix.split(",")})
        steps_by_h = {h: make_step(
            make_deq(step, m=5, lam=1e-4, max_iter=h, tol=1e-4))
            for h in horizons}
        print(f"mixed-horizon training over {horizons}", flush=True)
    else:
        horizons, steps_by_h = [40], {40: make_step(deq)}

    key = jax.random.key(1)
    rng = np.random.default_rng(0)
    for it in range(args.steps):
        idx = rng.choice(len(data), args.batch, replace=False)
        key, sub = jax.random.split(key)
        h = horizons[int(rng.integers(len(horizons)))]
        params, opt_state, loss = steps_by_h[h](
            params, opt_state, jnp.asarray(data[idx]), sub)
        if it % max(args.steps // 20, 5) == 0:
            print(f"step {it} loss {float(loss):.6f} "
                  f"eta {float(params['eta']):.4f}", flush=True)
    print("training done", flush=True)

    if eval_data is None:
        return

    # held-out eval protocol (mirrors the reference driver's test pass
    # shape, scripts/fixedpoint/mri_prox_fixedeta_pre_and.py:100-161):
    # fixed measurement noise seed, magnitude PSNR, zero-fill baseline.
    def mag(x):
        return jnp.sqrt(x[..., 0] ** 2 + x[..., 1] ** 2)

    def psnr_mag(rec, gt):
        err = jnp.mean((mag(rec) - mag(gt)) ** 2, axis=(1, 2))
        return -10.0 * jnp.log10(jnp.maximum(err, 1e-12))

    xe = jnp.asarray(eval_data)
    ye = op.forward(xe)
    ye = ye + args.noise_sigma * jax.random.normal(jax.random.key(7),
                                                   ye.shape)
    z0 = op.adjoint(ye)
    base_psnr = float(jnp.mean(psnr_mag(z0, xe)))

    scores = {}
    for budget in (10, 20, 40, 80):
        deq_b = make_deq(step, m=5, lam=1e-4, max_iter=budget, tol=1e-4)
        rec = jax.jit(lambda p, z, y: deq_b(p, z, y))(params, z0, ye)
        scores[budget] = float(jnp.mean(psnr_mag(rec, xe)))
    print(f"zero-filled baseline: {base_psnr:.2f} dB", flush=True)
    for budget, s in scores.items():
        print(f"DEQ recon @{budget} iters: {s:.2f} dB "
              f"(+{s - base_psnr:.2f} over zero-fill)", flush=True)
    import json
    print(json.dumps({"baseline_psnr": base_psnr,
                      "psnr": {str(k): v for k, v in scores.items()}}),
          flush=True)

    if args.save:
        repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
        from deqsci_tpu.io.checkpoint import CheckpointManager
        import shutil
        out_dir = os.path.join(repo, "models", args.save)
        if os.path.isdir(out_dir):
            shutil.rmtree(out_dir)
        CheckpointManager(os.path.join(repo, "models")).save(
            args.save,
            {"params": jax.tree.map(np.asarray, params),
             "meta": {"size": args.size, "accel": args.accel,
                      "center_frac": args.center_frac,
                      "noise_sigma": args.noise_sigma,
                      "baseline_psnr": base_psnr,
                      "psnr": {str(k): v for k, v in scores.items()}}})
        print(f"saved models/{args.save}", flush=True)


if __name__ == "__main__":
    main()
