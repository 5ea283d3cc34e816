"""Deblurring DEQ training driver — a recorded operating point.

Rebuild of the reference's deblur drivers
(scripts/fixedpoint/deblur_proxgrad_fixedeta_pre.py pattern: Gaussian
blur operator + measurement noise, residual denoiser inside the
prox-grad map, Anderson DEQ with IFT training, CelebA images). No image
corpus ships in this sandbox, so the measured protocol uses synthetic
band-limited textures (disjoint train/eval seeds), mirroring
scripts/mri_deq_train.py: fixed measurement-noise seed on the held-out
set, PSNR on [0,1], blurred-adjoint baseline, iteration-budget curve,
checkpoint shipping with the protocol numbers embedded.

Usage:
  python scripts/deblur_deq_train.py --cpu 1 --steps 1500 \
      --train_n 48 --eval_n 16 --save deblur_deq_demo
  python scripts/deblur_deq_train.py --cpu 1 --load models/deblur_deq_demo \
      --eval_n 16          # re-run the eval protocol on shipped weights
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def textures(n, size, seed=0):
    import importlib.util
    spec = importlib.util.spec_from_file_location(
        "gd", os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "gaussian_denoiser_train.py"))
    gd = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(gd)
    return gd.synthetic_textures(n, size, seed=seed)


def main(argv=None):
    ap = argparse.ArgumentParser()
    ap.add_argument("--datapath", default="")
    ap.add_argument("--size", type=int, default=64)
    ap.add_argument("--batch", type=int, default=8)
    ap.add_argument("--steps", type=int, default=30)
    ap.add_argument("--kernel_size", type=int, default=5)
    ap.add_argument("--kernel_sigma", type=float, default=5.0)
    ap.add_argument("--noise_sigma", type=float, default=1e-2)
    ap.add_argument("--eta", type=float, default=0.9)
    ap.add_argument("--lr", type=float, default=1e-4)
    ap.add_argument("--train_maxiter", type=int, default=40,
                    help="DEQ horizon during training (eval curve is "
                    "always {10,20,40,80})")
    ap.add_argument("--backward", default="solver",
                    choices=["solver", "neumann"],
                    help="IFT backward; neumann is the cheap CPU option")
    ap.add_argument("--neumann_k", type=int, default=6)
    ap.add_argument("--train_n", type=int, default=48,
                    help="synthetic training textures (seed 0)")
    ap.add_argument("--eval_n", type=int, default=0,
                    help="held-out textures (disjoint seed 1000); >0 "
                    "records the eval protocol + budget curve")
    ap.add_argument("--save", default="",
                    help="ship models/<name> with the protocol numbers")
    ap.add_argument("--load", default="",
                    help="restore and skip training (eval-only)")
    ap.add_argument("--cpu", type=int, default=0,
                    help="force the CPU backend (64x64 is small; lets "
                    "the chip keep a concurrent walk)")
    args = ap.parse_args(argv)

    import jax
    if args.cpu:
        jax.config.update("jax_platforms", "cpu")
    import jax.numpy as jnp
    import optax
    from deqsci_tpu.fp.deq import make_deq
    from deqsci_tpu.maps.proxgrad import make_proxgrad_step
    from deqsci_tpu.nets.dncnn import DnCNN
    from deqsci_tpu.ops.blur import gaussian_blur

    if args.datapath and os.path.isdir(args.datapath):
        from deqsci_tpu.data.images import CelebaDataset
        ds = CelebaDataset(args.datapath, size=args.size, gray=True)
        data = np.stack([ds[i] for i in range(min(len(ds), 256))])
    else:
        print("no image data; synthetic textures", flush=True)
        data = textures(args.train_n, args.size)
    eval_data = textures(args.eval_n, args.size, seed=1000) \
        if args.eval_n else None

    op = gaussian_blur(args.kernel_sigma, args.kernel_size)
    net = DnCNN(channels=1, num_layers=6, use_bn=False)
    variables = net.init(jax.random.key(0),
                         jnp.zeros((1, args.size, args.size, 1)))
    step = make_proxgrad_step(op, lambda p, x: net.apply(p, x),
                              minval=-1.0, maxval=1.0)
    deq = make_deq(step, m=5, lam=1e-4, max_iter=args.train_maxiter,
                   tol=1e-4, backward=args.backward,
                   neumann_k=args.neumann_k)

    params = {"eta": jnp.float32(args.eta), "net": variables}
    if args.load:
        import orbax.checkpoint as ocp
        snap = ocp.StandardCheckpointer().restore(os.path.abspath(args.load))
        params = jax.tree.map(jnp.asarray, snap["params"])
        args.steps = 0
    optimizer = optax.adam(args.lr)
    opt_state = optimizer.init(params)

    @jax.jit
    def train_step(params, opt_state, x, key):
        y = op.forward(x) + args.noise_sigma * jax.random.normal(
            key, x.shape)

        def loss_fn(p):
            z0 = jax.lax.stop_gradient(op.adjoint(y))
            rec = deq(p, z0, y)
            return jnp.mean((rec - x) ** 2)

        loss, grads = jax.value_and_grad(loss_fn)(params)
        updates, opt_state = optimizer.update(grads, opt_state, params)
        return optax.apply_updates(params, updates), opt_state, loss

    key = jax.random.key(1)
    rng = np.random.default_rng(0)
    for it in range(args.steps):
        idx = rng.choice(len(data), args.batch, replace=False)
        key, sub = jax.random.split(key)
        params, opt_state, loss = train_step(params, opt_state,
                                             jnp.asarray(data[idx]), sub)
        if it % max(args.steps // 20, 5) == 0:
            print(f"step {it} loss {float(loss):.6f} "
                  f"eta {float(params['eta']):.4f}", flush=True)
    print("training done", flush=True)

    if eval_data is None:
        return

    # held-out protocol: fixed noise seed, PSNR on [0,1] ((x+1)/2 of the
    # +-1-normalized textures), blurred-adjoint baseline, budget curve.
    def psnr01(rec, gt):
        err = jnp.mean(((rec - gt) / 2.0) ** 2, axis=(1, 2, 3))
        return -10.0 * jnp.log10(jnp.maximum(err, 1e-12))

    xe = jnp.asarray(eval_data)
    ye = op.forward(xe) + args.noise_sigma * jax.random.normal(
        jax.random.key(7), xe.shape)
    z0 = op.adjoint(ye)
    base_psnr = float(jnp.mean(psnr01(z0, xe)))

    scores = {}
    for budget in (10, 20, 40, 80):
        deq_b = make_deq(step, m=5, lam=1e-4, max_iter=budget, tol=1e-4)
        rec = jax.jit(lambda p, z, y: deq_b(p, z, y))(params, z0, ye)
        scores[budget] = float(jnp.mean(psnr01(rec, xe)))
    print(f"blurred-adjoint baseline: {base_psnr:.2f} dB", flush=True)
    for budget, s in scores.items():
        print(f"DEQ recon @{budget} iters: {s:.2f} dB "
              f"(+{s - base_psnr:.2f} over baseline)", flush=True)
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
             "meta": {"size": args.size,
                      "kernel_sigma": args.kernel_sigma,
                      "kernel_size": args.kernel_size,
                      "noise_sigma": args.noise_sigma,
                      "baseline_psnr": base_psnr,
                      "psnr": {str(k): v for k, v in scores.items()}}})
        print(f"saved models/{args.save}", flush=True)


if __name__ == "__main__":
    main()
