"""Deblurring DEQ training driver.

Rebuild of scripts/fixedpoint/deblur_proxgrad_fixedeta_pre.py: Gaussian
blur operator + measurement noise, residual denoiser in the prox-grad map,
Anderson DEQ with IFT training on CelebA-style images (synthetic textures
in smoke mode).

Usage: python scripts/deblur_deq_train.py [--datapath DIR] [--steps N]
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
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
    args = ap.parse_args()

    import jax
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
        print("no image data; synthetic textures (smoke mode)", flush=True)
        import importlib.util
        spec = importlib.util.spec_from_file_location(
            "gd", os.path.join(os.path.dirname(__file__),
                               "gaussian_denoiser_train.py"))
        gd = importlib.util.module_from_spec(spec)
        spec.loader.exec_module(gd)
        data = gd.synthetic_textures(64, args.size)

    op = gaussian_blur(args.kernel_sigma, args.kernel_size)
    net = DnCNN(channels=1, num_layers=6, use_bn=False)
    variables = net.init(jax.random.key(0),
                         jnp.zeros((1, args.size, args.size, 1)))
    step = make_proxgrad_step(op, lambda p, x: net.apply(p, x))
    deq = make_deq(step, m=5, lam=1e-4, max_iter=40, tol=1e-4)

    params = {"eta": jnp.float32(args.eta), "net": variables}
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
        if it % 5 == 0:
            print(f"step {it} loss {float(loss):.6f} "
                  f"eta {float(params['eta']):.4f}", flush=True)
    print("done", flush=True)


if __name__ == "__main__":
    main()
