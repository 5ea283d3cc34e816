"""Per-layer cost profile of the 15-layer DE-GAP-FFDNet flagship solve.

Round-2 probes profiled only the 4-layer CNN solve (VERDICT weak #2);
this apportions the flagship iteration at its real inner shapes —
(8, 128, 128, C) after the 2x2 space-to-depth — using the axon
measurement methodology (scripts/conv_probe2.py: scan chains inside one
jit, scalar-feedback dependency, host-fetch sync, alternating buffers).

Also measures the BN-fold lever end to end: whole-solve differential
timing (t(180) - t(90)) with and without fold_batchnorm, plus PSNR on
drop8 so the quality cost (pure algebra, expected ~0) is recorded.

Usage: python scripts/ffdnet_layer_profile.py [model_dir=models/ffdnet_r2]
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K = 30  # chain length inside one jit
R = 4   # timed repetitions
REFERENCE = "/root/reference"


def main():
    model = sys.argv[1] if len(sys.argv) > 1 else "models/ffdnet_r2"
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)

    def timed(fn, args0, args1, k=K):
        float(fn(*args0))
        float(fn(*args1))
        ts = []
        for r in range(R):
            a = args0 if r % 2 == 0 else args1
            t0 = time.perf_counter()
            float(fn(*a))
            ts.append(time.perf_counter() - t0)
        return min(ts) / k

    def chain(one, length=K):
        @jax.jit
        def run(x, *ws):
            def body(c, _):
                y = one(c, *ws)
                s = jnp.sum(y.astype(jnp.float32)) * jnp.float32(1e-30)
                return c * (jnp.float32(1.0) + s).astype(c.dtype), None
            out, _ = lax.scan(body, x, None, length=length)
            return jnp.sum(out.astype(jnp.float32))
        return run

    def timed_diff(one, args0, args1):
        """Differential chain timing: (t(3K) - t(K)) / 2K cancels the
        per-jit-call tunnel overhead (~30-40 ms), which at K=30 would
        otherwise add ~1 ms to every per-op number (the round-3 first-run
        mistake: 'relu only' timed equal to a 64-channel conv)."""
        tK = timed(chain(one, K), args0, args1, k=1)
        t3K = timed(chain(one, 3 * K), args0, args1, k=1)
        return (t3K - tK) / (2 * K)

    def report(name, t, note=""):
        print(f"{name:44s} {t*1e3:7.3f} ms {note}", flush=True)

    n, h, w, c = 8, 128, 128, 64
    f32 = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.float32)
    bf16 = lambda *s: jnp.asarray(rng.standard_normal(s), jnp.bfloat16)

    # --- individual ops at flagship shapes ---
    from deqsci_tpu.nets.dncnn import split_pack
    dn = lax.conv_dimension_numbers((n, h, w, 2 * c), (3, 3, 2 * c, c),
                                    ("NHWC", "HWIO", "NHWC"))
    body_op = lambda x, wt: lax.conv_general_dilated(
        x, wt, (1, 1), "SAME", dimension_numbers=dn,
        preferred_element_type=jnp.float32).astype(jnp.bfloat16)
    wt = bf16(3, 3, 2 * c, c) / 24
    report("packed body conv (128ch bf16 -> 64 f32)",
           timed_diff(body_op, (bf16(n, h, w, 2 * c), wt),
                      (bf16(n, h, w, 2 * c), wt)))

    dn5 = lax.conv_dimension_numbers((n, h, w, 5), (3, 3, 5, c),
                                     ("NHWC", "HWIO", "NHWC"))
    conv0_op = lambda x, wt: lax.conv_general_dilated(
        x, wt, (1, 1), "SAME", dimension_numbers=dn5,
        precision=lax.Precision.HIGH).astype(jnp.float32)[..., :5]
    w0 = f32(3, 3, 5, c) / 7
    report("conv0 (5 -> 64, HIGH) [chained via slice]",
           timed_diff(conv0_op, (f32(n, h, w, 5), w0),
                      (f32(n, h, w, 5), w0)))

    sa, ba = f32(c), f32(c)
    report("BN affine + relu (f32)",
           timed_diff(lambda x, s, b: jnp.maximum(x * s + b, 0.0),
                      (f32(n, h, w, c), sa, ba), (f32(n, h, w, c), sa, ba)))

    report("relu only (f32)",
           timed_diff(lambda x: jnp.maximum(x, 0.0),
                      (f32(n, h, w, c),), (f32(n, h, w, c),)))

    report("split_pack (f32 -> 2C bf16) [sliced back]",
           timed_diff(lambda x: split_pack(x)[..., :c].astype(jnp.float32),
                      (f32(n, h, w, c),), (f32(n, h, w, c),)))

    from deqsci_tpu.ops.pallas.small_conv import conv3x3_small_cout_depthwise
    wh = f32(3, 3, c, 4) / 24
    head_op = lambda x, wt: jnp.broadcast_to(
        conv3x3_small_cout_depthwise(x, wt), x.shape[:3] + (4,)
    ).astype(jnp.float32)[..., :c // 16].repeat(16, -1)
    report("head stencil conv (64 -> 4) [broadcast back]",
           timed_diff(head_op, (f32(n, h, w, c), wh),
                      (f32(n, h, w, c), wh)))

    # --- whole-net apply: fold vs no fold ---
    import orbax.checkpoint as ocp
    from deqsci_tpu.nets.dncnn import fold_batchnorm
    from deqsci_tpu.nets.ffdnet import FFDNet
    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    snap = ocp.StandardCheckpointer().restore(
        os.path.abspath(os.path.join(repo, model)))
    variables = snap["params"] if "params" in snap else snap
    folded = fold_batchnorm(variables)

    net = FFDNet(in_channels=1)
    net_f = FFDNet(in_channels=1, bn_fold=True)
    sig = jnp.full((n,), 0.05, jnp.float32)

    def apply_chain(module, params):
        @jax.jit
        def run(x):
            def body(c_, _):
                y = module.apply(params, c_, sig)
                s = jnp.sum(y) * jnp.float32(1e-30)
                return c_ * (1.0 + s), None
            out, _ = lax.scan(body, x, None, length=K)
            return jnp.sum(out)
        return run

    xa, xb = f32(n, 2 * h, 2 * w, 1), f32(n, 2 * h, 2 * w, 1)
    t_bn = timed(apply_chain(net, variables), (xa,), (xb,))
    t_fold = timed(apply_chain(net_f, folded), (xa,), (xb,))
    report("FFDNet apply, BN kept", t_bn)
    report("FFDNet apply, BN folded", t_fold,
           f"({(t_bn - t_fold) / t_bn * 100:+.1f}% saved)")

    # --- whole-solve differential + PSNR, fold vs not ---
    from deqsci_tpu.data.sci_mat import load_test_data
    from deqsci_tpu.maps.gap_sci import make_gap_sci_step
    from deqsci_tpu.recon import make_reconstructor
    from deqsci_tpu.train.metrics import psnr

    d = load_test_data(os.path.join(REFERENCE,
                                    "data/test_gray/drop8_cacti.mat"))
    meas = d["meas"] if d["meas"].ndim == 3 else d["meas"][..., None]
    y = jnp.asarray(np.moveaxis(meas, -1, 0)[:1])
    mask = jnp.asarray(d["mask"])
    gt = jnp.asarray(d["gt"][..., :8])

    for name, module, params in (("BN kept", net, variables),
                                 ("BN folded", net_f, folded)):
        step = make_gap_sci_step(
            lambda p, x, s, m=module: m.apply(p, x, s), tag="ffdnet")
        r1 = make_reconstructor(step, m=5, lam=1e-2, beta=1.0,
                                max_iter=90, tol=0.0)
        r2 = make_reconstructor(step, m=5, lam=1e-2, beta=1.0,
                                max_iter=180, tol=0.0)
        s1 = jax.jit(lambda p, yv, mk: jnp.sum(r1(p, yv, mk)))
        s2 = jax.jit(lambda p, yv, mk: jnp.sum(r2(p, yv, mk)))
        t1 = timed(s1, (params, y, mask), (params, y, mask), k=1)
        t2 = timed(s2, (params, y, mask), (params, y, mask), k=1)
        out = r2(params, y, mask)
        print(f"solve {name:10s} per-iter {(t2 - t1)/90*1e3:7.3f} ms  "
              f"t90={t1*1e3:.0f} ms t180={t2*1e3:.0f} ms  "
              f"PSNR {float(psnr(jnp.clip(out[0], 0, 1), gt)):.3f} dB",
              flush=True)


if __name__ == "__main__":
    main()
