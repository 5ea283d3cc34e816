"""Round-4 MXU architecture-lever probes (VERDICT r3 weak #4 / next #5).

The flagship body conv is 64->64 @ (8,128,128) — 64 output channels fill
only half of the MXU's 128 lanes (~26% MXU, round-2 measurement). Three
architecture-level levers that could lift it, each measured here with the
differential-chain methodology (t(3K)-t(K))/(2K) to cancel tunnel RTT:

(a) frames-into-channels packing: two frames per conv sample, channels
    doubled. Exact variants:
      - grouped conv (feature_group_count=2): same useful FLOPs,
        128 lanes, no waste — exact by construction;
      - dense block-diagonal kernel: 2x raw FLOPs (zero cross-blocks),
        wins only if 128-ch efficiency is >2x the 64-ch.
(b) wider body (96/128 features): informs the retrain-quality-vs-speed
    frontier before committing a multi-hour training walk.
(c) int8 body conv: quantized inference probe (int8 x int8 -> int32).

Usage: python scripts/mxu_probe_r4.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K = 20   # base chain length inside one jit
R = 3    # timed repetitions per chain length


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)

    def chain(one, length):
        @jax.jit
        def run(x, w):
            def body(c, _):
                y = one(c, w)
                s = jnp.sum(y.astype(jnp.float32)) * jnp.float32(1e-30)
                return c * (jnp.float32(1.0) + s).astype(c.dtype), None
            out, _ = lax.scan(body, x, None, length=length)
            return jnp.sum(out.astype(jnp.float32))
        return run

    def timed_chain(one, args0, args1, length):
        fn = chain(one, length)
        float(fn(*args0))
        float(fn(*args1))
        ts = []
        for r in range(R):
            a = args0 if r % 2 == 0 else args1
            t0 = time.perf_counter()
            float(fn(*a))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def timed(one, args0, args1):
        # differential chains cancel the per-call tunnel RTT (~1 ms/op at
        # short chains — STATUS.md round-3 methodology note)
        t1 = timed_chain(one, args0, args1, K)
        t3 = timed_chain(one, args0, args1, 3 * K)
        return (t3 - t1) / (2 * K)

    def report(name, t, useful_flops):
        print(f"{name:58s} {t*1e3:7.3f} ms  {useful_flops/t/1e12:6.1f} "
              f"TF/s(useful)", flush=True)

    def conv_fn(xs, ws, groups=1, pet=jnp.float32):
        dn = lax.conv_dimension_numbers(xs, ws, ("NHWC", "HWIO", "NHWC"))

        def one(x, w):
            return lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=dn,
                feature_group_count=groups, preferred_element_type=pet)
        return one

    def bf16(shape, scale=1.0):
        return jnp.asarray(rng.standard_normal(shape) * scale, jnp.bfloat16)

    H = W = 128
    FL = lambda n, c_in, c_out: 2 * n * H * W * c_in * c_out * 9
    base_flops = FL(8, 64, 64)  # useful work of one flagship body conv

    # --- baseline + width sweep (lever b) ---
    for n, c in [(8, 64), (8, 96), (8, 128), (4, 128), (2, 256)]:
        xs, ws = (n, H, W, c), (3, 3, c, c)
        xa, xb, w = bf16(xs), bf16(xs), bf16(ws, 1 / 24)
        t = timed(conv_fn(xs, ws), (xa, w), (xb, w))
        report(f"dense conv3x3 {c}->{c} @({n},{H},{W}) bf16", t,
               FL(n, c, c))

    # --- lever (a): frames-into-channels, exact variants ---
    # grouped: (4,128,128,128) with 2 groups == two 64-ch convs, exact
    xs, ws = (4, H, W, 128), (3, 3, 64, 128)
    xa, xb = bf16(xs), bf16(xs)
    wg = bf16(ws, 1 / 24)
    one_g = conv_fn(xs, ws, groups=2)
    t = timed(one_g, (xa, wg), (xb, wg))
    report("grouped conv3x3 128->128 g=2 @(4,128,128) bf16", t, base_flops)

    # block-diagonal dense: same math, zero cross-blocks, 2x raw FLOPs
    w64a = np.asarray(wg[:, :, :, :64], np.float32)
    w64b = np.asarray(wg[:, :, :, 64:], np.float32)
    wbd = np.zeros((3, 3, 128, 128), np.float32)
    wbd[:, :, :64, :64] = w64a
    wbd[:, :, 64:, 64:] = w64b
    wbd = jnp.asarray(wbd, jnp.bfloat16)
    one_bd = conv_fn(xs, (3, 3, 128, 128))
    t = timed(one_bd, (xa, wbd), (xb, wbd))
    report("block-diag conv3x3 128->128 @(4,128,128) bf16", t, base_flops)

    # exactness: grouped == block-diag == two independent 64-ch convs
    ref_a = np.asarray(jax.jit(conv_fn((4, H, W, 64), (3, 3, 64, 64)))(
        xa[..., :64], jnp.asarray(w64a, jnp.bfloat16)))
    got_g = np.asarray(jax.jit(one_g)(xa, wg))[..., :64]
    got_bd = np.asarray(jax.jit(one_bd)(xa, wbd))[..., :64]
    print(f"exactness: grouped err {np.abs(got_g-ref_a).max():.2e}, "
          f"block-diag err {np.abs(got_bd-ref_a).max():.2e}", flush=True)

    # --- lever (c): int8 conv + matmul ---
    def int8_arr(shape):
        return jnp.asarray(
            rng.integers(-127, 127, size=shape, dtype=np.int8))

    xs, ws = (8, H, W, 64), (3, 3, 64, 64)
    try:
        one_i8 = conv_fn(xs, ws, pet=jnp.int32)
        xa8, xb8, w8 = int8_arr(xs), int8_arr(xs), int8_arr(ws)
        t = timed(one_i8, (xa8, w8), (xb8, w8))
        report("int8 conv3x3 64->64 @(8,128,128) -> int32", t, base_flops)
    except Exception as e:
        print(f"int8 conv: unsupported on this runtime ({type(e).__name__}: "
              f"{str(e)[:120]})", flush=True)

    try:
        m, k, n = 131072, 576, 64
        a8 = int8_arr((m, k))
        b8v = int8_arr((m, k))
        w8m = int8_arr((k, n))

        def one_mm(a, b):
            return jax.lax.dot_general(
                a, b, (((1,), (0,)), ((), ())),
                preferred_element_type=jnp.int32)
        t = timed(one_mm, (a8, w8m), (b8v, w8m))
        report(f"int8 matmul ({m},{k})x({k},{n}) -> int32", t, 2 * m * k * n)
    except Exception as e:
        print(f"int8 matmul: unsupported ({type(e).__name__}: "
              f"{str(e)[:120]})", flush=True)


if __name__ == "__main__":
    main()
