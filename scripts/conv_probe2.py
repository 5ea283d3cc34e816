"""Probe WHERE the TPU conv efficiency goes for the DEQ body shapes.

Methodology notes (hard-won, see also utils/profiling.py):
* block_until_ready does NOT reliably block on the axon remote runtime;
  the only dependable sync is a host fetch (float() of an in-jit scalar);
* the runtime can coalesce identical in-flight computations — alternate
  distinct input buffers across timed calls;
* XLA's excess-precision simplifier folds bf16 round-trip converts
  (x - f32(bf16(x)) == 0); bf16 splitting must use lax.reduce_precision;
* chains use scalar feedback (c = x*(1+eps*sum(y))) so each iteration
  depends on the previous without reshaping the op's output into the
  carry (which would add its own bandwidth cost).

Usage: python scripts/conv_probe2.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K = 50  # chain length inside one jit
R = 4   # timed repetitions


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)

    def timed(fn, args0, args1):
        float(fn(*args0))
        float(fn(*args1))
        ts = []
        for r in range(R):
            a = args0 if r % 2 == 0 else args1
            t0 = time.perf_counter()
            float(fn(*a))  # host fetch = the only reliable sync on axon
            ts.append(time.perf_counter() - t0)
        return min(ts) / K

    def chain(one):
        """K sequential ops; dependency carried through a scalar."""
        @jax.jit
        def run(x, w):
            def body(c, _):
                y = one(c, w)
                s = jnp.sum(y.astype(jnp.float32)) * jnp.float32(1e-30)
                return c * (jnp.float32(1.0) + s).astype(c.dtype), None
            out, _ = lax.scan(body, x, None, length=K)
            return jnp.sum(out.astype(jnp.float32))
        return run

    def report(name, t, flops):
        print(f"{name:46s} {t*1e3:7.3f} ms  {flops/t/1e12:6.1f} TFLOP/s",
              flush=True)

    def mkconv(xs, ws):
        dn = lax.conv_dimension_numbers(xs, ws, ("NHWC", "HWIO", "NHWC"))

        def one(x, w):
            return lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=dn,
                preferred_element_type=jnp.float32)
        return one

    def arrs(xs, ws):
        xa = jnp.asarray(rng.standard_normal(xs), dtype=jnp.bfloat16)
        xb = jnp.asarray(rng.standard_normal(xs), dtype=jnp.bfloat16)
        w = jnp.asarray(rng.standard_normal(ws) / 24, dtype=jnp.bfloat16)
        return xa, xb, w

    # --- calibration: fat matmul, what can this chip/runtime reach? ---
    for m, k, n in [(8192, 4096, 4096), (131072, 576, 64),
                    (131072, 576, 128), (131072, 576, 512),
                    (16384, 576, 64), (131072, 64, 64)]:
        a0 = jnp.asarray(rng.standard_normal((m, k)), dtype=jnp.bfloat16)
        a1 = jnp.asarray(rng.standard_normal((m, k)), dtype=jnp.bfloat16)
        b = jnp.asarray(rng.standard_normal((k, n)) / 100, dtype=jnp.bfloat16)

        def one_mm(a, b):
            return jnp.dot(a, b, preferred_element_type=jnp.float32)
        t = timed(chain(one_mm), (a0, b), (a1, b))
        report(f"matmul ({m},{k})x({k},{n}) bf16", t, 2 * m * k * n)

    # --- channel sweep at (8,128,128) ---
    for cin, cout in [(64, 64), (128, 128), (256, 256)]:
        xs, ws = (8, 128, 128, cin), (3, 3, cin, cout)
        xa, xb, w = arrs(xs, ws)
        t = timed(chain(mkconv(xs, ws)), (xa, w), (xb, w))
        flops = 2 * 8 * 128 * 128 * cin * cout * 9
        report(f"conv3x3 {cin}->{cout} @(8,128,128) bf16", t, flops)

    # --- batch sweep 64->64 ---
    for n in [32, 64]:
        xs, ws = (n, 128, 128, 64), (3, 3, 64, 64)
        xa, xb, w = arrs(xs, ws)
        t = timed(chain(mkconv(xs, ws)), (xa, w), (xb, w))
        report(f"conv3x3 64->64 @({n},128,128) bf16", t,
               2 * n * 128 * 128 * 64 * 64 * 9)

    # --- the SimpleCNN spatial config ---
    xs, ws = (8, 256, 256, 64), (3, 3, 64, 64)
    xa, xb, w = arrs(xs, ws)
    t = timed(chain(mkconv(xs, ws)), (xa, w), (xb, w))
    report("conv3x3 64->64 @(8,256,256) bf16", t,
           2 * 8 * 256 * 256 * 64 * 64 * 9)

    # --- fp32 input conv at HIGH (the current production config) ---
    xs, ws = (8, 128, 128, 64), (3, 3, 64, 64)
    xaf = jnp.asarray(rng.standard_normal(xs), dtype=jnp.float32)
    xbf = jnp.asarray(rng.standard_normal(xs), dtype=jnp.float32)
    wf = jnp.asarray(rng.standard_normal(ws) / 24, dtype=jnp.float32)
    dn = lax.conv_dimension_numbers(xs, ws, ("NHWC", "HWIO", "NHWC"))
    for prec, label in [(lax.Precision.HIGH, "HIGH"),
                        (lax.Precision.HIGHEST, "HIGHEST")]:
        def one_f32(x, w, prec=prec):
            return lax.conv_general_dilated(
                x, w, (1, 1), "SAME", dimension_numbers=dn, precision=prec)
        t = timed(chain(one_f32), (xaf, wf), (xbf, wf))
        report(f"conv3x3 64->64 @(8,128,128) f32 {label}", t,
               2 * 8 * 128 * 128 * 64 * 64 * 9)

    # --- NCHW layout variant ---
    dn_chw = lax.conv_dimension_numbers((8, 64, 128, 128), (64, 64, 3, 3),
                                        ("NCHW", "OIHW", "NCHW"))
    xa = jnp.asarray(rng.standard_normal((8, 64, 128, 128)), jnp.bfloat16)
    xb = jnp.asarray(rng.standard_normal((8, 64, 128, 128)), jnp.bfloat16)
    wc = jnp.asarray(rng.standard_normal((64, 64, 3, 3)) / 24, jnp.bfloat16)

    def one_chw(x, w):
        return lax.conv_general_dilated(
            x, w, (1, 1), "SAME", dimension_numbers=dn_chw,
            preferred_element_type=jnp.float32)
    t = timed(chain(one_chw), (xa, wc), (xb, wc))
    report("conv3x3 64->64 NCHW @(8,128,128) bf16", t,
           2 * 8 * 128 * 128 * 64 * 64 * 9)

    # --- im2col matmul form of the 64->64 conv ---
    xs = (8, 128, 128, 64)
    xa = jnp.asarray(rng.standard_normal(xs), jnp.bfloat16)
    xb = jnp.asarray(rng.standard_normal(xs), jnp.bfloat16)
    wm = jnp.asarray(rng.standard_normal((576, 64)) / 24, jnp.bfloat16)

    def one_im2col(x, w):
        H = W = 128
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = [xp[:, i:i + H, j:j + W, :] for i in range(3)
                for j in range(3)]
        a = jnp.concatenate(cols, axis=-1)
        return jnp.einsum("nhwk,kc->nhwc", a, w,
                          preferred_element_type=jnp.float32)
    t = timed(chain(one_im2col), (xa, wm), (xb, wm))
    report("im2col 64->64 @(8,128,128) bf16", t,
           2 * 8 * 128 * 128 * 64 * 64 * 9)

    # --- row-paired conv: (4,3) kernel stride (2,1), 128 outputs ---
    w64 = jnp.asarray(rng.standard_normal((3, 3, 64, 64)) / 24, jnp.bfloat16)
    wp = jnp.zeros((4, 3, 64, 128), jnp.bfloat16)
    wp = wp.at[0:3, :, :, :64].set(w64)
    wp = wp.at[1:4, :, :, 64:].set(w64)
    dnp_ = lax.conv_dimension_numbers((8, 130, 128, 64), (4, 3, 64, 128),
                                      ("NHWC", "HWIO", "NHWC"))

    def one_paired(xx, w):
        xpad = jnp.pad(xx, ((0, 0), (1, 1), (0, 0), (0, 0)))
        y = lax.conv_general_dilated(
            xpad, w, (2, 1), [(0, 0), (1, 1)], dimension_numbers=dnp_,
            preferred_element_type=jnp.float32)
        n, h2, ww, c2 = y.shape
        y = y.reshape(n, h2, ww, 2, 64).transpose(0, 1, 3, 2, 4)
        return y.reshape(n, 2 * h2, ww, 64)

    def plain(xx):
        dn0 = lax.conv_dimension_numbers((8, 128, 128, 64), (3, 3, 64, 64),
                                         ("NHWC", "HWIO", "NHWC"))
        return lax.conv_general_dilated(
            xx, w64, (1, 1), "SAME", dimension_numbers=dn0,
            preferred_element_type=jnp.float32)
    ref = np.asarray(jax.jit(plain)(xa))
    got = np.asarray(jax.jit(one_paired)(xa, wp))
    err = np.abs(got - ref).max() / np.abs(ref).max()
    t = timed(chain(one_paired), (xa, wp), (xb, wp))
    report(f"row-paired (4,3)s2->128ch (err {err:.1e})", t,
           2 * 8 * 128 * 128 * 64 * 64 * 9)


if __name__ == "__main__":
    main()
