"""Microbenchmark of 3x3 64->64 conv variants for the FFDNet/DnCNN body.

Timing methodology: each variant is applied K times as a sequential
dependency chain inside ONE jitted lax.scan (mirrors the real DEQ solve
and removes per-dispatch overhead of the remote axon runtime).

Accuracy: every variant is compared against the fp32 (HIGHEST) conv on a
single application.

Usage: python scripts/conv_probe.py
"""

import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np

K = 100


def main():
    import jax
    import jax.numpy as jnp
    from jax import lax

    rng = np.random.default_rng(0)
    N, H, W, C = 8, 128, 128, 64
    x = jnp.asarray(rng.standard_normal((N, H, W, C)).astype(np.float32))
    w = jnp.asarray((rng.standard_normal((3, 3, C, C)) / 24).astype(np.float32))

    dn = lax.conv_dimension_numbers(x.shape, w.shape, ("NHWC", "HWIO", "NHWC"))

    def conv(x, w, prec):
        return lax.conv_general_dilated(x, w, (1, 1), "SAME",
                                        dimension_numbers=dn, precision=prec)

    flops = 2 * N * H * W * C * C * 9

    def split_hi_lo(a):
        hi = a.astype(jnp.bfloat16)
        lo = (a - hi.astype(jnp.float32)).astype(jnp.bfloat16)
        return hi, lo

    def mk(one):
        """Chain K applications; renormalize each step to avoid overflow."""
        @jax.jit
        def run(x, w):
            def body(c, _):
                y = one(c, w)
                y = y * (1.0 / jnp.sqrt(jnp.mean(y * y) + 1e-8))
                return y, None
            out, _ = lax.scan(body, x, None, length=K)
            return out
        return run

    def v_highest(x, w):
        return conv(x, w, lax.Precision.HIGHEST)

    def v_high(x, w):
        return conv(x, w, lax.Precision.HIGH)

    def v_default(x, w):
        return conv(x, w, lax.Precision.DEFAULT)

    def v_split2(x, w):
        xh, xl = split_hi_lo(x)
        wh, wl = split_hi_lo(w)
        wcat = jnp.concatenate([wh, wl], axis=-1)
        dnb = lax.conv_dimension_numbers(xh.shape, wcat.shape,
                                         ("NHWC", "HWIO", "NHWC"))
        y = lax.conv_general_dilated(
            xh, wcat, (1, 1), "SAME", dimension_numbers=dnb,
            preferred_element_type=jnp.float32)
        y = y[..., :C] + y[..., C:]
        y = y + lax.conv_general_dilated(
            xl, wh, (1, 1), "SAME", dimension_numbers=dnb,
            preferred_element_type=jnp.float32)
        return y

    def v_merged(x, w):
        xh, xl = split_hi_lo(x)
        wh, wl = split_hi_lo(w)
        xcat = jnp.concatenate([xh, xl], axis=-1)
        wtop = jnp.concatenate([wh, wl], axis=-1)
        wbot = jnp.concatenate([wh, jnp.zeros_like(wl)], -1)
        wbig = jnp.concatenate([wtop, wbot], axis=2)
        dnb = lax.conv_dimension_numbers(xcat.shape, wbig.shape,
                                         ("NHWC", "HWIO", "NHWC"))
        y = lax.conv_general_dilated(
            xcat, wbig, (1, 1), "SAME", dimension_numbers=dnb,
            preferred_element_type=jnp.float32)
        return y[..., :C] + y[..., C:]

    def v_im2col_high(x, w):
        xp = jnp.pad(x, ((0, 0), (1, 1), (1, 1), (0, 0)))
        cols = [xp[:, i:i + H, j:j + W, :] for i in range(3) for j in range(3)]
        a = jnp.concatenate(cols, axis=-1)
        wm = w.reshape(9 * C, C)
        return jnp.einsum("nhwk,kc->nhwc", a, wm,
                          precision=lax.Precision.HIGH)

    variants = [
        ("highest (fp32 6-pass)", v_highest),
        ("high (3-pass, current)", v_high),
        ("default (bf16)", v_default),
        ("split2 (hi@128 + lo@64)", v_split2),
        ("merged 128x128 single conv", v_merged),
        ("im2col@high", v_im2col_high),
    ]

    ref = np.asarray(v_highest(x, w))
    scale = np.abs(ref).max()
    print(f"devices: {jax.devices()}", flush=True)
    for name, fn in variants:
        out = np.asarray(jax.jit(fn)(x, w))
        err = np.abs(out - ref).max() / scale
        run = mk(fn)
        y = run(x, w)
        y.block_until_ready()
        t0 = time.perf_counter()
        for _ in range(3):
            y = run(x, w)
        y.block_until_ready()
        t = (time.perf_counter() - t0) / (3 * K)
        eff = flops / t / 1e12
        print(f"{name:32s} {t*1e3:7.3f} ms  {eff:6.1f} TFLOP/s  "
              f"max rel err {err:.2e}", flush=True)


if __name__ == "__main__":
    main()
