"""Bounded probe: can the axon chip compile/run the small 3-D U-Net?

Round-5 finding: the full-size ``unet3d_noise`` conv3d stack hangs the
axon runtime's compile (>420 s, probe rc=124) — reference module
/root/reference/networks/normalized_equilibrium_u_net_yaping.py:273-402.
This probe checks the capacity-reduced ``unet3d_noise_small`` zoo
variant at the two shapes the DEQ finetune needs:

  1. train shape   (batch 1, 8 frames, 256x256 crops? -> actual training
     uses full 256x256 clips, batch 1)
  2. eval shape    (8 snapshot lanes vmapped by recon over one clip)

Run bounded:  timeout 600 python -u scripts/conv3d_chip_probe.py
Exit 0 = both shapes compile and run; nonzero/timeout = keep the CPU
fallback. NEVER run concurrently with another chip job (a killed
concurrent compile wedges the survivor's RPC stream).
"""
import os
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    import jax.numpy as jnp
    from deqsci_tpu.zoo import build_denoiser

    print("devices:", jax.devices(), flush=True)
    spec = build_denoiser("unet3d_noise_small")
    apply_fn = spec.apply_fn()

    for name, shape in [("train(1,8,256,256,1)", (1, 8, 256, 256, 1)),
                        ("eval(8,8,256,256,1)", (8, 8, 256, 256, 1))]:
        v = spec.init_variables(h=shape[2], w=shape[3])
        x = jnp.ones(shape, jnp.float32)
        t0 = time.time()
        f = jax.jit(apply_fn)
        y = f(v, x)
        s = float(jnp.sum(y))  # host fetch = the only reliable sync
        t1 = time.time()
        y = f(v, x)
        s2 = float(jnp.sum(y))
        t2 = time.time()
        print(f"{name}: compile+run {t1-t0:.1f}s warm {t2-t1:.3f}s "
              f"sum {s:.4f}/{s2:.4f}", flush=True)
    print("PROBE_OK", flush=True)


if __name__ == "__main__":
    main()
