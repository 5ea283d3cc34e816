#!/bin/bash
# Round-5 post-walk chip queue: runs after scripts/tpu_session_r5.sh
# (the w96 walk session) exits, serially, each stage deadline-guarded.
#
# 1. Leakage-free flagship ablation (VERDICT r4 #2): the same IPOL-prior
#    recipe as the 32.85 dB flagship walk, but on data/sci_train_clean —
#    a corpus with ZERO benchmark-gt-derived pixels (photo camera-pan +
#    procedural clips only; the shared sensing mask is camera hardware,
#    kept). Shipped as models/ffdnet_clean: the generalization number
#    published next to the train-on-test one.
# 2. DE-ADMM-FFDNet mixed-horizon leg (VERDICT r4 #5): sample the solve
#    budget per batch from {120,180,260} so the weights learn to hold the
#    fixed point across budgets, flattening the >180-iteration decay.
# 3. First trained 3-D operating point (VERDICT r4 #3).
#
# Run: CUTOFF=$(date -d '14:30' +%s) nohup bash scripts/tpu_queue_r5b.sh \
#        > /tmp/queue_r5b.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
CUTOFF=${CUTOFF:-$(date -d '+6 hours' +%s)}
left() { echo $(( CUTOFF - $(date +%s) )); }

# 0. wait for the w96 session to release the chip
while [ -f /tmp/session_r5.pid ] && kill -0 "$(cat /tmp/session_r5.pid)" 2>/dev/null; do
  sleep 60
done

# 0. conv3d chip probe (2 min, bounded): the round-5 smoke run suggested
# the Unet3D conv3d compile may be pathological on the axon runtime (it
# also wedged a concurrent process's tunnel stream — never run chip jobs
# concurrently). Verdict recorded in /tmp/conv3d_probe.log for stage 3.
timeout 420 python -u -c '
import time, jax, jax.numpy as jnp
from deqsci_tpu.zoo import build_denoiser
spec = build_denoiser("unet3d_noise")
v = spec.init_variables(h=64, w=64)
x = jnp.ones((2, 8, 64, 64, 1))
t0 = time.time()
f = jax.jit(lambda v, x: spec.apply_fn()(v, x))
print("fwd:", float(jnp.sum(f(v, x))), f"{time.time()-t0:.1f}s", flush=True)
t0 = time.time()
g = jax.jit(jax.grad(lambda v: jnp.sum(f(v, x) ** 2)))
leaves = jax.tree.leaves(g(v))
print("bwd ok:", len(leaves), f"{time.time()-t0:.1f}s", flush=True)
' > /tmp/conv3d_probe.log 2>&1
CONV3D_RC=$?
echo "conv3d probe rc=$CONV3D_RC"

# 1. leakage-free ablation (~2h): shortened r4 recipe (the full walk was
# 4 legs; a 3-epoch Neumann->exact-IFT walk is a LOWER BOUND on the
# clean-corpus score, recorded as such in PARITY.md)
if [ "$(left)" -gt 9000 ] && [ -d data/sci_train_clean ]; then
  timeout $(( $(left) - 7800 )) python -u scripts/ffdnet_r3_polish.py \
    --init /root/reference/networks/ffdnet/models/net_gray.pth \
    --legs "neumann:2e-5:2,solver:1e-5:1" \
    --trainpath data/sci_train_clean --ema_decay 0.998 \
    --seed_base 300 --tag clean --floor 0.0 --out ffdnet_clean \
    > /tmp/ffd_clean.log 2>&1
fi

# 2. ADMM mixed-horizon (~1h: one epoch — the distribution move is small,
# and the consolidation must land inside the slot)
if [ "$(left)" -gt 4800 ]; then
  timeout $(( $(left) - 3600 )) python -u scripts/extend_admm_r3.py \
    --init models/admm_ffdnet_r4 --denoiser ffdnet --sigma_dual 1.0 \
    --backward neumann --lr 1.5e-5 --ema_decay 0.998 \
    --legs 180:1 --maxiter_mix 120,180,260 \
    --trainpath data/sci_train_r3e --seed_base 400 \
    --floor 31.0 --out admm_ffdnet_r5 \
    > /tmp/admm_mix.log 2>&1
fi

# 3. Unet3D operating point (~1.1h); skipped if the conv3d probe failed
if [ "$(left)" -gt 2400 ] && [ "${CONV3D_RC:-1}" -eq 0 ]; then
  timeout $(( $(left) - 300 )) python -u scripts/train_unet3d_r5.py \
    --trainpath data/sci_train_r3 --pre_steps 1500 \
    --legs "20:1:1e-4,60:2:5e-5" --out unet3d_r5 \
    > /tmp/unet3d_r5.log 2>&1
fi

echo QUEUE-R5B-DONE
