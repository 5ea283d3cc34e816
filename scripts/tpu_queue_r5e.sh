#!/bin/bash
# Round-5 recovery queue: waits for the axon tunnel to return (the
# remote-compile helper died with signal 15 mid-session), then runs the
# remaining chip agenda serially, highest-value first:
#
#  1. ADMM budget curve {100,180,260} on admm_ffdnet_r4 with the sigma
#     schedule FROZEN at its k=180 value (sigma_min=1.1775e-3): bit-
#     identical iterates below 180, autonomous map past it — the
#     DEQ-native candidate fix for the >180-iteration tail decay
#     (VERDICT r4 #5). Baseline without the freeze is already recorded:
#     32.28 @100 / 32.01 @180 / 31.41 @260.
#  2. Same curve frozen at the k=100 knee value (sigma_min=1.24e-2) —
#     diagnostic: if the dual-RMS floor dominates past-horizon sigma,
#     variant 1 is a no-op and only this one moves the tail.
#  3. validate_zoo_floors --skip_intact: perturbed flagship must fail
#     the three-file floors (VERDICT r4 #4 done-bar).
#  4. Batched-vs-sequential self-ensemble chip timing (VERDICT r4 #8).
#
# Run: CUTOFF=<epoch> nohup bash scripts/tpu_queue_r5e.sh \
#        > /tmp/queue_r5e.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
CUTOFF=${CUTOFF:-$(date -d '+150 minutes' +%s)}
left() { echo $(( CUTOFF - $(date +%s) )); }

# 0. wait for the tunnel: a tiny real compile+execute, not just devices()
while [ "$(left)" -gt 600 ]; do
  timeout 150 python -c "
import jax, jax.numpy as jnp
y = jax.jit(lambda x: jnp.sum(x @ x))(jnp.ones((256, 256)))
assert float(y) == 16777216.0
print('TPU-UP')" > /tmp/tpu_up.log 2>&1
  grep -q TPU-UP /tmp/tpu_up.log && break
  echo "$(date) tunnel still down"
  sleep 120
done
grep -q TPU-UP /tmp/tpu_up.log || { echo NO-TPU; exit 1; }
echo "$(date) tunnel back"

# 1. freeze@180 curve
if [ "$(left)" -gt 1500 ]; then
  timeout $(( $(left) - 900 > 2100 ? 2100 : $(left) - 900 )) \
    python -u scripts/iter_budget_curve.py \
    --model models/admm_ffdnet_r4 --solver admm --denoiser ffdnet \
    --sigma_dual 1.0 --sigma_min 0.0011775 --budgets 100,180,260 \
    > /tmp/admm_curve_freeze180.log 2>&1
  echo "freeze180 rc=$?"
fi

# 2. freeze@100 curve
if [ "$(left)" -gt 1500 ]; then
  timeout $(( $(left) - 900 > 2100 ? 2100 : $(left) - 900 )) \
    python -u scripts/iter_budget_curve.py \
    --model models/admm_ffdnet_r4 --solver admm --denoiser ffdnet \
    --sigma_dual 1.0 --sigma_min 0.0124 --budgets 100,180,260 \
    > /tmp/admm_curve_freeze100.log 2>&1
  echo "freeze100 rc=$?"
fi

# 3. floor validation
if [ "$(left)" -gt 1100 ]; then
  timeout $(( $(left) - 600 > 1700 ? 1700 : $(left) - 600 )) \
    python -u scripts/validate_zoo_floors.py \
    --model ffdnet_ipol --skip_intact > /tmp/zoo_floor_val.log 2>&1
  echo "floors rc=$?"
fi

# 4. ensemble timing
if [ "$(left)" -gt 500 ]; then
  timeout $(( $(left) - 60 > 800 ? 800 : $(left) - 60 )) \
    python -u scripts/ensemble_timing.py > /tmp/ensemble_timing.log 2>&1
  echo "ensemble rc=$?"
fi
echo QUEUE-R5E-DONE
