#!/bin/bash
# Round-5 closing chip queue (post-outage session). Waits for the
# supervised ADMM mixed-horizon walk (pid in /tmp/sv_admm.pid) to release
# the chip, then runs serially — never two chip jobs at once:
#
#  1. ADMM budget curve {100,180,260} on whichever model shipped
#     (admm_ffdnet_r5 if the walk consolidated, else r4) — the flattened-
#     tail evidence for VERDICT r4 #5.
#  2. validate_zoo_floors on the flagship — proves the ZOO floors catch a
#     perturbed checkpoint on ALL THREE files (VERDICT r4 #4 'done' bar).
#  3. Batched-vs-sequential self-ensemble chip timing (VERDICT r4 #8).
#
# Run: nohup bash scripts/tpu_queue_r5d.sh > /tmp/queue_r5d.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
CUTOFF=${CUTOFF:-$(date -d '+3 hours' +%s)}
left() { echo $(( CUTOFF - $(date +%s) )); }

# 0. wait for the walk to release the chip
while [ -f /tmp/sv_admm.pid ] && kill -0 "$(cat /tmp/sv_admm.pid)" 2>/dev/null; do
  sleep 60
done

# 1. ADMM budget curve
if [ "$(left)" -gt 2700 ]; then
  M=models/admm_ffdnet_r4; [ -d models/admm_ffdnet_r5 ] && M=models/admm_ffdnet_r5
  timeout 2400 python -u scripts/iter_budget_curve.py \
    --model "$M" --solver admm --denoiser ffdnet --sigma_dual 1.0 \
    --budgets 100,180,260 > /tmp/admm_curve_r5.log 2>&1
  echo "curve rc=$?"
fi

# 2. floor validation (perturbed ckpt must fail; intact verified by tests)
if [ "$(left)" -gt 1800 ]; then
  timeout 1700 python -u scripts/validate_zoo_floors.py \
    --model ffdnet_ipol --skip_intact > /tmp/zoo_floor_val.log 2>&1
  echo "floors rc=$?"
fi

# 3. ensemble timing
if [ "$(left)" -gt 900 ]; then
  timeout 800 python -u scripts/ensemble_timing.py \
    > /tmp/ensemble_timing.log 2>&1
  echo "ensemble rc=$?"
fi
echo QUEUE-R5D-DONE
