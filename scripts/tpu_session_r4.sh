#!/bin/bash
# Round-4 TPU session, stage 2 (after the flagship IPOL walk shipped
# models/ffdnet_ipol at 32.85 dB and the DE-ADMM-CNN r3e extension ran):
# the remaining VERDICT r3 items that need the chip.
# Run: nohup bash scripts/tpu_session_r4.sh > /tmp/tpu_session_r4.log 2>&1 &
#      echo $! > /tmp/session_r4.pid
set -x
cd "$(dirname "$0")/.."

# 0. Wait for the in-flight DE-ADMM-CNN extension (VERDICT #7) to exit.
while kill -0 "$(cat /tmp/train_admm.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done

# 6a. DE-ADMM-FFDNet from the REAL IPOL prior under the ADMM carry from
# the start (VERDICT #6: not adapted from GAP weights), with the
# dual-RMS sigma floor curriculum (coef=1.0 — the measured sharp optimum
# of scripts/sigma_dual_probe.py, PARITY.md round-4). Neumann backward
# for the big distribution move; floor-guarded at the r3 incumbent.
python -u scripts/extend_admm_r3.py \
  --init /root/reference/networks/ffdnet/models/net_gray.pth \
  --denoiser ffdnet --legs "180:2,180:2" --sigma_dual 1.0 \
  --trainpath data/sci_train_r3e --lr 2e-5 --backward neumann \
  --ema_decay 0.998 --seed_base 100 --floor 30.51 --out admm_ffdnet_r4 \
  > /tmp/admm_ffd_r4.log 2>&1

# 6b. The stability test the r3 lineage failed: an exact-IFT polish leg
# at lr 8e-6 (r3 GAP-adapted weights collapsed to ~25 dB at this lr).
# Writes to a separate name so a regression cannot clobber 6a's result;
# shipped manually after comparing.
if [ -d models/admm_ffdnet_r4 ]; then
  python -u scripts/extend_admm_r3.py \
    --init models/admm_ffdnet_r4 \
    --denoiser ffdnet --legs "180:2" --sigma_dual 1.0 \
    --trainpath data/sci_train_r3e --lr 8e-6 --backward solver \
    --ema_decay 0.998 --seed_base 110 --floor 30.51 \
    --out admm_ffdnet_r4p > /tmp/admm_ffd_r4p.log 2>&1
fi

# 6c. Budget curve past the training horizon (flatness criterion).
BEST=models/admm_ffdnet_r4
[ -d models/admm_ffdnet_r4p ] && BEST=models/admm_ffdnet_r4p
if [ -d "$BEST" ]; then
  python -u scripts/iter_budget_curve.py --model "$BEST" \
    --solver admm --denoiser ffdnet --sigma_dual 1.0 \
    --budgets 60,100,140,180,220,260 > /tmp/admm_ffd_r4_curve.log 2>&1
fi

echo SESSION-R4-DONE
