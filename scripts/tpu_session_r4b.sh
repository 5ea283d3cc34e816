#!/bin/bash
# Round-4 TPU session, stage 3 (after tpu_session_r4.sh: the DE-ADMM-FFDNet
# walk + polish + curve). Fills the remaining measurement gaps, then runs
# the wider-body flagship walk (the MXU quality-per-second lever measured
# in PARITY.md round-4: 96-channel body = 102 TF/s useful vs 56 at 64).
# Run: nohup bash scripts/tpu_session_r4b.sh > /tmp/tpu_session_r4b.log 2>&1 &
#      echo $! > /tmp/session_r4b.pid
set -x
cd "$(dirname "$0")/.."

# 0. Wait for stage 2 to exit.
while kill -0 "$(cat /tmp/session_r4.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done

# 1. DE-ADMM-CNN r4 protocol eval with SSIM (fills ZOO.json ssim: null).
timeout 1800 bash test_admm.sh > /tmp/eval_admm_cnn_r4.log 2>&1

# 2. Budget curve for the shipped admm_cnn_r4 (does the r3 knee-at-100
# plateau hold? bench.py's best_model config depends on it).
timeout 3600 python -u scripts/iter_budget_curve.py \
  --model models/admm_cnn_r4 --solver admm --denoiser SimpleCNN \
  --budgets 40,60,80,100,140,180,220 > /tmp/admm_cnn_r4_curve.log 2>&1

# 3. Budget curve for the flagship ffdnet_ipol (fast operating points).
timeout 3600 python -u scripts/iter_budget_curve.py \
  --model models/ffdnet_ipol --solver gap --denoiser ffdnet \
  --budgets 40,60,80,100,120,140,160,180,220 \
  > /tmp/ffd_ipol_curve.log 2>&1

# 4. Wider-body flagship walk: Net2Wider 96-channel init (function-
# preserving, starts AT 32.85 dB) + exact-IFT finetune to exploit the
# new capacity. Floor-guarded at the incumbent: ships models/ffdnet_w96
# only if it beats the 64-wide flagship.
if [ -d save/ffdnet_ipol_w96 ]; then
  python -u scripts/ffdnet_r3_polish.py \
    --init save/ffdnet_ipol_w96 \
    --legs "solver:8e-6:2,solver:5e-6:2" \
    --trainpath data/sci_train_r3e --ema_decay 0.998 \
    --seed_base 200 --tag w96 --floor 32.85 --out ffdnet_w96 \
    > /tmp/ffd_w96.log 2>&1
fi

# 5. Dihedral self-ensemble on the flagship (opt-in +quality mode;
# round-3 measured +0.53 dB on the 31.28 weights — re-measure on 32.85).
timeout 5400 python -m deqsci_tpu.cli.video_sci \
  --savepath /tmp/se_ipol/ --testpath /root/reference/data/test_gray/ \
  --loadpath models/ffdnet_ipol --denoiser ffdnet \
  --and_maxiters 180 --self_ensemble 1 --inference True \
  > /tmp/se_ipol.log 2>&1

echo SESSION-R4B-DONE
