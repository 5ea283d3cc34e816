#!/bin/bash
# Round-4 TPU session, stage 4: finish the wider-flagship (w96) walk and
# fill the remaining measurement gaps. Crash-proof continuation of
# tpu_session_r4b.sh stages 3-5 (the interactive session that launched
# w96 leg 1 died mid-flight; this script owns the rest of the queue).
#
# Every stage checks a hard wall-clock deadline before starting and is
# timeout-bounded to end before it: the round-end driver runs bench.py on
# this chip, and a stage still running at capture time would recreate the
# round-3 contention artifact (VERDICT r3 weak #1). Expendable stages
# (self-ensemble) are ordered last.
#
# Run: DEADLINE=$(date -d '2026-08-20 01:00 UTC' +%s) \
#      nohup bash scripts/tpu_session_r4c.sh > /tmp/tpu_session_r4c.log 2>&1 &
#      echo $! > /tmp/session_r4c.pid
set -x
cd "$(dirname "$0")/.."
DEADLINE=${DEADLINE:-$(date -d '+3 hours' +%s)}
left() { echo $(( DEADLINE - $(date +%s) )); }

# 0. Wait for w96 leg 1 (launched as /tmp/w96.pid) to exit.
while kill -0 "$(cat /tmp/w96.pid 2>/dev/null)" 2>/dev/null; do
  sleep 60
done

# 1. w96 leg 2 (exact IFT, lr 5e-6): chain from leg 1's global best
# (the driver prints it whether or not it beat the floor), floor at
# max(incumbent 32.85, leg-1 best) so a flat leg cannot regress the ship.
# Needs ~80 min; start only with 95+ min in hand.
if [ "$(left)" -gt 5700 ]; then
  LEG1_BEST=$(grep -oa "global best: [0-9.]*" /tmp/ffd_w96_leg1.log \
              | tail -1 | awk '{print $3}')
  LEG1_CKPT=$(grep -oa "global best: .* dB at .*" /tmp/ffd_w96_leg1.log \
              | tail -1 | sed 's/.* dB at //')
  FLOOR=$(python3 -c "print(max(32.85, float('${LEG1_BEST:-0}')))")
  INIT=${LEG1_CKPT:-save/ffdnet_ipol_w96}
  timeout $(( $(left) - 2400 )) python -u scripts/ffdnet_r3_polish.py \
    --init "$INIT" --legs "solver:5e-6:2" \
    --trainpath data/sci_train_r3e --ema_decay 0.998 \
    --seed_base 201 --tag w96b --floor "$FLOOR" --out ffdnet_w96 \
    > /tmp/ffd_w96_leg2.log 2>&1
fi

# 2. Budget curve for the shipped flagship (w96 if it shipped, else the
# ipol incumbent): fast operating points for PARITY.md. ~35 min.
FLAG=models/ffdnet_ipol
[ -d models/ffdnet_w96 ] && FLAG=models/ffdnet_w96
if [ "$(left)" -gt 2700 ]; then
  timeout $(( $(left) - 1200 )) python -u scripts/iter_budget_curve.py \
    --model "$FLAG" --solver gap --denoiser ffdnet \
    --budgets 40,60,80,100,120,140,160,180 \
    > /tmp/ffd_flag_curve.log 2>&1
fi

# 3. bench.py validation run on the idle chip (the best_model block now
# prefers the DE-ADMM-FFDNet 100-iteration knee). ~15 min.
if [ "$(left)" -gt 1080 ]; then
  timeout $(( $(left) - 120 )) python -u bench.py > /tmp/bench_r4.log 2>&1
fi

# 4. Dihedral self-ensemble on the shipped flagship (round-3 measured
# +0.53 dB on the 31.28 weights; re-measure on the 32.85+ lineage).
# Most expendable: only with a full hour in hand.
if [ "$(left)" -gt 3600 ]; then
  timeout $(( $(left) - 300 )) python -m deqsci_tpu.cli.video_sci \
    --savepath /tmp/se_ipol/ --testpath /root/reference/data/test_gray/ \
    --loadpath "$FLAG" --denoiser ffdnet \
    --and_maxiters 180 --self_ensemble 1 --inference True \
    > /tmp/se_flag.log 2>&1
fi

echo SESSION-R4C-DONE
