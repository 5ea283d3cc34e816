#!/bin/bash
# Round-5 final chip queue — fired when the tunnel returns from the
# 10:10 outage. Serial, each stage bounded; never two chip jobs at once.
#
#  1. verify drive (synthetic recon + DEQ gradient on the chip)
#  2. conv3d small-variant probe (train + eval shapes, bounded)
#  3. if probe OK: Unet3D DEQ finetune legs from the banked CPU
#     pretrain checkpoint -> models/unet3d_r5 (VERDICT r4 #3)
#  4. DE-ADMM-FFDNet mixed-horizon leg, stall-supervised
#     -> models/admm_ffdnet_r5 (VERDICT r4 #5)
#  5. ADMM budget curve {100,180,260} to prove the flattened tail
#
# Run: CUTOFF=$(date -d '14:20' +%s) nohup bash scripts/tpu_queue_r5c.sh \
#        > /tmp/queue_r5c.log 2>&1 &
set -x
cd "$(dirname "$0")/.."
CUTOFF=${CUTOFF:-$(date -d '+4 hours' +%s)}
left() { echo $(( CUTOFF - $(date +%s) )); }

# 1. verify drive
timeout 600 python -u scripts/verify_drive.py > /tmp/verify_drive.log 2>&1
echo "verify rc=$?"

# 2. conv3d probe
if [ "$(left)" -gt 5400 ]; then
  timeout 700 python -u scripts/conv3d_chip_probe.py \
    > /tmp/conv3d_probe2.log 2>&1
  echo "conv3d probe rc=$?"
fi

# 3. unet3d DEQ legs (chip) if the probe passed
if grep -q PROBE_OK /tmp/conv3d_probe2.log 2>/dev/null \
   && [ "$(left)" -gt 5400 ]; then
  timeout $(( $(left) - 4500 )) python -u scripts/train_unet3d_r5.py \
    --denoiser unet3d_noise_small --trainpath data/sci_train_3dsub \
    --skip_pretrain save/unet3d_pre --clips 200 \
    --legs "8:1:1e-4,16:1:7e-5,16:1:5e-5" --batch_size 1 --neumann_k 8 \
    --save_every 100 --out unet3d_r5 > /tmp/unet3d_chip.log 2>&1
  echo "unet3d rc=$?"
fi

# 4. ADMM mixed-horizon leg, supervised (owns the chip until done)
if [ "$(left)" -gt 2400 ]; then
  python -u scripts/supervise_walk.py --driver admm --out admm_ffdnet_r5 \
    --init models/admm_ffdnet_r4 --legs 180:1 --maxiter_mix 120,180,260 \
    --trainpath data/sci_train_r3e --lr 1.5e-5 --floor 31.0 \
    --stall 780 --deadline-in $(( $(left) - 1500 )) --seed_base 400 \
    > /tmp/sv_admm.log 2>&1
  echo "admm rc=$?"
fi

# 5. budget curve on whichever ADMM model shipped
if [ "$(left)" -gt 1200 ]; then
  M=models/admm_ffdnet_r4; [ -d models/admm_ffdnet_r5 ] && M=models/admm_ffdnet_r5
  timeout $(( $(left) - 300 )) python -u scripts/iter_budget_curve.py \
    --model "$M" --solver admm --denoiser ffdnet --sigma_dual 1.0 \
    --budgets 100,180,260 > /tmp/admm_curve_r5.log 2>&1
  echo "curve rc=$?"
fi
echo QUEUE_DONE
