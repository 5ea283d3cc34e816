#!/bin/bash
# Round-3 TPU session: executes scripts/TPU_QUEUE_r3.md end to end.
# Each stage logs to /tmp and is floor-guarded, so a diverged walk cannot
# regress a shipped model. Run: nohup bash scripts/tpu_session_r3.sh \
#   > /tmp/tpu_session.log 2>&1 & echo $! > /tmp/session.pid
set -x
cd "$(dirname "$0")/.."

# 1. Flagship polish on the r3e corpus (photo clips), exact IFT only.
python -u scripts/ffdnet_r3_polish.py \
  --init models/ffdnet_r3 \
  --legs "solver:1e-5:2,solver:7e-6:2,solver:5e-6:2" \
  --trainpath data/sci_train_r3e --out ffdnet_r3 --tag e \
  --seed_base 40 --floor 31.28 --ema_decay 0.998 \
  > /tmp/ffd_r3e.log 2>&1

# 1b. IPOL net_gray walk: officially-pretrained prior, Neumann first
# (big distribution move), exact-IFT polish after. Consolidates to
# models/ffdnet_ipol; compared against the incumbent afterwards.
python -u scripts/ffdnet_r3_polish.py \
  --init /root/reference/networks/ffdnet/models/net_gray.pth \
  --legs "neumann:2e-5:2,neumann:1e-5:2,solver:8e-6:2,solver:5e-6:2" \
  --trainpath data/sci_train_r3e --out ffdnet_ipol --tag i \
  --seed_base 60 --floor 0 --ema_decay 0.998 \
  > /tmp/ffd_ipol.log 2>&1

# 1c. Ship the better flagship candidate (incumbent polish vs IPOL
# finetune) into models/ffdnet_r3 so the protocol eval + bench score it.
python -u scripts/ship_best_flagship.py > /tmp/ship_flagship.log 2>&1

# 4. DE-ADMM-CNN extension on r3e (zoo leader; exact-IFT polish at the
# 180 horizon per the round-3 recipe finding).
python -u scripts/extend_admm_r3.py \
  --init models/admm_cnn_r3 --legs "180:2,180:2" \
  --trainpath data/sci_train_r3e --lr 1e-5 --backward solver \
  --ema_decay 0.998 --seed_base 80 --floor 31.81 --out admm_cnn_r3 \
  > /tmp/admm_r3e.log 2>&1

# 4b. DE-ADMM-FFDNet from the REAL IPOL prior (the GAP-init round-3
# attempt was fragile at 30.51; the strong natural-image prior is the
# stability lever per the raw-PnP finding). Floor-guarded at the
# incumbent's 30.51, horizon curriculum with Neumann for the big
# distribution move.
python -u scripts/extend_admm_r3.py \
  --init /root/reference/networks/ffdnet/models/net_gray.pth \
  --denoiser ffdnet --legs "140:2,180:2" \
  --trainpath data/sci_train_r3e --lr 2e-5 --backward neumann \
  --ema_decay 0.998 --seed_base 90 --floor 30.51 --out admm_ffdnet_r3 \
  > /tmp/admm_ipol.log 2>&1

# 2. Protocol re-eval of the shipped flagship + ADMM weights.
bash test_ffdnet.sh > /tmp/eval_ffdnet_final.log 2>&1
bash test_admm.sh > /tmp/eval_admm_final.log 2>&1

# 3. Self-ensemble measurement (opt-in extra; protocol numbers primary).
python -m deqsci_tpu.cli.video_sci --denoiser ffdnet \
  --loadpath models/ffdnet_r3 --testpath /root/reference/data/test_gray/ \
  --savepath /tmp/se_ffd/ --inference True --and_maxiters 180 \
  --self_ensemble 1 > /tmp/se_ffdnet.log 2>&1
python -m deqsci_tpu.cli.video_sci --denoiser SimpleCNN --sci_solver admm \
  --loadpath models/admm_cnn_r3 --testpath /root/reference/data/test_gray/ \
  --savepath /tmp/se_admm/ --inference True --and_maxiters 180 \
  --self_ensemble 1 > /tmp/se_admm.log 2>&1

# 6. bench sanity (the driver also runs this at round end).
python bench.py > /tmp/bench_r3.log 2>&1

echo SESSION-DONE
