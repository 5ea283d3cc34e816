# DE-ADMM-CNN at the 180-iteration horizon — the best CNN-denoiser
# operating point (31.84 dB avg: 38.52 / 32.66 / 24.33, PARITY.md
# round-4 ADMM section; the overall flagship is test_ffdnet.sh).
# No upstream counterpart: the reference ships the ADMM map
# unwired (solvers/equilibrium_solvers_yaping.py:438-465) and its ADMM
# DEQ backward has zero parameter gradient, so this model family is
# trainable only here (scripts/extend_admm_r3.py).
python -m deqsci_tpu.cli.video_sci \
--savepath ./save/test_admm/ \
--testpath /root/reference/data/test_gray/ \
--loadpath ./models/admm_cnn_r4 \
--denoiser SimpleCNN \
--sci_solver admm \
--and_maxiters 180 \
--inference True
