# DE-ADMM-CNN at the 180-iteration horizon — the best operating point in
# the zoo (31.81 dB avg: 38.48 / 32.61 / 24.35, PARITY.md round-3 ADMM
# section). No upstream counterpart: the reference ships the ADMM map
# unwired (solvers/equilibrium_solvers_yaping.py:438-465) and its ADMM
# DEQ backward has zero parameter gradient, so this model family is
# trainable only here (scripts/extend_admm_r3.py).
python -m deqsci_tpu.cli.video_sci \
--savepath ./save/test_admm/ \
--testpath /root/reference/data/test_gray/ \
--loadpath ./models/admm_cnn_r3 \
--denoiser SimpleCNN \
--sci_solver admm \
--and_maxiters 180 \
--inference True
