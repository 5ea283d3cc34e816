# Reference flagship config (test_ffdnet.sh upstream: Anderson m=5,
# max_iter=180, sigma decaying unbounded). The upstream models/ffdnet.ckpt
# is a stripped blob; point --loadpath at a fetched copy to reproduce the
# paper numbers. The in-framework round-2 weights (models/ffdnet_r2,
# trained by scripts/finetune_ffdnet_r2.py + scripts/ffdnet_curriculum.py)
# run the full reference schedule: 29.20 dB avg — see PARITY.md.
python -m deqsci_tpu.cli.video_sci \
--savepath ./save/test_ffdnet/ \
--testpath /root/reference/data/test_gray/ \
--loadpath ./models/ffdnet_r2 \
--denoiser ffdnet \
--and_maxiters 180 \
--inference True
