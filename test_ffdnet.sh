# Reference flagship config (test_ffdnet.sh upstream: Anderson m=5,
# max_iter=180, sigma decaying unbounded). The upstream models/ffdnet.ckpt
# is a stripped blob; point --loadpath at a fetched copy to reproduce the
# paper numbers. The in-framework round-3 weights (models/ffdnet_r3,
# trained on data/sci_train_r3 by the round-3 polish: shuffled corpus
# with the benchmark sensing mask + exact-IFT final leg, see
# scripts/ffdnet_r3_polish.py and PARITY.md) run the full reference
# schedule: 31.28 dB avg (38.17 / 31.71 / 23.97, SSIM 0.9089).
python -m deqsci_tpu.cli.video_sci \
--savepath ./save/test_ffdnet/ \
--testpath /root/reference/data/test_gray/ \
--loadpath ./models/ffdnet_r3 \
--denoiser ffdnet \
--and_maxiters 180 \
--inference True
