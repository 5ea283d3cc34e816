# Reference flagship config (test_ffdnet.sh upstream: Anderson m=5,
# max_iter=180, sigma decaying unbounded). The upstream models/ffdnet.ckpt
# is a stripped blob; point --loadpath at a fetched copy to reproduce the
# paper numbers. The round-4 weights (models/ffdnet_ipol) descend from the
# REAL reference IPOL prior (networks/ffdnet/models/net_gray.pth, converted
# with golden parity) finetuned through the DEQ on data/sci_train_r3e
# (Neumann 2e-5/1e-5 then exact-IFT 8e-6/5e-6 legs, EMA 0.998; see
# scripts/ffdnet_r3_polish.py and PARITY.md round-4 section). Full
# reference schedule: 32.85 dB avg (40.77 / 32.88 / 24.89, SSIM 0.9292).
python -m deqsci_tpu.cli.video_sci \
--savepath ./save/test_ffdnet/ \
--testpath /root/reference/data/test_gray/ \
--loadpath ./models/ffdnet_ipol \
--denoiser ffdnet \
--and_maxiters 180 \
--inference True
