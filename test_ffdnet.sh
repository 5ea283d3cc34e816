# Reference flagship config (test_ffdnet.sh upstream: 180 iters). The
# upstream models/ffdnet.ckpt is a stripped blob; point --loadpath at a
# fetched copy to reproduce the paper numbers. The in-framework demo
# weights (models/ffdnet_demo_ft, trained by scripts/train_ffdnet_demo.py
# + equilibrium fine-tuning) operate at 60 iterations — see PARITY.md.
python -m deqsci_tpu.cli.video_sci \
--savepath ./save/test_ffdnet/ \
--testpath /root/reference/data/test_gray/ \
--loadpath ./models/ffdnet_demo_ft \
--denoiser ffdnet \
--and_maxiters 60 \
--inference True
