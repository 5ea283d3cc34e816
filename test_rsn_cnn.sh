python -m deqsci_tpu.cli.video_sci \
--savepath ./save/test_rsn_cnn/ \
--testpath /root/reference/data/test_gray/ \
--loadpath /root/reference/models/rsn_cnn.ckpt \
--denoiser RealSN_SimpleCNN \
--inference True
