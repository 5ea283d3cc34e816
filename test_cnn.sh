python -m deqsci_tpu.cli.video_sci \
--savepath ./save/test_cnn/ \
--testpath /root/reference/data/test_gray/ \
--loadpath /root/reference/models/cnn.ckpt \
--denoiser SimpleCNN \
--inference True
