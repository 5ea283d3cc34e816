python -m deqsci_tpu.cli.video_sci \
--savepath ./save/train_ffdnet/ \
--trainpath ./data/DAVIS/matlab/ \
--testpath /root/reference/data/test_gray/ \
--denoiser ffdnet \
--and_maxiters 180
