# flagship config; models/ffdnet.ckpt is a stripped blob in the reference
# checkout — retrain via deqsci_tpu.cli.train_ffdnet or point --loadpath at
# a fetched checkpoint
python -m deqsci_tpu.cli.video_sci \
--savepath ./save/test_ffdnet/ \
--testpath /root/reference/data/test_gray/ \
--loadpath ./models/ffdnet.ckpt \
--denoiser ffdnet \
--and_maxiters 180 \
--inference True
