from deqsci_tpu.nets.dncnn import DnCNN
from deqsci_tpu.nets.ffdnet import FFDNet

__all__ = ["DnCNN", "FFDNet"]
