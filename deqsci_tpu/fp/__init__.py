from deqsci_tpu.fp.anderson import anderson
from deqsci_tpu.fp.picard import picard
from deqsci_tpu.fp.deq import make_deq

__all__ = ["anderson", "picard", "make_deq"]
