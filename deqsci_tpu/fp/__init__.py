from deqsci_tpu.fp.anderson import anderson
from deqsci_tpu.fp.broyden import broyden
from deqsci_tpu.fp.deq import make_deq
from deqsci_tpu.fp.epsilon import epsilon2
from deqsci_tpu.fp.picard import picard

__all__ = ["anderson", "broyden", "epsilon2", "picard", "make_deq"]
