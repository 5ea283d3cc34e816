from deqsci_tpu.maps.gap_sci import GapSCI, make_gap_sci_step
from deqsci_tpu.maps.admm_sci import make_admm_sci_step

__all__ = ["GapSCI", "make_gap_sci_step", "make_admm_sci_step"]
