from .admm import ADMM, admm
from .lbfgs import L_BFGS, l_bfgs
from .rtisi_la import RTISI_LA, RTISIStreamer, rtisi_la
from .griffin_lim import griffin_lim
from .phase_init import phase_init

__all__ = ["ADMM", "admm", "L_BFGS", "l_bfgs", "RTISI_LA", "RTISIStreamer", "rtisi_la", "griffin_lim", "phase_init"]
