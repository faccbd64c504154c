from .griffin_lim import griffin_lim
from .phase_init import phase_init

__all__ = ["griffin_lim", "phase_init"]
