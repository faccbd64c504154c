"""specinv_tpu — TPU-native spectrogram inversion.

A from-scratch JAX/XLA/Pallas re-design of the capabilities of
``torch_specinv`` (yoyololicon/spectrogram-inversion): Griffin-Lim / Fast
Griffin-Lim, RTISI-LA streaming inversion, ADMM phase retrieval, L-BFGS
inversion of arbitrary differentiable transforms, SPSI phase initialization,
and the sc/snr/ser metrics — all on-device, differentiable, batch-shardable
over a TPU mesh.
"""
name = "specinv_tpu"
__version__ = "0.5.0"

from .metrics import sc, ser, snr, spectral_convergence  # noqa: F401
from .models import (  # noqa: F401
    ADMM,
    L_BFGS,
    RTISI_LA,
    RTISIStreamer,
    admm,
    griffin_lim,
    l_bfgs,
    phase_init,
    rtisi_la,
)
from .config import STFTConfig, canonicalize  # noqa: F401
from .ops.mel import (  # noqa: F401
    log_mel_transform,
    mel_filterbank,
    mel_to_audio,
    mel_to_linear,
)
from .transforms import istft, stft  # noqa: F401

__all__ = [
    "ADMM",
    "admm",
    "L_BFGS",
    "l_bfgs",
    "RTISI_LA",
    "RTISIStreamer",
    "rtisi_la",
    "griffin_lim",
    "phase_init",
    "sc",
    "snr",
    "ser",
    "spectral_convergence",
    "STFTConfig",
    "canonicalize",
    "stft",
    "istft",
    "log_mel_transform",
    "mel_filterbank",
    "mel_to_audio",
    "mel_to_linear",
]
