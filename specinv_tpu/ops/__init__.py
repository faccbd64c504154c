from . import fourier, framing, stft

__all__ = ["fourier", "framing", "stft"]
