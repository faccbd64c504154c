"""STFT configuration & canonicalization.

TPU-native replacement for the reference's ``_args_helper``
(/root/reference/torch_specinv/methods.py:21-91).  The reference's entire
"config system" is the ``**stft_kwargs`` passthrough to ``torch.stft``; here the
same parameter space and default-inference rules are captured in a hashable,
static :class:`STFTConfig` dataclass so jitted functions can treat every field
except the window array as a compile-time constant (static shapes are what let
XLA tile the DFT matmuls onto the MXU).

Default-inference rules reproduced exactly (methods.py line refs):
  * ``onesided`` inferred from window complexity            (59-63)
  * ``n_fft = (F-1)*2`` if onesided else ``F``              (65-68)
  * ``win_length = n_fft`` when unset                       (70-71)
  * ``hop_length = n_fft // 4`` when unset                  (73-74)
  * rectangular window default                              (76-77)
  * window zero-padded symmetrically up to ``n_fft``        (80-83)
  * ``return_complex`` forced (we always return complex)    (88)
"""
from __future__ import annotations

import dataclasses
from typing import Any, Optional

import numpy as np

# jnp.pad names for the torch pad_mode vocabulary.
_PAD_MODE_MAP = {
    "reflect": "reflect",
    "constant": "constant",
    "replicate": "edge",
    "circular": "wrap",
}

STFT_KWARG_NAMES = (
    "win_length",
    "window",
    "hop_length",
    "center",
    "pad_mode",
    "normalized",
    "onesided",
    "return_complex",
)


@dataclasses.dataclass(frozen=True)
class STFTConfig:
    """Fully-canonicalized STFT parameters. Hashable → usable as a jit-static arg.

    The window array itself is *not* stored here (arrays aren't hashable); it is
    carried alongside as a regular traced argument. ``win_length`` is always
    ``n_fft`` post-canonicalization (the window has been zero-padded).
    """

    n_fft: int
    hop_length: int
    center: bool = True
    pad_mode: str = "reflect"
    normalized: bool = False
    onesided: bool = True

    @property
    def num_freqs(self) -> int:
        return self.n_fft // 2 + 1 if self.onesided else self.n_fft

    @property
    def fft_norm(self) -> Optional[str]:
        return "ortho" if self.normalized else None

    @property
    def pad_amount(self) -> int:
        """Samples of center padding on each side."""
        return self.n_fft // 2 if self.center else 0

    @property
    def jnp_pad_mode(self) -> str:
        return _PAD_MODE_MAP[self.pad_mode]

    def num_frames(self, num_samples: int) -> int:
        padded = num_samples + 2 * self.pad_amount
        return 1 + (padded - self.n_fft) // self.hop_length

    def output_length(self, num_frames: int) -> int:
        """ISTFT output length: full OLA length minus the center trim.

        Mirrors the reference ``conv_transpose1d(..., padding=n_fft//2 if
        center else 0)`` semantics (methods.py:148): symmetric trim, *not*
        torch.istft's original-length logic.
        """
        full = (num_frames - 1) * self.hop_length + self.n_fft
        return full - 2 * self.pad_amount


def _as_numpy_window(window: Any) -> np.ndarray:
    """Accept numpy / jax / torch / list windows uniformly."""
    if hasattr(window, "detach"):  # torch tensor without importing torch
        window = window.detach().cpu().numpy()
    return np.asarray(window)


def canonicalize(
    num_freq_bins: int,
    real_dtype: Any,
    win_length: Optional[int] = None,
    window: Any = None,
    hop_length: Optional[int] = None,
    center: bool = True,
    pad_mode: str = "reflect",
    normalized: bool = False,
    onesided: Optional[bool] = None,
    return_complex: Optional[bool] = None,  # accepted for API parity; ignored
    **_ignored: Any,
):
    """Canonicalize torch.stft-style kwargs given the spectrogram's freq-bin count.

    Returns ``(config, window)`` where ``window`` is a dense float (or complex)
    numpy array of length ``n_fft``.
    """
    del return_complex
    if pad_mode not in _PAD_MODE_MAP:
        raise ValueError(f"unsupported pad_mode {pad_mode!r}")

    if window is not None:
        window = _as_numpy_window(window)

    if onesided is None:
        onesided = not (window is not None and np.iscomplexobj(window))

    if onesided:
        n_fft = (num_freq_bins - 1) * 2
    else:
        n_fft = num_freq_bins

    if not win_length:
        win_length = n_fft
    if not hop_length:
        hop_length = n_fft // 4

    if window is None:
        window = np.ones(win_length, dtype=np.dtype(real_dtype))

    if n_fft < win_length:
        raise ValueError(f"n_fft ({n_fft}) must be >= win_length ({win_length})")
    if n_fft > win_length:
        lpad = (n_fft - win_length) // 2
        rpad = (n_fft - win_length + 1) // 2
        window = np.pad(window, (lpad, rpad))

    cfg = STFTConfig(
        n_fft=n_fft,
        hop_length=hop_length,
        center=center,
        pad_mode=pad_mode,
        normalized=normalized,
        onesided=onesided,
    )
    return cfg, window


def split_stft_kwargs(kwargs: dict):
    """Split a kwargs dict into (stft_kwargs, rest)."""
    stft = {k: v for k, v in kwargs.items() if k in STFT_KWARG_NAMES}
    rest = {k: v for k, v in kwargs.items() if k not in STFT_KWARG_NAMES}
    return stft, rest
