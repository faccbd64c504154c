"""STFT analysis / synthesis in time-major layout.

Equivalent behavior to ``torch.stft`` (analysis) and the reference's
``_istft``/``_ola`` synthesis pipeline (/root/reference/torch_specinv/
methods.py:114-150), re-composed for TPU:

* analysis  = center-pad -> gather-free framing -> window -> DFT (MXU or FftOp)
* synthesis = inverse DFT -> synthesis window -> dense overlap-add
              -> symmetric center trim -> window^2 envelope divide

The envelope (sum of squared, hop-shifted windows) is computed once per run and
reused across loop iterations, exactly like the reference's lazily-cached
``norm_envelope`` (methods.py:129-132).  Where the reference divides blindly
(yielding inf/NaN wherever the envelope is zero, e.g. short windows with
``center=False``), we substitute 1 for exact zeros — output differs only where
the reference produces non-finite garbage.

Layout note: all internal tensors are time-major ``(..., T, F)`` — frequency on
the 128-wide lane axis — whereas the reference (and our public wrappers) use
``(..., F, T)``.  Wrappers transpose once at the boundary.
"""
from __future__ import annotations

from typing import Optional

import jax.numpy as jnp

from ..config import STFTConfig
from . import fourier
from .framing import frame, ola_envelope, overlap_add, pad_center


def stft(
    x: jnp.ndarray,
    cfg: STFTConfig,
    window: jnp.ndarray,
    backend: str = "auto",
    precision=None,
) -> jnp.ndarray:
    """Analysis STFT of ``x`` (..., L) -> complex spectrogram (..., T, F)."""
    x = pad_center(x, cfg)
    frames = frame(x, cfg.n_fft, cfg.hop_length)
    frames = frames * window
    return fourier.forward(frames, cfg, backend=backend, precision=precision)


def make_envelope(
    cfg: STFTConfig, window: jnp.ndarray, num_frames: int
) -> jnp.ndarray:
    """Trimmed window^2 OLA envelope of shape (output_length,)."""
    win_sq = (window * window.conj()).real if jnp.iscomplexobj(window) else window * window
    env = ola_envelope(win_sq, num_frames, cfg.hop_length)
    p = cfg.pad_amount
    if p:
        env = env[p:-p]
    return env


def istft(
    spec: jnp.ndarray,
    cfg: STFTConfig,
    window: jnp.ndarray,
    envelope: Optional[jnp.ndarray] = None,
    backend: str = "auto",
    precision=None,
) -> jnp.ndarray:
    """Synthesis ISTFT of complex ``spec`` (..., T, F) -> signal (..., L_out).

    ``L_out = (T-1)*hop + n_fft - 2*pad_amount`` — the reference's symmetric
    conv-transpose trim (methods.py:148), not torch.istft length logic.
    """
    frames = fourier.inverse(spec, cfg, backend=backend, precision=precision)
    synth_window = window.real if jnp.iscomplexobj(window) else window
    frames = frames * synth_window
    x = overlap_add(frames, cfg.hop_length)
    p = cfg.pad_amount
    if p:
        x = x[..., p:-p]
    if envelope is None:
        envelope = make_envelope(cfg, window, spec.shape[-2])
    from ..utils import guards

    guards.check(
        jnp.all(envelope != 0),
        "OLA envelope contains zeros (window/hop combination leaves gaps; "
        "the torch reference would emit inf/NaN here)",
    )
    envelope = jnp.where(envelope == 0, jnp.ones_like(envelope), envelope)
    return x / envelope
