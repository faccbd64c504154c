"""Mel filterbank and log-mel transform (example differentiable frontend).

The reference's README demonstrates L-BFGS inversion of a log-mel spectrogram
built from torchaudio-style pieces (/root/reference/README.md:57-70); this
module provides the equivalent building block natively: a Slaney-normalized
triangular mel filterbank applied as a single (F, M) matmul — MXU-friendly —
plus a ready-made ``log_mel_transform`` for use as an ``L_BFGS``
``transform_fn``.
"""
from __future__ import annotations

import functools

import jax.numpy as jnp
import numpy as np

from ..config import canonicalize
from . import stft as stft_ops


def hz_to_mel(f, htk: bool = False):
    f = np.asarray(f, dtype=np.float64)
    if htk:
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # Slaney: linear below 1 kHz, log above.
    f_min, f_sp = 0.0, 200.0 / 3
    mel = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        f >= min_log_hz,
        min_log_mel + np.log(np.maximum(f, 1e-30) / min_log_hz) / logstep,
        mel,
    )


def mel_to_hz(m, htk: bool = False):
    m = np.asarray(m, dtype=np.float64)
    if htk:
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(
        m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), f_min + f_sp * m
    )


@functools.lru_cache(maxsize=16)
def mel_filterbank(
    n_fft: int,
    n_mels: int,
    sample_rate: float,
    fmin: float = 0.0,
    fmax: float | None = None,
    htk: bool = False,
    norm: str | None = "slaney",
    dtype: str = "float32",
) -> np.ndarray:
    """Triangular mel filterbank, shape (n_fft//2 + 1, n_mels)."""
    if fmax is None:
        fmax = sample_rate / 2
    num_freqs = n_fft // 2 + 1
    fft_freqs = np.linspace(0, sample_rate / 2, num_freqs)
    mel_pts = np.linspace(hz_to_mel(fmin, htk), hz_to_mel(fmax, htk), n_mels + 2)
    hz_pts = mel_to_hz(mel_pts, htk)

    lower = hz_pts[:-2][None, :]   # (1, M)
    center = hz_pts[1:-1][None, :]
    upper = hz_pts[2:][None, :]
    f = fft_freqs[:, None]         # (F, 1)
    up_slope = (f - lower) / np.maximum(center - lower, 1e-10)
    down_slope = (upper - f) / np.maximum(upper - center, 1e-10)
    fb = np.maximum(0.0, np.minimum(up_slope, down_slope))
    if norm == "slaney":
        enorm = 2.0 / (hz_pts[2:] - hz_pts[:-2])
        fb = fb * enorm[None, :]
    return fb.astype(dtype)


def log_mel_transform(
    n_fft: int,
    n_mels: int,
    sample_rate: float,
    hop_length: int | None = None,
    window=None,
    power: float = 2.0,
    log_offset: float = 1e-6,
    dtype=np.float32,
):
    """Build a differentiable ``x (L,) -> log-mel (M, T)`` transform_fn.

    Layout matches the reference convention (feature axis first) so its output
    can be fed straight to :func:`specinv_tpu.L_BFGS`.
    """
    cfg, w = canonicalize(
        n_fft // 2 + 1, dtype, hop_length=hop_length, window=window
    )
    wj = jnp.asarray(w)
    fb = jnp.asarray(
        mel_filterbank(n_fft, n_mels, sample_rate, dtype=str(np.dtype(dtype)))
    )

    def fn(x):
        spec = jnp.abs(stft_ops.stft(x, cfg, wj)) ** power  # (..., T, F)
        mel = spec @ fb  # (..., T, M)
        return jnp.log(mel + log_offset).swapaxes(-1, -2)  # (..., M, T)

    return fn
