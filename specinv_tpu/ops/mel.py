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

import jax
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


def mel_to_linear(
    mel: jnp.ndarray,
    n_fft: int,
    sample_rate: float,
    fmin: float = 0.0,
    fmax: float | None = None,
    htk: bool = False,
    norm: str | None = "slaney",
    power: float = 2.0,
    max_iter: int = 200,
) -> jnp.ndarray:
    """Invert a mel spectrogram ``(..., M, T)`` to a linear magnitude
    spectrogram ``(..., F, T)`` by non-negative least squares.

    Solves ``min_{S >= 0} || fbᵀ S - mel ||²`` per time frame with projected
    gradient descent + Nesterov momentum (the accelerated scheme librosa's
    ``mel_to_stft``/``nnls`` uses), seeded from the filterbank transpose
    scaled by a least-squares-optimal factor.  Everything is batched
    ``(F, M)``/``(M, F)`` matmuls over all frames at once — MXU work under
    jit — with a fixed iteration count (static for XLA; ``max_iter=200``
    reaches the NNLS fixed point to ~1e-6 relative on typical spectra).

    ``mel`` must be a POWER-law mel spectrogram (``power=2.0`` for the
    :func:`log_mel_transform` convention, before the log); the returned
    magnitude is ``S**(1/power)``, directly consumable by
    :func:`specinv_tpu.griffin_lim`.  The reference has no counterpart
    (its README stops at L-BFGS log-mel inversion); this is the
    librosa-``feature.inverse``-shaped convenience the serving guide pairs
    with Griffin-Lim.
    """
    fb_np = mel_filterbank(
        n_fft, int(mel.shape[-2]), sample_rate, fmin=fmin, fmax=fmax,
        htk=htk, norm=norm, dtype=str(np.dtype(mel.dtype)),
    )  # (F, M)
    fb = jnp.asarray(fb_np)
    m_tm = jnp.swapaxes(mel, -1, -2)  # (..., T, M)

    # Lipschitz constant of 0.5*||x fb - m||^2 in x: largest eigenvalue of
    # fb fbᵀ — a tiny (F, F) host-side power iteration would do, but the
    # spectral norm bound ||fb||_1 ||fb||_inf is cheap, static, and within
    # ~2x for banded triangular filterbanks.  Computed on the NUMPY table:
    # under jit/shard_map the jnp constant is a lifted tracer (shard_map
    # hoists closure consts to replicated operands), so np.linalg on ``fb``
    # would raise TracerArrayConversionError.
    lip = float(
        np.linalg.norm(fb_np, 1) * np.linalg.norm(fb_np, np.inf)
    )
    step = jnp.asarray(1.0 / lip, m_tm.dtype)

    # Seed: fb-transpose backprojection, scaled to the LS-optimal multiple.
    x0 = m_tm @ fb.T  # (..., T, F)
    y0 = x0 @ fb
    num = jnp.sum(y0 * m_tm, axis=-1, keepdims=True)
    den = jnp.sum(y0 * y0, axis=-1, keepdims=True)
    x0 = x0 * jnp.where(den > 0, num / jnp.maximum(den, 1e-30), 1.0)
    x0 = jnp.maximum(x0, 0.0)

    def body(_, carry):
        x, z, t = carry
        grad = (z @ fb - m_tm) @ fb.T
        x_new = jnp.maximum(z - step * grad, 0.0)
        t_new = 0.5 * (1.0 + jnp.sqrt(1.0 + 4.0 * t * t))
        z_new = x_new + ((t - 1.0) / t_new) * (x_new - x)
        return x_new, z_new, t_new

    x, _, _ = jax.lax.fori_loop(
        0, max_iter, body, (x0, x0, jnp.asarray(1.0, m_tm.dtype))
    )
    lin_pow = jnp.swapaxes(x, -1, -2)  # (..., F, T)
    return lin_pow ** (1.0 / power)


def mel_to_audio(
    mel: jnp.ndarray,
    n_fft: int,
    sample_rate: float,
    hop_length: int | None = None,
    window=None,
    fmin: float = 0.0,
    fmax: float | None = None,
    htk: bool = False,
    norm: str | None = "slaney",
    power: float = 2.0,
    nnls_iter: int = 200,
    log_input: bool = False,
    log_offset: float = 1e-6,
    **griffin_lim_kwargs,
):
    """Mel spectrogram ``(..., M, T)`` -> waveform, the librosa
    ``feature.inverse.mel_to_audio`` convenience: NNLS mel inversion
    (:func:`mel_to_linear`) followed by :func:`specinv_tpu.griffin_lim`
    (all its kwargs pass through — ``max_iter``, ``tol``, ``backend``,
    ``pack``, ...).  ``log_input=True`` accepts the
    :func:`log_mel_transform` output directly (undoes ``log(mel + eps)``).
    """
    from ..models.griffin_lim import griffin_lim

    if log_input:
        mel = jnp.maximum(jnp.exp(mel) - log_offset, 0.0)
    lin = mel_to_linear(
        mel, n_fft, sample_rate, fmin=fmin, fmax=fmax, htk=htk, norm=norm,
        power=power, max_iter=nnls_iter,
    )
    griffin_lim_kwargs.setdefault("verbose", False)
    if window is not None:
        griffin_lim_kwargs["window"] = window
    if hop_length is not None:
        griffin_lim_kwargs["hop_length"] = hop_length
    return griffin_lim(lin, **griffin_lim_kwargs)


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
