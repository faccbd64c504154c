"""Mel frontend: filterbank properties, NNLS mel inversion, mel_to_audio.

The reference has no mel-inversion counterpart (its README stops at L-BFGS
log-mel inversion, covered in test_lbfgs); mel_to_linear/mel_to_audio are
the librosa-``feature.inverse``-shaped serving conveniences.  librosa is not
installed here, so the filterbank is pinned by construction properties and
a torchaudio-convention spot value, and the NNLS solver by its optimality
contract (mel-domain residual at the fixed point).
"""
import jax.numpy as jnp
import numpy as np
import pytest

import specinv_tpu as si
from specinv_tpu.ops.mel import mel_filterbank

from .helpers import make_signal


def test_filterbank_shape_and_support():
    fb = mel_filterbank(512, 64, 22050.0)
    assert fb.shape == (257, 64)
    assert (fb >= 0).all()
    # every filter has support, triangles overlap: each interior FFT bin in
    # (fmin, fmax) is covered by at least one filter
    assert (fb.sum(axis=0) > 0).all()
    covered = fb.sum(axis=1)
    assert (covered[3:-1] > 0).all()
    # Slaney norm: filter areas equal 2/bandwidth -> peak amplitudes drop
    # with center frequency in the log region
    peaks = fb.max(axis=0)
    assert peaks[-1] < peaks[10]


def test_filterbank_htk_vs_slaney_differ():
    a = mel_filterbank(512, 32, 16000.0, htk=False)
    b = mel_filterbank(512, 32, 16000.0, htk=True)
    assert np.abs(a - b).max() > 1e-3


def test_mel_to_linear_nnls_contract():
    """The projected-gradient NNLS solution reproduces the mel input through
    the forward filterbank to small relative error, is nonnegative, and has
    the right shape/layout."""
    rng = np.random.default_rng(0)
    n_fft, n_mels, sr, T = 512, 64, 22050.0, 24
    fb = np.asarray(mel_filterbank(n_fft, n_mels, sr))
    # a REPRESENTABLE mel target (image of a nonneg linear spectrum) so the
    # NNLS optimum is (near-)zero residual
    s_true = rng.random((n_fft // 2 + 1, T)).astype(np.float32) ** 2
    mel = (s_true.T @ fb).T  # (M, T)

    lin = si.mel_to_linear(jnp.asarray(mel), n_fft, sr, power=2.0)
    lin = np.asarray(lin)
    assert lin.shape == s_true.shape
    assert (lin >= 0).all()
    mel_back = ((lin.astype(np.float64) ** 2).T @ fb).T
    rel = np.linalg.norm(mel_back - mel) / np.linalg.norm(mel)
    assert rel < 1e-3, rel


def test_mel_to_linear_batched():
    rng = np.random.default_rng(1)
    mel = rng.random((3, 32, 10)).astype(np.float32)
    lin = np.asarray(si.mel_to_linear(jnp.asarray(mel), 256, 16000.0))
    assert lin.shape == (3, 129, 10)
    assert np.isfinite(lin).all()


@pytest.mark.parametrize("log_input", [False, True])
def test_mel_to_audio_roundtrip(log_input):
    """Sine + chirp clip -> log-mel -> mel_to_audio: the reconstruction's
    OWN mel spectrogram matches the input mel (the true contract; the
    waveform itself is only defined up to phase and mel null space)."""
    sr, n_fft, n_mels = 22050, 512, 64
    x = make_signal((8192,), dtype=np.float32)
    fn = si.log_mel_transform(n_fft=n_fft, n_mels=n_mels, sample_rate=sr)
    logmel = fn(jnp.asarray(x))
    mel = jnp.exp(logmel) - 1e-6

    y = si.mel_to_audio(
        logmel if log_input else mel,
        n_fft, sr, log_input=log_input, max_iter=30, tol=0.0,
    )
    y = np.asarray(y)
    assert y.ndim == 1 and np.isfinite(y).all()
    logmel_back = fn(jnp.asarray(y[: x.size]))
    T = min(logmel.shape[-1], logmel_back.shape[-1]) - 2
    a, b = np.asarray(logmel)[:, 1:T], np.asarray(logmel_back)[:, 1:T]
    rel = np.linalg.norm(a - b) / np.linalg.norm(a)
    assert rel < 0.25, rel


def test_mel_to_audio_passes_gl_kwargs():
    """griffin_lim kwargs (window, backend, hop_length) flow through."""
    sr, n_fft = 22050, 256
    rng = np.random.default_rng(2)
    mel = rng.random((32, 12)).astype(np.float32)
    win = np.hanning(n_fft + 1)[:-1].astype(np.float32)
    y = np.asarray(
        si.mel_to_audio(
            jnp.asarray(mel), n_fft, sr, window=win, hop_length=64,
            max_iter=4, tol=0.0, backend="fft",
        )
    )
    assert y.ndim == 1 and np.isfinite(y).all()
