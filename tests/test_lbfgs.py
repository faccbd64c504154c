"""L-BFGS: metric grid + transform grid (mirrors reference test_lbfgs.py),
plus convergence checks the reference lacks."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest

from specinv_tpu import L_BFGS, sc
from specinv_tpu.config import canonicalize
from specinv_tpu.ops import stft as stft_ops

from .helpers import make_signal


def _stft_mag_fn(n_fft, dtype=np.float32, power=1.0):
    cfg, w = canonicalize(n_fft // 2 + 1, dtype)
    wj = jnp.asarray(w)

    def fn(x):
        return jnp.abs(stft_ops.stft(x, cfg, wj)) ** power

    return fn


@pytest.mark.parametrize("metric", ["sc", "snr", "ser"])
@pytest.mark.parametrize("nfft", [128, 256])
def test_metric_grid(metric, nfft):
    x = make_signal((4410,), dtype=np.float32)
    fn = _stft_mag_fn(nfft)
    spec = fn(jnp.asarray(x))
    y = L_BFGS(
        spec, fn, samples=(4410,), outer_max_iter=2, max_iter=5,
        metric=metric, verbose=False,
    )
    assert y.ndim == 1 and y.shape[0] == 4410


@pytest.mark.parametrize("line_search", [None, "strong_wolfe"])
def test_converges_on_stft_magnitude(line_search):
    """Quality assertion absent from the reference: loss must drop by orders
    of magnitude on a simple invertible-ish target."""
    x = make_signal((2048,), dtype=np.float32)
    fn = _stft_mag_fn(256)
    spec = fn(jnp.asarray(x))
    y = L_BFGS(
        spec, fn, samples=(2048,), outer_max_iter=20, max_iter=20,
        line_search_fn=line_search, verbose=False,
    )
    final_sc = float(sc(fn(y), spec))
    assert final_sc < -8, final_sc


def test_init_x0():
    x = make_signal((2048,), dtype=np.float32)
    fn = _stft_mag_fn(256)
    spec = fn(jnp.asarray(x))
    y = L_BFGS(spec, fn, init_x0=x * 0.9, outer_max_iter=2, max_iter=5, verbose=False)
    assert y.shape == (2048,)


def test_requires_samples_or_x0():
    fn = _stft_mag_fn(256)
    with pytest.raises(ValueError):
        L_BFGS(jnp.zeros((129, 10)), fn, verbose=False)


def test_log_mel_inversion():
    """BASELINE config 4: invert a log-mel spectrogram (quality smoke)."""
    from specinv_tpu.ops.mel import log_mel_transform

    sr = 22050
    x = make_signal((4096,), dtype=np.float32)
    fn = log_mel_transform(n_fft=512, n_mels=64, sample_rate=sr)
    mel = fn(jnp.asarray(x))
    assert mel.ndim == 2
    y = L_BFGS(
        mel, fn, samples=(4096,), outer_max_iter=10, max_iter=20,
        line_search_fn="strong_wolfe", verbose=False,
    )
    final = float(jnp.mean((fn(y) - mel) ** 2) / jnp.mean(mel**2))
    assert final < 0.1, final
