"""Public specinv_tpu.stft / istft wrappers: torch-layout parity + round trip."""
import jax
import jax.numpy as jnp
import numpy as np
import pytest

import specinv_tpu as si
from .helpers import make_signal, torch_stft


@pytest.mark.parametrize("n_fft", [256, 512])
@pytest.mark.parametrize(
    "kwargs",
    [
        {},
        {"hop_length": 100},
        {"win_length": 200},
        {"center": False},
        {"normalized": True},
        {"pad_mode": "constant"},
    ],
)
def test_stft_matches_torch(n_fft, kwargs):
    x = make_signal((4410,), dtype=np.float64)
    win = np.hanning(kwargs.get("win_length", n_fft) + 1)[:-1].astype(np.float64)
    ours = np.asarray(si.stft(x, n_fft, window=win, **kwargs))
    ref = torch_stft(x, n_fft, window=win, **kwargs)
    assert ours.shape == ref.shape  # (F, T) torch layout
    np.testing.assert_allclose(ours, ref, atol=1e-8)


def test_stft_batched_layout():
    x = make_signal((3, 4410,), dtype=np.float32)
    out = si.stft(x, 512)
    assert out.shape[:2] == (3, 257)
    one = si.stft(x[1], 512)
    np.testing.assert_allclose(np.asarray(out[1]), np.asarray(one), atol=1e-5)


def test_round_trip_recovers_signal():
    x = make_signal((8192,), dtype=np.float64)
    win = np.hanning(513)[:-1].astype(np.float64)
    spec = si.stft(x, 512, window=win, hop_length=128)
    y = np.asarray(si.istft(spec, window=win, hop_length=128, length=x.size))
    # center=True + hann + 4x overlap: interior is exact, edges envelope-correct
    np.testing.assert_allclose(y, x, atol=1e-9)


def test_round_trip_full_spectrum():
    x = make_signal((4096,), dtype=np.float64)
    spec = si.stft(x, 512, onesided=False, hop_length=128)
    assert spec.shape[0] == 512  # full spectrum keeps all bins
    y = np.asarray(si.istft(spec, onesided=False, hop_length=128, length=x.size))
    np.testing.assert_allclose(y, x, atol=1e-9)


def test_istft_length_pads_and_crops():
    x = make_signal((4096,), dtype=np.float32)
    spec = si.stft(x, 512)
    short = si.istft(spec, length=1000)
    long = si.istft(spec, length=10000)
    assert short.shape == (1000,) and long.shape == (10000,)
    assert np.allclose(np.asarray(long[4096:]), 0)


def test_istft_rejects_magnitudes():
    mag = jnp.ones((257, 10), jnp.float32)
    with pytest.raises(TypeError, match="complex"):
        si.istft(mag)


def test_stft_complex_input_full_spectrum():
    """torch.stft rule: complex input => onesided defaults to False."""
    import torch

    x = make_signal((2048,), dtype=np.float64) + 1j * make_signal(
        (2048,), dtype=np.float64, seed=1
    )
    ours = np.asarray(si.stft(x, 256, hop_length=64))
    ref = torch_stft(x, 256, hop_length=64)
    assert ours.shape == ref.shape == (256, ref.shape[1])
    np.testing.assert_allclose(ours, ref, atol=1e-8)
    with pytest.raises(ValueError, match="onesided"):
        si.stft(x, 256, onesided=True)


def test_stft_accepts_torch_window_requires_grad():
    import torch

    x = make_signal((2048,), dtype=np.float32)
    win = torch.hann_window(512, requires_grad=True)
    out = si.stft(x, 512, window=win)
    ref = torch_stft(
        x.astype(np.float64), 512, window=win.detach().numpy().astype(np.float64)
    )
    np.testing.assert_allclose(np.asarray(out), ref, atol=1e-4)


def test_stft_odd_nfft_onesided_raises():
    x = make_signal((1024,), dtype=np.float32)
    with pytest.raises(ValueError, match="even n_fft"):
        si.stft(x, 511)


def test_gradients_flow():
    x = jnp.asarray(make_signal((2048,), dtype=np.float32))

    def loss(sig):
        s = si.stft(sig, 256)
        return jnp.mean(jnp.abs(s) ** 2)

    g = jax.grad(loss)(x)
    assert np.isfinite(np.asarray(g)).all() and float(jnp.abs(g).max()) > 0
