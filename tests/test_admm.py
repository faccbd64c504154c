"""ADMM: shape grid, kwarg/differentiability grid, golden parity vs reference."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from specinv_tpu import ADMM

from .helpers import requires_reference, make_signal, nfft_list, torch_stft


@pytest.mark.parametrize("x_sizes", [(4410,), (2, 4410), (1, 4410)])
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
@pytest.mark.parametrize("nfft", nfft_list)
def test_empty_args(x_sizes, dtype, nfft):
    x = make_signal(x_sizes, dtype=dtype)
    spec = np.abs(torch_stft(x, nfft)).astype(dtype)
    y = ADMM(spec, max_iter=4, verbose=False)
    assert y.ndim == len(x_sizes)
    if y.ndim > 1:
        assert y.shape[0] == x.shape[0]
        assert y.shape[1] <= x.shape[1]


@pytest.mark.parametrize(
    "win_length,use_hann", [(None, False), (300, True)]
)
@pytest.mark.parametrize("hop_length", [None, 128])
@pytest.mark.parametrize("center", [True, False])
@pytest.mark.parametrize("normalized", [False, True])
@pytest.mark.parametrize("onesided", [False, True])
@pytest.mark.parametrize("pad_mode", ["reflect", "constant"])
def test_stft_args(win_length, use_hann, hop_length, center, normalized, onesided, pad_mode):
    x = make_signal((4410,), dtype=np.float32)
    n_fft = 512
    window = torch.hann_window(win_length).numpy() if use_hann else None
    spec = np.abs(
        torch_stft(
            x, n_fft,
            hop_length=hop_length, win_length=win_length, window=window,
            center=center, pad_mode=pad_mode, normalized=normalized,
            onesided=onesided,
        )
    ).astype(np.float32)
    kwargs = dict(
        hop_length=hop_length, win_length=win_length, window=window,
        center=center, pad_mode=pad_mode, normalized=normalized,
        onesided=onesided,
    )

    def loss_fn(s):
        y = ADMM(s, max_iter=2, verbose=False, **kwargs)
        n = min(y.shape[0], x.shape[0])
        return jnp.mean((y[:n] - x[:n]) ** 2)

    g = jax.grad(loss_fn)(jnp.asarray(spec))
    assert g.shape == spec.shape
    assert not bool(jnp.all(g == 0))


@requires_reference
def test_waveform_parity_exact():
    from torch_specinv.methods import ADMM as ref_admm

    n_fft = 256
    x = make_signal((4410,))
    mag = np.abs(torch_stft(x, n_fft))
    ref_y = ref_admm(torch.from_numpy(mag), max_iter=8, verbose=False).numpy()
    ours_y = np.asarray(ADMM(mag, max_iter=8, verbose=False))
    np.testing.assert_allclose(ours_y, ref_y, atol=1e-8)


@pytest.mark.parametrize("rho", [0.1, 1.0])
@requires_reference
def test_golden_convergence_parity(rho):
    from torch_specinv.methods import ADMM as ref_admm
    from specinv_tpu import sc

    n_fft = 512
    x = make_signal((4410,))
    mag = np.abs(torch_stft(x, n_fft))
    ref_y = ref_admm(torch.from_numpy(mag), max_iter=50, rho=rho, verbose=False).numpy()
    ours_y = np.asarray(ADMM(mag, max_iter=50, rho=rho, verbose=False))
    ref_mag = np.abs(torch_stft(ref_y, n_fft))
    ours_mag = np.abs(torch_stft(ours_y, n_fft))
    ref_sc = float(sc(jnp.asarray(ref_mag), jnp.asarray(mag)))
    ours_sc = float(sc(jnp.asarray(ours_mag), jnp.asarray(mag)))
    assert abs(ours_sc - ref_sc) < 1e-3, (ours_sc, ref_sc)


def test_complex_input():
    n_fft = 256
    x = make_signal((4410,))
    spec = torch_stft(x, n_fft)
    y = ADMM(spec, max_iter=4, verbose=False)
    assert y.ndim == 1
