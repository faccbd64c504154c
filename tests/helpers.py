"""Shared test helpers: torch<->jax bridging for golden-parity tests."""
import numpy as np
import pytest
import torch

try:  # the reference repo is mounted locally; absent on CI runners
    import torch_specinv  # noqa: F401

    HAS_REFERENCE = True
except ImportError:
    HAS_REFERENCE = False

requires_reference = pytest.mark.skipif(
    not HAS_REFERENCE, reason="torch_specinv reference not available"
)

nfft_list = [128, 256, 512]


def t2n(t):
    return t.detach().cpu().numpy()


def make_signal(shape, dtype=np.float64, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal(shape).astype(dtype)


def torch_stft(x_np, n_fft, **kwargs):
    kwargs.setdefault("return_complex", True)
    if "window" in kwargs and kwargs["window"] is not None and isinstance(
        kwargs["window"], np.ndarray
    ):
        kwargs["window"] = torch.from_numpy(kwargs["window"])
    return t2n(torch.stft(torch.from_numpy(x_np), n_fft, **kwargs))
