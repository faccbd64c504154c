"""Golden-parity tests for the STFT/ISTFT core against torch.stft and the
reference's _istft/_ola synthesis pipeline."""
import numpy as np
import jax.numpy as jnp
import pytest
import torch

from specinv_tpu.config import canonicalize
from specinv_tpu.ops import stft as stft_ops

from .helpers import requires_reference, make_signal, nfft_list, torch_stft


def _canon(num_bins, dtype=np.float64, **kw):
    cfg, window = canonicalize(num_bins, dtype, **kw)
    return cfg, jnp.asarray(window)


@pytest.mark.parametrize("nfft", nfft_list)
@pytest.mark.parametrize("center", [True, False])
@pytest.mark.parametrize("pad_mode", ["reflect", "constant", "replicate", "circular"])
def test_stft_matches_torch(nfft, center, pad_mode):
    if not center and pad_mode != "reflect":
        pytest.skip("pad_mode irrelevant without centering")
    x = make_signal((4410,))
    ref = torch_stft(x, nfft, center=center, pad_mode=pad_mode)
    cfg, window = _canon(ref.shape[0], center=center, pad_mode=pad_mode)
    ours = stft_ops.stft(jnp.asarray(x), cfg, window)
    np.testing.assert_allclose(np.swapaxes(np.asarray(ours), -1, -2), ref, atol=1e-8)


@pytest.mark.parametrize("hop", [None, 128])
@pytest.mark.parametrize("win_length,use_hann", [(None, False), (300, False), (300, True)])
@pytest.mark.parametrize("normalized", [False, True])
@pytest.mark.parametrize("onesided", [True, False])
def test_stft_kwarg_grid_matches_torch(hop, win_length, use_hann, normalized, onesided):
    x = make_signal((2, 4410))
    n_fft = 512
    window = (
        np.hanning(win_length + 1)[:-1].astype(np.float64) if use_hann else None
    )
    tw = torch.hann_window(win_length, dtype=torch.float64) if use_hann else None
    ref = torch_stft(
        x,
        n_fft,
        hop_length=hop,
        win_length=win_length,
        window=tw.numpy() if tw is not None else None,
        normalized=normalized,
        onesided=onesided,
    )
    cfg, w = _canon(
        ref.shape[1],
        hop_length=hop,
        win_length=win_length,
        window=tw,
        normalized=normalized,
        onesided=onesided,
    )
    ours = stft_ops.stft(jnp.asarray(x), cfg, w)
    np.testing.assert_allclose(np.swapaxes(np.asarray(ours), -1, -2), ref, atol=1e-8)


@pytest.mark.parametrize("nfft", nfft_list)
@pytest.mark.parametrize("center", [True, False])
@pytest.mark.parametrize("use_hann", [False, True])
@requires_reference
def test_istft_matches_reference(nfft, center, use_hann):
    """Golden parity with the reference's _istft (irfft + conv_transpose OLA +
    window^2 envelope divide), methods.py:114-150."""
    from torch_specinv.methods import _args_helper, _get_ola_weight, _istft

    x = make_signal((4410,))
    window = torch.hann_window(nfft, dtype=torch.float64) if use_hann else None
    spec = torch.stft(
        torch.from_numpy(x), nfft, window=window, center=center, return_complex=True
    )
    spec_b = spec.unsqueeze(0)
    n_fft_ref, processed = _args_helper(spec_b.abs(), window=window, center=center)
    ola_weight = _get_ola_weight(processed["window"])
    ref, _env = _istft(spec_b, n_fft_ref, ola_weight, **processed)
    ref = ref.squeeze(0).numpy()

    cfg, w = _canon(spec.shape[0], window=window, center=center)
    ours = np.asarray(
        stft_ops.istft(jnp.asarray(spec.numpy()).T, cfg, w)
    )
    # The reference divides by a possibly-zero envelope; compare where finite.
    finite = np.isfinite(ref)
    assert ours.shape == ref.shape
    np.testing.assert_allclose(ours[finite], ref[finite], atol=1e-8)


@pytest.mark.parametrize("nfft", [256, 512])
def test_stft_istft_roundtrip(nfft):
    """With a hann window and center padding, istft(stft(x)) ~= x (interior)."""
    x = make_signal((4410,))
    window = np.hanning(nfft + 1)[:-1]
    ref = torch_stft(x, nfft, window=window)
    cfg, w = _canon(ref.shape[0], window=window)
    spec = stft_ops.stft(jnp.asarray(x), cfg, window=w)
    y = np.asarray(stft_ops.istft(spec, cfg, w))
    n = min(len(x), len(y))
    np.testing.assert_allclose(y[: n], x[: n], atol=1e-6)


def test_matmul_backend_matches_fft():
    x = make_signal((3, 4410), dtype=np.float32)
    ref = torch_stft(x.astype(np.float64), 512)
    for onesided in (True, False):
        cfg, w = _canon(
            512 // 2 + 1 if onesided else 512, dtype=np.float32, onesided=onesided
        )
        a = stft_ops.stft(jnp.asarray(x), cfg, w, backend="fft")
        b = stft_ops.stft(jnp.asarray(x), cfg, w, backend="matmul")
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=2e-3)
        ya = stft_ops.istft(a, cfg, w, backend="fft")
        yb = stft_ops.istft(b, cfg, w, backend="matmul")
        np.testing.assert_allclose(np.asarray(ya), np.asarray(yb), atol=2e-3)


@requires_reference
def test_envelope_matches_reference_lazy_envelope():
    from torch_specinv.methods import _args_helper, _get_ola_weight, _ola

    nfft = 512
    window = torch.hann_window(nfft, dtype=torch.float64)
    x = make_signal((4410,))
    spec = torch.stft(
        torch.from_numpy(x), nfft, window=window, return_complex=True
    ).unsqueeze(0)
    n_fft_ref, processed = _args_helper(spec.abs(), window=window)
    w = processed["window"]
    frames = torch.fft.irfft(spec, n=nfft, dim=-2)
    _, env_ref = _ola(frames, nfft // 4, _get_ola_weight(w), padding=nfft // 2)

    cfg, wj = _canon(spec.shape[1], window=window)
    env = stft_ops.make_envelope(cfg, wj, spec.shape[-1])
    np.testing.assert_allclose(np.asarray(env), env_ref.numpy(), atol=1e-10)


@pytest.mark.parametrize("onesided", [True, False])
@pytest.mark.parametrize("normalized", [False, True])
def test_matmul4_backend_matches_fft(onesided, normalized):
    """The four-step XLA DFT backend (matmul4) matches jnp.fft on batched
    frames, both directions (it shares fft4's math with the fused kernels
    but runs as plain XLA for callers without a Pallas path)."""
    import jax

    from specinv_tpu.config import canonicalize
    from specinv_tpu.ops import fourier

    n_fft = 512
    cfg, _ = canonicalize(
        n_fft // 2 + 1 if onesided else n_fft, np.float32,
        onesided=onesided, normalized=normalized,
    )
    rng = np.random.default_rng(0)
    frames = jnp.asarray(rng.standard_normal((3, 7, n_fft)).astype(np.float32))
    ref = fourier.forward(frames, cfg, backend="fft")
    out = fourier.forward(
        frames, cfg, backend="matmul4", precision=jax.lax.Precision.HIGHEST
    )
    scale = float(jnp.abs(ref).max())
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref),
                               atol=5e-4 * scale)

    spec = ref
    ref_i = fourier.inverse(spec, cfg, backend="fft")
    out_i = fourier.inverse(
        spec, cfg, backend="matmul4", precision=jax.lax.Precision.HIGHEST
    )
    np.testing.assert_allclose(np.asarray(out_i), np.asarray(ref_i),
                               atol=5e-4 * float(jnp.abs(ref_i).max()) + 1e-6)


def test_matmul4_rejects_bad_nfft():
    from specinv_tpu.config import canonicalize
    from specinv_tpu.ops import fourier

    cfg, _ = canonicalize(251, np.float32)  # n_fft=500
    frames = jnp.zeros((2, 500), np.float32)
    with pytest.raises(ValueError, match="matmul4"):
        fourier.forward(frames, cfg, backend="matmul4")


def test_matmul4_rejects_float64():
    """Explicit matmul4 on f64 input must raise, not silently downcast to f32
    (auto already routes f64 to the fft path)."""
    from specinv_tpu.config import canonicalize
    from specinv_tpu.ops import fourier

    cfg, _ = canonicalize(257, np.float64)  # n_fft=512
    frames = jnp.zeros((2, 512), jnp.float64)
    with pytest.raises(ValueError, match="float64"):
        fourier.forward(frames, cfg, backend="matmul4")
    spec = jnp.zeros((2, 257), jnp.complex128)
    with pytest.raises(ValueError, match="float64"):
        fourier.inverse(spec, cfg, backend="matmul4")


def test_auto_backend_policy(monkeypatch):
    """The measured in-pipeline policy (GL marginal + RTISI serving A/Bs,
    benchmarks.md "DFT backend crossover"): fft owns tiny rows and
    n_fft>=4096, the direct matmul owns everything else on TPU; matmul4 is
    explicit-only (its relayouts lose in-pipeline everywhere)."""
    import jax
    from specinv_tpu.config import canonicalize
    from specinv_tpu.ops import fourier

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")

    def pick(n_fft, rows):
        cfg, _ = canonicalize(n_fft // 2 + 1, np.float32)
        return fourier.resolve_backend("auto", cfg, np.float32, rows=rows)

    assert pick(2048, 4) == "fft"          # single-stream RTISI refine
    assert pick(2048, 64) == "matmul"      # 16-stream RTISI refine
    assert pick(2048, 431) == "matmul"     # north-star GL XLA path
    assert pick(1024, 64) == "matmul"
    assert pick(1024, 512) == "matmul"
    assert pick(4096, 512) == "fft"        # 134 MB direct tables lose
    assert pick(4096, 4) == "fft"
    assert pick(2048, None) == "matmul"    # unknown rows: assume bulk work
    # non-four-step size: same rules (the policy is size/rows, not m%128)
    cfg, _ = canonicalize(251, np.float32)  # n_fft=500, not %128
    assert fourier.resolve_backend("auto", cfg, np.float32, rows=4) == "fft"
    assert fourier.resolve_backend("auto", cfg, np.float32, rows=64) == "matmul"
    # f64 always fft on device; CPU always fft
    cfg2, _ = canonicalize(1025, np.float64)
    assert fourier.resolve_backend("auto", cfg2, np.float64, rows=64) == "fft"
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert pick(4096, 512) == "fft"
