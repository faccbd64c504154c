"""Fused Pallas Griffin-Lim kernel: interpret-mode parity with the XLA path.

On CPU these run the kernel through the Pallas interpreter (exact semantics,
no Mosaic); the TPU-compiled kernel is additionally checked elementwise
against interpret mode in the benchmark/verification flow.
"""
import numpy as np
import jax.numpy as jnp
import pytest

from specinv_tpu import ADMM, griffin_lim, sc
from specinv_tpu.config import canonicalize
from specinv_tpu.ops.pallas import gl_fused

from .helpers import make_signal, torch_stft


def _mag(x, n_fft, hop, **kw):
    return np.abs(torch_stft(x, n_fft, hop_length=hop, **kw)).astype(np.float32)


@pytest.mark.parametrize("backend", ["pallas", "pallas4"])
@pytest.mark.parametrize("pad_mode", ["reflect", "constant", "replicate", "circular"])
def test_parity_pad_modes(pad_mode, backend):
    x = make_signal((22050,), dtype=np.float32)
    spec = _mag(x, 512, 128, pad_mode=pad_mode)
    kw = dict(hop_length=128, pad_mode=pad_mode, max_iter=6, tol=0.0, verbose=False)
    a = np.asarray(griffin_lim(spec, backend="fft", **kw))
    b = np.asarray(griffin_lim(spec, backend=backend, **kw))
    assert a.shape == b.shape
    np.testing.assert_allclose(b, a, atol=5e-3 * np.abs(a).max())


@pytest.mark.parametrize("backend", ["pallas", "pallas4"])
def test_parity_batched(backend):
    x = make_signal((3, 22050), dtype=np.float32)
    spec = _mag(x, 512, 128)
    kw = dict(hop_length=128, max_iter=5, tol=0.0, verbose=False)
    a = np.asarray(griffin_lim(spec, backend="fft", **kw))
    b = np.asarray(griffin_lim(spec, backend=backend, **kw))
    np.testing.assert_allclose(b, a, atol=5e-3 * np.abs(a).max())


@pytest.mark.parametrize("backend", ["pallas", "pallas4"])
def test_parity_center_false(backend):
    x = make_signal((22050,), dtype=np.float32)
    spec = _mag(x, 512, 128, center=False)
    kw = dict(hop_length=128, center=False, max_iter=5, tol=0.0, verbose=False)
    a = np.asarray(griffin_lim(spec, backend="fft", **kw))
    b = np.asarray(griffin_lim(spec, backend=backend, **kw))
    np.testing.assert_allclose(b, a, atol=5e-3 * np.abs(a).max())


@pytest.mark.parametrize("backend", ["pallas", "pallas4"])
def test_parity_early_stop(backend):
    x = make_signal((22050,), dtype=np.float32)
    spec = _mag(x, 512, 128)
    kw = dict(hop_length=128, max_iter=40, tol=1.0, eva_iter=5, verbose=False)
    a = np.asarray(griffin_lim(spec, backend="fft", **kw))
    b = np.asarray(griffin_lim(spec, backend=backend, **kw))
    np.testing.assert_allclose(b, a, atol=5e-3 * np.abs(a).max())


@pytest.mark.parametrize("algo", ["gl", "admm"])
def test_stats_eval_path_matches_mag_plane(algo, monkeypatch):
    """The lane engine's scalar eval-stats path (with_loss — stop loss +
    metric from two kernel-reduced sums) must produce the same waveform as
    the magnitude-plane path, INCLUDING the early-stop decision (tol=1.0
    trips the stop at the first improving eval)."""
    from specinv_tpu import ADMM

    fn = ADMM if algo == "admm" else griffin_lim
    x = make_signal((22050,), dtype=np.float32)
    spec = _mag(x, 512, 128)
    kw = dict(hop_length=128, max_iter=40, tol=1.0, eva_iter=5,
              verbose=False, backend="pallas4")
    a = np.asarray(fn(spec, **kw))
    monkeypatch.setenv("SPECINV_FULLRUN_STATS", "0")
    b = np.asarray(fn(spec, **kw))
    np.testing.assert_allclose(b, a, atol=0)


def test_stats_eval_sums_match_xla_reductions():
    """Kernel-emitted eval sums equal the XLA path's onesided-trimmed
    reductions (up to f32 summation order), and the stats-derived metrics
    equal metrics.sc/snr/ser on the magnitude plane."""
    from specinv_tpu import metrics
    from specinv_tpu.models._pallas_driver import make_geometry4, make_inv_env
    from specinv_tpu.ops import stft as stft_ops
    from specinv_tpu.ops.pallas import fft4
    from specinv_tpu.ops.pallas.gl_fullrun4 import (
        fused_gl_run, hermitian_loss_weight,
    )
    from specinv_tpu.utils.runner import stats_eval_fns

    rng = np.random.default_rng(1)
    n_fft = 512
    win = np.hanning(n_fft + 1)[:-1].astype(np.float32)
    cfg, w = canonicalize(n_fft // 2 + 1, np.float32, window=win)
    wj = jnp.asarray(w)
    clips = rng.standard_normal((2, 8000)).astype(np.float32)
    mag_tm = jnp.abs(stft_ops.stft(jnp.asarray(clips), cfg, wj)).astype(
        jnp.float32
    )
    B, T, F = mag_tm.shape
    geo = make_geometry4(cfg, T, block_t=None)
    inv_env = make_inv_env(cfg, wj, T, geo).astype(jnp.float32)
    tgt_p = fft4.to_permuted(
        jnp.pad(fft4.extend_hermitian_mag(mag_tm, n_fft),
                ((0, 0), (0, geo.t_pad - T), (0, 0))), n_fft)
    x0 = jnp.asarray(rng.standard_normal((B, geo.lx)).astype(np.float32) * 0.1)
    lr = jnp.float32(0.5)
    common = dict(n_iters=5, block_t=geo.block_t, emit_state=True,
                  interpret=True)

    *_, stats = fused_gl_run(
        x0, tgt_p, tgt_p * 0.25, tgt_p, wj, inv_env, lr, cfg, geo.e,
        with_loss=True, w_loss=hermitian_loss_weight(cfg), valid_t=T,
        **common)
    s = jnp.sum(stats[:, :2, 0], axis=0)
    *_, mag_p = fused_gl_run(
        x0, tgt_p, tgt_p * 0.25, tgt_p, wj, inv_env, lr, cfg, geo.e,
        with_mag=True, **common)
    mag = fft4.from_permuted(mag_p, n_fft)[:, :T, :F]

    np.testing.assert_allclose(
        float(s[0]), float(jnp.sum((mag - mag_tm) ** 2)), rtol=1e-5)
    np.testing.assert_allclose(
        float(s[1]), float(jnp.sum(mag**2)), rtol=1e-5)
    for m in ("sc", "snr", "ser"):
        loss_fn, metric_fn = stats_eval_fns(m, mag_tm, None)
        np.testing.assert_allclose(
            float(metric_fn(s, None)),
            float(getattr(metrics, m)(mag, mag_tm)), atol=1e-4)
        np.testing.assert_allclose(
            float(loss_fn(s, None)),
            float(jnp.mean((mag - mag_tm) ** 2)), rtol=1e-5)


@pytest.mark.parametrize("algo", ["gl", "admm"])
def test_pallas4_while_mode_early_exit(algo):
    """mode='while' on the segmented pallas4 path actually exits at the stop
    boundary — result matches the done-masked fori mode exactly (the mask
    freezes at the same segment the while loop exits at)."""
    from specinv_tpu import ADMM

    fn = ADMM if algo == "admm" else griffin_lim
    x = make_signal((22050,), dtype=np.float32)
    spec = _mag(x, 512, 128)
    kw = dict(hop_length=128, max_iter=43, tol=1.0, eva_iter=5, verbose=False,
              backend="pallas4")
    a = np.asarray(fn(spec, mode="fori", **kw))
    b = np.asarray(fn(spec, mode="while", **kw))
    np.testing.assert_allclose(b, a, atol=0)


def test_parity_twosided_pallas4():
    """onesided=False runs natively in the four-step kernel (full-spectrum
    iteration) — the direct-DFT kernel cannot do this at all."""
    x = make_signal((22050,), dtype=np.float32)
    spec = _mag(x, 512, 128, onesided=False)
    kw = dict(hop_length=128, onesided=False, max_iter=5, tol=0.0, verbose=False)
    a = np.asarray(griffin_lim(spec, backend="fft", **kw))
    b = np.asarray(griffin_lim(spec, backend="pallas4", **kw))
    np.testing.assert_allclose(b, a, atol=5e-3 * np.abs(a).max())


def test_parity_normalized_pallas4():
    x = make_signal((22050,), dtype=np.float32)
    spec = _mag(x, 512, 128, normalized=True)
    kw = dict(hop_length=128, normalized=True, max_iter=5, tol=0.0, verbose=False)
    a = np.asarray(griffin_lim(spec, backend="fft", **kw))
    b = np.asarray(griffin_lim(spec, backend="pallas4", **kw))
    np.testing.assert_allclose(b, a, atol=5e-3 * np.abs(a).max())


def test_fft4_transform_unit():
    """Four-step forward/inverse vs jnp.fft, permuted-layout round trip."""
    import jax

    from specinv_tpu.ops.pallas import fft4

    rng = np.random.default_rng(0)
    for n_fft in (512, 2048):
        fr = rng.standard_normal((5, n_fft)).astype(np.float32)
        t = fft4.tables_as_jnp(n_fft, False)
        s_re, s_im = fft4.fwd4(jnp.asarray(fr), t, jax.lax.Precision.HIGHEST)
        S = fft4.from_permuted(s_re + 1j * s_im, n_fft)
        ref = np.fft.fft(fr, axis=-1)
        scale = np.abs(ref).max()
        np.testing.assert_allclose(np.asarray(S), ref, atol=3e-4 * scale)
        back = fft4.inv4_real(s_re, s_im, t, jax.lax.Precision.HIGHEST)
        np.testing.assert_allclose(np.asarray(back), fr, atol=1e-5 * scale)


def test_fft4_mstage_radix_vs_naive():
    """The radix-2 literal m-point stage matches the naive literal sums
    (both directions, every power-of-two m the kernels can see) and both
    match jnp.fft at f32 tolerance."""
    import jax

    from specinv_tpu.ops.pallas import fft4

    rng = np.random.default_rng(7)
    saved = fft4._MSTAGE
    try:
        for n_fft in (128, 512, 1024, 2048, 4096):  # m = 1, 4, 8, 16, 32
            fr = rng.standard_normal((3, n_fft)).astype(np.float32)
            spec = (
                rng.standard_normal((3, n_fft))
                + 1j * rng.standard_normal((3, n_fft))
            ).astype(np.complex64)
            t = fft4.tables_as_jnp(n_fft, False)
            p = fft4.to_permuted(jnp.asarray(spec), n_fft)
            outs = {}
            for mode in ("radix", "naive"):
                fft4._MSTAGE = mode
                s_re, s_im = fft4.fwd4(
                    jnp.asarray(fr), t, jax.lax.Precision.HIGHEST
                )
                back = fft4.inv4_real(
                    jnp.real(p), jnp.imag(p), t, jax.lax.Precision.HIGHEST
                )
                outs[mode] = (np.asarray(s_re + 1j * s_im), np.asarray(back))
            ref = np.fft.fft(fr, axis=-1)
            scale = np.abs(ref).max()
            got = fft4.from_permuted(jnp.asarray(outs["radix"][0]), n_fft)
            np.testing.assert_allclose(np.asarray(got), ref, atol=3e-4 * scale)
            iref = np.fft.ifft(spec, axis=-1).real
            np.testing.assert_allclose(
                outs["radix"][1], iref, atol=1e-5 * np.abs(spec).max()
            )
            # mode-vs-mode: identical math, different summation order only
            np.testing.assert_allclose(
                outs["radix"][0], outs["naive"][0], atol=2e-4 * scale
            )
            np.testing.assert_allclose(
                outs["radix"][1], outs["naive"][1],
                atol=1e-5 * np.abs(spec).max(),
            )
    finally:
        fft4._MSTAGE = saved


def test_unsupported_config_raises():
    x = make_signal((8000,), dtype=np.float32)
    spec = _mag(x, 500, 100)  # n_fft not divisible by 128
    with pytest.raises(ValueError):
        griffin_lim(spec, backend="pallas", max_iter=2, verbose=False)


def test_supports_predicate():
    cfg, w = canonicalize(257, np.float32)  # n_fft 512, hop 128
    assert gl_fused.supports(cfg, jnp.asarray(w))
    cfg2, w2 = canonicalize(251, np.float32)  # n_fft 500
    assert not gl_fused.supports(cfg2, jnp.asarray(w2))


@pytest.mark.parametrize("algo", ["gl", "admm"])
@pytest.mark.parametrize("early", [False, True])
@pytest.mark.parametrize("pad_mode", ["reflect", "constant"])
def test_lane_pipe_bitwise(algo, early, pad_mode, monkeypatch):
    """The cross-block software pipeline (fullrun_lane._kernel: in-kernel
    fori over t, fwd(t) + back-half(t-1) per step, inline-envelope OLA)
    is pure schedule restructuring: waveforms must match the serial path
    at atol=0, including through the early-stop/eval path (stop decision
    at a non-borderline tol must not move).  The pipeline ships OFF (a
    measured hardware regression — _pipe_ok docstring); this pins the
    preserved A/B valve."""
    from specinv_tpu.ops.pallas import fullrun_lane

    x = make_signal((22050,), dtype=np.float32)
    spec = _mag(x, 512, 128, pad_mode=pad_mode)
    fn = ADMM if algo == "admm" else griffin_lim
    kw = dict(hop_length=128, max_iter=8, verbose=False, backend="pallas4",
              pad_mode=pad_mode)
    kw.update(dict(tol=1.0, eva_iter=4) if early else dict(tol=0.0))
    monkeypatch.setattr(fullrun_lane, "_pipe_ok", lambda: True)
    a = np.asarray(fn(spec, **kw))
    monkeypatch.setattr(fullrun_lane, "_pipe_ok", lambda: False)
    # pack=1 == the auto policy at B=1 but busts the jit cache, so the
    # serial schedule actually re-traces
    b = np.asarray(fn(spec, pack=1, **kw))
    np.testing.assert_allclose(b, a, atol=0)


@pytest.mark.parametrize("algo", ["gl", "admm"])
@pytest.mark.parametrize("pad_mode", ["reflect", "circular"])
@pytest.mark.parametrize("n_samp", [22050, 22050 + 77])
def test_lane_fast_repad_bitwise_vs_flat(algo, pad_mode, n_samp, monkeypatch):
    """The hop-row-layout fast repad (roll + banded 0/1 dots) is bitwise
    identical to the flat-strip fallback — both are exact copies, so the
    whole-run waveform must match at atol=0.  The odd clip length varies
    the right edge's lane offset (e % hop) to exercise the banded row
    split; the plan must actually be active for the default geometry."""
    from specinv_tpu.ops.pallas import fullrun_lane

    from specinv_tpu.models._pallas_driver import make_geometry4

    x = make_signal((n_samp,), dtype=np.float32)
    spec = _mag(x, 512, 128, pad_mode=pad_mode)
    fn = ADMM if algo == "admm" else griffin_lim
    kw = dict(hop_length=128, pad_mode=pad_mode, max_iter=4, tol=0.0,
              verbose=False, backend="pallas4")
    # the fast plan must actually be active for this geometry
    cfg, _ = canonicalize(257, np.float32, hop_length=128, pad_mode=pad_mode)
    geo = make_geometry4(cfg, spec.shape[1], block_t=None)
    K = cfg.n_fft // cfg.hop_length
    rows_c = geo.t_pad + fullrun_lane.ext_rows(K)
    assert fullrun_lane._fast_repad_plan(
        cfg.jnp_pad_mode, cfg.pad_amount, geo.e, cfg.hop_length, rows_c
    ) is not None
    a = np.asarray(fn(spec, eva_iter=23, **kw))
    monkeypatch.setattr(fullrun_lane, "_fast_repad_plan",
                        lambda *args, **k: None)
    # eva_iter is unused at tol=0 but static — busts the jit cache so the
    # flat-fallback layout actually re-traces
    b = np.asarray(fn(spec, eva_iter=24, **kw))
    np.testing.assert_allclose(b, a, atol=0)


@pytest.mark.parametrize("backend", ["pallas", "pallas4"])
@pytest.mark.parametrize("rho", [0.1, 1.0])
def test_admm_parity(rho, backend):
    from specinv_tpu import ADMM

    x = make_signal((22050,), dtype=np.float32)
    spec = _mag(x, 512, 128)
    kw = dict(hop_length=128, max_iter=6, tol=0.0, rho=rho, verbose=False)
    a = np.asarray(ADMM(spec, backend="fft", **kw))
    b = np.asarray(ADMM(spec, backend=backend, **kw))
    np.testing.assert_allclose(b, a, atol=5e-3 * np.abs(a).max())


def test_admm_pallas4_early_stop_path():
    """tol>0 exercises the per-iteration four-step ADMM kernel + the eval/
    stop machinery (tol tiny enough that no boundary-sensitive stop fires —
    a near-threshold tol can legitimately stop different backends at
    different evals under bf16x3 rounding)."""
    from specinv_tpu import ADMM

    x = make_signal((22050,), dtype=np.float32)
    spec = _mag(x, 512, 128)
    kw = dict(hop_length=128, max_iter=6, tol=1e-30, eva_iter=3, verbose=False)
    a = np.asarray(ADMM(spec, backend="fft", **kw))
    b = np.asarray(ADMM(spec, backend="pallas4", **kw))
    np.testing.assert_allclose(b, a, atol=5e-3 * np.abs(a).max())


def test_admm_batched_parity():
    from specinv_tpu import ADMM

    x = make_signal((2, 22050), dtype=np.float32)
    spec = _mag(x, 512, 128)
    kw = dict(hop_length=128, max_iter=4, tol=0.0, verbose=False)
    a = np.asarray(ADMM(spec, backend="fft", **kw))
    b = np.asarray(ADMM(spec, backend="pallas", **kw))
    np.testing.assert_allclose(b, a, atol=5e-3 * np.abs(a).max())


@pytest.mark.parametrize("which", ["gl", "gl4", "admm", "admm4"])
def test_gradients_match_xla_path(which):
    """backend='pallas' is differentiable: custom_vjp routes the backward
    through the XLA twin of the kernel math."""
    import jax

    from specinv_tpu import ADMM

    x = make_signal((22050,), dtype=np.float32)
    spec = _mag(x, 512, 128)
    fn = ADMM if which.startswith("admm") else griffin_lim
    backend = "pallas4" if which.endswith("4") else "pallas"
    kw = dict(hop_length=128, max_iter=3, tol=0.0, verbose=False)

    def loss(s, backend):
        y = fn(s, backend=backend, **kw)
        n = min(y.shape[0], len(x))
        return jnp.mean((y[:n] - x[:n]) ** 2)

    g_ref = np.asarray(jax.grad(lambda s: loss(s, "fft"))(jnp.asarray(spec)))
    g_pal = np.asarray(jax.grad(lambda s: loss(s, backend))(jnp.asarray(spec)))
    assert np.isfinite(g_pal).all()
    rel = np.abs(g_ref - g_pal).max() / (np.abs(g_ref).max() + 1e-12)
    assert rel < 5e-2, rel


@pytest.mark.parametrize("algo", ["gl", "admm"])
def test_fullrun_t_blocked_streaming_parity(algo, monkeypatch):
    """Long clips exceed the whole-run kernel's resident-plane VMEM plan (a
    20 s clip at n_fft=2048 OOM'd the compiler) and switch to t-blocked
    plane streaming.  Forcing the streamed layout on a small config must
    reproduce the resident layout exactly — the state scratch is identical,
    only the I/O windows change."""
    from specinv_tpu.config import canonicalize
    from specinv_tpu.models._pallas_driver import resolve_block_t
    from specinv_tpu.ops.pallas import gl_fullrun4

    x = make_signal((22050,), dtype=np.float32)
    spec = _mag(x, 512, 128)
    fn = griffin_lim if algo == "gl" else ADMM
    kw = dict(hop_length=128, max_iter=5, tol=0.0, verbose=False)
    a = np.asarray(fn(spec, backend="pallas4", eva_iter=10, **kw))

    cfg, _ = canonicalize(spec.shape[0], np.float32, hop_length=128)
    T = spec.shape[1]
    bt = resolve_block_t(T, cfg.n_fft, None)
    t_pad = -(-T // bt) * bt
    lx = (t_pad - 1) * cfg.hop_length + cfg.n_fft
    est_res = gl_fullrun4.plane_vmem_bytes(
        t_pad, bt, cfg.n_fft, lx, True, False, False
    )
    est_blk = gl_fullrun4.plane_vmem_bytes(
        t_pad, bt, cfg.n_fft, lx, True, False, True
    )
    assert est_blk < est_res
    monkeypatch.setattr(gl_fullrun4, "VMEM_BUDGET", (est_blk + est_res) // 2)
    # eva_iter is unused at tol=0 but static — busts the jit cache so the
    # streamed layout actually re-traces
    b = np.asarray(fn(spec, backend="pallas4", eva_iter=11, **kw))
    np.testing.assert_allclose(b, a, atol=0)

    # past the hard ceiling (not just the conservative budget — the band
    # between them is now attempted optimistically) the launch refuses
    monkeypatch.setattr(gl_fullrun4, "VMEM_BUDGET", est_blk - 1)
    monkeypatch.setattr(gl_fullrun4, "VMEM_CEILING", est_blk - 1)
    with pytest.raises(ValueError, match="too long"):
        fn(spec, backend="pallas4", eva_iter=12, **kw)


def test_fullrun_fits_predicate():
    """The dispatcher's VMEM gate: 10 s and 20 s clips at n_fft=2048 fit the
    whole-run kernels (resident or streamed), ~100 s clips do not (verified
    on-chip: auto demotes to the per-iteration kernel and still converges)."""
    from specinv_tpu.config import canonicalize
    from specinv_tpu.ops.pallas import gl_fullrun4

    cfg, _ = canonicalize(1025, np.float32)  # n_fft 2048, hop 512
    assert gl_fullrun4.fits(cfg, 431)    # 10 s north star
    assert gl_fullrun4.fits(cfg, 862)    # 20 s (streamed layout)
    assert not gl_fullrun4.fits(cfg, 4306)  # ~100 s


def test_auto_block_t_policy():
    """32 is chosen exactly when its padding saving beats the measured
    per-row penalty (none at n_fft<=512, ~10-15% at >=1024); long clips with
    sub-threshold savings must keep 64 (code-review finding: the first rule
    shipped 32 for T=862 over a 3.7% saving)."""
    from specinv_tpu.models._pallas_driver import auto_block_t

    assert auto_block_t(345, 512) == 32     # 352 vs 384: any saving at 512
    assert auto_block_t(87, 2048) == 32     # 96 vs 128: 25% saving
    assert auto_block_t(431, 2048) == 64    # north star: tie -> 64
    assert auto_block_t(862, 2048) == 64    # 864 vs 896: saving below penalty
    assert auto_block_t(173, 1024) == 64    # tie -> 64
    assert auto_block_t(44, 4096) == 64     # tie -> 64


def test_highest_precision_strict_parity():
    """With precision=HIGHEST the kernel matches the full-f32 XLA path
    tightly (the default HIGH/bf16x3 trades ~1e-4 rel divergence for 1.5x)."""
    import importlib

    import jax

    gl_mod = importlib.import_module("specinv_tpu.models.griffin_lim")

    x = make_signal((22050,), dtype=np.float32)
    spec = _mag(x, 512, 128)
    cfg, w = canonicalize(spec.shape[0], np.float32, hop_length=128)
    wj = jnp.asarray(w)
    tm = jnp.swapaxes(jnp.asarray(spec), -1, -2)[None]
    init = tm.astype(jnp.complex64)
    args = (tm, init, wj, jnp.float32(0.99 / 1.99), jnp.float32(0.0), cfg)
    a = np.asarray(gl_mod.run_tm(*args, max_iter=6, backend="fft"))
    b = np.asarray(
        gl_mod.run_tm_pallas(
            *args, max_iter=6, interpret=True,
            precision=jax.lax.Precision.HIGHEST,
        )
    )
    np.testing.assert_allclose(b, a, atol=5e-5 * np.abs(a).max())


@pytest.mark.parametrize("algo", ["gl", "admm"])
@pytest.mark.parametrize("backend", ["pallas", "pallas4"])
@pytest.mark.parametrize("tol", [0.0, 1e-30])
def test_highest_precision_strict_parity_all_kernels(algo, backend, tol):
    """Strict full-f32 parity for every fused kernel family and both loop
    shapes: tol=0 takes the whole-run kernel on pallas4 (single launch),
    tol=1e-30 the per-iteration kernel + eval machinery.

    ADMM gets a 10x wider band than GL: its dual update integrates
    representation-level rounding (real-pair vs complex hypot/division), so
    even the two pure-XLA backends drift 3e-5 apart after 6 iterations where
    GL's drift 4e-6 (measured); the kernel sits within that same
    amplification factor.
    """
    import jax

    from specinv_tpu import ADMM

    x = make_signal((22050,), dtype=np.float32)
    spec = _mag(x, 512, 128)
    fn = ADMM if algo == "admm" else griffin_lim
    tol_scale = 5e-4 if algo == "admm" else 5e-5
    kw = dict(hop_length=128, max_iter=6, tol=tol, eva_iter=3, verbose=False)
    a = np.asarray(fn(spec, backend="fft", **kw))
    b = np.asarray(
        fn(spec, backend=backend, precision=jax.lax.Precision.HIGHEST, **kw)
    )
    np.testing.assert_allclose(b, a, atol=tol_scale * np.abs(a).max())


def test_segmented_verbose_reports(monkeypatch):
    """verbose=True (the public default) on the segmented pallas4 path fires
    the per-eval progress callback."""
    import jax

    from specinv_tpu.utils import runner

    msgs = []
    monkeypatch.setattr(
        runner._Progress, "update",
        lambda self, i, m, l: msgs.append(int(i)),
    )
    x = make_signal((22050,), dtype=np.float32)
    spec = _mag(x, 512, 128)
    y = griffin_lim(
        spec, hop_length=128, max_iter=10, tol=1e-30, eva_iter=5,
        verbose=True, backend="pallas4",
    )
    np.asarray(y)
    jax.effects_barrier()
    # evals at global iterations 4 and 9 (i % eva_iter == eva_iter - 1)
    assert sorted(msgs) == [4, 9], msgs


def test_quality_converges():
    x = make_signal((22050,), dtype=np.float32)
    spec = _mag(x, 512, 128)
    y = np.asarray(
        griffin_lim(spec, backend="pallas", hop_length=128, max_iter=60, tol=0.0, verbose=False)
    )
    recon = _mag(y, 512, 128)
    got = float(sc(jnp.asarray(recon), jnp.asarray(spec)))
    assert got < -13, got


def test_vmem_demotion_and_deny_cache():
    """A VMEM fit-model lie (compile-time Mosaic OOM despite fits()==True)
    must demote the auto-selected backend, warn, and cache the rejection
    (round-2 verdict weak #6)."""
    from specinv_tpu.config import canonicalize
    from specinv_tpu.models.common import run_with_vmem_demotion
    from specinv_tpu.ops.pallas import gl_fullrun4

    cfg, _ = canonicalize(257, np.float32)  # n_fft=512, hop=128
    T = 977
    assert gl_fullrun4.fits(cfg, T)

    calls = []

    def launch(bk):
        calls.append(bk)
        if bk == "pallas4":
            raise RuntimeError(
                "Mosaic failed to compile: scoped vmem limit exceeded "
                "(requested 130.2MiB)"
            )
        return "ok"

    try:
        with pytest.warns(UserWarning, match="demoting"):
            out = run_with_vmem_demotion(launch, "pallas4", "pallas", cfg, T)
        assert out == "ok"
        assert calls == ["pallas4", "pallas"]
        # the deny cache now rejects the shape without re-compiling
        assert not gl_fullrun4.fits(cfg, T)

        # non-VMEM errors propagate untouched
        def broken(bk):
            raise RuntimeError("unrelated kaboom")

        with pytest.raises(RuntimeError, match="kaboom"):
            run_with_vmem_demotion(broken, "pallas4", "pallas", cfg, T)

        # an EXPLICIT pallas4 request (no fallback) still surfaces the OOM
        with pytest.raises(RuntimeError, match="vmem"):
            run_with_vmem_demotion(launch, "pallas4", None, cfg, T)
    finally:
        gl_fullrun4._fit_deny.clear()


def test_fits_optimistic_band_exists():
    """fits() is stricter with optimistic=False: there are clip lengths the
    conservative budget rejects that the probe-backed band attempts."""
    from specinv_tpu.config import canonicalize
    from specinv_tpu.ops.pallas import gl_fullrun4

    cfg, _ = canonicalize(1025, np.float32)  # n_fft=2048, hop=512
    band = [
        T for T in range(64, 4096, 64)
        if gl_fullrun4.fits(cfg, T, optimistic=True)
        and not gl_fullrun4.fits(cfg, T, optimistic=False)
    ]
    assert band, "no clip length falls in the optimistic VMEM band"
    # monotone: anything the conservative budget accepts, the band accepts
    for T in range(64, 4096, 256):
        if gl_fullrun4.fits(cfg, T, optimistic=False):
            assert gl_fullrun4.fits(cfg, T, optimistic=True)


@pytest.mark.parametrize("tol,max_iter,eva_iter", [(0.0, 5, 10), (1e-9, 7, 3)])
def test_fullrun_clip_packing_parity(monkeypatch, tol, max_iter, eva_iter):
    """Clip packing (gl_fullrun4 pack>1) folds short clips into each grid
    step; every op is row-independent so the result must be BITWISE equal to
    pack=1 — single-launch (tol=0) and segmented+tail (tol>0) paths both."""
    from specinv_tpu.ops.pallas import gl_fullrun4

    x = make_signal((4, 8820), dtype=np.float32)
    spec = _mag(x, 512, 128)
    kw = dict(
        hop_length=128, max_iter=max_iter, eva_iter=eva_iter, tol=tol,
        verbose=False, backend="pallas4",
    )

    monkeypatch.setattr(gl_fullrun4, "choose_pack", lambda *a, **k: 1)
    base = np.asarray(griffin_lim(spec, **kw))
    for pack in (2, 4):
        monkeypatch.setattr(
            gl_fullrun4, "choose_pack", lambda *a, _p=pack, **k: _p
        )
        out = np.asarray(griffin_lim(spec, mode="while", **kw))
        np.testing.assert_allclose(out, base, atol=0)


def test_choose_pack_policy(monkeypatch):
    """choose_pack: divisor of B, 1 for single clips, larger for short clips
    at small n_fft, mstage-dependent at m=16 (radix measured pack=4 +14%,
    naive measured neutral — benchmarks.md), 1 at m=32 (measured -5% even
    with radix), and bounded by the resident VMEM budget."""
    from specinv_tpu.config import canonicalize
    from specinv_tpu.ops.pallas import fft4, gl_fullrun4

    cfg1k, _ = canonicalize(513, np.float32)  # n_fft=1024, hop=256
    assert gl_fullrun4.choose_pack(cfg1k, 173, 1) == 1
    k16 = gl_fullrun4.choose_pack(cfg1k, 173, 16)  # 2 s clips, bench config
    assert k16 > 1 and 16 % k16 == 0
    # m=16: packs to the measured 2048-row optimum with the radix m-stage,
    # stays unpacked under the naive stage (VPU-bound there)
    cfg2k, _ = canonicalize(1025, np.float32)  # n_fft=2048
    monkeypatch.setattr(fft4, "_MSTAGE", "radix")
    assert gl_fullrun4.choose_pack(cfg2k, 87, 16) == 4
    monkeypatch.setattr(fft4, "_MSTAGE", "naive")
    assert gl_fullrun4.choose_pack(cfg2k, 87, 16) == 1
    monkeypatch.setattr(fft4, "_MSTAGE", "radix")
    # m=32: never packs
    cfg4k, _ = canonicalize(2049, np.float32)  # n_fft=4096
    assert gl_fullrun4.choose_pack(cfg4k, 44, 16) == 1
    # never exceeds the resident budget
    from specinv_tpu.models._pallas_driver import resolve_block_t

    for T, B in ((87, 16), (256, 8), (64, 64)):
        k = gl_fullrun4.choose_pack(cfg1k, T, B)
        bt = resolve_block_t(T, cfg1k.n_fft, None)
        t_pad = -(-T // bt) * bt
        lx = (t_pad - 1) * cfg1k.hop_length + cfg1k.n_fft
        assert gl_fullrun4.plane_vmem_bytes(
            k * t_pad, k * bt, cfg1k.n_fft, k * lx, True, True, False
        ) <= gl_fullrun4.VMEM_BUDGET


@pytest.mark.parametrize("tol,max_iter,eva_iter", [(0.0, 5, 10), (1e-9, 7, 3)])
def test_admm_fullrun_clip_packing_parity(tol, max_iter, eva_iter):
    """ADMM whole-run clip packing: bitwise equal to pack=1, including the
    valid_t padded-row masking (rows beyond T must stay inert per clip)."""
    x = make_signal((4, 8820), dtype=np.float32)
    spec = _mag(x, 512, 128)
    kw = dict(
        hop_length=128, max_iter=max_iter, eva_iter=eva_iter, tol=tol,
        verbose=False, backend="pallas4",
    )
    base = np.asarray(ADMM(spec, pack=1, **kw))
    for pack in (2, 4):
        out = np.asarray(ADMM(spec, pack=pack, **kw))
        np.testing.assert_allclose(out, base, atol=0)


def test_pack_must_divide_batch():
    x = make_signal((3, 8820), dtype=np.float32)
    spec = _mag(x, 512, 128)
    with pytest.raises(ValueError, match="divide the batch"):
        griffin_lim(spec, hop_length=128, max_iter=2, tol=0.0, verbose=False,
                    backend="pallas4", pack=2)


def test_pack_rejected_off_pallas4():
    """pack is a whole-run-kernel launch knob; resolving to any other
    backend must raise instead of silently dropping it."""
    spec = np.abs(np.random.default_rng(0).normal(size=(4, 257, 40))).astype(
        np.float32
    )
    for entry in (griffin_lim, ADMM):
        with pytest.raises(ValueError, match="pack applies"):
            entry(spec, max_iter=2, verbose=False, backend="fft", pack=2)


def test_is_vmem_oom_requires_vmem_signal():
    """Bare RESOURCE_EXHAUSTED (runtime HBM OOM / transient tunnel error)
    must NOT be classified as a kernel VMEM OOM — matching it would
    permanently deny-cache a launch shape that compiles fine."""
    from specinv_tpu.ops.pallas import gl_fullrun4

    assert gl_fullrun4.is_vmem_oom(
        RuntimeError("Mosaic: scoped vmem limit exceeded (130MiB)")
    )
    assert gl_fullrun4.is_vmem_oom(
        RuntimeError("RESOURCE_EXHAUSTED: exceeds available VMEM")
    )
    assert not gl_fullrun4.is_vmem_oom(
        RuntimeError("RESOURCE_EXHAUSTED: out of memory allocating 2.1GiB in HBM")
    )
    assert not gl_fullrun4.is_vmem_oom(
        RuntimeError("UNIMPLEMENTED: TPU backend error")
    )


def test_trace_context_disables_optimistic_band(monkeypatch):
    """Under an enclosing trace the OOM-demotion probe can't catch the
    compile error, so auto dispatch must stay on the conservative VMEM
    budget there (eager calls keep the optimistic band)."""
    import importlib

    import jax

    from specinv_tpu.config import canonicalize
    from specinv_tpu.ops.pallas import gl_fullrun4

    gl_mod = importlib.import_module("specinv_tpu.models.griffin_lim")

    cfg, w = canonicalize(1025, np.float32)  # n_fft=2048

    # find a T in the optimistic band (fits optimistically, not conservatively)
    T = next(
        t for t in range(200, 20000, 50)
        if gl_fullrun4.fits(cfg, t, optimistic=True)
        and not gl_fullrun4.fits(cfg, t, optimistic=False)
    )

    seen = {}
    real_fits = gl_fullrun4.fits

    def fake_fits(cfg_, T_, block_t=None, optimistic=True):
        seen["optimistic"] = optimistic
        return real_fits(cfg_, T_, block_t, optimistic=optimistic)

    monkeypatch.setattr(jax, "default_backend", lambda: "tpu")
    monkeypatch.setattr(gl_fullrun4, "fits", fake_fits)
    # don't actually launch anything: intercept at run_with_vmem_demotion
    picked = {}

    def fake_demotion(launch, bk, fb, cfg_, T_):
        picked["backend"], picked["fallback"] = bk, fb
        return jnp.zeros((1, 8), jnp.float32)

    monkeypatch.setattr(gl_mod, "run_with_vmem_demotion", fake_demotion)
    spec = np.ones((1025, T), np.float32)
    griffin_lim(spec, max_iter=2, verbose=False)
    assert seen["optimistic"] is True     # eager call: optimistic band probed
    assert picked["backend"] == "pallas4" and picked["fallback"] is not None

    def traced():
        griffin_lim(jnp.ones((1025, T), jnp.float32), max_iter=2,
                    verbose=False)
        return jnp.zeros(())

    jax.make_jaxpr(lambda: traced())()
    assert seen["optimistic"] is False    # traced call: conservative budget
    assert picked["fallback"] is None


@pytest.mark.parametrize("which", ["gl", "admm"])
@pytest.mark.parametrize("tol", [0.0, 1e-3])
def test_remat_grads_match_pallas4(which, tol):
    """remat=True on the pallas4 path checkpoints the XLA-twin replay inside
    the segment custom_vjp (both the whole-run launch and the segmented
    early-stop decomposition): same values, same gradients."""
    import jax

    from specinv_tpu import ADMM

    x = make_signal((8192,), dtype=np.float32)
    spec = _mag(x, 512, 128)
    fn = ADMM if which == "admm" else griffin_lim
    kw = dict(hop_length=128, max_iter=6, tol=tol, eva_iter=3,
              verbose=False, backend="pallas4")

    def loss(s, remat):
        y = fn(s, remat=remat, **kw)
        n = min(y.shape[0], len(x))
        return jnp.mean((y[:n] - x[:n]) ** 2)

    g0 = np.asarray(jax.grad(lambda s: loss(s, False))(jnp.asarray(spec)))
    g1 = np.asarray(jax.grad(lambda s: loss(s, True))(jnp.asarray(spec)))
    assert np.isfinite(g1).all()
    np.testing.assert_allclose(g1, g0, atol=1e-7 * np.abs(g0).max())


@pytest.mark.parametrize("algo", ["gl", "admm"])
def test_lane_valve_eager_per_call(algo, monkeypatch):
    """SPECINV_FULLRUN_LANE is read eagerly by the PUBLIC entry points and
    threaded down as a static jit arg (ADVICE r4): flipping the valve
    mid-process must change the dispatched engine on the very next call,
    for griffin_lim AND ADMM — the jit cache key excludes env vars, so a
    trace-time read would silently pin the first value per shape.  The
    spy counts lane-engine traces; the odd clip length busts any cache
    entries earlier tests created for the standard shapes."""
    from specinv_tpu.ops.pallas import fullrun_lane

    calls = []
    real = fullrun_lane.fused_run_lane

    def spy(*a, **k):
        calls.append(1)
        return real(*a, **k)

    monkeypatch.setattr(fullrun_lane, "fused_run_lane", spy)
    x = make_signal((22050 + 13,), dtype=np.float32)
    spec = _mag(x, 512, 128)
    fn = ADMM if algo == "admm" else griffin_lim
    kw = dict(hop_length=128, max_iter=4, tol=0.0, verbose=False,
              backend="pallas4")
    monkeypatch.setenv("SPECINV_FULLRUN_LANE", "1")
    a = np.asarray(fn(spec, **kw))
    assert calls, "lane engine must dispatch for this geometry"
    n1 = len(calls)
    monkeypatch.setenv("SPECINV_FULLRUN_LANE", "0")
    b = np.asarray(fn(spec, **kw))
    assert len(calls) == n1, "valve off must take effect on the next call"
    monkeypatch.setenv("SPECINV_FULLRUN_LANE", "1")
    c = np.asarray(fn(spec, **kw))
    np.testing.assert_allclose(b, a, atol=0)  # engines are bitwise twins
    np.testing.assert_allclose(c, a, atol=0)
