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


def _power_spec_pair(n=256, n_fft=64, n_freq=33, dtype=np.float64):
    """The same differentiable transform in jax and torch, bit-identical math:
    non-overlapping frames -> DFT via shared numpy matrices -> power spectrum.
    Smooth everywhere (no |.| kink), so trajectories are comparable."""
    import torch

    k = np.arange(n_freq)[None, :]
    t = np.arange(n_fft)[:, None]
    C = np.cos(2 * np.pi * t * k / n_fft).astype(dtype)
    S = np.sin(2 * np.pi * t * k / n_fft).astype(dtype)
    Cj, Sj = jnp.asarray(C), jnp.asarray(S)
    Ct, St = torch.from_numpy(C), torch.from_numpy(S)
    frames = n // n_fft

    def fn_jax(x):
        z = x.reshape(frames, n_fft)
        return (z @ Cj) ** 2 + (z @ Sj) ** 2

    def fn_torch(x):
        z = x.reshape(frames, n_fft)
        return (z @ Ct) ** 2 + (z @ St) ** 2

    return fn_jax, fn_torch


@pytest.mark.parametrize(
    "lbfgs_kwargs",
    [
        {},
        {"lr": 0.3, "history_size": 3},
        {"max_eval": 5},
        {"tolerance_change": 1e-2},
        {"tolerance_grad": 1e-3},
    ],
    ids=["defaults", "lr-hist", "max_eval", "tol_change", "tol_grad"],
)
def test_torch_trajectory_parity(lbfgs_kwargs):
    """Golden trajectory vs torch.optim.LBFGS (line_search_fn=None is fully
    deterministic): the fixed-step path must reproduce torch's update rule AND
    its termination criteria (max_eval / tolerance_grad / tolerance_change),
    which the reference forwards raw at methods.py:543."""
    import torch

    from torch_specinv.methods import L_BFGS as ref_lbfgs

    n = 256
    rng = np.random.default_rng(42)
    x_true = rng.standard_normal(n)
    x0 = 0.5 * x_true + 0.1 * rng.standard_normal(n)
    fn_jax, fn_torch = _power_spec_pair(n=n)

    spec_t = fn_torch(torch.from_numpy(x_true))
    y_ref = ref_lbfgs(
        spec_t, fn_torch, init_x0=torch.from_numpy(x0.copy()),
        outer_max_iter=2, tol=0.0, verbose=False, **lbfgs_kwargs,
    ).detach().numpy()

    spec_j = fn_jax(jnp.asarray(x_true))
    # inner max_iter stays at torch's default 20 on both sides; the kwargs
    # exercise the forwarded torch.optim.LBFGS surface
    y = np.asarray(
        L_BFGS(
            spec_j, fn_jax, init_x0=jnp.asarray(x0), outer_max_iter=2,
            tol=0.0, verbose=False, **lbfgs_kwargs,
        )
    )
    np.testing.assert_allclose(y, y_ref, rtol=1e-6, atol=1e-8)


def test_direction_compact_matches_two_loop_end_to_end():
    """The compact-representation direction (TPU fast path) is algebraically
    identical to the two-loop recursion; in f64 the whole fixed-step
    trajectory must agree to near machine precision."""
    n = 256
    rng = np.random.default_rng(7)
    x_true = rng.standard_normal(n)
    x0 = 0.5 * x_true + 0.1 * rng.standard_normal(n)
    fn_jax, _ = _power_spec_pair(n=n)
    spec = fn_jax(jnp.asarray(x_true))
    kw = dict(init_x0=jnp.asarray(x0), outer_max_iter=3, tol=0.0,
              verbose=False, history_size=5)
    y_compact = np.asarray(L_BFGS(spec, fn_jax, direction="compact", **kw))
    y_two_loop = np.asarray(L_BFGS(spec, fn_jax, direction="two_loop", **kw))
    np.testing.assert_allclose(y_compact, y_two_loop, rtol=1e-9, atol=1e-11)


def test_compact_preconditioner_matches_optax():
    """scale_by_compact_lbfgs is a drop-in for optax.scale_by_lbfgs: same
    preconditioned updates along a whole trajectory (f64, 1e-12)."""
    from optax._src import transform as optax_transform

    from specinv_tpu.models._lbfgs_compact import scale_by_compact_lbfgs

    rng = np.random.default_rng(1)
    n = 40
    q_mat = rng.standard_normal((n, n))
    q_mat = q_mat @ q_mat.T / n + np.eye(n)
    b = rng.standard_normal(n)

    def grad(x):
        return jnp.asarray(q_mat) @ x - jnp.asarray(b)

    for m in (3, 6):
        ref_t = optax_transform.scale_by_lbfgs(memory_size=m)
        new_t = scale_by_compact_lbfgs(memory_size=m)
        x1 = jnp.asarray(rng.standard_normal(n))
        x2 = x1
        s1, s2 = ref_t.init(x1), new_t.init(x2)
        for _ in range(9):
            u1, s1 = ref_t.update(grad(x1), s1, x1)
            u2, s2 = new_t.update(grad(x2), s2, x2)
            np.testing.assert_allclose(
                np.asarray(u2), np.asarray(u1), rtol=1e-11, atol=1e-12
            )
            x1 = x1 - 0.1 * u1
            x2 = x2 - 0.1 * u2


@pytest.mark.parametrize("line_search_fn", [None, "strong_wolfe"])
def test_history_dtype_bf16_quality(line_search_fn):
    """history_dtype='bfloat16' (opt-in, halves the compact direction's HBM
    traffic — benchmarks.md bandwidth table) is approximate, but must land
    at the same converged quality as the f32 run: relative loss within a
    decade and genuinely converged."""
    fn = _stft_mag_fn(256)
    rng = np.random.default_rng(3)
    x_true = rng.standard_normal(4096).astype(np.float32)
    spec = fn(jnp.asarray(x_true))
    kw = dict(samples=(4096,), outer_max_iter=8, tol=0.0, verbose=False,
              max_iter=10, history_size=10, line_search_fn=line_search_fn)

    def rel(y):
        v = fn(jnp.asarray(np.asarray(y)))
        return float(jnp.mean((v - spec) ** 2) / jnp.mean(spec**2))

    l32 = rel(L_BFGS(spec, fn, **kw))
    l16 = rel(L_BFGS(spec, fn, history_dtype="bfloat16", **kw))
    assert l16 < max(10.0 * l32, 1e-10), (l16, l32)
    # sanity: it genuinely optimized (initial rel loss is ~1.0 at the
    # near-zero x0; the f32 run lands ~3e-3 at this budget)
    assert l16 < 0.05, l16


def test_history_dtype_buffers_and_accumulation():
    """The bf16 history really is stored bf16 (the bandwidth win is real)
    and single-step directions stay close to f32 (f32 accumulate: only the
    stored rows are rounded)."""
    from specinv_tpu.models._lbfgs_torch import init_state, lbfgs_step

    st = init_state(jnp.zeros((64,), jnp.float32), 4,
                    history_dtype="bfloat16")
    assert st.ybuf.dtype == jnp.bfloat16 and st.sbuf.dtype == jnp.bfloat16
    assert st.rho.dtype == jnp.float32  # scalars stay full precision

    q = np.diag(np.linspace(1.0, 4.0, 64)).astype(np.float32)

    def vg(x):
        v = 0.5 * x @ jnp.asarray(q) @ x
        return v, jnp.asarray(q) @ x

    x0 = jnp.asarray(np.random.default_rng(5).standard_normal(64),
                     jnp.float32)
    kw = dict(lr=0.5, max_iter=6, max_eval=10, tolerance_grad=0.0,
              tolerance_change=0.0, direction="compact")
    x32, _ = lbfgs_step(x0, init_state(x0, 4), vg, **kw)
    x16, _ = lbfgs_step(x0, st, vg, **kw)
    np.testing.assert_allclose(np.asarray(x16), np.asarray(x32),
                               rtol=5e-2, atol=5e-3)
    assert not np.array_equal(np.asarray(x16), np.asarray(x32))


def test_history_dtype_requires_compact():
    fn = _stft_mag_fn(256)
    with pytest.raises(ValueError, match="compact"):
        L_BFGS(jnp.zeros((129, 10)), fn, samples=(2048,),
               direction="two_loop", history_dtype="bfloat16")


def test_compact_preconditioner_rejects_complex():
    """Complex trees need conjugating vdots (optax has them, the compact
    path does not) — reject instead of silently mis-preconditioning."""
    from specinv_tpu.models._lbfgs_compact import scale_by_compact_lbfgs

    t = scale_by_compact_lbfgs(memory_size=3)
    with pytest.raises(TypeError):
        t.init(jnp.zeros((8,), jnp.complex64))


def test_unknown_kwargs_raise():
    fn = _stft_mag_fn(256)
    with pytest.raises(TypeError):
        L_BFGS(jnp.zeros((129, 10)), fn, samples=(2048,), bogus_option=3)


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


def test_strong_wolfe_outcome_parity_vs_torch():
    """The reference forwards line_search_fn='strong_wolfe' raw to
    torch.optim.LBFGS (methods.py:543); ours substitutes optax's zoom line
    search.  Trajectories may legitimately diverge (different interpolation),
    but the *outcome* must not: after N outer steps on the smooth power-spec
    problem the final relative loss must land within one decade of torch's
    (measured gap: <0.1 decades at both 5 and 10 outer steps)."""
    import torch

    from torch_specinv.methods import L_BFGS as ref_lbfgs

    n = 256
    rng = np.random.default_rng(3)
    x_true = rng.standard_normal(n)
    x0 = 0.1 * rng.standard_normal(n)  # far start: the line search matters
    fn_jax, fn_torch = _power_spec_pair(n=n)
    spec_t = fn_torch(torch.from_numpy(x_true))
    spec_j = fn_jax(jnp.asarray(x_true))

    def rel(v, s):
        v, s = np.asarray(v), np.asarray(s)
        return float(np.mean((v - s) ** 2) / np.mean(s**2))

    for outer, floor in ((5, 1e-6), (10, 1e-10)):
        kw = dict(outer_max_iter=outer, tol=0.0, verbose=False, max_iter=20,
                  history_size=10, line_search_fn="strong_wolfe")
        y_ref = ref_lbfgs(
            spec_t, fn_torch, init_x0=torch.from_numpy(x0.copy()), **kw
        ).detach().numpy()
        y = np.asarray(L_BFGS(spec_j, fn_jax, init_x0=jnp.asarray(x0), **kw))
        l_ref = rel(fn_torch(torch.from_numpy(y_ref)), spec_t)
        l_us = rel(fn_jax(jnp.asarray(y)), spec_j)
        # quality parity: within one decade of torch, and genuinely converged
        assert l_us < max(10.0 * l_ref, 1e-14), (outer, l_us, l_ref)
        assert l_us < floor, (outer, l_us)


@pytest.mark.parametrize("line_search", [False, True])
def test_vmap_batched_clips_match_loop(line_search):
    """Capacity-serving recipe: jax.vmap over the whole solver (per-clip
    line search + termination) must match solving each clip alone."""
    from specinv_tpu.models.lbfgs import run

    fn = _stft_mag_fn(256)
    rng = np.random.default_rng(11)
    B, n = 3, 2048
    xs = rng.standard_normal((B, n)).astype(np.float32)
    tgts = jax.vmap(fn)(jnp.asarray(xs))
    x0 = jnp.asarray(rng.standard_normal((B, n)).astype(np.float32) * 1e-6)
    tol = jnp.float32(0.0)

    def one(t, x0):
        return run(
            t, x0, tol, fn, outer_max_iter=3, inner_max_iter=5,
            line_search=line_search, lr=0.5, verbose=False, mode="fori")

    batched = jax.vmap(one)(tgts, x0)
    for b in range(B):
        solo = one(tgts[b], x0[b])
        np.testing.assert_allclose(
            np.asarray(batched[b]), np.asarray(solo), rtol=2e-4, atol=1e-5)
