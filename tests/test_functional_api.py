"""The functional init/step cores must compose with jax transforms
(vmap/jit/grad) — the property that makes the library usable inside
training loops and sharded pipelines."""
import numpy as np
import jax
import jax.numpy as jnp

import importlib

from specinv_tpu.config import canonicalize
from specinv_tpu.ops.stft import make_envelope, stft

# the package re-exports functions under the module names, so fetch modules
# explicitly
gl_mod = importlib.import_module("specinv_tpu.models.griffin_lim")
admm_mod = importlib.import_module("specinv_tpu.models.admm")

from .helpers import make_signal, torch_stft


def _setup(batch=3, n=8192, nfft=256, dtype=np.float32):
    x = make_signal((batch, n), dtype=dtype)
    mag = np.abs(torch_stft(x, nfft)).astype(dtype)          # (B, F, T)
    cfg, w = canonicalize(mag.shape[1], dtype)
    wj = jnp.asarray(w)
    tm = jnp.swapaxes(jnp.asarray(mag), -1, -2)              # (B, T, F)
    return cfg, wj, tm


def test_gl_step_vmap_equals_batched():
    cfg, wj, tm = _setup()
    env = make_envelope(cfg, wj, tm.shape[-2])
    init = tm.astype(jnp.complex64)

    # batched: the step handles the batch dim natively
    state_b = gl_mod.init(tm, init, cfg, wj, envelope=env)
    state_b, out_b = gl_mod.step(state_b, tm, 0.5, cfg, wj, env)

    # vmapped: per-clip step mapped over the batch
    def one(t, i):
        st = gl_mod.init(t[None], i[None], cfg, wj, envelope=env)
        st, out = gl_mod.step(st, t[None], 0.5, cfg, wj, env)
        return st.x[0], out[0]

    xs, outs = jax.vmap(one)(tm, init)
    np.testing.assert_allclose(np.asarray(xs), np.asarray(state_b.x), rtol=2e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(outs), np.asarray(out_b), rtol=2e-5, atol=1e-5)


def test_gl_step_grad_flows():
    cfg, wj, tm = _setup(batch=1)
    env = make_envelope(cfg, wj, tm.shape[-2])

    def loss(target):
        st = gl_mod.init(target, target.astype(jnp.complex64), cfg, wj, envelope=env)
        st, _ = gl_mod.step(st, target, 0.5, cfg, wj, env)
        return jnp.sum(st.x**2)

    g = jax.grad(loss)(tm)
    assert np.isfinite(np.asarray(g)).all()
    assert not bool(jnp.all(g == 0))


def test_admm_step_jit_composes():
    cfg, wj, tm = _setup(batch=2)
    env = make_envelope(cfg, wj, tm.shape[-2])
    st = admm_mod.init(tm.astype(jnp.complex64), cfg, wj, envelope=env)

    @jax.jit
    def two_steps(st):
        st, _ = admm_mod.step(st, tm, 0.1, cfg, wj, env)
        st, out = admm_mod.step(st, tm, 0.1, cfg, wj, env)
        return st, out

    st2, out = two_steps(st)
    assert st2.x.shape == st.x.shape and out.shape == tm.shape


def test_stft_roundtrip_under_vmap():
    cfg, wj, tm = _setup(batch=4)
    x = make_signal((4, 8192), dtype=np.float32)
    spec_b = stft(jnp.asarray(x), cfg, wj)
    spec_v = jax.vmap(lambda xi: stft(xi, cfg, wj))(jnp.asarray(x))
    np.testing.assert_allclose(
        np.asarray(spec_b), np.asarray(spec_v), rtol=1e-5, atol=1e-5
    )
