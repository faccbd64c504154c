"""Round-5 gap attribution, part 2: why does the public GL path run
~5 us/iter slower than a direct fused_gl_run launch with identical kernel
arguments?

Variants (all pad_mode='reflect', north star geometry):
  pub_sine   — public scalar-jitted path, sine+noise clip (bench input)
  pub_randn  — public path, randn clip (exp_r4 input)
  dir_eager  — direct fused_gl_run, eager dispatch (exp_r4 style)
  dir_jit    — direct fused_gl_run wrapped in jax.jit
  pub_init0  — public path but x0/pre state zeroed like dir uses randn*0.01
"""
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import specinv_tpu as si  # noqa: E402
from specinv_tpu.config import canonicalize  # noqa: E402
from specinv_tpu.ops import stft as stft_ops  # noqa: E402

SR, N_FFT = 22050, 2048


def readback(x):
    for k in range(4):
        try:
            jax.tree_util.tree_map(lambda a: np.asarray(a), x)
            return
        except Exception:  # noqa: BLE001
            if k == 3:
                raise
            time.sleep(2.0)


def make_mag(kind):
    rng = np.random.default_rng(0)
    if kind == "sine":
        t = np.linspace(0, 10, SR * 10, dtype=np.float32)
        x = (np.sin(2 * np.pi * 440 * t)
             + 0.1 * rng.standard_normal(t.size)).astype(np.float32)
    else:
        x = rng.standard_normal((SR * 10,)).astype(np.float32)
    window = np.hanning(N_FFT + 1)[:-1].astype(np.float32)
    # constant pad everywhere: no repad in either path, so the pub-vs-dir
    # delta is pure driver cost
    cfg, w = canonicalize(N_FFT // 2 + 1, np.float32, window=window,
                          pad_mode="constant")
    wj = jnp.asarray(w)
    mag = jnp.swapaxes(jnp.abs(stft_ops.stft(jnp.asarray(x), cfg, wj)), -1, -2)
    return mag, window, cfg, wj


def public_variant(kind):
    mag, window, _, _ = make_mag(kind)

    def f(it, m):
        # pad_mode='constant' so the only delta vs dir_* is the public
        # driver (same kernel geometry, no repad)
        return jnp.sum(si.griffin_lim(
            m, max_iter=it, tol=0.0, verbose=False, window=window,
            backend="pallas4", pad_mode="constant"))

    g = jax.jit(f, static_argnums=0)
    return lambda it: g(it, mag)


def direct_variant(jit):
    from specinv_tpu.models._pallas_driver import make_geometry4, make_inv_env
    from specinv_tpu.ops.pallas import fft4
    from specinv_tpu.ops.pallas.gl_fullrun4 import fused_gl_run

    mag_bft, window, cfg, wj = make_mag("randn")
    mag_tm = jnp.swapaxes(mag_bft, -1, -2)[None] if mag_bft.ndim == 2 else None
    # make_mag returns (F, T); convert to (1, T, F)
    mag_tm = jnp.swapaxes(mag_bft, -1, -2)[None]
    T = mag_tm.shape[1]
    geo = make_geometry4(cfg, T, block_t=None)
    inv_env = make_inv_env(cfg, wj, T, geo).astype(jnp.float32)
    tgt_full = fft4.extend_hermitian_mag(mag_tm.astype(jnp.float32), N_FFT)
    pad_rows = lambda a: jnp.pad(a, ((0, 0), (0, geo.t_pad - T), (0, 0)))  # noqa: E731
    tgt = fft4.to_permuted(pad_rows(tgt_full), N_FFT)
    rng = np.random.default_rng(7)
    x_pad = jnp.asarray(rng.standard_normal((1, geo.lx)).astype(np.float32) * 0.01)
    lr = jnp.float32(0.99 / 1.99)
    pre_re, pre_im = tgt, tgt * 0.25

    def call(it, x_pad_, pre_re_, pre_im_, tgt_, wj_, inv_env_):
        return jnp.sum(fused_gl_run(
            x_pad_, pre_re_, pre_im_, tgt_, wj_, inv_env_, lr, cfg, geo.e,
            n_iters=it, block_t=geo.block_t, emit_state=True,
            with_mag=False)[0])

    if jit:
        g = jax.jit(call, static_argnums=0)
        return lambda it: g(it, x_pad, pre_re, pre_im, tgt, wj, inv_env)
    return lambda it: call(it, x_pad, pre_re, pre_im, tgt, wj, inv_env)


def main():
    rounds = int(sys.argv[sys.argv.index("--rounds") + 1]) if "--rounds" in sys.argv else 5
    variants = {
        "pub_sine": public_variant("sine"),
        "pub_randn": public_variant("randn"),
        "dir_eager": direct_variant(False),
        "dir_jit": direct_variant(True),
    }
    lo, hi = 1000, 21000
    for f in variants.values():
        for it in (lo, hi):
            readback(f(it))
    t_lo = {n: [] for n in variants}
    t_hi = {n: [] for n in variants}
    for r in range(rounds):
        for n, f in variants.items():
            t0 = time.perf_counter(); readback(f(lo)); t_lo[n].append(time.perf_counter() - t0)
            t0 = time.perf_counter(); readback(f(hi)); t_hi[n].append(time.perf_counter() - t0)
        print(f"# round {r} done", flush=True)
    for n in variants:
        d = min(t_hi[n]) - min(t_lo[n])
        print(json.dumps({
            "variant": n,
            "us_per_iter": round(d / (hi - lo) * 1e6, 2),
            "t_lo_min_ms": round(min(t_lo[n]) * 1e3, 1),
            "t_hi_min_ms": round(min(t_hi[n]) * 1e3, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
