"""Round-5: attribute the public-path vs direct-kernel marginal gap.

Interleaved same-session A/B of four variants on the GL north star
(n_fft=2048, 10 s clip, B=1), min-of-rounds estimator:

  pub_reflect  — public griffin_lim path, default pad_mode='reflect'
  pub_const    — public path, pad_mode='constant'
  dir_const    — direct fused_gl_run, pad_mode='constant'  (exp_r4 setup)
  dir_reflect  — direct fused_gl_run, pad_mode='reflect'

If dir_const reproduces r4's 24-29 us/iter while pub_reflect reads ~34,
the gap is real program cost (repad / layout / driver), not session drift.
"""
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

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


def direct_variant(pad_mode):
    from specinv_tpu.models._pallas_driver import make_geometry4, make_inv_env
    from specinv_tpu.ops.pallas import fft4
    from specinv_tpu.ops.pallas.gl_fullrun4 import fused_gl_run

    rng = np.random.default_rng(7)
    win = np.hanning(N_FFT + 1)[:-1].astype(np.float32)
    cfg, w = canonicalize(
        N_FFT // 2 + 1, np.float32, window=win, pad_mode=pad_mode)
    wj = jnp.asarray(w)
    clip = rng.standard_normal((1, SR * 10)).astype(np.float32)
    spec = stft_ops.stft(jnp.asarray(clip), cfg, wj)
    mag_tm = jnp.abs(spec).astype(jnp.float32)
    T = mag_tm.shape[1]
    geo = make_geometry4(cfg, T, block_t=None)
    inv_env = make_inv_env(cfg, wj, T, geo).astype(jnp.float32)
    tgt_full = fft4.extend_hermitian_mag(mag_tm, N_FFT)
    pad_rows = lambda a: jnp.pad(a, ((0, 0), (0, geo.t_pad - T), (0, 0)))  # noqa: E731
    tgt = fft4.to_permuted(pad_rows(tgt_full), N_FFT)
    x_pad = jnp.asarray(rng.standard_normal((1, geo.lx)).astype(np.float32) * 0.01)
    lr = jnp.float32(0.99 / 1.99)
    pre_re, pre_im = tgt, tgt * 0.25
    return functools.partial(
        lambda it: fused_gl_run(
            x_pad, pre_re, pre_im, tgt, wj, inv_env, lr, cfg, geo.e,
            n_iters=it, block_t=geo.block_t, emit_state=True,
            with_mag=False)[0])


def public_variant(pad_mode):
    rng = np.random.default_rng(0)
    t = np.linspace(0, 10, SR * 10, dtype=np.float32)
    x = (np.sin(2 * np.pi * 440 * t)
         + 0.1 * rng.standard_normal(t.size)).astype(np.float32)
    window = np.hanning(N_FFT + 1)[:-1].astype(np.float32)
    cfg, w = canonicalize(
        N_FFT // 2 + 1, np.float32, window=window, pad_mode=pad_mode)
    wj = jnp.asarray(w)
    mag = jnp.swapaxes(jnp.abs(stft_ops.stft(jnp.asarray(x), cfg, wj)), -1, -2)

    def f(it, m):
        return jnp.sum(si.griffin_lim(
            m, max_iter=it, tol=0.0, verbose=False, window=window,
            backend="pallas4", pad_mode=pad_mode))

    g = jax.jit(f, static_argnums=0)
    return lambda it: g(it, mag)


def main():
    rounds = int(sys.argv[sys.argv.index("--rounds") + 1]) if "--rounds" in sys.argv else 5
    variants = {
        "pub_reflect": public_variant("reflect"),
        "pub_const": public_variant("constant"),
        "dir_const": direct_variant("constant"),
        "dir_reflect": direct_variant("reflect"),
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
