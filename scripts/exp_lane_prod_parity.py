"""Bitwise parity sweep: fullrun_lane vs the (m, 128) whole-run kernels.

Covers GL + ADMM x pad modes x n_fft x pack x emit/mag flags on the real
chip.  The old path is forced with SPECINV_FULLRUN_LANE=0 via a subprocess-
free trick: we call the module-level kernels directly (the dispatcher only
lives in fused_gl_run / fused_admm_run, and supports() reads the env var
lazily — flip it around each call).

Usage: python scripts/exp_lane_prod_parity.py
"""
import json
import os
import sys

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench_common import readback  # noqa: E402
from specinv_tpu.config import canonicalize  # noqa: E402
from specinv_tpu.models._pallas_driver import make_geometry4, make_inv_env  # noqa: E402
from specinv_tpu.ops import stft as stft_ops  # noqa: E402
from specinv_tpu.ops.pallas import fft4  # noqa: E402
from specinv_tpu.ops.pallas import admm_fused4, gl_fullrun4  # noqa: E402

SR = 22050


def build(n_fft, pad_mode, B=1, seconds=1, seed=3):
    rng = np.random.default_rng(seed)
    win = np.hanning(n_fft + 1)[:-1].astype(np.float32)
    cfg, w = canonicalize(
        n_fft // 2 + 1, np.float32, window=win, pad_mode=pad_mode
    )
    wj = jnp.asarray(w)
    clip = rng.standard_normal((B, SR * seconds)).astype(np.float32)
    spec = stft_ops.stft(jnp.asarray(clip), cfg, wj)
    mag_tm = jnp.abs(spec).astype(jnp.float32)
    T = mag_tm.shape[1]
    geo = make_geometry4(cfg, T, block_t=None)
    inv_env = make_inv_env(cfg, wj, T, geo).astype(jnp.float32)
    tgt_full = fft4.extend_hermitian_mag(mag_tm, n_fft)
    pad_rows = lambda a: jnp.pad(  # noqa: E731
        a, ((0, 0), (0, geo.t_pad - T), (0, 0)))
    target_p = fft4.to_permuted(pad_rows(tgt_full), n_fft)
    st_re = target_p
    st_im = target_p * 0.25
    x_pad = jnp.asarray(
        rng.standard_normal((B, geo.lx)).astype(np.float32) * 0.01
    )
    return cfg, wj, geo, T, target_p, st_re, st_im, x_pad, inv_env


def run_case(algo, n_fft, pad_mode, pack, flags):
    emit_state, with_mag = flags
    B = max(1, pack)
    cfg, wj, geo, T, tgt, st_re, st_im, x_pad, inv_env = build(
        n_fft, pad_mode, B=B
    )
    kw = dict(
        n_iters=4, block_t=geo.block_t, emit_state=emit_state,
        with_mag=with_mag, pack=pack,
    )
    if algo == "gl":
        lr = jnp.float32(0.99 / 1.99)
        call = lambda: gl_fullrun4.fused_gl_run(  # noqa: E731
            x_pad, st_re, st_im, tgt, wj, inv_env, lr, cfg, geo.e, **kw)
    else:
        rho = jnp.float32(0.1)
        call = lambda: admm_fused4.fused_admm_run(  # noqa: E731
            x_pad, st_re, st_im, tgt, wj, inv_env, rho, cfg, T, geo.e, **kw)

    os.environ["SPECINV_FULLRUN_LANE"] = "0"
    ref = call()
    os.environ["SPECINV_FULLRUN_LANE"] = "1"
    new = call()
    if not isinstance(ref, tuple):
        ref, new = (ref,), (new,)
    errs = [
        float(np.max(np.abs(readback(r) - readback(n))))
        for r, n in zip(ref, new)
    ]
    return errs


def main():
    cases = []
    for algo in ("gl", "admm"):
        for pad_mode in ("reflect", "constant", "replicate", "circular"):
            cases.append((algo, 2048, pad_mode, 1, (True, True)))
        cases.append((algo, 512, "reflect", 1, (True, True)))
        cases.append((algo, 512, "reflect", 4, (True, True)))
        cases.append((algo, 1024, "circular", 2, (False, False)))
        cases.append((algo, 4096, "reflect", 1, (False, True)))
    failures = 0
    for algo, n_fft, pad_mode, pack, flags in cases:
        try:
            errs = run_case(algo, n_fft, pad_mode, pack, flags)
            ok = all(e == 0.0 for e in errs)
        except Exception as ex:  # noqa: BLE001
            errs, ok = str(ex)[:200], False
        failures += not ok
        print(json.dumps({
            "algo": algo, "n_fft": n_fft, "pad": pad_mode, "pack": pack,
            "flags": list(flags), "bitwise": ok, "errs": errs,
        }), flush=True)
    print(json.dumps({"failures": failures}))


if __name__ == "__main__":
    main()
