"""Micro-profile of the four-step kernel's building blocks on the real chip.

Each variant is a Pallas kernel with (448, 2048) f32 in/out, chained through
``lax.fori_loop`` so the marginal per-call time is measurable (100 vs 400
reps).  Run alone on the chip.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from specinv_tpu.ops.pallas import fft4  # noqa: E402
from specinv_tpu.ops.pallas.gl_fused import _dot3  # noqa: E402

BT, NFFT = 448, 2048
M = NFFT // 128
HIGH = jax.lax.Precision.HIGH


def make_runner(body):
    def kernel(x_ref, o_ref):
        o_ref[...] = body(x_ref[...])

    call = pl.pallas_call(
        kernel,
        out_shape=jax.ShapeDtypeStruct((BT, NFFT), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024),
    )

    @jax.jit
    def run(x, n):
        return jax.lax.fori_loop(0, n, lambda _, v: call(v) * 0.999, x)

    return run


def timed(run, x):
    np.asarray(run(x, 100))
    ts100, ts400 = [], []
    for _ in range(3):
        t0 = time.perf_counter(); np.asarray(run(x, 100)); ts100.append(time.perf_counter() - t0)
        t0 = time.perf_counter(); np.asarray(run(x, 400)); ts400.append(time.perf_counter() - t0)
    us = (min(ts400) - min(ts100)) / 300.0 * 1e6
    spread = (max(ts400) - min(ts400)) / min(ts400)
    return us, round(spread, 3)


def main():
    t = fft4.tables_as_jnp(NFFT, False)
    tconst = {k: np.asarray(v) for k, v in t.items()}

    def roundtrip(x):
        s_re, s_im = fft4.fwd4(x, tconst, HIGH)
        return fft4.inv4_real(s_re, s_im, tconst, HIGH)

    def dots_only(x):
        # 8 big 128-contraction dots + 4 small m-contraction dots, no layout ops
        y2 = x.reshape(BT * M, 128)
        for _ in range(4):
            y2 = _dot3(y2, tconst["w128_re"], (((1,), (0,)), ((), ())), HIGH)
            y2 = _dot3(y2, tconst["iw128_re"], (((1,), (0,)), ((), ())), HIGH)
        z = x.reshape(BT * 128, M)
        for _ in range(4):
            z = _dot3(z, tconst["wm_re"], (((1,), (0,)), ((), ())), HIGH)
        return y2.reshape(BT, NFFT) + z.reshape(BT, NFFT)

    def transposes_only(x):
        v = x.reshape(BT, M, 128)
        for _ in range(3):
            v = jnp.swapaxes(v, 1, 2)          # (BT, 128, M)
            v = jnp.swapaxes(v, 1, 2)          # back
        return v.reshape(BT, NFFT) * 1.0001

    def reshapes_only(x):
        v = x.reshape(BT, M, 128)
        v = jnp.swapaxes(v, 1, 2).reshape(BT * 128, M)
        v = v.reshape(BT, 128, M)
        v = jnp.swapaxes(v, 1, 2).reshape(BT * M, 128)
        return v.reshape(BT, NFFT) * 1.0001

    cos = np.ascontiguousarray(
        np.cos(np.outer(np.arange(NFFT), np.arange(1152)) * 2 * np.pi / NFFT),
        np.float32,
    )

    def direct_pair(x):
        s = _dot3(x, cos, (((1,), (0,)), ((), ())), HIGH)          # (BT, 1152)
        return _dot3(s, cos.T, (((1,), (0,)), ((), ())), HIGH)     # (BT, 2048)

    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((BT, NFFT)).astype(np.float32) * 0.01)

    for name, body in [
        ("roundtrip4 (fwd4+inv4)", roundtrip),
        ("dots_only (12 dots)", dots_only),
        ("transposes_only (6 swaps)", transposes_only),
        ("reshapes_only", reshapes_only),
        ("direct_dft_pair (2 big dots)", direct_pair),
    ]:
        try:
            us, spread = timed(make_runner(body), x)
            print(json.dumps({"variant": name, "us_per_rep": round(us, 1), "t400_spread": spread}), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"variant": name, "error": repr(e)[:240]}), flush=True)


if __name__ == "__main__":
    main()
