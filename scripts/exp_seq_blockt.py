"""block_t A/B for the PER-ITERATION four-step GL kernel (one real chip).

The sequence-parallel path pins block_t=64 for ``fused_gl_iteration4``
(parallel/seq.py) because the 32-vs-64 policy was tuned on the whole-run
kernel only (scripts/exp_blockt.py) — ADVICE r2 #4.  This sweep measures
the per-iteration kernel itself at shard-local shapes: a lax.scan of K
iterations (normalize=False, with_mag=True — the exact seq per-step
configuration), marginal 400-100 differencing, variants interleaved
round-robin so tunnel drift cancels.  Run alone.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from bench_common import readback  # noqa: E402

from specinv_tpu.config import canonicalize  # noqa: E402
from specinv_tpu.ops.pallas import fft4  # noqa: E402
from specinv_tpu.ops.pallas.gl_fused4 import fused_gl_iteration4  # noqa: E402

SR = 22050
N_FFT = 2048

# Shard-local frame counts for the 10 s north star split n ways (T=431,
# padded to a multiple of n first), plus a dp x sp case with B=4.
CASES = [
    # (Ts_local, B)  ~ n shards of the north star
    (216, 1),   # n=2
    (108, 1),   # n=4
    (54, 1),    # n=8
    (108, 4),   # dp=4 x sp=4
]
BLOCK_TS = (32, 64)


def build_inputs(Ts_local, B, block_t, cfg, rng):
    hop, n_fft = cfg.hop_length, cfg.n_fft
    m = n_fft // 128
    t_pad = -(-Ts_local // block_t) * block_t
    lx = (t_pad - 1) * hop + n_fft
    x = jnp.asarray(rng.standard_normal((B, lx)).astype(np.float32))
    # permuted full-spectrum planes: rows past Ts_local are zero (like the
    # seq path's pad_rows), magnitudes positive.
    tgt = np.abs(rng.standard_normal((B, t_pad, n_fft)).astype(np.float32))
    tgt[:, Ts_local:] = 0.0
    tgt_p = fft4.to_permuted(jnp.asarray(tgt), n_fft)
    pre = rng.standard_normal((2, B, t_pad, n_fft)).astype(np.float32)
    pre[:, :, Ts_local:] = 0.0
    pre_re = fft4.to_permuted(jnp.asarray(pre[0]), n_fft)
    pre_im = fft4.to_permuted(jnp.asarray(pre[1]), n_fft)
    assert pre_re.shape == (B, t_pad, m, 128)
    return x, pre_re, pre_im, tgt_p, lx


def main():
    cfg, w = canonicalize(
        N_FFT // 2 + 1, np.float32,
        window=np.hanning(N_FFT + 1)[:-1].astype(np.float32),
    )
    wj = jnp.asarray(w).astype(jnp.float32)
    lr = jnp.float32(0.99 / 1.99)
    rng = np.random.default_rng(3)
    interpret = jax.default_backend() == "cpu"

    for Ts_local, B in CASES:
        fns = {}
        for bt in BLOCK_TS:
            x0, pr0, pi0, tgt_p, lx = build_inputs(Ts_local, B, bt, cfg, rng)
            ones_env = jnp.ones((lx,), jnp.float32)

            def step(state, _, tgt_p=tgt_p, bt=bt, ones_env=ones_env):
                x, pre_re, pre_im = state
                x_raw, _mag, pre_re, pre_im = fused_gl_iteration4(
                    x, pre_re, pre_im, tgt_p, wj, ones_env, lr, cfg, e=0,
                    block_t=bt, interpret=interpret,
                    with_mag=True, normalize=False,
                )
                return (x_raw, pre_re, pre_im), None

            def run(iters, step=step, init=(x0, pr0, pi0)):
                state, _ = jax.lax.scan(step, init, None, length=iters)
                return state[0]

            fns[bt] = jax.jit(run, static_argnums=0)
            # compile both iteration counts up front
            readback(fns[bt](100))
            readback(fns[bt](400))

        deltas = {bt: [] for bt in BLOCK_TS}
        for _ in range(5):
            for bt in BLOCK_TS:
                t0 = time.perf_counter(); readback(fns[bt](100)); t100 = time.perf_counter() - t0
                t0 = time.perf_counter(); readback(fns[bt](400)); t400 = time.perf_counter() - t0
                deltas[bt].append(t400 - t100)
        for bt in BLOCK_TS:
            d = sorted(deltas[bt])[len(deltas[bt]) // 2]
            print(json.dumps({
                "Ts_local": Ts_local, "B": B, "block_t": bt,
                "t_pad": -(-Ts_local // bt) * bt,
                "us_per_iter": round(1e6 * d / 300, 2),
            }), flush=True)


if __name__ == "__main__":
    main()
