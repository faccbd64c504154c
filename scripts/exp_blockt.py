"""block_t sweep for the whole-run four-step GL kernel (one real chip).

The fullrun grid is (B, n_iters, t_pad/block_t); block_t sets both the
padding waste (t_pad = ceil(T/block_t)*block_t) and the per-grid-step
compute granularity.  Variants are interleaved round-robin within each
config so the tunnel's session drift cancels; marginal rates via 400-100
iteration differencing.  Run alone.
"""
import importlib
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from specinv_tpu.config import canonicalize  # noqa: E402
from specinv_tpu.ops import stft as stft_ops  # noqa: E402

gl = importlib.import_module("specinv_tpu.models.griffin_lim")

SR = 22050

CONFIGS = [
    # (n_fft, seconds, batch)
    (512, 2, 16),
    (1024, 2, 16),
    (2048, 2, 16),
    (4096, 2, 16),
    (2048, 10, 1),   # north star
]


def _readback(a, tries=3):
    for attempt in range(tries):
        try:
            return np.asarray(a)
        except Exception:  # noqa: BLE001
            if attempt == tries - 1:
                raise
            time.sleep(2.0)


def main():
    # Optional config filter: `python exp_blockt.py 2048x10x1 1024x2x16`
    configs = CONFIGS
    picks = [a for a in sys.argv[1:] if "x" in a]
    if picks:
        want = {tuple(int(p) for p in a.split("x")) for a in picks}
        configs = [c for c in CONFIGS if c in want]
    rng = np.random.default_rng(1)
    for n_fft, seconds, B in configs:
        clips = rng.standard_normal((B, SR * seconds)).astype(np.float32)
        win = np.hanning(n_fft + 1)[:-1].astype(np.float32)
        cfg, w = canonicalize(n_fft // 2 + 1, np.float32, window=win)
        # run_tm_pallas4 takes time-major (B, T, F) input.
        mag = jnp.abs(stft_ops.stft(jnp.asarray(clips), cfg, jnp.asarray(w)))
        spec0 = mag.astype(jnp.complex64)
        wj = jnp.asarray(w)
        lr = jnp.float32(0.99 / 1.99)
        T = mag.shape[1]
        variants = [mag * (1 + 1e-6 * i) for i in range(8)]
        for v in variants:
            _readback(v)

        bts = [bt for bt in (32, 64, 128, 256) if bt <= -(-T // 64) * 64]
        vi = [0]

        def run(iters, block_t):
            v = variants[vi[0] % len(variants)]
            vi[0] += 1
            return gl.run_tm_pallas4(
                v, spec0, wj, lr, jnp.float32(0.0), cfg,
                max_iter=iters, verbose=False, block_t=block_t,
                early_stop=False,
            )

        # compile all variants first
        ok = []
        for bt in bts:
            try:
                _readback(run(100, bt))
                _readback(run(400, bt))
                ok.append(bt)
            except Exception as exc:  # noqa: BLE001
                print(json.dumps({
                    "n_fft": n_fft, "sec": seconds, "B": B, "block_t": bt,
                    "error": str(exc)[:160],
                }), flush=True)

        deltas = {bt: [] for bt in ok}
        for _ in range(5):  # interleaved rounds
            for bt in ok:
                t0 = time.perf_counter(); _readback(run(100, bt)); t100 = time.perf_counter() - t0
                t0 = time.perf_counter(); _readback(run(400, bt)); t400 = time.perf_counter() - t0
                deltas[bt].append(t400 - t100)
        for bt in ok:
            d = sorted(deltas[bt])[len(deltas[bt]) // 2]  # median
            t_pad = -(-T // bt) * bt
            print(json.dumps({
                "n_fft": n_fft, "sec": seconds, "B": B, "block_t": bt,
                "T": int(T), "t_pad": t_pad,
                "us_per_batch_iter": round(1e6 * d / 300, 2),
                "marginal_clip_iters_per_s": round(300.0 * B / d, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
