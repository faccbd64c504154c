"""Interleaved batched-occupancy sweep (VERDICT r2 item 2 / BASELINE cfg 5).

Same measurement as :mod:`exp_batch` (Griffin-Lim 100 fixed iterations,
fullrun kernel via backend=auto, 2 s 22.05 kHz clips, marginal 400-100
differencing) but the B variants within each n_fft are interleaved
round-robin with per-round differencing and a median across rounds, so the
B-scaling comparison is tunnel-drift-free (the `exp_blockt` methodology).
Cross-n_fft comparisons still carry drift.  Run alone.

Usage: python scripts/exp_batch2.py [n_fft ...] [--rounds N]
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax.numpy as jnp  # noqa: E402

import specinv_tpu as si  # noqa: E402
from specinv_tpu.config import canonicalize  # noqa: E402
from specinv_tpu.ops import stft as stft_ops  # noqa: E402
from bench_common import readback as _readback  # noqa: E402

SR = 22050
SECONDS = 2
BATCHES = (1, 4, 16, 64)

def main():
    argv = sys.argv[1:]
    rounds = 5
    nffts = []
    i = 0
    while i < len(argv):
        if argv[i] == "--rounds":
            rounds = int(argv[i + 1])
            i += 2
        else:
            nffts.append(int(argv[i]))
            i += 1
    if not nffts:
        nffts = [512, 1024, 2048, 4096]

    rng = np.random.default_rng(1)
    for n_fft in nffts:
        win = np.hanning(n_fft + 1)[:-1].astype(np.float32)
        cfg, w = canonicalize(n_fft // 2 + 1, np.float32, window=win)
        wj = jnp.asarray(w)
        variants = {}
        for B in BATCHES:
            clips = rng.standard_normal((B, SR * SECONDS)).astype(np.float32)
            m = jnp.swapaxes(
                jnp.abs(stft_ops.stft(jnp.asarray(clips), cfg, wj)), -1, -2
            )
            variants[B] = [m * (1 + 1e-6 * k) for k in range(8)]
            for v in variants[B]:
                _readback(v)
        vi = [0]

        def run(B, iters):
            v = variants[B][vi[0] % 8]
            vi[0] += 1
            return si.griffin_lim(
                v, max_iter=iters, tol=0.0, verbose=False, window=win
            )

        # Warm every (B, iters) variant before any timing.
        for B in BATCHES:
            for iters in (100, 400):
                _readback(run(B, iters))
        marg = {B: [] for B in BATCHES}
        for _ in range(rounds):
            for B in BATCHES:
                t0 = time.perf_counter()
                _readback(run(B, 100))
                t100 = time.perf_counter() - t0
                t0 = time.perf_counter()
                _readback(run(B, 400))
                t400 = time.perf_counter() - t0
                marg[B].append(300 / (t400 - t100))
        for B in BATCHES:
            m_it = sorted(marg[B])[len(marg[B]) // 2]
            print(json.dumps({
                "n_fft": n_fft,
                "batch": B,
                "marginal_it_s": round(m_it, 1),
                "clip_it_s": round(m_it * B, 1),
            }), flush=True)


if __name__ == "__main__":
    main()
