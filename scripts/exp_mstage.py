"""Radix vs naive m-point stage A/B (one real chip).  Run alone.

The four-step kernels' m-point DFT stage is the VPU hotspot at
n_fft >= 2048 (benchmarks.md roofline; clip packing measured neutral at
2048 because of it).  fft4's radix-2 literal FFT replaces the naive
O(m^2) literal sums; this sweep interleaves the two modes round-robin
(the exp_blockt methodology) on the whole-run GL kernel.

Both modes live in one process: fft4._MSTAGE is consulted at TRACE time,
and each (mode, max_iter) pair uses a distinct max_iter so it gets its
own jit cache entry (100/400 radix, 101/401 naive — the one-iteration
difference is ~0.25% of the marginal, far under tunnel noise).

Usage: python scripts/exp_mstage.py [--rounds N]
Cases: north star (2048, 10 s, B=1) + batched (2048/4096, 2 s, B=16).
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax.numpy as jnp  # noqa: E402
from bench_common import readback as _readback  # noqa: E402

import specinv_tpu as si  # noqa: E402
from specinv_tpu.config import canonicalize  # noqa: E402
from specinv_tpu.ops import stft as stft_ops  # noqa: E402
from specinv_tpu.ops.pallas import fft4  # noqa: E402

SR = 22050
CASES = [
    # (label, n_fft, seconds, batch)
    ("north-star 2048 10s B=1", 2048, 10, 1),
    ("batched 2048 2s B=16", 2048, 2, 16),
    ("batched 4096 2s B=16", 4096, 2, 16),
]
MODES = {"radix": (100, 400), "naive": (101, 401)}


def main():
    rounds = 5
    if "--rounds" in sys.argv:
        rounds = int(sys.argv[sys.argv.index("--rounds") + 1])

    rng = np.random.default_rng(3)
    for label, n_fft, seconds, B in CASES:
        win = np.hanning(n_fft + 1)[:-1].astype(np.float32)
        cfg, w = canonicalize(n_fft // 2 + 1, np.float32, window=win)
        wj = jnp.asarray(w)
        clips = rng.standard_normal((B, SR * seconds)).astype(np.float32)
        mag = jnp.swapaxes(
            jnp.abs(stft_ops.stft(jnp.asarray(clips), cfg, wj)), -1, -2
        )
        if B == 1:
            mag = mag[0]
        variants = [mag * (1 + 1e-6 * k) for k in range(8)]
        for v in variants:
            _readback(v)
        vi = [0]

        def run(mode, iters):
            fft4._MSTAGE = mode
            v = variants[vi[0] % 8]
            vi[0] += 1
            return si.griffin_lim(
                v, max_iter=iters, tol=0.0, verbose=False, window=win
            )

        # Parity first (same input, 100 vs 101 iters is not comparable, so
        # compare one fixed 100-iter run traced under each mode via a shape
        # nudge: pad the batch? -> simplest: compare final SC instead).
        for mode, (i_lo, i_hi) in MODES.items():
            _readback(run(mode, i_lo))
            _readback(run(mode, i_hi))
        marg = {m: [] for m in MODES}
        for _ in range(rounds):
            for mode, (i_lo, i_hi) in MODES.items():
                t0 = time.perf_counter()
                _readback(run(mode, i_lo))
                t_lo = time.perf_counter() - t0
                t0 = time.perf_counter()
                _readback(run(mode, i_hi))
                t_hi = time.perf_counter() - t0
                marg[mode].append((i_hi - i_lo) / (t_hi - t_lo))
        out = {"case": label}
        for mode in MODES:
            ms = sorted(marg[mode])
            out[mode + "_it_s"] = round(ms[len(ms) // 2], 1)
        out["speedup"] = round(out["radix_it_s"] / out["naive_it_s"], 3)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
