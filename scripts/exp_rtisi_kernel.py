"""Fused-kernel RTISI-LA serving A/B on one chip.

Interleaved A/B (same-session, round-robin, median of marginal deltas) of
``backend='pallas4'`` (fused refine kernel, row-bounded batch chunking) vs
the XLA scan backends at B in argv (default 1,16,64) on the flagship config
(n_fft=2048, hann, look_ahead=3, 25 inner iters).  Marginal rates by
differencing 10 s vs 2.5 s targets to cancel the tunnel RPC overhead.
Run alone (never concurrently with the CPU test suite).

Usage: python scripts/exp_rtisi_kernel.py [B ...] [--backends a,b] [--rounds N]
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
N_FFT = 2048

def main():
    argv = sys.argv[1:]
    backends = ["pallas4", "matmul"]
    rounds = 5
    secs = (2.5, 10.0)
    kpls = [None]
    bs = []
    i = 0
    while i < len(argv):
        if argv[i] == "--backends":
            backends = argv[i + 1].split(",")
            i += 2
        elif argv[i] == "--kpl":
            # frames_per_launch variants (pallas4 only); 0 = library default
            kpls = [
                None if s in ("0", "auto") else int(s)
                for s in argv[i + 1].split(",")
            ]
            i += 2
        elif argv[i] == "--rounds":
            rounds = int(argv[i + 1])
            i += 2
        elif argv[i] == "--secs":
            # Pick the pair so the marginal delta dwarfs tunnel jitter: at
            # ~70k frames/s a 10-2.5 s delta is ~4.6 ms against ~65 ms RPC
            # calls that drift 1.5-2x — use e.g. --secs 10,40 there.
            secs = tuple(float(s) for s in argv[i + 1].split(","))
            i += 2
        else:
            bs.append(int(argv[i]))
            i += 1
    if not bs:
        bs = [1, 16, 64]

    rng = np.random.default_rng(0)
    win = np.hanning(N_FFT + 1)[:-1].astype(np.float32)
    cfg, w = canonicalize(N_FFT // 2 + 1, np.float32, window=win)
    wj = jnp.asarray(w)

    for B in bs:
        mags = {}
        for sec in secs:
            clips = rng.standard_normal((B, int(SR * sec))).astype(np.float32)
            m = jnp.abs(stft_ops.stft(jnp.asarray(clips), cfg, wj))
            mags[sec] = [
                jnp.swapaxes(m, -1, -2) * (1 + 1e-6 * k) for k in range(4)
            ]
            for v in mags[sec]:
                _readback(v)
        frames = {sec: int(mags[sec][0].shape[-1]) for sec in mags}
        vi = [0]

        def run(sec, backend, kpl):
            # Reduce to one scalar before readback: a (64, 220500) waveform
            # is ~56 MB through the ~14 MB/s tunnel, which would dominate
            # the marginal delta and measure the link, not the chip.
            v = mags[sec][vi[0] % 4]
            vi[0] += 1
            y = si.RTISI_LA(
                v, look_ahead=3, max_iter=25,
                verbose=False, window=win, backend=backend,
                frames_per_launch=kpl if backend == "pallas4" else None,
            )
            return jnp.sum(y)

        variants = [
            (bk, kpl)
            for bk in backends
            for kpl in (kpls if bk == "pallas4" else [None])
        ]
        # warm every (sec, variant)
        for var in variants:
            for sec in secs:
                _readback(run(sec, *var))
        deltas = {var: [] for var in variants}
        for _ in range(rounds):
            for var in variants:
                t0 = time.perf_counter()
                _readback(run(secs[0], *var))
                ts = time.perf_counter() - t0
                t0 = time.perf_counter()
                _readback(run(secs[1], *var))
                tl = time.perf_counter() - t0
                deltas[var].append(tl - ts)
        dframes = frames[secs[1]] - frames[secs[0]]
        for var in variants:
            bk, kpl = var
            d = sorted(deltas[var])[len(deltas[var]) // 2]
            agg = B * dframes / d
            print(json.dumps({
                "batch": B,
                "backend": bk,
                "frames_per_launch": kpl,
                "marginal_frames_per_s_aggregate": round(agg, 1),
                "per_stream": round(agg / B, 1),
                "realtime_x_per_stream": round(
                    (agg / B) * cfg.hop_length / SR, 1
                ),
            }), flush=True)


if __name__ == "__main__":
    main()
