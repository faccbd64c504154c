"""Batched RTISI-LA occupancy on one chip.

RTISI-LA is sequential over output frames by construction (causality), so a
single stream is latency-bound (~20 us per inner refinement of a tiny
(la+1, n_fft) problem).  Batching clips multiplies the DFT row count without
adding scan steps — this measures the aggregate frames/s at B in {1, 4, 16}
on the flagship config (n_fft=2048, hann, look_ahead=3, 25 inner iters,
10 s clips).  Marginal rates by differencing 10 s vs 2.5 s targets to cancel
the RPC overhead.  Run alone.
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

SR = 22050
N_FFT = 2048


def _readback(a, tries=3):
    for attempt in range(tries):
        try:
            return np.asarray(a)
        except Exception:  # noqa: BLE001
            if attempt == tries - 1:
                raise
            time.sleep(2.0)


def main():
    rng = np.random.default_rng(0)
    win = np.hanning(N_FFT + 1)[:-1].astype(np.float32)
    cfg, w = canonicalize(N_FFT // 2 + 1, np.float32, window=win)
    wj = jnp.asarray(w)

    for B in (1, 4, 16):
        mags = {}
        for sec in (2.5, 10.0):
            clips = rng.standard_normal((B, int(SR * sec))).astype(np.float32)
            m = jnp.abs(stft_ops.stft(jnp.asarray(clips), cfg, wj))
            mags[sec] = [
                jnp.swapaxes(m, -1, -2) * (1 + 1e-6 * i) for i in range(4)
            ]
            for v in mags[sec]:
                _readback(v)
        frames = {sec: int(mags[sec][0].shape[-1]) for sec in mags}
        vi = [0]

        def run(sec):
            v = mags[sec][vi[0] % 4]
            vi[0] += 1
            return si.RTISI_LA(
                v, look_ahead=3, max_iter=25, verbose=False, window=win
            )

        for sec in (2.5, 10.0):
            _readback(run(sec))
        deltas = []
        for _ in range(3):
            t0 = time.perf_counter(); _readback(run(2.5)); ts = time.perf_counter() - t0
            t0 = time.perf_counter(); _readback(run(10.0)); tl = time.perf_counter() - t0
            deltas.append(tl - ts)
        d = sorted(deltas)[1]
        dframes = frames[10.0] - frames[2.5]
        agg = B * dframes / d
        print(json.dumps({
            "batch": B,
            "marginal_frames_per_s_aggregate": round(agg, 1),
            "per_stream": round(agg / B, 1),
            "realtime_x_per_stream": round((agg / B) * cfg.hop_length / SR, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
