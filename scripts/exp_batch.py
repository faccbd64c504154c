"""Batched-occupancy sweep on one chip (VERDICT r1 item 3 / BASELINE cfg 5).

Griffin-Lim 100 fixed iterations (fullrun kernel via backend=auto), 2 s
22.05 kHz clips, batch x n_fft sweep.  Reports marginal per-iteration rate
(400-100 differencing) and clip-iteration throughput.  Run alone.
"""
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

SR = 22050
SECONDS = 2


def main():
    rng = np.random.default_rng(1)
    for n_fft in (512, 1024, 2048, 4096):
        for B in (1, 4, 16, 64):
            try:
                clips = rng.standard_normal((B, SR * SECONDS)).astype(np.float32)
                win = np.hanning(n_fft + 1)[:-1].astype(np.float32)
                cfg, w = canonicalize(n_fft // 2 + 1, np.float32, window=win)
                m = jnp.swapaxes(
                    jnp.abs(stft_ops.stft(jnp.asarray(clips), cfg, jnp.asarray(w))),
                    -1, -2,
                )
                variants = [m * (1 + 1e-6 * i) for i in range(8)]
                for v in variants:
                    np.asarray(v)
                vi = [0]

                def run(iters):
                    v = variants[vi[0] % len(variants)]
                    vi[0] += 1
                    return si.griffin_lim(
                        v, max_iter=iters, tol=0.0, verbose=False, window=win,
                    )

                np.asarray(run(100))
                np.asarray(run(400))
                ts = []
                for _ in range(2):
                    t0 = time.perf_counter(); np.asarray(run(100)); t100 = time.perf_counter() - t0
                    t0 = time.perf_counter(); np.asarray(run(400)); t400 = time.perf_counter() - t0
                    ts.append((t100, t400))
                t100 = min(t[0] for t in ts); t400 = min(t[1] for t in ts)
                marg = 300.0 / max(t400 - t100, 1e-9)
                print(json.dumps({
                    "n_fft": n_fft, "batch": B,
                    "marginal_it_s": round(marg, 1),
                    "clip_it_s": round(marg * B, 1),
                    "per_call_100_ms": round(t100 * 1e3, 1),
                    "audio_per_call_s": B * SECONDS,
                }), flush=True)
            except Exception as e:  # noqa: BLE001
                print(json.dumps({
                    "n_fft": n_fft, "batch": B, "error": repr(e)[:200],
                }), flush=True)


if __name__ == "__main__":
    main()
