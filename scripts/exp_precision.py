"""Chip experiment: GL fused-kernel dot-scheme sweep (speed + quality gate).

Measures, per precision scheme, the marginal it/s (400-vs-100-iter difference,
removing the ~65 ms RPC overhead) and the 1000-iteration spectral convergence
(quality gate: within 1e-3 dB of the HIGHEST/torch trajectory, -20.0786 dB on
this signal).  Prints one JSON line per scheme.  Run alone on the chip.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import specinv_tpu as si  # noqa: E402
from bench import N_FFT, make_signal  # noqa: E402
from specinv_tpu.config import canonicalize  # noqa: E402
from specinv_tpu.ops import stft as stft_ops  # noqa: E402

P = jax.lax.Precision


def main():
    x = make_signal()
    window = np.hanning(N_FFT + 1)[:-1].astype(np.float32)
    cfg, w = canonicalize(N_FFT // 2 + 1, np.float32, window=window)
    wj = jnp.asarray(w)
    mag_tm = jnp.abs(stft_ops.stft(jnp.asarray(x), cfg, wj))
    mag = jnp.swapaxes(mag_tm, -1, -2)
    variants = [mag * (1 + 1e-6 * i) for i in range(8)]
    for m in variants:
        np.asarray(m)
    vi = [0]

    def run(iters, backend, precision):
        m = variants[vi[0] % len(variants)]
        vi[0] += 1
        return si.griffin_lim(
            m, max_iter=iters, tol=0.0, verbose=False, window=window,
            backend=backend, precision=precision,
        )

    def timed(iters, backend, precision):
        np.asarray(run(iters, backend, precision))  # compile + warmup
        ts = []
        for _ in range(3):
            t0 = time.perf_counter()
            np.asarray(run(iters, backend, precision))
            ts.append(time.perf_counter() - t0)
        return min(ts)

    def quality(backend, precision, iters=1000):
        y = si.griffin_lim(
            mag, max_iter=iters, tol=0.0, verbose=False, window=window,
            backend=backend, precision=precision,
        )
        recon = jnp.abs(stft_ops.stft(y, cfg, wj))
        return float(si.sc(recon, mag_tm))

    cases = [
        ("pallas", P.HIGH, "pallas HIGH (3-pass, current default)"),
        ("pallas", "bf16x2", "pallas bf16x2 (drop data-lo)"),
        ("pallas", "bf16x2t", "pallas bf16x2t (drop matrix-lo)"),
        ("pallas", P.DEFAULT, "pallas 1-pass (floor reference)"),
        ("matmul", P.HIGH, "xla matmul HIGH (rival path)"),
    ]
    for backend, prec, label in cases:
        try:
            t100 = timed(100, backend, prec)
            t400 = timed(400, backend, prec)
            marginal = 300.0 / max(t400 - t100, 1e-9)
            sc1000 = quality(backend, prec)
            print(json.dumps({
                "label": label,
                "per_call_100": round(100.0 / t100, 1),
                "marginal_it_s": round(marginal, 1),
                "us_per_iter": round(1e6 / marginal, 1),
                "sc_1000_db": round(sc1000, 4),
            }), flush=True)
        except Exception as e:  # noqa: BLE001
            print(json.dumps({"label": label, "error": repr(e)[:300]}), flush=True)


if __name__ == "__main__":
    main()
