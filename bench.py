"""Benchmark: Griffin-Lim iteration throughput on the BASELINE north-star config.

North star (BASELINE.json): Griffin-Lim iters/sec/chip, n_fft=2048, hann,
mono 10 s 22.05 kHz clip.  The reference publishes no numbers (README TODO),
so the baseline is the torch reference measured on this host's CPU (cached in
``baselines/torch_reference.json``; delete to re-measure).

Prints ONE JSON line:
  {"metric": ..., "value": N, "unit": ..., "vs_baseline": N}
"""
import json
import os
import sys
import time

import numpy as np

BASELINE_PATH = os.path.join(os.path.dirname(__file__), "baselines", "torch_reference.json")

N_FFT = 2048
SR = 22050
SECONDS = 10
ITERS = 100


def make_signal():
    rng = np.random.default_rng(0)
    t = np.linspace(0, SECONDS, SR * SECONDS, dtype=np.float32)
    x = (
        np.sin(2 * np.pi * 440 * t)
        + 0.5 * np.sin(2 * np.pi * (220 + 30 * t) * t)
        + 0.1 * rng.standard_normal(t.size)
    ).astype(np.float32)
    return x


def measure_torch_reference():
    """Run the torch reference (CPU — the only hardware it has here) on the
    north-star config and record iters/sec."""
    import torch

    sys.path.insert(0, "/root/reference")
    from torch_specinv.methods import griffin_lim as ref_gl

    x = torch.from_numpy(make_signal())
    window = torch.hann_window(N_FFT)
    spec = torch.stft(x, N_FFT, window=window, return_complex=True).abs()
    # warmup
    ref_gl(spec, max_iter=5, tol=0.0, verbose=False, window=window)
    t0 = time.perf_counter()
    ref_gl(spec, max_iter=ITERS, tol=0.0, verbose=False, window=window)
    dt = time.perf_counter() - t0
    result = {
        "iters_per_sec": ITERS / dt,
        "hardware": "host CPU (torch)",
        "config": f"griffin_lim n_fft={N_FFT} {SECONDS}s@{SR}Hz {ITERS} iters",
    }
    os.makedirs(os.path.dirname(BASELINE_PATH), exist_ok=True)
    with open(BASELINE_PATH, "w") as f:
        json.dump(result, f, indent=1)
    return result


def get_baseline():
    if os.path.exists(BASELINE_PATH):
        with open(BASELINE_PATH) as f:
            return json.load(f)
    return measure_torch_reference()


def main():
    baseline = get_baseline()

    import jax
    import jax.numpy as jnp

    import specinv_tpu as si
    from specinv_tpu.config import canonicalize
    from specinv_tpu.ops import stft as stft_ops

    x = make_signal()
    window = np.hanning(N_FFT + 1)[:-1].astype(np.float32)
    cfg, w = canonicalize(N_FFT // 2 + 1, np.float32, window=window)
    wj = jnp.asarray(w)
    mag_tm = jnp.abs(stft_ops.stft(jnp.asarray(x), cfg, wj))
    mag = jnp.swapaxes(mag_tm, -1, -2)  # (F, T) public layout

    def timed(backend, iters=ITERS, reps=3):
        def run():
            return si.griffin_lim(
                mag, max_iter=iters, tol=0.0, verbose=False, window=window,
                backend=backend,
            )

        jax.block_until_ready(run())  # compile + warmup
        t0 = time.perf_counter()
        for _ in range(reps):
            y = run()
        jax.block_until_ready(y)
        dt = (time.perf_counter() - t0) / reps
        return iters / dt

    results, sustained = {}, {}
    for backend in ("fft", "matmul", "pallas"):
        try:
            results[backend] = timed(backend)
            sustained[backend] = timed(backend, iters=1000, reps=1)
        except Exception as e:  # pragma: no cover
            print(f"# backend {backend} failed: {e}", file=sys.stderr)
    backend = max(results, key=results.get)
    ips = results[backend]

    # quality check on the winning backend
    y = si.griffin_lim(
        mag, max_iter=ITERS, tol=0.0, verbose=False, window=window, backend=backend
    )
    recon = jnp.abs(stft_ops.stft(y, cfg, wj))
    final_sc = float(si.sc(recon, mag_tm))

    print(
        json.dumps(
            {
                "metric": "griffin_lim_iters_per_sec",
                "value": round(ips, 2),
                "unit": "iters/s (n_fft=2048, 10s clip, 1 chip)",
                "vs_baseline": round(ips / baseline["iters_per_sec"], 2),
                "detail": {
                    "backend": backend,
                    "per_backend_iters_per_sec": {
                        k: round(v, 2) for k, v in results.items()
                    },
                    "sustained_1000iter_iters_per_sec": {
                        k: round(v, 2) for k, v in sustained.items()
                    },
                    "final_sc_db": round(final_sc, 3),
                    "baseline": baseline,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    main()
