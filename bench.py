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


def _readback(y):
    import numpy as _np

    return float(_np.asarray(y).sum())


def full_suite():
    """BASELINE.md configs 2-5: ADMM, RTISI-LA, L-BFGS log-mel, batched sweep.

    Prints a markdown table (meant for benchmarks.md, not the driver)."""
    import time as _t

    import jax
    import jax.numpy as jnp

    import specinv_tpu as si
    from specinv_tpu.config import canonicalize
    from specinv_tpu.ops import stft as stft_ops
    from specinv_tpu.ops.mel import log_mel_transform

    x = make_signal()
    window = np.hanning(N_FFT + 1)[:-1].astype(np.float32)
    cfg, w = canonicalize(N_FFT // 2 + 1, np.float32, window=window)
    wj = jnp.asarray(w)
    mag_tm = jnp.abs(stft_ops.stft(jnp.asarray(x), cfg, wj))
    mag = jnp.swapaxes(mag_tm, -1, -2)

    def timed(label, fn, iters):
        _readback(fn())  # compile + warmup
        t0 = _t.perf_counter()
        _readback(fn())
        t1 = _t.perf_counter() - t0
        print(f"| {label} | {iters / t1:.1f} it/s | {t1:.3f} s/call |")

    print("| config | throughput | wall |")
    print("|---|---|---|")
    timed(
        "ADMM 100 it (auto = four-step fullrun)",
        lambda: si.ADMM(mag, max_iter=100, tol=0.0, verbose=False, window=window),
        100,
    )
    timed(
        "RTISI-LA la=3, 25 inner it",
        lambda: si.RTISI_LA(mag, look_ahead=3, max_iter=25, verbose=False, window=window),
        int(mag.shape[-1]) + 3,
    )
    mel_fn = log_mel_transform(n_fft=N_FFT, n_mels=128, sample_rate=SR, window=window)
    mel = mel_fn(jnp.asarray(x))
    timed(
        "L-BFGS log-mel(128), 10x20 it",
        lambda: si.L_BFGS(mel, mel_fn, samples=(x.size,), outer_max_iter=10,
                          max_iter=20, line_search_fn="strong_wolfe", verbose=False),
        200,
    )
    rng = np.random.default_rng(1)
    for nf in (512, 1024, 2048, 4096):
        clips = rng.standard_normal((16, SR * 2)).astype(np.float32)
        win2 = np.hanning(nf + 1)[:-1].astype(np.float32)
        c2, w2 = canonicalize(nf // 2 + 1, np.float32, window=win2)
        w2j = jnp.asarray(w2)
        m = jnp.swapaxes(jnp.abs(stft_ops.stft(jnp.asarray(clips), c2, w2j)), -1, -2)
        timed(
            f"batched-16 GL 100 it, n_fft={nf}",
            lambda m=m, win2=win2: si.griffin_lim(
                m, max_iter=100, tol=0.0, verbose=False, window=win2
            ),
            100,
        )


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

    # Distinct inputs per timed call, and timing via host readback:
    # block_until_ready returns early on the axon tunnel backend, so only a
    # readback reflects true completion.
    variants = [mag * (1 + 1e-6 * i) for i in range(8)]
    for m in variants:
        np.asarray(m)
    vi = [0]

    def _rb(a, tries=3):
        # the tunnel throws transient UNIMPLEMENTED errors on readbacks
        for k in range(tries):
            try:
                return np.asarray(a)
            except Exception:  # noqa: BLE001
                if k == tries - 1:
                    raise
                time.sleep(2.0)

    def timed(backend, iters):
        def run():
            m = variants[vi[0] % len(variants)]
            vi[0] += 1
            return si.griffin_lim(
                m, max_iter=iters, tol=0.0, verbose=False, window=window,
                backend=backend,
            )

        _rb(run())  # compile + warmup (retries allowed — untimed)
        # A transient readback error must RESTART the measurement, not be
        # absorbed into it (a 2 s retry sleep inside the timed region would
        # silently inflate the sample).
        for k in range(3):
            t0 = time.perf_counter()
            try:
                np.asarray(run())
                return time.perf_counter() - t0
            except Exception:  # noqa: BLE001
                if k == 2:
                    raise
                time.sleep(2.0)

    results, marginal = {}, {}
    for backend in ("fft", "matmul", "pallas", "pallas4"):
        for attempt in range(2):  # axon RPC occasionally drops a compile
            try:
                t100 = min(timed(backend, ITERS) for _ in range(3))
                t400 = min(timed(backend, 4 * ITERS) for _ in range(3))
                results[backend] = ITERS / t100
                # marginal per-iteration rate, net of fixed per-call overhead
                marginal[backend] = (4 * ITERS - ITERS) / max(t400 - t100, 1e-9)
                break
            except Exception as e:  # pragma: no cover
                print(f"# backend {backend} failed (try {attempt}): {e}", file=sys.stderr)
    # Headline = what backend='auto' ships (the four-step whole-run kernel);
    # per-call ranking among the fused kernels is tunnel-RPC jitter, so do
    # not argmax — fall back only if pallas4 failed to run.
    backend = "pallas4" if "pallas4" in results else max(results, key=results.get)
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
                    "marginal_iters_per_sec": {
                        k: round(v, 2) for k, v in marginal.items()
                    },
                    "final_sc_db": round(final_sc, 3),
                    "baseline": baseline,
                    "device": str(jax.devices()[0]),
                },
            }
        )
    )


if __name__ == "__main__":
    if "--full" in sys.argv:
        full_suite()
    else:
        main()
