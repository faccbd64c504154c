"""Round-5: L-BFGS compact-direction bandwidth — measured GB/s vs HBM roof,
and the bf16-history (history_dtype) win.

BASELINE config 4 problem (log-mel(128) inversion of a 10 s clip,
n = 220,500 samples), fixed-step, history 100, direction='compact'.
Interleaved same-session marginals: each variant is timed at 10 and 40
outer steps (x20 inner) and differenced, min-of-rounds — cancels compile +
RPC and the fori-driver prologue.

Bytes model per inner iteration (see benchmarks.md L-BFGS): the compact
direction streams the (m, n) S and Y buffers ~6x per accepted step
(gram row+col, S.u, alpha^T Y, Y r0, c^T S) = 6 x m x n x itemsize
~= 529 MB f32 / 265 MB bf16 at m=100, n=220500.  v5e HBM ~819 GB/s.
"""
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import specinv_tpu as si  # noqa: E402
from specinv_tpu.ops.mel import log_mel_transform  # noqa: E402

SR = 22050
M = 100
N = SR * 10
INNER = 20


def main():
    rounds = int(sys.argv[sys.argv.index("--rounds") + 1]) \
        if "--rounds" in sys.argv else 5
    rng = np.random.default_rng(0)
    x = (np.sin(2 * np.pi * 440 * np.linspace(0, 10, SR * 10))
         + 0.1 * rng.standard_normal(N)).astype(np.float32)
    window = np.hanning(2049)[:-1].astype(np.float32)
    mel_fn = log_mel_transform(n_fft=2048, n_mels=128, sample_rate=SR,
                               window=window)
    mel = mel_fn(jnp.asarray(x))

    def make(name, **kw):
        def run(outer):
            return jnp.sum(si.L_BFGS(
                mel, mel_fn, samples=(N,), outer_max_iter=outer,
                max_iter=INNER, tol=0.0, verbose=False, seed=0,
                line_search_fn=None, lr=0.5, history_size=M, **kw))

        def timed(outer):
            for k in range(4):
                t0 = time.perf_counter()
                try:
                    float(np.asarray(run(outer)))
                    return time.perf_counter() - t0
                except Exception:  # noqa: BLE001
                    if k == 3:
                        raise
                    time.sleep(2.0)

        return timed

    variants = {
        "f32": make("f32"),
        "bf16": make("bf16", history_dtype="bfloat16"),
    }
    lo, hi = 10, 40
    for name, f in variants.items():
        for it in (lo, hi):
            f(it)
        print(f"# warm {name}", flush=True)
    t_lo = {n: [] for n in variants}
    t_hi = {n: [] for n in variants}
    for r in range(rounds):
        for n, f in variants.items():
            t_lo[n].append(f(lo))
            t_hi[n].append(f(hi))
        print(f"# round {r} done", flush=True)
    for name in variants:
        d = min(t_hi[name]) - min(t_lo[name])
        inner_its = (hi - lo) * INNER
        ms = d / inner_its * 1e3
        itemsize = 4 if name == "f32" else 2
        bytes_per_it = 6 * M * N * itemsize
        print(json.dumps({
            "variant": name,
            "ms_per_inner_it": round(ms, 3),
            "inner_it_per_s": round(inner_its / d, 1),
            "streamed_MB_per_it": round(bytes_per_it / 1e6, 1),
            "achieved_GBps": round(bytes_per_it / (d / inner_its) / 1e9, 1),
            "pct_of_819GBps_roof": round(
                100 * bytes_per_it / (d / inner_its) / 819e9, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
