"""Post-radix re-tune of the RTISI fused-kernel chunk-row bound (one chip).

`rtisi_la._KERNEL_CHUNK_ROWS = 64` was calibrated with the naive m-point
stage (benchmarks.md "Batched RTISI-LA": 64-row chunks +20% over one
256-row launch at B=64).  The radix m-stage changed the kernel's VPU/VMEM
balance, so re-measure the bound at B=64 on the flagship config
(n_fft=2048, hann, look_ahead=3, 25 inner iters) with the exp_blockt
interleaved round-robin methodology (marginal 40 s - 10 s differencing,
medians).  Run alone.

Usage: python scripts/exp_rtisi_chunk.py [--rounds N]
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

SR = 22050
N_FFT = 2048
B = 64
LA = 3
INNER = 25
CHUNK_ROWS = (64, 128, 256)


def main():
    rounds = 4
    if "--rounds" in sys.argv:
        rounds = int(sys.argv[sys.argv.index("--rounds") + 1])

    rng = np.random.default_rng(3)
    win = np.hanning(N_FFT + 1)[:-1].astype(np.float32)
    cfg, w = canonicalize(N_FFT // 2 + 1, np.float32, window=win)
    wj = jnp.asarray(w)

    mags = {}
    for secs in (10, 40):
        clips = rng.standard_normal((B, SR * secs)).astype(np.float32)
        mags[secs] = jnp.swapaxes(
            jnp.abs(stft_ops.stft(jnp.asarray(clips), cfg, wj)), -1, -2
        )
        _readback(mags[secs])
    frames = {s: int(mags[s].shape[-1]) + LA for s in mags}

    def run(secs, chunk_rows):
        # Scalar reduction before readback: a B=64 x 40 s waveform is
        # ~225 MB and would measure the tunnel link, not the chip.
        y = si.RTISI_LA(
            mags[secs], look_ahead=LA, max_iter=INNER, verbose=False,
            window=win, backend="pallas4", chunk_rows=chunk_rows,
        )
        return jnp.sum(y * y)

    # compile + warm every variant first (chunk_rows is a static jit arg)
    ok = []
    for cr in CHUNK_ROWS:
        try:
            _readback(run(10, cr))
            _readback(run(40, cr))
            ok.append(cr)
        except Exception as exc:  # noqa: BLE001
            print(json.dumps({"chunk_rows": cr, "error": str(exc)[:160]}),
                  flush=True)

    deltas = {cr: [] for cr in ok}
    for _ in range(rounds):
        for cr in ok:
            t0 = time.perf_counter(); _readback(run(10, cr)); t10 = time.perf_counter() - t0
            t0 = time.perf_counter(); _readback(run(40, cr)); t40 = time.perf_counter() - t0
            deltas[cr].append(t40 - t10)
    dframes = frames[40] - frames[10]
    for cr in ok:
        d = sorted(deltas[cr])[len(deltas[cr]) // 2]
        print(json.dumps({
            "B": B, "chunk_rows": cr, "chunks": -(-B * (LA + 1) // cr),
            "marginal_frames_per_s_aggregate": round(B * dframes / d, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
