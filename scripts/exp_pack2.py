"""Clip-packing A/B at m >= 16 with the RADIX m-point stage (one real chip).

Round-3 follow-up: the shipped packing policy (`gl_fullrun4.PACK_MAX_M = 8`)
was calibrated with the naive O(m^2) m-point stage, where the VPU stage
dominated at n_fft >= 2048 and packing measured neutral-to-negative.  The
radix m-stage cut that VPU term ~4x (m=16) / ~6x (m=32), so the old
measurement no longer describes the shipped kernel — re-measure packing at
n_fft = 2048 and 4096 under the exp_blockt interleaved round-robin
methodology (marginal 400-100 differencing, median across rounds).

Run alone.  Usage: python scripts/exp_pack2.py [--rounds N]
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
SECONDS = 2
B = 16
CASES = [
    # (n_fft, pack values to interleave)
    (2048, (1, 2, 4)),
    (4096, (1, 2)),
]


def main():
    rounds = 5
    if "--rounds" in sys.argv:
        rounds = int(sys.argv[sys.argv.index("--rounds") + 1])

    rng = np.random.default_rng(7)
    for n_fft, packs in CASES:
        win = np.hanning(n_fft + 1)[:-1].astype(np.float32)
        cfg, w = canonicalize(n_fft // 2 + 1, np.float32, window=win)
        wj = jnp.asarray(w)
        clips = rng.standard_normal((B, SR * SECONDS)).astype(np.float32)
        mag = jnp.swapaxes(
            jnp.abs(stft_ops.stft(jnp.asarray(clips), cfg, wj)), -1, -2
        )
        variants = [mag * (1 + 1e-6 * k) for k in range(8)]
        for v in variants:
            _readback(v)
        vi = [0]

        def run(pack, iters):
            v = variants[vi[0] % 8]
            vi[0] += 1
            return si.griffin_lim(
                v, max_iter=iters, tol=0.0, verbose=False, window=win,
                backend="pallas4", pack=pack,
            )

        # Parity pin: pack must be bitwise-invariant on the same input.
        base = _readback(si.griffin_lim(
            variants[0], max_iter=25, tol=0.0, verbose=False, window=win,
            backend="pallas4", pack=1,
        ))
        ok_packs = []
        for p in packs:
            if p == 1:
                ok_packs.append(p)
                continue
            try:
                y = _readback(si.griffin_lim(
                    variants[0], max_iter=25, tol=0.0, verbose=False,
                    window=win, backend="pallas4", pack=p,
                ))
            except Exception as e:  # noqa: BLE001 — VMEM reject is a finding
                print(json.dumps({
                    "n_fft": n_fft, "pack": p, "status": f"rejected: {e}"[:200]
                }), flush=True)
                continue
            d = float(np.max(np.abs(np.asarray(y) - np.asarray(base))))
            print(json.dumps(
                {"n_fft": n_fft, "pack": p, "max_abs_diff_vs_pack1": d}
            ), flush=True)
            ok_packs.append(p)
        packs = ok_packs

        for p in packs:
            for iters in (100, 400):
                _readback(run(p, iters))
        marg = {p: [] for p in packs}
        for _ in range(rounds):
            for p in packs:
                t0 = time.perf_counter()
                _readback(run(p, 100))
                t100 = time.perf_counter() - t0
                t0 = time.perf_counter()
                _readback(run(p, 400))
                t400 = time.perf_counter() - t0
                marg[p].append(300.0 / (t400 - t100))
        out = {"case": f"n_fft={n_fft} {SECONDS}s B={B}"}
        for p in packs:
            ms = sorted(marg[p])
            out[f"pack{p}_it_s"] = round(ms[len(ms) // 2], 1)
        if len(packs) > 1:
            best = max(packs[1:], key=lambda p: out[f"pack{p}_it_s"])
            out["best_speedup_vs_pack1"] = round(
                out[f"pack{best}_it_s"] / out["pack1_it_s"], 3
            )
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
