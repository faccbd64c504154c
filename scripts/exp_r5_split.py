"""Round-5: hardware A/B of the half-block software pipeline.

Interleaved same-session marginals (min-of-rounds, 20k-iter contrasts) on
the public GL north-star path (n_fft=2048, 10 s clip, B=1):

  split_reflect / whole_reflect — default pad mode, pipeline on/off
  split_const   / whole_const   — repad-free floor, pipeline on/off

The split reorders the block's phases so one half's MXU dots execute
under the other's VPU phases; the overlap probe measured 1.5x per chain
step for two interleaved dot->vpu chains (scripts/exp_r5_overlap.py).

HISTORICAL RECORD: the half-split variant measured +3.2 us/iter (a
regression — halving the Karatsuba leaf-dot row count costs more MXU
pipeline drain than the recovered overlap; benchmarks.md round-5 update)
and was removed from fullrun_lane before it ever landed in a commit, so
its ``_half_split_ok`` valve no longer exists and this script exits with
a pointer here instead of running.  The surviving pipeline experiment
(in-kernel fori, also neutral-or-worse) is scripts/exp_r5_pipe.py, whose
``_pipe_ok`` valve ships disabled and bitwise-pinned by
tests/test_pallas.py::test_lane_pipe_bitwise.
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
from specinv_tpu.ops.pallas import fullrun_lane  # noqa: E402

SR, N_FFT = 22050, 2048
REAL = getattr(fullrun_lane, "_half_split_ok", None)
if REAL is None:
    sys.exit(
        "the half-block split variant was removed from fullrun_lane after "
        "measuring +3.2 us/iter (see module docstring / benchmarks.md "
        "round-5 update); this script is kept as the methodology record"
    )


def make_runner(pad_mode, split, eva):
    rng = np.random.default_rng(0)
    t = np.linspace(0, 10, SR * 10, dtype=np.float32)
    x = (np.sin(2 * np.pi * 440 * t)
         + 0.1 * rng.standard_normal(t.size)).astype(np.float32)
    window = np.hanning(N_FFT + 1)[:-1].astype(np.float32)
    cfg, w = canonicalize(
        N_FFT // 2 + 1, np.float32, window=window, pad_mode=pad_mode)
    mag = jnp.swapaxes(
        jnp.abs(stft_ops.stft(jnp.asarray(x), cfg, jnp.asarray(w))), -1, -2)

    def f(it, m):
        return jnp.sum(si.griffin_lim(
            m, max_iter=it, tol=0.0, verbose=False, window=window,
            backend="pallas4", pad_mode=pad_mode, eva_iter=eva))

    g = jax.jit(f, static_argnums=0)

    def run(it):
        fullrun_lane._half_split_ok = REAL if split else (lambda bt: False)
        try:
            for k in range(4):
                t0 = time.perf_counter()
                try:
                    float(np.asarray(g(it, mag)))
                    return time.perf_counter() - t0
                except Exception:  # noqa: BLE001
                    if k == 3:
                        raise
                    time.sleep(2.0)
        finally:
            fullrun_lane._half_split_ok = REAL

    return run


def main():
    rounds = int(sys.argv[sys.argv.index("--rounds") + 1]) \
        if "--rounds" in sys.argv else 5
    variants = {
        "split_reflect": make_runner("reflect", True, 40),
        "whole_reflect": make_runner("reflect", False, 41),
        "split_const": make_runner("constant", True, 42),
        "whole_const": make_runner("constant", False, 43),
    }
    lo, hi = 1000, 21000
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
    for n in variants:
        d = min(t_hi[n]) - min(t_lo[n])
        print(json.dumps({
            "variant": n,
            "us_per_iter": round(d / (hi - lo) * 1e6, 2),
            "t_lo_min_ms": round(min(t_lo[n]) * 1e3, 1),
            "t_hi_min_ms": round(min(t_hi[n]) * 1e3, 1),
        }), flush=True)


if __name__ == "__main__":
    main()
