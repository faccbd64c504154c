"""Round-5: hardware A/B of the hop-row fast repad vs the flat fallback.

Interleaved same-session marginals (min-of-rounds over a 20k-iter
contrast) on the public GL north-star path:

  fast_reflect — default engine (hop-row repad: roll + banded 0/1 dots)
  flat_reflect — _fast_repad_plan forced to None (old flat-strip repad)
  fast_circular / flat_circular — same A/B for wrap mode
  const        — pad_mode='constant' (repad-free floor)

Expected: fast_reflect within ~1-2 us/iter of const (vs ~6-12 us for
flat — scripts/exp_r5_gap.py attribution).
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
REAL_PLAN = fullrun_lane._fast_repad_plan


def make_runner(pad_mode, fast, eva):
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
        # monkeypatch at TRACE time only; eva busts the jit cache per variant
        fullrun_lane._fast_repad_plan = (
            REAL_PLAN if fast else (lambda *a, **k: None))
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
            fullrun_lane._fast_repad_plan = REAL_PLAN

    return run


def main():
    rounds = int(sys.argv[sys.argv.index("--rounds") + 1]) \
        if "--rounds" in sys.argv else 5
    variants = {
        "fast_reflect": make_runner("reflect", True, 30),
        "flat_reflect": make_runner("reflect", False, 31),
        "fast_circular": make_runner("circular", True, 32),
        "flat_circular": make_runner("circular", False, 33),
        "const": make_runner("constant", True, 34),
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
