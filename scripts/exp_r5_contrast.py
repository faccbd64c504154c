"""Round-5: does the measured GL marginal depend on contrast length?

Same-session interleaved A/B: marginal from (1k vs 21k) iters vs
(1k vs 131k) iters on the public scalar-reduced path, min-of-rounds
estimator.  If the long contrast reads systematically slower, the chip's
sustained rate differs from its burst rate (or launch length carries a
cost) and bench.py's contrast sizing needs to reflect what we claim.
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

SR, N_FFT = 22050, 2048


def main():
    rounds = int(sys.argv[sys.argv.index("--rounds") + 1]) if "--rounds" in sys.argv else 5
    rng = np.random.default_rng(0)
    t = np.linspace(0, 10, SR * 10, dtype=np.float32)
    x = (np.sin(2 * np.pi * 440 * t) + 0.1 * rng.standard_normal(t.size)).astype(np.float32)
    window = np.hanning(N_FFT + 1)[:-1].astype(np.float32)
    cfg, w = canonicalize(N_FFT // 2 + 1, np.float32, window=window)
    wj = jnp.asarray(w)
    mag = jnp.swapaxes(jnp.abs(stft_ops.stft(jnp.asarray(x), cfg, wj)), -1, -2)

    def f(it, m):
        return jnp.sum(si.griffin_lim(
            m, max_iter=it, tol=0.0, verbose=False, window=window,
            backend="pallas4"))

    g = jax.jit(f, static_argnums=0)

    def run(it):
        for k in range(4):
            t0 = time.perf_counter()
            try:
                float(np.asarray(g(it, mag)))
                return time.perf_counter() - t0
            except Exception:  # noqa: BLE001
                if k == 3:
                    raise
                time.sleep(2.0)

    counts = (1000, 21000, 81000, 131000)
    for it in counts:
        run(it)  # compile + warmup
    ts = {it: [] for it in counts}
    for r in range(rounds):
        for it in counts:
            ts[it].append(run(it))
        print(f"# round {r} done", flush=True)
    base = min(ts[1000])
    for it in counts[1:]:
        d = min(ts[it]) - base
        print(json.dumps({
            "contrast": it - 1000,
            "us_per_iter": round(d / (it - 1000) * 1e6, 2),
            "t_min_s": round(min(ts[it]), 3),
            "t_all": [round(v, 3) for v in ts[it]],
        }), flush=True)


if __name__ == "__main__":
    main()
