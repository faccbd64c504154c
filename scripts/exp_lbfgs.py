"""Where does L-BFGS wall time go? (one real chip)

Times the BASELINE config 4 (log-mel(128) inversion of a 10 s clip,
10 outer x 20 inner iterations) across: strong-Wolfe vs fixed-step,
history_size 100 vs 10, and a raw value_and_grad microbench — to split
line-search eval count, two-loop/rolling-buffer cost, and per-eval cost.
Interleaved rounds, medians.  Run alone.
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


def _readback(a, tries=3):
    for attempt in range(tries):
        try:
            return np.asarray(a)
        except Exception:  # noqa: BLE001
            if attempt == tries - 1:
                raise
            time.sleep(2.0)


def main():
    rng = np.random.default_rng(0)
    x = (np.sin(2 * np.pi * 440 * np.linspace(0, 10, SR * 10))
         + 0.1 * rng.standard_normal(SR * 10)).astype(np.float32)
    window = np.hanning(2049)[:-1].astype(np.float32)
    mel_fn = log_mel_transform(n_fft=2048, n_mels=128, sample_rate=SR,
                               window=window)
    mel = mel_fn(jnp.asarray(x))
    _readback(mel)

    variants = {
        "wolfe_h100": dict(line_search_fn="strong_wolfe", history_size=100),
        "wolfe_h10": dict(line_search_fn="strong_wolfe", history_size=10),
        "fixed_h100": dict(line_search_fn=None, lr=0.5, history_size=100),
        "fixed_h10": dict(line_search_fn=None, lr=0.5, history_size=10),
    }

    def run(name, seed=0):
        kw = variants[name]
        return si.L_BFGS(mel, mel_fn, samples=(x.size,), outer_max_iter=10,
                         max_iter=20, tol=0.0, verbose=False, seed=seed,
                         **kw)

    # raw eval microbench: 64 chained value_and_grad calls in one jit
    vg = jax.value_and_grad(
        lambda z: jnp.mean((mel_fn(z) - mel) ** 2)
    )

    @jax.jit
    def chain_evals(z, n):
        def body(_, carry):
            zz, acc = carry
            v, g = vg(zz)
            return zz + 1e-12 * g, acc + v

        return jax.lax.fori_loop(0, n, body, (z, jnp.float32(0.0)))[1]

    z0 = jnp.asarray(rng.standard_normal(x.size).astype(np.float32) * 1e-6)
    _readback(chain_evals(z0, 8))
    _readback(chain_evals(z0, 72))
    for name in variants:
        _readback(run(name))

    deltas = {name: [] for name in variants}
    evals = []
    for r in range(5):
        for name in variants:
            t0 = time.perf_counter()
            _readback(run(name, seed=r))
            deltas[name].append(time.perf_counter() - t0)
        t0 = time.perf_counter(); _readback(chain_evals(z0, 8)); t8 = time.perf_counter() - t0
        t0 = time.perf_counter(); _readback(chain_evals(z0, 72)); t72 = time.perf_counter() - t0
        evals.append((t72 - t8) / 64)

    for name in variants:
        d = sorted(deltas[name])[2]
        print(json.dumps({
            "variant": name, "s_per_call": round(d, 4),
            "ms_per_inner_iter": round(1e3 * d / 200, 3),
        }), flush=True)
    ev = sorted(evals)[2]
    print(json.dumps({"variant": "raw_value_and_grad",
                      "ms_per_eval": round(1e3 * ev, 3)}), flush=True)


if __name__ == "__main__":
    main()
