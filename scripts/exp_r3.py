"""Round-3 interleaved A/B experiments.  Run ALONE on the TPU (1 host CPU:
any concurrent client stretches compiles to minutes).

Phases (pass one or more as argv):
  pack      — clip packing on the batched whole-run kernel (B=16, n_fft=2048)
  occupancy — batched occupancy B x n_fft, interleaved within each n_fft
              (replaces the drift-contaminated serial table, VERDICT r2 #2)
  rtisi     — RTISI stream batching x DFT backend (the fourier rows fix)
  xover     — fft/matmul/matmul4 roundtrip crossover by dot rows (sets the
              resolve_backend auto policy; traced-count fori chain so each
              point is one compile, marginal 100-20 differencing)

Methodology: compile every variant of a phase first, then run timed rounds
round-robin over the variants — tunnel-overhead drift (1.5-2x within a
session) hits all variants equally, and the median over rounds is reported.
Marginal per-iteration rates difference 400 vs 100 iterations within the
same round.
"""
import json
import statistics
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

import specinv_tpu as si  # noqa: E402
from specinv_tpu.config import canonicalize  # noqa: E402
from specinv_tpu.ops import stft as stft_ops  # noqa: E402

SR = 22050


def _rb(a, tries=4):
    for k in range(tries):
        try:
            return np.asarray(a)
        except Exception:  # noqa: BLE001
            if k == tries - 1:
                raise
            time.sleep(1.0 + 2.0 * k)


def make_mag(B, seconds, n_fft, seed=1):
    rng = np.random.default_rng(seed)
    clips = rng.standard_normal((B, SR * seconds)).astype(np.float32)
    win = np.hanning(n_fft + 1)[:-1].astype(np.float32)
    cfg, w = canonicalize(n_fft // 2 + 1, np.float32, window=win)
    m = jnp.swapaxes(
        jnp.abs(stft_ops.stft(jnp.asarray(clips), cfg, jnp.asarray(w))), -1, -2
    )
    variants = [m * (1 + 1e-6 * i) for i in range(6)]
    for v in variants:
        _rb(v)
    return variants, win


def interleave_marginal(runners, rounds=3):
    """runners: {name: fn(iters) -> device array}.  Compiles all variants,
    then measures (t100, t400) per variant per round, round-robin.
    Returns {name: {"marginal_it_s", "per_call_100_ms"}} from medians."""
    for name, fn in runners.items():
        t0 = time.time()
        _rb(fn(100))
        _rb(fn(400))
        print(f"# compiled {name} in {time.time() - t0:.0f}s", flush=True)
    samples = {name: [] for name in runners}
    for _ in range(rounds):
        for name, fn in runners.items():
            t0 = time.perf_counter()
            _rb(fn(100))
            t100 = time.perf_counter() - t0
            t0 = time.perf_counter()
            _rb(fn(400))
            t400 = time.perf_counter() - t0
            samples[name].append((t100, t400))
    out = {}
    for name, ss in samples.items():
        marg = statistics.median(300.0 / max(t4 - t1, 1e-9) for t1, t4 in ss)
        t100 = statistics.median(t1 for t1, _ in ss)
        out[name] = {
            "marginal_it_s": round(marg, 1),
            "per_call_100_ms": round(t100 * 1e3, 1),
        }
    return out


def phase_pack():
    from specinv_tpu.ops.pallas import gl_fullrun4

    B, seconds, n_fft = 16, 2, 2048
    variants, win = make_mag(B, seconds, n_fft)
    vi = [0]
    cfg, _ = canonicalize(n_fft // 2 + 1, np.float32)
    T = int(variants[0].shape[-1])
    auto_k = gl_fullrun4.choose_pack(cfg, T, B)
    print(f"# T={T} frames, choose_pack -> {auto_k}", flush=True)

    def runner(pack):
        def fn(iters):
            v = variants[vi[0] % len(variants)]
            vi[0] += 1
            return si.griffin_lim(
                v, max_iter=iters, tol=0.0, verbose=False,
                window=np.hanning(n_fft + 1)[:-1].astype(np.float32),
                backend="pallas4", pack=pack,
            )
        return fn

    # On-chip parity first: Mosaic-compiled packed kernel vs pack=1 on the
    # SAME input (interpret-mode parity is pinned in tests; this checks the
    # compiled lowering).
    fixed = variants[0]
    win = np.hanning(n_fft + 1)[:-1].astype(np.float32)
    ys = {}
    for k in (1, 4):
        ys[k] = _rb(si.griffin_lim(
            fixed, max_iter=20, tol=0.0, verbose=False, window=win,
            backend="pallas4", pack=k,
        ))
    err = float(np.abs(ys[4] - ys[1]).max())
    print(f"# on-chip pack parity max|diff| = {err:.3e}", flush=True)
    assert err == 0.0, "packed kernel diverges from pack=1 on chip"

    # pack=16 exceeds the streamed VMEM ceiling at this geometry; 1-8 only
    runners = {f"pack={k}": runner(k) for k in (1, 2, 4, 8)}
    res = interleave_marginal(runners)
    for name, r in res.items():
        r["clip_it_s"] = round(r["marginal_it_s"] * B, 1)
        print(json.dumps({"phase": "pack", "variant": name, "B": B,
                          "n_fft": n_fft, **r}), flush=True)


def phase_occupancy():
    for n_fft in (512, 1024, 2048, 4096):
        runners = {}
        wins = {}
        for B in (1, 4, 16):
            variants, win = make_mag(B, 2, n_fft, seed=B)
            wins[B] = (variants, win, [0])

            def fn(iters, B=B):
                variants, win, vi = wins[B]
                v = variants[vi[0] % len(variants)]
                vi[0] += 1
                return si.griffin_lim(
                    v, max_iter=iters, tol=0.0, verbose=False, window=win
                )

            runners[f"B={B}"] = fn
        res = interleave_marginal(runners)
        for name, r in res.items():
            B = int(name.split("=")[1])
            r["clip_it_s"] = round(r["marginal_it_s"] * B, 1)
            print(json.dumps({"phase": "occupancy", "n_fft": n_fft,
                              "variant": name, **r}), flush=True)


def phase_rtisi():
    n_fft, la, inner = 2048, 3, 25
    out = {}
    runners = {}
    state = {}
    for B in (1, 16, 64):
        variants, win = make_mag(B, 10, n_fft, seed=B)
        steps = int(variants[0].shape[-1]) + la
        for backend in ("fft", "matmul", "matmul4"):
            if B == 1 and backend == "matmul":
                continue  # rows=4: direct-table streaming can't amortize
            if B > 1 and backend == "fft":
                continue  # known-slow at batched rows; save the compile
            if B == 64 and backend == "matmul":
                continue  # 384s compile at B=16 already; contrast at 16 suffices
            name = f"B={B},{backend}"
            state[name] = (variants, win, [0], steps, B)

            def fn(_iters, name=name, backend=backend):
                variants, win, vi, _steps, _B = state[name]
                v = variants[vi[0] % len(variants)]
                vi[0] += 1
                return si.RTISI_LA(
                    v, look_ahead=la, max_iter=inner, verbose=False,
                    window=win, backend=backend,
                )
            runners[name] = fn

    # single timed quantity (whole call); interleave rounds
    for name, fn in runners.items():
        t0 = time.time()
        _rb(fn(0))
        print(f"# compiled {name} in {time.time() - t0:.0f}s", flush=True)
    samples = {name: [] for name in runners}
    for _ in range(3):
        for name, fn in runners.items():
            t0 = time.perf_counter()
            _rb(fn(0))
            samples[name].append(time.perf_counter() - t0)
    for name, ss in samples.items():
        t = statistics.median(ss)
        _, _, _, steps, B = state[name]
        print(json.dumps({
            "phase": "rtisi", "variant": name,
            "frames_s_aggregate": round(B * steps / t, 1),
            "frames_s_per_stream": round(steps / t, 1),
            "wall_s": round(t, 3),
        }), flush=True)


def phase_xover():
    """Backend crossover vs dot rows.  Ratios WITHIN a (n_fft, rows) point
    are drift-cancelled (backends interleaved per rep); cross-point
    magnitudes carry the tunnel's drift.  Caveat: in a roundtrip chain XLA
    can elide matmul4's permuted-spectrum relayouts between iterations,
    which real pipelines (framing/OLA between the transforms) cannot — the
    large-row 2048 policy therefore comes from the GL-pipeline A/B, not
    from this sweep (matmul 154 vs matmul4 372 us/iter at 431 rows)."""
    from jax import lax
    from specinv_tpu.ops import fourier

    grid = [
        (2048, (4, 16, 64, 256, 512), ("fft", "matmul", "matmul4")),
        (1024, (32, 128, 512), ("matmul", "matmul4")),
        (4096, (32, 128, 512), ("matmul", "matmul4")),
    ]
    rng = np.random.default_rng(0)
    for n_fft, rows_list, backends in grid:
        cfg, _ = canonicalize(n_fft // 2 + 1, np.float32)
        for rows in rows_list:
            fr = jnp.asarray(
                rng.standard_normal((rows, n_fft)).astype(np.float32))
            fns = {}
            for b in backends:
                @jax.jit
                def rt(fr, n, b=b):
                    def body(_, x):
                        sp = fourier.forward(x, cfg, backend=b)
                        return fourier.inverse(sp, cfg, backend=b)
                    return lax.fori_loop(0, n, body, fr)
                fns[b] = rt
            for b, fn in fns.items():
                _rb(fn(fr, 20)), _rb(fn(fr, 100))
            samples = {b: [] for b in backends}
            for _ in range(9):
                for b, fn in fns.items():
                    t0 = time.perf_counter(); _rb(fn(fr, 20))
                    ts = time.perf_counter() - t0
                    t0 = time.perf_counter(); _rb(fn(fr, 100))
                    samples[b].append(time.perf_counter() - t0 - ts)
            for b, ss in samples.items():
                d = statistics.median(ss) / 80.0
                print(json.dumps({
                    "phase": "xover", "n_fft": n_fft, "rows": rows,
                    "backend": b,
                    "marginal_roundtrip_us": round(d * 1e6, 1)}), flush=True)


if __name__ == "__main__":
    phases = sys.argv[1:] or ["pack"]
    for p in phases:
        {"pack": phase_pack, "occupancy": phase_occupancy,
         "rtisi": phase_rtisi, "xover": phase_xover}[p]()
