"""Round-4 perf captures on the lane-engine kernels (one real chip).

Sections (pick with --only SECTION):
  blockt   — whole-run GL north star: block_t sweep on the lane kernel
  admm     — whole-run ADMM north star marginal (lane vs old engine)
  rtisi    — RTISI frames_per_launch sweep, single-stream + B=16
  batch    — GL batched occupancy B in {1,4,16,64} at n_fft 2048 (pack auto)
  lbfgs    — L-BFGS log-mel marginal + batched-clip (vmap) throughput

Methodology: interleaved variants, marginal rates by differencing two
iteration counts (readback-forced), medians over rounds — see
.claude/skills/verify/SKILL.md "Benchmarking methodology".
"""
import functools
import json
import os
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

from bench_common import readback  # noqa: E402
from specinv_tpu.config import canonicalize  # noqa: E402

SR = 22050


def interleave(variants, rounds=5, lo=100, hi=400):
    """Marginal us/iter per variant.

    Tunnel stalls are ONE-SIDED (they only ever add time), so the robust
    estimator is min-over-rounds of each absolute time, differenced:
    marginal = (min t_hi - min t_lo) / (hi - lo).  The per-round marginal
    medians are printed too for cross-checking.
    """
    for f in variants.values():
        for it in (lo, hi):
            readback(f(it))
    t_lo = {n: [] for n in variants}
    t_hi = {n: [] for n in variants}
    for r in range(rounds):
        for n, f in variants.items():
            t0 = time.perf_counter(); readback(f(lo)); t_lo[n].append(time.perf_counter() - t0)
            t0 = time.perf_counter(); readback(f(hi)); t_hi[n].append(time.perf_counter() - t0)
        print(f"# round {r} done", flush=True)
    out = {}
    for n in variants:
        m_min = (min(t_hi[n]) - min(t_lo[n])) / (hi - lo) * 1e6
        per_round = sorted(
            (b - a) / (hi - lo) * 1e6 for a, b in zip(t_lo[n], t_hi[n]))
        out[n] = round(m_min, 2)
        print(json.dumps({
            "variant": n, "us_per_iter": out[n],
            "median_of_marginals": round(per_round[len(per_round) // 2], 2),
            "t_lo_min_ms": round(min(t_lo[n]) * 1e3, 1),
            "t_hi_min_ms": round(min(t_hi[n]) * 1e3, 1)}), flush=True)
    return out


def gl_inputs(seconds=10, n_fft=2048, B=1, seed=7):
    from specinv_tpu.models._pallas_driver import make_geometry4, make_inv_env
    from specinv_tpu.ops import stft as stft_ops
    from specinv_tpu.ops.pallas import fft4

    rng = np.random.default_rng(seed)
    win = np.hanning(n_fft + 1)[:-1].astype(np.float32)
    cfg, w = canonicalize(
        n_fft // 2 + 1, np.float32, window=win, pad_mode="constant")
    wj = jnp.asarray(w)
    clip = rng.standard_normal((B, SR * seconds)).astype(np.float32)
    spec = stft_ops.stft(jnp.asarray(clip), cfg, wj)
    mag_tm = jnp.abs(spec).astype(jnp.float32)
    T = mag_tm.shape[1]
    geo = make_geometry4(cfg, T, block_t=None)
    inv_env = make_inv_env(cfg, wj, T, geo).astype(jnp.float32)
    tgt_full = fft4.extend_hermitian_mag(mag_tm, n_fft)
    pad_rows = lambda a: jnp.pad(  # noqa: E731
        a, ((0, 0), (0, geo.t_pad - T), (0, 0)))
    target_p = fft4.to_permuted(pad_rows(tgt_full), n_fft)
    x_pad = jnp.asarray(
        rng.standard_normal((B, geo.lx)).astype(np.float32) * 0.01)
    return cfg, wj, geo, T, target_p, x_pad, inv_env


def sec_blockt(rounds):
    from specinv_tpu.ops.pallas.gl_fullrun4 import fused_gl_run

    cfg, wj, geo, T, tgt, x_pad, inv_env = gl_inputs()
    lr = jnp.float32(0.99 / 1.99)
    pre_re, pre_im = tgt, tgt * 0.25
    variants = {}
    for bt in (32, 64, 112, 224, 448):
        t_pad = -(-T // bt) * bt
        if t_pad != geo.t_pad:
            # different padded geometry: rebuild inputs for a fair
            # per-(true)-iteration comparison is NOT possible without
            # changing work; report padded-row count instead
            continue
        variants[f"bt{bt}"] = functools.partial(
            lambda it, bt=bt: fused_gl_run(
                x_pad, pre_re, pre_im, tgt, wj, inv_env, lr, cfg, geo.e,
                n_iters=it, block_t=bt, emit_state=True, with_mag=False)[0]
        )
    # ~29 us/iter x 20000-iter contrast = ~580 ms >> tunnel RPC jitter
    # (this session's tunnel shows multi-hundred-ms outliers)
    interleave(variants, rounds, lo=1000, hi=21000)


def sec_admm(rounds):
    from specinv_tpu.ops.pallas.admm_fused4 import fused_admm_run

    cfg, wj, geo, T, tgt, x_pad, inv_env = gl_inputs()
    rho = jnp.float32(0.1)
    variants = {}
    for env, name in (("1", "lane"), ("0", "old")):
        def f(it, env=env):
            os.environ["SPECINV_FULLRUN_LANE"] = env
            return fused_admm_run(
                x_pad, tgt, tgt * 0.25, tgt, wj, inv_env, rho, cfg, T,
                geo.e, n_iters=it, block_t=geo.block_t,
                emit_state=True, with_mag=False)[0]
        variants[name] = f
    interleave(variants, rounds, lo=1000, hi=21000)


def sec_rtisi(rounds):
    from specinv_tpu.models.rtisi_la import RTISI_LA

    n_fft, la, mi = 2048, 3, 25
    win = np.hanning(n_fft + 1)[:-1].astype(np.float32)
    rng = np.random.default_rng(3)
    for B in (1, 16):
        clip = rng.standard_normal((B, SR * 10)).astype(np.float32)
        import torch
        mag = torch.stft(
            torch.from_numpy(clip), n_fft, window=torch.from_numpy(win),
            return_complex=True).abs().numpy().astype(np.float32)
        T = mag.shape[-1]
        print(f"# B={B} frames/clip={T}", flush=True)
        variants = {}
        for kpl in (1, 4, 8, 16):
            variants[f"B{B}_kpl{kpl}"] = functools.partial(
                lambda frames, kpl=kpl: RTISI_LA(
                    mag[..., :frames], look_ahead=la, max_iter=mi,
                    verbose=False, backend="pallas4", window=win,
                    frames_per_launch=kpl),
            )
        # frames-based marginal: lo/hi frame counts; min-based estimator
        # (tunnel stalls are one-sided)
        lo, hi = 32, T
        for f in variants.values():
            for n in (lo, hi):
                readback(f(n))
        t_lo = {n: [] for n in variants}
        t_hi = {n: [] for n in variants}
        for r in range(rounds):
            for n, f in variants.items():
                t0 = time.perf_counter(); readback(f(lo)); t_lo[n].append(time.perf_counter() - t0)
                t0 = time.perf_counter(); readback(f(hi)); t_hi[n].append(time.perf_counter() - t0)
            print(f"# round {r} done", flush=True)
        for n in variants:
            d = min(t_hi[n]) - min(t_lo[n])
            per_round = sorted(
                (hi - lo) * B / max(b - a, 1e-9)
                for a, b in zip(t_lo[n], t_hi[n]))
            print(json.dumps({
                "variant": n,
                "frames_per_sec": round((hi - lo) * B / max(d, 1e-9), 1),
                "median_of_marginals": round(
                    per_round[len(per_round) // 2], 1)}), flush=True)


def sec_batch(rounds):
    from specinv_tpu.models.griffin_lim import griffin_lim

    nffts = (2048,)
    if "--all-nfft" in sys.argv:
        nffts = (512, 1024, 2048, 4096)
    rng = np.random.default_rng(3)
    import torch
    for n_fft in nffts:
        win = np.hanning(n_fft + 1)[:-1].astype(np.float32)
        print(f"## n_fft={n_fft}", flush=True)
        _sec_batch_one(rounds, n_fft, win, rng)


def _sec_batch_one(rounds, n_fft, win, rng):
    from specinv_tpu.models.griffin_lim import griffin_lim
    import torch

    for B in (1, 4, 16, 64):
        clip = rng.standard_normal((B, SR * 2)).astype(np.float32)
        mag = torch.stft(
            torch.from_numpy(clip), n_fft, window=torch.from_numpy(win),
            return_complex=True).abs().numpy().astype(np.float32)
        # Scalar-reduce inside jit: a (B, 44100) waveform readback through
        # the ~14 MB/s tunnel is up to ~1 s of one-sided jitter — far
        # larger than the iteration contrast it would ride on.
        def mk(it):
            return jnp.sum(griffin_lim(
                mag, max_iter=it, tol=0.0, verbose=False, window=win,
                backend="pallas4"))
        variants = {f"B{B}": jax.jit(mk, static_argnums=0)}
        # contrast sized for ~1.8 s of kernel compute at every (n_fft, B)
        us_guess = {512: 2.0, 1024: 3.0, 2048: 6.5, 4096: 26.0}[n_fft]
        contrast = int(min(max(1.8e6 / (B * us_guess), 400), 40000))
        out = interleave(variants, rounds, lo=50, hi=50 + contrast)
        us = out[f"B{B}"]
        print(json.dumps({
            "B": B, "clip_iters_per_sec": round(B * 1e6 / us, 1)}),
            flush=True)


def sec_seg(rounds):
    """Segmented early-stop overhead on the lane engine (north star).

    tol=0 + early_stop=True runs the full segment machinery (eva_iter=10
    launches, mag-plane emission, XLA metric/stop pass) but never trips
    the stop rule — so the marginal vs the single-launch path is pure
    early-stop tax per iteration."""
    from specinv_tpu.models.griffin_lim import run_tm_pallas4
    from specinv_tpu.ops import stft as stft_ops

    n_fft = 2048
    win = np.hanning(n_fft + 1)[:-1].astype(np.float32)
    cfg, w = canonicalize(
        n_fft // 2 + 1, np.float32, window=win, pad_mode="constant")
    wj = jnp.asarray(w)
    rng = np.random.default_rng(7)
    clip = rng.standard_normal((1, SR * 10)).astype(np.float32)
    spec = stft_ops.stft(jnp.asarray(clip), cfg, wj)
    mag_tm = jnp.abs(spec).astype(jnp.float32)
    init_tm = spec.astype(jnp.complex64)
    lr = jnp.float32(0.99 / 1.99)

    def mk(early_stop, stats_eval=None):
        # arrays as jit ARGUMENTS: complex closure constants trip an
        # UNIMPLEMENTED readback in the tunnel's constant embedding
        def f(it, mag, init, w):
            return jnp.sum(run_tm_pallas4(
                mag, init, w, lr, jnp.float32(0.0), cfg,
                max_iter=it, eva_iter=10, verbose=False,
                early_stop=early_stop, mode="fori",
                stats_eval=stats_eval))
        g = jax.jit(f, static_argnums=0)
        return lambda it: g(it, mag_tm, init_tm, wj)

    variants = {"single": mk(False), "segmented": mk(True)}

    if "--stats-ab" in sys.argv:
        # Same-session A/B of the scalar eval-stats path vs the magnitude
        # plane + XLA metric pass (stats_eval is a static arg — two
        # separate compiles, no env staging needed).
        variants = {"single": mk(False),
                    "seg_stats": mk(True, stats_eval=True),
                    "seg_plane": mk(True, stats_eval=False)}

    if "--decompose" in sys.argv:
        # isolate the tax components: raw 10-iter relaunches (state
        # in/out per segment, no metric glue), with and without the mag
        # plane emission
        from specinv_tpu.models._pallas_driver import (
            make_geometry4, make_inv_env)
        from specinv_tpu.ops import stft as stft_ops2  # noqa: F401
        from specinv_tpu.ops.pallas import fft4
        from specinv_tpu.ops.pallas.gl_fullrun4 import fused_gl_run

        T = mag_tm.shape[1]
        geo = make_geometry4(cfg, T, block_t=None)
        inv_env = make_inv_env(cfg, wj, T, geo).astype(jnp.float32)
        tgt_full = fft4.extend_hermitian_mag(mag_tm, n_fft)
        pad_rows = lambda a: jnp.pad(  # noqa: E731
            a, ((0, 0), (0, geo.t_pad - T), (0, 0)))
        tgt_p = fft4.to_permuted(pad_rows(tgt_full), n_fft)
        x0 = jnp.zeros((1, geo.lx), jnp.float32)

        def chunks(with_mag):
            def f(it, x0, tgt_p, w, env):
                def body(i, st):
                    out = fused_gl_run(
                        st[0], st[1], st[2], tgt_p, w, env, lr, cfg,
                        geo.e, n_iters=10, block_t=geo.block_t,
                        emit_state=True, with_mag=with_mag)
                    return out[:3]
                st = jax.lax.fori_loop(
                    0, it // 10, body, (x0, tgt_p, tgt_p * 0.25))
                return jnp.sum(st[0])
            g = jax.jit(f, static_argnums=0)
            return lambda it: g(it, x0, tgt_p, wj, inv_env)

        variants["chunk10_nomag"] = chunks(False)
        variants["chunk10_mag"] = chunks(True)

    interleave(variants, rounds, lo=1000, hi=21000)


def sec_lbfgs(rounds):
    from specinv_tpu.models.lbfgs import L_BFGS
    from specinv_tpu.ops.mel import log_mel_transform

    n_fft, n_mels = 2048, 128
    rng = np.random.default_rng(4)
    x = rng.standard_normal((SR * 10,)).astype(np.float32) * 0.1
    fn = log_mel_transform(n_fft=n_fft, n_mels=n_mels, sample_rate=SR)
    tgt = fn(jnp.asarray(x))
    variants = {
        "fixed": lambda it: L_BFGS(
            tgt, fn, [x.size], outer_max_iter=it, max_iter=10, tol=0.0,
            verbose=False),
        "wolfe": lambda it: L_BFGS(
            tgt, fn, [x.size], outer_max_iter=it, max_iter=10, tol=0.0,
            line_search_fn="strong_wolfe", verbose=False),
    }
    out = interleave(variants, rounds, lo=3, hi=12)
    for name, us in out.items():
        print(json.dumps({
            "variant": name,
            "outer_it_per_sec": round(1e6 / us, 2),
            "inner_it_per_sec": round(10 * 1e6 / us, 1)}), flush=True)


def sec_lbfgs_batch(rounds):
    """Batched-clip L-BFGS: jax.vmap over the whole solver (per-clip line
    search + termination), B in {1, 4, 16}.

    Both step modes: fixed step (torch default — fori mode has static
    bounds, so vmap lanes run in lockstep at no cost) and strong-Wolfe
    (the zoom while_loop runs max-lane iterations under vmap)."""
    from specinv_tpu.models.lbfgs import run
    from specinv_tpu.ops.mel import log_mel_transform

    n_fft, n_mels = 2048, 128
    fn = log_mel_transform(n_fft=n_fft, n_mels=n_mels, sample_rate=SR)
    rng = np.random.default_rng(4)
    tol = jnp.float32(0.0)

    for B in (1, 4, 16):
        x = rng.standard_normal((B, SR * 10)).astype(np.float32) * 0.1
        tgt = jax.vmap(fn)(jnp.asarray(x))
        x0 = jnp.asarray(
            rng.standard_normal((B, SR * 10)).astype(np.float32) * 1e-6)

        variants = {}
        for ls, name in ((False, "fixed"), (True, "wolfe")):
            def solve(it, ls=ls):
                def one(t, x0):
                    return run(
                        t, x0, tol, fn, outer_max_iter=it,
                        inner_max_iter=10, line_search=ls, verbose=False,
                        mode="fori")
                return jax.vmap(one)(tgt, x0)
            variants[f"B{B}_{name}"] = solve

        out = interleave(variants, rounds, lo=3, hi=12)
        for name, us in out.items():
            print(json.dumps({
                "variant": name,
                "aggregate_inner_it_per_sec": round(B * 10 * 1e6 / us, 1)}),
                flush=True)


def main():
    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1]
    rounds = 5
    if "--rounds" in sys.argv:
        rounds = int(sys.argv[sys.argv.index("--rounds") + 1])
    for name, fn in (
        ("blockt", sec_blockt), ("admm", sec_admm), ("rtisi", sec_rtisi),
        ("batch", sec_batch), ("lbfgs", sec_lbfgs),
        ("lbfgs_batch", sec_lbfgs_batch), ("seg", sec_seg),
    ):
        if only and name != only:
            continue
        print(f"## section {name}", flush=True)
        fn(rounds)


if __name__ == "__main__":
    main()
