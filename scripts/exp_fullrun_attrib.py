"""Per-stage cost attribution for the whole-run GL kernel (one real chip).

The round-3 roofline (benchmarks.md) puts the north star at ~77 us/iter vs a
~26 us serialized compute floor and attributes the residue to "grid-step
sequencing + VMEM copy overhead" without decomposing it.  This experiment
carries a toggle-instrumented COPY of gl_fullrun4's kernel (pack=1,
plane-resident, emit_state layout — the exact north-star launch shape) and
measures marginal us/iter with individual stages disabled:

  full       everything on (production numerics, HIGH dots)
  no_frame   framing loads skipped (frames scratch reused as-is)
  no_ola     overlap-add stores skipped
  no_mstage  radix m-point stages replaced by copies (both directions)
  no_twiddle twiddle elementwise mults skipped (both directions)
  no_proj    momentum + magnitude projection skipped (gain=1, no sqrt/div)
  no_planes  momentum-plane RMW skipped (projection on the raw spectrum)
  dots_1p    DEFAULT 1-pass bf16 dots (vs HIGH 3-pass)
  dots_6p    HIGHEST 6-pass f32 dots

Each variant gets its own jit cache entry (distinct static toggle tuple).
Interleaved round-robin, marginal differencing 100 vs 400 iters, medians.

Usage: python scripts/exp_fullrun_attrib.py [--rounds N]
"""
import functools
import json
import sys
import time

import numpy as np

sys.path.insert(0, "/root/repo")
sys.path.insert(0, "/root/repo/scripts")

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
from jax.experimental import pallas as pl  # noqa: E402
from jax.experimental.pallas import tpu as pltpu  # noqa: E402

from bench_common import readback  # noqa: E402
from specinv_tpu.config import canonicalize  # noqa: E402
from specinv_tpu.models._pallas_driver import make_geometry4, make_inv_env  # noqa: E402
from specinv_tpu.ops import stft as stft_ops  # noqa: E402
from specinv_tpu.ops.pallas import fft4  # noqa: E402
from specinv_tpu.ops.pallas.gl_fused import LANE, PROJ_EPS, _dot3, split_schemes  # noqa: E402
from specinv_tpu.ops.pallas.gl_fused4 import frame_rows, ola_rows  # noqa: E402

SR = 22050
TABLE_KEYS = fft4.DEVICE_TABLE_KEYS


def _dot2(x, w, scheme):
    return _dot3(x, w, (((1,), (0,)), ((), ())), scheme)


def fwd4_var(frames_nat, t, scheme, do_mstage, do_twiddle):
    bt, n_fft = frames_nat.shape
    m = n_fft // LANE
    f3 = frames_nat.reshape(bt, m, LANE)
    if do_mstage:
        a_re, a_im = fft4._m_dft_fwd(f3)
    else:
        a_re, a_im = f3, f3 * 0.5
    if do_twiddle:
        t_re = (a_re * t["twt_re"] - a_im * t["twt_im"]).reshape(bt * m, LANE)
        t_im = (a_re * t["twt_im"] + a_im * t["twt_re"]).reshape(bt * m, LANE)
    else:
        t_re = a_re.reshape(bt * m, LANE)
        t_im = a_im.reshape(bt * m, LANE)
    d1 = _dot2(t_re, t["w128_re"], scheme)
    d2 = _dot2(t_im, t["w128_im"], scheme)
    d3 = _dot2(t_re + t_im, t["w128_sum"], scheme)
    s_re = d1 - d2
    s_im = d3 - d1 - d2
    return s_re.reshape(bt, m, LANE), s_im.reshape(bt, m, LANE)


def inv4_var(p_re, p_im, t, scheme, do_mstage, do_twiddle):
    bt, m, _ = p_re.shape
    p_re2 = p_re.reshape(bt * m, LANE)
    p_im2 = p_im.reshape(bt * m, LANE)
    d1 = _dot2(p_re2, t["iw128_re"], scheme)
    d2 = _dot2(p_im2, t["iw128_im"], scheme)
    d3 = _dot2(p_re2 + p_im2, t["iw128_sum"], scheme)
    q_re = (d1 - d2).reshape(bt, m, LANE)
    q_im = (d3 - d1 - d2).reshape(bt, m, LANE)
    if do_twiddle:
        r_re = q_re * t["twt_re"] + q_im * t["twt_im"]
        r_im = -q_re * t["twt_im"] + q_im * t["twt_re"]
    else:
        r_re, r_im = q_re, q_im
    if do_mstage:
        o = fft4._m_idft_real(r_re, r_im)
    else:
        o = r_re + r_im
    return o.reshape(bt, m * LANE)


def _kernel(
    lr_ref, x0_ref, tgt_ref, pre0_re_ref, pre0_im_ref, *rest,
    block_t, n_fft, hop, fwd_p, inv_p, np_tables, n_iters, tg,
):
    ntab = len(TABLE_KEYS)
    tab_refs = rest[:ntab]
    win_ref, inv_env_ref = rest[ntab : ntab + 2]
    outs = rest[ntab + 2 :]
    x_out_ref, pre_out_re_ref, pre_out_im_ref = outs[:3]
    x_s, pre_re_s, pre_im_s, frames_s = outs[3:]

    lx = x_s.shape[1]
    i = pl.program_id(1)
    t = pl.program_id(2)
    n_t = pl.num_programs(2)
    rd = jax.lax.rem(i, jnp.int32(2))
    wr = 1 - rd
    window = win_ref[0, :]
    tables = dict(np_tables)
    tables.update({k: r[...] for k, r in zip(TABLE_KEYS, tab_refs)})
    sl = pl.ds(t * block_t, block_t)

    @pl.when(jnp.logical_and(i == 0, t == 0))
    def _init_x():
        x_s[pl.ds(0, 1), :] = x0_ref[...]

    @pl.when(i == 0)
    def _init_pre():
        pre_re_s[sl] = pre0_re_ref[0, sl]
        pre_im_s[sl] = pre0_im_ref[0, sl]

    @pl.when(t == 0)
    def _zero_write_slab():
        x_s[pl.ds(wr, 1), :] = jnp.zeros((1, lx), jnp.float32)

    if tg["frame"]:
        frame_rows(
            frames_s, lambda s, n: x_s[pl.ds(rd, 1), pl.ds(s, n)],
            window, t * block_t, block_t, n_fft, hop,
        )

    s_re, s_im = fwd4_var(
        frames_s[...], tables, fwd_p, tg["mstage"], tg["twiddle"]
    )

    lr = lr_ref[0, 0]
    if tg["planes"]:
        s_re = s_re - lr * pre_re_s[sl]
        s_im = s_im - lr * pre_im_s[sl]
        pre_re_s[sl] = s_re
        pre_im_s[sl] = s_im

    @pl.when(i == n_iters - 1)
    def _emit_pre():
        pre_out_re_ref[0, sl] = s_re
        pre_out_im_ref[0, sl] = s_im

    if tg["proj"]:
        norm = jnp.sqrt(s_re * s_re + s_im * s_im) + PROJ_EPS
        gain = tgt_ref[0, sl] / norm
        pr, pi = s_re * gain, s_im * gain
    else:
        pr, pi = s_re, s_im
    fr = inv4_var(pr, pi, tables, inv_p, tg["mstage"], tg["twiddle"])

    if tg["ola"]:
        def _write(s, v):
            x_s[pl.ds(wr, 1), pl.ds(s, v.size)] = v.reshape(1, v.size)

        ola_rows(
            lambda s, n: x_s[pl.ds(wr, 1), pl.ds(s, n)], _write, fr, window,
            t * block_t, block_t, n_fft, hop,
        )

    @pl.when(t == n_t - 1)
    def _normalize():
        idx = (pl.ds(wr, 1), slice(None))
        x_s[idx] = x_s[idx] * inv_env_ref[0]

    @pl.when(jnp.logical_and(i == n_iters - 1, t == n_t - 1))
    def _emit():
        x_out_ref[...] = x_s[pl.ds(wr, 1), :]


@functools.partial(
    jax.jit, static_argnames=("cfg", "n_iters", "block_t", "precision", "tg")
)
def launch(x_pad, pre_re, pre_im, target, window, inv_env, lr, cfg,
           n_iters, block_t, precision, tg):
    B, t_pad, m, lanes = target.shape
    n_fft, hop = cfg.n_fft, cfg.hop_length
    lx = x_pad.shape[-1]
    n_t = t_pad // block_t
    tables = fft4.fourstep_tables(n_fft, cfg.normalized)
    np_tables = {k: v for k, v in tables.items() if k not in TABLE_KEYS}
    fwd_p, inv_p = split_schemes(precision)
    tgd = dict(tg)
    kernel = functools.partial(
        _kernel, block_t=block_t, n_fft=n_fft, hop=hop,
        fwd_p=fwd_p, inv_p=inv_p, np_tables=np_tables, n_iters=n_iters,
        tg=tgd,
    )
    grid = (B, n_iters, n_t)
    whole = lambda b, i, t: (b, 0, 0, 0)  # noqa: E731
    sig = pl.BlockSpec((1, lx), lambda b, i, t: (b, 0))
    blk = pl.BlockSpec((1, t_pad, m, LANE), whole)
    plane = jax.ShapeDtypeStruct((B, t_pad, m, LANE), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            sig, blk, blk, blk,
            *[
                pl.BlockSpec(tables[k].shape, lambda b, i, t: (0, 0))
                for k in TABLE_KEYS
            ],
            pl.BlockSpec((1, n_fft), lambda b, i, t: (0, 0)),
            pl.BlockSpec((1, lx), lambda b, i, t: (0, 0)),
        ],
        out_specs=[sig, blk, blk],
        out_shape=[
            jax.ShapeDtypeStruct((B, lx), jnp.float32), plane, plane,
        ],
        scratch_shapes=[
            pltpu.VMEM((2, lx), jnp.float32),
            pltpu.VMEM((t_pad, m, LANE), jnp.float32),
            pltpu.VMEM((t_pad, m, LANE), jnp.float32),
            pltpu.VMEM((block_t, n_fft), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
    )(
        jnp.asarray(lr, jnp.float32).reshape(1, 1),
        x_pad, target, pre_re, pre_im,
        *[jnp.asarray(tables[k]) for k in TABLE_KEYS],
        jnp.asarray(window, jnp.float32).reshape(1, n_fft),
        inv_env.reshape(1, lx),
    )
    return jnp.sum(out[0])


ALL_ON = (("frame", True), ("ola", True), ("mstage", True),
          ("twiddle", True), ("proj", True), ("planes", True))


def toggles(**off):
    return tuple((k, off.get(k, v)) for k, v in ALL_ON)


VARIANTS = {
    "full": (toggles(), "HIGH"),
    "no_frame": (toggles(frame=False), "HIGH"),
    "no_ola": (toggles(ola=False), "HIGH"),
    "no_mstage": (toggles(mstage=False), "HIGH"),
    "no_twiddle": (toggles(twiddle=False), "HIGH"),
    "no_proj": (toggles(proj=False), "HIGH"),
    "no_planes": (toggles(planes=False), "HIGH"),
    "dots_1p": (toggles(), "DEFAULT"),
    "dots_6p": (toggles(), "HIGHEST"),
}
PRECS = {
    "HIGH": jax.lax.Precision.HIGH,
    "DEFAULT": jax.lax.Precision.DEFAULT,
    "HIGHEST": jax.lax.Precision.HIGHEST,
}


def main():
    rounds = 5
    if "--rounds" in sys.argv:
        rounds = int(sys.argv[sys.argv.index("--rounds") + 1])
    only = None
    if "--only" in sys.argv:
        only = sys.argv[sys.argv.index("--only") + 1].split(",")

    n_fft, seconds = 2048, 10
    rng = np.random.default_rng(7)
    win = np.hanning(n_fft + 1)[:-1].astype(np.float32)
    cfg, w = canonicalize(n_fft // 2 + 1, np.float32, window=win)
    wj = jnp.asarray(w)
    clip = rng.standard_normal((1, SR * seconds)).astype(np.float32)
    spec = stft_ops.stft(jnp.asarray(clip), cfg, wj)  # time-major (B, T, F)
    mag_tm = jnp.abs(spec).astype(jnp.float32)
    B, T, F = mag_tm.shape
    geo = make_geometry4(cfg, T, block_t=None)
    inv_env = make_inv_env(cfg, wj, T, geo).astype(jnp.float32)

    tgt_full = fft4.extend_hermitian_mag(mag_tm, n_fft)
    pad_rows = lambda a: jnp.pad(  # noqa: E731
        a, ((0, 0), (0, geo.t_pad - T), (0, 0)))
    target_p = fft4.to_permuted(pad_rows(tgt_full), n_fft)
    pre_re = target_p
    pre_im = target_p * 0.25
    x_pad = jnp.asarray(
        rng.standard_normal((B, geo.lx)).astype(np.float32) * 0.01
    )
    lr = jnp.float32(0.99 / 1.99)

    names = [n for n in VARIANTS if only is None or n in only]
    args = (x_pad, pre_re, pre_im, target_p, wj.astype(jnp.float32),
            inv_env, lr, cfg)

    # warm both iteration counts for every variant
    for name in names:
        tg, p = VARIANTS[name]
        for it in (100, 400):
            readback(launch(*args, it, geo.block_t, PRECS[p], tg))
        print(f"# traced {name}", flush=True)

    marg = {n: [] for n in names}
    for r in range(rounds):
        for name in names:
            tg, p = VARIANTS[name]
            t0 = time.perf_counter()
            readback(launch(*args, 100, geo.block_t, PRECS[p], tg))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            readback(launch(*args, 400, geo.block_t, PRECS[p], tg))
            t_hi = time.perf_counter() - t0
            marg[name].append((t_hi - t_lo) / 300 * 1e6)  # us/iter
        print(f"# round {r} done", flush=True)

    base = None
    for name in names:
        ms = sorted(marg[name])
        med = ms[len(ms) // 2]
        if name == "full":
            base = med
        out = {"variant": name, "us_per_iter": round(med, 2)}
        if base is not None and name != "full":
            out["delta_vs_full"] = round(base - med, 2)
        print(json.dumps(out), flush=True)


if __name__ == "__main__":
    main()
