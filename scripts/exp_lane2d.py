"""Lane-major four-step + 2D hop-row slab: whole-run GL kernel redesign A/B.

Round-4 attribution (scripts/exp_fullrun_attrib.py) decomposed the 70 us/iter
north star: OLA ~35.5 us, radix m-stage ~29.6 us, vs a ~26 us floor.  Both
hotspots are relayout costs, not math:

  * the m-stage slices (bt, m, 128) arrays along the SUBLANE m axis
    (f3[:, a, :] = a stride-m sublane gather) and concatenates 16 such
    slices back — two full relayouts per direction;
  * OLA read-modify-writes the flat (1, Lx) signal slab 4x per block with
    (1, bt*hop) <-> (bt, hop) relayouts and a serial RAW chain between the
    n_fft/hop passes.

This experiment rebuilds the kernel with zero sublane relayouts:

  * frames/spectrum stay (bt, n_fft) LANE-major; the radix recursion's
    leaves are 128-aligned lane slices (free vreg column selects); the
    spectrum plane layout becomes lane-flat (t, 128*d + e) — the same
    permuted order, flattened (driver-side reshape, free);
  * the Karatsuba W128 dots run per-leaf ((bt, 128) @ (128, 128)) or merged
    (one (bt*m, 128) relayout) — toggle;
  * the signal slab is 2D (t_pad + K - 1, hop) hop-row layout (K = n_fft /
    hop): framing = ONE aligned 2D read + K sublane-shifted value slices;
    OLA = a local (bt + K - 1, hop) accumulation + ONE aligned block store
    with a (K-1, hop) carry-tail scratch — no slab RMW, no zeroing pass.

Numerics: the radix expression tree, twiddles and dot contractions are the
same ops in the same order as production — parity should be bitwise.

Usage: python scripts/exp_lane2d.py [--rounds N] [--parity-only]
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
from specinv_tpu.ops.pallas.gl_fullrun4 import fused_gl_run  # noqa: E402

SR = 22050
TABLE_KEYS = fft4.DEVICE_TABLE_KEYS


def _dot2(x, w, scheme):
    return _dot3(x, w, (((1,), (0,)), ((), ())), scheme)


def _cat_parts(parts, bt, lane, dtype):
    cols = [
        jnp.zeros((bt, lane), dtype) if p is None else p for p in parts
    ]
    return jnp.concatenate(cols, axis=1)


def fwd_lane(frames, t, scheme, leaf_dots: bool):
    """Forward four-step, lane-major: (bt, n_fft) natural -> (s_re, s_im)
    each (bt, n_fft) with lane index 128*d + e (flat permuted layout)."""
    bt, n_fft = frames.shape
    m = n_fft // LANE
    leaves = [
        (frames[:, a * LANE : (a + 1) * LANE], None) for a in range(m)
    ]
    ys = fft4._clist_fft(leaves, inverse=False)
    a_re = _cat_parts([y[0] for y in ys], bt, LANE, frames.dtype)
    a_im = _cat_parts([y[1] for y in ys], bt, LANE, frames.dtype)
    t_re = a_re * t["twtf_re"] - a_im * t["twtf_im"]
    t_im = a_re * t["twtf_im"] + a_im * t["twtf_re"]
    if leaf_dots:
        pr, pi = [], []
        for d in range(m):
            tr = t_re[:, d * LANE : (d + 1) * LANE]
            ti = t_im[:, d * LANE : (d + 1) * LANE]
            d1 = _dot2(tr, t["w128_re"], scheme)
            d2 = _dot2(ti, t["w128_im"], scheme)
            d3 = _dot2(tr + ti, t["w128_sum"], scheme)
            pr.append(d1 - d2)
            pi.append(d3 - d1 - d2)
        return (
            jnp.concatenate(pr, axis=1), jnp.concatenate(pi, axis=1)
        )
    tr = t_re.reshape(bt * m, LANE)
    ti = t_im.reshape(bt * m, LANE)
    d1 = _dot2(tr, t["w128_re"], scheme)
    d2 = _dot2(ti, t["w128_im"], scheme)
    d3 = _dot2(tr + ti, t["w128_sum"], scheme)
    return (
        (d1 - d2).reshape(bt, n_fft), (d3 - d1 - d2).reshape(bt, n_fft)
    )


def inv_lane(p_re, p_im, t, scheme, leaf_dots: bool):
    """Inverse four-step, lane-major: flat-permuted (bt, n_fft) spectrum ->
    natural real frames (bt, n_fft)."""
    bt, n_fft = p_re.shape
    m = n_fft // LANE
    if leaf_dots:
        qr, qi = [], []
        for d in range(m):
            pr = p_re[:, d * LANE : (d + 1) * LANE]
            pi = p_im[:, d * LANE : (d + 1) * LANE]
            d1 = _dot2(pr, t["iw128_re"], scheme)
            d2 = _dot2(pi, t["iw128_im"], scheme)
            d3 = _dot2(pr + pi, t["iw128_sum"], scheme)
            qr.append(d1 - d2)
            qi.append(d3 - d1 - d2)
        q_re = jnp.concatenate(qr, axis=1)
        q_im = jnp.concatenate(qi, axis=1)
    else:
        pr = p_re.reshape(bt * m, LANE)
        pi = p_im.reshape(bt * m, LANE)
        d1 = _dot2(pr, t["iw128_re"], scheme)
        d2 = _dot2(pi, t["iw128_im"], scheme)
        d3 = _dot2(pr + pi, t["iw128_sum"], scheme)
        q_re = (d1 - d2).reshape(bt, n_fft)
        q_im = (d3 - d1 - d2).reshape(bt, n_fft)
    r_re = q_re * t["twtf_re"] + q_im * t["twtf_im"]
    r_im = -q_re * t["twtf_im"] + q_im * t["twtf_re"]
    leaves = [
        (r_re[:, d * LANE : (d + 1) * LANE],
         r_im[:, d * LANE : (d + 1) * LANE])
        for d in range(m)
    ]
    ys = fft4._clist_fft(leaves, inverse=True)
    return _cat_parts([y[0] for y in ys], bt, LANE, p_re.dtype)


def _pad_rows(v, before, after, hop):
    parts = []
    if before:
        parts.append(jnp.zeros((before, hop), v.dtype))
    parts.append(v)
    if after:
        parts.append(jnp.zeros((after, hop), v.dtype))
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else v


def _kernel(
    lr_ref,        # SMEM (1, 1)
    x0_ref,        # (1, rows, hop)
    tgt_ref,       # (1, t_pad, n_fft) lane-flat permuted
    pre0_re_ref,   # (1, t_pad, n_fft)
    pre0_im_ref,   # (1, t_pad, n_fft)
    *rest,
    block_t: int,
    n_fft: int,
    hop: int,
    fwd_p,
    inv_p,
    np_tables,
    n_iters: int,
    leaf_dots: bool,
):
    ntab = len(TABLE_KEYS) + 2  # + twtf_re/twtf_im flat twiddles
    tab_refs = rest[:ntab]
    win_ref, env_ref = rest[ntab : ntab + 2]
    outs = rest[ntab + 2 :]
    x_out_ref, pre_out_re_ref, pre_out_im_ref = outs[:3]
    slab_s, pre_re_s, pre_im_s, tail_s = outs[3:]

    K = n_fft // hop
    i = pl.program_id(1)
    t = pl.program_id(2)
    n_t = pl.num_programs(2)
    rd = jax.lax.rem(i, jnp.int32(2))
    wr = 1 - rd
    t0 = t * block_t
    keys = list(TABLE_KEYS) + ["twtf_re", "twtf_im"]
    tables = dict(np_tables)
    tables.update({k: r[...] for k, r in zip(keys, tab_refs)})
    window = win_ref[0, :]

    @pl.when(jnp.logical_and(i == 0, t == 0))
    def _init_x():
        slab_s[pl.ds(0, 1)] = x0_ref[...]

    sl = pl.ds(t0, block_t)

    @pl.when(i == 0)
    def _init_pre():
        pre_re_s[sl] = pre0_re_ref[0, sl]
        pre_im_s[sl] = pre0_im_ref[0, sl]

    # --- framing: ONE aligned (block_t + 8, hop) read; the K row shifts are
    # sublane rotations (pltpu.roll) of the loaded value — Mosaic cannot
    # prove alignment of a t0 + j row load, and value slices at different
    # sublane offsets cannot lane-concat, but rolled values carry offset 0.
    win8 = slab_s[pl.ds(rd, 1), pl.ds(t0, block_t + 8), :][0]
    frames = jnp.concatenate(
        [
            (win8 if j == 0 else pltpu.roll(win8, block_t + 8 - j, 0))[
                :block_t
            ]
            for j in range(K)
        ],
        axis=1,
    ) * window

    s_re, s_im = fwd_lane(frames, tables, fwd_p, leaf_dots)

    lr = lr_ref[0, 0]
    s_re = s_re - lr * pre_re_s[sl]
    s_im = s_im - lr * pre_im_s[sl]
    pre_re_s[sl] = s_re
    pre_im_s[sl] = s_im

    @pl.when(i == n_iters - 1)
    def _emit_pre():
        pre_out_re_ref[0, sl] = s_re
        pre_out_im_ref[0, sl] = s_im

    norm = jnp.sqrt(s_re * s_re + s_im * s_im) + PROJ_EPS
    gain = tgt_ref[0, sl] / norm
    fr = inv_lane(s_re * gain, s_im * gain, tables, inv_p, leaf_dots)
    frw = fr * window

    # --- OLA: local accumulation + one aligned store + carry tail
    acc = None
    for j in range(K):
        term = _pad_rows(
            frw[:, j * hop : (j + 1) * hop], j, K - 1 - j, hop
        )
        acc = term if acc is None else acc + term        # (bt + K - 1, hop)

    tail_prev = tail_s[pl.ds(0, K - 1), :]
    live = (t != 0).astype(jnp.float32)
    head = acc[:block_t] + _pad_rows(
        tail_prev * live, 0, block_t - (K - 1), hop
    )
    slab_s[pl.ds(wr, 1), sl, :] = head[None]
    tail_s[pl.ds(0, K - 1), :] = acc[block_t:]

    @pl.when(t == n_t - 1)
    def _finish():
        slab_s[pl.ds(wr, 1), pl.ds(t0 + block_t, K - 1), :] = acc[block_t:][
            None
        ]
        idx = (pl.ds(wr, 1), slice(None), slice(None))
        slab_s[idx] = slab_s[idx] * env_ref[...]

    @pl.when(jnp.logical_and(i == n_iters - 1, t == n_t - 1))
    def _emit():
        x_out_ref[...] = slab_s[pl.ds(wr, 1)]


@functools.partial(
    jax.jit,
    static_argnames=("cfg", "n_iters", "block_t", "precision", "leaf_dots"),
)
def launch_lane2d(x2d, pre_re, pre_im, target, window, env2d, lr, cfg,
                  n_iters, block_t, precision, leaf_dots):
    B, t_pad, n_fft = target.shape
    hop = cfg.hop_length
    K = n_fft // hop
    rows = t_pad + 8  # K-1 OLA spill rows, padded to 8 for aligned framing reads
    n_t = t_pad // block_t
    tables = fft4.fourstep_tables(n_fft, cfg.normalized)
    m = n_fft // LANE
    tables = dict(tables)
    tables["twtf_re"] = tables["twt_re"].reshape(1, m * LANE)
    tables["twtf_im"] = tables["twt_im"].reshape(1, m * LANE)
    keys = list(TABLE_KEYS) + ["twtf_re", "twtf_im"]
    np_tables = {k: v for k, v in tables.items() if k not in keys}
    fwd_p, inv_p = split_schemes(precision)
    kernel = functools.partial(
        _kernel, block_t=block_t, n_fft=n_fft, hop=hop,
        fwd_p=fwd_p, inv_p=inv_p, np_tables=np_tables, n_iters=n_iters,
        leaf_dots=leaf_dots,
    )
    grid = (B, n_iters, n_t)
    whole = lambda b, i, t: (b, 0, 0)  # noqa: E731
    sig = pl.BlockSpec((1, rows, hop), whole)
    blk = pl.BlockSpec((1, t_pad, n_fft), whole)
    plane = jax.ShapeDtypeStruct((B, t_pad, n_fft), jnp.float32)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),
            sig, blk, blk, blk,
            *[
                pl.BlockSpec(tables[k].shape, lambda b, i, t: (0, 0))
                for k in keys
            ],
            pl.BlockSpec((1, n_fft), lambda b, i, t: (0, 0)),
            pl.BlockSpec((1, rows, hop), lambda b, i, t: (0, 0, 0)),
        ],
        out_specs=[sig, blk, blk],
        out_shape=[
            jax.ShapeDtypeStruct((B, rows, hop), jnp.float32), plane, plane,
        ],
        scratch_shapes=[
            pltpu.VMEM((2, rows, hop), jnp.float32),
            pltpu.VMEM((t_pad, n_fft), jnp.float32),
            pltpu.VMEM((t_pad, n_fft), jnp.float32),
            pltpu.VMEM((max(8, K - 1), hop), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
    )(
        jnp.asarray(lr, jnp.float32).reshape(1, 1),
        x2d, target, pre_re, pre_im,
        *[jnp.asarray(tables[k]) for k in keys],
        jnp.asarray(window, jnp.float32).reshape(1, n_fft),
        env2d.reshape(1, rows, hop),
    )
    return out


def build_inputs(seconds, n_fft=2048, block_t=None, seed=7):
    rng = np.random.default_rng(seed)
    win = np.hanning(n_fft + 1)[:-1].astype(np.float32)
    cfg, w = canonicalize(
        n_fft // 2 + 1, np.float32, window=win, pad_mode="constant"
    )
    wj = jnp.asarray(w)
    clip = rng.standard_normal((1, SR * seconds)).astype(np.float32)
    spec = stft_ops.stft(jnp.asarray(clip), cfg, wj)
    mag_tm = jnp.abs(spec).astype(jnp.float32)
    B, T, F = mag_tm.shape
    geo = make_geometry4(cfg, T, block_t=block_t)
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
    return cfg, wj, geo, target_p, pre_re, pre_im, x_pad, inv_env, lr


def to_lane(p):
    B, t_pad, m, lane = p.shape
    return p.reshape(B, t_pad, m * lane)


def to_rows(flat, rows, hop):
    """(B, lx) flat signal/envelope -> (B, rows, hop) hop-row slab, zero-padded."""
    B, lx = flat.shape
    pad = rows * hop - lx
    return jnp.pad(flat, ((0, 0), (0, pad))).reshape(B, rows, hop)


def main():
    rounds = 5
    if "--rounds" in sys.argv:
        rounds = int(sys.argv[sys.argv.index("--rounds") + 1])
    parity_only = "--parity-only" in sys.argv

    # ---- parity: short clip, few iters, vs production fused_gl_run
    cfg, wj, geo, tgt, pre_re, pre_im, x_pad, inv_env, lr = build_inputs(1)
    rows = geo.t_pad + 8
    hop = cfg.hop_length
    lx = x_pad.shape[-1]
    ref = fused_gl_run(
        x_pad, pre_re, pre_im, tgt, wj, inv_env, lr, cfg, geo.e,
        n_iters=4, block_t=geo.block_t, emit_state=True, with_mag=False,
    )
    out = launch_lane2d(
        to_rows(x_pad, rows, hop),
        to_lane(pre_re), to_lane(pre_im), to_lane(tgt),
        wj.astype(jnp.float32),
        to_rows(inv_env.reshape(1, -1), rows, hop),
        lr, cfg, 4, geo.block_t, jax.lax.Precision.HIGH, True,
    )
    x_ref = readback(ref[0])
    x_new = readback(out[0]).reshape(1, -1)[:, :lx]
    err = float(np.max(np.abs(x_ref - x_new)))
    pre_err = float(
        np.max(np.abs(readback(ref[1]) - readback(out[1]).reshape(
            pre_re.shape)))
    )
    print(json.dumps({
        "check": "parity", "max_abs_x": err, "max_abs_pre": pre_err,
        "bitwise": bool(err == 0.0 and pre_err == 0.0),
    }), flush=True)
    for leaf in (True, False):
        o2 = launch_lane2d(
            to_rows(x_pad, rows, hop),
            to_lane(pre_re), to_lane(pre_im), to_lane(tgt),
            wj.astype(jnp.float32),
            to_rows(inv_env.reshape(1, -1), rows, hop),
            lr, cfg, 4, geo.block_t, jax.lax.Precision.HIGH, leaf,
        )
        e2 = float(
            np.max(np.abs(x_ref - readback(o2[0]).reshape(1, -1)[:, :lx]))
        )
        print(json.dumps({"check": f"parity_leaf={leaf}", "max_abs_x": e2}),
              flush=True)
    if parity_only:
        return

    # ---- perf: north star (10 s), marginal 100 vs 400, interleaved
    cfg, wj, geo, tgt, pre_re, pre_im, x_pad, inv_env, lr = build_inputs(10)
    rows_ns = geo.t_pad + 8
    tgt_l, pre_re_l, pre_im_l = to_lane(tgt), to_lane(pre_re), to_lane(pre_im)
    x2d = to_rows(x_pad, rows_ns, cfg.hop_length)
    env2d = to_rows(inv_env.reshape(1, -1), rows_ns, cfg.hop_length)

    variants = {}
    variants["prod"] = lambda it: fused_gl_run(
        x_pad, pre_re, pre_im, tgt, wj, inv_env, lr, cfg, geo.e,
        n_iters=it, block_t=geo.block_t, emit_state=True, with_mag=False,
    )[0]
    for leaf in (True, False):
        for bt in (64, 128):
            if geo.t_pad % bt:
                continue
            name = f"lane2d_{'leaf' if leaf else 'merge'}_bt{bt}"
            variants[name] = (
                lambda it, leaf=leaf, bt=bt: launch_lane2d(
                    x2d, pre_re_l, pre_im_l, tgt_l,
                    wj.astype(jnp.float32), env2d, lr, cfg, it, bt,
                    jax.lax.Precision.HIGH, leaf,
                )[0]
            )

    for name, fn in variants.items():
        for it in (100, 400):
            readback(fn(it))
        print(f"# traced {name}", flush=True)

    marg = {n: [] for n in variants}
    for r in range(rounds):
        for name, fn in variants.items():
            t0 = time.perf_counter()
            readback(fn(100))
            t_lo = time.perf_counter() - t0
            t0 = time.perf_counter()
            readback(fn(400))
            t_hi = time.perf_counter() - t0
            marg[name].append((t_hi - t_lo) / 300 * 1e6)
        print(f"# round {r} done", flush=True)

    for name in variants:
        ms = sorted(marg[name])
        print(json.dumps({
            "variant": name, "us_per_iter": round(ms[len(ms) // 2], 2),
        }), flush=True)


if __name__ == "__main__":
    main()
