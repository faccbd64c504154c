"""Whole-run fused GL/ADMM — lane-major spectrum + 2D hop-row signal slab.

Drop-in engine behind :func:`.gl_fullrun4.fused_gl_run` and
:func:`.admm_fused4.fused_admm_run` (same grid = (B, n_iters, n_t), same
VMEM-resident state, same feature set: clip packing, t-blocked plane
streaming, emit_state/with_mag, all four pad modes) with the two relayout
hotspots of the (m, 128)-plane design removed.  Round-4 attribution
(scripts/exp_fullrun_attrib.py) decomposed the old ~70 us/iter north star
into OLA ~35.5 us + m-stage ~29.6 us, both RELAYOUT costs, not math:

  * the m-point stage sliced (bt, m, 128) arrays along the SUBLANE m axis
    (a stride-m sublane gather per slice) and concatenated m such slices
    back — two full relayouts per direction;
  * overlap-add read-modify-wrote the flat (1, Lx) slab K = n_fft/hop times
    per block with (1, bt*hop) <-> (bt, hop) relayouts and a serial RAW
    chain between the passes.

This kernel has zero sublane relayouts in the hot path:

  * frames and spectrum stay (rows, n_fft) LANE-major; the radix m-stage's
    leaves are 128-aligned lane slices (free vreg column selects) — see
    :func:`.fft4.fwd4_lane` / :func:`.fft4.inv4_real_lane`; spectrum planes
    use the lane-flat layout (t, 128*d + e), a free driver-side reshape of
    the permuted (t, m, 128) layout;
  * the Karatsuba W128 dots run per 128-lane leaf ((bt, 128) @ (128, 128)),
    avoiding the (bt, m*128) -> (bt*m, 128) merge relayout (measured ~2x
    the kernel residue at m=16);
  * the signal slab is a 2D (rows, hop) hop-row layout: framing is ONE
    aligned (block_t + 8, hop) read per clip + K-1 sublane rotations
    (pltpu.roll — Mosaic cannot prove alignment of a t0+j row load, and
    value slices at different sublane offsets cannot lane-concat, but
    rolled values carry offset 0); overlap-add is a LOCAL
    (block_t + K - 1, hop) accumulation + one aligned block store + a
    (K-1, hop) carry tail in scratch — no slab RMW, no zeroing pass.

Numerics are bitwise-identical to the (m, 128) kernels: the radix
expression tree, twiddles, dot contractions, projection and epilogue run
the same ops in the same order (the OLA regrouping only commutes the final
two-operand add per boundary row), validated bitwise in
scripts/exp_lane2d.py and tests/test_pallas.py.  North star measured
28.8 us/iter median vs ~116 us for the (m, 128) whole-run kernel in the
same session (serialized compute floor ~26 us — see benchmarks.md).

Requires ``hop | n_fft`` (the hop-row slab) on top of the usual 128 | hop;
the dispatchers fall back to the (m, 128) kernels otherwise.

Reference semantics: hot loop of /root/reference/torch_specinv/methods.py
:241-248 (GL) and :464-477 (ADMM), momentum/projection constants at
:235,246.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import STFTConfig
from . import fft4
from .gl_fused import LANE, PROJ_EPS, _anti_identity, split_schemes

TABLE_KEYS = fft4.LANE_TABLE_KEYS


def ext_rows(K: int) -> int:
    """Extra slab rows past t_pad: the K-1 OLA spill rows, padded up so the
    framing window read (block_t + ext sublanes) stays 8-aligned."""
    return max(8, -(-(K - 1) // 8) * 8)


def _roundup(v: int, q: int) -> int:
    return -(-v // q) * q


def _pad_rows(v, before: int, after: int, hop: int):
    parts = []
    if before:
        parts.append(jnp.zeros((before, hop), v.dtype))
    parts.append(v)
    if after:
        parts.append(jnp.zeros((after, hop), v.dtype))
    return jnp.concatenate(parts, axis=0) if len(parts) > 1 else v


def _pipe_ok() -> bool:
    """Master switch for the cross-block software pipeline in
    :func:`_kernel` — OFF by default: no pipelined schedule beat the
    serial one on hardware (round 5), so the serial schedule ships.  The
    pipeline code and its bitwise tests remain as the record and the A/B
    valve.

    Measured at the GL north star (interleaved same-session marginals,
    min-of-rounds; serial = 28.4 µs/iter const / 29.6 reflect):

    * HALF-BLOCK split — two 32-row t-halves, phases reordered inside one
      grid step: **+3.2 µs/iter** (scripts/exp_r5_split.py).  Halving the
      Karatsuba leaf-dot row count costs more MXU pipeline drain than the
      overlap recovers.
    * IN-KERNEL-FORI cross-block pipeline (this code) — grid (G,
      n_iters), t loop in a fori, fwd(t) + back-half(t-1) per step with
      the forward spectrum as a loop carry: **neutral** (29.49 vs 29.63
      reflect, 28.48 vs 28.44 const — inside session noise;
      scripts/exp_r5_pipe.py).  The MXU/VPU overlap the probe measured
      for register-resident chains (1.5x at (64, 128) ~32 KB values,
      scripts/exp_r5_overlap.py) does not materialize at phase-sized
      (~1 MB) cross-block operands, which round-trip through VMEM either
      way.

    Conclusion recorded in benchmarks.md: the serial schedule IS the
    right schedule at these operand sizes — the lane engine sits at its
    ~26 µs serialized compute floor, and the 18-20 µs
    perfectly-overlapped bound is not reachable by instruction-level
    scheduling on this hardware generation.  Serial stays default (equal
    speed, half the trace/compile size — the pipeline instantiates the
    back half twice).
    """
    return False


def _fast_repad_plan(pad_mode: str, p_amt: int, e: int, hop: int, rows_c: int):
    """Static plan for :func:`_repad_rows_fast`, or None -> flat fallback.

    Per side: the written flat range [f_lo, f_hi], its affine source map
    (``src(f) = a - f`` for reflect, ``src(f) = f + b`` for wrap), and the
    8-aligned output/source row windows.  All arithmetic is python-static
    (p_amt/e/hop are trace constants), so the kernel's reads/stores carry
    static offsets and the row-select matrices are numpy constants.
    """
    if pad_mode not in ("reflect", "wrap") or not p_amt:
        return None
    if rows_c % 8:
        return None
    reflect = pad_mode == "reflect"

    def side(f_lo, f_hi, coef):
        # coef = a (reflect, src = a - f) or b (wrap, src = f + b)
        r0, r1 = f_lo // hop, f_hi // hop
        w_start = r0 - r0 % 8
        w_cnt = _roundup(r1 + 1 - w_start, 8)
        ends = (coef - f_lo, coef - f_hi) if reflect else (
            f_lo + coef, f_hi + coef)
        s_lo, s_hi = min(ends), max(ends)
        if s_lo < 0 or s_hi >= rows_c * hop:
            return None
        s_r0 = s_lo // hop
        s_start = s_r0 - s_r0 % 8
        s_cnt = _roundup(s_hi // hop + 1 - s_start, 8)
        if s_start + s_cnt > rows_c:
            s_start = rows_c - s_cnt
            if s_start < 0:
                return None
        return dict(f_lo=f_lo, f_hi=f_hi, coef=coef, w_start=w_start,
                    w_cnt=w_cnt, s_start=s_start, s_cnt=s_cnt)

    left = side(0, p_amt - 1, 2 * p_amt if reflect else e - p_amt + 1)
    right = side(e + 1, e + p_amt, 2 * e if reflect else p_amt - e - 1)
    if left is None or right is None:
        return None
    # Disjoint 8-aligned stores (left store must not be reverted by the
    # right store's passthrough of pre-store values, and vice versa).
    if right["w_start"] < left["w_start"] + left["w_cnt"]:
        return None
    if right["w_start"] + right["w_cnt"] > rows_c:
        return None
    if left["w_start"] + left["w_cnt"] > rows_c:
        return None
    return {"reflect": reflect, "left": left, "right": right}


def _row_select(plan_side, hop: int, reflect: bool):
    """(R1, R2) 0/1 row-select factors for one side (see _repad_rows_fast):
    out row i of the output window reads source-window row ``R1`` when the
    lane is below the split, ``R2`` above it.

    Because the source row is affine in the output row, each factor is a
    single (anti-)diagonal band — built IN-KERNEL from iota comparisons
    (Pallas rejects captured array constants), masked to the rows actually
    written."""
    w_start, w_cnt = plan_side["w_start"], plan_side["w_cnt"]
    s_start, s_cnt = plan_side["s_start"], plan_side["s_cnt"]
    coef = plan_side["coef"]
    r_lo = plan_side["f_lo"] // hop - w_start   # window-relative write rows
    r_hi = plan_side["f_hi"] // hop - w_start
    ii = jax.lax.broadcasted_iota(jnp.int32, (w_cnt, s_cnt), 0)
    jj = jax.lax.broadcasted_iota(jnp.int32, (w_cnt, s_cnt), 1)
    row_ok = jnp.logical_and(ii >= r_lo, ii <= r_hi)
    if reflect:
        d1 = coef // hop - w_start - s_start    # j + i == d1
        band1, band2 = ii + jj == d1, ii + jj == d1 - 1
    else:
        d1 = w_start + coef // hop - s_start    # j - i == d1
        band1, band2 = jj - ii == d1, jj - ii == d1 + 1
    one, zero = jnp.float32(1.0), jnp.float32(0.0)
    R1 = jnp.where(jnp.logical_and(row_ok, band1), one, zero)
    R2 = jnp.where(jnp.logical_and(row_ok, band2), one, zero)
    return R1, R2


def _perm_dot3(x, p_bf16):
    """EXACT permutation matmul in 3 bf16 MXU passes (vs HIGHEST's 6).

    ``p_bf16`` is a 0/1 permutation matrix (bf16-exact).  The f32 operand
    splits into three bf16 chunks that reconstruct it exactly (each
    remainder is computed exactly in f32 — the chunk is within a factor 2
    of it — and the last remainder has <= 8 mantissa bits left, so it is
    bf16-representable); each pass permutes one chunk exactly (single 0/1
    products, f32 accumulate), and the f32 re-sum is exact for the same
    disjoint-mantissa reason.  Verified bitwise against the HIGHEST dot by
    test_lane_fast_repad_bitwise_vs_flat.
    """
    d = lambda a: jax.lax.dot_general(  # noqa: E731
        a, p_bf16, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    xh = x.astype(jnp.bfloat16)
    r1 = x - xh.astype(jnp.float32)
    xm = r1.astype(jnp.bfloat16)
    xl = (r1 - xm.astype(jnp.float32)).astype(jnp.bfloat16)
    return (d(xh) + d(xm)) + d(xl)


def _repad_rows_fast(
    slab_s, wr, anti_ref, plan, p_amt: int, e: int, hop: int,
    base: int,
):
    """Hop-row-layout edge re-pad: no flatten relayouts, no (p, p) table.

    Per side, the affine pad map splits into (source-row select) x
    (lane permutation): the lane permutation is one shared (hop, hop)
    anti-identity dot (reflect only) plus a static ``pltpu.roll`` lane
    rotation, the row select is a tiny 0/1 matmul, and the split between
    the two candidate source rows is a lane-iota select.  Values are exact
    copies (0/1 matmuls in HIGHEST), so waveforms stay bitwise identical
    to the flat `_repad_rows_flat` path; measured ~6-12 us/iter faster at
    the reflect north star (scripts/exp_r5_gap.py attribution).

    Reads of both sides happen before either store (matching
    models/_pallas_driver.repad_edges, which computes left and right from
    the pre-write signal).
    """
    row = pl.ds(wr, 1)
    reflect = plan["reflect"]
    hi = jax.lax.Precision.HIGHEST

    def compute(ps):
        w_start, w_cnt = ps["w_start"], ps["w_cnt"]
        s_start, s_cnt = ps["s_start"], ps["s_cnt"]
        coef, f_lo, f_hi = ps["coef"], ps["f_lo"], ps["f_hi"]
        xwin = slab_s[row, pl.ds(base + s_start, s_cnt), :][0]
        if reflect:
            # W[q, c] = X[q, (coef - c) mod hop]: lane flip + static rotate.
            # The flip is an EXACT 3-pass bf16 permutation dot (the table
            # is 0/1 and stored bf16) — half the MXU passes of HIGHEST.
            y = _perm_dot3(xwin, anti_ref[...])
            w = pltpu.roll(y, jnp.int32((coef + 1) % hop), 1)
            split = coef % hop  # lanes c <= split read row q1
            lane_cond_leq = True
        else:
            # W[q, c] = X[q, (c + coef) mod hop]: static rotate only
            w = pltpu.roll(xwin, jnp.int32((-coef) % hop), 1)
            split = hop - (coef % hop)  # lanes c < split read row q1
            lane_cond_leq = False
        R1, R2 = _row_select(ps, hop, reflect)
        a1 = jnp.dot(R1, w, preferred_element_type=jnp.float32, precision=hi)
        a2 = jnp.dot(R2, w, preferred_element_type=jnp.float32, precision=hi)
        lane = jax.lax.broadcasted_iota(jnp.int32, (w_cnt, hop), 1)
        if lane_cond_leq:
            computed = jnp.where(lane <= split, a1, a2)
        else:
            computed = jnp.where(lane < split, a1, a2)
        cur = slab_s[row, pl.ds(base + w_start, w_cnt), :][0]
        flat = (
            jax.lax.broadcasted_iota(jnp.int32, (w_cnt, hop), 0) + w_start
        ) * hop + lane
        mask = jnp.logical_and(flat >= f_lo, flat <= f_hi)
        return w_start, w_cnt, jnp.where(mask, computed, cur)

    # all reads before either store (compute() reads xwin + cur)
    done = [compute(plan[s]) for s in ("left", "right")]
    for (w_start, w_cnt, val) in done:
        slab_s[row, pl.ds(base + w_start, w_cnt), :] = val[None]


def _repad_rows_flat(
    slab_s, wr, jrev_ref, pad_mode: str, p_amt: int, e: int, hop: int,
    base: int, rows_c: int,
):
    """Edge re-pad of one clip's (rows_c, hop) slab region (flat fallback;
    also the only implementation for pad_mode='edge', whose broadcasts are
    already cheap).

    The pad regions live at samples [0, p_amt) and [e+1, e+1+p_amt) of the
    clip's flat coordinates; their sources depend on ``pad_mode`` (mirrors
    models/_pallas_driver.repad_edges, values exact — copies, a 0/1
    permutation matmul, or broadcasts).  The strips holding those regions
    are loaded as aligned row windows, flattened to (1, N) values (the only
    — tiny — relayouts in the kernel), rewritten, and stored back.
    """
    if not p_amt or pad_mode == "constant":
        return
    row = pl.ds(wr, 1)
    lt_cnt = min(rows_c, _roundup(-(-(2 * p_amt + 1) // hop), 8))
    r0 = max(0, (e - p_amt) // hop // 8 * 8)
    rt_cnt = min(rows_c - r0, _roundup(-(-(e + 1 + p_amt) // hop) - r0, 8))

    def flat(r_start, cnt):
        v = slab_s[row, pl.ds(base + r_start, cnt), :][0]
        return v.reshape(1, cnt * hop)

    def store(r_start, cnt, v):
        slab_s[row, pl.ds(base + r_start, cnt), :] = v.reshape(cnt, hop)[
            None
        ]

    def edges(lt, rt, off):
        """(left, right) pad values from the left/right flat strips; ``off``
        is the right strip's sample offset."""
        if pad_mode == "reflect":
            jm = jrev_ref[...]
            hi = jax.lax.Precision.HIGHEST
            left = jnp.dot(
                lt[:, p_amt + 1 : 2 * p_amt + 1], jm,
                preferred_element_type=jnp.float32, precision=hi,
            )
            right = jnp.dot(
                rt[:, e - p_amt - off : e - off], jm,
                preferred_element_type=jnp.float32, precision=hi,
            )
        elif pad_mode == "edge":
            # broadcast from a direct (1, 1, 1) ref read: broadcasting a
            # lane-slice of the big flattened strip value crashes the
            # Mosaic compiler (subprocess exit), the ref-read form is what
            # the (m, 128) kernels lower fine
            lv = slab_s[
                row, pl.ds(base + p_amt // hop, 1), pl.ds(p_amt % hop, 1)
            ]
            rv = slab_s[row, pl.ds(base + e // hop, 1), pl.ds(e % hop, 1)]
            left = jnp.broadcast_to(lv.reshape(1, 1), (1, p_amt))
            right = jnp.broadcast_to(rv.reshape(1, 1), (1, p_amt))
        else:  # wrap / circular
            left = rt[:, e - p_amt + 1 - off : e + 1 - off]
            right = lt[:, p_amt : 2 * p_amt]
        return left, right

    def cat(parts):
        """Lane-concat, skipping zero-width pieces (a pad region ending
        exactly at the strip boundary produces a (1, 0) slice, which Mosaic
        rejects as a vector type)."""
        live = [p for p in parts if p.shape[-1]]
        return live[0] if len(live) == 1 else jnp.concatenate(live, axis=1)

    if r0 >= lt_cnt:
        # disjoint strips: read both, rewrite both (reads before writes,
        # like the flat version — the strips don't alias)
        lt = flat(0, lt_cnt)
        rt = flat(r0, rt_cnt)
        off = r0 * hop
        left, right = edges(lt, rt, off)
        store(0, lt_cnt, cat([left, lt[:, p_amt:]]))
        store(
            r0, rt_cnt,
            cat([rt[:, : e + 1 - off], right, rt[:, e + 1 + p_amt - off :]]),
        )
    else:
        # short clip: one combined strip covering both regions
        cnt = min(rows_c, max(lt_cnt, r0 + rt_cnt))
        st = flat(0, cnt)
        left, right = edges(st, st, 0)
        store(
            0, cnt,
            cat([left, st[:, p_amt : e + 1], right, st[:, e + 1 + p_amt :]]),
        )


def _kernel(
    scalar_ref,    # SMEM (1, 1) — lr (GL) or rho (ADMM)
    x0_ref,        # (1, pack*rows_c, hop) hop-row slabs, t-padded
    tgt_ref,       # (1, pack*t_pad, n_fft) lane-flat, t-block-major packed
    st0_re_ref,    # (1, pack*t_pad, n_fft) initial state (pre / Y)
    st0_im_ref,
    *rest,
    algo: str,
    block_t: int,
    n_fft: int,
    hop: int,
    K: int,
    ext: int,
    rows_c: int,
    pad_mode: str,
    p_amt: int,
    e: int,
    repad_plan,
    fwd_p,
    inv_p,
    np_tables,
    n_iters: int,
    emit_state: bool,
    with_mag: bool,
    with_loss: bool,
    t_blocked: bool,
    pack: int,
    valid_t: int,
    leaf_dots: bool,
    pipe: bool,
    n_t_static: int,
):
    ntab = len(TABLE_KEYS)
    tab_refs = rest[:ntab]
    win_ref, env_ref, jrev_ref = rest[ntab : ntab + 3]
    j = ntab + 3
    if with_loss:
        wloss_ref = rest[j]
        j += 1
    outs = rest[j:]
    x_out_ref = outs[0]
    k = 1
    if emit_state:
        st_out_re_ref, st_out_im_ref = outs[k : k + 2]
        k += 2
    if with_mag:
        mag_ref = outs[k]
        k += 1
    if with_loss:
        loss_ref = outs[k]
        k += 1
    slab_s, st_re_s, st_im_s, tail_s = outs[k:]

    i = pl.program_id(1)
    if pipe:
        # 2D grid (G, n_iters): the t loop lives IN-KERNEL (below) so
        # consecutive blocks share one instruction stream
        t = None
        n_t = n_t_static
    else:
        t = pl.program_id(2)
        n_t = pl.num_programs(2)
    rd = jax.lax.rem(i, jnp.int32(2))  # framing reads slab[rd] ...
    wr = 1 - rd                        # ... OLA writes slab[wr]
    window = win_ref[0, :]
    tables = dict(np_tables)
    tables.update({k: r[...] for k, r in zip(TABLE_KEYS, tab_refs)})

    def _init_cond():
        return i == 0 if pipe else jnp.logical_and(i == 0, t == 0)

    @pl.when(_init_cond())
    def _init_x():
        # BOTH buffers: OLA + tail only ever write rows [0, t_pad + K - 1)
        # per clip; the remaining ext slack rows must still be defined
        # (framing windows over-read them — values discarded by the roll
        # slice — and the emitted x trims them), and with the envelope
        # applied inline at the OLA stores (below) there is no whole-slab
        # pass left to zero them.  x0 arrives zero-padded, so copying it
        # into both buffers pins the slack rows to 0 for the whole run.
        slab_s[pl.ds(0, 1)] = x0_ref[...]
        slab_s[pl.ds(1, 1)] = x0_ref[...]

    # Packed planes are t-block-major (rows [(t*pack + c)*block_t + r] hold
    # clip c's frame t*block_t + r), so step t's rows for all packed clips
    # are one contiguous slice.
    @pl.when(i == 0)
    def _init_state():
        if pipe:  # whole plane at once (always resident under pipe)
            st_re_s[...] = st0_re_ref[0]
            st_im_s[...] = st0_im_ref[0]
        else:
            sl = pl.ds(t * pack * block_t, pack * block_t)
            st_re_s[sl] = st0_re_ref[0] if t_blocked else st0_re_ref[0, sl]
            st_im_s[sl] = st0_im_ref[0] if t_blocked else st0_im_ref[0, sl]

    # ------------------------------------------------------------------
    # Cross-block software pipeline (round 5).  Serial (``pipe=False``),
    # each grid step runs [fwd(t) -> project(t) -> inv(t) -> OLA(t)] — the
    # MXU idles during every VPU phase (framing, radix stages, projection,
    # OLA) because each phase consumes the previous one's outputs.
    # Pipelined, the t loop moves IN-KERNEL (grid = (G, n_iters)) and each
    # fori step runs **fwd(t)** then **the full back half of block t-1**
    # with the forward spectrum carried as a loop value: the previous
    # block's VPU phases execute while this block's Karatsuba dots occupy
    # the MXU, and its inverse dots queue behind them, keeping the MXU fed
    # (measured 1.5x per chain step for interleaved dot->vpu chains in a
    # fori body, scripts/exp_r5_overlap.py).  In-kernel fori rather than
    # grid steps is load-bearing: a grid-step variant of the same schedule
    # (pending spectrum through double-buffered scratch, predicated
    # boundary handling) measured a ~9 µs/iter REGRESSION — grid-step
    # sequencing barriers + predication + the scratch roundtrip cost more
    # than the overlap recovers (scripts/exp_r5_pipe.py, round-5 notes in
    # benchmarks.md); the RTISI multi-frame kernel's 2x established the
    # same pattern.
    #
    # BITWISE-invariant: every block runs the identical ops in the
    # identical order relative to its own data; only the interleaving
    # across independent blocks changes, plus one exact-value refactor —
    # the inverse envelope multiplies each OLA store instead of the whole
    # slab at iteration end (same final sum, one multiply, same value).
    # Pinned by test_lane_pipe_bitwise.
    # ------------------------------------------------------------------

    def read_scr(scr, t_):
        return scr[pl.ds(t_ * pack * block_t, pack * block_t)]

    def write_scr(scr, t_, val):
        scr[pl.ds(t_ * pack * block_t, pack * block_t)] = val

    def rplane(ref, t_):
        if t_blocked:
            return ref[0]
        return ref[0, pl.ds(t_ * pack * block_t, pack * block_t)]

    def wplane(ref, t_, val):
        if t_blocked:
            ref[0] = val
        else:
            ref[0, pl.ds(t_ * pack * block_t, pack * block_t)] = val

    def p1(t_, rd_):
        """Forward half of block ``t_``: framing (one aligned
        (block_t + ext, hop) read per clip; the K row shifts are sublane
        rotations of the loaded value) + the four-step forward transform.
        """
        t0_ = t_ * block_t
        pieces = []
        for c in range(pack):
            base = c * rows_c
            win8 = slab_s[
                pl.ds(rd_, 1), pl.ds(base + t0_, block_t + ext), :
            ][0]
            fp = [
                (
                    win8 if j == 0
                    # i32 literal: a python-int shift weak-types to i64
                    # under jax_enable_x64; tpu.dynamic_rotate wants i32
                    else pltpu.roll(win8, jnp.int32(block_t + ext - j), 0)
                )[:block_t]
                for j in range(K)
            ]
            pieces.append(jnp.concatenate(fp, axis=1) if K > 1 else fp[0])
        frames = (
            jnp.concatenate(pieces, axis=0) if pack > 1 else pieces[0]
        ) * window
        return fft4.fwd4_lane(frames, tables, fwd_p, leaf_dots)

    scalar = scalar_ref[0, 0]

    def p2(t_, wr_, s_re, s_im):
        """Back half of block ``t_`` (iteration ``i``): eval emission,
        momentum/projection + state update, inverse transform, OLA."""
        t0_ = t_ * block_t
        if with_mag or with_loss:
            # Metric output = pre-update |stft(x)| (methods.py:242 /
            # 464-465), only needed for the final (eval) iteration.
            @pl.when(i == n_iters - 1)
            def _emit_mag():
                mg = jnp.sqrt(s_re * s_re + s_im * s_im)
                if with_mag:
                    wplane(mag_ref, t_, mg)
                if with_loss:
                    # Scalar eval stats instead of the full magnitude
                    # plane: row 0 = sum w*(|S|-tgt)^2, row 1 =
                    # sum w*|S|^2, over the valid (unpadded) frame rows —
                    # w is the Hermitian onesided weight (0.5 off the
                    # DC/Nyquist lanes), so the sums equal the XLA path's
                    # onesided-trimmed reductions exactly (up to f32
                    # summation order).  sc/snr/ser and the stop loss are
                    # all derivable from these two plus a target constant.
                    rows = pack * block_t
                    local = jax.lax.broadcasted_iota(
                        jnp.int32, (rows, n_fft), 0)
                    if rows != block_t:
                        local = jax.lax.rem(local, jnp.int32(block_t))
                    mgv = jnp.where(
                        (t0_ + local) < valid_t, mg, jnp.float32(0.0))
                    w = wloss_ref[0, :]
                    d = mgv - rplane(tgt_ref, t_)  # tgt zero on pads
                    s0 = jnp.sum(w * d * d)
                    s1 = jnp.sum(w * mgv * mgv)
                    part = jnp.concatenate(
                        [jnp.full((1, LANE), s0, jnp.float32),
                         jnp.full((1, LANE), s1, jnp.float32),
                         jnp.zeros((6, LANE), jnp.float32)], axis=0)
                    prev = jnp.where(
                        t_ == 0, jnp.float32(0.0), loss_ref[0])
                    loss_ref[0] = prev + part

        if algo == "gl":
            # momentum S - lr*pre (methods.py:243-244), then projection
            s_re = s_re - scalar * read_scr(st_re_s, t_)
            s_im = s_im - scalar * read_scr(st_im_s, t_)
            write_scr(st_re_s, t_, s_re)
            write_scr(st_im_s, t_, s_im)
            new_re, new_im = s_re, s_im
            norm = jnp.sqrt(s_re * s_re + s_im * s_im) + PROJ_EPS
            gain = rplane(tgt_ref, t_) / norm
            p_re = s_re * gain
            p_im = s_im * gain
        else:  # admm — DR-reduced chain (admm_fused4 module docstring)
            y_re = read_scr(st_re_s, t_)
            y_im = read_scr(st_im_s, t_)
            onep = 1.0 + scalar
            z_re = (scalar * y_re + s_re) / onep
            z_im = (scalar * y_im + s_im) / onep
            u_re = y_re - z_re
            u_im = y_im - z_im
            t_re = z_re - u_re
            t_im = z_im - u_im
            norm = jnp.sqrt(t_re * t_re + t_im * t_im) + PROJ_EPS
            gain = rplane(tgt_ref, t_) / norm
            yn_re = t_re * gain + u_re
            yn_im = t_im * gain + u_im
            # mask padded rows (ADMM's dual would give them Y != 0)
            rows = pack * block_t
            local = jax.lax.broadcasted_iota(jnp.int32, (rows, n_fft), 0)
            if rows != block_t:
                local = jax.lax.rem(local, jnp.int32(block_t))
            valid = (t0_ + local) < valid_t
            z = jnp.float32(0.0)
            yn_re = jnp.where(valid, yn_re, z)
            yn_im = jnp.where(valid, yn_im, z)
            write_scr(st_re_s, t_, yn_re)
            write_scr(st_im_s, t_, yn_im)
            new_re, new_im = yn_re, yn_im
            p_re, p_im = yn_re, yn_im

        if emit_state:
            @pl.when(i == n_iters - 1)
            def _emit_state():
                wplane(st_out_re_ref, t_, new_re)
                wplane(st_out_im_ref, t_, new_im)

        fr = fft4.inv4_real_lane(p_re, p_im, tables, inv_p, leaf_dots)
        fr = fr * window

        # --- overlap-add: local accumulation + one aligned store + carry
        # tail.  The accumulator is SEEDED with the previous block's carry
        # tail (zeros elsewhere / at t_ == 0) and the frame terms are
        # added in ascending-j order — the exact per-element add grouping
        # of the old slab-RMW loop (gl_fused4.ola_rows), so the layout
        # switch is bitwise, not just close.  The inverse envelope
        # multiplies the stored rows HERE (same final sums as the old
        # whole-slab pass at iteration end).
        for c in range(pack):
            frc = fr[c * block_t : (c + 1) * block_t] if pack > 1 else fr
            base = c * rows_c
            if K > 1:
                # select, not multiply: at t_ == 0 the tail scratch is
                # UNWRITTEN (NaN-filled in interpret mode, arbitrary on
                # hardware) and NaN * 0.0 would poison the whole head
                tail_prev = jnp.where(
                    t_ != 0, tail_s[c, pl.ds(0, K - 1), :], jnp.float32(0.0)
                )
                acc = _pad_rows(tail_prev, 0, block_t, hop)
            else:
                acc = None
            for j in range(K):
                term = _pad_rows(
                    frc[:, j * hop : (j + 1) * hop], j, K - 1 - j, hop
                )
                acc = term if acc is None else acc + term
            slab_s[pl.ds(wr_, 1), pl.ds(base + t0_, block_t), :] = (
                acc[:block_t] * env_ref[0, pl.ds(base + t0_, block_t), :]
            )[None]
            if K > 1:
                tail_s[c, pl.ds(0, K - 1), :] = acc[block_t:]

    def finish(wr_):
        """Iteration epilogue on slab ``wr_``: flush the OLA carry tail
        (envelope applied inline, matching the OLA stores) and re-apply
        the edge padding."""
        t0l = (n_t - 1) * block_t
        for c in range(pack):
            base = c * rows_c
            if K > 1:
                rowsl = pl.ds(base + t0l + block_t, K - 1)
                slab_s[pl.ds(wr_, 1), rowsl, :] = (
                    tail_s[c, pl.ds(0, K - 1), :]
                    * env_ref[0, rowsl, :]
                )[None]
            if repad_plan is not None:
                _repad_rows_fast(
                    slab_s, wr_, jrev_ref, repad_plan, p_amt, e, hop, base
                )
            else:
                _repad_rows_flat(
                    slab_s, wr_, jrev_ref, pad_mode, p_amt, e, hop, base,
                    rows_c,
                )

    if not pipe:
        s_re, s_im = p1(t, rd)
        p2(t, wr, s_re, s_im)

        @pl.when(t == n_t - 1)
        def _finish():
            finish(wr)

        @pl.when(jnp.logical_and(i == n_iters - 1, t == n_t - 1))
        def _emit():
            x_out_ref[...] = slab_s[pl.ds(wr, 1)]
        return

    # pipelined: one iteration per grid step, t in-kernel.  fwd(t) issues
    # before the back half of t-1 consumes the carried spectrum, so the
    # two blocks' MXU/VPU phases interleave in one instruction stream.
    s0 = p1(jnp.int32(0), rd)

    def body(t_, carry):
        sp_re, sp_im = carry
        s_re, s_im = p1(t_, rd)
        p2(t_ - 1, wr, sp_re, sp_im)
        return (s_re, s_im)

    s_last = jax.lax.fori_loop(1, n_t, body, s0)
    p2(jnp.int32(n_t - 1), wr, *s_last)
    finish(wr)

    @pl.when(i == n_iters - 1)
    def _emit_pipe():
        x_out_ref[...] = slab_s[pl.ds(wr, 1)]


def supports(cfg: STFTConfig, enabled: bool | None = None) -> bool:
    """Lane kernel needs the hop-row slab: hop | n_fft (on top of the
    dispatcher-level 128 | hop, 128 | n_fft).  ``SPECINV_FULLRUN_LANE=0``
    disables the engine (A/B safety valve; the (m, 128) kernels are
    bitwise-identical).

    ``enabled=None`` reads the env var HERE — which is trace time when the
    caller sits under jit, so flips after the first trace of a shape do
    nothing for that shape (the jit cache key excludes env vars).  Public
    wrappers read the env var eagerly per call and pass the result down as
    a static ``lane`` argument instead (same treatment as
    ``SPECINV_FULLRUN_STATS`` / ``stats_eval``)."""
    if enabled is None:
        import os

        enabled = os.environ.get("SPECINV_FULLRUN_LANE", "1") != "0"
    if not enabled:
        return False
    return (
        cfg.n_fft % cfg.hop_length == 0
        and cfg.hop_length % LANE == 0
        and cfg.n_fft % LANE == 0
    )


def fused_run_lane(
    algo: str,               # "gl" | "admm"
    x_pad: jnp.ndarray,      # (B, Lx) float32, padded coords
    st_re: jnp.ndarray,      # (B, t_pad, m, 128) permuted state (pre / Y)
    st_im: jnp.ndarray,
    target: jnp.ndarray,     # (B, t_pad, m, 128) permuted magnitude
    window: jnp.ndarray,
    inv_env: jnp.ndarray,    # (Lx,)
    scalar: jnp.ndarray,     # lr (GL) / rho (ADMM)
    cfg: STFTConfig,
    e: int,
    n_iters: int,
    valid_t: int = 0,        # ADMM row mask threshold (unused for GL)
    block_t: int = 64,
    interpret: bool = False,
    precision=jax.lax.Precision.HIGH,
    emit_state: bool = False,
    with_mag: bool = False,
    with_loss: bool = False,
    w_loss: jnp.ndarray | None = None,  # (n_fft,) lane-flat Hermitian weight
    pack: int = 1,
    leaf_dots: bool = True,
):
    """Run ``n_iters`` fused iterations in one launch -> final x_pad (B, Lx).

    Same contract as gl_fullrun4.fused_gl_run / admm_fused4.fused_admm_run
    (return order ``x[, st_re, st_im][, mag][, stats]``, permuted (m, 128)
    planes at the boundary); the lane-flat and hop-row layouts are internal.

    ``with_loss`` emits per-group eval stats (G, 8, 128) instead of (or next
    to) the magnitude plane: row 0 broadcasts ``sum w*(|S|-tgt)^2``, row 1
    ``sum w*|S|^2`` over the ``valid_t`` unpadded rows — enough for the stop
    loss and all three metrics without a plane readback (kernel docstring).
    Requires ``w_loss`` and ``valid_t > 0``.
    """
    B, t_pad, m, lanes = target.shape
    n_fft, hop = cfg.n_fft, cfg.hop_length
    assert lanes == LANE and m == n_fft // LANE
    assert t_pad % block_t == 0
    assert n_fft % hop == 0
    K = n_fft // hop
    assert block_t >= K - 1
    ext = ext_rows(K)
    rows_c = t_pad + ext
    lx = x_pad.shape[-1]
    assert lx == (t_pad - 1) * hop + n_fft
    assert pack >= 1 and B % pack == 0
    G = B // pack
    n_t = t_pad // block_t

    from .gl_fullrun4 import VMEM_BUDGET, VMEM_CEILING, plane_vmem_bytes

    lxr = rows_c * hop
    t_blocked = plane_vmem_bytes(
        pack * t_pad, pack * block_t, n_fft, pack * lxr,
        emit_state, with_mag, False,
    ) > VMEM_BUDGET
    if t_blocked and plane_vmem_bytes(
        pack * t_pad, pack * block_t, n_fft, pack * lxr,
        emit_state, with_mag, True,
    ) > VMEM_CEILING:
        raise ValueError(
            "clip too long for the whole-run kernel's VMEM state; use "
            "backend='pallas' or sequence parallelism"
        )

    def pack_planes(a):
        """(B, t_pad, m, L) -> (G, pack*t_pad, n_fft) lane-flat,
        t-block-major (see kernel)."""
        a = a.reshape(G, pack, n_t, block_t, n_fft)
        return jnp.swapaxes(a, 1, 2).reshape(G, pack * t_pad, n_fft)

    def unpack_planes(a):
        a = a.reshape(G, n_t, pack, block_t, n_fft)
        return jnp.swapaxes(a, 1, 2).reshape(B, t_pad, m, LANE)

    def to_rows(flat):
        """(B, lx) -> (G, pack*rows_c, hop) hop-row slabs."""
        pad = lxr - flat.shape[-1]
        r = jnp.pad(flat.astype(jnp.float32), ((0, 0), (0, pad)))
        return r.reshape(G, pack * rows_c, hop)

    def env_rows(env):
        """(lx,) envelope -> (1, pack*rows_c, hop), tiled across the pack."""
        r = jnp.pad(env.astype(jnp.float32).reshape(1, -1),
                    ((0, 0), (0, lxr - lx)))
        return jnp.tile(r, (1, pack)).reshape(1, pack * rows_c, hop)

    tables = fft4.fourstep_tables(n_fft, cfg.normalized)
    np_tables = {k: v for k, v in tables.items() if k not in TABLE_KEYS}
    p_amt = cfg.pad_amount
    pad_mode = cfg.jnp_pad_mode
    repad_plan = _fast_repad_plan(pad_mode, p_amt, e, hop, rows_c)
    if repad_plan is not None and repad_plan["reflect"]:
        # bf16 storage: 0/1 is bf16-exact and _perm_dot3 needs it split-free
        jrev = jnp.asarray(_anti_identity(hop), jnp.bfloat16)
    elif p_amt and pad_mode == "reflect":
        jrev = _anti_identity(p_amt)     # flat-fallback (p, p) reversal
    else:
        jrev = np.zeros((8, LANE), np.float32)

    if with_loss:
        assert w_loss is not None and valid_t > 0

    # Cross-block pipeline gating (see the kernel's pipeline comment):
    # resident planes only — the t loop moves in-kernel, which forgoes the
    # grid's revolving window DMA the t_blocked layout depends on.
    pipe = _pipe_ok() and not t_blocked

    fwd_p, inv_p = split_schemes(precision)
    kernel = functools.partial(
        _kernel, algo=algo, block_t=block_t, n_fft=n_fft, hop=hop,
        K=K, ext=ext, rows_c=rows_c,
        pad_mode=pad_mode, p_amt=p_amt, e=e, repad_plan=repad_plan,
        fwd_p=fwd_p, inv_p=inv_p, np_tables=np_tables, n_iters=n_iters,
        emit_state=emit_state, with_mag=with_mag, with_loss=with_loss,
        t_blocked=t_blocked,
        pack=pack, valid_t=valid_t, leaf_dots=leaf_dots,
        pipe=pipe, n_t_static=n_t,
    )
    # pipelined: the t loop lives in-kernel, so the grid loses its t axis
    # and every index map takes (b, i); serial keeps the (b, i, t) grid.
    grid = (G, n_iters) if pipe else (G, n_iters, n_t)
    gsel = lambda b_idx, z_idx: (  # noqa: E731
        (lambda b, i: (b_idx(b, i, 0), z_idx(b, i, 0), 0)) if pipe
        else (lambda b, i, t: (b_idx(b, i, t), z_idx(b, i, t), 0))
    )
    whole = gsel(lambda b, i, t: b, lambda b, i, t: 0)
    zero2 = (lambda b, i: (0, 0)) if pipe else (lambda b, i, t: (0, 0))
    sig = pl.BlockSpec((1, pack * rows_c, hop), whole)
    env_spec = pl.BlockSpec(
        (1, pack * rows_c, hop), gsel(lambda b, i, t: 0, lambda b, i, t: 0))
    if t_blocked:
        blk = pl.BlockSpec(  # never pipelined (driver gating)
            (1, pack * block_t, n_fft), lambda b, i, t: (b, t, 0)
        )
    else:
        blk = pl.BlockSpec((1, pack * t_pad, n_fft), whole)

    plane = jax.ShapeDtypeStruct((G, pack * t_pad, n_fft), jnp.float32)
    out_specs = [sig]
    out_shape = [jax.ShapeDtypeStruct((G, pack * rows_c, hop), jnp.float32)]
    if emit_state:
        out_specs += [blk, blk]
        out_shape += [plane, plane]
    if with_mag:
        out_specs.append(blk)
        out_shape.append(plane)
    if with_loss:
        out_specs.append(pl.BlockSpec((1, 8, LANE), whole))
        out_shape.append(jax.ShapeDtypeStruct((G, 8, LANE), jnp.float32))

    # Donate the state buffers: x0 -> x (always; both are fetched/flushed
    # once per group at (b, 0, 0)) and st0 -> st when plane-resident (the
    # t-blocked layout revisits input blocks every iteration, so an
    # aliased output flush could race a later prefetch of the same HBM).
    # Segment-relaunch chains (early-stop runs) then recycle the planes
    # in place instead of allocating + copying per launch.
    aliases = {1: 0}
    if emit_state and not t_blocked:
        aliases.update({3: 1, 4: 2})

    macs_frame = 2 * (2 * m * LANE * LANE + 4 * LANE * m * m)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        input_output_aliases=aliases,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),               # scalar
            sig,                                                 # x0
            blk, blk, blk,                                       # tgt, st0
            *[
                pl.BlockSpec(tables[k].shape, zero2)
                for k in TABLE_KEYS
            ],
            pl.BlockSpec((1, n_fft), zero2),                     # window
            env_spec,                                            # inv_env
            pl.BlockSpec(jrev.shape, zero2),                     # jrev
            *([pl.BlockSpec((1, n_fft), zero2)]
              if with_loss else []),                             # w_loss
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, pack * rows_c, hop), jnp.float32),
            pltpu.VMEM((pack * t_pad, n_fft), jnp.float32),
            pltpu.VMEM((pack * t_pad, n_fft), jnp.float32),
            pltpu.VMEM((pack, max(8, K - 1), hop), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=120 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * n_iters * t_pad * macs_frame,
            bytes_accessed=4 * (2 * B * lx + 3 * B * t_pad * n_fft),
            transcendentals=B * n_iters * t_pad * n_fft,
        ),
        interpret=interpret,
    )(
        jnp.asarray(scalar, jnp.float32).reshape(1, 1),
        to_rows(x_pad),
        pack_planes(target.astype(jnp.float32)),
        pack_planes(st_re.astype(jnp.float32)),
        pack_planes(st_im.astype(jnp.float32)),
        *[jnp.asarray(tables[k]) for k in TABLE_KEYS],
        jnp.asarray(window, jnp.float32).reshape(1, n_fft),
        env_rows(jnp.asarray(inv_env)),
        jnp.asarray(jrev),
        *([jnp.asarray(w_loss, jnp.float32).reshape(1, n_fft)]
          if with_loss else []),
    )
    x_fin = out[0].reshape(B, rows_c * hop)[:, :lx]
    if not emit_state and not with_mag and not with_loss:
        return x_fin
    n_planes = len(out) - 1 - (1 if with_loss else 0)
    res = [x_fin, *[unpack_planes(o) for o in out[1 : 1 + n_planes]]]
    if with_loss:
        res.append(out[-1])  # (G, 8, 128) stats, rows 0-1 scalar-broadcast
    return tuple(res)
