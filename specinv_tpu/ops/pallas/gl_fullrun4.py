"""Whole-run fused Griffin-Lim: ALL iterations in one Pallas launch.

The per-iteration kernels (:mod:`.gl_fused`, :mod:`.gl_fused4`) pass the
signal and the momentum spectrum through HBM between iterations (~20 MB/iter
at the north-star config) and pay a kernel dispatch per iteration.  Here the
iteration count becomes a grid dimension — ``grid = (B, n_iters, n_t)`` —
and the whole algorithm state lives in VMEM scratch for the entire run:

  * the signal is double-buffered ``(2, Lx)`` (framing reads the previous
    iteration's slab while overlap-add accumulates into the other; the
    parity of the iteration index selects the roles);
  * the momentum spectrum ``(t_pad, m, 128)`` is updated in place per
    time-block;
  * the target magnitude, window, envelope and DFT tables are DMA'd once
    per clip (constant block index) and stay resident.

HBM I/O for a whole 100-iteration run: the inputs once + the final signal
once.  Fixed iteration count: this is the ``tol == 0`` / early-stop-off fast
path; the early-stopping and metric-reporting paths keep using the
per-iteration kernel.  Transform math = :mod:`.fft4` (four-step matmul-FFT),
identical numerics to gl_fused4.
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
from .gl_fused4 import frame_rows, ola_rows

TABLE_KEYS = fft4.DEVICE_TABLE_KEYS

# Budget the whole-run kernels may plan against.  The Mosaic scoped-vmem
# ceiling on v5e is ~128 MiB; leave headroom for tables, semaphores, and
# accounting overhead beyond this estimate (a 20 s clip at n_fft=2048
# measured ~25% above the naive sum).
VMEM_BUDGET = 80 * 1024 * 1024

# Optimistic band: the model above is hand-calibrated and conservative; plans
# between VMEM_BUDGET and this ceiling are *attempted* on the auto path — the
# first real compile acts as the probe, a Mosaic VMEM OOM is caught by the
# dispatcher which demotes the backend and records the failure in
# :data:`_fit_deny` (round-2 verdict weak #6: no compile-probe fallback).
VMEM_CEILING = 100 * 1024 * 1024

# (n_fft, hop, T, block_t) launch shapes that OOM'd at compile time despite
# the model's blessing.  Consulted by :func:`fits` before the model.
_fit_deny: set = set()


def _fit_key(cfg: STFTConfig, T: int, block_t):
    return (cfg.n_fft, cfg.hop_length, T, block_t)


def deny(cfg: STFTConfig, T: int, block_t=None) -> None:
    """Record that the whole-run launch for this shape failed to compile."""
    _fit_deny.add(_fit_key(cfg, T, block_t))


def is_vmem_oom(e: Exception) -> bool:
    """Does this exception look like a Mosaic/XLA VMEM exhaustion?

    Deliberately requires a VMEM/scoped-memory signal: a bare
    RESOURCE_EXHAUSTED also covers runtime HBM OOMs and transient tunnel
    errors, and matching those would permanently deny-cache a launch shape
    that compiles fine (an unrecognized genuine VMEM OOM merely re-raises,
    which is the safer failure)."""
    import re

    msg = str(e)
    return bool(
        re.search(r"vmem|scoped\s+(memory|vmem)", msg, re.IGNORECASE)
    )


def plane_vmem_bytes(
    t_pad: int, block_t: int, n_fft: int, lx: int,
    emit_state: bool, with_mag: bool, t_blocked: bool,
) -> int:
    """Rough VMEM plan for one fullrun/segment launch (bytes, f32).

    Counts the double-buffered in/out windows (whole planes when resident,
    (block_t, ...) blocks when ``t_blocked``) plus the always-full scratch:
    the double-buffered signal, the momentum/state planes, and the frames
    buffer.  Used to pick whole-plane residency vs t-blocked streaming and,
    past that, to reject the launch so the caller can demote backends.
    """
    plane = (block_t if t_blocked else t_pad) * n_fft * 4
    n_planes = 3 + (2 if emit_state else 0) + (1 if with_mag else 0)
    sig = lx * 4
    io = 2 * (n_planes * plane + 3 * sig)  # dbuf x (planes + x0/x_out/env)
    scratch = 2 * sig + 2 * t_pad * n_fft * 4 + block_t * n_fft * 4
    return io + scratch


def fits(cfg: STFTConfig, T: int, block_t: int | None = None,
         optimistic: bool = True) -> bool:
    """Can the whole-run/segment kernels handle a ``T``-frame clip at all
    (t-blocked streaming included)?  Used by the public dispatchers to keep
    ``backend='auto'`` from selecting a launch that cannot compile.

    ``optimistic`` extends the hand-calibrated :data:`VMEM_BUDGET` to
    :data:`VMEM_CEILING`: the dispatcher catches a compile-time VMEM OOM,
    demotes, and records the shape in the deny cache, so trying the band is
    safe and recovers clips the conservative model would reject.
    """
    from ...models._pallas_driver import resolve_block_t

    if _fit_key(cfg, T, block_t) in _fit_deny:
        return False
    bt = resolve_block_t(T, cfg.n_fft, block_t)
    t_pad = -(-T // bt) * bt
    lx = (t_pad - 1) * cfg.hop_length + cfg.n_fft
    budget = VMEM_CEILING if optimistic else VMEM_BUDGET
    return (
        plane_vmem_bytes(t_pad, bt, cfg.n_fft, lx, True, True, True)
        <= budget
    )


# Stop growing ``pack`` once the per-step dot row count reaches this: the
# measured gains flatten past a few thousand rows (benchmarks.md).
PACK_ROWS_TARGET = 4096

# m=16 has its own, smaller row target: with the radix m-stage, interleaved
# A/B at n_fft=2048/B=16/2 s measured pack=4 (2048 rows) +14% but pack=8
# (4096 rows) -25% vs pack=1 — past ~2048 rows the larger live radix
# intermediates and VMEM pressure outweigh the grid-step amortization.
PACK_ROWS_TARGET_M16 = 2048

# Packing only pays below this chunk count.  Measured (interleaved A/B,
# B=16 x 2 s clips): n_fft=1024 +124% marginal it/s at pack=8, n_fft=512
# +41% at pack=16.  With the naive O(m^2) m-point stage, n_fft=2048 (m=16)
# measured neutral-to-negative — the VPU stage dominates there and packing
# amortizes nothing; the radix stage cut that term ~4x and the re-measure
# found +14% at pack=4 (so the cap is mstage-dependent).  n_fft=4096
# (m=32) measured -5% even with the radix stage: stays unpacked.  See
# benchmarks.md "Clip packing".
PACK_MAX_M = 8
PACK_MAX_M_RADIX = 16


def choose_pack(
    cfg: STFTConfig, T: int, B: int, block_t: int | None = None,
    emit_state: bool = True, with_mag: bool = True,
) -> int:
    """Pick the clip-packing factor for a (B, T)-shaped batch.

    Smallest divisor of ``B`` that brings the per-step MXU row count
    (``pack * block_t * m``) to the measured rows target
    (:data:`PACK_ROWS_TARGET`, or :data:`PACK_ROWS_TARGET_M16` at m=16),
    for transforms small enough that packing measures as a win
    (``m <= PACK_MAX_M_RADIX`` with the default radix m-stage,
    ``m <= PACK_MAX_M`` under ``SPECINV_MSTAGE=naive`` where the VPU
    m-stage dominates at m=16), subject to the packed launch staying
    plane-RESIDENT within the conservative :data:`VMEM_BUDGET` for its
    actual ``emit_state``/``with_mag`` flags (packing that forces
    t-blocked streaming or the optimistic band is never worth the risk —
    it exists for short clips, whose planes are small).
    """
    m = cfg.n_fft // LANE
    max_m = PACK_MAX_M_RADIX if fft4._mstage_mode() == "radix" else PACK_MAX_M
    if B <= 1 or m > max_m:
        return 1
    rows_target = PACK_ROWS_TARGET if m <= 8 else PACK_ROWS_TARGET_M16
    from ...models._pallas_driver import resolve_block_t

    bt = resolve_block_t(T, cfg.n_fft, block_t)
    t_pad = -(-T // bt) * bt
    lx = (t_pad - 1) * cfg.hop_length + cfg.n_fft
    best = 1
    for k in range(2, B + 1):
        if B % k:
            continue
        if best * bt * m >= rows_target:
            break
        if plane_vmem_bytes(
            k * t_pad, k * bt, cfg.n_fft, k * lx, emit_state, with_mag, False
        ) > VMEM_BUDGET:
            break
        best = k
    return best


def _repad_slab(x_s, wr, jrev_ref, pad_mode: str, p_amt: int, e: int,
                base: int = 0):
    """Edge re-pad of one clip's (1, Lx) slab inside the double buffer.

    ``base`` is the clip's offset in the (possibly clip-packed) flat slab.
    """
    if not p_amt or pad_mode == "constant":
        return
    row = pl.ds(wr, 1)
    if pad_mode == "reflect":
        left_src = x_s[row, pl.ds(base + p_amt + 1, p_amt)]
        right_src = x_s[row, pl.ds(base + e - p_amt, p_amt)]
        jm = jrev_ref[...]
        left = jnp.dot(
            left_src, jm, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        right = jnp.dot(
            right_src, jm, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    elif pad_mode == "edge":
        left = jnp.broadcast_to(x_s[row, pl.ds(base + p_amt, 1)], (1, p_amt))
        right = jnp.broadcast_to(x_s[row, pl.ds(base + e, 1)], (1, p_amt))
    else:  # wrap / circular
        left = x_s[row, pl.ds(base + e - p_amt + 1, p_amt)]
        right = x_s[row, pl.ds(base + p_amt, p_amt)]
    x_s[row, pl.ds(base, p_amt)] = left
    x_s[row, pl.ds(base + e + 1, p_amt)] = right


def _kernel(
    lr_ref,        # SMEM (1, 1)
    x0_ref,        # (1, pack, Lx)
    tgt_ref,       # (1, pack*t_pad, m, 128) packed t-block-major (see pack_planes)
    pre0_re_ref,   # (1, pack*t_pad, m, 128)
    pre0_im_ref,   # (1, pack*t_pad, m, 128)
    *rest,
    block_t: int,
    n_fft: int,
    hop: int,
    pad_mode: str,
    p_amt: int,
    e: int,
    fwd_p,
    inv_p,
    np_tables,
    n_iters: int,
    emit_state: bool,
    with_mag: bool,
    t_blocked: bool,
    pack: int,
):
    """Whole-run kernel, ``pack`` clips folded into each grid step.

    Rows presented to the MXU per step: ``pack * block_t * m`` — short clips
    (small t_pad) would otherwise feed thin row blocks and leave the systolic
    array idle (round-2 verdict weak #3).  Bitwise identical to ``pack=1``:
    the DFT dots and all elementwise math are row-independent, packing only
    concatenates rows.
    """
    ntab = len(TABLE_KEYS)
    tab_refs = rest[:ntab]
    win_ref, inv_env_ref, jrev_ref = rest[ntab : ntab + 3]
    outs = rest[ntab + 3 :]
    x_out_ref = outs[0]
    k = 1
    if emit_state:
        pre_out_re_ref, pre_out_im_ref = outs[k : k + 2]
        k += 2
    if with_mag:
        mag_ref = outs[k]
        k += 1
    x_s, pre_re_s, pre_im_s, frames_s = outs[k:]

    lxc = (x_s.shape[1]) // pack  # per-clip slab length
    i = pl.program_id(1)
    t = pl.program_id(2)
    n_t = pl.num_programs(2)
    rd = jax.lax.rem(i, jnp.int32(2))  # literal pinned: tests run with x64
    wr = 1 - rd
    window = win_ref[0, :]
    tables = dict(np_tables)
    tables.update({k: r[...] for k, r in zip(TABLE_KEYS, tab_refs)})

    # Packed planes are t-block-major: rows [(t*pack + c)*block_t + r] hold
    # clip c's frame t*block_t + r, so step t's slab — all clips' rows in
    # frames_s order — is one contiguous slice of pack*block_t rows.
    sl = pl.ds(t * pack * block_t, pack * block_t)

    def _plane(ref):
        # t_blocked: the ref window IS this step's slab (streamed);
        # resident: the ref holds the whole plane, slice it.
        return ref[0] if t_blocked else ref[0, sl]

    @pl.when(jnp.logical_and(i == 0, t == 0))
    def _init_x():
        for c in range(pack):
            x_s[pl.ds(0, 1), pl.ds(c * lxc, lxc)] = x0_ref[0, pl.ds(c, 1)]

    @pl.when(i == 0)
    def _init_pre():
        pre_re_s[sl] = _plane(pre0_re_ref)
        pre_im_s[sl] = _plane(pre0_im_ref)

    @pl.when(t == 0)
    def _zero_write_slab():
        x_s[pl.ds(wr, 1), :] = jnp.zeros((1, x_s.shape[1]), jnp.float32)

    # --- framing from the read slab (shared loops: gl_fused4.frame_rows)
    for c in range(pack):
        frame_rows(
            frames_s,
            lambda s, n, c=c: x_s[pl.ds(rd, 1), pl.ds(c * lxc + s, n)],
            window, t * block_t, block_t, n_fft, hop, rows0=c * block_t,
        )

    # --- one GL iteration for this step's (pack * block_t)-row slab
    s_re, s_im = fft4.fwd4(frames_s[...], tables, fwd_p)

    if with_mag:
        # Metric output = pre-momentum |stft(x)| (methods.py:242,250), only
        # needed for the final (eval) iteration of the launch.
        @pl.when(i == n_iters - 1)
        def _emit_mag():
            if t_blocked:
                mag_ref[0] = jnp.sqrt(s_re * s_re + s_im * s_im)
            else:
                mag_ref[0, sl] = jnp.sqrt(s_re * s_re + s_im * s_im)

    lr = lr_ref[0, 0]
    s_re = s_re - lr * pre_re_s[sl]
    s_im = s_im - lr * pre_im_s[sl]
    pre_re_s[sl] = s_re
    pre_im_s[sl] = s_im
    if emit_state:
        @pl.when(i == n_iters - 1)
        def _emit_pre():
            if t_blocked:
                pre_out_re_ref[0] = s_re
                pre_out_im_ref[0] = s_im
            else:
                pre_out_re_ref[0, sl] = s_re
                pre_out_im_ref[0, sl] = s_im
    norm = jnp.sqrt(s_re * s_re + s_im * s_im) + PROJ_EPS
    gain = _plane(tgt_ref) / norm
    fr = fft4.inv4_real(s_re * gain, s_im * gain, tables, inv_p)

    # --- overlap-add into the write slab (shared loops: gl_fused4.ola_rows)
    for c in range(pack):
        def _write(s, v, c=c):
            x_s[pl.ds(wr, 1), pl.ds(c * lxc + s, v.size)] = v.reshape(1, v.size)

        ola_rows(
            lambda s, n, c=c: x_s[pl.ds(wr, 1), pl.ds(c * lxc + s, n)],
            _write, fr, window, t * block_t, block_t, n_fft, hop,
            rows0=c * block_t,
        )

    @pl.when(t == n_t - 1)
    def _normalize():
        for c in range(pack):
            idx = (pl.ds(wr, 1), pl.ds(c * lxc, lxc))
            x_s[idx] = x_s[idx] * inv_env_ref[0]
            _repad_slab(x_s, wr, jrev_ref, pad_mode, p_amt, e, base=c * lxc)

    @pl.when(jnp.logical_and(i == n_iters - 1, t == n_t - 1))
    def _emit():
        for c in range(pack):
            x_out_ref[0, pl.ds(c, 1)] = x_s[pl.ds(wr, 1), pl.ds(c * lxc, lxc)]


def lane_active(
    cfg: STFTConfig, block_t: int, lane: bool | None = None
) -> bool:
    """True when :func:`fused_gl_run` / ``fused_admm_run`` will dispatch to
    the lane-major engine (fullrun_lane.supports + the hop-row-slab block
    bound).  Drivers gate the scalar ``with_loss`` eval path on this.

    ``lane=None`` reads ``SPECINV_FULLRUN_LANE`` at call (= trace) time;
    public wrappers pass :func:`lane_enabled` eagerly instead so flipping
    the valve mid-process takes effect (see fullrun_lane.supports)."""
    from .fullrun_lane import supports as lane_supports

    return (lane_supports(cfg, lane)
            and block_t >= cfg.n_fft // cfg.hop_length - 1)


def lane_enabled() -> bool:
    """Eager read of the ``SPECINV_FULLRUN_LANE`` A/B valve (default on).
    Public wrappers call this per-call and thread the result down as the
    static ``lane`` argument."""
    import os

    return os.environ.get("SPECINV_FULLRUN_LANE", "1") != "0"


def stats_eval_enabled() -> bool:
    """A/B safety valve for the scalar eval-stats path
    (``SPECINV_FULLRUN_STATS=0`` reverts eval segments to magnitude-plane
    emission + XLA metric reductions; values match up to f32 sum order)."""
    import os

    return os.environ.get("SPECINV_FULLRUN_STATS", "1") != "0"


def hermitian_loss_weight(cfg: STFTConfig) -> np.ndarray:
    """Lane-flat weight vector making full-spectrum eval sums equal the
    onesided-trimmed XLA reductions: 0.5 on Hermitian-mirrored bins, 1.0 on
    DC/Nyquist (or all-ones for two-sided configs), permuted to the
    four-step layout's lane-flat column order."""
    n_fft = cfg.n_fft
    if cfg.onesided:
        w = np.full(n_fft, 0.5, np.float32)
        w[0] = 1.0
        w[n_fft // 2] = 1.0
    else:
        w = np.ones(n_fft, np.float32)
    # pure-numpy fft4.to_permuted (out[d, e] = w[d + m*e]), lane-flattened
    m = n_fft // LANE
    return np.ascontiguousarray(w.reshape(LANE, m).T).reshape(n_fft)


def fused_gl_run(
    x_pad: jnp.ndarray,      # (B, Lx) float32, padded coords
    pre_re: jnp.ndarray,     # (B, t_pad, m, 128)
    pre_im: jnp.ndarray,
    target: jnp.ndarray,     # (B, t_pad, m, 128)
    window: jnp.ndarray,
    inv_env: jnp.ndarray,    # (Lx,)
    lr: jnp.ndarray,
    cfg: STFTConfig,
    e: int,
    n_iters: int,
    block_t: int = 64,
    interpret: bool = False,
    precision=jax.lax.Precision.HIGH,
    emit_state: bool = False,
    with_mag: bool = False,
    with_loss: bool = False,
    w_loss: jnp.ndarray | None = None,
    valid_t: int = 0,
    pack: int = 1,
    lane: bool | None = None,
):
    """Run ``n_iters`` fused GL iterations in one launch -> final x_pad (B, Lx).

    With ``emit_state`` the final momentum planes are also returned, and with
    ``with_mag`` the pre-momentum |stft(x)| of the LAST iteration — together
    these make the launch usable as one eval *segment* of an early-stopping
    run (the stop rule only consults the metric every ``eva_iter`` steps, so
    chaining segments of that length is exactly the reference loop).
    Return order: ``x_pad[, pre_re, pre_im][, mag]``.

    ``pack`` folds that many clips into each grid step (``pack | B``): short
    clips present thin row blocks to the MXU one-at-a-time; packing
    concatenates ``pack * block_t * m`` rows per dot and divides the grid
    step count by ``pack``.  Bitwise identical to ``pack=1`` (rows are
    independent in every op).  Costs ``pack``x the VMEM state, so it is for
    SHORT clips by construction; :func:`choose_pack` picks the largest safe
    value.

    Plane residency adapts to the clip: the target/momentum planes stay
    VMEM-resident when the whole launch fits :data:`VMEM_BUDGET`; longer
    clips (e.g. 20 s at n_fft=2048, which OOM'd the resident layout) switch
    to t-blocked streaming of the plane I/O — the momentum *state* scratch
    stays resident either way, so numerics are identical and only ~1 MB/step
    of overlappable DMA is added.  Raises ``ValueError`` when even the
    streamed layout cannot fit (the caller demotes backends).
    """
    from .fullrun_lane import fused_run_lane

    if lane_active(cfg, block_t, lane):
        # lane-major + hop-row-slab engine: no sublane relayouts in the hot
        # path, ~4x the (m, 128) kernel at the north star (module docstring)
        return fused_run_lane(
            "gl", x_pad, pre_re, pre_im, target, window, inv_env, lr, cfg,
            e, n_iters, block_t=block_t, interpret=interpret,
            precision=precision, emit_state=emit_state, with_mag=with_mag,
            with_loss=with_loss, w_loss=w_loss, valid_t=valid_t,
            pack=pack,
        )
    if with_loss:
        raise ValueError(
            "with_loss requires the lane-major engine (hop | n_fft and "
            "block_t >= n_fft/hop - 1); callers gate on lane_active()"
        )

    B, t_pad, m, lanes = target.shape
    n_fft, hop = cfg.n_fft, cfg.hop_length
    assert lanes == LANE and m == n_fft // LANE
    assert t_pad % block_t == 0
    lx = x_pad.shape[-1]
    assert lx == (t_pad - 1) * hop + n_fft
    assert pack >= 1 and B % pack == 0
    G = B // pack
    n_t = t_pad // block_t

    t_blocked = plane_vmem_bytes(
        pack * t_pad, pack * block_t, n_fft, pack * lx,
        emit_state, with_mag, False,
    ) > VMEM_BUDGET
    if t_blocked and plane_vmem_bytes(
        pack * t_pad, pack * block_t, n_fft, pack * lx,
        emit_state, with_mag, True,
    ) > VMEM_CEILING:
        raise ValueError(
            "clip too long for the whole-run kernel's VMEM state; use "
            "backend='pallas' or sequence parallelism"
        )

    def pack_planes(a):
        """(B, t_pad, m, L) -> (G, pack*t_pad, m, L), t-block-major: step
        t's rows for all packed clips are contiguous (kernel docstring)."""
        a = a.reshape(G, pack, n_t, block_t, m, LANE)
        return jnp.swapaxes(a, 1, 2).reshape(G, pack * t_pad, m, LANE)

    def unpack_planes(a):
        a = a.reshape(G, n_t, pack, block_t, m, LANE)
        return jnp.swapaxes(a, 1, 2).reshape(B, t_pad, m, LANE)

    tables = fft4.fourstep_tables(n_fft, cfg.normalized)
    np_tables = {k: v for k, v in tables.items() if k not in TABLE_KEYS}
    p_amt = cfg.pad_amount
    pad_mode = cfg.jnp_pad_mode
    if p_amt and pad_mode == "reflect":
        jrev = _anti_identity(p_amt)
    else:
        jrev = np.zeros((8, LANE), np.float32)

    fwd_p, inv_p = split_schemes(precision)
    kernel = functools.partial(
        _kernel, block_t=block_t, n_fft=n_fft, hop=hop,
        pad_mode=pad_mode, p_amt=p_amt, e=e,
        fwd_p=fwd_p, inv_p=inv_p, np_tables=np_tables, n_iters=n_iters,
        emit_state=emit_state, with_mag=with_mag, t_blocked=t_blocked,
        pack=pack,
    )
    grid = (G, n_iters, n_t)
    whole = lambda b, i, t: (b, 0, 0, 0)  # noqa: E731
    sig = pl.BlockSpec((1, pack, lx), lambda b, i, t: (b, 0, 0))
    const_sig = pl.BlockSpec((1, 1, lx), lambda b, i, t: (0, 0, 0))
    if t_blocked:
        blk = pl.BlockSpec(
            (1, pack * block_t, m, LANE), lambda b, i, t: (b, t, 0, 0)
        )
    else:
        blk = pl.BlockSpec((1, pack * t_pad, m, LANE), whole)

    plane = jax.ShapeDtypeStruct((G, pack * t_pad, m, LANE), jnp.float32)
    out_specs = [sig]
    out_shape = [jax.ShapeDtypeStruct((G, pack, lx), jnp.float32)]
    if emit_state:
        out_specs += [blk, blk]
        out_shape += [plane, plane]
    if with_mag:
        out_specs.append(blk)
        out_shape.append(plane)

    macs_frame = 2 * (2 * m * LANE * LANE + 4 * LANE * m * m)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),               # lr
            sig,                                                 # x0
            blk, blk, blk,                                       # tgt, pre0
            *[
                pl.BlockSpec(tables[k].shape, lambda b, i, t: (0, 0))
                for k in TABLE_KEYS
            ],
            pl.BlockSpec((1, n_fft), lambda b, i, t: (0, 0)),    # window
            const_sig,                                           # inv_env
            pl.BlockSpec(jrev.shape, lambda b, i, t: (0, 0)),    # jrev
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[
            pltpu.VMEM((2, pack * lx), jnp.float32),
            pltpu.VMEM((pack * t_pad, m, LANE), jnp.float32),
            pltpu.VMEM((pack * t_pad, m, LANE), jnp.float32),
            pltpu.VMEM((pack * block_t, n_fft), jnp.float32),
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
        jnp.asarray(lr, jnp.float32).reshape(1, 1),
        x_pad.astype(jnp.float32).reshape(G, pack, lx),
        pack_planes(target.astype(jnp.float32)),
        pack_planes(pre_re.astype(jnp.float32)),
        pack_planes(pre_im.astype(jnp.float32)),
        *[jnp.asarray(tables[k]) for k in TABLE_KEYS],
        jnp.asarray(window, jnp.float32).reshape(1, n_fft),
        jnp.asarray(inv_env, jnp.float32).reshape(1, 1, lx),
        jnp.asarray(jrev),
    )
    x_fin = out[0].reshape(B, lx)
    if not emit_state and not with_mag:
        return x_fin
    return (x_fin, *[unpack_planes(o) for o in out[1:]])
