"""Fused RTISI-LA inner refinement: all ``max_iter`` look-ahead GL passes of
one output-frame step in a single Pallas launch.

Why this exists (measured, benchmarks.md "Batched RTISI-LA"): the XLA scan
path re-streams the direct-DFT cos/sin tables from HBM on every one of the
``max_iter`` (default 25) forward+inverse transforms of every output frame —
~840 MB of table traffic per frame step at n_fft=2048/B=16, which bounds
batched serving at ~9k frames/s aggregate.  Here the four-step tables
(:mod:`.fft4`, ~16x smaller) are DMA'd once per launch and stay VMEM-resident
across all refinements, the refinement index is the grid dimension, and the
in-flight frames / momentum spectrum live in VMEM scratch for the whole
launch.  HBM I/O per frame step: the inputs once + the final state once.

Reference numerics preserved (RTISI_LA at
/root/reference/torch_specinv/methods.py:364-404, via the XLA scan path in
models/rtisi_la.py which this kernel matches to float tolerance):

  * the committed-context overlap-add prefix (methods.py:365-370) is
    loop-invariant across refinements, so the driver passes it in as a
    precomputed ``(B, la*hop + n_fft)`` tail added once per refinement;
  * the first-refinement asymmetric analysis window and the frame-shifted
    first-refinement momentum (methods.py:371-392) are ``j == 0`` selects on
    the grid index;
  * projection epsilon 1e-16 (methods.py:394), momentum ``S - lr*pre``.

Layouts: frames are FRAME-MAJOR — row ``r*B + b`` holds batch item ``b``'s
in-flight frame ``r`` — so the ``j == 0`` momentum shift (rows take the NEXT
frame's momentum) and the commit/slide in the driver are contiguous
``B``-row block moves, and spectra live in the permuted four-step layout
``(R, m, 128)`` end-to-end (the momentum planes carry across the outer scan
in this layout, so no per-step relayout exists anywhere).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import STFTConfig
from . import fft4
from .gl_fused import LANE, PROJ_EPS, split_schemes

TABLE_KEYS = fft4.DEVICE_TABLE_KEYS


def supports(cfg: STFTConfig, window) -> bool:
    """Four-step geometry: lane-aligned transform and hop, real window,
    onesided magnitude (the driver Hermitian-extends the (F=n_fft//2+1)-bin
    target; a full-spectrum input would need a different packing)."""
    return (
        cfg.onesided
        and cfg.n_fft % LANE == 0
        and cfg.hop_length % LANE == 0
        and not jnp.iscomplexobj(window)
    )


def _kernel(
    lr_ref,        # SMEM (1, 1)
    xk_ref,        # (B, L) committed-context OLA tail (synth-windowed)
    upd0_ref,      # (R, n_fft) initial in-flight frames, frame-major
    pre0_re_ref,   # (R, m, 128) initial momentum, permuted
    pre0_im_ref,
    tgt_ref,       # (R, m, 128) permuted Hermitian-extended magnitude
    *rest,
    n_frames: int,
    n_fft: int,
    hop: int,
    fwd_p,
    inv_p,
    np_tables,
    n_iters: int,
    asym: bool,
):
    ntab = len(TABLE_KEYS)
    tab_refs = rest[:ntab]
    win_ref, awf_ref, awr_ref, synth_ref = rest[ntab : ntab + 4]
    (upd_out_ref, pre_re_out_ref, pre_im_out_ref,
     xs, upd_s, pre_re_s, pre_im_s) = rest[ntab + 4 :]

    j = pl.program_id(0)
    B = xk_ref.shape[0]
    tables = dict(np_tables)
    tables.update({k: r[...] for k, r in zip(TABLE_KEYS, tab_refs)})

    @pl.when(j == 0)
    def _init():
        upd_s[...] = upd0_ref[...]
        pre_re_s[...] = pre0_re_ref[...]
        pre_im_s[...] = pre0_im_ref[...]

    # --- committed context + in-flight OLA (methods.py:365-370); the
    # committed prefix is already dropped from xk, coords start at the first
    # in-flight frame.
    xs[...] = xk_ref[...]
    synth = synth_ref[0, :]
    for r in range(n_frames):
        seg = xs[:, r * hop : r * hop + n_fft]
        xs[:, r * hop : r * hop + n_fft] = (
            seg + upd_s[r * B : (r + 1) * B, :] * synth
        )

    # --- re-analysis framing; the newest frame takes the asymmetric window
    # (aw1 on the first refinement, aw2 after — methods.py:371-383).
    window = win_ref[0, :]
    rows = []
    for r in range(n_frames):
        seg = xs[:, r * hop : r * hop + n_fft]
        if r < n_frames - 1:
            rows.append(seg * window)
        elif asym:
            w_last = jnp.where(j == 0, awf_ref[0, :], awr_ref[0, :])
            rows.append(seg * w_last)
        else:
            rows.append(seg * window)
    frames = jnp.concatenate(rows, axis=0)          # (R, n_fft)

    s_re, s_im = fft4.fwd4(frames, tables, fwd_p)   # (R, m, 128)

    # --- momentum (methods.py:387-392): plain ``S - lr*pre`` except the
    # first refinement, where each frame takes the NEXT frame's momentum
    # (the previous step's buffers were one hop younger) and the newest
    # frame takes none.  Frame-major rows make the shift a B-row block move.
    lr = lr_ref[0, 0]
    pre_re = pre_re_s[...]
    pre_im = pre_im_s[...]
    zeros_b = jnp.zeros((B,) + pre_re.shape[1:], pre_re.dtype)
    sh_re = jnp.concatenate([pre_re[B:], zeros_b], axis=0)
    sh_im = jnp.concatenate([pre_im[B:], zeros_b], axis=0)
    s_re = s_re - lr * jnp.where(j == 0, sh_re, pre_re)
    s_im = s_im - lr * jnp.where(j == 0, sh_im, pre_im)
    pre_re_s[...] = s_re
    pre_im_s[...] = s_im

    # --- magnitude projection (methods.py:394) + inverse transform
    norm = jnp.sqrt(s_re * s_re + s_im * s_im) + PROJ_EPS
    gain = tgt_ref[...] / norm
    fr = fft4.inv4_real(s_re * gain, s_im * gain, tables, inv_p)
    upd_s[...] = fr

    @pl.when(j == n_iters - 1)
    def _emit():
        upd_out_ref[...] = fr
        pre_re_out_ref[...] = s_re
        pre_im_out_ref[...] = s_im


def refine_run4(
    x_keep: jnp.ndarray,     # (B, la*hop + n_fft) f32 committed OLA tail
    upd0: jnp.ndarray,       # (R, n_fft) f32 frame-major in-flight frames
    pre_re: jnp.ndarray,     # (R, m, 128) f32 permuted momentum
    pre_im: jnp.ndarray,
    target_p: jnp.ndarray,   # (R, m, 128) f32 permuted magnitude
    window: jnp.ndarray,     # (n_fft,) analysis window
    aw_first: jnp.ndarray,   # (n_fft,) newest-frame window, refinement 0
    aw_rest: jnp.ndarray,    # (n_fft,) newest-frame window, refinements > 0
    synth_win: jnp.ndarray,  # (n_fft,) window * synth_coeff (OLA synthesis)
    lr: jnp.ndarray,
    cfg: STFTConfig,
    max_iter: int,
    asym: bool,
    interpret: bool = False,
    precision=jax.lax.Precision.HIGH,
):
    """All ``max_iter`` refinements of one RTISI-LA frame step in one launch.

    Returns ``(update, pre_re, pre_im)`` in the same frame-major layouts.
    """
    R, n_fft = upd0.shape
    B, L = x_keep.shape
    n_frames = R // B
    m = n_fft // LANE
    assert R == n_frames * B and n_fft == cfg.n_fft
    assert L == (n_frames - 1) * cfg.hop_length + n_fft, (L, n_frames)
    assert pre_re.shape == (R, m, LANE) and target_p.shape == (R, m, LANE)
    assert max_iter >= 1

    tables = fft4.fourstep_tables(n_fft, cfg.normalized)
    np_tables = {k: v for k, v in tables.items() if k not in TABLE_KEYS}
    fwd_p, inv_p = split_schemes(precision)
    kernel = functools.partial(
        _kernel, n_frames=n_frames, n_fft=n_fft, hop=cfg.hop_length,
        fwd_p=fwd_p, inv_p=inv_p, np_tables=np_tables, n_iters=max_iter,
        asym=asym,
    )

    def whole(shape):
        return pl.BlockSpec(shape, lambda j: tuple([0] * len(shape)))

    vec = lambda: whole((1, n_fft))  # noqa: E731
    plane = whole((R, m, LANE))

    macs_frame = 2 * (2 * m * LANE * LANE + 4 * LANE * m * m)
    out = pl.pallas_call(
        kernel,
        grid=(max_iter,),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # lr
            whole((B, L)),                           # x_keep
            whole((R, n_fft)),                       # upd0
            plane, plane, plane,                     # pre0_re, pre0_im, tgt
            *[whole(tables[k].shape) for k in TABLE_KEYS],
            vec(), vec(), vec(), vec(),              # window, awf, awr, synth
        ],
        out_specs=[whole((R, n_fft)), plane, plane],
        out_shape=[
            jax.ShapeDtypeStruct((R, n_fft), jnp.float32),
            jax.ShapeDtypeStruct((R, m, LANE), jnp.float32),
            jax.ShapeDtypeStruct((R, m, LANE), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((B, L), jnp.float32),         # xs
            pltpu.VMEM((R, n_fft), jnp.float32),     # upd_s
            pltpu.VMEM((R, m, LANE), jnp.float32),   # pre_re_s
            pltpu.VMEM((R, m, LANE), jnp.float32),   # pre_im_s
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * R * max_iter * macs_frame,
            bytes_accessed=4 * (B * L + 5 * R * (n_fft + 2 * m * LANE)),
            transcendentals=max_iter * R * m * LANE,
        ),
        interpret=interpret,
    )(
        jnp.asarray(lr, jnp.float32).reshape(1, 1),
        x_keep.astype(jnp.float32),
        upd0.astype(jnp.float32),
        pre_re.astype(jnp.float32),
        pre_im.astype(jnp.float32),
        target_p.astype(jnp.float32),
        *[jnp.asarray(tables[k]) for k in TABLE_KEYS],
        jnp.asarray(window, jnp.float32).reshape(1, n_fft),
        jnp.asarray(aw_first, jnp.float32).reshape(1, n_fft),
        jnp.asarray(aw_rest, jnp.float32).reshape(1, n_fft),
        jnp.asarray(synth_win, jnp.float32).reshape(1, n_fft),
    )
    return out


# ---------------------------------------------------------------------------
# Multi-frame variant: K_STEPS output-frame steps per launch.
#
# The per-frame kernel above still pays, per OUTPUT FRAME, one launch plus
# the XLA glue around it (committed-context overlap-add, target dynamic
# slice, commit/slide concats, state through HBM) — benchmarks.md measured
# that glue at more than the refinement math itself.  Here the step index
# becomes the leading grid dimension — ``grid = (k_steps, max_iter)`` — and
# EVERYTHING the glue did moves in-kernel:
#
#   * the committed-frame buffer (frame-major, ``num_keep*B`` rows) lives in
#     VMEM scratch; its windowed OLA tail is recomputed once per step
#     (``j == 0``) — it is loop-invariant across refinements;
#   * commit + slide (drop oldest committed row-block, append the newly
#     committed frame, shift the in-flight buffer) are value moves on the
#     VMEM state at ``j == max_iter - 1``;
#   * the per-step target window arrives STEP-MAJOR ``(k, R, n_fft)`` via a
#     blocked input spec (the driver pre-gathers the k overlapping windows
#     once per launch — a dynamic row offset ``s*B`` inside the kernel
#     would need alignment proofs Mosaic cannot make for arbitrary B);
#   * committed frames leave through a blocked ``(k, B, n_fft)`` output.
#
# Spectra use the LANE-MAJOR four-step (fft4.fwd4_lane — bitwise-identical
# values to fwd4, no sublane relayouts), so the momentum planes are
# lane-flat ``(R, n_fft)`` here rather than permuted ``(R, m, 128)``.
# HBM I/O per launch: state once in/out + k target windows + k committed
# frames; per-frame XLA glue: none.


def _kernel_multi(
    lr_ref,        # SMEM (1, 1)
    keep0_ref,     # (max(num_keep,1)*B, n_fft) committed frames, frame-major
    upd0_ref,      # (R, n_fft) in-flight frames, frame-major
    pre0_re_ref,   # (R, n_fft) momentum, lane-flat
    pre0_im_ref,
    tgt_ref,       # (1, R, n_fft) THIS STEP's target window (step-major in)
    *rest,
    B: int,
    n_frames: int,
    num_keep: int,
    n_fft: int,
    hop: int,
    L: int,
    fwd_p,
    inv_p,
    np_tables,
    n_iters: int,
    asym: bool,
):
    ntab = len(fft4.LANE_TABLE_KEYS)
    tab_refs = rest[:ntab]
    win_ref, awf_ref, awr_ref, synth_ref = rest[ntab : ntab + 4]
    (com_ref, keep_out_ref, upd_out_ref, pre_re_out_ref, pre_im_out_ref,
     keep_s, upd_s, pre_re_s, pre_im_s, xs) = rest[ntab + 4 :]

    s = pl.program_id(0)
    tables = dict(np_tables)
    tables.update(
        {k: r[...] for k, r in zip(fft4.LANE_TABLE_KEYS, tab_refs)}
    )
    synth = synth_ref[0, :]

    @pl.when(s == 0)
    def _init():
        keep_s[...] = keep0_ref[...]
        upd_s[...] = upd0_ref[...]
        pre_re_s[...] = pre0_re_ref[...]
        pre_im_s[...] = pre0_im_ref[...]

    # --- committed-context OLA tail (methods.py:365-370), loop-invariant
    # across the refinements: compute once per step from the slid buffer.
    # Frame r of the committed window occupies tail coords
    # [(r - num_keep)*hop, ...); only its suffix past (num_keep - r)*hop is
    # visible in the tail.  Held as a VALUE: the refinements are an
    # IN-KERNEL fori_loop (the per-(step, refinement) 2D grid measured
    # grid-step-sequencing-bound — ~1 us/step against ~4-row math).
    if num_keep == 0:
        xk = jnp.zeros((B, L), jnp.float32)
    else:
        xk = None
        for r in range(num_keep):
            off = (num_keep - r) * hop
            if off >= n_fft:
                continue
            w = n_fft - off
            piece = keep_s[r * B : (r + 1) * B, off:] * synth[off:]
            part = jnp.concatenate(
                [piece, jnp.zeros((B, L - w), jnp.float32)], axis=1
            )
            xk = part if xk is None else xk + part
        if xk is None:
            xk = jnp.zeros((B, L), jnp.float32)

    window = win_ref[0, :]
    lr = lr_ref[0, 0]

    def refine(j, _):
        # --- committed context + in-flight OLA (same RMW structure as the
        # per-frame kernel for float-order stability across the two paths)
        xs[...] = xk
        for r in range(n_frames):
            seg = xs[:, r * hop : r * hop + n_fft]
            xs[:, r * hop : r * hop + n_fft] = (
                seg + upd_s[r * B : (r + 1) * B, :] * synth
            )

        # --- re-analysis framing; newest frame takes the asym window
        rows = []
        for r in range(n_frames):
            seg = xs[:, r * hop : r * hop + n_fft]
            if r < n_frames - 1 or not asym:
                rows.append(seg * window)
            else:
                w_last = jnp.where(j == 0, awf_ref[0, :], awr_ref[0, :])
                rows.append(seg * w_last)
        frames = jnp.concatenate(rows, axis=0)          # (R, n_fft)

        s_re, s_im = fft4.fwd4_lane(frames, tables, fwd_p)

        # --- momentum: the first refinement of EVERY step takes the next
        # frame's momentum (one B-row block shift), newest frame un-damped
        pre_re = pre_re_s[...]
        pre_im = pre_im_s[...]
        zeros_b = jnp.zeros((B, n_fft), pre_re.dtype)
        sh_re = jnp.concatenate([pre_re[B:], zeros_b], axis=0)
        sh_im = jnp.concatenate([pre_im[B:], zeros_b], axis=0)
        s_re = s_re - lr * jnp.where(j == 0, sh_re, pre_re)
        s_im = s_im - lr * jnp.where(j == 0, sh_im, pre_im)
        pre_re_s[...] = s_re
        pre_im_s[...] = s_im

        norm = jnp.sqrt(s_re * s_re + s_im * s_im) + PROJ_EPS
        gain = tgt_ref[0] / norm
        fr = fft4.inv4_real_lane(s_re * gain, s_im * gain, tables, inv_p)
        upd_s[...] = fr
        return 0

    jax.lax.fori_loop(0, n_iters, refine, 0)

    # --- end of step: commit the oldest in-flight frame, slide the buffers
    fr = upd_s[...]
    com_ref[0] = fr[:B]
    if num_keep:
        kp = keep_s[...]
        keep_s[...] = jnp.concatenate([kp[B:], fr[:B]], axis=0)
    slid = jnp.concatenate(
        [fr[B:], jnp.zeros((B, n_fft), jnp.float32)], axis=0
    )
    upd_s[...] = slid

    @pl.when(s == pl.num_programs(0) - 1)
    def _emit():
        keep_out_ref[...] = keep_s[...]
        upd_out_ref[...] = slid
        pre_re_out_ref[...] = pre_re_s[...]
        pre_im_out_ref[...] = pre_im_s[...]


def refine_run4_multi(
    keep0: jnp.ndarray,      # (max(num_keep,1)*B, n_fft) committed frames
    upd0: jnp.ndarray,       # (R, n_fft) in-flight frames, frame-major
    pre_re: jnp.ndarray,     # (R, n_fft) lane-flat momentum
    pre_im: jnp.ndarray,
    tgt_steps: jnp.ndarray,  # (k, R, n_fft) lane-flat target, step-major
    window: jnp.ndarray,
    aw_first: jnp.ndarray,
    aw_rest: jnp.ndarray,
    synth_win: jnp.ndarray,
    lr: jnp.ndarray,
    cfg: STFTConfig,
    B: int,
    num_keep: int,
    max_iter: int,
    asym: bool,
    interpret: bool = False,
    precision=jax.lax.Precision.HIGH,
):
    """``k`` RTISI-LA output-frame steps (``max_iter`` refinements each) in
    ONE launch.  Returns ``(committed (k, B, n_fft), keep, upd, pre_re,
    pre_im)`` — the final state in the same frame-major/lane-flat layouts.
    """
    k, R, n_fft = tgt_steps.shape
    n_frames = R // B
    hop = cfg.hop_length
    L = (n_frames - 1) * hop + n_fft
    assert R == n_frames * B and n_fft == cfg.n_fft
    assert keep0.shape == (max(num_keep, 1) * B, n_fft)
    assert max_iter >= 1

    tables = fft4.fourstep_tables(n_fft, cfg.normalized)
    np_tables = {
        k_: v for k_, v in tables.items() if k_ not in fft4.LANE_TABLE_KEYS
    }
    fwd_p, inv_p = split_schemes(precision)
    kernel = functools.partial(
        _kernel_multi, B=B, n_frames=n_frames, num_keep=num_keep,
        n_fft=n_fft, hop=hop, L=L,
        fwd_p=fwd_p, inv_p=inv_p, np_tables=np_tables, n_iters=max_iter,
        asym=asym,
    )

    def whole(shape):
        return pl.BlockSpec(shape, lambda s: tuple([0] * len(shape)))

    vec = lambda: whole((1, n_fft))  # noqa: E731
    plane = whole((R, n_fft))
    keep_spec = whole(keep0.shape)
    step_in = pl.BlockSpec((1, R, n_fft), lambda s: (s, 0, 0))
    step_out = pl.BlockSpec((1, B, n_fft), lambda s: (s, 0, 0))

    m = n_fft // LANE
    macs_frame = 2 * (2 * m * LANE * LANE + 4 * LANE * m * m)
    out = pl.pallas_call(
        kernel,
        grid=(k,),  # refinements run as an IN-KERNEL fori_loop (see kernel)
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # lr
            keep_spec,                               # keep0
            plane,                                   # upd0
            plane, plane,                            # pre0
            step_in,                                 # tgt (step-major)
            *[whole(tables[k_].shape) for k_ in fft4.LANE_TABLE_KEYS],
            vec(), vec(), vec(), vec(),              # window, awf, awr, synth
        ],
        out_specs=[step_out, keep_spec, plane, plane, plane],
        out_shape=[
            jax.ShapeDtypeStruct((k, B, n_fft), jnp.float32),
            jax.ShapeDtypeStruct(keep0.shape, jnp.float32),
            *[jax.ShapeDtypeStruct((R, n_fft), jnp.float32)] * 3,
        ],
        scratch_shapes=[
            pltpu.VMEM(keep0.shape, jnp.float32),    # keep_s
            pltpu.VMEM((R, n_fft), jnp.float32),     # upd_s
            pltpu.VMEM((R, n_fft), jnp.float32),     # pre_re_s
            pltpu.VMEM((R, n_fft), jnp.float32),     # pre_im_s
            pltpu.VMEM((B, L), jnp.float32),         # xs
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * k * R * max_iter * macs_frame,
            bytes_accessed=4 * (k * (B + R) * n_fft + 5 * R * n_fft),
            transcendentals=k * max_iter * R * n_fft,
        ),
        interpret=interpret,
    )(
        jnp.asarray(lr, jnp.float32).reshape(1, 1),
        keep0.astype(jnp.float32),
        upd0.astype(jnp.float32),
        pre_re.astype(jnp.float32),
        pre_im.astype(jnp.float32),
        tgt_steps.astype(jnp.float32),
        *[jnp.asarray(tables[k_]) for k_ in fft4.LANE_TABLE_KEYS],
        jnp.asarray(window, jnp.float32).reshape(1, n_fft),
        jnp.asarray(aw_first, jnp.float32).reshape(1, n_fft),
        jnp.asarray(aw_rest, jnp.float32).reshape(1, n_fft),
        jnp.asarray(synth_win, jnp.float32).reshape(1, n_fft),
    )
    return out
