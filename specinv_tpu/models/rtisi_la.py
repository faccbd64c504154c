"""RTISI-LA: Real-Time Iterative Spectrogram Inversion with Look-Ahead.

Reference: ``RTISI_LA`` at /root/reference/torch_specinv/methods.py:273-412.
Frame-sequential (causal) inversion: each output frame is committed after
``max_iter`` Griffin-Lim refinements over a small look-ahead window, with
momentum, an optional asymmetric analysis window on the newest frame, and a
committed-frame buffer providing the past context.

TPU-native design: the outer frame loop is a ``lax.scan`` carrying the pytree
``(keeped_chunk, update_chunk, pre_spec)`` — time-major ``(B, frames, n_fft)``
buffers — and the inner refinement loop is a ``lax.fori_loop``.  The
reference's ``unfold``-based asymmetric-window analysis (methods.py:371-383)
becomes a static-shaped framing + per-frame window matrix; its two momentum
special cases (methods.py:387-392) collapse into one formula because the
initial ``pre_spec`` carry is zero (subtracting ``lr * 0`` reproduces the
"no momentum on the very first step" behavior exactly).

Numerics preserved: ``synth_coeff = hop / (w @ w)`` (318), asymmetric windows
built from flipped-window partial sums (326-336), frame-shifted first-inner-
iteration momentum (389-391), projection epsilon 1e-16 (394), first-LA-commits
discard + final window^2-normalized OLA (406-408).
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..config import STFTConfig
from ..ops import fourier
from ..ops.framing import frame, overlap_add
from ..ops.pallas import fft4, rtisi_fused4
from ..ops.stft import make_envelope
from ..utils.runner import gate_verbose
from . import _pallas_driver as _driver
from .common import as_array as common_as_array
from .common import prepare_spec, restore_output
from .griffin_lim import PROJ_EPS


def _default_progress(msg: str) -> None:
    print(msg, flush=True)


# Late-bound progress sink: tests (or embedding applications) may swap this
# for a collector.  Looked up by name at callback time, not trace time.
_progress_sink = _default_progress


def _report_progress(msg: str) -> None:
    _progress_sink(msg)


# Row bound per fused-kernel launch: batches whose B*(la+1) exceeds it run
# as sequential row-bounded chunks.  With the NAIVE m-stage 64-row chunks
# measured +20% over one 256-row launch at B=64; the radix m-stage inverted
# that (scripts/exp_rtisi_chunk.py, interleaved marginals: 256-row 81.2k /
# 128-row 79.8k / 64-row chunks 78.0k frames/s aggregate) — fewer launches
# now win, so the bound sits at the largest MEASURED row count.  Past it
# (B > 64 at la=3) chunking still caps the per-launch VMEM footprint.
# `RTISI_LA(..., chunk_rows=N)` overrides.
_KERNEL_CHUNK_ROWS = 256


class RTISIState(NamedTuple):
    keeped: jnp.ndarray    # (B, num_keep, n_fft) committed time-domain frames
    update: jnp.ndarray    # (B, LA+1, n_fft) in-flight time-domain frames
    pre_spec: jnp.ndarray  # (B, LA+1, F) momentum spectrum from previous pass


def _asym_windows(window: jnp.ndarray, hop: int, num_keep: int, synth_coeff):
    """The two asymmetric synthesis-aware analysis windows (methods.py:326-336)."""
    n = window.shape[0]
    flipped = window[::-1]
    aw1 = jnp.zeros_like(window)
    for i in range(num_keep):
        off = (i + 1) * hop
        aw1 = aw1.at[off:].add(flipped[: n - off])
    aw2 = jnp.zeros_like(window)
    for i in range(num_keep + 1):
        off = i * hop
        aw2 = aw2.at[off:].add(flipped[: n - off] if off else flipped)
    return aw1 * synth_coeff, aw2 * synth_coeff


def _frame_step(
    state: RTISIState,
    target_slice: jnp.ndarray,  # (B, la+1, F) magnitude frames in the window
    window: jnp.ndarray,
    lr,
    cfg: STFTConfig,
    look_ahead: int,
    asymmetric_window: bool,
    max_iter: int,
    backend: str,
):
    """One RTISI-LA output-frame step: ``max_iter`` look-ahead GL refinements,
    then commit the oldest in-flight frame and slide the buffers.

    Shared by the offline ``lax.scan`` driver and the real-time
    :class:`RTISIStreamer`.  Mirrors the reference's inner loop + commit
    (methods.py:364-404) exactly.
    """
    la = look_ahead
    n_fft, hop = cfg.n_fft, cfg.hop_length
    num_keep = (n_fft - 1) // hop
    synth_coeff = hop / jnp.sum(window * window)
    aw1, aw2 = _asym_windows(window, hop, num_keep, synth_coeff)
    synth_window = window * synth_coeff
    fwd = partial(fourier.forward, cfg=cfg, backend=backend)
    inv = partial(fourier.inverse, cfg=cfg, backend=backend)

    keeped = state.keeped

    def refine(j, carry):
        pre_spec, update = carry
        # Windowed OLA of committed + in-flight frames, no normalization (365-368).
        all_frames = jnp.concatenate([keeped, update], axis=1) * synth_window
        x = overlap_add(all_frames, hop)
        x = x[..., num_keep * hop :]  # drop the committed prefix (370)

        frames_x = frame(x, n_fft, hop)  # (B, la+1, n_fft)
        if asymmetric_window:
            asym = jnp.where(j == 0, aw1, aw2)
            w_rows = jnp.concatenate(
                [jnp.broadcast_to(window, (la, n_fft)), asym[None]], axis=0
            )
            new_spec = fwd(frames_x * w_rows)
        else:
            new_spec = fwd(frames_x * window)

        # Momentum: j>0 -> plain; j==0 -> frame-shifted (387-392). Both
        # branches are cheap on (la+1) frames; select elementwise.
        plain = new_spec - lr * pre_spec
        shifted = jnp.concatenate(
            [new_spec[:, :-1] - lr * pre_spec[:, 1:], new_spec[:, -1:]], axis=1
        )
        new_spec = jnp.where(j == 0, shifted, plain)
        pre_spec = new_spec

        proj = new_spec * (target_slice / (jnp.abs(new_spec) + PROJ_EPS))
        update = inv(proj)
        return pre_spec, update

    pre_spec, update = jax.lax.fori_loop(
        0, max_iter, refine, (state.pre_spec, state.update)
    )

    committed = update[:, 0]  # (B, n_fft) — committed this step (401)
    if num_keep == 0:
        keeped = state.keeped  # hop >= win_length: no inter-frame overlap
    else:
        keeped = jnp.concatenate([state.keeped[:, 1:], update[:, :1]], axis=1)
    update = jnp.concatenate(
        [update[:, 1:], jnp.zeros_like(update[:, :1])], axis=1
    )
    return RTISIState(keeped=keeped, update=update, pre_spec=pre_spec), committed


def _kernel_frame_step(
    keeped: jnp.ndarray,      # (B, num_keep, n_fft)
    update_fm: jnp.ndarray,   # (R, n_fft) frame-major in-flight frames
    pre_re: jnp.ndarray,      # (R, m, 128) permuted momentum
    pre_im: jnp.ndarray,
    target_fm_p: jnp.ndarray,  # (R, m, 128) permuted magnitude, frame-major
    window: jnp.ndarray,
    lr,
    cfg: STFTConfig,
    look_ahead: int,
    asymmetric_window: bool,
    max_iter: int,
    interpret: bool = False,
    precision=None,
):
    """One RTISI-LA output-frame step through the fused refine kernel
    (:mod:`..ops.pallas.rtisi_fused4`): all ``max_iter`` refinements in one
    launch with the four-step tables and state VMEM-resident.  Same math as
    :func:`_frame_step`; the committed-context OLA prefix is loop-invariant
    so it is precomputed here and added once per refinement in-kernel."""
    la = look_ahead
    n_fft, hop = cfg.n_fft, cfg.hop_length
    B = keeped.shape[0]
    num_keep = (n_fft - 1) // hop
    synth_coeff = hop / jnp.sum(window * window)
    synth_window = window * synth_coeff
    if asymmetric_window:
        aw1, aw2 = _asym_windows(window, hop, num_keep, synth_coeff)
    else:
        aw1 = aw2 = window
    L = la * hop + n_fft
    if num_keep:
        # Committed frames' OLA, coords shifted past the dropped prefix
        # (methods.py:365-370); constant across the refinements.
        ola = overlap_add(keeped * synth_window, hop)
        tail = ola[..., num_keep * hop :]
        x_keep = jnp.pad(tail, ((0, 0), (0, L - tail.shape[-1])))
    else:
        x_keep = jnp.zeros((B, L), jnp.float32)
    prec = precision if precision is not None else jax.lax.Precision.HIGH
    twin_precision = (
        prec if isinstance(prec, jax.lax.Precision)
        else jax.lax.Precision.HIGHEST
    )

    # custom_vjp: forward = the fused kernel, backward = reverse-mode
    # through the XLA twin of the same refine loop (the gl_fullrun4/make_seg
    # pattern) — keeps the scan differentiable w.r.t. the target magnitude
    # (the reference's autograd contract, test_rtisila grid) on the kernel
    # path too.
    @jax.custom_vjp
    def refine(xk, upd0, p_re, p_im, tgt, win, awf, awr, sw, lr_):
        out = rtisi_fused4.refine_run4(
            xk, upd0, p_re, p_im, tgt, win, awf, awr, sw, lr_, cfg,
            max_iter=max_iter, asym=asymmetric_window,
            interpret=interpret, precision=prec,
        )
        return tuple(out)

    def refine_fwd(*args):
        return refine(*args), args

    def refine_bwd(residuals, cotangents):
        def replay(xk, upd0, p_re, p_im, tgt, win, awf, awr, sw, lr_):
            return _driver.rtisi_xla_twin4(
                xk, upd0, p_re, p_im, tgt, win, awf, awr, sw, lr_, cfg,
                max_iter=max_iter, asym=asymmetric_window,
                precision=twin_precision,
            )

        _, vjp = jax.vjp(replay, *residuals)
        return vjp(tuple(cotangents))

    refine.defvjp(refine_fwd, refine_bwd)

    upd, new_pre_re, new_pre_im = refine(
        x_keep, update_fm, pre_re, pre_im, target_fm_p,
        window, aw1, aw2, synth_window, lr,
    )
    committed = upd[:B]
    if num_keep:
        keeped = jnp.concatenate(
            [keeped[:, 1:], committed[:, None].astype(keeped.dtype)], axis=1
        )
    update_fm = jnp.concatenate([upd[B:], jnp.zeros_like(upd[:B])], axis=0)
    return (keeped, update_fm, new_pre_re, new_pre_im), committed


# Output-frame steps folded into one fused launch (the multi-frame kernel).
# 8 launches measured within noise of 4 and 16 on the flagship config; the
# per-launch VMEM grows only with the target window (k + la frame rows).
_FRAMES_PER_LAUNCH = 8


def _multi_twin(
    keep_fm, upd, p_re, p_im, tgt_steps, win, awf, awr, sw, lr_,
    cfg: STFTConfig, B: int, num_keep: int, max_iter: int, asym: bool,
    precision,
):
    """XLA re-statement of :func:`..ops.pallas.rtisi_fused4.refine_run4_multi`
    — the backward rule for its custom_vjp.  Chains ``k`` frame steps:
    committed-context OLA, the per-step refinement loop
    (:func:`._pallas_driver.rtisi_xla_twin4`), commit + slide."""
    n_fft, hop = cfg.n_fft, cfg.hop_length
    k, R, _ = tgt_steps.shape
    n_frames = R // B
    m = n_fft // 128
    L = (n_frames - 1) * hop + n_fft
    coms = []
    for s in range(k):
        if num_keep:
            keeped_bm = jnp.swapaxes(
                keep_fm.reshape(num_keep, B, n_fft), 0, 1
            )
            ola = overlap_add(keeped_bm * sw, hop)
            tail = ola[..., num_keep * hop :]
            x_keep = jnp.pad(tail, ((0, 0), (0, L - tail.shape[-1])))
        else:
            x_keep = jnp.zeros((B, L), jnp.float32)
        upd, s_re, s_im = _driver.rtisi_xla_twin4(
            x_keep, upd, p_re.reshape(R, m, 128), p_im.reshape(R, m, 128),
            tgt_steps[s].reshape(R, m, 128), win, awf, awr, sw, lr_,
            cfg, max_iter=max_iter, asym=asym, precision=precision,
        )
        p_re = s_re.reshape(R, n_fft)
        p_im = s_im.reshape(R, n_fft)
        committed = upd[:B]
        coms.append(committed)
        if num_keep:
            keep_fm = jnp.concatenate([keep_fm[B:], committed], axis=0)
        upd = jnp.concatenate([upd[B:], jnp.zeros_like(upd[:B])], axis=0)
    return jnp.stack(coms), keep_fm, upd, p_re, p_im


def _kernel_multi_steps(
    keep_fm: jnp.ndarray,     # (max(num_keep,1)*B, n_fft) frame-major
    update_fm: jnp.ndarray,   # (R, n_fft) frame-major in-flight frames
    pre_re: jnp.ndarray,      # (R, n_fft) lane-flat momentum
    pre_im: jnp.ndarray,
    tgt_steps: jnp.ndarray,   # (k, R, n_fft) lane-flat target, step-major
    window: jnp.ndarray,
    lr,
    cfg: STFTConfig,
    look_ahead: int,
    asymmetric_window: bool,
    max_iter: int,
    interpret: bool = False,
    precision=None,
):
    """``k`` RTISI-LA output-frame steps in ONE fused launch
    (:func:`..ops.pallas.rtisi_fused4.refine_run4_multi`): the per-frame
    XLA glue of :func:`_kernel_frame_step` — committed-context OLA, commit/
    slide concats, state through HBM — moves into the kernel and is paid
    once per ``k`` frames.  Same math as ``k`` chained frame steps."""
    n_fft, hop = cfg.n_fft, cfg.hop_length
    B = tgt_steps.shape[1] // (look_ahead + 1)
    num_keep = (n_fft - 1) // hop
    synth_coeff = hop / jnp.sum(window * window)
    synth_window = window * synth_coeff
    if asymmetric_window:
        aw1, aw2 = _asym_windows(window, hop, num_keep, synth_coeff)
    else:
        aw1 = aw2 = window
    prec = precision if precision is not None else jax.lax.Precision.HIGH
    twin_precision = (
        prec if isinstance(prec, jax.lax.Precision)
        else jax.lax.Precision.HIGHEST
    )

    @jax.custom_vjp
    def multi(kp, up, pr, pi, tg, win, awf, awr, sw, lr_):
        return tuple(
            rtisi_fused4.refine_run4_multi(
                kp, up, pr, pi, tg, win, awf, awr, sw, lr_, cfg,
                B=B, num_keep=num_keep, max_iter=max_iter,
                asym=asymmetric_window, interpret=interpret, precision=prec,
            )
        )

    def multi_fwd(*args):
        return multi(*args), args

    def multi_bwd(residuals, cotangents):
        def replay(kp, up, pr, pi, tg, win, awf, awr, sw, lr_):
            return _multi_twin(
                kp, up, pr, pi, tg, win, awf, awr, sw, lr_, cfg,
                B=B, num_keep=num_keep, max_iter=max_iter,
                asym=asymmetric_window, precision=twin_precision,
            )

        _, vjp = jax.vjp(replay, *residuals)
        return vjp(tuple(cotangents))

    multi.defvjp(multi_fwd, multi_bwd)

    com, keep_fm, update_fm, pre_re, pre_im = multi(
        keep_fm, update_fm, pre_re, pre_im, tgt_steps,
        window, aw1, aw2, synth_window, lr,
    )
    return (keep_fm, update_fm, pre_re, pre_im), com


@partial(
    jax.jit,
    static_argnames=(
        "cfg",
        "look_ahead",
        "asymmetric_window",
        "max_iter",
        "verbose",
        "backend",
        "interpret",
        "precision",
        "remat",
        "chunk_rows",
        "frames_per_launch",
    ),
)
def run_tm(
    target_tm: jnp.ndarray,
    window: jnp.ndarray,
    lr: jnp.ndarray,
    cfg: STFTConfig,
    look_ahead: int,
    asymmetric_window: bool = False,
    max_iter: int = 25,
    verbose: bool = False,
    backend: str = "auto",
    interpret: bool = False,
    precision=None,
    remat: bool = False,
    chunk_rows: int | None = None,
    frames_per_launch: int | None = None,
) -> jnp.ndarray:
    """Time-major RTISI-LA: magnitude (B, T, F) -> waveform (B, L).

    ``backend='pallas4'`` runs each output-frame step through the fused
    refine kernel (momentum carried in permuted four-step layout across the
    whole scan — no per-step relayout); everything else takes the XLA scan
    with per-call DFT lowering via :func:`fourier.resolve_backend`.
    """
    B, steps, F = target_tm.shape
    n_fft, hop = cfg.n_fft, cfg.hop_length
    la = look_ahead
    num_keep = (n_fft - 1) // hop
    use_kernel = backend == "pallas4"

    # Batches past the per-launch row bound (see _KERNEL_CHUNK_ROWS; the
    # radix m-stage moved the measured optimum to the largest tested launch)
    # are independent streams, so run them as sequential row-bounded chunks
    # of one compiled program (zero-magnitude padding is benign: projection
    # gain 0/(|S|+eps) = 0).
    chunk_b = max(1, (chunk_rows or _KERNEL_CHUNK_ROWS) // (la + 1))
    if use_kernel and B > chunk_b:
        nb = -(-B // chunk_b)
        pad_b = nb * chunk_b - B
        tgt = jnp.pad(target_tm, ((0, pad_b), (0, 0), (0, 0)))

        def chunk_body(k, t):
            # Per-frame reporting would replay "frame i/total" once per
            # chunk; report chunk-level progress instead.
            out = run_tm(
                t, window, lr, cfg, look_ahead=la,
                asymmetric_window=asymmetric_window, max_iter=max_iter,
                verbose=False, backend=backend, interpret=interpret,
                precision=precision, remat=remat, chunk_rows=chunk_rows,
                frames_per_launch=frames_per_launch,
            )
            if verbose:
                jax.debug.callback(
                    lambda k_: _report_progress(
                        f"rtisi-la chunk {int(k_) + 1}/{nb}"
                    ),
                    k, ordered=False,
                )
            return k + 1, out

        _, out = jax.lax.scan(
            chunk_body, jnp.array(0), tgt.reshape(nb, chunk_b, steps, F)
        )
        return out.reshape(nb * chunk_b, -1)[:B]

    # Pad the target by `la` frames on both sides of the time axis (339).
    target_pad = jnp.pad(target_tm, ((0, 0), (la, la), (0, 0)))

    # Kernel path: the only XLA DFT left is the one-off zero-phase seed.
    # Pin it to the fft lowering — 'auto' picks by dot-row count, which is
    # the LAUNCH batch size here, so chunked sub-batches could seed through
    # a different lowering (fft vs matmul, 1-ulp apart) than the unchunked
    # launch and RTISI's causal recursion would amplify that into visibly
    # different (quality-equivalent) waveforms.  A fixed lowering keeps the
    # documented chunking bitwise-invariance on hardware; fft is also the
    # measured winner at seed-sized row counts.
    inv = partial(
        fourier.inverse, cfg=cfg, backend="fft" if use_kernel else backend
    )

    # First frame seeded with zero phase (352-358).
    first = inv(target_pad[:, la : la + 1].astype(target_pad.dtype) + 0j)

    def report(i):
        # Chunked, unordered host callback: reports every `every` frames
        # (≤ ~16 reports per run) without serializing the scan — the
        # reference's per-frame tqdm equivalent (methods.py:362,400).
        total = steps + la
        every = max(1, total // 16)

        def _cb(i_):
            _report_progress(f"rtisi-la frame {int(i_) + 1}/{total}")

        jax.lax.cond(
            jnp.logical_or((i + 1) % every == 0, i + 1 == total),
            lambda: jax.debug.callback(_cb, i, ordered=False),
            lambda: None,
        )

    if use_kernel:
        m = n_fft // 128
        R = (la + 1) * B
        total = steps + la
        kpl = _FRAMES_PER_LAUNCH if frames_per_launch is None else frames_per_launch
        kpl = max(1, min(kpl, total))
        update0_fm = jnp.concatenate(
            [jnp.zeros((la * B, n_fft), jnp.float32),
             first[:, 0].astype(jnp.float32)], axis=0
        )
        if kpl > 1:
            # Multi-frame launches: kpl output-frame steps per kernel call
            # (commit/slide + committed-context OLA in VMEM); per-launch XLA
            # glue = one dynamic slice + the step-major target gather.
            n_launch = -(-total // kpl)
            extra = n_launch * kpl - total  # zero-magnitude pad steps (inert)
            tgt_full = fft4.extend_hermitian_mag(
                target_pad.astype(jnp.float32), n_fft
            )
            tgt_lane = jnp.swapaxes(
                fft4.to_permuted(tgt_full, n_fft).reshape(B, -1, n_fft), 0, 1
            )  # (T', B, n_fft) lane-flat
            if extra:
                tgt_lane = jnp.pad(tgt_lane, ((0, extra), (0, 0), (0, 0)))
            Bk = max(num_keep, 1) * B
            state0m = (
                jnp.zeros((Bk, n_fft), jnp.float32),
                update0_fm,
                jnp.zeros((R, n_fft), jnp.float32),
                jnp.zeros((R, n_fft), jnp.float32),
            )

            def launch_m(state, blk):
                return _kernel_multi_steps(
                    *state, blk, window, lr, cfg,
                    look_ahead=la, asymmetric_window=asymmetric_window,
                    max_iter=max_iter, interpret=interpret,
                    precision=precision,
                )

            if remat:
                launch_m = jax.checkpoint(launch_m)

            def outer_m(state, i0):
                win = jax.lax.dynamic_slice_in_dim(
                    tgt_lane, i0, kpl + la, axis=0
                )
                blk = jnp.stack(
                    [win[s : s + la + 1].reshape(R, n_fft) for s in range(kpl)]
                )
                new_state, com = launch_m(state, blk)  # com (kpl, B, n_fft)
                if verbose:
                    # Clamp to the real frame total: the last launch is
                    # zero-padded (i0 + kpl can reach total + extra), and an
                    # out-of-range index would skip the final "frame N/N"
                    # line (ADVICE r4).
                    report(jnp.minimum(i0 + kpl, steps + la) - 1)
                return new_state, com

            _, out = jax.lax.scan(
                outer_m, state0m, jnp.arange(n_launch) * kpl
            )
            frames_out = out.reshape(n_launch * kpl, B, n_fft)[:total].astype(
                target_tm.dtype
            )
        else:
            # Per-frame launches (kpl == 1): permuted-plane state.
            tgt_full = fft4.extend_hermitian_mag(
                target_pad.astype(jnp.float32), n_fft
            )
            tgt_fm = jnp.swapaxes(fft4.to_permuted(tgt_full, n_fft), 0, 1)
            state0k = (
                jnp.zeros((B, num_keep, n_fft), jnp.float32),
                update0_fm,
                jnp.zeros((R, m, 128), jnp.float32),
                jnp.zeros((R, m, 128), jnp.float32),
            )

            def frame_step_k(state, sl):
                return _kernel_frame_step(
                    *state, sl, window, lr, cfg,
                    look_ahead=la, asymmetric_window=asymmetric_window,
                    max_iter=max_iter, interpret=interpret,
                    precision=precision,
                )

            if remat:
                # Save only the per-frame carry under reverse mode; the frame
                # step's refinements are recomputed (see runner.iterate remat).
                frame_step_k = jax.checkpoint(frame_step_k)

            def outer_k(state, i):
                sl = jax.lax.dynamic_slice_in_dim(tgt_fm, i, la + 1, axis=0)
                new_state, committed = frame_step_k(
                    state, sl.reshape(R, m, 128)
                )
                if verbose:
                    report(i)
                return new_state, committed

            _, frames_out = jax.lax.scan(outer_k, state0k, jnp.arange(total))
            frames_out = frames_out.astype(target_tm.dtype)
    else:
        update0 = jnp.concatenate(
            [jnp.zeros((B, la, n_fft), first.dtype), first], axis=1
        )
        state0 = RTISIState(
            keeped=jnp.zeros((B, num_keep, n_fft), first.dtype),
            update=update0,
            pre_spec=jnp.zeros(
                (B, la + 1, F),
                dtype=jnp.result_type(first.dtype, jnp.complex64),
            ),
        )

        def frame_step(state, target_slice):
            return _frame_step(
                state, target_slice, window, lr, cfg,
                look_ahead=la, asymmetric_window=asymmetric_window,
                max_iter=max_iter, backend=backend,
            )

        if remat:
            frame_step = jax.checkpoint(frame_step)

        def outer(state: RTISIState, i):
            target_slice = jax.lax.dynamic_slice_in_dim(
                target_pad, i, la + 1, axis=1
            )
            new_state, committed = frame_step(state, target_slice)
            if verbose:
                report(i)
            return new_state, committed

        _, frames_out = jax.lax.scan(
            outer, state0, jnp.arange(steps + la)
        )  # frames_out: (steps+la, B, n_fft)

    all_xt = jnp.moveaxis(frames_out[la:], 0, 1)  # (B, steps, n_fft)

    # Final synthesis: windowed OLA + window^2 envelope (406-408).
    x = overlap_add(all_xt * window, hop)
    envelope = make_envelope(cfg, window, steps)
    p = cfg.pad_amount
    if p:
        x = x[..., p:-p]
    envelope = jnp.where(envelope == 0, jnp.ones_like(envelope), envelope)
    return x / envelope


def _resolve_backend(backend, cfg, window, dtype, precision=None):
    """Shared RTISI backend dispatch (offline entry point + streamer).

    ``auto`` promotes to the fused refine kernel on accelerator backends
    whenever the config allows — it measured faster at every stream count
    (20x single-stream, ~1.9x at 16/64 streams, readback-clean marginals —
    benchmarks.md "Batched RTISI-LA").  Non-CPU platforms are assumed TPU
    (this library is TPU-native; same convention as griffin_lim/ADMM — the
    Mosaic kernels would not lower elsewhere, pass an explicit XLA backend
    there).  Explicit ``pallas4`` validates the
    kernel's geometry/dtype constraints loudly; ``precision`` is
    kernel-only (XLA backends follow ``ops.fourier.set_default_precision``).
    """
    if backend == "pallas":
        # A whole-stream direct-DFT fused kernel existed in round 1 and was
        # REMOVED: interleaved A/B rounds measured it consistently 5-15%
        # slower than the rows-aware FFT scan (e.g. 1893/2003/1585 vs
        # 2002/2139/1844 frames/s on the flagship config) — at
        # (look_ahead+1)-row DFT granularity the chip is latency-bound and
        # the kernel had no dispatch-overhead niche either.  The four-step
        # refine kernel (backend='pallas4') is its successor: its win is
        # VMEM-resident tables across the max_iter refinements, not launch
        # count.  See benchmarks.md.
        raise ValueError(
            "RTISI-LA has no 'pallas' backend (the direct-DFT stream kernel "
            "was removed after measuring slower than the scan path); use "
            "backend='pallas4' or 'auto'"
        )
    if (
        backend == "auto"
        and jax.default_backend() not in ("cpu",)
        and rtisi_fused4.supports(cfg, window)
        and jnp.dtype(dtype) == jnp.float32
    ):
        backend = "pallas4"
    if backend == "pallas4":
        if not rtisi_fused4.supports(cfg, window):
            raise ValueError(
                "pallas4 RTISI requires onesided=True, n_fft % 128 == 0, "
                "hop % 128 == 0 and a real window; use backend='auto' "
                "instead"
            )
        if jnp.dtype(dtype) != jnp.float32:
            raise ValueError(
                "pallas4 RTISI runs in float32; cast the spectrogram or use "
                "backend='auto'"
            )
    elif precision is not None:
        raise ValueError(
            "precision applies to backend='pallas4' only; XLA backends "
            "follow ops.fourier.set_default_precision"
        )
    return backend


def RTISI_LA(
    spec,
    look_ahead: int = -1,
    asymmetric_window: bool = False,
    max_iter: int = 25,
    alpha: float = 0.99,
    verbose=1,
    backend: str = "auto",
    precision=None,
    remat: bool = False,
    chunk_rows: int | None = None,
    frames_per_launch: int | None = None,
    **stft_kwargs,
):
    """Reference-parity entry point (methods.py:273-412).

    ``look_ahead=-1`` uses ``(win_length - 1) // hop`` future frames; ``0``
    disables look-ahead (original RTISI).  Input must be a magnitude
    spectrogram ``(F, T)`` / ``(B, F, T)``.

    ``backend='pallas4'`` runs each frame step's ``max_iter`` refinements in
    one fused kernel launch with the four-step DFT tables VMEM-resident
    (``ops/pallas/rtisi_fused4.py``); requires onesided, n_fft % 128 == 0,
    hop % 128 == 0, a real window and float32 input.  ``precision`` applies
    to that kernel (``jax.lax.Precision`` or a bf16 scheme string; None =
    library default HIGH).  ``chunk_rows`` overrides the kernel's per-launch
    DFT-row bound (default :data:`_KERNEL_CHUNK_ROWS`; batches whose
    ``B * (look_ahead + 1)`` exceeds it run as row-bounded sequential chunks
    — bitwise-invariant, tuning-only).  ``frames_per_launch`` sets how many
    output-frame steps each fused launch folds together (commit/slide and
    the committed-context OLA run in VMEM between them; default
    :data:`_FRAMES_PER_LAUNCH`, ``1`` = one launch per frame).
    """
    assert max_iter > 0 and alpha >= 0
    spec = common_as_array(spec)
    if jnp.iscomplexobj(spec):
        raise ValueError("RTISI_LA expects a magnitude (real) spectrogram")
    spec_tm, was_2d, cfg, window = prepare_spec(spec, **stft_kwargs)
    num_keep = (cfg.n_fft - 1) // cfg.hop_length
    la = num_keep if look_ahead < 0 else look_ahead
    backend = _resolve_backend(backend, cfg, window, spec_tm.dtype, precision)
    if chunk_rows is not None:
        if chunk_rows < 1:
            raise ValueError(f"chunk_rows must be >= 1, got {chunk_rows}")
        if backend != "pallas4":
            raise ValueError(
                "chunk_rows tunes the fused-kernel launch bound and applies "
                f"to backend='pallas4' only (resolved backend: {backend!r})"
            )
    if frames_per_launch is not None:
        if frames_per_launch < 1:
            raise ValueError(
                f"frames_per_launch must be >= 1, got {frames_per_launch}"
            )
        if backend != "pallas4":
            raise ValueError(
                "frames_per_launch tunes the fused-kernel step folding and "
                f"applies to backend='pallas4' only (resolved backend: "
                f"{backend!r})"
            )
    lr = jnp.asarray(alpha / (1 + alpha), dtype=spec_tm.dtype)
    x = run_tm(
        spec_tm,
        window,
        lr,
        cfg,
        look_ahead=la,
        asymmetric_window=asymmetric_window,
        max_iter=max_iter,
        verbose=gate_verbose(verbose),
        backend=backend,
        interpret=jax.default_backend() == "cpu",
        precision=precision,
        remat=remat,
        chunk_rows=chunk_rows,
        frames_per_launch=frames_per_launch,
    )
    return restore_output(x, was_2d)


rtisi_la = RTISI_LA


_frame_step_jit = partial(
    jax.jit,
    static_argnames=("cfg", "look_ahead", "asymmetric_window", "max_iter", "backend"),
)(_frame_step)


@partial(
    jax.jit,
    static_argnames=(
        "cfg", "look_ahead", "asymmetric_window", "max_iter",
        "interpret", "precision", "chunk_rows",
    ),
)
def _kernel_streamer_step(
    state: RTISIState,
    target_slice: jnp.ndarray,  # (B, la+1, F) magnitude frames
    window: jnp.ndarray,
    lr,
    cfg: STFTConfig,
    look_ahead: int,
    asymmetric_window: bool,
    max_iter: int,
    interpret: bool = False,
    precision=None,
    chunk_rows: int | None = None,
):
    """Streamer-facing wrapper of :func:`_kernel_frame_step`.  In kernel
    mode the streamer's ``pre_spec`` field holds the kernel's permuted
    momentum as BATCH-MAJOR ``(B, la+1, m, 128)`` planes — converting
    through the onesided complex layout would regenerate the mirror bins by
    conjugation, a 1-ulp perturbation that RTISI's causal recursion
    amplifies ~2x per committed frame; carrying the planes natively keeps
    the streamer bit-identical to the offline ``backend='pallas4'`` path
    (the per-step batch<->frame-major transposes and target extend+permute
    are value-exact layout ops).  Batches beyond the kernel's measured
    ~``_KERNEL_CHUNK_ROWS``-row launch sweet spot run as row-bounded
    sequential chunks, like the offline path (zero-magnitude padding
    streams are inert)."""
    la = look_ahead
    n_fft = cfg.n_fft
    m = n_fft // 128
    B = state.keeped.shape[0]
    pre_re_bm, pre_im_bm = state.pre_spec

    def one(keeped, update, p_re, p_im, tgt):
        # One k=1 launch of the MULTI-frame kernel — the same per-step ops
        # the offline path runs (in-kernel committed-context OLA and
        # commit/slide), so the streamer stays bit-identical to offline
        # regardless of the offline frames_per_launch folding.
        b = keeped.shape[0]
        r = (la + 1) * b
        nk = (n_fft - 1) // cfg.hop_length
        update_fm = jnp.swapaxes(update, 0, 1).reshape(r, n_fft)
        tgt_full = fft4.extend_hermitian_mag(
            jnp.swapaxes(tgt, 0, 1).astype(jnp.float32), n_fft
        )
        tgt_steps = fft4.to_permuted(tgt_full, n_fft).reshape(1, r, n_fft)
        pre_re = jnp.swapaxes(p_re, 0, 1).reshape(r, n_fft)
        pre_im = jnp.swapaxes(p_im, 0, 1).reshape(r, n_fft)
        if nk:
            keep_fm = jnp.swapaxes(keeped, 0, 1).reshape(nk * b, n_fft)
        else:
            keep_fm = jnp.zeros((b, n_fft), jnp.float32)
        (keep_fm2, update_fm2, new_re, new_im), com = _kernel_multi_steps(
            keep_fm.astype(jnp.float32), update_fm.astype(jnp.float32),
            pre_re, pre_im, tgt_steps, window, lr, cfg,
            look_ahead=la, asymmetric_window=asymmetric_window,
            max_iter=max_iter, interpret=interpret, precision=precision,
        )
        committed = com[0]
        keeped2 = (
            jnp.swapaxes(keep_fm2.reshape(nk, b, n_fft), 0, 1)
            if nk else keeped
        )
        update2 = jnp.swapaxes(update_fm2.reshape(la + 1, b, n_fft), 0, 1)
        nr = jnp.swapaxes(new_re.reshape(la + 1, b, m, 128), 0, 1)
        ni = jnp.swapaxes(new_im.reshape(la + 1, b, m, 128), 0, 1)
        return keeped2, update2, nr, ni, committed

    chunk_b = max(1, (chunk_rows or _KERNEL_CHUNK_ROWS) // (la + 1))
    if B > chunk_b:
        nb = -(-B // chunk_b)
        pb = nb * chunk_b - B

        def pad_chunk(a):
            a = jnp.pad(a, ((0, pb),) + ((0, 0),) * (a.ndim - 1))
            return a.reshape((nb, chunk_b) + a.shape[1:])

        outs = jax.lax.map(
            lambda xs: one(*xs),
            tuple(
                pad_chunk(a)
                for a in (
                    state.keeped, state.update, pre_re_bm, pre_im_bm,
                    target_slice,
                )
            ),
        )
        keeped, update, nr, ni, committed = (
            a.reshape((nb * chunk_b,) + a.shape[2:])[:B] for a in outs
        )
    else:
        keeped, update, nr, ni, committed = one(
            state.keeped, state.update, pre_re_bm, pre_im_bm, target_slice
        )
    return RTISIState(
        keeped=keeped.astype(state.keeped.dtype),
        update=update.astype(state.update.dtype),
        pre_spec=(nr, ni),
    ), committed


class RTISIStreamer:
    """Real-time frame-in / samples-out RTISI-LA.

    The reference implements RTISI-LA only as an offline batch call even
    though the algorithm is real-time by construction; this class exposes the
    causal interface: feed magnitude frames one at a time, receive ``hop``
    committed samples per frame once the ``look_ahead`` warmup has filled.

    Latency is ``look_ahead + 1`` frames.  Samples are emitted through a
    steady-state window^2 OLA envelope (the periodic interior envelope), so a
    stream's first/last samples differ slightly from the offline call's
    edge-normalized output — inherent to streaming.

    Example::

        st = RTISIStreamer(num_freqs=257, look_ahead=3, window=hann)
        for frame in mag_frames:          # (F,) each
            chunk = st.push(frame)        # (hop,) or None during warmup
        tail = st.flush()
    """

    def __init__(
        self,
        num_freqs: int,
        look_ahead: int = 3,
        asymmetric_window: bool = False,
        max_iter: int = 25,
        alpha: float = 0.99,
        batch: int = 1,
        dtype=jnp.float32,
        backend: str = "auto",
        chunk_rows: int | None = None,
        **stft_kwargs,
    ):
        from ..config import canonicalize
        import numpy as np

        self.cfg, window_np = canonicalize(num_freqs, np.dtype(dtype), **stft_kwargs)
        self.window = jnp.asarray(window_np)
        n_fft, hop = self.cfg.n_fft, self.cfg.hop_length
        self.num_keep = (n_fft - 1) // hop
        self.la = self.num_keep if look_ahead < 0 else look_ahead
        self.asymmetric_window = asymmetric_window
        self.max_iter = max_iter
        self.lr = jnp.asarray(alpha / (1 + alpha), dtype=dtype)
        self.batch = batch
        self.backend = backend = _resolve_backend(
            backend, self.cfg, self.window, dtype
        )
        if chunk_rows is not None:
            if chunk_rows < 1:
                raise ValueError(f"chunk_rows must be >= 1, got {chunk_rows}")
            if backend != "pallas4":
                raise ValueError(
                    "chunk_rows tunes the fused-kernel launch bound and "
                    f"applies to backend='pallas4' only (resolved: {backend!r})"
                )
        self.chunk_rows = chunk_rows
        self.F = num_freqs

        cdtype = jnp.result_type(dtype, jnp.complex64)
        self._cdtype = cdtype
        if backend == "pallas4":
            # Kernel mode carries the momentum in the kernel's permuted
            # layout, batch-major (see _kernel_streamer_step).
            m = n_fft // 128
            pre0 = (
                jnp.zeros((batch, self.la + 1, m, 128), jnp.float32),
                jnp.zeros((batch, self.la + 1, m, 128), jnp.float32),
            )
        else:
            pre0 = jnp.zeros((batch, self.la + 1, self.F), cdtype)
        self.state = RTISIState(
            keeped=jnp.zeros((batch, self.num_keep, n_fft), dtype),
            update=jnp.zeros((batch, self.la + 1, n_fft), dtype),
            pre_spec=pre0,
        )
        # Left look-ahead zero-padding, mirroring the offline target pad
        # (methods.py:339) so the streamed state trajectory matches offline.
        self._pending = [jnp.zeros((batch, self.F), dtype)] * self.la
        self._warmup = self.la       # commits to discard (reference drops la)
        self._started = False
        self._ola_buf = jnp.zeros((batch, n_fft), dtype)
        # Steady-state periodic envelope over one hop (sum of hop-shifted w^2),
        # and the decaying suffix envelope used for the flush tail.
        wsq = np.asarray(window_np) ** 2
        k = -(-n_fft // hop)
        suffix = np.zeros(n_fft)
        for j in range(k):
            suffix[: n_fft - j * hop] += wsq[j * hop :]
        env = suffix[:hop].copy()
        env[env == 0] = 1.0
        suffix[suffix == 0] = 1.0
        self._env = jnp.asarray(env, dtype=dtype)
        self._suffix_env = jnp.asarray(suffix, dtype=dtype)

    def push(self, frame_mag):
        """Feed one magnitude frame ``(F,)`` / ``(B, F)``; returns ``(B, hop)``
        committed samples, or ``None`` while the look-ahead window fills."""
        frame_mag = jnp.asarray(frame_mag)
        if frame_mag.ndim == 1:
            frame_mag = frame_mag[None]
        if not self._started:
            # Seed the newest in-flight frame with zero phase (ref 352-358).
            # 'fft' pinned like run_tm's kernel-path seed: keeps the seed
            # lowering independent of the stream batch size, so the streamer
            # stays bit-identical to the offline kernel path at any B.
            first = fourier.inverse(
                frame_mag[:, None, :].astype(self._cdtype),
                self.cfg,
                backend="fft" if self.backend == "pallas4" else self.backend,
            ).astype(self.state.update.dtype)
            self.state = self.state._replace(
                update=jnp.concatenate(
                    [self.state.update[:, : self.la], first], axis=1
                )
            )
            self._started = True
        self._pending.append(frame_mag)
        if len(self._pending) < self.la + 1:
            return None
        return self._step(jnp.stack(self._pending, axis=1))

    def _step(self, target_slice):
        if self.backend == "pallas4":
            self.state, committed = _kernel_streamer_step(
                self.state, target_slice, self.window, self.lr, self.cfg,
                look_ahead=self.la,
                asymmetric_window=self.asymmetric_window,
                max_iter=self.max_iter,
                interpret=jax.default_backend() == "cpu",
                chunk_rows=self.chunk_rows,
            )
        else:
            self.state, committed = _frame_step_jit(
                self.state, target_slice, self.window, self.lr, self.cfg,
                look_ahead=self.la, asymmetric_window=self.asymmetric_window,
                max_iter=self.max_iter, backend=self.backend,
            )
        self._pending.pop(0)
        if self._warmup:
            self._warmup -= 1
            return None
        return self._emit(committed)

    def _emit(self, committed):
        hop, n_fft = self.cfg.hop_length, self.cfg.n_fft
        buf = self._ola_buf + committed * self.window
        out = buf[:, :hop] / self._env
        self._ola_buf = jnp.concatenate(
            [buf[:, hop:], jnp.zeros((self.batch, hop), buf.dtype)], axis=1
        )
        return out

    def flush(self):
        """Drain the look-ahead pipeline; returns the remaining samples
        ``(B, n_samples)``."""
        chunks = []
        while self._pending:
            # Pad the target window with zero frames, like the reference's
            # right-side look-ahead padding (methods.py:339).
            padded = self._pending + [
                jnp.zeros((self.batch, self.F), self._pending[0].dtype)
            ] * (self.la + 1 - len(self._pending))
            out = self._step(jnp.stack(padded, axis=1))
            if out is not None:
                chunks.append(out)
        # Remaining OLA tail through the decaying suffix envelope.
        chunks.append(self._ola_buf / self._suffix_env[None])
        return jnp.concatenate(chunks, axis=1) if chunks else jnp.zeros((self.batch, 0))
