"""RTISI-LA as a single Pallas kernel: the whole frame stream in one launch.

The XLA formulation (models/rtisi_la.py) is a ``lax.scan`` whose per-frame
work is tiny — a handful of 4-row DFTs and buffer shifts — so it is bound by
per-op dispatch, not compute.  Here the *entire* causal stream runs inside
one kernel with a sequential grid ``(B, steps)``:

* the committed-frame buffer, in-flight buffer, and momentum spectrum live in
  VMEM **scratch that persists across grid steps** (re-initialized when a new
  clip's ``s == 0`` program runs);
* the cos/sin DFT tables are VMEM-resident for the whole stream instead of
  being re-streamed from HBM on every inner iteration (the XLA matmul path's
  downfall at 4-row sizes);
* each grid step runs the full ``max_iter`` refinement loop and emits one
  committed time-domain frame.

Numerics mirror models/rtisi_la.py::_frame_step exactly (synth_coeff
windowed OLA, asymmetric first-iteration window, frame-shifted momentum via
zero-initialized carry, projection eps).  The final windowed OLA + envelope
normalization stays in XLA (one shot).

Constraints: onesided, real window, ``n_fft % 128 == 0``, ``num_keep >= 1``.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import STFTConfig
from .gl_fused import LANE, PROJ_EPS, _dft_tables, _dot3


def _kernel(
    lr_ref,          # SMEM (1, 1)
    sc_ref,          # SMEM (1, 1) synth_coeff
    tgt_ref,         # (1, 1, LA+1, F_pad) look-ahead target window for this step
    cos_ref,         # (n_fft, F_pad)
    sin_ref,         # (n_fft, F_pad)
    w_ref,           # (1, F_pad) hermitian fold weights
    win_ref,         # (1, n_fft)
    aw1_ref,         # (1, n_fft)
    aw2_ref,         # (1, n_fft)
    out_ref,         # (1, 1, 1, n_fft) committed frame for this step
    keeped_s,        # VMEM (K, n_fft), persists across steps
    update_s,        # VMEM (LA+1, n_fft)
    pre_re_s,        # VMEM (LA+1, F_pad)
    pre_im_s,        # VMEM (LA+1, F_pad)
    x_s,             # VMEM (1, x_len)
    *,
    n_fft: int,
    hop: int,
    num_keep: int,
    la: int,
    max_iter: int,
    asymmetric_window: bool,
    precision,
):
    s = pl.program_id(1)
    window = win_ref[0, :]
    lr = lr_ref[0, 0]
    synth_coeff = sc_ref[0, 0]
    rows = la + 1
    x_len = (num_keep + la) * hop + n_fft

    @pl.when(s == 0)
    def _init():
        keeped_s[...] = jnp.zeros_like(keeped_s)
        pre_re_s[...] = jnp.zeros_like(pre_re_s)
        pre_im_s[...] = jnp.zeros_like(pre_im_s)
        update_s[...] = jnp.zeros_like(update_s)
        # Zero-phase seed of the first frame: irfft(mag + 0j) (ref 352-358).
        first = tgt_ref[0, 0, la : la + 1, :] * w_ref[...]
        contract = (((1,), (1,)), ((), ()))
        update_s[rows - 1 : rows, :] = _dot3(first, cos_ref[...], contract, precision)

    def refine(j, _):
        # Windowed OLA of committed + in-flight frames (no normalization).
        x_s[...] = jnp.zeros_like(x_s)
        synth_w = window * synth_coeff
        for r in range(num_keep):
            x_s[0, pl.ds(r * hop, n_fft)] += keeped_s[r, :] * synth_w
        for r in range(rows):
            x_s[0, pl.ds((num_keep + r) * hop, n_fft)] += update_s[r, :] * synth_w

        # Analysis frames of the trimmed signal (drop committed prefix).
        base = num_keep * hop
        fb = [
            x_s[0, pl.ds(base + r * hop, n_fft)].reshape(1, n_fft)
            for r in range(rows)
        ]
        if asymmetric_window:
            asym = jnp.where(j == 0, aw1_ref[0, :], aw2_ref[0, :])
            frames_w = jnp.concatenate(
                [fb[r] * window for r in range(rows - 1)] + [fb[-1] * asym],
                axis=0,
            )
        else:
            frames_w = jnp.concatenate(fb, axis=0) * window

        fwd = (((1,), (0,)), ((), ()))
        s_re = _dot3(frames_w, cos_ref[...], fwd, precision)
        s_im = -_dot3(frames_w, sin_ref[...], fwd, precision)

        # Momentum: j>0 plain; j==0 frame-shifted (zero-initialized carry
        # makes the very first step's no-momentum case fall out).
        pre_re = pre_re_s[...]
        pre_im = pre_im_s[...]
        plain_re = s_re - lr * pre_re
        plain_im = s_im - lr * pre_im
        if la > 0:
            shift_re = jnp.concatenate(
                [s_re[:-1] - lr * pre_re[1:], s_re[-1:]], axis=0
            )
            shift_im = jnp.concatenate(
                [s_im[:-1] - lr * pre_im[1:], s_im[-1:]], axis=0
            )
        else:
            shift_re, shift_im = s_re, s_im
        new_re = jnp.where(j == 0, shift_re, plain_re)
        new_im = jnp.where(j == 0, shift_im, plain_im)
        pre_re_s[...] = new_re
        pre_im_s[...] = new_im

        # Magnitude projection onto the look-ahead target window.
        tslice = tgt_ref[0, 0]  # (rows, F_pad)
        norm = jnp.sqrt(new_re * new_re + new_im * new_im) + PROJ_EPS
        gain = tslice / norm * w_ref[0, :]
        inv = (((1,), (1,)), ((), ()))
        update_s[...] = _dot3(new_re * gain, cos_ref[...], inv, precision) - _dot3(
            new_im * gain, sin_ref[...], inv, precision
        )
        return 0

    jax.lax.fori_loop(0, max_iter, refine, 0)

    # Commit the oldest in-flight frame, slide the buffers (ref 401-404).
    out_ref[0, 0, 0, :] = update_s[0, :]
    if num_keep == 1:
        keeped_s[...] = update_s[:1, :]
    elif num_keep > 1:
        keeped_s[...] = jnp.concatenate(
            [keeped_s[1:, :], update_s[:1, :]], axis=0
        )
    if la > 0:
        update_s[...] = jnp.concatenate(
            [update_s[1:, :], jnp.zeros((1, n_fft), update_s.dtype)], axis=0
        )
    else:
        update_s[...] = jnp.zeros_like(update_s)


def supports(cfg: STFTConfig, window) -> bool:
    return (
        cfg.onesided
        and cfg.n_fft % LANE == 0
        and (cfg.n_fft - 1) // cfg.hop_length >= 1
        and not jnp.iscomplexobj(window)
    )


def fused_rtisi_stream(
    target_pad_tm: jnp.ndarray,  # (B, T + 2*LA, F) magnitude, time-major
    window: jnp.ndarray,         # (n_fft,)
    aw1: jnp.ndarray,
    aw2: jnp.ndarray,
    lr: jnp.ndarray,
    synth_coeff: jnp.ndarray,
    cfg: STFTConfig,
    la: int,
    max_iter: int,
    asymmetric_window: bool,
    interpret: bool = False,
    precision=jax.lax.Precision.HIGH,
) -> jnp.ndarray:
    """Run the full RTISI-LA stream; returns committed frames (B, T+LA, n_fft)."""
    B, t2, F = target_pad_tm.shape
    n_fft, hop = cfg.n_fft, cfg.hop_length
    num_keep = (n_fft - 1) // hop
    steps = t2 - la  # T + la
    f_pad = -(-F // LANE) * LANE
    rows = la + 1
    x_len_raw = (num_keep + la) * hop + n_fft
    x_len = -(-x_len_raw // LANE) * LANE

    cos, sin, w = _dft_tables(n_fft, f_pad, cfg.normalized)
    tgt = jnp.pad(target_pad_tm.astype(jnp.float32), ((0, 0), (0, 0), (0, f_pad - F)))
    # Pre-expand the overlapping look-ahead windows (Mosaic cannot load at
    # dynamic sublane offsets): windows[b, s, r] = tgt[b, s + r].
    windows = jnp.stack(
        [tgt[:, r : r + steps, :] for r in range(rows)], axis=2
    )  # (B, steps, rows, f_pad)

    kernel = functools.partial(
        _kernel,
        n_fft=n_fft, hop=hop, num_keep=num_keep, la=la, max_iter=max_iter,
        asymmetric_window=asymmetric_window, precision=precision,
    )
    out = pl.pallas_call(
        kernel,
        grid=(B, steps),
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # lr
            pl.BlockSpec(memory_space=pltpu.SMEM),                 # synth_coeff
            pl.BlockSpec((1, 1, rows, f_pad), lambda b, s: (b, s, 0, 0)),  # target window
            pl.BlockSpec((n_fft, f_pad), lambda b, s: (0, 0)),     # cos
            pl.BlockSpec((n_fft, f_pad), lambda b, s: (0, 0)),     # sin
            pl.BlockSpec((1, f_pad), lambda b, s: (0, 0)),         # w
            pl.BlockSpec((1, n_fft), lambda b, s: (0, 0)),         # window
            pl.BlockSpec((1, n_fft), lambda b, s: (0, 0)),         # aw1
            pl.BlockSpec((1, n_fft), lambda b, s: (0, 0)),         # aw2
        ],
        out_specs=pl.BlockSpec((1, 1, 1, n_fft), lambda b, s: (b, s, 0, 0)),
        out_shape=jax.ShapeDtypeStruct((B, steps, 1, n_fft), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((num_keep, n_fft), jnp.float32),
            pltpu.VMEM((rows, n_fft), jnp.float32),
            pltpu.VMEM((rows, f_pad), jnp.float32),
            pltpu.VMEM((rows, f_pad), jnp.float32),
            pltpu.VMEM((1, x_len), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=B * steps * max_iter * 4 * rows * n_fft * f_pad * 2,
            bytes_accessed=4 * (B * t2 * f_pad + 2 * n_fft * f_pad + B * steps * n_fft),
            transcendentals=B * steps * max_iter * rows * f_pad,
        ),
        interpret=interpret,
    )(
        jnp.asarray(lr, jnp.float32).reshape(1, 1),
        jnp.asarray(synth_coeff, jnp.float32).reshape(1, 1),
        windows,
        jnp.asarray(cos),
        jnp.asarray(sin),
        jnp.asarray(w),
        jnp.asarray(window, jnp.float32).reshape(1, n_fft),
        jnp.asarray(aw1, jnp.float32).reshape(1, n_fft),
        jnp.asarray(aw2, jnp.float32).reshape(1, n_fft),
    )
    return out.reshape(B, steps, n_fft)
