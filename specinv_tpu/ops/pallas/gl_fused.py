"""Fused Griffin-Lim iteration as a single Pallas TPU kernel.

One kernel invocation = one full GL iteration per clip:

    framing (VMEM gather from the padded signal) -> analysis window ->
    forward DFT (two MXU matmuls against cos/sin blocks) -> momentum ->
    magnitude projection -> inverse DFT (transposed matmuls, Hermitian
    weights folded into the projected spectrum) -> synthesis window ->
    overlap-add accumulation into the output signal (VMEM read-modify-write)

Only the signal itself crosses HBM between iterations; the frames and the
complex spectrum — the big intermediates the XLA path materializes — never
leave VMEM.  The envelope divide + center re-pad between iterations stays in
XLA (two trivial VPU passes), as does the one-shot init.

Grid: ``(B, T_blocks, F_blocks)`` with the frequency dimension innermost.
Per (b, t): frames for the row block are built once (f == 0) into VMEM
scratch; each f step streams one 128-column block of the DFT matrices
(Pallas double-buffers these DMAs), accumulates the inverse-DFT partial sums
into a second scratch, and the final f step overlap-adds the finished rows
into the per-clip output block (which Pallas keeps resident in VMEM for the
whole (t, f) sweep of a clip).

The inverse matrices are never materialized: ``iDFT = (P ⊙ w) @ C^T - ...``
with ``w`` the Hermitian fold weights, so the same two matrices serve both
directions (halves matrix HBM traffic).

Constraints (fall back to the XLA path otherwise): ``n_fft % 128 == 0``,
``hop % 128 == 0``, real window, onesided.  Reverse-mode is provided by the
driver-level custom_vjp whose backward differentiates the XLA twin of this
kernel's math (models/_pallas_driver.gl_xla_twin).

Reference numerics preserved: momentum ``S - lr*pre`` (methods.py:243),
projection eps 1e-16 (246), pre-momentum magnitude as the metric output
(242).
"""
from __future__ import annotations

import functools
import math

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import STFTConfig

PROJ_EPS = 1e-16
LANE = 128


def _round_up(x: int, m: int) -> int:
    return ((x + m - 1) // m) * m


@functools.lru_cache(maxsize=8)
def _anti_identity(p: int):
    """Anti-diagonal permutation matrix: ``v @ J == reversed(v)``.

    Mosaic has no lowering for ``lax.rev``, so in-kernel reflection padding
    reverses its source slab with one tiny MXU matmul instead.
    """
    j = np.zeros((p, p), np.float32)
    j[np.arange(p), p - 1 - np.arange(p)] = 1.0
    return j


def _repad_in_kernel(x_out_ref, jrev_ref, pad_mode: str, p_amt: int, e: int):
    """Rewrite the center-pad regions of the normalized signal in VMEM.

    ``x_out_ref`` is (1, 1, Lx); pad regions arrive zeroed (inv_env mask).
    Mirrors models/_pallas_driver.repad_edges.
    """
    if not p_amt or pad_mode == "constant":
        return
    if pad_mode == "reflect":
        left_src = x_out_ref[0, :, p_amt + 1 : 2 * p_amt + 1]   # (1, P)
        right_src = x_out_ref[0, :, e - p_amt : e]
        jm = jrev_ref[...]
        # HIGHEST: a permutation matmul must not round the values to bf16.
        left = jnp.dot(
            left_src, jm, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
        right = jnp.dot(
            right_src, jm, preferred_element_type=jnp.float32,
            precision=jax.lax.Precision.HIGHEST,
        )
    elif pad_mode == "edge":
        left = jnp.broadcast_to(x_out_ref[0, :, p_amt : p_amt + 1], (1, p_amt))
        right = jnp.broadcast_to(x_out_ref[0, :, e : e + 1], (1, p_amt))
    else:  # wrap / circular
        left = x_out_ref[0, :, e - p_amt + 1 : e + 1]
        right = x_out_ref[0, :, p_amt : 2 * p_amt]
    x_out_ref[0, :, 0:p_amt] = left
    x_out_ref[0, :, e + 1 : e + 1 + p_amt] = right


def _split_bf16(x):
    """Split f32 into a (hi, lo) bf16 pair: x ~= hi + lo to ~16 mantissa bits."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    return hi, lo


# In-kernel dot schemes (Mosaic has no HIGH lowering, so multi-pass bf16 is
# emulated by hand).  Strings are accepted anywhere a lax.Precision is:
#   HIGH      — 3-pass bf16: ah@bh + ah@bl + al@bh (~16 mantissa bits both sides)
#   'bf16x2'  — 2-pass, keeps the DFT-matrix low bits: ah@bh + ah@bl
#   'bf16x2t' — 2-pass, keeps the data low bits:       ah@bh + al@bh
_SPLIT_SCHEMES = (jax.lax.Precision.HIGH, "bf16x2", "bf16x2t")


def needs_lo(scheme) -> bool:
    """Whether the scheme consumes the data operand's low bf16 half."""
    return scheme in (jax.lax.Precision.HIGH, "bf16x2t")


def _dot3_pre(a_hi, a_lo, b_f32, contract, scheme=jax.lax.Precision.HIGH):
    """Multi-pass bf16 dot with the data operand already split (cached hi/lo).

    ``a_lo`` may be None for schemes that don't consume it ('bf16x2').
    """
    d = functools.partial(
        jax.lax.dot_general,
        dimension_numbers=contract,
        preferred_element_type=jnp.float32,
    )
    if scheme == "bf16x2t":
        bh = b_f32.astype(jnp.bfloat16)
        return d(a_hi, bh) + d(a_lo, bh)
    bh, bl = _split_bf16(b_f32)
    if scheme == "bf16x2":
        return d(a_hi, bh) + d(a_hi, bl)
    return d(a_hi, bh) + d(a_hi, bl) + d(a_lo, bh)


def _dot3(a_f32, b_f32, contract, precision):
    """MXU dot at the requested effective precision/scheme.

    HIGHEST lowers natively (6-pass).  HIGH (3-pass bf16) measured 1.6x faster
    than HIGHEST at GL-indistinguishable quality; the 2-pass schemes shave
    another third off the MXU time (see benchmarks.md for the quality study).
    """
    if precision in _SPLIT_SCHEMES:
        ah, al = _split_bf16(a_f32) if needs_lo(precision) else (
            a_f32.astype(jnp.bfloat16), None,
        )
        return _dot3_pre(ah, al, b_f32, contract, precision)
    return jax.lax.dot_general(
        a_f32, b_f32, contract,
        preferred_element_type=jnp.float32, precision=precision,
    )


def split_schemes(precision):
    """Normalize a precision spec to ``(fwd, inv)`` per-direction schemes."""
    if isinstance(precision, tuple):
        fwd, inv = precision
    else:
        fwd = inv = precision
    return fwd, inv


@functools.lru_cache(maxsize=16)
def _dft_tables(n_fft: int, f_pad: int, normalized: bool):
    """cos/sin matrices (n_fft, f_pad) and Hermitian inverse weights (1, f_pad).

    Columns beyond F = n_fft//2 + 1 are zero (padding lanes contribute
    nothing in either direction).
    """
    num_freqs = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(f_pad)[None, :]
    theta = 2.0 * np.pi * n * k / n_fft
    fscale = 1.0 / math.sqrt(n_fft) if normalized else 1.0
    cos = np.cos(theta) * fscale
    sin = np.sin(theta) * fscale
    cos[:, num_freqs:] = 0.0
    sin[:, num_freqs:] = 0.0
    w = np.full((1, f_pad), 2.0)
    w[0, 0] = 1.0
    w[0, num_freqs - 1] = 1.0
    w[0, num_freqs:] = 0.0
    iscale = 1.0 / math.sqrt(n_fft) if normalized else 1.0 / n_fft
    # forward already carries fscale; inverse needs w*iscale / fscale on top.
    w = w * (iscale / fscale)
    return cos.astype(np.float32), sin.astype(np.float32), w.astype(np.float32)


def _kernel(
    lr_ref,        # SMEM (1, 1)
    x_ref,         # (1, 1, Lx) padded signal for this clip
    tgt_ref,       # (1, BT, LANE) target magnitude block
    pre_re_ref,    # (1, BT, LANE)
    pre_im_ref,    # (1, BT, LANE)
    cos_ref,       # (n_fft, LANE)
    sin_ref,       # (n_fft, LANE)
    w_ref,         # (1, LANE) hermitian fold weights
    win_ref,       # (1, n_fft)
    inv_env_ref,   # (1, 1, Lx) interior_mask / envelope (zero outside interior)
    jrev_ref,      # (P, P) anti-identity (reflect repad) or (8, 128) dummy
    x_out_ref,     # (1, 1, Lx)
    mag_ref,       # (1, BT, LANE) pre-momentum magnitude out
    npre_re_ref,   # (1, BT, LANE)
    npre_im_ref,   # (1, BT, LANE)
    frames_s,      # VMEM scratch (BT, n_fft)
    acc_s,         # VMEM scratch (BT, n_fft)
    fhi_s,         # VMEM scratch (BT, n_fft) bf16 — cached hi split of frames
    flo_s,         # VMEM scratch (BT, n_fft) bf16 — cached lo split
    *,
    block_t: int,
    n_fft: int,
    hop: int,
    pad_mode: str,
    p_amt: int,
    e: int,
    fwd_p,
    inv_p,
):
    t = pl.program_id(1)
    f = pl.program_id(2)
    n_t = pl.num_programs(1)
    n_f = pl.num_programs(2)
    window = win_ref[0, :]

    @pl.when(jnp.logical_and(t == 0, f == 0))
    def _zero_out():
        x_out_ref[...] = jnp.zeros_like(x_out_ref)

    @pl.when(f == 0)
    def _build_frames():
        if n_fft % hop == 0:
            # Strided-reshape framing: chunk j of every frame row is a
            # contiguous run of the signal — k block copies instead of a
            # block_t-step row loop (Mosaic handles the 1D<->2D reshape).
            for j in range(n_fft // hop):
                seg = x_ref[
                    0, 0, pl.ds((t * block_t + j) * hop, block_t * hop)
                ].reshape(block_t, hop)
                frames_s[:, j * hop : (j + 1) * hop] = (
                    seg * window[j * hop : (j + 1) * hop]
                )
        else:
            def body(tl, _):
                start = (t * block_t + tl) * hop
                frames_s[tl, :] = x_ref[0, 0, pl.ds(start, n_fft)] * window
                return 0

            jax.lax.fori_loop(0, block_t, body, 0)
        acc_s[...] = jnp.zeros_like(acc_s)
        if fwd_p in _SPLIT_SCHEMES:
            # Split the frame block once; every f step reuses the cached
            # bf16 hi/lo pair instead of re-decomposing 3.7 MB of operand.
            fr = frames_s[...]
            hi = fr.astype(jnp.bfloat16)
            fhi_s[...] = hi
            if needs_lo(fwd_p):
                flo_s[...] = (fr - hi.astype(jnp.float32)).astype(jnp.bfloat16)

    frames = frames_s[...]
    # Single-pass bf16 visibly stalls Griffin-Lim convergence (-17 dB vs
    # -28 dB @ 100 it); HIGH (emulated bf16x3) matches HIGHEST to ~2e-4 dB.
    fwd_contract = (((1,), (0,)), ((), ()))
    if fwd_p in _SPLIT_SCHEMES:
        flo = flo_s[...] if needs_lo(fwd_p) else None
        s_re = _dot3_pre(fhi_s[...], flo, cos_ref[...], fwd_contract, fwd_p)
        s_im = -_dot3_pre(fhi_s[...], flo, sin_ref[...], fwd_contract, fwd_p)
    else:
        s_re = _dot3(frames, cos_ref[...], fwd_contract, fwd_p)
        s_im = -_dot3(frames, sin_ref[...], fwd_contract, fwd_p)

    mag_ref[0] = jnp.sqrt(s_re * s_re + s_im * s_im)  # pre-momentum |S|

    lr = lr_ref[0, 0]
    s_re = s_re - lr * pre_re_ref[0]
    s_im = s_im - lr * pre_im_ref[0]
    npre_re_ref[0] = s_re
    npre_im_ref[0] = s_im

    norm = jnp.sqrt(s_re * s_re + s_im * s_im) + PROJ_EPS
    gain = tgt_ref[0] / norm * w_ref[0, :]
    p_re = s_re * gain
    p_im = s_im * gain

    # Inverse DFT partial sum via the transposed forward matrices:
    # frames += P_re @ C^T - P_im @ (-S)^T  (sin sign folded: iDFT real part)
    contract = (((1,), (1,)), ((), ()))
    acc_s[...] += _dot3(p_re, cos_ref[...], contract, inv_p) - _dot3(
        p_im, sin_ref[...], contract, inv_p
    )

    @pl.when(f == n_f - 1)
    def _ola():
        if n_fft % hop == 0:
            # Mirror of the strided-reshape framing; the k column-chunk adds
            # overlap each other across j, so they stay sequential.
            for j in range(n_fft // hop):
                start = (t * block_t + j) * hop
                cur = x_out_ref[0, 0, pl.ds(start, block_t * hop)].reshape(
                    block_t, hop
                )
                add = acc_s[:, j * hop : (j + 1) * hop] * window[
                    j * hop : (j + 1) * hop
                ]
                x_out_ref[0, 0, pl.ds(start, block_t * hop)] = (
                    cur + add
                ).reshape(block_t * hop)
        else:
            def body(tl, _):
                start = (t * block_t + tl) * hop
                x_out_ref[0, 0, pl.ds(start, n_fft)] += acc_s[tl, :] * window
                return 0

            jax.lax.fori_loop(0, block_t, body, 0)

    # Epilogue: fused envelope divide + interior mask over the whole clip
    # (inv_env is interior_mask/env — zero outside the interior, so the
    # center-pad regions come out zero and only the small edge re-pad remains
    # for XLA between iterations).
    @pl.when(jnp.logical_and(t == n_t - 1, f == n_f - 1))
    def _normalize():
        x_out_ref[...] = x_out_ref[...] * inv_env_ref[...]
        _repad_in_kernel(x_out_ref, jrev_ref, pad_mode, p_amt, e)


def supports(cfg: STFTConfig, window) -> bool:
    return (
        cfg.onesided
        and cfg.n_fft % LANE == 0
        and cfg.hop_length % LANE == 0
        and not jnp.iscomplexobj(window)
    )


def fused_gl_iteration(
    x_pad: jnp.ndarray,      # (B, Lx) float32, padded coords
    pre_re: jnp.ndarray,     # (B, T_pad, F_pad)
    pre_im: jnp.ndarray,     # (B, T_pad, F_pad)
    target: jnp.ndarray,     # (B, T_pad, F_pad)
    window: jnp.ndarray,     # (n_fft,)
    inv_env: jnp.ndarray,    # (Lx,) interior_mask / envelope
    lr: jnp.ndarray,         # scalar
    cfg: STFTConfig,
    e: int,                  # last real sample index, padded coords
    block_t: int = 64,
    interpret: bool = False,
    precision=jax.lax.Precision.HIGH,
):
    """One fused Griffin-Lim iteration.

    Returns ``(x_pad, mag, new_pre_re, new_pre_im)`` where ``x_pad`` is the
    envelope-normalized signal in padded coordinates with the center padding
    already re-applied in-kernel (reflection via an anti-identity MXU matmul —
    Mosaic has no lax.rev) and ``mag`` is the pre-momentum magnitude.
    """
    B, t_pad, f_pad = target.shape
    n_fft, hop = cfg.n_fft, cfg.hop_length
    assert t_pad % block_t == 0 and f_pad % LANE == 0
    lx = x_pad.shape[-1]
    assert lx == (t_pad - 1) * hop + n_fft, (lx, t_pad, hop, n_fft)

    cos, sin, w = _dft_tables(n_fft, f_pad, cfg.normalized)
    n_t = t_pad // block_t
    n_f = f_pad // LANE
    p_amt = cfg.pad_amount
    pad_mode = cfg.jnp_pad_mode
    if p_amt and pad_mode == "reflect":
        jrev = _anti_identity(p_amt)
    else:
        jrev = np.zeros((8, LANE), np.float32)  # unused dummy

    fwd_p, inv_p = split_schemes(precision)
    kernel = functools.partial(
        _kernel, block_t=block_t, n_fft=n_fft, hop=hop,
        pad_mode=pad_mode, p_amt=p_amt, e=e, fwd_p=fwd_p, inv_p=inv_p,
    )
    grid = (B, n_t, n_f)

    flops = 4 * B * t_pad * n_fft * f_pad * 2
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                      # lr
            pl.BlockSpec((1, 1, lx), lambda b, t, f: (b, 0, 0)),        # x
            pl.BlockSpec((1, block_t, LANE), lambda b, t, f: (b, t, f)),  # target
            pl.BlockSpec((1, block_t, LANE), lambda b, t, f: (b, t, f)),  # pre_re
            pl.BlockSpec((1, block_t, LANE), lambda b, t, f: (b, t, f)),  # pre_im
            pl.BlockSpec((n_fft, LANE), lambda b, t, f: (0, f)),        # cos
            pl.BlockSpec((n_fft, LANE), lambda b, t, f: (0, f)),        # sin
            pl.BlockSpec((1, LANE), lambda b, t, f: (0, f)),            # w
            pl.BlockSpec((1, n_fft), lambda b, t, f: (0, 0)),           # window
            pl.BlockSpec((1, 1, lx), lambda b, t, f: (0, 0, 0)),        # inv_env
            pl.BlockSpec(jrev.shape, lambda b, t, f: (0, 0)),           # jrev
        ],
        out_specs=[
            pl.BlockSpec((1, 1, lx), lambda b, t, f: (b, 0, 0)),        # x_out
            pl.BlockSpec((1, block_t, LANE), lambda b, t, f: (b, t, f)),  # mag
            pl.BlockSpec((1, block_t, LANE), lambda b, t, f: (b, t, f)),  # npre_re
            pl.BlockSpec((1, block_t, LANE), lambda b, t, f: (b, t, f)),  # npre_im
        ],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, lx), jnp.float32),
            jax.ShapeDtypeStruct((B, t_pad, f_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, t_pad, f_pad), jnp.float32),
            jax.ShapeDtypeStruct((B, t_pad, f_pad), jnp.float32),
        ],
        scratch_shapes=[
            pltpu.VMEM((block_t, n_fft), jnp.float32),
            pltpu.VMEM((block_t, n_fft), jnp.float32),
            pltpu.VMEM((block_t, n_fft), jnp.bfloat16),
            pltpu.VMEM((block_t, n_fft), jnp.bfloat16),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (2 * B * lx + 5 * B * t_pad * f_pad + 2 * n_fft * f_pad),
            transcendentals=2 * B * t_pad * f_pad,
        ),
        interpret=interpret,
    )(
        jnp.asarray(lr, jnp.float32).reshape(1, 1),
        x_pad.astype(jnp.float32).reshape(B, 1, lx),
        target.astype(jnp.float32),
        pre_re.astype(jnp.float32),
        pre_im.astype(jnp.float32),
        jnp.asarray(cos),
        jnp.asarray(sin),
        jnp.asarray(w),
        jnp.asarray(window, jnp.float32).reshape(1, n_fft),
        jnp.asarray(inv_env, jnp.float32).reshape(1, 1, lx),
        jnp.asarray(jrev),
    )
    x_raw, mag, npre_re, npre_im = out
    return x_raw.reshape(B, lx), mag, npre_re, npre_im
