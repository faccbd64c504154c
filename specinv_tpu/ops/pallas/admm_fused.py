"""Fused ADMM phase-retrieval iteration as a single Pallas TPU kernel.

Same plumbing as :mod:`specinv_tpu.ops.pallas.gl_fused` (VMEM framing ->
forward DFT on the MXU -> elementwise middle -> inverse DFT via transposed
matrices -> OLA accumulation -> envelope epilogue), with the Griffin-Lim
momentum/projection middle replaced by the reference's ADMM update chain
(/root/reference/torch_specinv/methods.py:464-477):

    R = stft(x);  Z = (rho*Y + R)/(1+rho);  U += X - Z
    X = proj_mag(Z - U);  Y = X + U;  x = istft(Y)

carried in its Douglas-Rachford one-variable reduction: since ``Y = X + U``
by construction, ``U' = U + X - Z = Y - Z`` and only ``Y`` needs to persist
(bitwise identical to the full chain — ``fl(U+X) = fl(X+U)`` is the stored
``Y`` plane and every surviving op keeps its order; see admm_fused4).  One
complex state plane rides through HBM between iterations; frames and the
spectrum stay in VMEM.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...config import STFTConfig
from .gl_fused import (
    LANE,
    PROJ_EPS,
    _anti_identity,
    _dft_tables,
    _dot3,
    _repad_in_kernel,
)

HI = jax.lax.Precision.HIGHEST


def _kernel(
    rho_ref,       # SMEM (1, 1)
    x_ref,         # (1, 1, Lx)
    tgt_ref,       # (1, BT, LANE)
    y_sre_ref, y_sim_ref,   # Y state (1, BT, LANE) — the only spectral state
    cos_ref, sin_ref,       # (n_fft, LANE)
    w_ref,                  # (1, LANE)
    win_ref,                # (1, n_fft)
    inv_env_ref,            # (1, 1, Lx)
    jrev_ref,               # (P, P) anti-identity or dummy
    x_out_ref,              # (1, 1, Lx)
    mag_ref,                # (1, BT, LANE)
    ny_re_ref, ny_im_ref,
    frames_s,               # VMEM (BT, n_fft)
    acc_s,                  # VMEM (BT, n_fft)
    *,
    block_t: int,
    n_fft: int,
    hop: int,
    valid_t: int,
    pad_mode: str,
    p_amt: int,
    e: int,
    precision,
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
            # Strided-reshape framing (see gl_fused._build_frames).
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

    frames = frames_s[...]
    fwd_contract = (((1,), (0,)), ((), ()))
    r_re = _dot3(frames, cos_ref[...], fwd_contract, precision)
    r_im = -_dot3(frames, sin_ref[...], fwd_contract, precision)

    mag_ref[0] = jnp.sqrt(r_re * r_re + r_im * r_im)  # |R| pre-update (464-465)

    rho = rho_ref[0, 0]
    onep = 1.0 + rho  # true division, matching the XLA path bit-for-bit
    z_re = (rho * y_sre_ref[0] + r_re) / onep
    z_im = (rho * y_sim_ref[0] + r_im) / onep
    u_re = y_sre_ref[0] - z_re
    u_im = y_sim_ref[0] - z_im

    t_re = z_re - u_re
    t_im = z_im - u_im
    norm = jnp.sqrt(t_re * t_re + t_im * t_im) + PROJ_EPS
    gain = tgt_ref[0] / norm

    ynew_re = t_re * gain + u_re
    ynew_im = t_im * gain + u_im

    # Zero-padded frame rows (row >= T) must stay inert: unlike Griffin-Lim,
    # where projection onto a zero target kills them, ADMM's dual update gives
    # them Y = -R/(1+rho) != 0, which would overlap-add garbage into the real
    # signal.  Mask both the state and the synthesis operand.
    row = t * block_t + jax.lax.broadcasted_iota(jnp.int32, (block_t, LANE), 0)
    valid = row < valid_t
    ynew_re = jnp.where(valid, ynew_re, 0.0)
    ynew_im = jnp.where(valid, ynew_im, 0.0)

    ny_re_ref[0] = ynew_re
    ny_im_ref[0] = ynew_im

    wv = w_ref[0, :]
    contract = (((1,), (1,)), ((), ()))
    acc_s[...] += _dot3(ynew_re * wv, cos_ref[...], contract, precision) - _dot3(
        ynew_im * wv, sin_ref[...], contract, precision
    )

    @pl.when(f == n_f - 1)
    def _ola():
        if n_fft % hop == 0:
            # Strided-reshape overlap-add (see gl_fused._ola).
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

    @pl.when(jnp.logical_and(t == n_t - 1, f == n_f - 1))
    def _normalize():
        x_out_ref[...] = x_out_ref[...] * inv_env_ref[...]
        _repad_in_kernel(x_out_ref, jrev_ref, pad_mode, p_amt, e)


def fused_admm_iteration(
    x_pad: jnp.ndarray,          # (B, Lx)
    Y_re, Y_im,                  # (B, T_pad, F_pad) each — DR state
    target: jnp.ndarray,         # (B, T_pad, F_pad)
    window: jnp.ndarray,
    inv_env: jnp.ndarray,        # (Lx,)
    rho: jnp.ndarray,
    cfg: STFTConfig,
    valid_t: int,
    e: int,
    block_t: int = 64,
    interpret: bool = False,
    precision=jax.lax.Precision.HIGH,
):
    """One fused ADMM iteration -> (x_div, mag, Y_re, Y_im).

    ``valid_t`` is the true frame count T; rows beyond it are zero padding.
    """
    B, t_pad, f_pad = target.shape
    n_fft, hop = cfg.n_fft, cfg.hop_length
    assert t_pad % block_t == 0 and f_pad % LANE == 0
    lx = x_pad.shape[-1]
    assert lx == (t_pad - 1) * hop + n_fft

    cos, sin, w = _dft_tables(n_fft, f_pad, cfg.normalized)
    p_amt = cfg.pad_amount
    pad_mode = cfg.jnp_pad_mode
    if p_amt and pad_mode == "reflect":
        jrev = _anti_identity(p_amt)
    else:
        import numpy as _np

        jrev = _np.zeros((8, LANE), _np.float32)
    grid = (B, t_pad // block_t, f_pad // LANE)
    blk = pl.BlockSpec((1, block_t, LANE), lambda b, t, f: (b, t, f))
    sig = pl.BlockSpec((1, 1, lx), lambda b, t, f: (b, 0, 0))
    const_sig = pl.BlockSpec((1, 1, lx), lambda b, t, f: (0, 0, 0))
    mat = pl.BlockSpec((n_fft, LANE), lambda b, t, f: (0, f))

    kernel = functools.partial(
        _kernel, block_t=block_t, n_fft=n_fft, hop=hop, valid_t=valid_t,
        pad_mode=pad_mode, p_amt=p_amt, e=e, precision=precision,
    )
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),                # rho
            sig,                                                  # x
            blk,                                                  # target
            blk, blk,                                             # Y re+im
            mat, mat,                                             # cos, sin
            pl.BlockSpec((1, LANE), lambda b, t, f: (0, f)),      # w
            pl.BlockSpec((1, n_fft), lambda b, t, f: (0, 0)),     # window
            const_sig,                                            # inv_env
            pl.BlockSpec(jrev.shape, lambda b, t, f: (0, 0)),     # jrev
        ],
        out_specs=[sig, blk, blk, blk],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, lx), jnp.float32),
            *[jax.ShapeDtypeStruct((B, t_pad, f_pad), jnp.float32)] * 3,
        ],
        scratch_shapes=[
            pltpu.VMEM((block_t, n_fft), jnp.float32),
            pltpu.VMEM((block_t, n_fft), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=4 * B * t_pad * n_fft * f_pad * 2,
            bytes_accessed=4 * (2 * B * lx + 7 * B * t_pad * f_pad + 2 * n_fft * f_pad),
            transcendentals=2 * B * t_pad * f_pad,
        ),
        interpret=interpret,
    )(
        jnp.asarray(rho, jnp.float32).reshape(1, 1),
        x_pad.astype(jnp.float32).reshape(B, 1, lx),
        target.astype(jnp.float32),
        Y_re.astype(jnp.float32), Y_im.astype(jnp.float32),
        jnp.asarray(cos),
        jnp.asarray(sin),
        jnp.asarray(w),
        jnp.asarray(window, jnp.float32).reshape(1, n_fft),
        jnp.asarray(inv_env, jnp.float32).reshape(1, 1, lx),
        jnp.asarray(jrev),
    )
    x_raw = out[0].reshape(B, lx)
    return (x_raw,) + tuple(out[1:])
