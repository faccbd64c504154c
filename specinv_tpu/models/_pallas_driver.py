"""Shared geometry + glue for the fused Pallas iteration drivers.

Both fused kernels (Griffin-Lim, ADMM) iterate a signal held in *padded
coordinates*: the center padding lives inside the buffer, the kernel epilogue
applies ``interior_mask / envelope``, and the only per-iteration XLA work is
re-writing the two ``pad_amount``-sample edge regions according to the pad
mode (the same thing ``torch.stft``'s centering does implicitly every
analysis call).
"""
from __future__ import annotations

from typing import NamedTuple

import jax.numpy as jnp

from ..config import STFTConfig
from ..ops.framing import ola_envelope


class PaddedGeometry(NamedTuple):
    f_pad: int
    t_pad: int
    block_t: int
    lx: int
    lp: int
    l_out: int
    p_amt: int
    e: int  # last real sample index, padded coords


def make_geometry(cfg: STFTConfig, T: int, F: int) -> PaddedGeometry:
    n_fft, hop = cfg.n_fft, cfg.hop_length
    p_amt = cfg.pad_amount
    f_pad = -(-F // 128) * 128
    # One row block per clip when the two (block_t, n_fft) scratches fit the
    # VMEM budget — DFT matrix blocks then stream from HBM once per iteration.
    budget_rows = max(64, (8 * 1024 * 1024) // (2 * 4 * n_fft) // 64 * 64)
    block_t = min(budget_rows, -(-T // 64) * 64)
    t_pad = -(-T // block_t) * block_t
    lx = (t_pad - 1) * hop + n_fft
    lp = (T - 1) * hop + n_fft
    l_out = lp - 2 * p_amt
    return PaddedGeometry(
        f_pad=f_pad, t_pad=t_pad, block_t=block_t, lx=lx, lp=lp,
        l_out=l_out, p_amt=p_amt, e=p_amt + l_out - 1,
    )


def auto_block_t(T: int, n_fft: int) -> int:
    """Time-block size for the four-step kernels when the caller doesn't pin
    one.  Padded rows (t_pad = ceil(T/bt)*bt) are full-price compute, and
    since ceil(T/bt)*bt is non-decreasing over the nested sizes 64/128/256,
    the only live choice is 32 vs 64: take 32 when its padding saving
    outweighs the per-row penalty bt=32 carries at n_fft >= 1024 (~10-15%
    measured; none at n_fft <= 512) — interleaved A/B sweep in
    scripts/exp_blockt.py, table in benchmarks.md."""
    tp32 = -(-T // 32) * 32
    tp64 = -(-T // 64) * 64
    threshold = 1.0 if n_fft <= 512 else 0.88
    return 32 if tp32 < threshold * tp64 else 64


def resolve_block_t(T: int, n_fft: int, block_t: int | None) -> int:
    """Shared block-size resolution for every four-step-kernel caller:
    auto-select when unpinned, then clamp to the clip's row count."""
    if block_t is None:
        block_t = auto_block_t(T, n_fft)
    return min(block_t, -(-T // 64) * 64)


def make_geometry4(
    cfg: STFTConfig, T: int, block_t: int | None = 128
) -> PaddedGeometry:
    """Geometry for the four-step kernels: no frequency padding (the full
    permuted spectrum is (n_fft//128, 128)); time blocked at ``block_t``
    (``None`` -> :func:`auto_block_t`)."""
    n_fft, hop = cfg.n_fft, cfg.hop_length
    p_amt = cfg.pad_amount
    block_t = resolve_block_t(T, n_fft, block_t)
    t_pad = -(-T // block_t) * block_t
    lx = (t_pad - 1) * hop + n_fft
    lp = (T - 1) * hop + n_fft
    l_out = lp - 2 * p_amt
    return PaddedGeometry(
        f_pad=n_fft, t_pad=t_pad, block_t=block_t, lx=lx, lp=lp,
        l_out=l_out, p_amt=p_amt, e=p_amt + l_out - 1,
    )


def make_inv_env(cfg: STFTConfig, window: jnp.ndarray, T: int, geo: PaddedGeometry):
    """``interior_mask / window^2-envelope`` multiplier, length ``lx``."""
    env = ola_envelope(window * window, T, cfg.hop_length)
    env = jnp.pad(env, (0, geo.lx - geo.lp))
    env_safe = jnp.where(env == 0, jnp.ones_like(env), env)
    interior = jnp.zeros((geo.lx,), dtype=bool).at[
        geo.p_amt : geo.p_amt + geo.l_out
    ].set(True)
    return jnp.where(interior, 1.0 / env_safe, 0.0).astype(jnp.float32)


def repad_edges(x_div: jnp.ndarray, cfg: STFTConfig, geo: PaddedGeometry):
    """Re-apply center padding in place (pad regions arrive zeroed)."""
    p_amt, e = geo.p_amt, geo.e
    if not p_amt:
        return x_div
    mode = cfg.jnp_pad_mode
    if mode == "constant":
        return x_div
    if mode == "reflect":
        left = x_div[..., 2 * p_amt : p_amt : -1]
        right = x_div[..., e - p_amt : e][..., ::-1]
    elif mode == "edge":
        left = jnp.broadcast_to(
            x_div[..., p_amt : p_amt + 1], (*x_div.shape[:-1], p_amt)
        )
        right = jnp.broadcast_to(x_div[..., e : e + 1], (*x_div.shape[:-1], p_amt))
    else:  # wrap / circular
        left = x_div[..., e - p_amt + 1 : e + 1]
        right = x_div[..., p_amt : 2 * p_amt]
    return (
        x_div.at[..., :p_amt].set(left).at[..., e + 1 : e + 1 + p_amt].set(right)
    )


def pad_tf(a: jnp.ndarray, geo: PaddedGeometry, T: int, F: int) -> jnp.ndarray:
    """Zero-pad a (B, T, F) plane to (B, t_pad, f_pad) float32."""
    return jnp.pad(
        a.astype(jnp.float32), ((0, 0), (0, geo.t_pad - T), (0, geo.f_pad - F))
    )


def gl_xla_twin(
    state, target_pad, window, inv_env, lr, cfg: STFTConfig, geo: PaddedGeometry,
    precision=None,
):
    """XLA re-statement of the fused GL kernel's math, same padded-coords IO.

    Used as the backward rule for the Pallas forward (custom_vjp): reverse-
    differentiating this twin yields correct gradients for the kernel without
    a hand-written backward kernel.  Matches the kernel op-for-op (same
    f_pad-zeroed DFT tables, Hermitian fold weights, envelope multiplier,
    edge re-pad).
    """
    import jax

    from ..ops.framing import frame, overlap_add
    from ..ops.pallas.gl_fused import PROJ_EPS, _dft_tables

    x_pad, pre_re, pre_im = state
    n_fft, hop = cfg.n_fft, cfg.hop_length
    cos, sin, w = _dft_tables(n_fft, geo.f_pad, cfg.normalized)
    hi = precision or jax.lax.Precision.HIGHEST

    frames = frame(x_pad, n_fft, hop) * window            # (B, t_pad, n_fft)
    s_re = jnp.matmul(frames, cos, precision=hi)
    s_im = -jnp.matmul(frames, sin, precision=hi)
    # +tiny inside the sqrt: the zero-padded planes are exactly 0 and
    # sqrt'(0)=inf would NaN the whole backward (only gradients flow through
    # this twin; the forward comes from the kernel).
    mag = jnp.sqrt(s_re * s_re + s_im * s_im + 1e-30)
    s_re = s_re - lr * pre_re
    s_im = s_im - lr * pre_im
    norm = jnp.sqrt(s_re * s_re + s_im * s_im + 1e-30) + PROJ_EPS
    gain = target_pad / norm * w
    contract = (((2,), (1,)), ((), ()))
    fr = jax.lax.dot_general(
        s_re * gain, cos, contract, precision=hi
    ) - jax.lax.dot_general(s_im * gain, sin, contract, precision=hi)
    y = overlap_add(fr * window, hop) * inv_env
    y = repad_edges(y, cfg, geo)
    return (y, s_re, s_im), mag


def gl_xla_twin4(
    state, target_p, window, inv_env, lr, cfg: STFTConfig, geo: PaddedGeometry,
    precision=None,
):
    """XLA re-statement of the four-step fused GL kernel's math (permuted
    full-spectrum state) — the backward rule for its custom_vjp."""
    import jax

    from ..ops.framing import frame, overlap_add
    from ..ops.pallas import fft4
    from ..ops.pallas.gl_fused import PROJ_EPS

    x_pad, pre_re, pre_im = state
    n_fft, hop = cfg.n_fft, cfg.hop_length
    m = n_fft // 128
    hi = precision or jax.lax.Precision.HIGHEST
    t = fft4.tables_as_jnp(cfg.n_fft, cfg.normalized)

    frames = frame(x_pad, n_fft, hop) * window        # (B, t_pad, n_fft)
    B, tp, _ = frames.shape
    s_re, s_im = fft4.fwd4(frames.reshape(B * tp, n_fft), t, hi)
    s_re = s_re.reshape(B, tp, m, 128)
    s_im = s_im.reshape(B, tp, m, 128)
    mag = jnp.sqrt(s_re * s_re + s_im * s_im + 1e-30)
    s_re = s_re - lr * pre_re
    s_im = s_im - lr * pre_im
    norm = jnp.sqrt(s_re * s_re + s_im * s_im + 1e-30) + PROJ_EPS
    gain = target_p / norm
    fr = fft4.inv4_real(
        (s_re * gain).reshape(B * tp, m, 128),
        (s_im * gain).reshape(B * tp, m, 128),
        t, hi,
    ).reshape(B, tp, n_fft)
    y = overlap_add(fr * window, hop) * inv_env
    y = repad_edges(y, cfg, geo)
    return (y, s_re, s_im), mag


def admm_xla_twin4(
    state, target_p, window, inv_env, rho, cfg: STFTConfig, geo: PaddedGeometry,
    valid_t: int,
    precision=None,
):
    """XLA twin of the four-step fused ADMM kernels (full-spectrum permuted
    state) — backward rule for their custom_vjps."""
    import jax

    from ..ops.framing import frame, overlap_add
    from ..ops.pallas import fft4
    from ..ops.pallas.gl_fused import PROJ_EPS

    x_pad, Yr, Yi = state
    n_fft, hop = cfg.n_fft, cfg.hop_length
    m = n_fft // 128
    hi = precision or jax.lax.Precision.HIGHEST
    t = fft4.tables_as_jnp(cfg.n_fft, cfg.normalized)

    frames = frame(x_pad, n_fft, hop) * window
    B, tp, _ = frames.shape
    r_re, r_im = fft4.fwd4(frames.reshape(B * tp, n_fft), t, hi)
    r_re = r_re.reshape(B, tp, m, 128)
    r_im = r_im.reshape(B, tp, m, 128)
    mag = jnp.sqrt(r_re * r_re + r_im * r_im + 1e-30)
    onep = 1.0 + rho  # true division, matching the XLA path bit-for-bit
    z_re = (rho * Yr + r_re) / onep
    z_im = (rho * Yi + r_im) / onep
    u_re = Yr - z_re
    u_im = Yi - z_im
    t_re = z_re - u_re
    t_im = z_im - u_im
    norm = jnp.sqrt(t_re * t_re + t_im * t_im + 1e-30) + PROJ_EPS
    gain = target_p / norm
    yn_re = t_re * gain + u_re
    yn_im = t_im * gain + u_im
    valid = (jnp.arange(tp) < valid_t)[None, :, None, None]
    yn_re, yn_im = jnp.where(valid, yn_re, 0.0), jnp.where(valid, yn_im, 0.0)
    fr = fft4.inv4_real(
        yn_re.reshape(B * tp, m, 128), yn_im.reshape(B * tp, m, 128), t, hi
    ).reshape(B, tp, n_fft)
    y = overlap_add(fr * window, hop) * inv_env
    y = repad_edges(y, cfg, geo)
    return (y, yn_re, yn_im), mag


def rtisi_xla_twin4(
    x_keep, upd0, pre_re, pre_im, target_p, window, aw_first, aw_rest,
    synth_win, lr, cfg: STFTConfig, max_iter: int, asym: bool,
    precision=None,
):
    """XLA re-statement of the fused RTISI refine kernel
    (:func:`..ops.pallas.rtisi_fused4.refine_run4`) — the backward rule for
    its custom_vjp.  Same frame-major/permuted layouts; the kernel's
    in-place slab OLA and per-segment windowing become a dense
    ``overlap_add``/``frame`` pair (value-identical: both are plain sums)."""
    import jax

    from ..ops.framing import frame, overlap_add
    from ..ops.pallas import fft4
    from ..ops.pallas.gl_fused import PROJ_EPS

    n_fft, hop = cfg.n_fft, cfg.hop_length
    R = upd0.shape[0]
    B = x_keep.shape[0]
    n_frames = R // B
    m = n_fft // 128
    hi = precision or jax.lax.Precision.HIGHEST
    t = fft4.tables_as_jnp(n_fft, cfg.normalized)

    def refine(carry, is_first):
        upd, p_re, p_im = carry
        upd_bm = jnp.swapaxes(upd.reshape(n_frames, B, n_fft), 0, 1)
        xs = x_keep + overlap_add(upd_bm * synth_win, hop)    # (B, L)
        fr = frame(xs, n_fft, hop)                            # (B, nf, n_fft)
        if asym:
            w_last = jnp.where(is_first, aw_first, aw_rest)
        else:
            w_last = window
        wins = jnp.concatenate(
            [jnp.broadcast_to(window, (n_frames - 1, n_fft)), w_last[None]],
            axis=0,
        )
        fm = jnp.swapaxes(fr * wins, 0, 1).reshape(R, n_fft)  # frame-major
        s_re, s_im = fft4.fwd4(fm, t, hi)                     # (R, m, 128)
        # First refinement: rows take the NEXT frame's momentum (B-row block
        # shift), newest frame un-damped — methods.py:387-392.
        zeros_b = jnp.zeros((B, m, 128), p_re.dtype)
        sh_re = jnp.concatenate([p_re[B:], zeros_b], axis=0)
        sh_im = jnp.concatenate([p_im[B:], zeros_b], axis=0)
        s_re = s_re - lr * jnp.where(is_first, sh_re, p_re)
        s_im = s_im - lr * jnp.where(is_first, sh_im, p_im)
        # +1e-30 inside the sqrt: backward-pass NaN guard only (the forward
        # comes from the kernel, which matches the scan path's plain sqrt).
        norm = jnp.sqrt(s_re * s_re + s_im * s_im + 1e-30) + PROJ_EPS
        gain = target_p / norm
        new_upd = fft4.inv4_real(s_re * gain, s_im * gain, t, hi)
        return (new_upd, s_re, s_im), None

    carry, _ = refine((upd0, pre_re, pre_im), jnp.bool_(True))
    if max_iter > 1:
        carry, _ = jax.lax.scan(
            lambda c, _: refine(c, jnp.bool_(False)), carry, None,
            length=max_iter - 1,
        )
    return carry


def admm_xla_twin(
    state, target_pad, window, inv_env, rho, cfg: STFTConfig, geo: PaddedGeometry,
    valid_t: int,
    precision=None,
):
    """XLA twin of the fused ADMM kernel (see gl_xla_twin)."""
    import jax

    from ..ops.framing import frame, overlap_add
    from ..ops.pallas.gl_fused import PROJ_EPS, _dft_tables

    x_pad, Yr, Yi = state
    n_fft, hop = cfg.n_fft, cfg.hop_length
    cos, sin, w = _dft_tables(n_fft, geo.f_pad, cfg.normalized)
    hi = precision or jax.lax.Precision.HIGHEST

    frames = frame(x_pad, n_fft, hop) * window
    r_re = jnp.matmul(frames, cos, precision=hi)
    r_im = -jnp.matmul(frames, sin, precision=hi)
    mag = jnp.sqrt(r_re * r_re + r_im * r_im + 1e-30)
    onep = 1.0 + rho  # true division, matching the XLA path bit-for-bit
    z_re = (rho * Yr + r_re) / onep
    z_im = (rho * Yi + r_im) / onep
    u_re = Yr - z_re
    u_im = Yi - z_im
    t_re = z_re - u_re
    t_im = z_im - u_im
    norm = jnp.sqrt(t_re * t_re + t_im * t_im + 1e-30) + PROJ_EPS
    gain = target_pad / norm
    yn_re = t_re * gain + u_re
    yn_im = t_im * gain + u_im
    valid = (jnp.arange(geo.t_pad) < valid_t)[None, :, None]
    yn_re, yn_im = jnp.where(valid, yn_re, 0.0), jnp.where(valid, yn_im, 0.0)
    contract = (((2,), (1,)), ((), ()))
    fr = jax.lax.dot_general(
        yn_re * w, cos, contract, precision=hi
    ) - jax.lax.dot_general(yn_im * w, sin, contract, precision=hi)
    y = overlap_add(fr * window, hop) * inv_env
    y = repad_edges(y, cfg, geo)
    return (y, yn_re, yn_im), mag
