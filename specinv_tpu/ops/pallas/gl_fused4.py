"""Fused Griffin-Lim iteration, four-step matmul-FFT edition.

Successor to :mod:`.gl_fused` (same fusion boundary: one kernel = one whole
GL iteration; only the signal and the momentum spectrum cross HBM between
iterations) with the O(n_fft * f_pad) direct DFT matmuls replaced by the
four-step factorization from :mod:`.fft4` — ~7x fewer MXU MACs per
iteration at n_fft=2048.

Differences from gl_fused:
  * the iteration runs in FULL-spectrum space (Hermitian extension of the
    onesided target/seed happens once in the driver): magnitude projection
    of a Hermitian-symmetric spectrum against a mirrored target preserves
    the symmetry, so the trajectories are mathematically identical
    (validated to 1e-13 in scripts/proto_fourstep.py) — and twosided
    (onesided=False) configs work natively, which gl_fused could not do;
  * spectrum planes live in the permuted (d, e) layout (bin k = d + m*e,
    planes shaped (m, 128) — full lane width), so no per-iteration relayout
    is ever needed;
  * no frequency grid: the DFT matrices are tiny (128^2 + m^2 + m*128) and
    stay VMEM-resident; grid is (B, T_blocks) only.

Reference numerics preserved: momentum ``S - lr*pre`` (methods.py:243),
projection eps 1e-16 (246), pre-momentum magnitude output (242).
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
from .gl_fused import (
    LANE,
    PROJ_EPS,
    _anti_identity,
    _repad_in_kernel,
    split_schemes,
)

TABLE_KEYS = fft4.DEVICE_TABLE_KEYS


def frame_rows(
    frames_s, read, window, t0, block_t: int, n_fft: int, hop: int,
    rows0: int = 0,
):
    """Windowed framing of ``block_t`` frames (first absolute frame ``t0``)
    into ``frames_s[rows0 : rows0 + block_t]`` — strided-reshape when
    ``hop | n_fft`` (see gl_fused._build_frames), per-row loop otherwise.

    ``read(start, size)`` returns the signal slice at sample ``start``;
    callers adapt their storage (a signal input ref, or the whole-run
    kernels' double-buffered scratch slab with a clip base offset).  ONE
    definition shared by all four four-step kernels (per-iteration and
    whole-run, GL and ADMM) so the pl.ds indexing cannot drift between
    them."""
    if n_fft % hop == 0:
        # rows0/block_t are always python ints: a static slice keeps the
        # lowering identical to the pre-dedupe per-kernel loops (pl.ds
        # would emit a constant dynamic-slice + index normalization).
        rows = slice(rows0, rows0 + block_t)
        for j in range(n_fft // hop):
            seg = read((t0 + j) * hop, block_t * hop).reshape(block_t, hop)
            frames_s[rows, j * hop : (j + 1) * hop] = (
                seg * window[j * hop : (j + 1) * hop]
            )
    else:
        def body(tl, _):
            frames_s[rows0 + tl, :] = (
                read((t0 + tl) * hop, n_fft).reshape(n_fft) * window
            )
            return 0

        jax.lax.fori_loop(0, block_t, body, 0)


def ola_rows(
    read, write, fr, window, t0, block_t: int, n_fft: int, hop: int,
    rows0: int = 0,
):
    """Windowed overlap-add of ``fr[rows0 : rows0 + block_t]`` into the
    signal storage (counterpart of :func:`frame_rows`).

    ``read(start, size)`` / ``write(start, value)`` adapt the storage;
    ``write`` receives the UPDATED slice shaped ``(block_t, hop)`` (strided
    path) or ``(n_fft,)`` and reshapes to its own layout."""
    if n_fft % hop == 0:
        for j in range(n_fft // hop):
            start = (t0 + j) * hop
            cur = read(start, block_t * hop).reshape(block_t, hop)
            add = fr[rows0 : rows0 + block_t, j * hop : (j + 1) * hop] * window[
                j * hop : (j + 1) * hop
            ]
            write(start, cur + add)
    else:
        def body_o(tl, _):
            start = (t0 + tl) * hop
            cur = read(start, n_fft).reshape(n_fft)
            write(start, cur + fr[rows0 + tl, :] * window)
            return 0

        jax.lax.fori_loop(0, block_t, body_o, 0)


def _kernel(
    lr_ref,        # SMEM (1, 1)
    x_ref,         # (1, 1, Lx)
    tgt_ref,       # (1, BT, m, 128) permuted full-spectrum magnitude
    pre_re_ref,    # (1, BT, m, 128)
    pre_im_ref,    # (1, BT, m, 128)
    *rest,
    block_t: int,
    n_fft: int,
    hop: int,
    pad_mode: str,
    p_amt: int,
    e: int,
    fwd_p,
    inv_p,
    with_mag: bool,
    np_tables,
    normalize: bool = True,
):
    ntab = len(TABLE_KEYS)
    tab_refs = rest[:ntab]
    win_ref, inv_env_ref, jrev_ref = rest[ntab : ntab + 3]
    outs = rest[ntab + 3 :]
    if with_mag:
        x_out_ref, npre_re_ref, npre_im_ref, mag_ref = outs[:4]
        frames_s = outs[4]
    else:
        x_out_ref, npre_re_ref, npre_im_ref = outs[:3]
        frames_s = outs[3]

    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    window = win_ref[0, :]
    tables = dict(np_tables)
    tables.update({k: r[...] for k, r in zip(TABLE_KEYS, tab_refs)})

    @pl.when(t == 0)
    def _zero_out():
        x_out_ref[...] = jnp.zeros_like(x_out_ref)

    frame_rows(
        frames_s, lambda s, n: x_ref[0, 0, pl.ds(s, n)], window,
        t * block_t, block_t, n_fft, hop,
    )

    s_re, s_im = fft4.fwd4(frames_s[...], tables, fwd_p)

    if with_mag:
        mag_ref[0] = jnp.sqrt(s_re * s_re + s_im * s_im)

    lr = lr_ref[0, 0]
    s_re = s_re - lr * pre_re_ref[0]
    s_im = s_im - lr * pre_im_ref[0]
    npre_re_ref[0] = s_re
    npre_im_ref[0] = s_im

    norm = jnp.sqrt(s_re * s_re + s_im * s_im) + PROJ_EPS
    gain = tgt_ref[0] / norm
    fr = fft4.inv4_real(s_re * gain, s_im * gain, tables, inv_p)

    def _x_out_write(s, v):
        x_out_ref[0, 0, pl.ds(s, v.size)] = v.reshape(v.size)

    ola_rows(
        lambda s, n: x_out_ref[0, 0, pl.ds(s, n)], _x_out_write, fr, window,
        t * block_t, block_t, n_fft, hop,
    )

    if normalize:
        @pl.when(t == n_t - 1)
        def _normalize():
            x_out_ref[...] = x_out_ref[...] * inv_env_ref[...]
            _repad_in_kernel(x_out_ref, jrev_ref, pad_mode, p_amt, e)


def supports(cfg: STFTConfig, window) -> bool:
    return (
        cfg.n_fft % LANE == 0
        and cfg.hop_length % LANE == 0
        and not jnp.iscomplexobj(window)
    )


def fused_gl_iteration4(
    x_pad: jnp.ndarray,      # (B, Lx) float32, padded coords
    pre_re: jnp.ndarray,     # (B, T_pad, m, 128) permuted full spectrum
    pre_im: jnp.ndarray,
    target: jnp.ndarray,     # (B, T_pad, m, 128) permuted full magnitude
    window: jnp.ndarray,     # (n_fft,)
    inv_env: jnp.ndarray,    # (Lx,)
    lr: jnp.ndarray,
    cfg: STFTConfig,
    e: int,
    block_t: int = 128,
    interpret: bool = False,
    precision=jax.lax.Precision.HIGH,
    with_mag: bool = True,
    normalize: bool = True,
):
    """One fused four-step GL iteration.

    ``normalize=False`` skips the envelope/re-pad epilogue and returns the
    raw overlap-add (used by the sequence-parallel path, which must halo-
    exchange boundary spill before normalizing).

    Returns ``(x_pad, mag_p, new_pre_re, new_pre_im)``; ``mag_p`` is the
    pre-momentum magnitude in permuted layout (or None if with_mag=False).
    """
    B, t_pad, m, lanes = target.shape
    n_fft, hop = cfg.n_fft, cfg.hop_length
    assert lanes == LANE and m == n_fft // LANE
    assert t_pad % block_t == 0
    lx = x_pad.shape[-1]
    assert lx == (t_pad - 1) * hop + n_fft, (lx, t_pad, hop, n_fft)

    tables = fft4.fourstep_tables(n_fft, cfg.normalized)
    np_tables = {k: v for k, v in tables.items() if k not in TABLE_KEYS}
    n_t = t_pad // block_t
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
        fwd_p=fwd_p, inv_p=inv_p, with_mag=with_mag, np_tables=np_tables,
        normalize=normalize,
    )
    grid = (B, n_t)

    blk = pl.BlockSpec((1, block_t, m, LANE), lambda b, t: (b, t, 0, 0))
    sig = pl.BlockSpec((1, 1, lx), lambda b, t: (b, 0, 0))
    const_sig = pl.BlockSpec((1, 1, lx), lambda b, t: (0, 0, 0))
    tab_specs = [
        pl.BlockSpec(tables[k].shape, lambda b, t: tuple([0] * 2))
        for k in TABLE_KEYS
    ]

    out_specs = [sig, blk, blk]
    out_shape = [
        jax.ShapeDtypeStruct((B, 1, lx), jnp.float32),
        jax.ShapeDtypeStruct((B, t_pad, m, LANE), jnp.float32),
        jax.ShapeDtypeStruct((B, t_pad, m, LANE), jnp.float32),
    ]
    if with_mag:
        out_specs.append(blk)
        out_shape.append(jax.ShapeDtypeStruct((B, t_pad, m, LANE), jnp.float32))

    # forward+inverse four-step MACs per frame (see module docstring)
    macs_frame = 2 * (2 * m * LANE * LANE + 4 * LANE * m * m)
    flops = 2 * B * t_pad * macs_frame
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # lr
            sig,                                     # x
            blk, blk, blk,                           # target, pre_re, pre_im
            *tab_specs,
            pl.BlockSpec((1, n_fft), lambda b, t: (0, 0)),   # window
            const_sig,                               # inv_env
            pl.BlockSpec(jrev.shape, lambda b, t: (0, 0)),   # jrev
        ],
        out_specs=out_specs,
        out_shape=out_shape,
        scratch_shapes=[pltpu.VMEM((block_t, n_fft), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=flops,
            bytes_accessed=4 * (2 * B * lx + (6 + 2 * with_mag) * B * t_pad * n_fft),
            transcendentals=(1 + with_mag) * B * t_pad * n_fft,
        ),
        interpret=interpret,
    )(
        jnp.asarray(lr, jnp.float32).reshape(1, 1),
        x_pad.astype(jnp.float32).reshape(B, 1, lx),
        target.astype(jnp.float32),
        pre_re.astype(jnp.float32),
        pre_im.astype(jnp.float32),
        *[jnp.asarray(tables[k]) for k in TABLE_KEYS],
        jnp.asarray(window, jnp.float32).reshape(1, n_fft),
        jnp.asarray(inv_env, jnp.float32).reshape(1, 1, lx),
        jnp.asarray(jrev),
    )
    if with_mag:
        x_raw, npre_re, npre_im, mag = out
    else:
        x_raw, npre_re, npre_im = out
        mag = None
    return x_raw.reshape(B, lx), mag, npre_re, npre_im
