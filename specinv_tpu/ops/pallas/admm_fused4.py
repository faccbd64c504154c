"""Fused ADMM iteration + whole-run kernel, four-step matmul-FFT edition.

Same architecture as :mod:`.gl_fused4` / :mod:`.gl_fullrun4` with the
Griffin-Lim middle replaced by the reference's ADMM update chain
(/root/reference/torch_specinv/methods.py:464-477):

    R = stft(x);  Z = (rho*Y + R)/(1+rho);  U += X - Z
    X = proj_mag(Z - U);  Y = X + U;  x = istft(Y)

The kernel state is the *Douglas-Rachford one-variable reduction* of that
chain.  Since ``Y = X + U`` by construction, the dual update collapses to
``U' = U + X - Z = Y - Z`` and the whole recursion only needs ``Y``:

    Z  = (rho*Y + R)/(1+rho)
    U' = Y - Z                       # == U + X - Z bitwise: fl(U+X) = fl(X+U) = stored Y
    Y' = proj_mag(Z - U') + U'       # X' = proj_mag(Z - U') never stored

This is *bitwise identical* to carrying (X, Y, U) — the stored ``Y`` plane
equals ``fl(X + U)`` exactly and every surviving op keeps its order — but
cuts the HBM/VMEM state from six f32 planes to two (the same footprint as
the Griffin-Lim kernels), which is most of the GL-vs-ADMM throughput gap.

The iteration runs in Hermitian-extended full-spectrum space (permuted
(m, 128) bin layout, see fft4): every update is elementwise per bin against
a mirrored target, so symmetry — and hence exact equivalence with the
onesided iteration — is preserved.  Rows >= valid_t are zero padding and are
masked after the update (unlike GL, ADMM's dual would otherwise give padded
rows Y = -R/(1+rho) != 0 and overlap-add garbage).
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
from .gl_fullrun4 import _repad_slab
from .gl_fused4 import frame_rows, ola_rows

TABLE_KEYS = fft4.DEVICE_TABLE_KEYS


def _admm_middle(
    r_re, r_im, y_sre, y_sim, tgt, rho,
    row0, valid_t, block_t: int, m: int,
):
    """The elementwise DR-reduced ADMM update on (pack*block_t, m, 128)
    planes.  With clip packing the leading dim concatenates ``pack`` clips'
    ``block_t``-row slabs; each clip's frame index is ``row0 + (l mod
    block_t)`` (identical to ``row0 + l`` when unpacked).

    ``valid_t`` may be a static int (whole-run kernel) OR a traced scalar
    (per-iteration kernel under shard_map, where the shard's true-frame
    count is an ``axis_index`` expression) — keep everything touching it
    jnp-level, no Python branching."""
    rows = y_sre.shape[0]
    onep = 1.0 + rho  # true division, matching the XLA path bit-for-bit
    z_re = (rho * y_sre + r_re) / onep
    z_im = (rho * y_sim + r_im) / onep
    u_re = y_sre - z_re
    u_im = y_sim - z_im
    t_re = z_re - u_re
    t_im = z_im - u_im
    norm = jnp.sqrt(t_re * t_re + t_im * t_im) + PROJ_EPS
    gain = tgt / norm
    yn_re = t_re * gain + u_re
    yn_im = t_im * gain + u_im
    local = jax.lax.broadcasted_iota(jnp.int32, (rows, m, LANE), 0)
    if rows != block_t:
        local = jax.lax.rem(local, jnp.int32(block_t))
    row = row0 + local
    valid = row < valid_t
    z = jnp.float32(0.0)
    return jnp.where(valid, yn_re, z), jnp.where(valid, yn_im, z)


def _kernel_iter(
    rho_ref,       # SMEM (1, 1) f32
    valid_ref,     # SMEM (1, 1) i32 — dynamic true-frame count (per shard)
    x_ref,         # (1, 1, Lx)
    tgt_ref,       # (1, block_t, m, 128) permuted full-spectrum magnitude
    y_re_ref,      # (1, block_t, m, 128) DR state
    y_im_ref,
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
    normalize: bool,
):
    """One fused four-step ADMM iteration (per-iteration launch).

    Mirror of :func:`..gl_fused4._kernel` with the GL momentum/projection
    middle replaced by :func:`_admm_middle`; the row-validity threshold is
    DYNAMIC (SMEM scalar) because the sequence-parallel caller's per-shard
    frame count is a traced ``axis_index`` expression.
    """
    ntab = len(TABLE_KEYS)
    tab_refs = rest[:ntab]
    win_ref, inv_env_ref, jrev_ref = rest[ntab : ntab + 3]
    x_out_ref, ny_re_ref, ny_im_ref, mag_ref, frames_s = rest[ntab + 3 :]

    t = pl.program_id(1)
    n_t = pl.num_programs(1)
    m = n_fft // LANE
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

    r_re, r_im = fft4.fwd4(frames_s[...], tables, fwd_p)

    # Metric output = pre-update |R| (methods.py:464-465).
    mag_ref[0] = jnp.sqrt(r_re * r_re + r_im * r_im)

    yn_re, yn_im = _admm_middle(
        r_re, r_im, y_re_ref[0], y_im_ref[0], tgt_ref[0], rho_ref[0, 0],
        t * block_t, valid_ref[0, 0], block_t, m,
    )
    ny_re_ref[0] = yn_re
    ny_im_ref[0] = yn_im

    fr = fft4.inv4_real(yn_re, yn_im, tables, inv_p)

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


def fused_admm_iteration4(
    x_pad: jnp.ndarray,      # (B, Lx) float32, padded coords
    Y_re: jnp.ndarray,       # (B, T_pad, m, 128) permuted DR state
    Y_im: jnp.ndarray,
    target: jnp.ndarray,     # (B, T_pad, m, 128) permuted full magnitude
    window: jnp.ndarray,     # (n_fft,)
    inv_env: jnp.ndarray,    # (Lx,)
    rho: jnp.ndarray,
    cfg: STFTConfig,
    valid_t,                 # true frame count — may be traced (per shard)
    e: int,
    block_t: int = 64,
    interpret: bool = False,
    precision=jax.lax.Precision.HIGH,
    normalize: bool = True,
):
    """One fused four-step ADMM iteration.

    Per-iteration counterpart of :func:`fused_admm_run`, shaped like
    :func:`..gl_fused4.fused_gl_iteration4`: ``normalize=False`` skips the
    envelope/re-pad epilogue and returns the raw overlap-add (the
    sequence-parallel path must halo-exchange boundary spill first).
    ``valid_t`` may be a traced scalar — under ``shard_map`` each shard's
    true-frame count depends on ``axis_index``.

    Returns ``(x_raw, mag_p, new_Y_re, new_Y_im)``; ``mag_p`` is the
    pre-update ``|R|`` in permuted layout (methods.py:464-465).
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
        _kernel_iter, block_t=block_t, n_fft=n_fft, hop=hop,
        pad_mode=pad_mode, p_amt=p_amt, e=e,
        fwd_p=fwd_p, inv_p=inv_p, np_tables=np_tables, normalize=normalize,
    )
    grid = (B, n_t)

    blk = pl.BlockSpec((1, block_t, m, LANE), lambda b, t: (b, t, 0, 0))
    sig = pl.BlockSpec((1, 1, lx), lambda b, t: (b, 0, 0))
    const_sig = pl.BlockSpec((1, 1, lx), lambda b, t: (0, 0, 0))
    tab_specs = [
        pl.BlockSpec(tables[k].shape, lambda b, t: tuple([0] * 2))
        for k in TABLE_KEYS
    ]

    macs_frame = 2 * (2 * m * LANE * LANE + 4 * LANE * m * m)
    out = pl.pallas_call(
        kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec(memory_space=pltpu.SMEM),   # rho
            pl.BlockSpec(memory_space=pltpu.SMEM),   # valid_t
            sig,                                     # x
            blk, blk, blk,                           # target, Y re+im
            *tab_specs,
            pl.BlockSpec((1, n_fft), lambda b, t: (0, 0)),   # window
            const_sig,                               # inv_env
            pl.BlockSpec(jrev.shape, lambda b, t: (0, 0)),   # jrev
        ],
        out_specs=[sig, blk, blk, blk],
        out_shape=[
            jax.ShapeDtypeStruct((B, 1, lx), jnp.float32),
            *[jax.ShapeDtypeStruct((B, t_pad, m, LANE), jnp.float32)] * 3,
        ],
        scratch_shapes=[pltpu.VMEM((block_t, n_fft), jnp.float32)],
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
        ),
        cost_estimate=pl.CostEstimate(
            flops=2 * B * t_pad * macs_frame,
            bytes_accessed=4 * (2 * B * lx + 8 * B * t_pad * n_fft),
            transcendentals=2 * B * t_pad * n_fft,
        ),
        interpret=interpret,
    )(
        jnp.asarray(rho, jnp.float32).reshape(1, 1),
        jnp.asarray(valid_t, jnp.int32).reshape(1, 1),
        x_pad.astype(jnp.float32).reshape(B, 1, lx),
        target.astype(jnp.float32),
        Y_re.astype(jnp.float32),
        Y_im.astype(jnp.float32),
        *[jnp.asarray(tables[k]) for k in TABLE_KEYS],
        jnp.asarray(window, jnp.float32).reshape(1, n_fft),
        jnp.asarray(inv_env, jnp.float32).reshape(1, 1, lx),
        jnp.asarray(jrev),
    )
    x_raw, ny_re, ny_im, mag = out[0], out[1], out[2], out[3]
    return x_raw.reshape(B, lx), mag, ny_re, ny_im


# ---------------------------------------------------------------------------
# Whole-run variant: grid (B, n_iters, n_t), state resident in VMEM.


def _kernel_full(
    rho_ref,
    x0_ref,        # (1, 1, Lx)
    tgt_ref,       # (1, t_pad, m, 128)
    y0_sre_ref, y0_sim_ref,   # initial Y (= initial X; U starts at 0)
    *rest,
    block_t: int,
    n_fft: int,
    hop: int,
    valid_t: int,
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
    ntab = len(TABLE_KEYS)
    tab_refs = rest[:ntab]
    win_ref, inv_env_ref, jrev_ref = rest[ntab : ntab + 3]
    outs = rest[ntab + 3 :]
    x_out_ref = outs[0]
    k = 1
    if emit_state:
        y_out_re_ref, y_out_im_ref = outs[k : k + 2]
        k += 2
    if with_mag:
        mag_ref = outs[k]
        k += 1
    (x_s, ys_re, ys_im, frames_s) = outs[k:]

    lxc = x_s.shape[1] // pack  # per-clip slab length
    i = pl.program_id(1)
    t = pl.program_id(2)
    n_t = pl.num_programs(2)
    rd = jax.lax.rem(i, jnp.int32(2))
    wr = 1 - rd
    m = n_fft // LANE
    window = win_ref[0, :]
    tables = dict(np_tables)
    tables.update({k: r[...] for k, r in zip(TABLE_KEYS, tab_refs)})

    @pl.when(jnp.logical_and(i == 0, t == 0))
    def _init_x():
        for c in range(pack):
            x_s[pl.ds(0, 1), pl.ds(c * lxc, lxc)] = x0_ref[0, pl.ds(c, 1)]

    # Packed planes are t-block-major (see gl_fullrun4._kernel): step t's
    # slab for all clips is one contiguous pack*block_t-row slice.
    sl = pl.ds(t * pack * block_t, pack * block_t)

    def _plane(ref):
        # t_blocked: the ref window IS this step's slab (streamed);
        # resident: the ref holds the whole plane, slice it.
        return ref[0] if t_blocked else ref[0, sl]

    @pl.when(i == 0)
    def _init_state():
        ys_re[sl] = _plane(y0_sre_ref)
        ys_im[sl] = _plane(y0_sim_ref)

    @pl.when(t == 0)
    def _zero_write_slab():
        x_s[pl.ds(wr, 1), :] = jnp.zeros((1, x_s.shape[1]), jnp.float32)

    for c in range(pack):
        frame_rows(
            frames_s,
            lambda s, n, c=c: x_s[pl.ds(rd, 1), pl.ds(c * lxc + s, n)],
            window, t * block_t, block_t, n_fft, hop, rows0=c * block_t,
        )

    r_re, r_im = fft4.fwd4(frames_s[...], tables, fwd_p)

    if with_mag:
        # Metric output = pre-update |R| (methods.py:464-465), only needed
        # for the final (eval) iteration of the launch.
        @pl.when(i == n_iters - 1)
        def _emit_mag():
            if t_blocked:
                mag_ref[0] = jnp.sqrt(r_re * r_re + r_im * r_im)
            else:
                mag_ref[0, sl] = jnp.sqrt(r_re * r_re + r_im * r_im)

    yn_re, yn_im = _admm_middle(
        r_re, r_im, ys_re[sl], ys_im[sl], _plane(tgt_ref), rho_ref[0, 0],
        t * block_t, valid_t, block_t, m,
    )
    ys_re[sl] = yn_re
    ys_im[sl] = yn_im
    if emit_state:
        @pl.when(i == n_iters - 1)
        def _emit_y():
            if t_blocked:
                y_out_re_ref[0] = yn_re
                y_out_im_ref[0] = yn_im
            else:
                y_out_re_ref[0, sl] = yn_re
                y_out_im_ref[0, sl] = yn_im

    fr = fft4.inv4_real(yn_re, yn_im, tables, inv_p)

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


def fused_admm_run(
    x_pad, Y_re, Y_im, target, window, inv_env, rho,
    cfg: STFTConfig, valid_t: int, e: int, n_iters: int, block_t: int = 64,
    interpret: bool = False, precision=jax.lax.Precision.HIGH,
    emit_state: bool = False, with_mag: bool = False,
    with_loss: bool = False, w_loss=None, pack: int = 1,
    lane: bool | None = None,
):
    """Run ``n_iters`` fused ADMM iterations in one launch -> final x_pad.

    Initial state per the reference (methods.py:452-456): ``Y = X`` = the
    seeded complex spectrum (passed as Y_re/Y_im), ``U = 0`` — so the DR
    variable starts at the seeded spectrum.

    ``emit_state`` additionally returns the final Y planes and ``with_mag``
    the pre-update |R| of the LAST iteration, making the launch one eval
    segment of an early-stopping run (see gl_fullrun4.fused_gl_run).
    Return order: ``x_pad[, Y_re, Y_im][, mag]``.

    ``pack`` folds that many clips into each grid step (bitwise invariant;
    see gl_fullrun4.fused_gl_run / choose_pack).
    """
    from .fullrun_lane import fused_run_lane
    from .gl_fullrun4 import lane_active

    if lane_active(cfg, block_t, lane):
        # lane-major + hop-row-slab engine (see fullrun_lane module docstring)
        return fused_run_lane(
            "admm", x_pad, Y_re, Y_im, target, window, inv_env, rho, cfg,
            e, n_iters, valid_t=valid_t, block_t=block_t,
            interpret=interpret, precision=precision,
            emit_state=emit_state, with_mag=with_mag,
            with_loss=with_loss, w_loss=w_loss, pack=pack,
        )
    if with_loss:
        raise ValueError(
            "with_loss requires the lane-major engine; callers gate on "
            "gl_fullrun4.lane_active()"
        )

    B, t_pad, m, lanes = target.shape
    n_fft, hop = cfg.n_fft, cfg.hop_length
    assert lanes == LANE and m == n_fft // LANE and t_pad % block_t == 0
    lx = x_pad.shape[-1]
    assert lx == (t_pad - 1) * hop + n_fft
    assert pack >= 1 and B % pack == 0
    G = B // pack
    n_t = t_pad // block_t

    from .gl_fullrun4 import VMEM_BUDGET, VMEM_CEILING, plane_vmem_bytes

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
        _kernel_full, block_t=block_t, n_fft=n_fft, hop=hop, valid_t=valid_t,
        pad_mode=pad_mode, p_amt=p_amt, e=e, fwd_p=fwd_p, inv_p=inv_p,
        np_tables=np_tables, n_iters=n_iters,
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
            pl.BlockSpec(memory_space=pltpu.SMEM),               # rho
            sig,                                                 # x0
            blk, blk, blk,                                       # tgt, Y0
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
            *[pltpu.VMEM((pack * t_pad, m, LANE), jnp.float32)] * 2,
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
        jnp.asarray(rho, jnp.float32).reshape(1, 1),
        x_pad.astype(jnp.float32).reshape(G, pack, lx),
        pack_planes(target.astype(jnp.float32)),
        pack_planes(Y_re.astype(jnp.float32)),
        pack_planes(Y_im.astype(jnp.float32)),
        *[jnp.asarray(tables[k]) for k in TABLE_KEYS],
        jnp.asarray(window, jnp.float32).reshape(1, n_fft),
        jnp.asarray(inv_env, jnp.float32).reshape(1, 1, lx),
        jnp.asarray(jrev),
    )
    x_fin = out[0].reshape(B, lx)
    if not emit_state and not with_mag:
        return x_fin
    return (x_fin, *[unpack_planes(o) for o in out[1:]])
