"""ADMM phase retrieval (Bregman / proximal-splitting form), TPU-native.

Reference: ``ADMM`` at /root/reference/torch_specinv/methods.py:415-506
(Griffin-Lim-like phase recovery via the alternating direction method of
multipliers).  Update order preserved exactly (methods.py:464-477):

    R = stft(x);  Z = (rho*Y + R) / (1 + rho);  U += X - Z
    X = proj_mag(Z - U);  Y = X + U;  x = istft(Y)

with ``rho = 1`` behaving like Griffin-Lim, and the pre-projection magnitude
``|R|`` as the metric/stop output (methods.py:464-465).

State is the 4-tuple pytree ``(X, Y, U, x)`` on the XLA paths (kept in the
reference's literal form as the parity anchor); the fused Pallas kernels use
the bitwise-identical Douglas-Rachford one-variable reduction (only ``Y``
persists — see ops/pallas/admm_fused4.py), which matches Griffin-Lim's state
footprint.  The loop runs fully on-device.
"""
from __future__ import annotations

from functools import partial
from typing import NamedTuple, Optional

import jax
import jax.numpy as jnp

from ..config import STFTConfig
from ..ops import fourier
from ..ops.stft import istft, make_envelope, stft
from ..utils.runner import (
    iterate, iterate_segmented, stats_eval_fns, stop_loss_fn,
)
from .common import prepare_spec_b3, restore_output, run_with_vmem_demotion
from .griffin_lim import magnitude_project
from .phase_init import phase_init_tm


class ADMMState(NamedTuple):
    X: jnp.ndarray  # (B, T, F) complex — projection-side variable
    Y: jnp.ndarray  # (B, T, F) complex — synthesis-side variable
    U: jnp.ndarray  # (B, T, F) complex — scaled dual variable
    x: jnp.ndarray  # (B, L) waveform


def init(
    init_spec_tm: jnp.ndarray,
    cfg: STFTConfig,
    window: jnp.ndarray,
    envelope: Optional[jnp.ndarray] = None,
    backend: str = "auto",
    precision=None,
) -> ADMMState:
    x = istft(
        init_spec_tm, cfg, window, envelope=envelope, backend=backend,
        precision=precision,
    )
    return ADMMState(
        X=init_spec_tm,
        Y=init_spec_tm,
        U=jnp.zeros_like(init_spec_tm),
        x=x,
    )


def step(
    state: ADMMState,
    target_tm: jnp.ndarray,
    rho,
    cfg: STFTConfig,
    window: jnp.ndarray,
    envelope: jnp.ndarray,
    backend: str = "auto",
    precision=None,
):
    """One ADMM iteration. Returns (state, pre-projection magnitude)."""
    R = stft(state.x, cfg, window, backend=backend, precision=precision)
    output = jnp.abs(R)
    Z = (rho * state.Y + R) / (1 + rho)
    U = state.U + state.X - Z
    X = magnitude_project(Z - U, target_tm)
    Y = X + U
    x = istft(Y, cfg, window, envelope=envelope, backend=backend, precision=precision)
    return ADMMState(X=X, Y=Y, U=U, x=x), output


@partial(
    jax.jit,
    static_argnames=("cfg", "max_iter", "eva_iter", "metric", "verbose", "mode", "backend", "early_stop", "precision", "loss_psum_axes", "remat"),
)
def run_tm(
    target_tm: jnp.ndarray,
    init_spec_tm: jnp.ndarray,
    window: jnp.ndarray,
    rho: jnp.ndarray,
    tol: jnp.ndarray,
    cfg: STFTConfig,
    max_iter: int = 1000,
    eva_iter: int = 10,
    metric: str = "sc",
    verbose: bool = False,
    mode: str = "fori",
    backend: str = "auto",
    early_stop: bool = True,
    precision=None,
    loss_psum_axes=None,
    remat: bool = False,
) -> jnp.ndarray:
    envelope = make_envelope(cfg, window, target_tm.shape[-2])
    state = init(
        init_spec_tm, cfg, window, envelope=envelope, backend=backend,
        precision=precision,
    )
    step_fn = partial(
        step,
        target_tm=target_tm,
        rho=rho,
        cfg=cfg,
        window=window,
        envelope=envelope,
        backend=backend,
        precision=precision,
    )
    state = iterate(
        step_fn,
        state,
        target_tm,
        max_iter=max_iter,
        tol=tol,
        eva_iter=eva_iter,
        metric=metric,
        verbose=verbose,
        mode=mode,
        early_stop=early_stop,
        loss_fn=stop_loss_fn(loss_psum_axes),
        remat=remat,
    )
    return state.x


@partial(
    jax.jit,
    static_argnames=("cfg", "max_iter", "eva_iter", "metric", "verbose", "interpret", "early_stop", "precision", "loss_psum_axes", "remat"),
)
def run_tm_pallas(
    target_tm: jnp.ndarray,
    init_spec_tm: jnp.ndarray,
    window: jnp.ndarray,
    rho: jnp.ndarray,
    tol: jnp.ndarray,
    cfg: STFTConfig,
    max_iter: int = 1000,
    eva_iter: int = 10,
    metric: str = "sc",
    verbose: bool = False,
    interpret: bool = False,
    early_stop: bool = True,
    precision=None,
    loss_psum_axes=None,
    remat: bool = False,
) -> jnp.ndarray:
    """ADMM driven by the fused Pallas iteration kernel; same numerics as
    :func:`run_tm` — see ops/pallas/admm_fused.py.  Differentiable via the
    XLA-twin custom_vjp (see griffin_lim.run_tm_pallas)."""
    if precision is None:
        precision = fourier.default_precision()
    from ..ops.framing import pad_center
    from ..ops.pallas.admm_fused import fused_admm_iteration
    from ._pallas_driver import make_geometry, make_inv_env, pad_tf

    B, T, F = target_tm.shape
    geo = make_geometry(cfg, T, F)
    inv_env = make_inv_env(cfg, window, T, geo)

    target_pad = pad_tf(target_tm, geo, T, F)
    y_re = pad_tf(init_spec_tm.real, geo, T, F)
    y_im = pad_tf(init_spec_tm.imag, geo, T, F)
    x0 = istft(init_spec_tm, cfg, window).astype(jnp.float32)
    x_pad0 = jnp.pad(pad_center(x0, cfg), ((0, 0), (0, geo.lx - geo.lp)))
    # DR-reduced state (see ops/pallas/admm_fused.py): Y0 = X0 since U0 = 0
    # (methods.py:452-456); X and U are derived inside the kernel.
    state0 = (x_pad0, y_re, y_im)

    from ._pallas_driver import admm_xla_twin

    @jax.custom_vjp
    def one_iter(state, tgt, win, env, rho_):
        x_pad, Yr, Yi = state
        x_pad, mag, Yr, Yi = fused_admm_iteration(
            x_pad, Yr, Yi, tgt, win, env, rho_,
            cfg, valid_t=T, e=geo.e, block_t=geo.block_t, interpret=interpret,
            precision=precision,
        )
        return (x_pad, Yr, Yi), mag

    def one_iter_fwd(state, tgt, win, env, rho_):
        return one_iter(state, tgt, win, env, rho_), (state, tgt, win, env, rho_)

    # Kernel-only scheme strings map to HIGHEST for the XLA-twin backward.
    twin_precision = (
        precision if isinstance(precision, jax.lax.Precision)
        else jax.lax.Precision.HIGHEST
    )

    def one_iter_bwd(residuals, cotangents):
        state, tgt, win, env, rho_ = residuals
        _, vjp = jax.vjp(
            lambda s, t, w_, e_, r_: admm_xla_twin(
                s, t, w_, e_, r_, cfg, geo, T, precision=twin_precision
            ),
            state, tgt, win, env, rho_,
        )
        return vjp(cotangents)

    one_iter.defvjp(one_iter_fwd, one_iter_bwd)

    def step(state):
        state, mag = one_iter(
            state, target_pad, window.astype(jnp.float32), inv_env, rho
        )
        return state, mag[:, :T, :F]

    state = iterate(
        step,
        state0,
        target_tm.astype(jnp.float32),
        max_iter=max_iter,
        tol=tol,
        eva_iter=eva_iter,
        metric=metric,
        verbose=verbose,
        mode="fori",
        early_stop=early_stop,
        loss_fn=stop_loss_fn(loss_psum_axes),
        remat=remat,
    )
    return state[0][..., geo.p_amt : geo.p_amt + geo.l_out]


@partial(
    jax.jit,
    static_argnames=("cfg", "max_iter", "eva_iter", "metric", "verbose", "block_t", "interpret", "early_stop", "precision", "mode", "loss_psum_axes", "pack", "remat", "stats_eval", "lane"),
)
def run_tm_pallas4(
    target_tm: jnp.ndarray,
    init_spec_tm: jnp.ndarray,
    window: jnp.ndarray,
    rho: jnp.ndarray,
    tol: jnp.ndarray,
    cfg: STFTConfig,
    max_iter: int = 1000,
    eva_iter: int = 10,
    metric: str = "sc",
    verbose: bool = False,
    block_t: int | None = None,
    interpret: bool = False,
    early_stop: bool = True,
    precision=None,
    loss_psum_axes=None,
    mode: str = "fori",
    pack: int | None = None,
    remat: bool = False,
    stats_eval: bool | None = None,
    lane: bool | None = None,
) -> jnp.ndarray:
    """ADMM driven by the four-step fused kernels (ops/pallas/admm_fused4):
    Hermitian-extended full-spectrum iteration in permuted layout; the
    fixed-iteration path runs the whole loop in ONE Pallas launch."""
    from ..ops.framing import pad_center
    from ..ops.pallas import fft4, gl_fullrun4
    from ..ops.pallas.admm_fused4 import fused_admm_run
    from ._pallas_driver import admm_xla_twin4, make_geometry4, make_inv_env

    if precision is None:
        precision = fourier.default_precision()
    B, T, F = target_tm.shape
    n_fft = cfg.n_fft
    geo = make_geometry4(cfg, T, block_t=block_t)
    inv_env = make_inv_env(cfg, window, T, geo)
    with_mag = bool(early_stop or verbose)
    # Scalar eval stats on the lane engine; stats_eval must be STATIC — an
    # env read inside this jitted body would be pinned by the first trace
    # (see griffin_lim.run_tm_pallas4).
    if stats_eval is None:
        stats_eval = gl_fullrun4.stats_eval_enabled()
    # lane gets the same static-arg treatment (see griffin_lim.run_tm_pallas4)
    use_loss = (with_mag and stats_eval
                and gl_fullrun4.lane_active(cfg, geo.block_t, lane))
    if pack is None:
        pack = gl_fullrun4.choose_pack(
            cfg, T, B, block_t=geo.block_t,
            with_mag=with_mag and not use_loss,
        )
    elif pack < 1 or B % pack:
        raise ValueError(f"pack={pack} must be >= 1 and divide the batch size {B}")

    if cfg.onesided:
        tgt_full = fft4.extend_hermitian_mag(target_tm.astype(jnp.float32), n_fft)
        spec_full = fft4.extend_hermitian_spec(init_spec_tm, n_fft)
    else:
        tgt_full = target_tm.astype(jnp.float32)
        spec_full = init_spec_tm

    def pad_rows(a):
        return jnp.pad(a, ((0, 0), (0, geo.t_pad - T), (0, 0)))

    target_p = fft4.to_permuted(pad_rows(tgt_full), n_fft)
    x0_re = fft4.to_permuted(pad_rows(spec_full.real.astype(jnp.float32)), n_fft)
    x0_im = fft4.to_permuted(pad_rows(spec_full.imag.astype(jnp.float32)), n_fft)

    x0 = istft(init_spec_tm, cfg, window).astype(jnp.float32)
    x_pad0 = jnp.pad(pad_center(x0, cfg), ((0, 0), (0, geo.lx - geo.lp)))

    twin_precision = (
        precision if isinstance(precision, jax.lax.Precision)
        else jax.lax.Precision.HIGHEST
    )
    win32 = window.astype(jnp.float32)
    w_loss = gl_fullrun4.hermitian_loss_weight(cfg) if use_loss else None

    def make_seg(n_iters: int, seg_mag: bool):
        """``n_iters`` fused DR-ADMM iterations in ONE launch; see
        griffin_lim.run_tm_pallas4.make_seg for the segment design."""

        @jax.custom_vjp
        def seg(state, tgt, win, env, rho_):
            x_pad, Yr, Yi = state
            out = fused_admm_run(
                x_pad, Yr, Yi, tgt, win, env, rho_, cfg, valid_t=T,
                e=geo.e, n_iters=n_iters, block_t=geo.block_t,
                interpret=interpret, precision=precision,
                emit_state=True, with_mag=seg_mag and not use_loss,
                with_loss=seg_mag and use_loss, w_loss=w_loss, pack=pack,
                lane=lane,
            )
            if seg_mag and use_loss:
                x_pad, Yr, Yi, stats = out
                mag = jnp.sum(stats[:, :2, 0], axis=0)
            elif seg_mag:
                x_pad, Yr, Yi, mag = out
            else:
                x_pad, Yr, Yi = out
                mag = jnp.zeros((), jnp.float32)
            return (x_pad, Yr, Yi), mag

        def seg_fwd(state, tgt, win, env, rho_):
            return seg(state, tgt, win, env, rho_), (state, tgt, win, env, rho_)

        def seg_bwd(residuals, cotangents):
            state, tgt, win, env, rho_ = residuals

            def replay(state_, tgt_, win_, env_, rho__):
                def twin(s, t2, w2, e2, r2):
                    return admm_xla_twin4(
                        s, t2, w2, e2, r2, cfg, geo, T,
                        precision=twin_precision,
                    )

                if remat:
                    # save only the per-iteration carry; recompute the
                    # twin's internals (frames/spectra) in the backward
                    twin = jax.checkpoint(twin)

                def body(s, _):
                    s2, _mag = twin(s, tgt_, win_, env_, rho__)
                    return s2, None

                st_mid = state_
                if n_iters > 1:
                    st_mid, _ = jax.lax.scan(
                        body, state_, None, length=n_iters - 1
                    )
                return admm_xla_twin4(
                    st_mid, tgt_, win_, env_, rho__, cfg, geo, T,
                    precision=twin_precision,
                )

            _, vjp = jax.vjp(replay, state, tgt, win, env, rho_)
            if not seg_mag or use_loss:
                st_ct, _ = cotangents
                zero_mag = jnp.zeros(
                    (B, geo.t_pad, n_fft // 128, 128), jnp.float32
                )
                cotangents = (st_ct, zero_mag)
            return vjp(cotangents)

        seg.defvjp(seg_fwd, seg_bwd)
        return seg

    state0 = (x_pad0, x0_re, x0_im)  # DR state: Y0 = X0, U0 = 0

    if not with_mag:
        run = make_seg(max_iter, False)
        state, _ = run(state0, target_p, win32, inv_env, rho)
        return state[0][..., geo.p_amt : geo.p_amt + geo.l_out]

    # Early-stop / verbose: whole-segment launches of eva_iter iterations
    # (the stop rule only consults the metric there — see
    # runner.iterate_segmented).
    eva_seg = make_seg(min(eva_iter, max_iter), True)

    if use_loss:
        def seg_step(state):
            return eva_seg(state, target_p, win32, inv_env, rho)

        loss_fn, metric_fn = stats_eval_fns(
            metric, target_tm.astype(jnp.float32), loss_psum_axes
        )
    else:
        def seg_step(state):
            state, mag = eva_seg(state, target_p, win32, inv_env, rho)
            return state, fft4.from_permuted(mag, n_fft)[:, :T, :F]

        loss_fn, metric_fn = stop_loss_fn(loss_psum_axes), None

    tail = max_iter % eva_iter
    tail_fn = None
    if tail:
        tail_seg = make_seg(tail, False)

        def tail_fn(state):
            return tail_seg(state, target_p, win32, inv_env, rho)

    state = iterate_segmented(
        seg_step,
        state0,
        target_tm.astype(jnp.float32),
        max_iter=max_iter,
        tol=tol,
        eva_iter=eva_iter,
        tail_fn=tail_fn,
        metric=metric,
        verbose=verbose,
        mode=mode,
        loss_fn=loss_fn,
        metric_fn=metric_fn,
        remat=remat,
    )
    return state[0][..., geo.p_amt : geo.p_amt + geo.l_out]


@partial(
    jax.jit,
    static_argnames=("cfg", "max_iter", "eva_iter", "metric", "verbose", "mode", "backend", "early_stop", "precision", "loss_psum_axes", "pack", "remat", "stats_eval", "lane"),
)
def _full_run(
    spec_b3: jnp.ndarray,
    window: jnp.ndarray,
    rho: jnp.ndarray,
    tol: jnp.ndarray,
    cfg: STFTConfig,
    max_iter: int,
    eva_iter: int,
    metric: str,
    verbose: bool,
    mode: str,
    backend: str,
    early_stop: bool,
    precision=None,
    loss_psum_axes=None,
    pack=None,
    remat: bool = False,
    stats_eval: bool | None = None,
    lane: bool | None = None,
) -> jnp.ndarray:
    if pack is not None and backend != "pallas4":
        # Fail-loud (see griffin_lim._full_run): packing is a whole-run-
        # kernel concept and must not be silently dropped.
        raise ValueError(
            f"pack applies to the whole-run pallas4 kernel only (resolved "
            f"backend here: {backend!r})"
        )
    spec_tm = jnp.swapaxes(spec_b3, -1, -2)
    if jnp.iscomplexobj(spec_tm):
        cmplx_tm, target_tm = spec_tm, jnp.abs(spec_tm)
    else:
        cmplx_tm, target_tm = phase_init_tm(spec_tm, cfg), spec_tm
    if backend == "pallas4":
        return run_tm_pallas4.__wrapped__(
            target_tm,
            cmplx_tm,
            window,
            rho.astype(jnp.float32),
            tol.astype(jnp.float32),
            cfg,
            max_iter=max_iter,
            eva_iter=eva_iter,
            metric=metric,
            verbose=verbose,
            interpret=jax.default_backend() == "cpu",
            early_stop=early_stop,
            precision=precision,
            mode=mode,
            loss_psum_axes=loss_psum_axes,
            pack=pack,
            remat=remat,
            stats_eval=stats_eval,
            lane=lane,
        )
    if backend == "pallas":
        return run_tm_pallas.__wrapped__(
            target_tm,
            cmplx_tm,
            window,
            rho.astype(jnp.float32),
            tol.astype(jnp.float32),
            cfg,
            max_iter=max_iter,
            eva_iter=eva_iter,
            metric=metric,
            verbose=verbose,
            interpret=jax.default_backend() == "cpu",
            early_stop=early_stop,
            precision=precision,
            loss_psum_axes=loss_psum_axes,
            remat=remat,
        )
    return run_tm.__wrapped__(
        target_tm,
        cmplx_tm,
        window,
        rho,
        tol,
        cfg,
        max_iter=max_iter,
        eva_iter=eva_iter,
        metric=metric,
        verbose=verbose,
        mode=mode,
        backend=backend,
        early_stop=early_stop,
        precision=fourier.check_precision(precision, backend),
        loss_psum_axes=loss_psum_axes,
        remat=remat,
    )


def ADMM(
    spec,
    max_iter: int = 1000,
    tol: float = 1e-6,
    rho: float = 0.1,
    verbose: bool = True,
    eva_iter: int = 10,
    metric: str = "sc",
    mode: str = "fori",
    backend: str = "auto",
    precision=None,
    loss_psum_axes=None,
    pack: int | None = None,
    remat: bool = False,
    **stft_kwargs,
):
    """Reference-parity entry point (methods.py:415-506).

    ``mode``/``backend``/``precision``/``remat`` are the same TPU-specific
    knobs as on :func:`specinv_tpu.griffin_lim` (precision accepts a
    ``jax.lax.Precision`` or, on the pallas backends, a bf16 scheme string /
    per-direction tuple; ``remat=True`` rematerializes iterations under
    reverse mode — same gradients, O(max_iter x state) backward memory).
    """
    assert eva_iter > 0 and max_iter > 0 and tol >= 0
    spec_b3, was_2d, cfg, window = prepare_spec_b3(spec, **stft_kwargs)
    from ..ops.pallas import gl_fused, gl_fused4

    fallback_backend = None  # demotion target when auto picked the whole-run kernel
    if backend == "auto" and jax.default_backend() not in ("cpu",):
        from ..ops.pallas import gl_fullrun4

        pallas_ok = gl_fused.supports(cfg, window) and not jnp.iscomplexobj(spec_b3)
        # Conservative budget under an enclosing trace: the OOM-demotion
        # probe only catches eagerly (see griffin_lim / run_with_vmem_demotion).
        eager = not isinstance(spec_b3, jax.core.Tracer)
        if gl_fused4.supports(cfg, window) and gl_fullrun4.fits(
            cfg, spec_b3.shape[-1], optimistic=eager
        ):
            backend = "pallas4"
            # Optimistic VMEM fit: first compile is the probe; a Mosaic OOM
            # demotes to this backend (see common.run_with_vmem_demotion).
            fallback_backend = ("pallas" if pallas_ok else "auto") if eager else None
        elif pallas_ok:
            backend = "pallas"
    if backend == "pallas4" and not gl_fused4.supports(cfg, window):
        raise ValueError(
            "pallas4 backend requires n_fft % 128 == 0, hop % 128 == 0, "
            "real window; use backend='auto' instead"
        )
    if backend == "pallas":
        if not gl_fused.supports(cfg, window):
            raise ValueError(
                "pallas backend requires onesided, n_fft % 128 == 0, "
                "hop % 128 == 0, real window; use backend='auto' instead"
            )
    real_dtype = jnp.zeros((), dtype=spec_b3.dtype).real.dtype
    # Eager env reads, passed down as static args (see griffin_lim).
    from ..ops.pallas.gl_fullrun4 import lane_enabled, stats_eval_enabled

    def launch(bk):
        return _full_run(
            spec_b3,
            window,
            jnp.asarray(rho, dtype=real_dtype),
            jnp.asarray(tol, dtype=real_dtype),
            cfg,
            max_iter=max_iter,
            eva_iter=eva_iter,
            metric=metric,
            verbose=verbose,
            mode=mode,
            backend=bk,
            early_stop=bool(tol > 0),
            precision=precision,
            loss_psum_axes=loss_psum_axes,
            pack=pack,
            remat=remat,
            stats_eval=stats_eval_enabled(),
            lane=lane_enabled(),
        )

    x = run_with_vmem_demotion(
        launch, backend, fallback_backend, cfg, spec_b3.shape[-1]
    )
    return restore_output(x, was_2d)


admm = ADMM
