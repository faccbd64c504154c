"""torch.optim.LBFGS-semantics fixed-step L-BFGS inner loop, on-device.

The reference forwards every LBFGS kwarg raw to torch
(/root/reference/torch_specinv/methods.py:543), so its users get torch's exact
update rule and termination criteria.  This module re-implements that update
rule (two-loop recursion over a bounded history, torch's first-iteration step
scaling ``t = min(1, 1/sum|g|) * lr``, the ``ys > 1e-10`` curvature guard, and
all five break conditions: ``max_iter``, ``max_eval``, ``tolerance_grad``,
``tolerance_change`` on both the step and the loss delta, and the
directional-derivative check) as a ``lax.while_loop`` — trajectory-exact
against ``torch.optim.LBFGS(line_search_fn=None)``.

Design notes (TPU): the history is a fixed ``(m, *x.shape)`` circular buffer
(torch pops a Python list; a roll would copy the whole buffer every
iteration), and the two-loop recursion masks invalid slots, so every shape is
static and the whole optimizer lives inside one compiled loop — no host syncs.
Like torch, state persists across outer ``step()`` calls (the very first
iteration ever resets the memory, later steps keep warm history).
"""
from __future__ import annotations

from typing import Callable, NamedTuple

import jax
import jax.numpy as jnp

from ._lbfgs_compact import compact_direction, gram_insert

CURVATURE_EPS = 1e-10  # torch's `ys > 1e-10` history-update guard


class TorchLBFGSState(NamedTuple):
    d: jnp.ndarray          # search direction, shape of x
    t: jnp.ndarray          # step size (scalar)
    ybuf: jnp.ndarray       # (m, *x.shape) gradient differences (torch old_dirs)
    sbuf: jnp.ndarray       # (m, *x.shape) steps (torch old_stps)
    rho: jnp.ndarray        # (m,) 1/ys
    hist: jnp.ndarray       # valid history rows (int32)
    head: jnp.ndarray       # next write slot (int32, circular)
    h_diag: jnp.ndarray     # initial inverse-Hessian scale (scalar)
    prev_grad: jnp.ndarray  # shape of x
    prev_loss: jnp.ndarray  # scalar
    n_total: jnp.ndarray    # torch state['n_iter'] — global iteration count
    gram: jnp.ndarray       # (m, m) S Y^T for the compact direction


def init_state(
    x0: jnp.ndarray, history_size: int, history_dtype=None
) -> TorchLBFGSState:
    """``history_dtype`` (opt-in, e.g. ``jnp.bfloat16``) stores the (m, n)
    s/y history rows narrower than the waveform — halving the HBM traffic
    the compact direction's matvecs stream (its cost is bandwidth-bound at
    history 100; benchmarks.md L-BFGS bandwidth table) — while every dot
    accumulates in the waveform dtype.  Approximate (rows round to bf16):
    NOT torch-trajectory-exact, quality-checked in tests/test_lbfgs.py."""
    dt = x0.dtype
    ht = dt if history_dtype is None else jnp.dtype(history_dtype)
    return TorchLBFGSState(
        d=jnp.zeros_like(x0),
        t=jnp.zeros((), dt),
        ybuf=jnp.zeros((history_size, *x0.shape), ht),
        sbuf=jnp.zeros((history_size, *x0.shape), ht),
        rho=jnp.zeros((history_size,), dt),
        hist=jnp.zeros((), jnp.int32),
        head=jnp.zeros((), jnp.int32),
        h_diag=jnp.ones((), dt),
        prev_grad=jnp.zeros_like(x0),
        prev_loss=jnp.asarray(jnp.inf, dt),
        n_total=jnp.zeros((), jnp.int32),
        gram=jnp.zeros((history_size, history_size), dt),
    )


def _vdot(a, b):
    return jnp.sum(a * b)


def _two_loop(grad, ybuf, sbuf, rho, hist, head, h_diag):
    """L-BFGS two-loop recursion over the circular history (masked slots)."""
    m = ybuf.shape[0]
    dt = grad.dtype

    def phys(i):  # logical i (0 = oldest) -> physical row
        return (head - hist + i) % m

    def bwd(j, carry):
        q, al = carry
        i = m - 1 - j

        def act(q, al):
            p = phys(i)
            a = _vdot(sbuf[p], q) * rho[p]
            return q - a * ybuf[p], al.at[i].set(a)

        return jax.lax.cond(i < hist, act, lambda q, al: (q, al), q, al)

    q, al = jax.lax.fori_loop(
        0, m, bwd, (-grad, jnp.zeros((m,), dt))
    )
    r = q * h_diag

    def fwd(i, r):
        def act(r):
            p = phys(i)
            b = _vdot(ybuf[p], r) * rho[p]
            return r + (al[i] - b) * sbuf[p]

        return jax.lax.cond(i < hist, act, lambda r: r, r)

    return jax.lax.fori_loop(0, m, fwd, r)


def lbfgs_step(
    x: jnp.ndarray,
    st: TorchLBFGSState,
    value_and_grad_fn: Callable,
    *,
    lr: float,
    max_iter: int,
    max_eval: int,
    tolerance_grad: float,
    tolerance_change: float,
    direction: str = "compact",
):
    """One ``optimizer.step(closure)`` worth of fixed-step L-BFGS.

    Mirrors torch/optim/lbfgs.py step() with ``line_search_fn=None``:
    evaluates the closure once up front (the eval torch pays on every step
    entry), then iterates until a break condition fires.  Returns
    ``(x, state)``.

    ``direction='compact'`` (default) computes the search direction through
    the compact representation (:mod:`._lbfgs_compact`) — identical math to
    the two-loop recursion but latency-free on TPU; ``'two_loop'`` keeps the
    sequential recursion (torch's exact summation order).
    """
    loss0, grad0 = value_and_grad_fn(x)
    init_opt = jnp.max(jnp.abs(grad0)) <= tolerance_grad

    def cond(c):
        x, loss, grad, st, n_iter, evals, done = c
        return jnp.logical_and(n_iter < max_iter, ~done)

    def body(c):
        x, loss, grad, st, n_iter, evals, done = c
        n_iter = n_iter + 1
        n_total = st.n_total + 1
        first = n_total == 1

        def first_dir(st):
            return (
                -grad,
                st._replace(
                    hist=jnp.zeros((), jnp.int32),
                    head=jnp.zeros((), jnp.int32),
                    h_diag=jnp.ones((), st.h_diag.dtype),
                ),
            )

        def lbfgs_dir(st):
            y = grad - st.prev_grad
            s = st.d * st.t
            ys = _vdot(y, s)
            upd = ys > CURVATURE_EPS
            m = st.ybuf.shape[0]
            ht = st.ybuf.dtype  # may be narrower (history_dtype; init_state)
            ybuf = st.ybuf.at[st.head].set(
                jnp.where(upd, y.astype(ht), st.ybuf[st.head]))
            sbuf = st.sbuf.at[st.head].set(
                jnp.where(upd, s.astype(ht), st.sbuf[st.head]))
            rho = st.rho.at[st.head].set(
                jnp.where(upd, 1.0 / ys, st.rho[st.head])
            )
            head = jnp.where(upd, (st.head + 1) % m, st.head)
            hist = jnp.where(upd, jnp.minimum(st.hist + 1, m), st.hist)
            h_diag = jnp.where(upd, ys / _vdot(y, y), st.h_diag)
            if direction == "compact":
                gram = jnp.where(
                    upd,
                    gram_insert(st.gram, sbuf, ybuf, st.head, s, y),
                    st.gram,
                )
                perm = (head - hist + jnp.arange(m, dtype=jnp.int32)) % m
                valid = jnp.arange(m) < hist
                d = compact_direction(
                    -grad, sbuf, ybuf, rho, gram, perm, valid, h_diag
                )
            else:
                gram = st.gram
                d = _two_loop(grad, ybuf, sbuf, rho, hist, head, h_diag)
            return d, st._replace(
                ybuf=ybuf, sbuf=sbuf, rho=rho, head=head, hist=hist,
                h_diag=h_diag, gram=gram,
            )

        d, st = jax.lax.cond(first, first_dir, lbfgs_dir, st)
        st = st._replace(prev_grad=grad, prev_loss=loss, n_total=n_total)

        t = jnp.where(
            first,
            jnp.minimum(1.0, 1.0 / jnp.sum(jnp.abs(grad))) * lr,
            jnp.asarray(lr, loss.dtype),
        ).astype(loss.dtype)
        gtd = _vdot(grad, d)
        # directional derivative below tolerance: break BEFORE moving
        no_move = gtd > -tolerance_change

        x_new = jnp.where(no_move, x, x + t * d)
        do_eval = jnp.logical_and(~no_move, n_iter != max_iter)

        loss_new, grad_new = jax.lax.cond(
            do_eval,
            lambda: value_and_grad_fn(x_new),
            lambda: (loss, grad),
        )
        evals = evals + jnp.where(do_eval, 1, 0)
        opt_cond = jnp.logical_and(
            do_eval, jnp.max(jnp.abs(grad_new)) <= tolerance_grad
        )
        done = (
            no_move
            | (n_iter == max_iter)
            | (evals >= max_eval)
            | opt_cond
            | (jnp.max(jnp.abs(d * t)) <= tolerance_change)
            | (jnp.abs(loss_new - st.prev_loss) < tolerance_change)
        )
        st = st._replace(d=d, t=t)
        return (x_new, loss_new, grad_new, st, n_iter, evals, done)

    x, _, _, st, _, _, _ = jax.lax.while_loop(
        cond,
        body,
        (x, loss0, grad0, st, jnp.zeros((), jnp.int32),
         jnp.ones((), jnp.int32), init_opt),
    )
    return x, st
