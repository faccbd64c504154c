"""Compact-representation L-BFGS direction (Byrd-Nocedal-Schnabel).

The classic two-loop recursion (reference behavior: torch/optim/lbfgs.py,
driven from /root/reference/torch_specinv/methods.py:543) is ``2m``
*sequential* (dot, axpy) stages, each streaming an ``(n,)`` history row from
HBM.  On TPU that is launch/latency bound: ~30 us per stage measured, i.e.
~6 ms per inner iteration at torch's default ``history_size=100`` on a
220k-sample waveform, vs ~0.2 ms for the actual closure eval
(scripts/exp_lbfgs.py).

The recursion is *algebraically equivalent* to two m x m triangular solves
plus a handful of (m, n) matvecs [Byrd, Nocedal & Schnabel, "Representations
of quasi-Newton matrices", Math. Prog. 63 (1994)].  With
``A = S Y^T`` (A_ij = s_i . y_j, i/j in oldest->newest order), the
first loop's coefficients solve the upper-triangular system

    (strictU(A) + diag(1/rho)) a = S u

the initial vector is ``r0 = gamma (u - a^T Y)``, the second loop's
coefficients solve the lower-triangular system

    (strictL(A^T) + diag(1/rho)) b = Y r0 + strictL(A^T) a

and the direction is ``d = r0 + (a - b)^T S``.  The matvecs ride HBM at full
bandwidth and the m x m solves live on-chip — ~5x faster than the scan at
history 100, *exact* math (same recurrences, different summation order), not
an approximation.  ``A`` is maintained incrementally: inserting a pair
(s, y) refreshes one row (``Y s``) and one column (``S y``) — two matvecs.

Used by both L-BFGS paths: the torch-trajectory fixed-step loop
(:mod:`._lbfgs_torch`, ``direction='compact'``) and the strong-Wolfe path via
:func:`scale_by_compact_lbfgs`, a drop-in for ``optax.scale_by_lbfgs`` with
identical update semantics (same memory indexing, zero-curvature guard, and
gamma scaling) composed with optax's zoom line search.
"""
from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp
import optax
from jax.scipy.linalg import solve_triangular


def tree_matvec(stacked, vec):
    """``(m, *leaf)`` stacked tree  x  tree  ->  (m,) dots.

    When the history is stored narrower than the vector (opt-in
    ``history_dtype='bfloat16'``), products accumulate in the VECTOR's
    dtype (f32 accumulate over bf16 rows — the MXU's native mixed mode);
    the equal-dtype path keeps the original op order bit-for-bit."""

    def mv(s, v):
        if s.dtype == v.dtype:
            return jnp.einsum("i...,...->i", s, v.astype(s.dtype))
        return jnp.einsum("i...,...->i", s, v,
                          preferred_element_type=v.dtype)

    parts = jax.tree.leaves(jax.tree.map(mv, stacked, vec))
    out = parts[0]
    for p in parts[1:]:
        out = out + p
    return out


def tree_weighted_rows(stacked, w, like=None):
    """``sum_i w_i * stacked[i]`` -> tree shaped like one row.

    ``like`` (a tree matching one row) sets the accumulation dtype per
    leaf when the history rows are stored narrower (bf16 rows, f32
    accumulate); without it — or when dtypes already match — the original
    op order is kept bit-for-bit."""

    def wr(s, ref=None):
        dt = s.dtype if ref is None else ref.dtype
        if s.dtype == dt:
            return jnp.tensordot(w.astype(s.dtype), s, axes=1)
        return jnp.tensordot(w.astype(dt), s, axes=1,
                             preferred_element_type=dt)

    if like is None:
        return jax.tree.map(wr, stacked)
    return jax.tree.map(wr, stacked, like)


def compact_direction(u, sbuf, ybuf, rho, gram, perm, valid, gamma):
    """Exact two-loop-recursion result via the compact representation.

    Args:
      u: input tree (``-grad`` for the torch path, ``+grad`` for optax).
      sbuf / ybuf: ``(m, *leaf)`` stacked history (physical slot order).
      rho: ``(m,)`` curvature weights ``1/(s.y)`` (0 marks an unusable slot).
      gram: ``(m, m)`` physical-order ``A = S Y^T`` kept incrementally via
        :func:`gram_insert`.
      perm: ``(m,)`` int32, physical slot of logical position i (0 = oldest).
      valid: ``(m,)`` bool in *logical* order.
      gamma: initial inverse-Hessian scale.

    Returns the tree ``H u`` (same semantics as the sequential recursion).
    """
    m = rho.shape[0]
    dt = rho.dtype
    a_log = gram[perm][:, perm].astype(dt)
    rho_log = rho[perm]
    cross = valid[:, None] & valid[None, :]
    iota = jnp.arange(m)
    upper = iota[:, None] < iota[None, :]
    diag = jnp.where(valid, 1.0 / jnp.where(valid, rho_log, 1.0), 1.0)
    r_mat = jnp.where(upper & cross, a_log, 0.0) + jnp.diag(diag)
    strict_l = jnp.where(upper.T & cross, a_log.T, 0.0)
    l_mat = strict_l + jnp.diag(diag)

    su = tree_matvec(sbuf, u).astype(dt)
    su_log = jnp.where(valid, su[perm], 0.0)
    alpha = solve_triangular(r_mat, su_log, lower=False)

    inv_perm = jnp.zeros((m,), jnp.int32).at[perm].set(iota.astype(jnp.int32))
    alpha_phys = alpha[inv_perm]
    q = jax.tree.map(
        lambda uu, ay: uu - ay.astype(uu.dtype),
        u,
        tree_weighted_rows(ybuf, alpha_phys, like=u),
    )
    r0 = jax.tree.map(lambda qq: gamma.astype(qq.dtype) * qq, q)

    yr0 = tree_matvec(ybuf, r0).astype(dt)
    rhs = jnp.where(valid, yr0[perm], 0.0) + strict_l @ alpha
    beta = solve_triangular(l_mat, rhs, lower=True)

    c_phys = (alpha - beta)[inv_perm]
    return jax.tree.map(
        lambda rr, cs: rr + cs.astype(rr.dtype),
        r0,
        tree_weighted_rows(sbuf, c_phys, like=r0),
    )


def gram_insert(gram, sbuf, ybuf, slot, s_new, y_new):
    """Refresh ``A = S Y^T`` after writing pair (s, y) at physical ``slot``.

    ``sbuf``/``ybuf`` must already contain the new pair.  Two matvecs: the
    slot's row ``s_new . y_j`` and column ``s_j . y_new``.
    """
    row = tree_matvec(ybuf, s_new).astype(gram.dtype)   # s_new . y_j
    col = tree_matvec(sbuf, y_new).astype(gram.dtype)   # s_j . y_new
    gram = gram.at[slot, :].set(row)
    return gram.at[:, slot].set(col)


class ScaleByCompactLBFGSState(NamedTuple):
    count: jnp.ndarray
    params: optax.Params
    updates: optax.Updates
    diff_params_memory: optax.Updates
    diff_updates_memory: optax.Updates
    weights_memory: jnp.ndarray
    gram: jnp.ndarray


def scale_by_compact_lbfgs(
    memory_size: int = 10, scale_init_precond: bool = True,
    memory_dtype=None,
):
    """Drop-in for ``optax.scale_by_lbfgs`` computing the identical
    preconditioned updates through the compact representation.

    Mirrors optax's semantics exactly for REAL parameter trees: memory
    written at ``(count-1) % m``, ``weight = 1/(s.y)`` guarded only against
    exact zero, zero-filled slots inert, gamma from the newest pair (first
    step: capped inverse grad norm).  Complex parameters (which
    ``optax.lbfgs`` supports via conjugating vdots) are rejected rather than
    silently mis-preconditioned — use optax's transform for those.

    ``memory_dtype`` (opt-in, e.g. ``jnp.bfloat16``) stores the s/y memory
    narrower than the parameters, halving the matvec HBM traffic; dots
    still accumulate in the parameter dtype.  Approximate — no longer
    bit-matches ``optax.scale_by_lbfgs``.
    """

    def init_fn(params):
        for leaf in jax.tree.leaves(params):
            if jnp.iscomplexobj(leaf):
                raise TypeError(
                    "scale_by_compact_lbfgs supports real parameters only; "
                    "use optax.scale_by_lbfgs for complex trees"
                )
        stacked = jax.tree.map(
            lambda leaf: jnp.zeros(
                (memory_size,) + leaf.shape,
                leaf.dtype if memory_dtype is None else jnp.dtype(
                    memory_dtype),
            ),
            params,
        )
        return ScaleByCompactLBFGSState(
            count=jnp.asarray(0, jnp.int32),
            params=optax.tree.zeros_like(params),
            updates=optax.tree.zeros_like(params),
            diff_params_memory=stacked,
            diff_updates_memory=jax.tree.map(jnp.copy, stacked),
            weights_memory=jnp.zeros(memory_size),
            gram=jnp.zeros((memory_size, memory_size)),
        )

    def update_fn(updates, state, params):
        m = memory_size
        prev_idx = (state.count - 1) % m
        diff_params = optax.tree.sub(params, state.params)
        diff_updates = optax.tree.sub(updates, state.updates)
        vdot = optax.tree.real(optax.tree.vdot(diff_updates, diff_params))
        weight = jnp.where(vdot == 0.0, 0.0, 1.0 / vdot)
        diff_params, diff_updates, weight = jax.tree.map(
            lambda x: jnp.where(state.count > 0, x, jnp.zeros_like(x)),
            (diff_params, diff_updates, weight),
        )
        dpm, dum, wm = jax.tree.map(
            lambda x, y: x.at[prev_idx].set(jnp.asarray(y, x.dtype)),
            (
                state.diff_params_memory,
                state.diff_updates_memory,
                state.weights_memory,
            ),
            (diff_params, diff_updates, weight),
        )
        gram = gram_insert(state.gram, dpm, dum, prev_idx, diff_params,
                           diff_updates)

        if scale_init_precond:
            denom = optax.tree.norm(diff_updates, squared=True)
            identity_scale = jnp.where(denom > 0.0, vdot / denom, 1.0)
            update_norm = optax.tree.norm(jax.lax.stop_gradient(updates))
            capped = jnp.minimum(1.0, 1.0 / update_norm)
            identity_scale = jnp.where(state.count > 0, identity_scale, capped)
        else:
            identity_scale = jnp.asarray(1.0)

        memory_idx = state.count % m
        perm = ((memory_idx + jnp.arange(m)) % m).astype(jnp.int32)
        valid = wm[perm] != 0.0
        precond = compact_direction(
            updates, dpm, dum, wm, gram, perm, valid,
            jnp.asarray(identity_scale),
        )
        return precond, ScaleByCompactLBFGSState(
            count=state.count + 1,
            params=params,
            updates=updates,
            diff_params_memory=dpm,
            diff_updates_memory=dum,
            weights_memory=wm,
            gram=gram,
        )

    return optax.GradientTransformation(init_fn, update_fn)


def compact_lbfgs_optimizer(
    memory_size: int, max_linesearch_steps: int = 20, memory_dtype=None
):
    """``optax.lbfgs(memory_size=...)`` with the compact-representation
    preconditioner (same chain: precondition -> scale(-1) -> zoom)."""
    return optax.chain(
        scale_by_compact_lbfgs(memory_size=memory_size,
                               memory_dtype=memory_dtype),
        optax.scale(-1.0),
        optax.scale_by_zoom_linesearch(
            max_linesearch_steps=max_linesearch_steps,
            initial_guess_strategy="one",
        ),
    )
