"""L-BFGS inversion of arbitrary differentiable spectral transforms.

Reference: ``L_BFGS`` at /root/reference/torch_specinv/methods.py:509-569 —
wraps ``torch.optim.LBFGS`` over a waveform parameter, minimizing
``MSE(transform_fn(x), spec)`` for any differentiable ``transform_fn``
(e.g. a log-mel frontend), driven by the shared outer loop.

TPU-native design: ``jax.value_and_grad`` through the user transform +
``optax.lbfgs`` (two-loop recursion with strong-Wolfe zoom line search) with
both the inner optimizer loop and the outer early-stop loop living on-device
inside ``lax`` loops — zero host syncs.

Hyperparameter mapping from ``torch.optim.LBFGS`` (the reference forwards its
kwargs raw at methods.py:543; demo values at main.py:43):

  * ``lr``               -> fixed step size when ``line_search_fn is None``
                            (torch semantics); initial zoom step under search
  * ``max_iter``         -> inner L-BFGS iterations per outer step (default 20)
  * ``max_eval``         -> inner closure-eval budget (default max_iter*5//4)
  * ``tolerance_grad``   -> grad-infinity-norm stop (default 1e-7)
  * ``tolerance_change`` -> step/loss-delta stop (default 1e-9)
  * ``history_size``     -> two-loop memory (default 100)
  * ``line_search_fn``   -> ``None`` (fixed step) or ``'strong_wolfe'`` (zoom)

The fixed-step path is trajectory-exact against torch (see
:mod:`._lbfgs_torch`); the strong-Wolfe path uses optax's zoom line search
(a different but equivalent-strength search than torch's cubic
interpolation), with the same termination criteria applied per inner
iteration and ``max_eval`` enforced as an iteration cap (each zoom iteration
costs at least one closure eval).

Like the reference (which returns ``x.detach()``), the result is not
differentiated through the optimization trajectory.
"""
from __future__ import annotations

from functools import partial
from typing import Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from ..utils.runner import _mse, iterate
from ._lbfgs_torch import init_state, lbfgs_step
from .common import as_array


@partial(
    jax.jit,
    static_argnames=(
        "transform_fn",
        "outer_max_iter",
        "inner_max_iter",
        "history_size",
        "line_search",
        "lr",
        "max_eval",
        "tolerance_grad",
        "tolerance_change",
        "eva_iter",
        "metric",
        "verbose",
        "mode",
        "direction",
        "history_dtype",
    ),
)
def run(
    target: jnp.ndarray,
    x0: jnp.ndarray,
    tol: jnp.ndarray,
    transform_fn: Callable,
    outer_max_iter: int = 1000,
    inner_max_iter: int = 20,
    history_size: int = 100,
    line_search: bool = True,
    lr: float = 1.0,
    max_eval: int = 25,
    tolerance_grad: float = 1e-7,
    tolerance_change: float = 1e-9,
    eva_iter: int = 10,
    metric: str = "sc",
    verbose: bool = False,
    mode: str = "fori",
    direction: str = "compact",
    history_dtype: str | None = None,
) -> jnp.ndarray:
    def loss_fn(x):
        return _mse(transform_fn(x), target)

    if line_search:
        if direction == "compact":
            from ._lbfgs_compact import compact_lbfgs_optimizer

            opt = compact_lbfgs_optimizer(memory_size=history_size,
                                          memory_dtype=history_dtype)
        else:
            opt = optax.lbfgs(memory_size=history_size)
        # Reuse the value/grad the zoom line search already computed.
        value_and_grad = optax.value_and_grad_from_state(loss_fn)

        def inner_cond(carry):
            _, _, _, k, done = carry
            return jnp.logical_and(k < min(inner_max_iter, max_eval), ~done)

        def inner_step(carry):
            x, opt_state, prev_loss, k, done = carry
            value, grad = value_and_grad(x, state=opt_state)
            updates, opt_state = opt.update(
                grad, opt_state, x, value=value, grad=grad, value_fn=loss_fn
            )
            done = (
                (jnp.max(jnp.abs(grad)) <= tolerance_grad)
                | (jnp.max(jnp.abs(updates)) <= tolerance_change)
                | (jnp.abs(value - prev_loss) < tolerance_change)
            )
            return (
                optax.apply_updates(x, updates), opt_state, value,
                k + 1, done,
            )

        def outer_step(state):
            x, opt_state = state
            x, opt_state, _, _, _ = jax.lax.while_loop(
                inner_cond,
                inner_step,
                (x, opt_state, jnp.asarray(jnp.inf, x0.dtype),
                 jnp.zeros((), jnp.int32), jnp.zeros((), bool)),
            )
            return (x, opt_state), transform_fn(x)

        state = (x0, opt.init(x0))
    else:
        plain_vg = jax.value_and_grad(loss_fn)

        def outer_step(state):
            x, st = state
            x, st = lbfgs_step(
                x, st, plain_vg, lr=lr, max_iter=inner_max_iter,
                max_eval=max_eval, tolerance_grad=tolerance_grad,
                tolerance_change=tolerance_change, direction=direction,
            )
            return (x, st), transform_fn(x)

        state = (x0, init_state(x0, history_size,
                                history_dtype=history_dtype))

    state = iterate(
        outer_step,
        state,
        target,
        max_iter=outer_max_iter,
        tol=tol,
        eva_iter=eva_iter,
        metric=metric,
        verbose=verbose,
        mode=mode,
    )
    return state[0]


def L_BFGS(
    spec,
    transform_fn: Callable,
    samples: Optional[Sequence[int]] = None,
    init_x0=None,
    outer_max_iter: int = 1000,
    tol: float = 1e-6,
    verbose: bool = True,
    eva_iter: int = 10,
    metric: str = "sc",
    mode: str = "fori",
    seed: int = 0,
    lr: float = 1.0,
    max_iter: int = 20,
    max_eval: Optional[int] = None,
    tolerance_grad: float = 1e-7,
    tolerance_change: float = 1e-9,
    history_size: int = 100,
    line_search_fn: Optional[str] = None,
    direction: str = "auto",
    history_dtype: Optional[str] = None,
):
    """Reference-parity entry point (methods.py:509-569).

    ``transform_fn`` must be a JAX-traceable function mapping a waveform of
    shape ``samples`` to a representation comparable with ``spec``.  When
    ``init_x0`` is absent the waveform is initialized from
    ``N(0, 1e-6)`` using ``seed`` (the reference uses torch's global RNG).

    ``outer_max_iter`` counts outer driver steps (reference methods.py:509);
    the optimizer kwargs (``lr`` .. ``line_search_fn``) carry
    ``torch.optim.LBFGS`` semantics — ``max_iter`` is the INNER iteration
    count per outer step (torch default 20) and ``max_eval`` defaults to
    ``max_iter * 5 // 4``, both exactly as the reference's raw kwarg
    forwarding at methods.py:543 yields.  The fixed-step path
    (``line_search_fn=None``) is trajectory-exact against torch, including
    all termination criteria.  Unknown kwargs raise ``TypeError``, as
    torch's constructor would.

    ``direction`` (TPU extension, not a torch kwarg): ``'compact'`` computes
    search directions via the compact representation — identical math to the
    two-loop recursion, ~5x faster at torch's default ``history_size=100``
    on TPU (see :mod:`._lbfgs_compact`); ``'two_loop'`` keeps the sequential
    recursion (torch's exact floating-point summation order); ``'auto'``
    (default) resolves to ``'compact'``.

    ``history_dtype`` (TPU extension, opt-in): ``'bfloat16'`` stores the
    (history_size, n) s/y rows in bf16 while accumulating every dot in the
    waveform dtype — the compact direction is HBM-bandwidth-bound at
    torch's default history 100 (benchmarks.md L-BFGS bandwidth table), so
    this halves its streaming cost.  Approximate: the trajectory is no
    longer torch-exact (quality pinned in tests/test_lbfgs.py); requires
    ``direction='compact'``.  ``None`` (default) keeps full precision.
    """
    target = as_array(spec)
    if init_x0 is None:
        if samples is None:
            raise ValueError("provide either init_x0 or samples")
        if isinstance(samples, int):
            samples = (samples,)
        key = jax.random.PRNGKey(seed)
        init_x0 = (
            jax.random.normal(key, tuple(samples), dtype=target.dtype) * 1e-6
        )
    else:
        init_x0 = as_array(init_x0)

    if line_search_fn not in (None, "strong_wolfe"):
        raise ValueError(f"unsupported line_search_fn {line_search_fn!r}")
    if direction not in ("auto", "compact", "two_loop"):
        raise ValueError(f"unsupported direction {direction!r}")
    if direction == "auto":
        direction = "compact"
    if history_dtype is not None:
        if direction != "compact":
            raise ValueError(
                "history_dtype requires direction='compact' (the two-loop "
                "recursion keeps torch's exact summation order)"
            )
        history_dtype = str(jnp.dtype(history_dtype))  # validate + hashable
    if max_eval is None:
        max_eval = max_iter * 5 // 4  # torch.optim.LBFGS default

    return run(
        target,
        init_x0,
        jnp.asarray(tol, dtype=jnp.zeros((), target.dtype).real.dtype),
        transform_fn,
        outer_max_iter=outer_max_iter,
        inner_max_iter=max_iter,
        history_size=history_size,
        line_search=line_search_fn == "strong_wolfe",
        lr=lr,
        max_eval=max_eval,
        tolerance_grad=tolerance_grad,
        tolerance_change=tolerance_change,
        eva_iter=eva_iter,
        metric=metric,
        verbose=verbose,
        mode=mode,
        direction=direction,
        history_dtype=history_dtype,
    )


l_bfgs = L_BFGS
