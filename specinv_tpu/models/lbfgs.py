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

  * ``lr``             -> fixed step size when ``line_search_fn is None``
                          (torch semantics); ignored under line search
  * ``max_iter``       -> inner L-BFGS iterations per outer step (default 20)
  * ``history_size``   -> ``memory_size`` (default 100)
  * ``line_search_fn`` -> ``None`` (fixed step) or ``'strong_wolfe'`` (zoom)

Like the reference (which returns ``x.detach()``), the result is not
differentiated through the optimization trajectory.
"""
from __future__ import annotations

from functools import partial
from typing import Any, Callable, Optional, Sequence

import jax
import jax.numpy as jnp
import optax

from ..utils.runner import _mse, iterate
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
        "eva_iter",
        "metric",
        "verbose",
        "mode",
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
    eva_iter: int = 10,
    metric: str = "sc",
    verbose: bool = False,
    mode: str = "fori",
) -> jnp.ndarray:
    def loss_fn(x):
        return _mse(transform_fn(x), target)

    if line_search:
        opt = optax.lbfgs(memory_size=history_size)
        # Reuse the value/grad the zoom line search already computed.
        value_and_grad = optax.value_and_grad_from_state(loss_fn)
    else:
        opt = optax.lbfgs(learning_rate=lr, memory_size=history_size, linesearch=None)
        plain_vg = jax.value_and_grad(loss_fn)
        value_and_grad = lambda x, state: plain_vg(x)  # noqa: E731

    def inner_step(_, carry):
        x, opt_state = carry
        value, grad = value_and_grad(x, state=opt_state)
        updates, opt_state = opt.update(
            grad, opt_state, x, value=value, grad=grad, value_fn=loss_fn
        )
        return optax.apply_updates(x, updates), opt_state

    def outer_step(state):
        x, opt_state = state
        x, opt_state = jax.lax.fori_loop(
            0, inner_max_iter, inner_step, (x, opt_state)
        )
        return (x, opt_state), transform_fn(x)

    state = (x0, opt.init(x0))
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
    history_size: int = 100,
    line_search_fn: Optional[str] = None,
    **_ignored: Any,
):
    """Reference-parity entry point (methods.py:509-569).

    ``transform_fn`` must be a JAX-traceable function mapping a waveform of
    shape ``samples`` to a representation comparable with ``spec``.  When
    ``init_x0`` is absent the waveform is initialized from
    ``N(0, 1e-6)`` using ``seed`` (the reference uses torch's global RNG).
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
        eva_iter=eva_iter,
        metric=metric,
        verbose=verbose,
        mode=mode,
    )


l_bfgs = L_BFGS
