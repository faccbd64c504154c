"""Batch (data-parallel) sharded inversion.

Spectrogram inversion is embarrassingly parallel across clips: there is no
cross-clip dependency in any algorithm, so DP is pure placement — shard the
batch axis over the mesh's ``data`` axis.  This mirrors the design in
SURVEY.md §2.3: "batch-sharded inversion needs zero communication".

Two lowerings:

* ``shard_map`` (default): each shard runs the WHOLE inversion locally —
  including the fused Pallas kernels, which have no GSPMD partitioning rule
  but are trivially correct per-shard (no cross-clip dependency).  This is
  what lets BASELINE config 5 (batched-256 GL over a v5e-8 mesh) run the
  fastest single-chip path on every chip.  Early stopping under shard_map is
  per-shard (each shard's mean loss drives its own stop) — fixed-iteration
  runs (tol=0) are bitwise identical to the unsharded path.
* ``gspmd=True``: the round-1 behavior — jit with a batch NamedSharding and
  let GSPMD partition the XLA ops (Pallas excluded, so the kernel backends
  are pinned to 'matmul').  Early stopping is then global, matching the
  unsharded stop rule exactly; use it when that parity matters more than
  kernel speed.
"""
from __future__ import annotations

from typing import Callable

import jax
from jax.sharding import Mesh, PartitionSpec as P

from ..models.common import as_array
from .mesh import shard_batch


def batched(
    fn: Callable, mesh: Mesh, axis_name: str = "data", gspmd: bool = False,
    global_stop: bool = False,
) -> Callable:
    """Wrap a public algorithm entry point to run batch-sharded over ``mesh``.

    Example::

        gl = batched(specinv_tpu.griffin_lim, mesh)
        waves = gl(specs_bft, max_iter=100, tol=0.0, verbose=False)

    .. warning:: **Early stopping (tol > 0) is per-shard by default.**  Each
       shard stops on the mean loss of *its own* clips, so a tol-based run
       can execute a different number of iterations per shard than the
       unsharded call would (fixed-iteration ``tol=0`` runs are bitwise
       identical).  Pass ``global_stop=True`` to psum the stop loss across
       the ``data`` axis instead, reproducing the unsharded stop rule
       exactly while keeping the fused per-shard kernels (supported for
       ``griffin_lim``/``ADMM``; ``gspmd=True`` mode is always global).
    """

    if global_stop and not gspmd:
        import inspect

        try:
            sig_params = inspect.signature(fn).parameters
        except (TypeError, ValueError):  # builtins/partials without sigs
            sig_params = None
        if sig_params is not None and "loss_psum_axes" not in sig_params:
            raise ValueError(
                f"global_stop=True needs an entry point that accepts "
                f"loss_psum_axes (griffin_lim/ADMM); {getattr(fn, '__name__', fn)!r} "
                f"does not — its stop rule (if any) is per-shard"
            )

    def wrapper(spec, *args, **kwargs):
        if global_stop and not gspmd:
            kwargs.setdefault("loss_psum_axes", (axis_name,))
        import jax.numpy as jnp

        spec = as_array(spec)
        if spec.ndim != 3:
            raise ValueError(
                f"batched inversion needs a (B, F, T) spectrogram; got rank {spec.ndim}"
            )
        if gspmd:
            # GSPMD partitions the XLA paths across the mesh automatically;
            # the Pallas kernels have no sharding rule, so pin an XLA
            # lowering on accelerators (on CPU 'auto' already resolves to fft).
            if jax.default_backend() != "cpu":
                kwargs.setdefault("backend", "matmul")
            spec_sharded = shard_batch(spec, mesh, axis_name)
            return fn(spec_sharded, *args, **kwargs)

        n = mesh.shape[axis_name]
        B = spec.shape[0]
        # Clips are independent, so an uneven batch pads with zero-magnitude
        # clips (inert under every algorithm: eps-guarded projections, and the
        # per-shard stop rule is scale-invariant) and trims after.
        pad = (-B) % n
        if pad:
            spec = jnp.concatenate(
                [spec, jnp.zeros((pad, *spec.shape[1:]), spec.dtype)], axis=0
            )

        def body(spec_local):
            return fn(spec_local, *args, **kwargs)

        out = jax.shard_map(
            body,
            mesh=mesh,
            in_specs=(P(axis_name, *([None] * (spec.ndim - 1))),),
            out_specs=P(axis_name),  # waveforms: batch-sharded leading axis
            check_vma=False,
        )(spec)
        return out[:B] if pad else out

    return wrapper
