"""Batch (data-parallel) sharded inversion.

Spectrogram inversion is embarrassingly parallel across clips: there is no
cross-clip dependency in any algorithm, so DP is pure placement — shard the
batch axis over the mesh's ``data`` axis and jit the existing run functions.
XLA/GSPMD propagates the sharding through the whole on-device loop; the only
collective it inserts is the psum behind the stop-criterion's global mean
loss.  This mirrors the design in SURVEY.md §2.3: "batch-sharded inversion
needs zero communication".
"""
from __future__ import annotations

from typing import Callable

from jax.sharding import Mesh

from ..models.common import as_array
from .mesh import shard_batch


def batched(fn: Callable, mesh: Mesh, axis_name: str = "data") -> Callable:
    """Wrap a public algorithm entry point to run batch-sharded over ``mesh``.

    Example::

        gl = batched(specinv_tpu.griffin_lim, mesh)
        waves = gl(specs_bft, max_iter=100, tol=0.0, verbose=False)
    """

    def wrapper(spec, *args, **kwargs):
        spec = as_array(spec)
        if spec.ndim != 3:
            raise ValueError(
                f"batched inversion needs a (B, F, T) spectrogram; got rank {spec.ndim}"
            )
        # GSPMD partitions the XLA paths across the mesh automatically; the
        # Pallas kernel has no sharding rule, so pin an XLA lowering on
        # accelerators (on CPU 'auto' already resolves to fft).
        import jax

        if jax.default_backend() != "cpu":
            kwargs.setdefault("backend", "matmul")
        spec = shard_batch(spec, mesh, axis_name)
        return fn(spec, *args, **kwargs)

    return wrapper
