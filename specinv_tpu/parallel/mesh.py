"""Mesh construction helpers.

The reference is single-device (no torch.distributed anywhere — SURVEY.md
§2.3); here scaling is native: a ``jax.sharding.Mesh`` with a ``data`` axis
(batch-parallel inversion — embarrassingly parallel, zero communication) and
an optional ``seq`` axis (time-frame sequence parallelism for very long
clips — OLA halo exchange over ICI, see :mod:`specinv_tpu.parallel.seq`).
"""
from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    data: Optional[int] = None,
    seq: int = 1,
    devices: Optional[Sequence] = None,
) -> Mesh:
    """Build a ``(data, seq)`` mesh over the available devices.

    ``data`` defaults to ``len(devices) // seq``.  The ``seq`` axis should map
    to directly-connected neighbors (ICI) — on a real slice, keep it the
    innermost axis, which is what this layout does.
    """
    if devices is None:
        devices = jax.devices()
    n = len(devices)
    if data is None:
        if n % seq:
            raise ValueError(f"{n} devices not divisible by seq={seq}")
        data = n // seq
    if data * seq > n:
        raise ValueError(f"mesh {data}x{seq} needs {data * seq} devices, have {n}")
    arr = np.asarray(devices[: data * seq]).reshape(data, seq)
    return Mesh(arr, ("data", "seq"))


def batch_sharding(mesh: Mesh, ndim: int, axis_name: str = "data") -> NamedSharding:
    """NamedSharding placing the leading (batch) axis on ``axis_name``."""
    return NamedSharding(mesh, P(axis_name, *([None] * (ndim - 1))))


def shard_batch(x, mesh: Mesh, axis_name: str = "data"):
    """Device-put an array with its batch axis sharded over the mesh."""
    return jax.device_put(x, batch_sharding(mesh, x.ndim, axis_name))
