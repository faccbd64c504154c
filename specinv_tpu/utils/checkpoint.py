"""Checkpoint / resume for long inversion runs.

The reference keeps algorithm state in a transient ``status_dict`` of tensors
(/root/reference/torch_specinv/methods.py:252-255, 485-490) that is never
serialized.  Here every algorithm's state is a small pytree
(:class:`~specinv_tpu.models.griffin_lim.GLState`,
:class:`~specinv_tpu.models.admm.ADMMState`,
:class:`~specinv_tpu.models.rtisi_la.RTISIState`), so long batched runs can
snapshot and resume:

    state = gl.init(...)
    for chunk in range(10):
        state = jax.lax.fori_loop(0, 100, step, state)
        save_state(f"ckpt_{chunk}.npz", state)

Orbax is the natural store for large sharded states; for the small per-clip
states here a plain ``.npz`` round trip is dependency-free and portable.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def save_state(path: str, state) -> None:
    """Serialize any pytree of arrays to ``path`` (.npz); the tree structure
    is supplied at load time by a template (``load_state``'s ``like``)."""
    leaves, _ = jax.tree_util.tree_flatten(state)
    np.savez(path, **{f"leaf_{i}": np.asarray(leaf) for i, leaf in enumerate(leaves)})


def load_state(path: str, like):
    """Restore a pytree saved by :func:`save_state`.

    ``like`` supplies the pytree structure (e.g. a freshly-initialized state);
    leaf values are replaced by the stored arrays.
    """
    with np.load(path) as data:
        leaves = [
            jnp.asarray(data[f"leaf_{i}"])
            for i in range(len([k for k in data.files if k.startswith("leaf_")]))
        ]
    treedef = jax.tree_util.tree_structure(like)
    if treedef.num_leaves != len(leaves):
        raise ValueError(
            f"checkpoint has {len(leaves)} leaves, state template has "
            f"{treedef.num_leaves}"
        )
    return jax.tree_util.tree_unflatten(treedef, leaves)
