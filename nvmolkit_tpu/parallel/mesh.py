"""Mesh helpers for data-parallel molecule sweeps.

The workloads are embarrassingly parallel over molecules/pairs; the only
cross-device op the reference performs is result gathering
(``src/utils/p2p.h:26-76``, SURVEY.md §5.8). We map that to a 1-D device
mesh with a ``"mols"`` axis and row-sharded arrays.
"""
from __future__ import annotations

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

MOL_AXIS = "mols"


def data_parallel_mesh(devices: list | None = None) -> Mesh:
    """1-D mesh over all (or given) devices with a single 'mols' axis."""
    if devices is None:
        devices = jax.devices()
    return Mesh(np.asarray(devices), (MOL_AXIS,))


def shard_rows(x: jax.Array | np.ndarray, mesh: Mesh) -> jax.Array:
    """Shard the leading axis of ``x`` across the mesh's 'mols' axis.

    The leading dimension must be divisible by the mesh size (callers pad
    batches to a multiple of the device count first).
    """
    spec = P(MOL_AXIS, *([None] * (np.ndim(x) - 1)))
    return jax.device_put(x, NamedSharding(mesh, spec))


def replicate(x: jax.Array | np.ndarray, mesh: Mesh) -> jax.Array:
    """Replicate ``x`` on every device of the mesh."""
    return jax.device_put(x, NamedSharding(mesh, P()))


def pad_to_multiple(n: int, multiple: int) -> int:
    return ((n + multiple - 1) // multiple) * multiple


def shard_batch_pytree(pytree, mesh: Mesh, batch_size: int):
    """Shard every leaf whose leading dim equals ``batch_size`` over the
    'mols' axis; replicate the rest.

    Handles the force-field batch pytrees (UFFBatch/MMFFBatch), whose
    fused one-hot tensors carry a leading arity axis of 4 followed by
    the system axis.
    """
    import jax

    def place(leaf):
        if not hasattr(leaf, "shape") or leaf.ndim == 0:
            return leaf
        if leaf.shape[0] == batch_size:
            spec = P(MOL_AXIS, *([None] * (leaf.ndim - 1)))
        elif leaf.ndim >= 2 and leaf.shape[0] == 4 and leaf.shape[1] == batch_size:
            spec = P(None, MOL_AXIS, *([None] * (leaf.ndim - 2)))
        else:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(place, pytree)
