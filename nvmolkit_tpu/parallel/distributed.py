"""Multi-chip execution of the batch pipelines.

The reference's multi-GPU story is round-robin batch assignment over
OpenMP threads + P2P result consolidation (SURVEY.md §2.16). TPU-native:
one mesh, molecule batches sharded over the 'mols' axis, results
consolidated by XLA (outputs come back with known shardings;
``jax.device_put`` re-lays them out when a single-device array is
demanded).

These helpers are what the public APIs call when ``HardwareOptions``
names more than one device.
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import NamedSharding, PartitionSpec as P

from nvmolkit_tpu.parallel.mesh import MOL_AXIS, data_parallel_mesh, shard_batch_pytree


def resolve_devices(device_ids: list[int]):
    """deviceIds -> device list (empty/[-1] = all)."""
    devs = jax.devices()
    if not device_ids:
        return devs
    try:
        return [devs[i] for i in device_ids]
    except IndexError as e:
        raise ValueError(
            f"deviceIds {device_ids} out of range for {len(devs)} devices"
        ) from e


def pad_rows(x: np.ndarray, multiple: int):
    """Pad the leading axis to a multiple; returns (padded, n_orig)."""
    n = x.shape[0]
    target = ((n + multiple - 1) // multiple) * multiple
    if target == n:
        return x, n
    pad = np.zeros((target - n,) + x.shape[1:], dtype=x.dtype)
    return np.concatenate([x, pad]), n


def distributed_cross_similarity(
    fps_a: np.ndarray,
    fps_b: np.ndarray,
    devices,
    metric: str = "tanimoto",
) -> jax.Array:
    """Row-shard A over the mesh, replicate B; [n, m] result row-sharded."""
    from nvmolkit_tpu.ops.similarity import cross_similarity

    mesh = data_parallel_mesh(devices)
    n_dev = len(devices)
    a_pad, n = pad_rows(np.asarray(fps_a), n_dev)
    a_sh = jax.device_put(a_pad, NamedSharding(mesh, P(MOL_AXIS, None)))
    b_rep = jax.device_put(np.asarray(fps_b), NamedSharding(mesh, P()))
    sim = cross_similarity(a_sh, b_rep, metric=metric)
    return sim[:n]


def distributed_minimize(
    energy_and_grad_fn,
    batch,
    positions: np.ndarray,  # [S, A, 3]
    atom_mask,
    devices,
    max_iters: int = 200,
    grad_tol: float = 1e-4,
):
    """Shard a force-field batch over the mesh and minimize.

    S must be a multiple of the device count (drivers pad with copies of
    system 0 and slice the result).
    """
    from nvmolkit_tpu.ops.bfgs import batched_bfgs_minimize

    mesh = data_parallel_mesh(devices)
    S = positions.shape[0]
    if S % len(devices):
        raise ValueError(f"S={S} not divisible by {len(devices)} devices")
    batch_sh = shard_batch_pytree(batch, mesh, S)
    pos_sh = jax.device_put(
        positions, NamedSharding(mesh, P(MOL_AXIS, None, None))
    )
    return batched_bfgs_minimize(
        energy_and_grad_fn, pos_sh, batch_sh.atom_mask,
        max_iters=max_iters, grad_tol=grad_tol, energy_args=batch_sh,
    )


def shard_rows_pytree(tree, devices, n_rows: int):
    """device_put every array leaf whose leading axis == n_rows with a
    row sharding over the 'mols' mesh axis (other leaves replicated).
    n_rows must be divisible by len(devices)."""
    mesh = data_parallel_mesh(devices)

    def put(leaf):
        if not hasattr(leaf, "shape") or getattr(leaf, "ndim", 0) == 0:
            return leaf
        if leaf.shape[0] == n_rows:
            spec = P(MOL_AXIS, *([None] * (leaf.ndim - 1)))
        else:
            spec = P()
        return jax.device_put(leaf, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, tree)


def pad_multiple(n: int, k: int) -> int:
    """Smallest multiple of k that is >= n."""
    return ((n + k - 1) // k) * k
