"""Multi-host (multi-process / DCN) execution helpers.

The reference scales past one node with MPI ranks + NCCL communicators
(``src/utils/p2p.h:26-76``; SURVEY.md §5.8). The TPU-native analog is
JAX multi-process ("multi-controller") execution: every host runs the
same program, ``jax.distributed.initialize`` wires the processes into
one runtime, and a single global :class:`jax.sharding.Mesh` spans all
chips — intra-slice traffic rides ICI, cross-slice rides DCN, with XLA
inserting the collectives.

Usage on an N-host TPU pod slice (same script on every host)::

    from nvmolkit_tpu.parallel import multihost

    multihost.initialize()                 # no-op off-pod / single host
    mesh = multihost.global_mesh()         # 1-D 'mols' mesh, all chips
    shard = multihost.local_rows(n_total)  # this host's row range
    # ... build this host's rows, then:
    x = multihost.global_array(local_rows, n_total, mesh)

The data-parallel contract matches the single-host path
(``parallel/mesh.py``): workloads shard over a leading 'mols' axis and
only gather results. On TPU pods ``initialize()`` needs no arguments —
the runtime discovers the coordinator from the TPU metadata; on CPU/GPU
clusters pass ``coordinator_address``/``num_processes``/``process_id``
(mirrors ``jax.distributed.initialize``).
"""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

from nvmolkit_tpu.parallel.mesh import MOL_AXIS

_initialized = False


def initialize(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Join the multi-process JAX runtime; returns True if distributed.

    Safe to call unconditionally: on a single host with no coordinator
    configured this is a no-op (JAX raises when auto-detection finds no
    cluster environment; that is the expected single-host case).
    Idempotent — repeat calls return the first outcome.
    """
    global _initialized
    if _initialized:
        return jax.process_count() > 1
    kwargs = {}
    if coordinator_address is not None:
        kwargs["coordinator_address"] = coordinator_address
    if num_processes is not None:
        kwargs["num_processes"] = num_processes
    if process_id is not None:
        kwargs["process_id"] = process_id
    # NOTE: jax.distributed.initialize must run before ANY backend use
    # (even jax.process_count() initializes the single-process backend
    # and poisons a later distributed init) — so probe nothing first.
    try:
        jax.distributed.initialize(**kwargs)
    except (ValueError, RuntimeError):
        if kwargs:
            # the caller explicitly asked for a cluster; a failure there
            # is real (unless the runtime is already distributed)
            _initialized = True
            if jax.process_count() > 1:
                return True
            raise
        # auto-detect found no cluster env: the expected single-host case
    _initialized = True
    return jax.process_count() > 1


def global_mesh() -> Mesh:
    """1-D 'mols' mesh over every chip of every process."""
    return Mesh(np.asarray(jax.devices()), (MOL_AXIS,))


def local_rows(n_total: int) -> tuple[int, int]:
    """[start, end) row range this process owns under even row sharding.

    Rows are blocked by process index (process p owns rows
    [p*b, (p+1)*b) with b = n_total / P rounded up on early ranks) —
    matching how a global array's leading axis lands on each process's
    addressable devices in :func:`global_array`.
    """
    p, n_proc = jax.process_index(), jax.process_count()
    base, extra = divmod(n_total, n_proc)
    start = p * base + min(p, extra)
    return start, start + base + (1 if p < extra else 0)


def global_array(local: np.ndarray, n_total: int, mesh: Mesh) -> jax.Array:
    """Assemble a globally row-sharded array from per-process rows.

    ``local`` holds this process's :func:`local_rows` slice. Each host
    only materializes (and transfers) its own rows — the global array is
    never gathered to any single host (the reference ships per-rank
    batches the same way before NCCL reductions).
    """
    spec = P(MOL_AXIS, *([None] * (local.ndim - 1)))
    sharding = NamedSharding(mesh, spec)
    if jax.process_count() == 1:
        return jax.device_put(local, sharding)
    global_shape = (n_total,) + local.shape[1:]
    return jax.make_array_from_process_local_data(sharding, local, global_shape)


def all_gather_rows(x: jax.Array) -> np.ndarray:
    """Fetch a row-sharded global array to every host (result gathering,
    the one cross-device op the workloads need — ``p2p.h:26-76``)."""
    if jax.process_count() == 1:
        return np.asarray(x)
    from jax.experimental import multihost_utils

    return np.asarray(multihost_utils.process_allgather(x, tiled=True))
