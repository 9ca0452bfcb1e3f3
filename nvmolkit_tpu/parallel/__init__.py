"""Multi-chip scaling: mesh construction and data-parallel sharding.

The reference's parallelism inventory (SURVEY.md §2.16) is batch-level
data parallelism over GPUs plus P2P result consolidation. TPU-natively
that becomes: one ``jax.sharding.Mesh``, molecule batches sharded over the
``"mols"`` axis with ``NamedSharding``, XLA collectives for gathering, and
``jax.device_put`` for "consolidate onto target device".
"""

from nvmolkit_tpu.parallel import multihost
from nvmolkit_tpu.parallel.mesh import data_parallel_mesh, shard_rows

__all__ = ["data_parallel_mesh", "multihost", "shard_rows"]
