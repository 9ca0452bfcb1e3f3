"""Host-side utilities: hashing, packing, configuration.

TPU-native replacement for the reference's L0 CUDA runtime utilities
(``src/utils/``): device buffers/streams/pinned memory are handled by
XLA (``jax.Array`` + async dispatch), so what remains here is the pure
logic the reference kept on the host.
"""

from nvmolkit_tpu.utils.hashing import hash_combine_u32, hash_u32
from nvmolkit_tpu.utils.config import HardwareOptions

__all__ = ["hash_combine_u32", "hash_u32", "HardwareOptions"]
