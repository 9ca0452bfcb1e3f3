"""Public result/value types.

Mirrors the reference's ``nvmolkit/types.py`` surface: ``AsyncGpuResult``
becomes :class:`AsyncResult` (a thin wrapper over an asynchronously
dispatched ``jax.Array`` — XLA gives us stream-ordered semantics for
free), and the device-resident CSR conformer containers
(``Device3DResult``/``Dense3DResult``, ``nvmolkit/types.py:179-319``)
become padded dense arrays with masks — the natural TPU layout.
"""
from __future__ import annotations

import dataclasses
import enum

import jax
import numpy as np

from nvmolkit_tpu.utils.config import HardwareOptions  # noqa: F401  (re-export)


def check_stream_arg(stream) -> None:
    """Validate the reference's ``stream=`` compatibility kwarg.

    The reference's public APIs take a ``torch.cuda.Stream``
    (``nvmolkit/clustering.py:46``, ``nvmolkit/similarity.py:37``, …);
    on TPU, XLA's async dispatch orders device work, so there is no
    stream object to pass. The kwarg is accepted (always ``None``) so
    reference call sites port without edits; anything else is a type
    error, mirroring the reference's own check."""
    if stream is not None:
        raise TypeError(
            "stream must be None on TPU (XLA async dispatch replaces "
            f"CUDA streams), got {type(stream).__name__}"
        )


class CoordinateOutput(enum.Enum):
    """How conformer-producing APIs hand back coordinates (the
    reference's ``CoordinateOutput``, ``nvmolkit/types.py:165-177``).

    - ``CONFORMERS``: write optimized coordinates back into each input
      molecule's conformer list and return per-molecule Python results
      (alias ``RDKIT_CONFORMERS`` for drop-in compatibility).
    - ``DEVICE``: skip the writeback; return only the device-resident
      :class:`Dense3DResult` for chaining without host round-trips.
    """

    CONFORMERS = "rdkit"
    RDKIT_CONFORMERS = "rdkit"  # reference spelling (enum alias)
    DEVICE = "device"


class AsyncResult:
    """Handle to an asynchronously computed device array.

    Analog of the reference's ``AsyncGpuResult`` (``nvmolkit/types.py:125-162``):
    ``.jax()`` returns the device array without synchronizing (XLA async
    dispatch), ``.numpy()`` synchronizes and copies to host.
    """

    def __init__(self, array):
        # accepts a jax.Array (device handle) or a numpy array (already
        # materialized — e.g. one slice of a single batched transfer)
        self._array = array

    def jax(self) -> jax.Array:
        import jax.numpy as jnp

        if isinstance(self._array, np.ndarray):
            return jnp.asarray(self._array)
        return self._array

    def numpy(self) -> np.ndarray:
        if isinstance(self._array, np.ndarray):
            return self._array
        return np.asarray(self._array.block_until_ready())

    def block_until_ready(self) -> "AsyncResult":
        if not isinstance(self._array, np.ndarray):
            self._array.block_until_ready()
        return self

    @property
    def device(self):
        """Device holding the array (None once materialized to host) —
        the reference's ``AsyncGpuResult.device`` (``types.py:150-153``)."""
        if isinstance(self._array, np.ndarray):
            return None
        return next(iter(self._array.devices()))

    def torch(self):
        """Copy to a host ``torch.Tensor`` (the reference returns a GPU
        tensor via ``__cuda_array_interface__``; on TPU the exchange
        format is a host buffer — ``types.py:155-157``)."""
        import torch

        # copy: jax host buffers are read-only; torch wants writable
        return torch.from_numpy(np.array(self.numpy(), copy=True))

    @property
    def shape(self):
        return self._array.shape

    @property
    def dtype(self):
        return self._array.dtype

    def __array__(self, dtype=None):
        out = self.numpy()
        return out.astype(dtype) if dtype is not None else out


@dataclasses.dataclass
class Dense3DResult:
    """Padded conformer coordinates + masks.

    TPU-native analog of the reference's ``Device3DResult.dense()`` view
    (``nvmolkit/types.py:263-319``): coordinates are
    ``(n_mols, max_confs, max_atoms, 3)`` with boolean conformer and atom
    masks; energies are ``(n_mols, max_confs)``.
    """

    positions: jax.Array        # (n_mols, max_confs, max_atoms, 3)
    conf_mask: jax.Array        # (n_mols, max_confs) bool
    atom_mask: jax.Array        # (n_mols, max_atoms) bool
    energies: jax.Array | None = None   # (n_mols, max_confs)
    converged: jax.Array | None = None  # (n_mols, max_confs) bool

    @property
    def n_mols(self) -> int:
        return self.positions.shape[0]

    def per_molecule(self) -> list[list[np.ndarray]]:
        """Materialize per-molecule lists of (n_atoms, 3) conformers."""
        pos = np.asarray(self.positions)
        cmask = np.asarray(self.conf_mask)
        amask = np.asarray(self.atom_mask)
        out: list[list[np.ndarray]] = []
        for m in range(self.n_mols):
            na = int(amask[m].sum())
            confs = [pos[m, c, :na] for c in range(pos.shape[1]) if cmask[m, c]]
            out.append(confs)
        return out

    def dense(self, pad_value: float = 0.0):
        """Padded view (the reference's ``Device3DResult.dense()``):
        (positions, conf_mask, atom_mask) with masked entries set to
        ``pad_value``."""
        pos = np.asarray(self.positions).copy()
        cmask = np.asarray(self.conf_mask)
        amask = np.asarray(self.atom_mask)
        pos[~cmask] = pad_value
        for m in range(pos.shape[0]):
            pos[m, :, ~amask[m]] = pad_value
        return pos, cmask, amask

    def csr(self):
        """CSR view matching the reference's ``Device3DResult`` layout
        (``nvmolkit/types.py:197-319``): flat positions [total_atoms, 3]
        over accepted conformers plus atom_starts / mol_indices /
        conf_indices arrays."""
        pos = np.asarray(self.positions)
        cmask = np.asarray(self.conf_mask)
        amask = np.asarray(self.atom_mask)
        flat, starts, mol_idx, conf_idx = [], [0], [], []
        for m in range(self.n_mols):
            na = int(amask[m].sum())
            for c in range(pos.shape[1]):
                if not cmask[m, c]:
                    continue
                flat.append(pos[m, c, :na])
                starts.append(starts[-1] + na)
                mol_idx.append(m)
                conf_idx.append(c)
        positions = (
            np.concatenate(flat) if flat else np.zeros((0, 3), pos.dtype)
        )
        return {
            "positions": positions,
            "atom_starts": np.asarray(starts, np.int64),
            "mol_indices": np.asarray(mol_idx, np.int32),
            "conf_indices": np.asarray(conf_idx, np.int32),
        }


# Reference-name alias: the reference's device-resident conformer result
# container is called Device3DResult; the TPU-native layout is dense.
Device3DResult = Dense3DResult
