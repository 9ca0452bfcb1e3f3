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

import jax
import numpy as np

from nvmolkit_tpu.utils.config import HardwareOptions  # noqa: F401  (re-export)


class AsyncResult:
    """Handle to an asynchronously computed device array.

    Analog of the reference's ``AsyncGpuResult`` (``nvmolkit/types.py:125-162``):
    ``.jax()`` returns the device array without synchronizing (XLA async
    dispatch), ``.numpy()`` synchronizes and copies to host.
    """

    def __init__(self, array: jax.Array):
        self._array = array

    def jax(self) -> jax.Array:
        return self._array

    def numpy(self) -> np.ndarray:
        return np.asarray(self._array.block_until_ready())

    def block_until_ready(self) -> "AsyncResult":
        self._array.block_until_ready()
        return self

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
