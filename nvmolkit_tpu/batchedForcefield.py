"""Batched force-field objects — public API.

Mirrors the reference's ``nvmolkit/batchedForcefield.py``:
``UFFBatchedForcefield`` (and ``MMFFBatchedForcefield`` once MMFF
parametrization is configured) wrap a batch of molecules+conformers and
expose ``compute_energy() / compute_gradients() / minimize()`` over the
whole flattened (molecule, conformer) batch.
"""
from __future__ import annotations

import numpy as np

import jax.numpy as jnp

from nvmolkit_tpu.chem.mol import Mol
from nvmolkit_tpu.ops.bfgs import batched_bfgs_minimize
from nvmolkit_tpu.types import AsyncResult
from nvmolkit_tpu.utils.config import HardwareOptions


class _BatchedForcefieldBase:
    """Flattened (molecule, conformer) batch over one atom bucket."""

    def __init__(self, molecules: list[Mol], hardwareOptions: HardwareOptions | None = None):
        if not molecules:
            raise ValueError("empty molecule list")
        for i, m in enumerate(molecules):
            if not m.conformers:
                raise ValueError(f"molecule {i} has no conformers")
        self.molecules = molecules
        self.opts = hardwareOptions or HardwareOptions()
        buckets = self.opts.atomBuckets
        max_needed = max(m.num_atoms for m in molecules)
        for b in buckets:
            if max_needed <= b:
                self.max_atoms = b
                break
        else:
            raise ValueError(f"{max_needed} atoms exceeds largest bucket {buckets[-1]}")

        self.systems: list[tuple[int, int]] = [
            (mi, ci)
            for mi, m in enumerate(molecules)
            for ci in range(len(m.conformers))
        ]
        S = len(self.systems)
        pos = np.zeros((S, self.max_atoms, 3), dtype=np.float32)
        for k, (mi, ci) in enumerate(self.systems):
            m = molecules[mi]
            pos[k, : m.num_atoms] = m.conformers[ci]
        self._positions = jnp.asarray(pos)
        self._batch = self._build_batch([molecules[mi] for mi, _ in self.systems])

    # subclass hooks -------------------------------------------------------
    def _build_batch(self, sys_mols: list[Mol]):
        raise NotImplementedError

    def _energy_and_grad(self, positions, batch):
        raise NotImplementedError

    # public API -----------------------------------------------------------
    @property
    def positions(self) -> jnp.ndarray:
        """[n_systems, max_atoms, 3] current coordinates."""
        return self._positions

    def set_positions(self, positions) -> None:
        positions = jnp.asarray(positions, dtype=jnp.float32)
        if positions.shape != self._positions.shape:
            raise ValueError(
                f"positions shape {positions.shape} != {self._positions.shape}"
            )
        self._positions = positions

    def compute_energy(self) -> AsyncResult:
        """Per-system energies [n_systems]."""
        e, _ = self._energy_and_grad(self._positions, self._batch)
        return AsyncResult(e)

    def compute_gradients(self) -> AsyncResult:
        """Per-system gradients [n_systems, max_atoms, 3] (padded rows 0)."""
        _, g = self._energy_and_grad(self._positions, self._batch)
        return AsyncResult(g)

    def minimize(self, maxIters: int = 200, forceTol: float = 1e-4):
        """Minimize all systems in place; returns (energies, converged)."""
        def eg(p):
            return self._energy_and_grad(p, self._batch)

        res = batched_bfgs_minimize(
            eg,
            self._positions,
            self._batch.atom_mask,
            max_iters=maxIters,
            grad_tol=forceTol,
        )
        self._positions = res.positions
        return AsyncResult(res.energies), AsyncResult(res.converged)


class MMFFBatchedForcefield(_BatchedForcefieldBase):
    """Batched MMFF94 force field over molecules with conformers."""

    def __init__(
        self,
        molecules: list[Mol],
        properties=None,
        provider=None,
        hardwareOptions: HardwareOptions | None = None,
    ):
        from nvmolkit_tpu.models.mmff import MMFFProperties

        self.properties = properties or MMFFProperties()
        self.provider = provider
        super().__init__(molecules, hardwareOptions)

    def _build_batch(self, sys_mols):
        from nvmolkit_tpu.models.mmff import make_batched_mmff

        return make_batched_mmff(
            sys_mols, self.max_atoms, self.properties, provider=self.provider
        )

    def _energy_and_grad(self, positions, batch):
        from nvmolkit_tpu.models.mmff import mmff_energy_and_grad

        return mmff_energy_and_grad(positions, batch)


class UFFBatchedForcefield(_BatchedForcefieldBase):
    """Batched UFF force field over molecules with conformers."""

    def __init__(
        self,
        molecules: list[Mol],
        vdwThreshold: float = 10.0,
        hardwareOptions: HardwareOptions | None = None,
    ):
        self.vdwThreshold = vdwThreshold
        super().__init__(molecules, hardwareOptions)

    def _build_batch(self, sys_mols):
        from nvmolkit_tpu.models.uff.energy import make_batched_uff

        return make_batched_uff(sys_mols, self.max_atoms, vdw_threshold=self.vdwThreshold)

    def _energy_and_grad(self, positions, batch):
        from nvmolkit_tpu.models.uff.energy import uff_energy_and_grad

        return uff_energy_and_grad(positions, batch)
