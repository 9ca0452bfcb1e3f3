"""Batched force-field objects — public API.

Mirrors the reference's ``nvmolkit/batchedForcefield.py``:
``UFFBatchedForcefield`` (and ``MMFFBatchedForcefield`` once MMFF
parametrization is configured) wrap a batch of molecules+conformers and
expose ``compute_energy() / compute_gradients() / minimize()`` over the
whole flattened (molecule, conformer) batch.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from nvmolkit_tpu.chem.mol import Mol
from nvmolkit_tpu.models.constraints import (
    PerSystemConstraints,
    build_constraint_batch,
    constraint_energy,
)
from nvmolkit_tpu.ops.bfgs import batched_bfgs_minimize
from nvmolkit_tpu.types import AsyncResult
from nvmolkit_tpu.utils.config import HardwareOptions


class _BatchElementBase:
    """Per-MOLECULE constraint editing view (the reference's element
    views, ``batchedForcefield.py:171-289``). ``ff[i]`` addresses
    molecule ``i``; a constraint added here applies to every conformer
    (system) of that molecule, matching the reference contract."""

    def __init__(self, parent: "_BatchedForcefieldBase", mol_idx: int):
        self._parent = parent
        self._idx = mol_idx

    @property
    def num_atoms(self) -> int:
        return self._parent.molecules[self._idx].num_atoms

    def _check_atoms(self, *atoms):
        n = self.num_atoms
        for a in atoms:
            if not (0 <= a < n):
                raise ValueError(f"atom index {a} out of range (molecule has {n})")

    def _systems(self):
        return [
            k for k, (mi, _ci) in enumerate(self._parent.systems)
            if mi == self._idx
        ]

    def add_distance_constraint(
        self, idx1: int, idx2: int, minLen: float, maxLen: float,
        forceConstant: float, relative: bool = False,
    ) -> None:
        self._check_atoms(idx1, idx2)
        for k in self._systems():
            self._parent._constraints[k].distance.append(
                (idx1, idx2, minLen, maxLen, forceConstant, relative)
            )
        self._parent._constraints_dirty = True

    def add_position_constraint(
        self, idx: int, maxDispl: float, forceConstant: float
    ) -> None:
        self._check_atoms(idx)
        for k in self._systems():
            self._parent._constraints[k].position.append(
                (idx, maxDispl, forceConstant)
            )
        self._parent._constraints_dirty = True

    def add_angle_constraint(
        self, idx1: int, idx2: int, idx3: int, minAngleDeg: float,
        maxAngleDeg: float, forceConstant: float, relative: bool = False,
    ) -> None:
        self._check_atoms(idx1, idx2, idx3)
        for k in self._systems():
            self._parent._constraints[k].angle.append(
                (idx1, idx2, idx3, minAngleDeg, maxAngleDeg, forceConstant,
                 relative)
            )
        self._parent._constraints_dirty = True

    def add_torsion_constraint(
        self, idx1: int, idx2: int, idx3: int, idx4: int, minDihedralDeg: float,
        maxDihedralDeg: float, forceConstant: float, relative: bool = False,
    ) -> None:
        self._check_atoms(idx1, idx2, idx3, idx4)
        for k in self._systems():
            self._parent._constraints[k].torsion.append(
                (idx1, idx2, idx3, idx4, minDihedralDeg, maxDihedralDeg,
                 forceConstant, relative)
            )
        self._parent._constraints_dirty = True


class MMFFBatchElement(_BatchElementBase):
    """Per-molecule view of one molecule in an MMFF batch (``ff[i]``)."""


class UFFBatchElement(_BatchElementBase):
    """Per-molecule view of one molecule in a UFF batch (``ff[i]``)."""


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
        self._constraints = [PerSystemConstraints() for _ in self.systems]
        self._constraints_dirty = False
        self._constraint_batch = None

    # subclass hooks -------------------------------------------------------
    def _build_batch(self, sys_mols: list[Mol]):
        raise NotImplementedError

    def _energy_and_grad(self, positions, batch):
        raise NotImplementedError

    def _module_energy_fn(self):
        """Module-level (pos, batch) -> (e, g) fn for jit-cache stability."""
        raise NotImplementedError

    # constraints ----------------------------------------------------------
    _element_cls: type = _BatchElementBase

    def __getitem__(self, mol_idx: int) -> _BatchElementBase:
        if not (0 <= mol_idx < len(self.molecules)):
            raise IndexError(f"molecule index {mol_idx} out of range")
        return self._element_cls(self, mol_idx)

    def _constraint_energy_fn(self):
        """None when no constraints, else jitted extra-energy closure.

        Rebuilt lazily when constraint lists changed (the reference's
        dirty-rebuild, ``batchedForcefield.py:385-400``); relative
        windows resolve against the positions current at rebuild time.
        """
        if all(c.empty() for c in self._constraints):
            return None
        if self._constraints_dirty or self._constraint_batch is None:
            self._constraint_batch = build_constraint_batch(
                self._constraints, np.asarray(self._positions)
            )
            self._constraints_dirty = False
        cb = self._constraint_batch
        return lambda p: constraint_energy(p, cb)

    def _full_energy_and_grad(self):
        cfn = self._constraint_energy_fn()
        batch = self._batch
        if cfn is None:
            return lambda p: self._energy_and_grad(p, batch)

        def eg(p):
            e, g = self._energy_and_grad(p, batch)
            ce, cg = jax.value_and_grad(lambda q: jnp.sum(cfn(q)))(p)
            del ce
            return e + cfn(p), g + cg

        return eg

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
        """Per-system energies [n_systems] (constraints included)."""
        e, _ = self._full_energy_and_grad()(self._positions)
        return AsyncResult(e)

    def compute_gradients(self) -> AsyncResult:
        """Per-system gradients [n_systems, max_atoms, 3] (padded rows 0)."""
        _, g = self._full_energy_and_grad()(self._positions)
        return AsyncResult(g)

    def _broadcast_per_molecule(self, value, name, dtype):
        """Scalar-or-per-molecule-list -> per-SYSTEM array or None.

        The reference's option broadcasting
        (``batchedForcefield.py:325-330``): a sequence must have one
        entry per molecule; every conformer of a molecule shares it.
        """
        import collections.abc

        if isinstance(value, collections.abc.Sequence):
            if len(value) != len(self.molecules):
                raise ValueError(
                    f"expected {len(self.molecules)} values for {name}, "
                    f"got {len(value)}"
                )
            return jnp.asarray(
                np.asarray([value[mi] for mi, _ci in self.systems], dtype)
            )
        return None

    def _apply_positions_from(self, pf) -> None:
        """Load starting coordinates from a device-resident
        :class:`~nvmolkit_tpu.types.Dense3DResult` (e.g. straight out of
        ``EmbedMolecules(output=DEVICE)``) with a device gather — no
        host round-trip (the reference's device-input overload,
        ``src/conformer/ff_device_collect.h:64-97``). The FF's k-th
        conformer of molecule ``mi`` maps to the k-th True slot of
        ``pf.conf_mask[mi]``, matching the module-level drivers."""
        n_mols_pf = int(pf.positions.shape[0])
        if n_mols_pf != len(self.molecules):
            raise ValueError(
                f"positionsFrom covers {n_mols_pf} molecules, "
                f"forcefield has {len(self.molecules)}"
            )
        cmask = np.asarray(pf.conf_mask)
        slot_of: list[np.ndarray] = []
        for mi, m in enumerate(self.molecules):
            slots = np.nonzero(cmask[mi])[0]
            if len(slots) != len(m.conformers):
                raise ValueError(
                    f"positionsFrom has {len(slots)} embedded conformers "
                    f"for molecule {mi}, forcefield batch has "
                    f"{len(m.conformers)}"
                )
            slot_of.append(slots)
        max_confs_pf = int(pf.positions.shape[1])
        rows = np.asarray(
            [mi * max_confs_pf + slot_of[mi][ci] for mi, ci in self.systems],
            np.int32,
        )
        A_pf = int(pf.positions.shape[2])
        src = pf.positions.reshape(-1, A_pf, 3)[rows].astype(
            self._positions.dtype
        )
        A = self.max_atoms
        if A_pf >= A:
            self._positions = src[:, :A]
        else:
            self._positions = jnp.pad(src, ((0, 0), (0, A - A_pf), (0, 0)))

    def _dense_result(self, energies, converged):
        """Scatter the flat [S] system axis back to a device-resident
        ``[n_mols, max_confs, A, 3]`` :class:`Dense3DResult` (the
        reference's ``Device3DResult`` return of
        ``minimize(output=DEVICE)``, ``nvmolkit/batchedForcefield.py``
        minimize overloads)."""
        from nvmolkit_tpu.types import Dense3DResult

        n_mols = len(self.molecules)
        max_confs = max(len(m.conformers) for m in self.molecules)
        rows = np.asarray(
            [mi * max_confs + ci for mi, ci in self.systems], np.int32
        )
        A = self.max_atoms
        pos = (
            jnp.zeros((n_mols * max_confs, A, 3), self._positions.dtype)
            .at[rows].set(self._positions)
            .reshape(n_mols, max_confs, A, 3)
        )
        e = (
            jnp.zeros((n_mols * max_confs,), energies.dtype)
            .at[rows].set(energies).reshape(n_mols, max_confs)
        )
        conv = (
            jnp.zeros((n_mols * max_confs,), bool)
            .at[rows].set(converged).reshape(n_mols, max_confs)
        )
        conf_mask = np.zeros((n_mols, max_confs), bool)
        atom_mask = np.zeros((n_mols, A), bool)
        for mi, m in enumerate(self.molecules):
            conf_mask[mi, : len(m.conformers)] = True
            atom_mask[mi, : m.num_atoms] = True
        return Dense3DResult(
            positions=pos,
            conf_mask=jnp.asarray(conf_mask),
            atom_mask=jnp.asarray(atom_mask),
            energies=e,
            converged=conv,
        )

    def minimize(
        self,
        maxIters=200,
        forceTol=1e-4,
        output=None,
        target_gpu: int | None = None,
        positionsFrom=None,
    ):
        """Minimize all systems in place.

        Default output returns ``(energies, converged)`` AsyncResults
        over the flat system axis. ``output=CoordinateOutput.DEVICE``
        instead returns a device-resident :class:`Dense3DResult`
        (positions/energies/converged stay on device for chaining into
        RMSD/TFD/optimize via their ``positionsFrom=``), mirroring the
        reference's minimize overloads (``nvmolkit/batchedForcefield.py``
        ``minimize(output=, target_gpu=)``). ``positionsFrom`` accepts a
        Dense3DResult as the starting coordinates (device gather, no
        host round-trip). ``target_gpu`` must be the wrapper's own
        device (the wrapper is single-device, as in the reference);
        any other value raises ``ValueError``.

        ``maxIters`` and ``forceTol`` accept a scalar or a per-molecule
        sequence (reference broadcasting semantics)."""
        from nvmolkit_tpu.types import CoordinateOutput as _CO

        if target_gpu is not None:
            import jax as _jax

            own = self.opts.deviceIds[0] if self.opts.deviceIds else (
                _jax.devices()[0].id
            )
            if int(target_gpu) != own:
                raise ValueError(
                    f"target_gpu={target_gpu} differs from the wrapper's "
                    f"device {own}; the batched wrapper is single-device "
                    "(use the standalone optimize APIs for cross-device "
                    "consolidation)"
                )
        if positionsFrom is not None:
            self._apply_positions_from(positionsFrom)
        iter_caps = self._broadcast_per_molecule(maxIters, "maxIters", np.int32)
        grad_tols = self._broadcast_per_molecule(forceTol, "forceTol", np.float32)
        max_iters = int(np.max(maxIters)) if iter_caps is not None else maxIters
        grad_tol = float(np.min(forceTol)) if grad_tols is not None else forceTol
        if all(c.empty() for c in self._constraints):
            # jit-cached fast path: module-level energy fn + batch as args
            res = batched_bfgs_minimize(
                self._module_energy_fn(),
                self._positions,
                self._batch.atom_mask,
                max_iters=max_iters,
                grad_tol=grad_tol,
                energy_args=self._batch,
                iter_caps=iter_caps,
                grad_tols=grad_tols,
            )
        else:
            eg = self._full_energy_and_grad()
            res = batched_bfgs_minimize(
                eg,
                self._positions,
                self._batch.atom_mask,
                max_iters=max_iters,
                grad_tol=grad_tol,
                iter_caps=iter_caps,
                grad_tols=grad_tols,
            )
        self._positions = res.positions
        if output == _CO.DEVICE:
            return self._dense_result(res.energies, res.converged)
        return AsyncResult(res.energies), AsyncResult(res.converged)


class MMFFBatchedForcefield(_BatchedForcefieldBase):
    """Batched MMFF94 force field over molecules with conformers."""

    _element_cls = MMFFBatchElement

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

    def _module_energy_fn(self):
        from nvmolkit_tpu.models.mmff import mmff_energy_and_grad

        return mmff_energy_and_grad


class UFFBatchedForcefield(_BatchedForcefieldBase):
    """Batched UFF force field over molecules with conformers."""

    _element_cls = UFFBatchElement

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

    def _module_energy_fn(self):
        from nvmolkit_tpu.models.uff.energy import uff_energy_and_grad

        return uff_energy_and_grad
