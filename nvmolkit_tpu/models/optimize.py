"""Shared batch-minimization driver: bucket (mol, conformer) systems,
run batched BFGS per bucket, scatter results back.

Counterpart of the reference's MMFF/UFF drivers
(``src/minimizer/bfgs_mmff.cpp:116-157``): the reference round-robins
OpenMP threads over GPUs and streams; here each atom-size bucket becomes
one jitted batched minimization (XLA async dispatch pipelines buckets).
"""
from __future__ import annotations

import dataclasses
from typing import Callable

import jax
import jax.numpy as jnp
import numpy as np

from nvmolkit_tpu.chem.mol import Mol
from nvmolkit_tpu.models.terms import expand_batch_to_systems
from nvmolkit_tpu.types import Dense3DResult
from nvmolkit_tpu.utils.config import HardwareOptions


@dataclasses.dataclass
class SystemRef:
    mol_idx: int
    conf_idx: int


def _bucket_for(n_atoms: int, buckets: tuple[int, ...]) -> int:
    for b in buckets:
        if n_atoms <= b:
            return b
    raise ValueError(f"molecule with {n_atoms} atoms exceeds largest bucket {buckets[-1]}")


def _optimize_chunk_cap(bucket: int, budget_bytes: float = 3e9) -> int:
    """Max systems per minimize launch for one atom bucket.

    Memory per system is dominated by the nonbonded [A*A] tables plus
    L-BFGS history (~40*A^2 bytes); the hard bound in practice is wall
    time — single launches beyond ~4k systems run long enough to trip
    the tunneled CI chip's RPC watchdog (same failure mode as
    embedMolecules._embed_chunk_cap), and measured throughput peaks
    near 4k systems anyway (4.0k min/s at S=4096 vs 3.3k at S=8192 on
    v5e: the larger launch spills XLA temporaries)."""
    per_system = 40.0 * bucket * bucket
    return max(8, min(4096, int(budget_bytes / per_system)))


def optimize_molecules_confs(
    mols: list[Mol],
    make_batch_fn: Callable,        # (mols, max_atoms) -> batch pytree
    energy_and_grad_fn: Callable,   # (positions, batch) -> (e, g)
    max_iters: int = 200,
    grad_tol: float = 1e-4,
    hardware_options: HardwareOptions | None = None,
    backend: str = "flat",
    positions_from=None,            # Dense3DResult: device-resident input
):
    """Minimize every conformer of every molecule.

    Returns ``(energies, not_converged, dense)`` where ``energies`` is a
    nested list [mol][conf] of final energies, ``not_converged`` mirrors
    RDKit's status convention (0 = converged), and ``dense`` is a
    :class:`Dense3DResult` of minimized coordinates.

    ``positions_from`` chains a device-resident :class:`Dense3DResult`
    (e.g. straight out of ``EmbedMolecules``) as the starting
    coordinates: the per-chunk ``pos0`` stacks are device gathers from
    its ``positions`` array, so coordinates never round-trip through
    host conformer lists (the reference's device-input overload,
    ``src/conformer/ff_device_collect.h:64-97`` /
    ``bfgs_mmff.h:69-103``). Systems are the True slots of its
    ``conf_mask``; the returned dense result keeps the same slot
    layout.
    """
    opts = hardware_options or HardwareOptions()
    pf = positions_from
    if pf is None:
        for i, m in enumerate(mols):
            if not m.conformers:
                raise ValueError(f"molecule {i} has no conformers")
        conf_slots = [list(range(len(m.conformers))) for m in mols]
    else:
        if int(pf.positions.shape[0]) != len(mols):
            raise ValueError(
                f"positions_from covers {int(pf.positions.shape[0])} "
                f"molecules, got {len(mols)}"
            )
        pf_cmask = np.asarray(pf.conf_mask)
        conf_slots = [np.nonzero(pf_cmask[mi])[0].tolist() for mi in range(len(mols))]

    # group systems by bucket
    bucket_systems: dict[int, list[SystemRef]] = {}
    for mi, m in enumerate(mols):
        b = _bucket_for(m.num_atoms, opts.atomBuckets)
        for ci in conf_slots[mi]:
            bucket_systems.setdefault(b, []).append(SystemRef(mi, ci))

    max_confs = (
        int(pf.positions.shape[1]) if pf is not None
        else max(len(m.conformers) for m in mols)
    )
    max_atoms_all = max(_bucket_for(m.num_atoms, opts.atomBuckets) for m in mols)
    n_mols = len(mols)

    from nvmolkit_tpu.utils.config import working_dtype

    wdt = working_dtype()  # f32 default; f64 under NVMOLKIT_X64=1
    energies = [[0.0] * len(conf_slots[mi]) for mi in range(len(mols))]
    statuses = [[1] * len(conf_slots[mi]) for mi in range(len(mols))]
    slot_to_k = [
        {ci: k for k, ci in enumerate(conf_slots[mi])} for mi in range(len(mols))
    ]
    out_pos = np.zeros((n_mols, max_confs, max_atoms_all, 3), dtype=wdt)
    conf_mask = np.zeros((n_mols, max_confs), dtype=bool)
    atom_mask_out = np.zeros((n_mols, max_atoms_all), dtype=bool)
    for mi, m in enumerate(mols):
        atom_mask_out[mi, : m.num_atoms] = True
        conf_mask[mi, conf_slots[mi]] = True
    converged_out = np.zeros((n_mols, max_confs), dtype=bool)
    energies_out = np.zeros((n_mols, max_confs), dtype=wdt)

    from nvmolkit_tpu.parallel.distributed import distributed_minimize, resolve_devices

    devices = resolve_devices(opts.deviceIds)
    multi = len(devices) > 1

    cap = opts.batchSize if opts.batchSize > 0 else None
    chunked: list[tuple[int, list[SystemRef]]] = []
    for bucket, systems in sorted(bucket_systems.items()):
        c = cap or _optimize_chunk_cap(bucket)
        for start in range(0, len(systems), c):
            chunked.append((bucket, systems[start : start + c]))

    # Two-phase execution: dispatch every chunk's phase-1 minimize
    # before fetching any chunk's results, so the host-side assembly of
    # chunk N+1 (term batching, pos0 fill, transfers) overlaps chunk N's
    # device compute (the reference overlaps via per-GPU OpenMP workers,
    # ``src/minimizer/bfgs_mmff.cpp:116-157``).
    pending: list[tuple[list[SystemRef], int, Callable]] = []
    for bucket, systems in chunked:
        S = len(systems)
        n_pad = 0
        if multi and S % len(devices):
            n_pad = len(devices) - S % len(devices)

        # Batch term tables once per UNIQUE molecule, then expand to
        # (molecule, conformer) systems with device-side gathers — a
        # many-conformer batch ships each molecule's tables across the
        # host->device link exactly once (the reference re-flattens
        # contribs per conformer, ``src/forcefields/mmff.h:352-370``).
        unique_mol_ids: list[int] = []
        mol_to_row: dict[int, int] = {}
        sys2mol = np.empty(S + n_pad, np.int32)
        for k, s in enumerate(systems):
            row = mol_to_row.get(s.mol_idx)
            if row is None:
                row = mol_to_row[s.mol_idx] = len(unique_mol_ids)
                unique_mol_ids.append(s.mol_idx)
            sys2mol[k] = row
        sys2mol[S:] = sys2mol[0] if n_pad else 0
        ubatch = make_batch_fn([mols[i] for i in unique_mol_ids], bucket)
        batch = expand_batch_to_systems(ubatch, sys2mol, S + n_pad)

        if pf is not None:
            # device-resident chaining: pos0 is a row gather from the
            # input Dense3DResult — no host conformer round-trip
            g_mi = np.asarray(
                [s.mol_idx for s in systems] + [systems[0].mol_idx] * n_pad,
                np.int32,
            )
            g_ci = np.asarray(
                [s.conf_idx for s in systems] + [systems[0].conf_idx] * n_pad,
                np.int32,
            )
            rows = jnp.asarray(pf.positions)[
                jnp.asarray(g_mi), jnp.asarray(g_ci)
            ].astype(wdt)                             # [S+pad, Amax, 3]
            amax = rows.shape[1]
            if amax >= bucket:
                pos0 = rows[:, :bucket, :]
            else:
                pos0 = (
                    jnp.zeros((S + n_pad, bucket, 3), wdt)
                    .at[:, :amax].set(rows)
                )
        else:
            pos0 = np.zeros((S + n_pad, bucket, 3), dtype=wdt)
            # fill grouped by molecule: one stack + one fancy-index per
            # unique molecule instead of a python slice-copy per system
            k = 0
            while k < S:
                mi = systems[k].mol_idx
                j = k
                while j < S and systems[j].mol_idx == mi:
                    j += 1
                m = mols[mi]
                confs = np.stack(m.conformers)  # [C, n, 3]
                cids = [systems[t].conf_idx for t in range(k, j)]
                pos0[k:j, : m.num_atoms] = confs[cids]
                k = j
            if n_pad:
                pos0[S:] = pos0[0]

        if multi:
            def finish(batch=batch, pos0=pos0):
                return distributed_minimize(
                    energy_and_grad_fn, batch, pos0, batch.atom_mask,
                    devices, max_iters=max_iters, grad_tol=grad_tol,
                )
        else:
            from nvmolkit_tpu.ops.minimize_driver import (
                minimize_compacting_start,
            )

            finish = minimize_compacting_start(
                energy_and_grad_fn,
                jnp.asarray(pos0),
                batch.atom_mask,
                batch,
                max_iters=max_iters,
                grad_tol=grad_tol,
                backend=backend,
            )
        pending.append((systems, bucket, finish))

    for systems, bucket, finish in pending:
        res = finish()
        # one consolidated device->host fetch (3 separate np.asarray calls
        # each pay a full host<->device round trip)
        e, conv, pos = jax.device_get((res.energies, res.converged, res.positions))
        mol_ids = np.asarray([s.mol_idx for s in systems])
        conf_ids = np.asarray([s.conf_idx for s in systems])
        k = len(systems)
        out_pos[mol_ids, conf_ids, :bucket] = pos[:k]
        converged_out[mol_ids, conf_ids] = conv[:k]
        energies_out[mol_ids, conf_ids] = e[:k]
        e_list = e[:k].tolist()
        st_list = np.where(conv[:k], 0, 1).tolist()
        for j, s in enumerate(systems):
            kk = slot_to_k[s.mol_idx][s.conf_idx]
            energies[s.mol_idx][kk] = e_list[j]
            statuses[s.mol_idx][kk] = st_list[j]

    dense = Dense3DResult(
        positions=jnp.asarray(out_pos),
        conf_mask=jnp.asarray(conf_mask),
        atom_mask=jnp.asarray(atom_mask_out),
        energies=jnp.asarray(energies_out),
        converged=jnp.asarray(converged_out),
    )
    return energies, statuses, dense


def finalize_output(molecules, results, dense, output):
    """Apply the CoordinateOutput contract to an optimize result.

    CONFORMERS (default): write minimized coordinates back into each
    molecule's conformer list (reference behavior — coordinates update
    regardless of convergence, ``nvmolkit/types.py:168-170``) and return
    ``(results, dense)``. DEVICE: no writeback; return ``dense`` only.
    """
    from nvmolkit_tpu.types import CoordinateOutput

    output = output or CoordinateOutput.CONFORMERS
    if output == CoordinateOutput.DEVICE:
        return dense
    pos = np.asarray(dense.positions)
    cmask = np.asarray(dense.conf_mask)
    for mi, m in enumerate(molecules):
        na = m.num_atoms
        # k-th True slot maps to m.conformers[k] (slots may have gaps
        # when chaining from an embed whose retries left holes)
        slots = np.nonzero(cmask[mi])[0]
        for k, ci in enumerate(slots[: len(m.conformers)]):
            m.conformers[k] = pos[mi, ci, :na].copy()
    return results, dense


def merge_group_dense(molecules, dense_parts):
    """Merge per-group optimize results back into input molecule order.

    ``dense_parts`` is ``[(mol_ids, Dense3DResult), ...]`` from running
    :func:`optimize_molecules_confs` on property-homogeneous molecule
    groups (the reference groups per-molecule thresholds the same way,
    ``nvmolkit/mmffOptimization.py:145-196``). Returns one
    :class:`Dense3DResult` covering all molecules.
    """
    max_confs = max(len(m.conformers) for m in molecules)
    max_atoms = max(int(d.positions.shape[2]) for _, d in dense_parts)
    n = len(molecules)
    pos = np.zeros((n, max_confs, max_atoms, 3), np.float32)
    conf_mask = np.zeros((n, max_confs), bool)
    atom_mask = np.zeros((n, max_atoms), bool)
    e_out = np.zeros((n, max_confs), np.float32)
    conv = np.zeros((n, max_confs), bool)
    for mol_ids, d in dense_parts:
        dp = np.asarray(d.positions)
        for g, mi in enumerate(mol_ids):
            c = int(np.asarray(d.conf_mask)[g].sum())
            a = dp.shape[2]
            pos[mi, :c, :a] = dp[g, :c]
            conf_mask[mi, :c] = True
            atom_mask[mi, : molecules[mi].num_atoms] = True
            e_out[mi, :c] = np.asarray(d.energies)[g, :c]
            conv[mi, :c] = np.asarray(d.converged)[g, :c]
    return Dense3DResult(
        positions=jnp.asarray(pos),
        conf_mask=jnp.asarray(conf_mask),
        atom_mask=jnp.asarray(atom_mask),
        energies=jnp.asarray(e_out),
        converged=jnp.asarray(conv),
    )
