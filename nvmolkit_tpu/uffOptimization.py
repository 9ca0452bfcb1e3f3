"""Batch UFF optimization — public API.

Mirrors the reference's ``nvmolkit/uffOptimization.py``:
``UFFOptimizeMoleculesConfs(molecules, maxIters, vdwThreshold, ...)``
minimizes every conformer of every molecule with batched BFGS and
returns per-conformer (status, energy) pairs plus dense coordinates.
"""
from __future__ import annotations

from collections.abc import Sequence

from nvmolkit_tpu.chem.mol import Mol
from nvmolkit_tpu.models.optimize import optimize_molecules_confs
from nvmolkit_tpu.models.uff.energy import make_batched_uff, uff_energy_and_grad
from nvmolkit_tpu.utils.config import HardwareOptions


def UFFOptimizeMoleculesConfs(
    molecules: list[Mol],
    maxIters: int = 200,
    vdwThreshold: float | Sequence[float] = 10.0,
    ignoreInterfragInteractions: bool | Sequence[bool] = True,
    nonBondedThreshold: float | None = None,
    hardwareOptions: HardwareOptions | None = None,
    backend: str = "flat",
    output=None,
    positionsFrom=None,
    targetGpu: int = -1,
):
    """Minimize all conformers of all molecules under UFF.

    Returns ``(results, dense)``: ``results[mol][conf] = (not_converged,
    energy)`` matching RDKit's ``UFFOptimizeMoleculeConfs`` convention
    (0 = converged), ``dense`` a :class:`Dense3DResult` with minimized
    coordinates, energies and convergence flags. ``positionsFrom``
    chains a device-resident Dense3DResult as the coordinate source
    (see ``MMFFOptimizeMoleculesConfs``). ``targetGpu`` >= 0 selects
    that chip when ``hardwareOptions.deviceIds`` is unset.

    Raises the reference's structured ``ValueError``
    (``nvmolkit/uffOptimization.py:86-87``): ``e.args[1]`` carries
    ``{"none": [...], "no_params": [...]}`` molecule indices.
    """
    del nonBondedThreshold  # UFF uses vdwThreshold (reference mirror)
    import dataclasses

    from nvmolkit_tpu.types import CoordinateOutput as _CO

    if not molecules:
        if output == _CO.DEVICE:
            raise ValueError(
                "UFFOptimizeMoleculesConfs(output=DEVICE) requires at "
                "least one molecule"
            )
        return [], None
    none_indices = [i for i, m in enumerate(molecules) if m is None]
    if none_indices:
        raise ValueError(
            f"None at indices {none_indices}",
            {"none": none_indices, "no_params": []},
        )
    if targetGpu >= 0:
        hardwareOptions = hardwareOptions or HardwareOptions()
        if not hardwareOptions.deviceIds:
            hardwareOptions = dataclasses.replace(
                hardwareOptions, deviceIds=[targetGpu]
            )

    # reference parity: vdwThreshold / ignoreInterfragInteractions may be
    # per-molecule sequences (``nvmolkit/uffOptimization.py:35-36``);
    # group value-homogeneous molecules into one optimize pass each
    from nvmolkit_tpu.mmffOptimization import _per_mol

    n = len(molecules)
    # vdwThreshold is validated per-molecule but does not split groups:
    # the dense TPU nonbonded path keeps every pair regardless (see
    # make_batched_uff), so any threshold yields identical results.
    vdw_per_mol = [
        float(_per_mol(vdwThreshold, i, n, "vdwThreshold")) for i in range(n)
    ]
    del vdw_per_mol
    per_mol = [
        bool(
            _per_mol(
                ignoreInterfragInteractions, i, n,
                "ignoreInterfragInteractions",
            )
        )
        for i in range(n)
    ]
    groups: dict[bool, list[int]] = {}
    for mi, key in enumerate(per_mol):
        groups.setdefault(key, []).append(mi)

    results: list = [None] * n
    dense_parts: list = []
    for interfrag, mol_ids in groups.items():
        group_mols = [molecules[i] for i in mol_ids]
        group_pf = None
        if positionsFrom is not None:
            if len(groups) == 1:
                group_pf = positionsFrom
            else:
                import jax.numpy as jnp

                from nvmolkit_tpu.types import Dense3DResult as _D3

                rows = jnp.asarray(mol_ids)
                group_pf = _D3(
                    positions=positionsFrom.positions[rows],
                    conf_mask=positionsFrom.conf_mask[rows],
                    atom_mask=positionsFrom.atom_mask[rows],
                )

        def make_batch(mols, max_atoms, _interfrag=interfrag):
            return make_batched_uff(
                mols, max_atoms, ignore_interfrag=_interfrag,
            )

        energies, statuses, dense = optimize_molecules_confs(
            group_mols,
            make_batch,
            uff_energy_and_grad,
            max_iters=maxIters,
            hardware_options=hardwareOptions,
            backend=backend,
            positions_from=group_pf,
        )
        for g, mi in enumerate(mol_ids):
            results[mi] = [
                (statuses[g][c], energies[g][c])
                for c in range(len(energies[g]))
            ]
        dense_parts.append((mol_ids, dense))

    from nvmolkit_tpu.models.optimize import finalize_output, merge_group_dense

    if len(dense_parts) == 1:
        dense = dense_parts[0][1]
    else:
        dense = merge_group_dense(molecules, dense_parts)
    return finalize_output(molecules, results, dense, output)
