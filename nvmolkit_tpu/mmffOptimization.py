"""Batch MMFF optimization — public API.

Mirrors the reference's ``nvmolkit/mmffOptimization.py:60-201``:
``MMFFOptimizeMoleculesConfs(molecules, maxIters, properties, ...)``
minimizes every conformer under MMFF94 with batched BFGS.
"""
from __future__ import annotations

import dataclasses

from collections.abc import Sequence

from nvmolkit_tpu.chem.mol import Mol
from nvmolkit_tpu.models.mmff import MMFFProperties, make_batched_mmff, mmff_energy_and_grad
from nvmolkit_tpu.models.optimize import optimize_molecules_confs
from nvmolkit_tpu.utils.config import HardwareOptions


def _per_mol(value, i: int, n: int, name: str):
    """Reference parity: scalar or length-n per-molecule sequence
    (``nvmolkit/mmffOptimization.py:42-43``, ``uffOptimization.py:35-36``)."""
    if isinstance(value, Sequence) and not isinstance(value, (str, bytes)):
        if len(value) != n:
            raise ValueError(
                f"{name} sequence length {len(value)} != molecule count {n}"
            )
        return value[i]
    return value


def MMFFOptimizeMoleculesConfs(
    molecules: list[Mol],
    maxIters: int = 200,
    properties: MMFFProperties | list[MMFFProperties] | None = None,
    nonBondedThreshold: float | Sequence[float] = 100.0,
    ignoreInterfragInteractions: bool | Sequence[bool] = True,
    hardwareOptions: HardwareOptions | None = None,
    provider=None,
    backend: str = "flat",
    output=None,
    positionsFrom=None,
    targetGpu: int = -1,
):
    """Minimize all conformers of all molecules under MMFF94.

    ``output`` follows the reference's ``CoordinateOutput``
    (``nvmolkit/mmffOptimization.py:45-67``): the default CONFORMERS
    writes minimized coordinates back into each molecule's conformer
    list and returns ``(results, dense)``; DEVICE skips the writeback
    and returns only the device-resident :class:`Dense3DResult`.

    ``positionsFrom`` accepts a device-resident :class:`Dense3DResult`
    (e.g. from ``EmbedMolecules``) as the coordinate source — the
    embed -> optimize chain then never round-trips positions through
    host conformer lists (reference contract:
    ``src/conformer/ff_device_collect.h:64-97``).

    ``results[mol][conf] = (not_converged, energy)`` (0 = converged). Parametrization comes
    from ``provider`` (default: RDKit when importable, else the
    documented approximate provider — see models/mmff/providers.py).
    ``properties`` may be one MMFFProperties or a per-molecule list
    (reference behavior, ``nvmolkit/mmffOptimization.py:145-196``);
    molecules sharing a properties signature run in one batch.

    ``targetGpu`` mirrors the reference's device-selection knob
    (``nvmolkit/mmffOptimization.py:46``): >= 0 selects that chip when
    ``hardwareOptions.deviceIds`` is unset; -1 keeps the default.

    Raises the reference's structured ``ValueError``
    (``nvmolkit/mmffOptimization.py:101-111``) when inputs are invalid:
    ``e.args[1]`` is ``{"none": [...], "no_params": [...]}`` with the
    offending molecule indices (``no_params`` is populated under the
    RDKit provider, which is where parametrization can fail).
    """
    from nvmolkit_tpu.types import CoordinateOutput as _CO

    if not molecules:
        if output == _CO.DEVICE:
            raise ValueError(
                "MMFFOptimizeMoleculesConfs(output=DEVICE) requires at "
                "least one molecule"
            )
        return [], None

    none_indices = [i for i, m in enumerate(molecules) if m is None]
    no_params_indices: list[int] = []
    if not none_indices:
        from nvmolkit_tpu.models.mmff.providers import RDKitMMFFProvider, default_provider

        prov = provider or default_provider()
        if isinstance(prov, RDKitMMFFProvider):
            from rdkit.Chem import AllChem

            for i, m in enumerate(molecules):
                rmol = getattr(m, "rdkit_mol", m)
                if not AllChem.MMFFHasAllMoleculeParams(rmol):
                    no_params_indices.append(i)
    if none_indices or no_params_indices:
        parts = []
        if none_indices:
            parts.append(f"None at indices {none_indices}")
        if no_params_indices:
            parts.append(f"lacking MMFF atom types at indices {no_params_indices}")
        raise ValueError(
            "; ".join(parts),
            {"none": none_indices, "no_params": no_params_indices},
        )

    if targetGpu >= 0:
        hardwareOptions = hardwareOptions or HardwareOptions()
        if not hardwareOptions.deviceIds:
            hardwareOptions = dataclasses.replace(
                hardwareOptions, deviceIds=[targetGpu]
            )
    if isinstance(properties, list):
        if len(properties) != len(molecules):
            raise ValueError(
                f"properties list length {len(properties)} != "
                f"molecule count {len(molecules)}"
            )
        n = len(molecules)
        per_mol = [
            p
            or MMFFProperties(
                nonBondedThreshold=_per_mol(
                    nonBondedThreshold, i, n, "nonBondedThreshold"
                ),
                ignoreInterfragInteractions=_per_mol(
                    ignoreInterfragInteractions, i, n,
                    "ignoreInterfragInteractions",
                ),
            )
            for i, p in enumerate(properties)
        ]
    elif properties is not None:
        per_mol = [properties] * len(molecules)
    else:
        n = len(molecules)
        per_mol = [
            MMFFProperties(
                nonBondedThreshold=_per_mol(
                    nonBondedThreshold, i, n, "nonBondedThreshold"
                ),
                ignoreInterfragInteractions=_per_mol(
                    ignoreInterfragInteractions, i, n,
                    "ignoreInterfragInteractions",
                ),
            )
            for i in range(n)
        ]

    # group molecules by properties signature; one optimize pass each
    groups: dict[tuple, list[int]] = {}
    for mi, p in enumerate(per_mol):
        key = tuple(sorted(vars(p).items()))
        groups.setdefault(key, []).append(mi)

    results: list = [None] * len(molecules)
    dense_parts: list = []

    import jax.numpy as jnp

    for _key, mol_ids in groups.items():
        props = per_mol[mol_ids[0]]
        group_mols = [molecules[i] for i in mol_ids]
        group_pf = None
        if positionsFrom is not None:
            from nvmolkit_tpu.types import Dense3DResult as _D3

            if len(groups) == 1:
                group_pf = positionsFrom
            else:
                rows = jnp.asarray(mol_ids)
                group_pf = _D3(
                    positions=positionsFrom.positions[rows],
                    conf_mask=positionsFrom.conf_mask[rows],
                    atom_mask=positionsFrom.atom_mask[rows],
                )

        def make_batch(mols, max_atoms, _props=props):
            return make_batched_mmff(mols, max_atoms, _props, provider=provider)

        energies, statuses, dense = optimize_molecules_confs(
            group_mols,
            make_batch,
            mmff_energy_and_grad,
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

    if len(dense_parts) == 1:
        from nvmolkit_tpu.models.optimize import finalize_output

        return finalize_output(molecules, results, dense_parts[0][1], output)

    # merge group Dense3DResults back into input order
    from nvmolkit_tpu.models.optimize import finalize_output, merge_group_dense

    dense = merge_group_dense(molecules, dense_parts)

    return finalize_output(molecules, results, dense, output)
