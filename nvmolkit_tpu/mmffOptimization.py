"""Batch MMFF optimization — public API.

Mirrors the reference's ``nvmolkit/mmffOptimization.py:60-201``:
``MMFFOptimizeMoleculesConfs(molecules, maxIters, properties, ...)``
minimizes every conformer under MMFF94 with batched BFGS.
"""
from __future__ import annotations

from nvmolkit_tpu.chem.mol import Mol
from nvmolkit_tpu.models.mmff import MMFFProperties, make_batched_mmff, mmff_energy_and_grad
from nvmolkit_tpu.models.optimize import optimize_molecules_confs
from nvmolkit_tpu.utils.config import HardwareOptions


def MMFFOptimizeMoleculesConfs(
    molecules: list[Mol],
    maxIters: int = 200,
    properties: MMFFProperties | list[MMFFProperties] | None = None,
    nonBondedThreshold: float = 100.0,
    ignoreInterfragInteractions: bool = True,
    hardwareOptions: HardwareOptions | None = None,
    provider=None,
    backend: str = "flat",
):
    """Minimize all conformers of all molecules under MMFF94.

    Returns ``(results, dense)`` with ``results[mol][conf] =
    (not_converged, energy)`` (0 = converged). Parametrization comes
    from ``provider`` (default: RDKit when importable, else the
    documented approximate provider — see models/mmff/providers.py).
    """
    del ignoreInterfragInteractions
    if isinstance(properties, list):
        raise NotImplementedError(
            "per-molecule MMFFProperties lists are not supported yet; pass one"
        )
    props = properties or MMFFProperties(nonBondedThreshold=nonBondedThreshold)

    def make_batch(mols, max_atoms):
        return make_batched_mmff(mols, max_atoms, props, provider=provider)

    energies, statuses, dense = optimize_molecules_confs(
        molecules,
        make_batch,
        mmff_energy_and_grad,
        max_iters=maxIters,
        hardware_options=hardwareOptions,
        backend=backend,
    )
    results = [
        [(statuses[m][c], energies[m][c]) for c in range(len(molecules[m].conformers))]
        for m in range(len(molecules))
    ]
    return results, dense
