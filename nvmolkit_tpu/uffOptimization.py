"""Batch UFF optimization — public API.

Mirrors the reference's ``nvmolkit/uffOptimization.py``:
``UFFOptimizeMoleculesConfs(molecules, maxIters, vdwThreshold, ...)``
minimizes every conformer of every molecule with batched BFGS and
returns per-conformer (status, energy) pairs plus dense coordinates.
"""
from __future__ import annotations

from nvmolkit_tpu.chem.mol import Mol
from nvmolkit_tpu.models.optimize import optimize_molecules_confs
from nvmolkit_tpu.models.uff.energy import make_batched_uff, uff_energy_and_grad
from nvmolkit_tpu.utils.config import HardwareOptions


def UFFOptimizeMoleculesConfs(
    molecules: list[Mol],
    maxIters: int = 200,
    vdwThreshold: float = 10.0,
    ignoreInterfragInteractions: bool = True,
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

    def make_batch(mols, max_atoms):
        # vdwThreshold prunes pairs whose combined well distance x_ij
        # exceeds it; the default (10 A) keeps every pair, matching the
        # reference's default behavior for drug-like molecules.
        return make_batched_uff(
            mols, max_atoms, vdw_threshold=vdwThreshold,
            ignore_interfrag=ignoreInterfragInteractions,
        )

    energies, statuses, dense = optimize_molecules_confs(
        molecules,
        make_batch,
        uff_energy_and_grad,
        max_iters=maxIters,
        hardware_options=hardwareOptions,
        backend=backend,
        positions_from=positionsFrom,
    )
    results = [
        [(statuses[m][c], energies[m][c]) for c in range(len(energies[m]))]
        for m in range(len(molecules))
    ]
    from nvmolkit_tpu.models.optimize import finalize_output

    return finalize_output(molecules, results, dense, output)
