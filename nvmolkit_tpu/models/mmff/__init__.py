"""MMFF94 force field: term tables, exact energy forms, parametrization.

Counterpart of the reference's ``src/forcefields/mmff.*`` +
``rdkit_extensions/mmff_flattened_builder.cpp``. The seven MMFF94 energy
terms (bond stretch, angle bend, stretch-bend, out-of-plane, torsion,
buffered-14-7 vdW, buffered electrostatics) are implemented exactly as
published (Halgren, J. Comput. Chem. 17 (1996) 490-519).

Parametrization is provider-based: the published MMFF94 parameter tables
are large data files this build does not embed, so

  * :class:`RDKitMMFFProvider` derives exact tables through RDKit when
    RDKit is importable (the reference's own strategy — it reuses
    RDKit's MMFF parameter lookup);
  * :class:`ApproximateMMFFProvider` produces UFF-derived approximate
    parameters so the MMFF kernels/benchmarks run standalone (clearly
    NOT publication-grade MMFF94 energies);
  * :func:`mmff_terms_from_arrays` accepts user-supplied tables.
"""

from nvmolkit_tpu.models.mmff.terms import (
    MMFFTerms,
    MMFFProperties,
    mmff_terms_from_arrays,
)
from nvmolkit_tpu.models.mmff.energy import (
    MMFFBatch,
    batch_mmff_terms,
    make_batched_mmff,
    mmff_energy,
    mmff_energy_and_grad,
)
from nvmolkit_tpu.models.mmff.providers import (
    ApproximateMMFFProvider,
    RDKitMMFFProvider,
    default_provider,
)
from nvmolkit_tpu.models.mmff.rules import EmpiricalMMFFProvider
from nvmolkit_tpu.models.mmff.typing import mmff_atom_types

__all__ = [
    "MMFFTerms",
    "MMFFProperties",
    "mmff_terms_from_arrays",
    "MMFFBatch",
    "batch_mmff_terms",
    "make_batched_mmff",
    "mmff_energy",
    "mmff_energy_and_grad",
    "ApproximateMMFFProvider",
    "EmpiricalMMFFProvider",
    "RDKitMMFFProvider",
    "default_provider",
    "mmff_atom_types",
]
