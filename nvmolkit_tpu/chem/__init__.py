"""Lightweight cheminformatics core.

The reference library operates on RDKit ``ROMol`` objects and reuses
RDKit's perception/parametrization (``rdkit_extensions/``, SURVEY.md §2.2).
This package has no hard RDKit dependency, so ``nvmolkit_tpu.chem``
provides the minimal molecule model the TPU pipelines need:

  * :class:`Mol` / :class:`Atom` / :class:`Bond` — an editable molecular
    graph with implicit-H accounting and flat-array export,
  * :func:`mol_from_smiles` — an OpenSMILES-subset parser (organic subset,
    bracket atoms, charges, isotopes, ring closures incl. %nn, branches,
    dots, stereo bond/atom markers),
  * ring perception (ring membership, smallest-ring sizes),
  * an optional adapter for RDKit molecules when RDKit is importable
    (:mod:`nvmolkit_tpu.chem.rdkit_adapter`).
"""

from nvmolkit_tpu.chem.mol import Atom, Bond, Mol, BondType
from nvmolkit_tpu.chem.smiles import mol_from_smiles

__all__ = ["Atom", "Bond", "Mol", "BondType", "mol_from_smiles"]
