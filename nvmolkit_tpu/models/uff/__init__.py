"""UFF (Universal Force Field) — typing, parametrization, batched energy.

Counterpart of the reference's ``src/forcefields/uff.*`` +
``rdkit_extensions/uff_flattened_builder.cpp``. The reference reuses
RDKit's UFF parameter lookup; this package has no RDKit dependency, so
atom typing and the bond/angle/torsion/inversion/vdW parameter equations
(Rappé et al., JACS 1992) are implemented here with the published UFF
parameter table embedded for the common elements.
"""

from nvmolkit_tpu.models.uff.builder import build_uff_terms, UFFBuildError
from nvmolkit_tpu.models.uff.energy import uff_energy, make_batched_uff

__all__ = ["build_uff_terms", "UFFBuildError", "uff_energy", "make_batched_uff"]
