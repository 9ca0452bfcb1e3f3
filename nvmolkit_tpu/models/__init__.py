"""Force-field models: batched term tables + differentiable energies.

TPU-native redesign of the reference's ``src/forcefields/`` (SURVEY.md
§2.6): the reference flattens per-term SoA tables with CSR offsets and
hand-written CUDA energy/gradient kernels; here each force field is a
pure JAX energy function over padded term tables (masks instead of CSR),
per-system energies via segment-sum, and gradients via ``jax.grad`` —
autodiff replaces the reference's 1:1 analytic gradient ports.
"""

from nvmolkit_tpu.models.terms import (
    TermTable,
    batch_terms_per_system,
    expand_batch_to_systems,
    slot_onehots,
    slot_onehots_device,
)

__all__ = [
    "TermTable",
    "batch_terms_per_system",
    "expand_batch_to_systems",
    "slot_onehots",
    "slot_onehots_device",
]
