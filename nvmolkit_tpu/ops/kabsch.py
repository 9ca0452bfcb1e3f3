"""Batched Kabsch-optimal RMSD.

TPU-native redesign of the reference's conformer RMSD kernel
(``src/conformer_rmsd.cu``: one CUDA block per conformer pair, CUB
block reductions + a closed-form 3x3 solve by thread 0). Here every
pair is one lane of a batched computation: centroids and 3x3
cross-covariances come from einsums over [P, N, 3] stacks, and the
optimal superposition RMSD uses a batched 3x3 SVD
(``jnp.linalg.svd``) with the determinant sign correction:

    rmsd^2 = (tr(P'P) + tr(Q'Q) - 2 (s1 + s2 +/- s3)) / N
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp


@functools.partial(jax.jit, static_argnames=())
def batched_kabsch_rmsd(
    pos_a: jnp.ndarray,   # [P, N, 3]
    pos_b: jnp.ndarray,   # [P, N, 3]
    mask: jnp.ndarray,    # [P, N] bool (atoms used for alignment+RMSD)
) -> jnp.ndarray:
    """Optimal-superposition RMSD per pair -> [P]."""
    w = mask.astype(pos_a.dtype)[..., None]
    n = jnp.maximum(jnp.sum(w, axis=(1, 2)), 1.0)  # [P] (counts per pair)
    ca = jnp.sum(pos_a * w, axis=1) / n[:, None]
    cb = jnp.sum(pos_b * w, axis=1) / n[:, None]
    pa = (pos_a - ca[:, None, :]) * w
    pb = (pos_b - cb[:, None, :]) * w
    # cross covariance [P, 3, 3]
    h = jnp.einsum("pni,pnj->pij", pa, pb)
    s = jnp.linalg.svd(h, compute_uv=False)  # [P, 3] descending
    det = jnp.linalg.det(h)
    sig = jnp.where(det < 0, -1.0, 1.0)
    trace = s[:, 0] + s[:, 1] + sig * s[:, 2]
    sq = (
        jnp.sum(pa * pa, axis=(1, 2)) + jnp.sum(pb * pb, axis=(1, 2)) - 2.0 * trace
    )
    return jnp.sqrt(jnp.maximum(sq, 0.0) / n)


@functools.partial(jax.jit, static_argnames=())
def plain_rmsd(pos_a, pos_b, mask) -> jnp.ndarray:
    """RMSD without alignment (prealigned conformers)."""
    w = mask.astype(pos_a.dtype)[..., None]
    n = jnp.maximum(jnp.sum(w, axis=(1, 2)), 1.0)
    d = (pos_a - pos_b) * w
    return jnp.sqrt(jnp.sum(d * d, axis=(1, 2)) / n)
