"""Batched triangle smoothing of distance-bounds matrices.

TPU-native redesign of the reference's ``src/triangle_smooth.cu``: the
reference launches one kernel per pivot k with a host loop
(``triangle_smooth.cu:25-27,172-173``); here the pivot loop is a
``lax.fori_loop`` inside one jitted program operating on the whole
padded batch [S, A, A]:

    ub[i,j] <- min(ub[i,j], ub[i,k] + ub[k,j])
    lb[i,j] <- max(lb[i,j], lb[i,k] - ub[k,j], lb[k,j] - ub[i,k])

Padded atoms carry +inf upper bounds so they never tighten real pairs.
Returns the smoothed bounds and a per-system consistency flag
(lb <= ub everywhere), mirroring the reference's on-device violation
detection.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

_BIG = 1e6


@functools.partial(jax.jit, static_argnames=())
def triangle_smooth_bounds(
    upper: jnp.ndarray,      # [S, A, A] f32
    lower: jnp.ndarray,      # [S, A, A] f32
    atom_mask: jnp.ndarray,  # [S, A] bool
):
    """Floyd-Warshall smoothing over all systems at once.

    Returns (upper, lower, consistent [S] bool).
    """
    S, A, _ = upper.shape
    pair_mask = atom_mask[:, :, None] & atom_mask[:, None, :]
    ub = jnp.where(pair_mask, upper, _BIG)
    lb = jnp.where(pair_mask, lower, 0.0)

    def pivot(k, carry):
        ub, lb = carry
        ub_ik = ub[:, :, k]                       # [S, A]
        ub_kj = ub[:, k, :]                       # [S, A]
        lb_ik = lb[:, :, k]
        lb_kj = lb[:, k, :]
        thru = ub_ik[:, :, None] + ub_kj[:, None, :]
        ub = jnp.minimum(ub, thru)
        lb = jnp.maximum(
            lb,
            jnp.maximum(
                lb_ik[:, :, None] - ub_kj[:, None, :],
                lb_kj[:, None, :] - ub_ik[:, :, None],
            ),
        )
        return ub, lb

    ub, lb = jax.lax.fori_loop(0, A, pivot, (ub, lb))
    viol = (lb > ub + 1e-5) & pair_mask
    consistent = ~jnp.any(viol, axis=(1, 2))
    # keep diagonal clean
    eye = jnp.eye(A, dtype=bool)
    ub = jnp.where(eye, 0.0, ub)
    lb = jnp.where(eye, 0.0, lb)
    return ub, lb, consistent
