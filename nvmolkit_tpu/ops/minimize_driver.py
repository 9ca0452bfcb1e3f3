"""Compacting minimize driver: full batch, then just the stragglers.

The reference compacts converged systems out of the batch every
iteration (``compactAndCountConverged``); under jit that would be a
dynamic shape, so the TPU version compacts once at a phase boundary:
run ``phase1_iters`` on the whole batch, gather the (typically few)
unconverged systems into a pow2-padded sub-batch, and finish only
those. Median-converging systems stop paying for the stragglers'
iterations — on embedded drug-like batches this is a ~2-2.5x
throughput win.

The phase-1 budget default (96 outer iterations) was re-tuned after
the f32-matmul precision fix: under exact arithmetic 96 gives both
the best converged fraction and near-best throughput (24 was fastest
only when bf16-rounded math let noise-floor exits fire early).
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp

from nvmolkit_tpu.ops.bfgs import BfgsResult, batched_bfgs_minimize
from nvmolkit_tpu.ops.lbfgs import batched_lbfgs_minimize
from nvmolkit_tpu.ops.lbfgs_flat import batched_lbfgs_flat_minimize

BACKENDS = {
    "bfgs": batched_bfgs_minimize,
    "lbfgs": batched_lbfgs_minimize,
    "flat": batched_lbfgs_flat_minimize,
}


def _gather_batch(batch, idx: np.ndarray, S: int):
    """Index the system axis of a force-field batch pytree."""
    def take(leaf):
        if not hasattr(leaf, "shape") or leaf.ndim == 0:
            return leaf
        if leaf.shape[0] == S:
            return leaf[idx]
        if leaf.ndim >= 2 and leaf.shape[0] == 4 and leaf.shape[1] == S:
            return leaf[:, idx]
        return leaf

    return jax.tree_util.tree_map(take, batch)


def minimize_compacting_start(
    energy_and_grad_fn,
    positions: jnp.ndarray,   # [S, A, D]
    atom_mask: jnp.ndarray,
    batch,
    max_iters: int = 200,
    grad_tol: float = 1e-4,
    backend: str = "flat",
    phase1_iters: int = 96,
):
    """Dispatch phase 1 without blocking; returns a finish() thunk.

    Splitting dispatch from the straggler sync lets a driver overlap the
    host-side assembly of the NEXT chunk with this chunk's phase-1
    device compute (the reference gets the same overlap from per-GPU
    OpenMP worker threads, ``bfgs_mmff.cpp:116-157``; XLA async dispatch
    plays that role here)."""
    if backend not in BACKENDS:
        raise ValueError(f"backend must be one of {sorted(BACKENDS)}, got {backend!r}")
    minimize = BACKENDS[backend]
    phase1 = min(phase1_iters, max_iters)
    if backend == "flat":
        # the flat backend counts device steps (energy evals), not outer
        # iterations; the median system accepts in ~2-3 probes per outer
        # iteration, so budget phase 1 accordingly
        phase_kw = {"max_iters": max_iters, "max_steps": 4 * phase1}
    else:
        phase_kw = {"max_iters": phase1}
    res = minimize(
        energy_and_grad_fn, positions, atom_mask,
        grad_tol=grad_tol, energy_args=batch, **phase_kw,
    )

    def finish() -> BfgsResult:
        return _finish_stragglers(
            minimize, energy_and_grad_fn, res, atom_mask, batch,
            max_iters=max_iters, grad_tol=grad_tol, backend=backend,
            phase1=phase1,
        )

    return finish


def minimize_compacting(
    energy_and_grad_fn,
    positions: jnp.ndarray,   # [S, A, D]
    atom_mask: jnp.ndarray,
    batch,
    max_iters: int = 200,
    grad_tol: float = 1e-4,
    backend: str = "flat",
    phase1_iters: int = 96,
) -> BfgsResult:
    return minimize_compacting_start(
        energy_and_grad_fn, positions, atom_mask, batch,
        max_iters=max_iters, grad_tol=grad_tol, backend=backend,
        phase1_iters=phase1_iters,
    )()


def _finish_stragglers(
    minimize, energy_and_grad_fn, res, atom_mask, batch,
    max_iters, grad_tol, backend, phase1,
) -> BfgsResult:
    S = res.positions.shape[0]
    if phase1 >= max_iters:
        return res
    conv = np.asarray(res.converged)
    todo = np.nonzero(~conv)[0]
    if len(todo) == 0:
        return res

    # pad the straggler set to a power of two to bound recompiles
    n_pad = 1 << max(3, int(np.ceil(np.log2(len(todo)))))
    n_pad = min(n_pad, S)
    idx = np.zeros(n_pad, np.int64)
    idx[: len(todo)] = todo  # padding duplicates system todo[0]... index 0 rows
    # Gather + minimize + scatter as ONE device program: the unfused
    # path paid one launch per batch leaf (~18 per chunk), and on the
    # tunneled chip each launch costs ~30 ms of round-trip latency.
    return _finish_fused(
        minimize, energy_and_grad_fn, jnp.asarray(idx),
        jnp.int32(len(todo)), res, atom_mask, batch,
        max_iters if backend == "flat" else max_iters - phase1,
        grad_tol,
    )


@partial(
    jax.jit,
    static_argnames=("minimize", "fn", "max_iters", "grad_tol"),
)
def _finish_fused(
    minimize, fn, idx, n_real, res, atom_mask, batch, max_iters, grad_tol
):
    S = res.positions.shape[0]
    sub_batch = _gather_batch(batch, idx, S)
    sub_res = minimize(
        fn,
        res.positions[idx],
        atom_mask[idx],
        max_iters=max_iters,
        grad_tol=grad_tol,
        energy_args=sub_batch,
    )
    # padding lanes scatter to index S, which JAX drops (out-of-bounds
    # scatter updates are ignored)
    valid = jnp.arange(idx.shape[0]) < n_real
    sidx = jnp.where(valid, idx, S)
    return BfgsResult(
        positions=res.positions.at[sidx].set(sub_res.positions),
        energies=res.energies.at[sidx].set(sub_res.energies),
        converged=res.converged.at[sidx].set(sub_res.converged),
        n_iters=res.n_iters + sub_res.n_iters,
    )
