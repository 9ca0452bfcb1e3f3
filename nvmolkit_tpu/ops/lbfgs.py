"""Batched L-BFGS minimization (two-loop recursion).

The reference's minimizer is a faithful RDKit BFGS port and so is
:mod:`nvmolkit_tpu.ops.bfgs`. On TPU the O(N^2) inverse-Hessian state
is the throughput ceiling: the rank-2 update + matvec stream
[S, 3A, 3A] floats every iteration. This backend replaces the Hessian
with an m-deep (s, y) history — all per-iteration work is [S, N]
element-wise math and dot products, and memory traffic drops by ~N/m.
Line search and convergence tests are shared with the BFGS backend, so
both converge to the same minima (different trajectories).

Select with ``backend="lbfgs"`` in the optimize APIs (default) or
``backend="bfgs"`` for reference-exact trajectory semantics.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from nvmolkit_tpu.ops.bfgs import (
    EPS,
    MAXSTEP_FACTOR,
    TOLX,
    BfgsResult,
    _line_search,
)

HISTORY = 6


def batched_lbfgs_minimize(
    energy_and_grad_fn: Callable,
    positions: jnp.ndarray,  # [S, A, D]
    atom_mask: jnp.ndarray,  # [S, A]
    max_iters: int = 200,
    grad_tol: float = 1e-4,
    energy_args=None,
    history: int = HISTORY,
) -> BfgsResult:
    if energy_args is not None:
        return _lbfgs_jit(
            energy_and_grad_fn, positions, atom_mask, max_iters, grad_tol,
            energy_args, history,
        )

    def fn(p, _):
        return energy_and_grad_fn(p)

    return _lbfgs_impl(fn, positions, atom_mask, max_iters, grad_tol, None, history)


@partial(jax.jit, static_argnames=("fn", "max_iters", "grad_tol", "history"))
def _lbfgs_jit(fn, positions, atom_mask, max_iters, grad_tol, energy_args, history):
    return _lbfgs_impl(fn, positions, atom_mask, max_iters, grad_tol, energy_args, history)


def _lbfgs_impl(fn, positions, atom_mask, max_iters, grad_tol, energy_args, m):
    S, A, D = positions.shape
    N = D * A
    dof_mask = jnp.repeat(atom_mask, D, axis=1).reshape(S, N)
    n_dof = dof_mask.sum(axis=1).astype(positions.dtype)

    def e_flat(p):
        e, _ = fn(p.reshape(S, A, D), energy_args)
        return e

    def eg_flat(p):
        e, g = fn(p.reshape(S, A, D), energy_args)
        return e, g.reshape(S, N)

    pos0 = positions.reshape(S, N)
    e0, g0 = eg_flat(pos0)
    failed0 = ~(jnp.isfinite(e0) & jnp.all(jnp.isfinite(g0), axis=1))

    s_hist = jnp.zeros((m, S, N), positions.dtype)
    y_hist = jnp.zeros((m, S, N), positions.dtype)
    rho = jnp.zeros((m, S), positions.dtype)       # 0 marks an empty slot
    gamma0 = jnp.ones(S, positions.dtype)

    def direction_from_history(grad, s_hist, y_hist, rho, gamma):
        q = grad                                    # [S, N]
        alphas = []
        for i in range(m):                          # newest-first order
            a_i = rho[i] * jnp.sum(s_hist[i] * q, axis=1)
            a_i = jnp.where(rho[i] > 0, a_i, 0.0)
            q = q - a_i[:, None] * y_hist[i]
            alphas.append(a_i)
        q = q * gamma[:, None]
        for i in reversed(range(m)):
            b_i = rho[i] * jnp.sum(y_hist[i] * q, axis=1)
            b_i = jnp.where(rho[i] > 0, b_i, 0.0)
            q = q + (alphas[i] - b_i)[:, None] * s_hist[i]
        return -q

    def cond(st):
        converged, failed, it = st[6], st[7], st[8]
        return (it < max_iters) & jnp.any(~(converged | failed))

    def body(st):
        pos, e, grad, s_hist, y_hist, rho, converged, failed, it, gamma = st
        active = ~converged & ~failed
        direction = direction_from_history(grad, s_hist, y_hist, rho, gamma)

        step_norm = jnp.sqrt(jnp.sum(direction * direction, axis=1))
        max_step = MAXSTEP_FACTOR * jnp.maximum(
            jnp.sqrt(jnp.sum(pos * pos * dof_mask, axis=1)), n_dof
        )
        scale = jnp.where(
            step_norm > max_step, max_step / jnp.maximum(step_norm, 1e-30), 1.0
        )
        direction = direction * scale[:, None]

        new_pos, new_e, ls_ok, exhausted = _line_search(
            e_flat, pos, e, grad, direction, active
        )
        failed = failed | exhausted
        conv_ls = active & ~ls_ok & ~exhausted

        xi = new_pos - pos
        xi_rel = jnp.abs(xi) / jnp.maximum(jnp.abs(new_pos), 1.0)
        conv_x = jnp.max(jnp.where(dof_mask, xi_rel, 0.0), axis=1) < TOLX

        new_e2, new_grad = eg_flat(new_pos)
        gscaled = jnp.abs(new_grad) * jnp.maximum(jnp.abs(new_pos), 1.0)
        conv_g = (
            jnp.max(jnp.where(dof_mask, gscaled, 0.0), axis=1)
            / jnp.maximum(jnp.abs(new_e), 1.0)
        ) < grad_tol
        newly_conv = (conv_ls | (ls_ok & (conv_x | conv_g))) & active

        dgrad = new_grad - grad
        ys = jnp.sum(dgrad * xi, axis=1)
        yy = jnp.sum(dgrad * dgrad, axis=1)
        store = (ys > EPS) & ls_ok & active
        new_rho = jnp.where(store, 1.0 / jnp.maximum(ys, 1e-30), 0.0)
        # shift history (newest at index 0)
        s_hist = jnp.concatenate(
            [jnp.where(store[:, None], xi, 0.0)[None], s_hist[:-1]], axis=0
        )
        y_hist = jnp.concatenate(
            [jnp.where(store[:, None], dgrad, 0.0)[None], y_hist[:-1]], axis=0
        )
        rho = jnp.concatenate([new_rho[None], rho[:-1]], axis=0)
        gamma = jnp.where(store, ys / jnp.maximum(yy, 1e-30), gamma)

        upd = (ls_ok & active)[:, None]
        pos = jnp.where(upd, new_pos, pos)
        e = jnp.where(ls_ok & active, new_e2, e)
        grad = jnp.where(upd, new_grad, grad)
        converged = converged | newly_conv
        return pos, e, grad, s_hist, y_hist, rho, converged, failed, it + 1, gamma

    st0 = (
        pos0, e0, g0, s_hist, y_hist, rho,
        jnp.zeros(S, bool), failed0, jnp.int32(0), gamma0,
    )
    pos, e, grad, *_rest = jax.lax.while_loop(cond, body, st0)
    converged, failed, it = _rest[3], _rest[4], _rest[5]
    return BfgsResult(
        positions=pos.reshape(S, A, D),
        energies=e,
        converged=converged,
        n_iters=it,
    )
