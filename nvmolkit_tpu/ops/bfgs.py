"""Batched BFGS minimization with backtracking line search.

TPU-native redesign of the reference's ``BfgsBatchMinimizer``
(``src/minimizer/bfgs_minimize.h:51-286``), which ports RDKit's
Numerical-Recipes-style dfpmin + lnsrch. Semantics kept:

  * sufficient-decrease line search with quadratic-then-cubic
    backtracking, FUNCTOL=1e-4, MOVETOL=1e-7
    (``bfgs_minimize.cu:33-34, 275-295``),
  * per-system direction capped at maxStep = 100 * max(|x|, n)
    (``bfgs_minimize.cu:629``),
  * rank-2 inverse-Hessian update with the NR skip test,
  * convergence on either the TOLX position test or the scaled
    gradient test (gradTol).

Where the reference runs a host-driven loop of batched kernels (BATCHED
backend) or one fused kernel per molecule (PER_MOLECULE), the TPU
version is a single ``lax.while_loop`` over the whole batch with
per-system active masks — convergence "compaction" is masking, and the
line search is a nested ``lax.while_loop``. The O(9N^2) inverse-Hessian
update (``bfgs_hessian.cu``) is a batched outer-product einsum on the MXU.
"""
from __future__ import annotations

import dataclasses
from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

FUNCTOL = 1e-4
MOVETOL = 1e-7
TOLX = 4e-8
# functional-decrease convergence threshold. RDKit's BFGS stops at
# relative decreases under FUNCTOL (1e-4); we use a tighter 1e-6 so
# normal trajectories are unaffected and only noise-floor cycling
# (re-minimizing an already-minimized system in f32) terminates.
TOLF = 1e-6
MAXSTEP_FACTOR = 100.0
EPS = 3e-8
# Hard cap on line-search backtracks: lambda shrinks by at least 2x per
# step, so ~64 steps pass below any lambda_min; the cap also guarantees
# termination when NaN energies make both the accept and the underflow
# comparison false (NaN compares false with everything).
MAX_LS_ITERS = 64


@jax.tree_util.register_pytree_node_class
@dataclasses.dataclass
class BfgsResult:
    positions: jnp.ndarray   # [S, A, 3]
    energies: jnp.ndarray    # [S]
    converged: jnp.ndarray   # [S] bool (True = gradient/position test met)
    n_iters: jnp.ndarray     # [] int32 (outer iterations executed)

    def tree_flatten(self):
        return (self.positions, self.energies, self.converged, self.n_iters), None

    @classmethod
    def tree_unflatten(cls, aux, children):
        return cls(*children)


def _line_search(energy_fn, pos, e0, grad, direction, active):
    """Batched NR lnsrch. pos/direction [S, N]; returns (new_pos [S,N],
    new_e [S], ls_ok [S])."""
    S, N = pos.shape
    slope = jnp.sum(grad * direction, axis=1)                    # [S]
    # lambda_min = MOVETOL / max_i (|dir_i| / max(|x_i|, 1))
    rel = jnp.abs(direction) / jnp.maximum(jnp.abs(pos), 1.0)
    lam_min = MOVETOL / jnp.maximum(jnp.max(rel, axis=1), 1e-30)  # [S]

    def cond(st):
        lam, lam2, e_new, e2, p_new, done, failed, it = st
        del lam, lam2, e_new, e2, p_new
        return jnp.any(active & ~done & ~failed) & (it < MAX_LS_ITERS)

    def body(st):
        lam, lam2, e_new, e2, p_new, done, failed, it = st
        trial = pos + lam[:, None] * direction
        e_t = energy_fn(trial)                                   # [S]
        live = active & ~done & ~failed

        accept = e_t - e0 <= FUNCTOL * lam * slope
        # quadratic (first step) or cubic backtracking
        rhs1 = e_t - e0 - lam * slope
        rhs2 = e2 - e0 - lam2 * slope
        denom = jnp.where(lam != lam2, lam - lam2, 1.0)
        a = (rhs1 / jnp.maximum(lam**2, 1e-30) - rhs2 / jnp.maximum(lam2**2, 1e-30)) / denom
        b = (
            -lam2 * rhs1 / jnp.maximum(lam**2, 1e-30)
            + lam * rhs2 / jnp.maximum(lam2**2, 1e-30)
        ) / denom
        disc = b * b - 3.0 * a * slope
        a_safe = jnp.where(jnp.abs(a) < 1e-20, 1e-20, a)
        b_safe = jnp.where(jnp.abs(b) < 1e-20, 1e-20, b)
        cubic = jnp.where(
            jnp.abs(a) < 1e-20,
            -slope / (2.0 * b_safe),
            jnp.where(
                disc < 0,
                0.5 * lam,
                (-b + jnp.sqrt(jnp.maximum(disc, 0.0))) / (3.0 * a_safe),
            ),
        )
        # quadratic model through (0, e0) with given slope and (lam, e_t):
        # minimum at -slope * lam^2 / (2 rhs1)
        quad = -slope * lam * lam / (2.0 * jnp.maximum(rhs1, 1e-30))
        tmp = jnp.where(it == 0, quad, cubic)
        tmp = jnp.minimum(tmp, 0.5 * lam)
        new_lam = jnp.maximum(tmp, 0.1 * lam)

        fail_now = live & ~accept & (new_lam < lam_min)
        done_now = live & accept

        p_new = jnp.where((live & accept)[:, None], trial, p_new)
        e_new = jnp.where(live & accept, e_t, e_new)
        e2 = jnp.where(live & ~accept, e_t, e2)
        lam2 = jnp.where(live & ~accept, lam, lam2)
        lam = jnp.where(live & ~accept, new_lam, lam)
        done = done | done_now
        failed = failed | fail_now
        return lam, lam2, e_new, e2, p_new, done, failed, it + 1

    lam0 = jnp.ones(S, dtype=pos.dtype)
    st0 = (
        lam0,
        jnp.zeros(S, dtype=pos.dtype),
        e0,
        e0,
        pos,
        jnp.zeros(S, dtype=bool),
        ~active,  # inactive systems are treated as already failed (no move)
        jnp.int32(0),
    )
    lam, lam2, e_new, e2, p_new, done, failed, _ = jax.lax.while_loop(cond, body, st0)
    ls_ok = done & active
    # lanes still live at the cap (NaN-poisoned or pathological): no move
    exhausted = active & ~done & ~failed
    return p_new, jnp.where(ls_ok, e_new, e0), ls_ok, exhausted


def batched_bfgs_minimize(
    energy_and_grad_fn: Callable,
    positions: jnp.ndarray,  # [S, A, D] (D=3, or 4 for distance-geometry)
    atom_mask: jnp.ndarray,  # [S, A] bool
    max_iters: int = 200,
    grad_tol: float = 1e-4,
    energy_args=None,
    iter_caps=None,     # optional [S] int32 per-system iteration caps
    grad_tols=None,     # optional [S] f32 per-system gradient tolerances
) -> BfgsResult:
    """Minimize each system's energy with batched BFGS.

    ``iter_caps`` / ``grad_tols`` broadcast the reference's per-molecule
    ``maxIters`` / ``forceTol`` lists (``batchedForcefield.py:325-330``)
    to systems; a system that hits its cap unconverged reports
    ``converged=False``.

    Two calling conventions:

    * ``energy_args=None`` — ``energy_and_grad_fn(pos) -> (e, g)`` closure.
      Traced fresh per call (fine for one-off uses; closures over large
      arrays bake them into the program, which bloats remote compiles).
    * ``energy_args=<pytree>`` — ``energy_and_grad_fn(pos, energy_args)``.
      The whole minimization is jitted once per (fn, shapes, max_iters)
      and the args stream in as runtime inputs. Pass a module-level
      function so the jit cache hits across calls.
    """
    if energy_args is not None:
        return _minimize_jit(
            energy_and_grad_fn, positions, atom_mask, max_iters, grad_tol,
            energy_args, iter_caps, grad_tols,
        )

    def fn(p, _):
        return energy_and_grad_fn(p)

    return _minimize_impl(
        fn, positions, atom_mask, max_iters, grad_tol, None, iter_caps, grad_tols
    )


@partial(jax.jit, static_argnames=("fn", "max_iters", "grad_tol"))
def _minimize_jit(
    fn, positions, atom_mask, max_iters, grad_tol, energy_args,
    iter_caps=None, grad_tols=None,
):
    return _minimize_impl(
        fn, positions, atom_mask, max_iters, grad_tol, energy_args,
        iter_caps, grad_tols,
    )


def _minimize_impl(
    energy_and_grad_fn: Callable,
    positions: jnp.ndarray,
    atom_mask: jnp.ndarray,
    max_iters: int,
    grad_tol: float,
    energy_args,
    iter_caps=None,
    grad_tols=None,
) -> BfgsResult:
    S, A, D = positions.shape
    N = D * A
    dof_mask = jnp.repeat(atom_mask, D, axis=1).reshape(S, N)
    n_dof = dof_mask.sum(axis=1).astype(positions.dtype)

    def e_flat(p_flat):
        e, _ = energy_and_grad_fn(p_flat.reshape(S, A, D), energy_args)
        return e

    def eg_flat(p_flat):
        e, g = energy_and_grad_fn(p_flat.reshape(S, A, D), energy_args)
        return e, g.reshape(S, N)

    pos0 = positions.reshape(S, N)
    e0, g0 = eg_flat(pos0)
    hess0 = jnp.broadcast_to(jnp.eye(N, dtype=positions.dtype), (S, N, N))
    dir0 = -g0
    failed0 = ~(jnp.isfinite(e0) & jnp.all(jnp.isfinite(g0), axis=1))
    # zero-gradient convergence at entry (NR dfpmin's pre-loop test)
    gs0 = jnp.abs(g0) * jnp.maximum(jnp.abs(pos0), 1.0)
    tol0 = grad_tol if grad_tols is None else grad_tols
    conv0 = (
        jnp.max(jnp.where(dof_mask, gs0, 0.0), axis=1)
        / jnp.maximum(jnp.abs(e0), 1.0)
    ) < tol0

    def cond(st):
        converged, failed, it = st[4], st[5], st[6]
        return (it < max_iters) & jnp.any(~(converged | failed))

    def body(st):
        pos, e, grad, hess, converged, failed, it, direction = st
        active = ~converged & ~failed

        # cap step length per system
        step_norm = jnp.sqrt(jnp.sum(direction * direction, axis=1))
        max_step = MAXSTEP_FACTOR * jnp.maximum(
            jnp.sqrt(jnp.sum(pos * pos * dof_mask, axis=1)), n_dof
        )
        scale = jnp.where(step_norm > max_step, max_step / jnp.maximum(step_norm, 1e-30), 1.0)
        direction = direction * scale[:, None]

        new_pos, new_e, ls_ok, exhausted = _line_search(
            e_flat, pos, e, grad, direction, active
        )
        failed = failed | exhausted
        # NR lnsrch semantics: lambda underflow (no acceptable step) means
        # the position cannot improve -> the TOLX test fires -> converged.
        conv_ls = active & ~ls_ok & ~exhausted

        xi = new_pos - pos
        # TOLX position-convergence test
        xi_rel = jnp.abs(xi) / jnp.maximum(jnp.abs(new_pos), 1.0)
        conv_x = jnp.max(jnp.where(dof_mask, xi_rel, 0.0), axis=1) < TOLX

        new_e2, new_grad = eg_flat(new_pos)
        # scaled gradient test
        gscaled = jnp.abs(new_grad) * jnp.maximum(jnp.abs(new_pos), 1.0)
        tol = grad_tol if grad_tols is None else grad_tols
        conv_g = (
            jnp.max(jnp.where(dof_mask, gscaled, 0.0), axis=1)
            / jnp.maximum(jnp.abs(new_e), 1.0)
        ) < tol
        # functional-decrease convergence (RDKit minimizer semantics):
        # a step that changes the energy only at the noise floor is done
        conv_f = 2.0 * jnp.abs(e - new_e2) <= TOLF * (
            jnp.abs(e) + jnp.abs(new_e2) + 1e-10
        )
        newly_conv = (conv_ls | (ls_ok & (conv_x | conv_g | conv_f))) & active

        dgrad = new_grad - grad
        hdg = jnp.einsum("sij,sj->si", hess, dgrad)
        fac = jnp.sum(dgrad * xi, axis=1)
        fae = jnp.sum(dgrad * hdg, axis=1)
        sumdg = jnp.sum(dgrad * dgrad, axis=1)
        sumxi = jnp.sum(xi * xi, axis=1)
        do_update = (fac > jnp.sqrt(EPS * sumdg * sumxi)) & ls_ok & active
        fac_i = 1.0 / jnp.maximum(fac, 1e-30)
        fad_i = 1.0 / jnp.maximum(fae, 1e-30)
        u = fac_i[:, None] * xi - fad_i[:, None] * hdg
        dh = (
            fac_i[:, None, None] * jnp.einsum("si,sj->sij", xi, xi)
            - fad_i[:, None, None] * jnp.einsum("si,sj->sij", hdg, hdg)
            + fae[:, None, None] * jnp.einsum("si,sj->sij", u, u)
        )
        hess = jnp.where(do_update[:, None, None], hess + dh, hess)

        upd = (ls_ok & active)[:, None]
        pos = jnp.where(upd, new_pos, pos)
        e = jnp.where(ls_ok & active, new_e2, e)
        grad = jnp.where(upd, new_grad, grad)
        direction = -jnp.einsum("sij,sj->si", hess, grad)
        converged = converged | newly_conv
        if iter_caps is not None:
            # per-system budget exhausted without converging -> stop it
            failed = failed | (active & ~newly_conv & (it + 1 >= iter_caps))
        return pos, e, grad, hess, converged, failed, it + 1, direction

    st0 = (
        pos0,
        e0,
        g0,
        hess0,
        conv0 & ~failed0,
        failed0,
        jnp.int32(0),
        dir0,
    )
    pos, e, grad, hess, converged, failed, it, _ = jax.lax.while_loop(cond, body, st0)
    return BfgsResult(
        positions=pos.reshape(S, A, D),
        energies=e,
        converged=converged,
        n_iters=it,
    )
