"""Flat asynchronous batched L-BFGS: one energy+grad eval per device step.

The synchronous batched minimizers (:mod:`nvmolkit_tpu.ops.bfgs`,
:mod:`nvmolkit_tpu.ops.lbfgs`) nest a line-search ``while_loop`` inside
the outer iteration ``while_loop``. Every line-search round costs one
full-batch energy evaluation and runs until the SLOWEST system accepts,
so the per-outer-iteration eval count is the max over systems (~5-6
measured on embedded drug-like batches) even though the median system
accepts in 1-2 probes.

This backend flattens both loops into ONE ``lax.while_loop`` whose body
performs exactly one batched energy+gradient evaluation. Each system
carries its own Numerical-Recipes line-search state (lambda, previous
lambda/energy, probe count) and its own outer-iteration counter:

  * a system whose probe satisfies the sufficient-decrease test accepts
    immediately — updates its L-BFGS history, builds a new direction,
    and starts its next line search on the very next step;
  * a system that rejects backtracks lambda (quadratic first, then
    cubic, clamped to [0.1, 0.5] * lambda) and probes again next step.

No system ever idles waiting for a straggler's line search, so the
total step count approaches the MEAN per-system eval count instead of
the sum of per-iteration maxima (~2-3x fewer evals at large batch).

The gradient is computed on every probe (measured ~free next to the
energy on TPU v5e: both are dominated by the same streamed term
tables), which also removes the synchronous backends' duplicate
energy+grad call at the accepted position.

Per-system numerical semantics are IDENTICAL to the reference's RDKit
BFGS port (``src/minimizer/bfgs_minimize.cu:33-34, 275-295``): FUNCTOL
sufficient decrease, MOVETOL lambda underflow => converged (TOLX
semantics), maxStep direction cap, scaled-gradient convergence test.
The L-BFGS history replaces the O(9N^2) inverse Hessian exactly as in
:mod:`nvmolkit_tpu.ops.lbfgs`.
"""
from __future__ import annotations

from functools import partial
from typing import Callable

import jax
import jax.numpy as jnp

from nvmolkit_tpu.ops.bfgs import (
    EPS,
    FUNCTOL,
    TOLF,
    MAXSTEP_FACTOR,
    MAX_LS_ITERS,
    MOVETOL,
    TOLX,
    BfgsResult,
)

HISTORY = 6


# in-program straggler compaction (see _flat_impl): phase 1 runs the
# whole batch for this many steps, then the live systems are ranked to
# a front prefix of S // COMPACT_DIV rows and only that sub-batch keeps
# stepping. OPT-IN via compact_after: it triples the while_loop count
# inside the program and re-traces the energy fn at the sub-batch
# shape, which ballooned XLA compile time past 10 minutes when the
# embed pipeline's already-large fused programs picked it up by
# default (runtime results are bit-identical either way).
COMPACT_DIV = 4


def batched_lbfgs_flat_minimize(
    energy_and_grad_fn: Callable,
    positions: jnp.ndarray,  # [S, A, D]
    atom_mask: jnp.ndarray,  # [S, A]
    max_iters: int = 200,
    grad_tol: float = 1e-4,
    energy_args=None,
    history: int = HISTORY,
    max_steps: int | None = None,
    compact_after: int | None = None,
) -> BfgsResult:
    """``max_steps`` bounds the number of device steps (= energy evals);
    systems still live at the bound come back with converged=False —
    used by the compacting driver to cut a phase at a step budget.

    ``compact_after`` opts in to the in-program straggler compaction
    (None/0 = off — the default, since the extra loops and the
    sub-batch re-trace of the energy fn cost real compile time).
    Per-system results are bit-identical either way — every op in the
    step body is per-system, so regrouping rows changes nothing but
    wall time."""
    if energy_args is not None:
        return _flat_jit(
            energy_and_grad_fn, positions, atom_mask, max_iters, grad_tol,
            energy_args, history, max_steps, compact_after,
        )

    def fn(p, _):
        return energy_and_grad_fn(p)

    return _flat_impl(
        fn, positions, atom_mask, max_iters, grad_tol, None, history,
        max_steps, compact_after,
    )


@partial(
    jax.jit,
    static_argnames=(
        "fn", "max_iters", "grad_tol", "history", "max_steps", "compact_after"
    ),
)
def _flat_jit(
    fn, positions, atom_mask, max_iters, grad_tol, energy_args, history,
    max_steps, compact_after,
):
    return _flat_impl(
        fn, positions, atom_mask, max_iters, grad_tol, energy_args, history,
        max_steps, compact_after,
    )


# state leaves with the system axis at axis 0 vs axis 1 (histories)
_AXIS0_KEYS = (
    "pos", "e", "grad", "direction", "slope", "lam", "lam2", "e2",
    "lam_min", "ls_it", "gamma", "outer", "converged", "failed", "capped",
)
_AXIS1_KEYS = ("s_hist", "y_hist", "rho")


def _gather_state(st: dict, idx) -> dict:
    out = {k: st[k][idx] for k in _AXIS0_KEYS}
    out.update({k: st[k][:, idx] for k in _AXIS1_KEYS})
    out["steps"] = st["steps"]
    return out


def _scatter_state(st: dict, sub: dict, idx) -> dict:
    out = {k: st[k].at[idx].set(sub[k]) for k in _AXIS0_KEYS}
    out.update({k: st[k].at[:, idx].set(sub[k]) for k in _AXIS1_KEYS})
    out["steps"] = sub["steps"]
    return out


def _gather_args(energy_args, idx, S):
    """Index the system axis of an energy-args pytree (same contract as
    ops/minimize_driver._gather_batch: leading S, or [4, S, ...])."""
    def take(leaf):
        if not hasattr(leaf, "shape") or leaf.ndim == 0:
            return leaf
        if leaf.shape[0] == S:
            return leaf[idx]
        if leaf.ndim >= 2 and leaf.shape[0] == 4 and leaf.shape[1] == S:
            return leaf[:, idx]
        return leaf

    return jax.tree_util.tree_map(take, energy_args)


def _flat_impl(
    fn, positions, atom_mask, max_iters, grad_tol, energy_args, m,
    max_steps=None, compact_after=None,
):
    S, A, D = positions.shape
    N = D * A
    dtype = positions.dtype
    dof_mask = jnp.repeat(atom_mask, D, axis=1).reshape(S, N)
    n_dof = dof_mask.sum(axis=1).astype(dtype)

    def eg_flat(p):
        e, g = fn(p.reshape(S, A, D), energy_args)
        return e, g.reshape(S, N)

    def two_loop(grad, s_hist, y_hist, rho, gamma):
        q = grad
        alphas = []
        for i in range(m):  # newest-first
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

    def make_loop(eg, dmask, ndof, step_cap):
        """(prep_direction, lam_min_of, cond, body) closures for one
        (sub-)batch: every op in the body is per-system, so running the
        same system through any regrouping of rows yields bit-identical
        results — the property the straggler-compaction phases below
        rely on."""

        def prep_direction(pos, raw_dir):
            """Cap at maxStep."""
            step_norm = jnp.sqrt(jnp.sum(raw_dir * raw_dir, axis=1))
            max_step = MAXSTEP_FACTOR * jnp.maximum(
                jnp.sqrt(jnp.sum(pos * pos * dmask, axis=1)), ndof
            )
            scale = jnp.where(
                step_norm > max_step,
                max_step / jnp.maximum(step_norm, 1e-30),
                1.0,
            )
            return raw_dir * scale[:, None]

        def lam_min_of(pos, direction):
            rel = jnp.abs(direction) / jnp.maximum(jnp.abs(pos), 1.0)
            return MOVETOL / jnp.maximum(jnp.max(rel, axis=1), 1e-30)

        def cond(st):
            live = ~(st["converged"] | st["failed"] | st["capped"])
            return jnp.any(live) & (st["steps"] < step_cap)

        def body(st):
            live = ~(st["converged"] | st["failed"] | st["capped"])
            pos, e, grad = st["pos"], st["e"], st["grad"]
            lam, lam2, e2 = st["lam"], st["lam2"], st["e2"]
            direction, slope = st["direction"], st["slope"]

            trial = pos + lam[:, None] * direction
            e_t, g_t = eg(trial)

            # --- NR sufficient-decrease test ---------------------------
            accept = (e_t - e <= FUNCTOL * lam * slope) & live

            # --- backtracking lambda for rejecting systems --------------
            rhs1 = e_t - e - lam * slope
            rhs2 = e2 - e - lam2 * slope
            denom = jnp.where(lam != lam2, lam - lam2, 1.0)
            a = (
                rhs1 / jnp.maximum(lam**2, 1e-30)
                - rhs2 / jnp.maximum(lam2**2, 1e-30)
            ) / denom
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
            quad = -slope * lam * lam / (2.0 * jnp.maximum(rhs1, 1e-30))
            tmp = jnp.where(st["ls_it"] == 0, quad, cubic)
            tmp = jnp.minimum(tmp, 0.5 * lam)
            new_lam = jnp.maximum(tmp, 0.1 * lam)

            reject = live & ~accept
            # lambda underflow: no acceptable move => NR returns
            # check=true, which the BFGS driver treats as
            # position-converged (TOLX).
            conv_ls = reject & (new_lam < st["lam_min"])
            # probe-count cap: NaN-poisoned or pathological line searches
            exhausted = reject & (st["ls_it"] + 1 >= MAX_LS_ITERS) & ~conv_ls

            # --- accept path: convergence tests + L-BFGS update ---------
            xi = jnp.where(accept[:, None], trial - pos, 0.0)
            xi_rel = jnp.abs(xi) / jnp.maximum(jnp.abs(trial), 1.0)
            conv_x = jnp.max(jnp.where(dmask, xi_rel, 0.0), axis=1) < TOLX
            gscaled = jnp.abs(g_t) * jnp.maximum(jnp.abs(trial), 1.0)
            conv_g = (
                jnp.max(jnp.where(dmask, gscaled, 0.0), axis=1)
                / jnp.maximum(jnp.abs(e_t), 1.0)
            ) < grad_tol
            # functional-decrease test (RDKit minimizer convergence,
            # ``ForceField/MinimizeLib``): an accepted step whose
            # decrease is at the f32 noise floor is converged — without
            # it a straggler grinds max_iters noise-accepts at ~8
            # probes each
            conv_f = 2.0 * jnp.abs(e - e_t) <= TOLF * (
                jnp.abs(e) + jnp.abs(e_t) + 1e-10
            )
            newly_conv = accept & (conv_x | conv_g | conv_f)

            dgrad = g_t - grad
            ys = jnp.sum(dgrad * xi, axis=1)
            yy = jnp.sum(dgrad * dgrad, axis=1)
            store = (ys > EPS) & accept
            new_rho = jnp.where(store, 1.0 / jnp.maximum(ys, 1e-30), 0.0)
            acc_row = accept[:, None]

            s_hist, y_hist, rho = st["s_hist"], st["y_hist"], st["rho"]
            new_s = [
                jnp.where(acc_row, jnp.where(store[:, None], xi, 0.0), s_hist[0])
            ]
            new_y = [
                jnp.where(
                    acc_row, jnp.where(store[:, None], dgrad, 0.0), y_hist[0]
                )
            ]
            new_r = [jnp.where(accept, new_rho, rho[0])]
            for i in range(1, m):
                new_s.append(jnp.where(acc_row, s_hist[i - 1], s_hist[i]))
                new_y.append(jnp.where(acc_row, y_hist[i - 1], y_hist[i]))
                new_r.append(jnp.where(accept, rho[i - 1], rho[i]))
            s_hist = jnp.stack(new_s, axis=0)
            y_hist = jnp.stack(new_y, axis=0)
            rho = jnp.stack(new_r, axis=0)
            gamma = jnp.where(store, ys / jnp.maximum(yy, 1e-30), st["gamma"])

            # new state for accepted systems
            pos = jnp.where(acc_row, trial, pos)
            e = jnp.where(accept, e_t, e)
            grad = jnp.where(acc_row, g_t, grad)
            outer = st["outer"] + accept.astype(jnp.int32)
            capped = st["capped"] | (
                accept & ~newly_conv & (outer >= max_iters)
            )

            raw_dir = two_loop(grad, s_hist, y_hist, rho, gamma)
            new_dir = prep_direction(pos, raw_dir)
            direction = jnp.where(acc_row, new_dir, direction)
            slope = jnp.where(
                accept, jnp.sum(grad * direction, axis=1), slope
            )
            lam_min = jnp.where(
                accept, lam_min_of(pos, direction), st["lam_min"]
            )

            lam2 = jnp.where(accept, 0.0, jnp.where(reject, lam, lam2))
            e2 = jnp.where(accept, e, jnp.where(reject, e_t, e2))
            lam = jnp.where(accept, 1.0, jnp.where(reject, new_lam, lam))
            ls_it = jnp.where(accept, 0, st["ls_it"] + reject.astype(jnp.int32))

            return dict(
                pos=pos, e=e, grad=grad, direction=direction, slope=slope,
                lam=lam, lam2=lam2, e2=e2, lam_min=lam_min, ls_it=ls_it,
                s_hist=s_hist, y_hist=y_hist, rho=rho, gamma=gamma,
                outer=outer,
                converged=st["converged"] | newly_conv | conv_ls,
                failed=st["failed"] | exhausted,
                capped=capped,
                steps=st["steps"] + 1,
            )

        return prep_direction, lam_min_of, cond, body

    pos0 = positions.reshape(S, N)
    e0, g0 = eg_flat(pos0)
    prep_direction, lam_min_of, _c, _b = make_loop(
        eg_flat, dof_mask, n_dof, 0
    )
    failed0 = ~(jnp.isfinite(e0) & jnp.all(jnp.isfinite(g0), axis=1))
    # zero-gradient test BEFORE the first step (NR dfpmin does the same):
    # re-minimizing an already-minimized system must exit immediately, not
    # grind a full pathological line search at the f32 noise floor
    gs0 = jnp.abs(g0) * jnp.maximum(jnp.abs(pos0), 1.0)
    conv0 = (
        jnp.max(jnp.where(dof_mask, gs0, 0.0), axis=1)
        / jnp.maximum(jnp.abs(e0), 1.0)
    ) < grad_tol
    dir0 = prep_direction(pos0, -g0)

    st0 = dict(
        pos=pos0,
        e=e0,
        grad=g0,
        direction=dir0,
        slope=jnp.sum(g0 * dir0, axis=1),
        lam=jnp.ones(S, dtype),
        lam2=jnp.zeros(S, dtype),
        e2=e0,
        lam_min=lam_min_of(pos0, dir0),
        ls_it=jnp.zeros(S, jnp.int32),
        s_hist=jnp.zeros((m, S, N), dtype),
        y_hist=jnp.zeros((m, S, N), dtype),
        rho=jnp.zeros((m, S), dtype),
        gamma=jnp.ones(S, dtype),
        outer=jnp.zeros(S, jnp.int32),
        converged=conv0 & ~failed0,
        failed=failed0,
        capped=jnp.zeros(S, bool),
        steps=jnp.int32(0),
    )

    if max_steps is None:
        # Hard safety bound; unreachable in practice (each accept resets the
        # per-system probe counter, each system stops after max_iters accepts).
        max_steps = max_iters * MAX_LS_ITERS

    _p, _l, cond, body = make_loop(eg_flat, dof_mask, n_dof, max_steps)

    if compact_after is None:
        compact_after = 0
    if compact_after and compact_after < max_steps and S >= 4 * COMPACT_DIV:
        # ---- straggler compaction, all inside this one program ----------
        # Phase 1: whole batch up to compact_after steps. Phase 2: rank
        # live systems to the front, gather a S // COMPACT_DIV prefix
        # (state + energy args), and keep stepping only that sub-batch.
        # Phase 3: a whole-batch mop-up loop for anything still live
        # (only non-trivial when > S // COMPACT_DIV stragglers remained
        # at the phase boundary — then it finishes them exactly as the
        # uncompacted loop would). Per-system math is unchanged by the
        # regrouping, so results are bit-identical to compact_after=0;
        # the win is purely that converged systems stop paying state
        # bandwidth for the straggler tail (the reference compacts with
        # compactAndCountConverged every iteration).
        _pc, _lc, cond1, body1 = make_loop(
            eg_flat, dof_mask, n_dof, compact_after
        )
        st = jax.lax.while_loop(cond1, body1, st0)

        S_sub = max(8, S // COMPACT_DIV)
        live = ~(st["converged"] | st["failed"] | st["capped"])
        order = jnp.argsort(~live, stable=True)          # live rows first
        idx = order[:S_sub]
        sub_st = _gather_state(st, idx)
        sub_args = _gather_args(energy_args, idx, S)
        sub_am = atom_mask[idx]
        sub_dmask = jnp.repeat(sub_am, D, axis=1).reshape(S_sub, N)
        sub_ndof = sub_dmask.sum(axis=1).astype(dtype)

        def sub_eg(p):
            e, g = fn(p.reshape(S_sub, A, D), sub_args)
            return e, g.reshape(S_sub, N)

        _ps, _ls, cond2, body2 = make_loop(
            sub_eg, sub_dmask, sub_ndof, max_steps
        )
        sub_st = jax.lax.while_loop(cond2, body2, sub_st)
        st = _scatter_state(st, sub_st, idx)
        # mop-up: exits immediately unless stragglers overflowed the prefix
        st = jax.lax.while_loop(cond, body, st)
    else:
        st = jax.lax.while_loop(cond, body, st0)
    return BfgsResult(
        positions=st["pos"].reshape(S, A, D),
        energies=st["e"],
        converged=st["converged"],
        n_iters=st["steps"],
    )
