"""Inner iterations: block-coordinate refinement of the eliminated blocks.

reference: coordinate_descent_minimizer.cc (273 LoC) — after each accepted
trust-region step, Ceres re-optimizes each parameter block of an
independent set with all other blocks fixed.

TPU-native design: the independent set is the Schur e-block partition (no
two e-blocks share a residual), so all per-block subproblems are solved
SIMULTANEOUSLY as batched damped Gauss-Newton sweeps:

    per observation:  r, J_e (Jacobian w.r.t. its e-block only, width t_e)
    per e-block:      JtJ, Jtr by segment-sum (c_idx class tables)
    batched solve:    (JtJ + lambda I)^-1 Jtr     [count, t_e, t_e]
    update:           plus() on the e-entries of the tangent vector

This replaces the reference's threaded per-block LM loops with one
MXU-shaped batched kernel; a host-level cost guard keeps the refinement
monotonic (the reference's per-block solves are monotone by construction).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..autodiff import value_and_jacobians
from ..corrector import correct_batched
from ..evaluator import plus as plus_fn


def _group_e_eval(meta, garr, state_2d, e_pos):
    """Residuals + Jacobian w.r.t. only the e-position for one group."""
    import jax.numpy as _jnp

    params = tuple(
        _jnp.take(state_2d[pm.a_cls], rows, axis=0)
        for pm, rows in zip(meta.positions, garr["a_rows"])
    )
    fn = meta.cost_function.fn
    data = garr["data"]
    mask = garr.get("mask")

    def single(ps, d):
        def f_of_e(pe):
            full = ps[:e_pos] + (pe,) + ps[e_pos + 1 :]
            return fn(full, d)

        res, (jac,) = value_and_jacobians(lambda p2, _d: f_of_e(p2[0]), (ps[e_pos],), d)
        return res, jac

    res, jac = jax.vmap(single)(params, data)
    pm = meta.positions[e_pos]
    if pm.manifold is not None:
        pj = jax.vmap(pm.manifold.plus_jacobian)(params[e_pos])
        jac = jnp.einsum("nrs,nst->nrt", jac, pj)
    if mask is not None:
        res = jnp.where(mask[:, None] > 0, res, 0.0)
        jac = jnp.where(mask[:, None, None] > 0, jac, 0.0)
    if meta.loss is not None:
        s = jnp.sum(res * res, axis=-1)
        rho0, rho1, rho2 = meta.loss.rho(s)
        res, (jac,) = correct_batched(res, [jac], rho0, rho1, rho2)
    return res, jac


def make_inner_iteration_fn(program, options, axis_name=None):
    """Build a jitted refinement: (arrays, state, damping) -> state'.

    One call performs a single batched GN sweep over all e-blocks.
    """
    _, e_positions, _ = program.compute_schur_partition()
    e_classes = sorted(
        {
            program.class_of_tsize[
                program.groups[gi].positions[eps[0]].tangent_size
            ]
            for gi, eps in enumerate(e_positions)
            if eps
        }
    )
    if not e_classes:
        return None

    import numpy as np

    e_mask_np, _ = program.schur_tangent_masks()
    e_mask_np = np.asarray(e_mask_np)

    def sweep(arrays, state, damping):
        from ..evaluator import state_tables

        dtype = state.dtype
        state_2d = state_tables(program, state)
        per_class_jtj = {
            c: jnp.zeros(
                (program.class_counts[c] + 1, program.class_tsizes[c], program.class_tsizes[c]),
                dtype,
            )
            for c in e_classes
        }
        per_class_jtr = {
            c: jnp.zeros((program.class_counts[c] + 1, program.class_tsizes[c]), dtype)
            for c in e_classes
        }
        for gi, (meta, garr) in enumerate(zip(program.groups, arrays["groups"])):
            eps = e_positions[gi]
            if not eps:
                continue
            e_pos = eps[0]
            res, jac = _group_e_eval(meta, garr, state_2d, e_pos)
            cls = meta.positions[e_pos].t_cls
            tr = garr["t_rows"][e_pos]
            cnt = program.class_counts[cls]
            n_g, r_g, t_g = jac.shape
            from ..jacobian import segment_outer_flat

            per_class_jtj[cls] = per_class_jtj[cls] + segment_outer_flat(
                jac.reshape(-1), tr, n_g, r_g, t_g, cnt + 1
            ).reshape(cnt + 1, t_g, t_g)
            per_class_jtr[cls] = per_class_jtr[cls] + jax.ops.segment_sum(
                jnp.einsum("nrp,nr->np", jac, res), tr, num_segments=cnt + 1
            )

        # assemble the tangent delta class by class (e-classes solve, others 0)
        parts = []
        for c in range(len(program.class_tsizes)):
            cnt = program.class_counts[c]
            s = program.class_tsizes[c]
            if c not in e_classes:
                parts.append(jnp.zeros((cnt, s), dtype))
                continue
            jtj = per_class_jtj[c][:-1]
            jtr = per_class_jtr[c][:-1]
            if axis_name:
                jtj = jax.lax.psum(jtj, axis_name)
                jtr = jax.lax.psum(jtr, axis_name)
            diag = jnp.maximum(jax.vmap(jnp.diag)(jtj), 1e-12)
            a = jtj + damping * jax.vmap(jnp.diag)(diag)
            parts.append(-jnp.linalg.solve(a, jtr[..., None])[..., 0])
        delta = jnp.concatenate([p.reshape(-1) for p in parts])
        return plus_fn(program, arrays, state, delta)

    return sweep


class InnerIterationRefiner:
    """Host-side wrapper: run `sweeps` batched GN sweeps with a monotonic
    cost guard. reference behaviour: CoordinateDescentMinimizer invoked from
    TrustRegionMinimizer::DoInnerIterationsIfNeeded
    (trust_region_minimizer.cc:504-583)."""

    def __init__(self, program, options, evaluator, sweeps: int = 2):
        self.evaluator = evaluator
        self.sweeps = sweeps
        fn = make_inner_iteration_fn(program, options, getattr(evaluator, "axis_name", None))
        self._sweep = jax.jit(fn) if fn is not None else None

    @property
    def available(self) -> bool:
        return self._sweep is not None

    def refine(self, state, cost: float):
        """Returns (state', cost') with cost' <= cost."""
        if self._sweep is None:
            return state, cost
        ev = self.evaluator
        damping = 1e-4
        for _ in range(self.sweeps):
            candidate = self._sweep(ev.arrays, state, jnp.asarray(damping, state.dtype))
            new_cost = float(ev.cost(candidate))
            if new_cost < cost:
                state, cost = candidate, new_cost
                damping = max(damping / 2.0, 1e-8)
            else:
                damping *= 10.0
        return state, cost
