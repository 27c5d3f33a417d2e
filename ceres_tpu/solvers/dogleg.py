"""Dogleg trust-region strategy (traditional + 2D subspace).

reference: dogleg_strategy.cc (718 LoC). Behaviour implemented fresh from
the classic algorithm, matching the reference's structure: a Gauss-Newton
point from the configured linear solver, the Cauchy point along the scaled
steepest-descent direction, and either the piecewise-linear dogleg path
(TRADITIONAL_DOGLEG) or minimization over span{gradient, GN} with the
trust-region constraint (SUBSPACE_DOGLEG). All branch logic is select-based
so the whole step is one compiled graph.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..types import DoglegType, LinearSolverType, PreconditionerType
from ..linalg.cg import conjugate_gradients
from ..linalg.dense import solve_dense_normal_cholesky, solve_dense_qr
from ..linalg.preconditioners import make_preconditioner
from .strategies import _model_cost_change


def make_dogleg_step_fn(program, options, evaluator):
    solver_type = options.linear_solver_type
    dogleg_type = options.dogleg_type
    min_diag = options.min_lm_diagonal
    max_diag = options.max_lm_diagonal

    def gauss_newton(jac_s, res_groups, grad_s, dsq):
        from .strategies import _flat_residuals

        if solver_type == LinearSolverType.DENSE_QR:
            dense = jac_s.to_dense()
            res_flat = _flat_residuals(program, res_groups)
            return solve_dense_qr(dense, res_flat, dsq), jnp.asarray(0, jnp.int32)
        if solver_type == LinearSolverType.DENSE_NORMAL_CHOLESKY:
            dense = jac_s.to_dense()
            res_flat = _flat_residuals(program, res_groups)
            return (
                solve_dense_normal_cholesky(dense, res_flat, dsq),
                jnp.asarray(0, jnp.int32),
            )
        prec = make_preconditioner(PreconditionerType.JACOBI, program, jac_s, dsq=dsq)
        result = conjugate_gradients(
            matvec=lambda v: jac_s.jtj_multiply(v, dsq),
            b=-grad_s,
            preconditioner=prec,
            max_iterations=min(
                options.max_linear_solver_iterations, program.num_effective_parameters
            ),
            tolerance=options.eta,
        )
        return result.x, result.iterations

    def step_fn(jac, res_groups, grad, radius, scale):
        jac_s = jac.scale_columns(scale)
        grad_s = grad * scale

        # Small fixed regularization for rank-deficient J'J: the reference
        # escalates mu on failure (dogleg_strategy.cc ComputeGaussNewtonStep);
        # here a clamped diagonal floor plays that role.
        colnorm2 = jac_s.squared_column_norms()
        dsq = jnp.clip(colnorm2, min_diag, max_diag) * 1e-12

        gn, lin_iters = gauss_newton(jac_s, res_groups, grad_s, dsq)
        gn_norm = jnp.linalg.norm(gn)

        # Cauchy point: alpha = |g|^2 / |J g|^2
        jg = jac_s.right_multiply(grad_s)
        g_norm2 = jnp.vdot(grad_s, grad_s)
        jg_norm2 = sum(jnp.vdot(m, m) for m in jg)
        if jac_s.axis_name:
            jg_norm2 = jax.lax.psum(jg_norm2, jac_s.axis_name)
        alpha = g_norm2 / jnp.where(jg_norm2 > 0, jg_norm2, 1.0)
        sd = -alpha * grad_s
        sd_norm = jnp.linalg.norm(sd)
        g_norm = jnp.sqrt(g_norm2)

        if dogleg_type == DoglegType.TRADITIONAL_DOGLEG:
            # Case 1: GN inside the region.
            # Case 2: Cauchy point outside: scale gradient to the boundary.
            # Case 3: interpolate sd -> gn to the boundary.
            diff = gn - sd
            a_ = jnp.vdot(diff, diff)
            b_ = 2.0 * jnp.vdot(sd, diff)
            c_ = jnp.vdot(sd, sd) - radius * radius
            disc = jnp.maximum(b_ * b_ - 4.0 * a_ * c_, 0.0)
            beta = jnp.where(
                a_ > 0, (-b_ + jnp.sqrt(disc)) / jnp.where(a_ > 0, 2.0 * a_, 1.0), 0.0
            )
            interp = sd + jnp.clip(beta, 0.0, 1.0) * diff
            bound_sd = -(radius / jnp.where(g_norm > 0, g_norm, 1.0)) * grad_s
            step = jnp.where(
                gn_norm <= radius,
                gn,
                jnp.where(sd_norm >= radius, bound_sd, interp),
            )
        else:
            # SUBSPACE_DOGLEG: minimize the quadratic model on
            # span{grad_s, gn} subject to |step| <= radius
            # (dogleg_strategy.cc ComputeSubspaceDoglegStep). Solved by
            # 2x2 eigen-style boundary search on the Gram basis.
            v1 = grad_s / jnp.where(g_norm > 0, g_norm, 1.0)
            w = gn - jnp.vdot(gn, v1) * v1
            w_norm = jnp.linalg.norm(w)
            v2 = w / jnp.where(w_norm > 0, w_norm, 1.0)
            basis = jnp.stack([v1, v2], axis=1)  # [n, 2]

            jv1 = jac_s.right_multiply(v1)
            jv2 = jac_s.right_multiply(v2)

            def dot_r(a_groups, b_groups):
                s = sum(jnp.vdot(a, b) for a, b in zip(a_groups, b_groups))
                if jac_s.axis_name:
                    s = jax.lax.psum(s, jac_s.axis_name)
                return s

            h = jnp.array(
                [
                    [dot_r(jv1, jv1) + jnp.vdot(v1 * dsq, v1), dot_r(jv1, jv2)],
                    [dot_r(jv1, jv2), dot_r(jv2, jv2) + jnp.vdot(v2 * dsq, v2)],
                ]
            )
            gq = basis.T @ grad_s  # [2]
            # unconstrained minimizer in the subspace
            y_unc = -jnp.linalg.solve(h, gq)
            inside = jnp.linalg.norm(basis @ y_unc) <= radius
            # boundary: parameterize y = radius*[cos t, sin t], scan t
            ts = jnp.linspace(0.0, 2.0 * jnp.pi, 64, endpoint=False)
            ys = radius * jnp.stack([jnp.cos(ts), jnp.sin(ts)], axis=1)  # [64,2]
            vals = 0.5 * jnp.einsum("ki,ij,kj->k", ys, h, ys) + ys @ gq
            y_bnd = ys[jnp.argmin(vals)]
            y = jnp.where(inside, y_unc, y_bnd)
            step = basis @ y
            step = jnp.where(
                gn_norm <= radius, gn, step
            )

        mcc = _model_cost_change(jac_s, step, res_groups)
        delta = scale * step
        valid = jnp.logical_and(jnp.all(jnp.isfinite(delta)), mcc > 0)
        return delta, mcc, lin_iters, valid

    return step_fn
