"""Line-search minimization: directions + step-size search + outer loop.

reference: line_search_minimizer.cc (475), line_search.cc (883),
line_search_direction.cc (369), low_rank_inverse_hessian.cc (179 — L-BFGS),
polynomial.cc (interpolation). Capability parity re-designed functionally:

- directions: STEEPEST_DESCENT, NONLINEAR_CONJUGATE_GRADIENT
  (Fletcher-Reeves / Polak-Ribiere / Hestenes-Stiefel with automatic
  restarts), LBFGS (two-loop recursion over a device-resident history),
  BFGS (dense inverse-Hessian update).
- step search: ARMIJO backtracking with quadratic/cubic interpolation and
  WOLFE (strong curvature condition) with bracketing expansion, matching the
  reference's sufficient decrease/curvature parameters.

The oracle is a (cost, gradient) pair of jitted device functions plus a
`plus(state, step)` retraction, so the same driver serves the NLLS problem
path (LineSearchMinimizer) and the first-order GradientProblem API.
"""

from __future__ import annotations

import time
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from ..types import (
    CallbackReturnType,
    IterationSummary,
    LineSearchDirectionType,
    LineSearchType,
    NonlinearConjugateGradientType,
    TerminationType,
)


class _LBFGSMemory:
    """Two-loop recursion state (low_rank_inverse_hessian.cc)."""

    def __init__(self, max_rank: int, use_eigenvalue_scaling: bool):
        self.max_rank = max_rank
        self.use_eigenvalue_scaling = use_eigenvalue_scaling
        self.s_list: list = []
        self.y_list: list = []

    def update(self, s, y):
        sy = float(jnp.vdot(s, y))
        if sy <= 1e-14:
            return  # skip update that would break positive definiteness
        if len(self.s_list) >= self.max_rank:
            self.s_list.pop(0)
            self.y_list.pop(0)
        self.s_list.append((s, y, sy))
        self.y_list.append(y)

    def apply(self, g):
        """H g via two-loop recursion."""
        q = g
        alphas = []
        for s, y, sy in reversed(self.s_list):
            alpha = float(jnp.vdot(s, q)) / sy
            q = q - alpha * y
            alphas.append((alpha, sy))
        if self.s_list:
            # Oren eigenvalue scaling gamma = s'y / y'y approximates the
            # inverse Hessian's dominant eigenvalue; disabled, the initial
            # H0 is the identity (gamma = 1). reference:
            # low_rank_inverse_hessian.cc:134-160 (approximate_eigenvalue_
            # scale_ applied only when use_approximate_eigenvalue_scaling_).
            if self.use_eigenvalue_scaling:
                s, y, sy = self.s_list[-1]
                gamma = sy / float(jnp.vdot(y, y))
                q = gamma * q
        for (s, y, sy), (alpha, _) in zip(self.s_list, reversed(alphas)):
            beta = float(jnp.vdot(y, q)) / sy
            q = q + (alpha - beta) * s
        return q


def _interpolate_step(
    a_lo,
    f_lo,
    g_lo,
    a_hi,
    f_hi,
    interpolation: str,
    g_hi=None,
    extra_sample=None,
):
    """Minimizer of the true interpolating polynomial on [lo, hi].

    reference: line_search.cc:415-470
    (InterpolatingPolynomialMinimizingStepSize) +
    polynomial.cc MinimizeInterpolatingPolynomial. BISECTION takes the
    midpoint; QUADRATIC fits phi(a_lo), phi'(a_lo), phi(a_hi); CUBIC adds
    phi'(a_hi) when available (or a third sample, for the Armijo search
    that has no gradient at trial points), degrading to the quadratic fit
    otherwise. The candidate is kept strictly inside the bracket (5% end
    margin) so the search always shrinks it.
    """
    from .polynomial import FunctionSample, minimize_interpolating_polynomial

    if interpolation == "BISECTION" or not np.isfinite(f_hi):
        return 0.5 * (a_lo + a_hi)
    samples = [FunctionSample.with_gradient(a_lo, f_lo, g_lo)]
    if (
        interpolation == "CUBIC"
        and g_hi is not None
        and np.isfinite(g_hi)
    ):
        samples.append(FunctionSample.with_gradient(a_hi, f_hi, g_hi))
    else:
        samples.append(FunctionSample.valued(a_hi, f_hi))
        if (
            interpolation == "CUBIC"
            and extra_sample is not None
            and np.isfinite(extra_sample[1])
        ):
            samples.append(
                FunctionSample.valued(extra_sample[0], extra_sample[1])
            )
    lo, hi = min(a_lo, a_hi), max(a_lo, a_hi)
    span = hi - lo
    x, _ = minimize_interpolating_polynomial(
        samples, lo + 0.05 * span, hi - 0.05 * span
    )
    return float(x)


class LineSearchDriver:
    """Minimize via line search given cost/gradient/plus oracles.

    cost_fn(state) -> scalar; grad_fn(state) -> (cost, gradient[tangent]);
    plus_fn(state, step[tangent]) -> state.
    """

    def __init__(self, options, cost_fn, grad_fn, plus_fn, num_tangent: int):
        self.options = options
        self.cost_fn = cost_fn
        self.grad_fn = grad_fn
        self.plus_fn = plus_fn
        self.num_tangent = num_tangent

    # -- step size search ----------------------------------------------- #

    def _phi(self, state, direction, alpha, summary):
        x = self.plus_fn(state, alpha * direction)
        c = float(self.cost_fn(x))
        summary.num_residual_evaluations += 1
        return c, x

    def _phi_grad(self, state, direction, alpha, summary):
        x = self.plus_fn(state, alpha * direction)
        c, g = self.grad_fn(x)
        summary.num_jacobian_evaluations += 1
        return float(c), float(jnp.vdot(g, direction)), x, g

    def search(self, state, direction, cost, dphi0, initial_step, summary):
        """Returns (alpha, new_state, new_cost, new_grad or None, evals)."""
        opts = self.options
        c1 = opts.line_search_sufficient_function_decrease
        interpolation = opts.line_search_interpolation_type.value

        if opts.line_search_type == LineSearchType.ARMIJO:
            alpha = initial_step
            prev_trial = None  # (alpha, f) of the previous trial; gives the
            # CUBIC fit its 4th constraint (line_search.cc:440-452 uses the
            # previous sample when the current one has no gradient).
            for _ in range(opts.max_num_line_search_step_size_iterations):
                f, x = self._phi(state, direction, alpha, summary)
                if np.isfinite(f) and f <= cost + c1 * alpha * dphi0:
                    return alpha, x, f, None
                new_alpha = _interpolate_step(
                    0.0, cost, dphi0, alpha, f, interpolation,
                    extra_sample=prev_trial,
                )
                new_alpha = max(
                    new_alpha, alpha * opts.max_line_search_step_contraction
                )
                new_alpha = min(
                    new_alpha, alpha * opts.min_line_search_step_contraction
                )
                prev_trial = (alpha, f) if np.isfinite(f) else None
                alpha = new_alpha
                if alpha < opts.min_line_search_step_size:
                    break
            return None, None, None, None

        # WOLFE (strong): bracketing + zoom (Nocedal & Wright alg. 3.5/3.6,
        # the same structure as line_search.cc WolfeLineSearch).
        c2 = opts.line_search_sufficient_curvature_decrease
        alpha_prev, f_prev, dphi_prev = 0.0, cost, dphi0
        alpha = initial_step
        max_expansion = opts.max_line_search_step_expansion
        lo = hi = None
        for it in range(opts.max_num_line_search_step_size_iterations):
            f, dphi, x, g = self._phi_grad(state, direction, alpha, summary)
            if (not np.isfinite(f)) or f > cost + c1 * alpha * dphi0 or (
                it > 0 and f >= f_prev
            ):
                lo, f_lo, dphi_lo = alpha_prev, f_prev, dphi_prev
                hi, f_hi, dphi_hi = alpha, f, dphi
                break
            if abs(dphi) <= -c2 * dphi0:
                return alpha, x, f, g
            if dphi >= 0:
                lo, f_lo, dphi_lo = alpha, f, dphi
                hi, f_hi, dphi_hi = alpha_prev, f_prev, dphi_prev
                break
            alpha_prev, f_prev, dphi_prev = alpha, f, dphi
            alpha = min(alpha * 2.0, alpha * max_expansion)
        else:
            return None, None, None, None

        # zoom; both bracket ends carry (value, gradient) so the CUBIC fit
        # is the true two-point Hermite cubic (line_search.cc:415-470).
        for _ in range(opts.max_num_line_search_step_size_iterations):
            alpha = _interpolate_step(
                lo, f_lo, dphi_lo, hi, f_hi, interpolation, g_hi=dphi_hi
            )
            if abs(hi - lo) < opts.min_line_search_step_size:
                break
            f, dphi, x, g = self._phi_grad(state, direction, alpha, summary)
            if (not np.isfinite(f)) or f > cost + c1 * alpha * dphi0 or f >= f_lo:
                hi, f_hi, dphi_hi = alpha, f, dphi
            else:
                if abs(dphi) <= -c2 * dphi0:
                    return alpha, x, f, g
                if dphi * (hi - lo) >= 0:
                    hi, f_hi, dphi_hi = lo, f_lo, dphi_lo
                lo, f_lo, dphi_lo = alpha, f, dphi
        return None, None, None, None

    # -- outer loop ------------------------------------------------------ #

    def minimize(self, state, summary):
        opts = self.options
        start = time.time()
        cost, grad = self.grad_fn(state)
        cost = float(cost)
        summary.num_jacobian_evaluations += 1
        summary.initial_cost = cost + summary.fixed_cost
        if not np.isfinite(cost):
            summary.termination_type = TerminationType.FAILURE
            summary.message = "Initial cost is not finite."
            return state

        direction_type = opts.line_search_direction_type
        lbfgs = (
            _LBFGSMemory(opts.max_lbfgs_rank, opts.use_approximate_eigenvalue_bfgs_scaling)
            if direction_type == LineSearchDirectionType.LBFGS
            else None
        )
        bfgs_h = (
            jnp.eye(self.num_tangent, dtype=grad.dtype)
            if direction_type == LineSearchDirectionType.BFGS
            else None
        )
        prev_grad = None
        prev_direction = None
        prev_cost = None
        num_restarts = 0

        grad_max = float(jnp.max(jnp.abs(grad)))
        summary.iterations.append(
            IterationSummary(
                iteration=0,
                cost=cost + summary.fixed_cost,
                gradient_max_norm=grad_max,
                gradient_norm=float(jnp.linalg.norm(grad)),
                cumulative_time_in_seconds=time.time() - start,
            )
        )
        if grad_max <= opts.gradient_tolerance:
            summary.termination_type = TerminationType.CONVERGENCE
            summary.message = "Gradient tolerance reached."
            summary.final_cost = cost + summary.fixed_cost
            return state

        for iteration in range(1, opts.max_num_iterations + 1):
            it_start = time.time()
            if time.time() - start > opts.max_solver_time_in_seconds:
                summary.termination_type = TerminationType.NO_CONVERGENCE
                summary.message = "Maximum solver time reached."
                break

            # ---- direction (line_search_direction.cc) ----
            if direction_type == LineSearchDirectionType.STEEPEST_DESCENT:
                direction = -grad
            elif direction_type == LineSearchDirectionType.NONLINEAR_CONJUGATE_GRADIENT:
                if prev_grad is None:
                    direction = -grad
                else:
                    t = opts.nonlinear_conjugate_gradient_type
                    if t == NonlinearConjugateGradientType.FLETCHER_REEVES:
                        beta = float(jnp.vdot(grad, grad) / jnp.vdot(prev_grad, prev_grad))
                    elif t == NonlinearConjugateGradientType.POLAK_RIBIERE:
                        beta = float(
                            jnp.vdot(grad, grad - prev_grad)
                            / jnp.vdot(prev_grad, prev_grad)
                        )
                        beta = max(beta, 0.0)
                    else:  # HESTENES_STIEFEL
                        dy = grad - prev_grad
                        beta = float(
                            jnp.vdot(grad, dy)
                            / max(float(jnp.vdot(prev_direction, dy)), 1e-30)
                        )
                    direction = -grad + beta * prev_direction
            elif direction_type == LineSearchDirectionType.LBFGS:
                direction = -lbfgs.apply(grad)
            else:  # BFGS
                direction = -(bfgs_h @ grad)

            dphi0 = float(jnp.vdot(grad, direction))
            if dphi0 >= 0:
                # not a descent direction: restart from steepest descent
                num_restarts += 1
                if num_restarts > opts.max_num_line_search_direction_restarts:
                    summary.termination_type = TerminationType.FAILURE
                    summary.message = "Too many direction restarts."
                    break
                if lbfgs is not None:
                    lbfgs.s_list.clear()
                if bfgs_h is not None:
                    bfgs_h = jnp.eye(self.num_tangent, dtype=grad.dtype)
                prev_grad = None
                prev_cost = None  # restart -> first-iteration step policy
                direction = -grad
                dphi0 = float(jnp.vdot(grad, direction))

            # initial step (line_search_minimizer.cc:297-302): gradient-
            # scaled on the first iteration / after a restart, otherwise the
            # quadratic-model estimate from the previous cost decrease —
            # 2 (f_k - f_{k-1}) / phi'(0), which tends to 1 for Newton-like
            # directions and keeps the first Wolfe bracket near the
            # eventual step for gradient-based directions.
            if iteration == 1 or prev_cost is None:
                initial_step = min(
                    1.0, 1.0 / max(float(jnp.max(jnp.abs(grad))), 1e-12)
                )
            else:
                initial_step = min(1.0, 2.0 * (cost - prev_cost) / dphi0)
                if not np.isfinite(initial_step) or initial_step <= 0.0:
                    initial_step = min(
                        1.0, 1.0 / max(float(jnp.max(jnp.abs(grad))), 1e-12)
                    )

            result = self.search(state, direction, cost, dphi0, initial_step, summary)
            alpha, new_state, new_cost, new_grad = result
            if alpha is None:
                summary.termination_type = TerminationType.NO_CONVERGENCE
                summary.message = "Line search failed to find a valid step."
                break

            if new_grad is None:
                _, new_grad = self.grad_fn(new_state)
                summary.num_jacobian_evaluations += 1

            step = alpha * direction
            cost_change = cost - new_cost
            # curvature updates
            if lbfgs is not None:
                lbfgs.update(step, new_grad - grad)
            if bfgs_h is not None:
                s, y = step, new_grad - grad
                sy = float(jnp.vdot(s, y))
                if sy > 1e-14:
                    rho = 1.0 / sy
                    i_mat = jnp.eye(self.num_tangent, dtype=grad.dtype)
                    v = i_mat - rho * jnp.outer(s, y)
                    bfgs_h = v @ bfgs_h @ v.T + rho * jnp.outer(s, s)

            prev_grad = grad
            prev_direction = direction
            prev_cost = cost
            state, cost, grad = new_state, new_cost, new_grad
            summary.num_successful_steps += 1
            summary.num_line_search_steps += 1

            grad_max = float(jnp.max(jnp.abs(grad)))
            step_norm = float(jnp.linalg.norm(step))
            it_sum = IterationSummary(
                iteration=iteration,
                step_is_valid=True,
                step_is_successful=True,
                cost=cost + summary.fixed_cost,
                cost_change=cost_change,
                gradient_max_norm=grad_max,
                gradient_norm=float(jnp.linalg.norm(grad)),
                step_norm=step_norm,
                step_size=alpha,
                iteration_time_in_seconds=time.time() - it_start,
                cumulative_time_in_seconds=time.time() - start,
            )
            summary.iterations.append(it_sum)
            ret = CallbackReturnType.SOLVER_CONTINUE
            for cb in opts.callbacks:
                r = cb(it_sum)
                if r != CallbackReturnType.SOLVER_CONTINUE:
                    ret = r
            if ret == CallbackReturnType.SOLVER_TERMINATE_SUCCESSFULLY:
                summary.termination_type = TerminationType.USER_SUCCESS
                summary.message = "User callback requested termination."
                break
            if ret == CallbackReturnType.SOLVER_ABORT:
                summary.termination_type = TerminationType.USER_FAILURE
                summary.message = "User callback aborted."
                break

            if grad_max <= opts.gradient_tolerance:
                summary.termination_type = TerminationType.CONVERGENCE
                summary.message = "Gradient tolerance reached."
                break
            if abs(cost_change) <= opts.function_tolerance * cost:
                summary.termination_type = TerminationType.CONVERGENCE
                summary.message = "Function tolerance reached."
                break
            x_norm = float(jnp.linalg.norm(state))
            if step_norm <= opts.parameter_tolerance * (
                x_norm + opts.parameter_tolerance
            ):
                summary.termination_type = TerminationType.CONVERGENCE
                summary.message = "Parameter tolerance reached."
                break
        else:
            summary.termination_type = TerminationType.NO_CONVERGENCE
            summary.message = "Maximum number of iterations reached."

        summary.final_cost = cost + summary.fixed_cost
        return state


class LineSearchMinimizer:
    """NLLS problems under the line-search minimizer
    (reference: Minimizer::Create with LINE_SEARCH, line_search_minimizer.cc).
    """

    def __init__(self, program, options, evaluator):
        self.program = program
        self.options = options
        self.evaluator = evaluator

    def minimize(self, state, summary):
        ev = self.evaluator

        def cost_fn(x):
            return ev.cost(x)

        def grad_fn(x):
            cost, _, _, grad = ev.evaluate_groups(x)
            return cost, grad

        driver = LineSearchDriver(
            self.options,
            cost_fn,
            grad_fn,
            ev.plus,
            self.program.num_effective_parameters,
        )
        return driver.minimize(state, summary)
