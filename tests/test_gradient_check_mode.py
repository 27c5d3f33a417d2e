"""Solver-level gradient checking mode.

reference: Solver::Options::check_gradients (solver.cc:765-775 wires
GradientCheckingCostFunction; mismatches abort the solve)."""

import jax
import numpy as np

import ceres_tpu
from ceres_tpu import LinearSolverType, Problem, SolverOptions, TerminationType
from ceres_tpu.autodiff import CostFunction


def test_check_gradients_pass():
    p = Problem()
    x = p.add_parameter_block(np.array([3.0, 1.0]))
    p.add_residual_block(
        CostFunction(lambda ps, d: ps[0] - np.array([1.0, -2.0]), 2), None, [x]
    )
    s = ceres_tpu.solve(
        SolverOptions(
            check_gradients=True, linear_solver_type=LinearSolverType.DENSE_QR
        ),
        p,
    )
    assert s.termination_type == TerminationType.CONVERGENCE


def test_check_gradients_catches_wrong_derivative():
    @jax.custom_jvp
    def bad(v):
        return v * v

    @bad.defjvp
    def bad_jvp(primals, tangents):
        (v,), (dv,) = primals, tangents
        return v * v, 3.0 * dv  # wrong: d(v^2) is 2v, not 3

    p = Problem()
    y = p.add_parameter_block(np.array([2.0]))
    p.add_residual_block(CostFunction(lambda ps, d: bad(ps[0]), 1), None, [y])
    s = ceres_tpu.solve(
        SolverOptions(
            check_gradients=True, linear_solver_type=LinearSolverType.DENSE_QR
        ),
        p,
    )
    assert s.termination_type == TerminationType.FAILURE
    assert "Gradient check failed" in s.message
