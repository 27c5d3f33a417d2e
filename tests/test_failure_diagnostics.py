"""Per-block failure diagnostics on non-finite evaluation.

reference analog: residual_block_utils.cc:47-130 — on NaN/Inf the solver
names the offending residual block and prints its parameters, residuals,
and Jacobian. Fault injection mirrors the reference's NaN-functor unit
tests (autodiff_cost_function_cuda_test.cu.cc:265).
"""

import jax.numpy as jnp
import numpy as np

import ceres_tpu
from ceres_tpu import SolverOptions, TerminationType
from ceres_tpu.autodiff import CostFunction
from ceres_tpu.evaluator import diagnose_non_finite
from ceres_tpu.problem import Problem


def _nan_problem():
    """Two groups; the second produces NaN for blocks whose datum < 0
    (sqrt of a negative)."""

    def good(params, data):
        (x,) = params
        (d,) = data
        return jnp.stack([x[0] - d])

    def bad(params, data):
        (x,) = params
        (d,) = data
        return jnp.stack([jnp.sqrt(d) - x[0]])

    p = Problem()
    b0 = p.add_parameter_block(np.array([1.0]))
    b1 = p.add_parameter_block(np.array([2.0]))
    ids = np.array([[b0]] * 4)
    p.add_residual_blocks(CostFunction(good, 1, name="good_fn"), None, ids,
                          (np.array([1.0, 2.0, 3.0, 4.0]),))
    ids2 = np.array([[b1]] * 3)
    p.add_residual_blocks(CostFunction(bad, 1, name="nan_fn"), None, ids2,
                          (np.array([4.0, -1.0, 9.0]),))
    return p, b1


def test_solve_failure_names_culprit_block():
    p, b1 = _nan_problem()
    summary = ceres_tpu.solve(SolverOptions(max_num_iterations=5), p)
    assert summary.termination_type == TerminationType.FAILURE
    assert "nan_fn" in summary.message, summary.message
    assert "block 1" in summary.message, summary.message  # datum -1.0 is row 1
    assert "good_fn" not in summary.message


def test_solve_failure_names_culprit_host_loop():
    p, _ = _nan_problem()
    summary = ceres_tpu.solve(
        SolverOptions(max_num_iterations=5, fused_execution=False), p
    )
    assert summary.termination_type == TerminationType.FAILURE
    assert "nan_fn" in summary.message
    assert "residuals:" in summary.message
    assert "parameter block 0" in summary.message


def test_diagnose_reports_parameters_and_jacobian():
    p, _ = _nan_problem()
    program = p.compile(SolverOptions())
    state = program.state_vector()
    report = diagnose_non_finite(program, state)
    assert "nan_fn" in report
    assert "1/3 residual blocks non-finite" in report
    assert "jacobian" in report
    # the healthy group is not blamed
    assert "good_fn" not in report


def test_diagnose_clean_problem_says_so():
    def good(params, data):
        (x,) = params
        (d,) = data
        return jnp.stack([x[0] - d])

    p = Problem()
    b = p.add_parameter_block(np.array([1.0]))
    p.add_residual_blocks(CostFunction(good, 1, name="g"), None,
                          np.array([[b]] * 2), (np.array([1.0, 2.0]),))
    program = p.compile(SolverOptions())
    report = diagnose_non_finite(program, program.state_vector())
    assert "No non-finite" in report
