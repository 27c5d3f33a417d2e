"""End-to-end trust-region solve tests.

reference analogs: system_test.cc (Powell under every linear solver),
trust_region_minimizer_test.cc (curve fitting, bounds), and the
robust_curve_fitting example. Results are cross-checked against
scipy.optimize.least_squares on the same synthetic data.
"""

import numpy as np
import pytest

import ceres_tpu
from ceres_tpu import (
    CauchyLoss,
    LinearSolverType,
    PreconditionerType,
    SolverOptions,
    TerminationType,
)
from ceres_tpu.examples.test_functions import (
    build_curve_fitting_problem,
    build_powell_problem,
    make_curve_fitting_data,
)


ALL_SMALL_SOLVERS = [
    LinearSolverType.DENSE_QR,
    LinearSolverType.DENSE_NORMAL_CHOLESKY,
    LinearSolverType.CGNR,
]


@pytest.mark.parametrize("solver", ALL_SMALL_SOLVERS, ids=lambda s: s.value)
def test_powell(solver):
    # reference: system_test.cc:144-179 runs Powell under each linear solver.
    p, handles = build_powell_problem()
    options = SolverOptions(
        linear_solver_type=solver,
        max_num_iterations=100,
        function_tolerance=1e-14,
        parameter_tolerance=1e-14,
        gradient_tolerance=1e-14,
    )
    summary = ceres_tpu.solve(options, p)
    assert summary.termination_type == TerminationType.CONVERGENCE, summary.message
    assert summary.final_cost < 1e-12
    for h in handles:
        assert abs(p.parameter_block_value(h)[0]) < 2e-3


@pytest.mark.parametrize("solver", ALL_SMALL_SOLVERS, ids=lambda s: s.value)
def test_curve_fitting_matches_scipy(solver):
    from scipy.optimize import least_squares

    data = make_curve_fitting_data()
    p, mc = build_curve_fitting_problem(data)
    options = SolverOptions(linear_solver_type=solver, max_num_iterations=100)
    summary = ceres_tpu.solve(options, p)
    assert summary.termination_type == TerminationType.CONVERGENCE, summary.message

    def scipy_res(mc_):
        return data[:, 1] - np.exp(mc_[0] * data[:, 0] + mc_[1])

    ref = least_squares(scipy_res, [0.0, 0.0], method="lm", xtol=1e-14, ftol=1e-14)
    ours = p.parameter_block_value(mc)
    np.testing.assert_allclose(ours, ref.x, rtol=1e-5)
    ref_cost = 0.5 * float(ref.fun @ ref.fun)
    assert summary.final_cost <= ref_cost * (1 + 1e-8)


def test_robust_curve_fitting_resists_outliers():
    # reference: examples/robust_curve_fitting.cc
    data = make_curve_fitting_data(noise=0.1)
    rng = np.random.default_rng(9)
    out_rows = rng.choice(data.shape[0], 12, replace=False)
    data_out = data.copy()
    data_out[out_rows, 1] += rng.normal(0, 10.0, 12)

    p_plain, mc_plain = build_curve_fitting_problem(data_out)
    p_robust, mc_robust = build_curve_fitting_problem(data_out, loss=CauchyLoss(0.5))
    options = SolverOptions(max_num_iterations=100)
    ceres_tpu.solve(options, p_plain)
    summary = ceres_tpu.solve(options, p_robust)
    assert summary.termination_type == TerminationType.CONVERGENCE

    truth = np.array([0.3, 0.1])
    err_plain = np.linalg.norm(p_plain.parameter_block_value(mc_plain) - truth)
    err_robust = np.linalg.norm(p_robust.parameter_block_value(mc_robust) - truth)
    assert err_robust < err_plain
    assert err_robust < 0.1


def test_bounds_are_respected():
    data = make_curve_fitting_data()
    p, mc = build_curve_fitting_problem(data)
    p.set_parameter_upper_bound(mc, 0, 0.25)  # truth is 0.3
    options = SolverOptions(max_num_iterations=100)
    summary = ceres_tpu.solve(options, p)
    val = p.parameter_block_value(mc)
    assert val[0] <= 0.25 + 1e-12
    assert summary.final_cost < summary.initial_cost


def test_constant_block_not_moved():
    p, handles = build_powell_problem()
    x1_before = p.parameter_block_value(handles[0])
    p.set_parameter_block_constant(handles[0])
    options = SolverOptions(max_num_iterations=50)
    summary = ceres_tpu.solve(options, p)
    np.testing.assert_array_equal(p.parameter_block_value(handles[0]), x1_before)
    assert summary.final_cost < summary.initial_cost


def test_callbacks_and_summary():
    seen = []

    def cb(it_sum):
        seen.append(it_sum.iteration)
        return ceres_tpu.CallbackReturnType.SOLVER_CONTINUE

    p, _ = build_powell_problem()
    options = SolverOptions(max_num_iterations=30, callbacks=[cb])
    summary = ceres_tpu.solve(options, p)
    assert len(seen) >= 1
    assert summary.num_successful_steps > 0
    assert summary.initial_cost > summary.final_cost
    report = summary.full_report()
    assert "Final cost" in report
    assert summary.brief_report()


def test_rosenbrock_nonmonotonic():
    from ceres_tpu.examples.test_functions import rosenbrock_residuals
    from ceres_tpu import CostFunction, Problem

    p = Problem()
    b = p.add_parameter_block([-1.2, 1.0])
    p.add_residual_block(CostFunction(rosenbrock_residuals, 2), None, [b])
    options = SolverOptions(
        max_num_iterations=200,
        use_nonmonotonic_steps=True,
        function_tolerance=1e-14,
        parameter_tolerance=1e-14,
    )
    summary = ceres_tpu.solve(options, p)
    np.testing.assert_allclose(p.parameter_block_value(b), [1.0, 1.0], atol=1e-4)
    assert summary.final_cost < 1e-10
