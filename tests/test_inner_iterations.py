"""Inner-iteration (coordinate descent) tests.

reference analog: coordinate_descent_minimizer_test.cc + the BA
inner-iteration configs of the generated test matrix.
"""

import numpy as np

import ceres_tpu
from ceres_tpu import LinearSolverType, PreconditionerType, SolverOptions
from ceres_tpu.io.bal import build_ba_problem, synthetic_bal


def test_inner_iterations_monotonic_and_converges():
    bal = synthetic_bal(6, 50, 200, seed=2)
    problem, _, _ = build_ba_problem(bal)
    options = SolverOptions(
        linear_solver_type=LinearSolverType.ITERATIVE_SCHUR,
        preconditioner_type=PreconditionerType.SCHUR_JACOBI,
        max_num_iterations=30,
        use_inner_iterations=True,
    )
    summary = ceres_tpu.solve(options, problem)
    assert summary.num_inner_iteration_steps > 0
    assert summary.final_cost < 0.25 * summary.initial_cost
    # costs recorded on accepted iterations must be non-increasing
    costs = [it.cost for it in summary.iterations if it.step_is_successful]
    assert all(b <= a + 1e-9 for a, b in zip(costs, costs[1:]))


def test_inner_iterations_match_plain_final_cost():
    finals = []
    for inner in [False, True]:
        bal = synthetic_bal(6, 50, 200, seed=2)
        problem, _, _ = build_ba_problem(bal)
        options = SolverOptions(
            linear_solver_type=LinearSolverType.CGNR,
            max_num_iterations=40,
            use_inner_iterations=inner,
        )
        s = ceres_tpu.solve(options, problem)
        finals.append(s.final_cost)
    # refinement must not make the solution worse
    assert finals[1] <= finals[0] * (1 + 1e-6)
