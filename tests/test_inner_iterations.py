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


def test_inner_iteration_tolerance_disables_refinement():
    """reference: trust_region_minimizer.cc:564-570 — once the relative
    progress of an inner-iteration pass drops below
    inner_iteration_tolerance, later TR iterations skip it. A tolerance of
    1.0 can never be exceeded (progress is < 1), so exactly one pass runs;
    a tolerance of 0 keeps it on for (almost) every accepted step."""
    def run(tol):
        bal = synthetic_bal(6, 50, 200, seed=2)
        problem, _, _ = build_ba_problem(bal)
        options = SolverOptions(
            linear_solver_type=LinearSolverType.ITERATIVE_SCHUR,
            preconditioner_type=PreconditionerType.SCHUR_JACOBI,
            max_num_iterations=25,
            use_inner_iterations=True,
            inner_iteration_tolerance=tol,
        )
        return ceres_tpu.solve(options, problem)

    s_hi = run(1.0)
    s_lo = run(0.0)
    assert s_hi.num_inner_iteration_steps == 1
    assert s_lo.num_inner_iteration_steps > 1


def test_inner_iteration_ordering_is_honored():
    """reference: Solver::Options::inner_iteration_ordering
    (coordinate_descent_minimizer.cc:88-150) — group 0 picks the blocks
    the inner minimizer refines. Point blocks form an independent set in
    BA, so passing them explicitly must work and refine monotonically."""
    from ceres_tpu import ParameterBlockOrdering

    bal = synthetic_bal(6, 50, 200, seed=3)
    problem, cams, pts = build_ba_problem(bal)
    ordering = ParameterBlockOrdering()
    for h in pts:
        ordering.add_element_to_group(int(h), 0)
    for h in cams:
        ordering.add_element_to_group(int(h), 1)
    options = SolverOptions(
        linear_solver_type=LinearSolverType.ITERATIVE_SCHUR,
        preconditioner_type=PreconditionerType.SCHUR_JACOBI,
        max_num_iterations=20,
        use_inner_iterations=True,
        inner_iteration_ordering=ordering,
    )
    s = ceres_tpu.solve(options, problem)
    assert s.num_inner_iteration_steps > 0
    assert s.final_cost < 0.5 * s.initial_cost
