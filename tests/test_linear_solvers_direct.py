"""Direct (step-level) linear-solver tests on one fixed LM subproblem.

The analog of the reference's golden linear-least-squares fixture
(linear_least_squares_problems.cc, used by every *_solver_test.cc): all
linear solver types must produce the same damped normal-equations solution
    (J^T J + diag(dsq)) step = -J^T r
for the same Jacobian/residual state, verified against an explicit dense
solve. Exercises the solver dispatch below the trust-region loop.
"""

import numpy as np
import pytest

from ceres_tpu import LinearSolverType, PreconditionerType, SolverOptions
from ceres_tpu.io.bal import build_ba_problem, synthetic_bal
from ceres_tpu.solvers.strategies import make_lm_step_fn

CONFIGS = [
    (LinearSolverType.DENSE_QR, PreconditionerType.IDENTITY),
    (LinearSolverType.DENSE_NORMAL_CHOLESKY, PreconditionerType.IDENTITY),
    (LinearSolverType.CGNR, PreconditionerType.JACOBI),
    (LinearSolverType.ITERATIVE_SCHUR, PreconditionerType.SCHUR_JACOBI),
    (LinearSolverType.DENSE_SCHUR, PreconditionerType.IDENTITY),
    (LinearSolverType.SPARSE_SCHUR, PreconditionerType.IDENTITY),
    (LinearSolverType.SPARSE_NORMAL_CHOLESKY, PreconditionerType.IDENTITY),
]


@pytest.fixture(scope="module")
def fixed_subproblem():
    bal = synthetic_bal(5, 40, 160, seed=7)
    problem, _, _ = build_ba_problem(bal)
    program = problem.compile()
    ev = program.evaluator()
    state = program.state_vector()
    cost, res_groups, jac, grad = ev.evaluate_groups(state)
    return program, ev, jac, res_groups, grad


def _dense_reference(program, jac, grad, radius, scale):
    import jax.numpy as jnp

    jac_s = jac.scale_columns(jnp.asarray(scale))
    j = np.asarray(jac_s.to_dense(), dtype=np.float64)
    g = np.asarray(grad, dtype=np.float64) * np.asarray(scale)
    colnorm2 = np.asarray(jac_s.squared_column_norms(), dtype=np.float64)
    dsq = np.clip(colnorm2, 1e-6, 1e32) / radius
    a = j.T @ j + np.diag(dsq)
    step = np.linalg.solve(a, -g)
    return np.asarray(scale) * step


@pytest.mark.parametrize(
    "solver,prec", CONFIGS, ids=lambda v: getattr(v, "value", str(v))
)
def test_step_matches_dense_reference(fixed_subproblem, solver, prec):
    import jax.numpy as jnp

    program, ev, jac, res_groups, grad = fixed_subproblem
    radius = 1e4
    scale = np.ones(program.num_effective_parameters)

    options = SolverOptions(
        linear_solver_type=solver,
        preconditioner_type=prec,
        max_linear_solver_iterations=500,
        # eta maps to the reference's Q-based truncation
        # (levenberg_marquardt_strategy.cc:98); 0 disables it so CG runs to
        # the iteration cap and the step is exact for this comparison
        eta=0.0,
    )
    step_fn = make_lm_step_fn(program, options, ev)
    delta, mcc, iters, valid = step_fn(
        jac,
        list(res_groups),
        grad,
        jnp.asarray(radius, grad.dtype),
        jnp.asarray(scale, grad.dtype),
    )
    assert bool(valid)
    expected = _dense_reference(program, jac, grad, radius, scale)
    np.testing.assert_allclose(np.asarray(delta), expected, rtol=2e-5, atol=1e-8)
    assert float(mcc) > 0


@pytest.mark.parametrize(
    "solver",
    [LinearSolverType.DENSE_NORMAL_CHOLESKY, LinearSolverType.DENSE_SCHUR],
    ids=lambda v: v.value,
)
def test_mixed_precision_factor_refine_matches_f64(fixed_subproblem, solver):
    """f32 Cholesky factorization + working-dtype refinement must recover
    the f64 factorization's step (dense_cholesky.h:246 /
    iterative_refiner.cc analog)."""
    import jax.numpy as jnp

    program, ev, jac, res_groups, grad = fixed_subproblem
    radius = 1e4
    scale = np.ones(program.num_effective_parameters)

    options = SolverOptions(
        linear_solver_type=solver,
        use_mixed_precision_solves=True,
        max_num_refinement_iterations=3,
    )
    step_fn = make_lm_step_fn(program, options, ev)
    delta, mcc, iters, valid = step_fn(
        jac,
        list(res_groups),
        grad,
        jnp.asarray(radius, grad.dtype),
        jnp.asarray(scale, grad.dtype),
    )
    assert bool(valid)
    expected = _dense_reference(program, jac, grad, radius, scale)
    # refinement must recover (near-)f64 accuracy despite the f32 factor
    np.testing.assert_allclose(np.asarray(delta), expected, rtol=1e-8, atol=1e-10)
    assert float(mcc) > 0


def test_cholesky_solve_mixed_refines_to_working_precision():
    from ceres_tpu.linalg.dense import cholesky_solve_mixed
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    n = 60
    a = rng.normal(size=(n, n))
    lhs = a.T @ a + 1e-3 * np.eye(n)
    x_true = rng.normal(size=n)
    rhs = lhs @ x_true

    x0 = np.asarray(
        cholesky_solve_mixed(jnp.asarray(lhs), jnp.asarray(rhs), refine_iterations=0)
    )
    x3 = np.asarray(
        cholesky_solve_mixed(jnp.asarray(lhs), jnp.asarray(rhs), refine_iterations=3)
    )
    err0 = np.linalg.norm(x0 - x_true) / np.linalg.norm(x_true)
    err3 = np.linalg.norm(x3 - x_true) / np.linalg.norm(x_true)
    assert err0 > 1e-7   # pure f32 factorization is visibly inexact
    assert err3 < 1e-11  # refinement recovers f64-level accuracy
    assert err3 < err0 / 100.0


def test_explicit_schur_complement_matches_implicit(fixed_subproblem):
    """use_explicit_schur_complement: PCG against the materialized S must
    give the same step as the implicit 4-product operator."""
    import jax.numpy as jnp

    program, ev, jac, res_groups, grad = fixed_subproblem
    radius = 1e4
    scale = np.ones(program.num_effective_parameters)
    deltas = []
    for explicit in (False, True):
        options = SolverOptions(
            linear_solver_type=LinearSolverType.ITERATIVE_SCHUR,
            preconditioner_type=PreconditionerType.SCHUR_JACOBI,
            use_explicit_schur_complement=explicit,
            max_linear_solver_iterations=500,
            eta=0.0,
        )
        step_fn = make_lm_step_fn(program, options, ev)
        delta, mcc, iters, valid = step_fn(
            jac, list(res_groups), grad,
            jnp.asarray(radius, grad.dtype), jnp.asarray(scale, grad.dtype),
        )
        assert bool(valid)
        deltas.append(np.asarray(delta))
    np.testing.assert_allclose(deltas[1], deltas[0], rtol=1e-6, atol=1e-9)
    expected = _dense_reference(program, jac, grad, radius, scale)
    np.testing.assert_allclose(deltas[1], expected, rtol=2e-5, atol=1e-8)


def test_user_linear_solver_ordering():
    """linear_solver_ordering pins the eliminated blocks: eliminating the
    cameras instead of the points must still solve to the same cost, and a
    non-independent group 0 must be rejected
    (reference: Solver::Options::linear_solver_ordering group 0)."""
    import ceres_tpu
    from ceres_tpu.io.bal import build_ba_problem, synthetic_bal

    results = {}
    for ordering in ("auto", "points", "cameras"):
        bal = synthetic_bal(6, 40, 200, seed=9)
        problem, cams, pts = build_ba_problem(bal)
        opts = SolverOptions(
            linear_solver_type=LinearSolverType.ITERATIVE_SCHUR,
            preconditioner_type=PreconditionerType.SCHUR_JACOBI,
            max_num_iterations=12,
            linear_solver_ordering=(
                None if ordering == "auto"
                else [int(h) for h in (pts if ordering == "points" else cams)]
            ),
        )
        s = ceres_tpu.solve(opts, problem)
        results[ordering] = s.final_cost
    np.testing.assert_allclose(results["points"], results["auto"], rtol=1e-6)
    np.testing.assert_allclose(results["cameras"], results["auto"], rtol=1e-4)

    # invalid: both blocks of a residual eliminated
    bal = synthetic_bal(6, 40, 200, seed=9)
    problem, cams, pts = build_ba_problem(bal)
    opts = SolverOptions(
        linear_solver_type=LinearSolverType.ITERATIVE_SCHUR,
        linear_solver_ordering=[int(h) for h in cams] + [int(h) for h in pts],
        max_num_iterations=3,
    )
    with pytest.raises(ValueError, match="independent set"):
        ceres_tpu.solve(opts, problem)
