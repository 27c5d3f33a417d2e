"""End-to-end bundle adjustment tests over the solver matrix.

reference analog: the 69 generated BA integration tests
(generate_bundle_adjustment_tests.py / bundle_adjustment_test_util.h): each
{linear solver x preconditioner} config must reach the same final solution.
BAL files are not bundled (and no egress), so a synthetic BAL-shaped problem
stands in; the cross-config agreement check is the same.
"""

import numpy as np
import pytest

import ceres_tpu
from ceres_tpu import (
    HuberLoss,
    LinearSolverType,
    PreconditionerType,
    SolverOptions,
    TerminationType,
)
from ceres_tpu.io.bal import build_ba_problem, synthetic_bal

CONFIGS = [
    (LinearSolverType.CGNR, PreconditionerType.JACOBI),
    (LinearSolverType.ITERATIVE_SCHUR, PreconditionerType.JACOBI),
    (LinearSolverType.ITERATIVE_SCHUR, PreconditionerType.SCHUR_JACOBI),
    (
        LinearSolverType.ITERATIVE_SCHUR,
        PreconditionerType.SCHUR_POWER_SERIES_EXPANSION,
    ),
    (LinearSolverType.ITERATIVE_SCHUR, PreconditionerType.CLUSTER_JACOBI),
    (LinearSolverType.ITERATIVE_SCHUR, PreconditionerType.CLUSTER_TRIDIAGONAL),
    (LinearSolverType.DENSE_SCHUR, PreconditionerType.IDENTITY),
    (LinearSolverType.SPARSE_SCHUR, PreconditionerType.IDENTITY),
    (LinearSolverType.SPARSE_NORMAL_CHOLESKY, PreconditionerType.IDENTITY),
    (LinearSolverType.DENSE_NORMAL_CHOLESKY, PreconditionerType.IDENTITY),
    (LinearSolverType.DENSE_QR, PreconditionerType.IDENTITY),
]


def make_problem():
    bal = synthetic_bal(6, 50, 200, seed=2)
    return build_ba_problem(bal)


def solve_config(solver, prec, max_iter=30):
    problem, cams, pts = make_problem()
    options = SolverOptions(
        linear_solver_type=solver,
        preconditioner_type=prec,
        max_num_iterations=max_iter,
    )
    summary = ceres_tpu.solve(options, problem)
    return problem, summary


@pytest.mark.parametrize("solver,prec", CONFIGS, ids=lambda v: getattr(v, "value", str(v)))
def test_ba_converges(solver, prec):
    problem, summary = solve_config(solver, prec)
    assert summary.termination_type == TerminationType.CONVERGENCE, summary.message
    assert summary.final_cost < 0.25 * summary.initial_cost


def test_ba_configs_agree():
    finals = []
    for solver, prec in CONFIGS:
        _, summary = solve_config(solver, prec)
        finals.append(summary.final_cost)
    ref = finals[0]
    for f in finals[1:]:
        np.testing.assert_allclose(f, ref, rtol=1e-4)


def test_ba_schur_partition_is_points():
    problem, cams, pts = make_problem()
    program = problem.compile()
    e_mask, e_pos, f_pos = program.compute_schur_partition()
    # all points eliminated, all cameras kept
    for b in pts:
        assert e_mask[b]
    for b in cams:
        assert not e_mask[b]


def test_ba_with_robust_loss_and_constant_camera():
    bal = synthetic_bal(6, 50, 200, seed=4)
    problem, cams, pts = build_ba_problem(bal, loss=HuberLoss(1.0))
    # hold first camera fixed (gauge freedom)
    problem.set_parameter_block_constant(cams[0])
    options = SolverOptions(
        linear_solver_type=LinearSolverType.ITERATIVE_SCHUR,
        preconditioner_type=PreconditionerType.SCHUR_JACOBI,
        max_num_iterations=60,
    )
    cam0_before = problem.parameter_block_value(cams[0])
    summary = ceres_tpu.solve(options, problem)
    assert summary.termination_type == TerminationType.CONVERGENCE, summary.message
    assert summary.final_cost < summary.initial_cost
    np.testing.assert_array_equal(problem.parameter_block_value(cams[0]), cam0_before)


def test_bal_file_roundtrip(tmp_path):
    bal = synthetic_bal(3, 7, 20, seed=5)
    path = tmp_path / "problem.txt"
    with open(path, "w") as f:
        f.write(f"{bal.num_cameras} {bal.num_points} {bal.num_observations}\n")
        for i in range(bal.num_observations):
            f.write(
                f"{bal.camera_index[i]} {bal.point_index[i]} "
                f"{bal.observations[i,0]:.17g} {bal.observations[i,1]:.17g}\n"
            )
        for c in bal.cameras.reshape(-1):
            f.write(f"{c:.17g}\n")
        for p in bal.points.reshape(-1):
            f.write(f"{p:.17g}\n")
    from ceres_tpu.io.bal import load_bal

    loaded = load_bal(path)
    np.testing.assert_allclose(loaded.cameras, bal.cameras)
    np.testing.assert_allclose(loaded.points, bal.points)
    np.testing.assert_array_equal(loaded.camera_index, bal.camera_index)
    np.testing.assert_allclose(loaded.observations, bal.observations)


def test_bal_normalize_and_perturb():
    bal = synthetic_bal(4, 30, 80, seed=6)
    bal.normalize()
    dev = np.abs(bal.points - np.median(bal.points, axis=0)).sum(axis=1)
    np.testing.assert_allclose(np.median(dev), 100.0, rtol=1e-6)
    before = bal.points.copy()
    bal.perturb(point_sigma=0.1, seed=1)
    assert not np.allclose(before, bal.points)
