"""Multi-device sharding tests on the 8-device virtual CPU mesh.

reference analog: none — the reference is single-GPU (SURVEY.md §2d); these
tests validate the framework's own scaling design: sharded evaluation must
be bit-for-bit-close to single-device, and a full sharded LM solve must
reach the same solution.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest
from jax.sharding import Mesh

import ceres_tpu
from ceres_tpu import LinearSolverType, PreconditionerType, SolverOptions
from ceres_tpu.io.bal import build_ba_problem, synthetic_bal
from ceres_tpu.parallel.sharding import ShardedEvaluator


@pytest.fixture(scope="module")
def mesh():
    devs = jax.devices()
    assert len(devs) >= 8, "conftest should provide 8 virtual devices"
    return Mesh(np.array(devs[:8]), ("dp",))


def make_problem(seed=2, n_obs=203):  # deliberately not divisible by 8
    bal = synthetic_bal(6, 50, n_obs, seed=seed)
    return build_ba_problem(bal)[0]


def test_sharded_evaluation_matches_single_device(mesh):
    problem = make_problem()
    program = problem.compile()
    state = program.state_vector()

    ev1 = program.evaluator()
    cost1, res1, jac1, grad1 = ev1.evaluate_groups(state)

    ev8 = ShardedEvaluator(program, mesh, axis="dp", dtype=state.dtype)
    cost8, res8, jac8, grad8 = ev8.evaluate_groups(state)

    np.testing.assert_allclose(float(cost8), float(cost1), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(grad8), np.asarray(grad1), rtol=1e-10)

    # matrix-free products must agree too
    v = np.random.default_rng(0).normal(0, 1, program.num_effective_parameters)
    v = jnp.asarray(v)
    np.testing.assert_allclose(
        np.asarray(jac8.jtj_multiply(v)), np.asarray(jac1.jtj_multiply(v)), rtol=1e-9
    )
    np.testing.assert_allclose(
        np.asarray(jac8.squared_column_norms()),
        np.asarray(jac1.squared_column_norms()),
        rtol=1e-10,
    )


def test_sharded_plus_matches(mesh):
    problem = make_problem()
    program = problem.compile()
    state = program.state_vector()
    ev1 = program.evaluator()
    ev8 = ShardedEvaluator(program, mesh)
    delta = jnp.asarray(
        np.random.default_rng(1).normal(0, 0.01, program.num_effective_parameters)
    )
    np.testing.assert_allclose(
        np.asarray(ev8.plus(state, delta)), np.asarray(ev1.plus(state, delta)), rtol=1e-12
    )


@pytest.mark.parametrize(
    "solver,prec",
    [
        (LinearSolverType.CGNR, PreconditionerType.JACOBI),
        (LinearSolverType.ITERATIVE_SCHUR, PreconditionerType.SCHUR_JACOBI),
    ],
    ids=["cgnr", "ischur"],
)
def test_sharded_solve_matches_single_device(mesh, solver, prec):
    results = []
    for m in [None, mesh]:
        problem = make_problem(seed=3)
        options = SolverOptions(
            linear_solver_type=solver,
            preconditioner_type=prec,
            max_num_iterations=10,
            mesh=m,
        )
        summary = ceres_tpu.solve(options, problem)
        # both runs must take the device-fused loop — a silent eligibility
        # regression flipping the sharded path to the host loop would
        # otherwise still pass the cost comparison
        assert summary.used_fused_execution, (m, solver, prec)
        results.append(summary.final_cost)
    np.testing.assert_allclose(results[1], results[0], rtol=1e-6)


def test_hybrid_mesh_solve_matches_single_device():
    """Two-level DCN-aware mesh (SURVEY §2d:332-339): a 2x4 ("dcn","ici")
    mesh emulating 2 hosts x 4 chips in one process. Lanes shard over both
    axes and every reduction runs the explicit two-stage
    psum_hierarchical (ICI first, then DCN); the solve must match the
    single-device result."""
    devs = jax.devices()
    assert len(devs) >= 8
    hmesh = Mesh(np.array(devs[:8]).reshape(2, 4), ("dcn", "ici"))

    def run(mesh):
        problem = make_problem(seed=11, n_obs=501)
        options = SolverOptions(
            linear_solver_type=LinearSolverType.ITERATIVE_SCHUR,
            preconditioner_type=PreconditionerType.SCHUR_JACOBI,
            max_num_iterations=6,
            mesh=mesh,
        )
        summary = ceres_tpu.solve(options, problem)
        return summary

    s_hybrid = run(hmesh)
    s_single = run(None)
    assert s_hybrid.used_fused_execution
    np.testing.assert_allclose(
        s_hybrid.initial_cost, s_single.initial_cost, rtol=1e-6
    )
    np.testing.assert_allclose(
        s_hybrid.final_cost, s_single.final_cost, rtol=1e-5
    )


def test_hybrid_mesh_evaluation_matches(  # two-stage reductions are exact
):
    devs = jax.devices()
    hmesh = Mesh(np.array(devs[:8]).reshape(2, 4), ("dcn", "ici"))
    problem = make_problem(seed=4, n_obs=333)
    program = problem.compile()
    state = program.state_vector()
    ev1 = program.evaluator()
    cost1, _res1, _jac1, grad1 = ev1.evaluate_groups(state)
    ev2 = ShardedEvaluator(program, hmesh)
    cost2, _res2, _jac2, grad2 = ev2.evaluate_groups(state)
    np.testing.assert_allclose(float(cost2), float(cost1), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(grad2), np.asarray(grad1), rtol=1e-8, atol=1e-10
    )


@pytest.mark.parametrize(
    "prec",
    [
        PreconditionerType.CLUSTER_JACOBI,
        PreconditionerType.CLUSTER_TRIDIAGONAL,
    ],
    ids=lambda p: p.value,
)
def test_sharded_cluster_preconditioner_solve(mesh, prec):
    """CLUSTER_* on a sharded problem (round-4 verdict missing#2): the
    host loop runs the step on the GLOBAL view under GSPMD, the assembly
    gathers leaves back to plan order; final cost must match the
    single-device solve."""

    def run(m):
        problem = make_problem(seed=13, n_obs=407)
        options = SolverOptions(
            linear_solver_type=LinearSolverType.ITERATIVE_SCHUR,
            preconditioner_type=prec,
            max_num_iterations=6,
            mesh=m,
        )
        return ceres_tpu.solve(options, problem)

    s_sh = run(mesh)
    s_single = run(None)
    np.testing.assert_allclose(
        s_sh.final_cost, s_single.final_cost, rtol=1e-5
    )


def test_sharded_subset_downgrades_with_warning(mesh, caplog):
    """SUBSET's host sparse apply cannot cross shard_map; a sharded solve
    must downgrade to JACOBI (valid for both CGNR and ITERATIVE_SCHUR) loudly rather than fail deep in the
    solve."""
    import logging

    problem = make_problem(seed=3, n_obs=203)
    options = SolverOptions(
        linear_solver_type=LinearSolverType.CGNR,
        preconditioner_type=PreconditionerType.SUBSET,
        max_num_iterations=4,
        mesh=mesh,
    )
    with caplog.at_level(logging.WARNING):
        summary = ceres_tpu.solve(options, problem)
    assert np.isfinite(summary.final_cost)
    assert any("downgrading to JACOBI" in r.message for r in caplog.records)
