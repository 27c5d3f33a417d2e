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
