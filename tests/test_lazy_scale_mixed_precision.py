"""Lazy column scaling + mixed-precision solve tests.

`BlockJacobian.scale_columns` is a lazy diagonal view (jacobian.py
col_scale): every product/Gram table must match the materialized scaling
exactly (f64 on CPU). `use_mixed_precision_solves` (reference: solver.h,
realized on GPU as fp32 factorize + fp64 refine, dense_cholesky.h:246) runs
the PCG matvec on bf16 Jacobian copies with f32 accumulation — the solve
must still converge to the same solution.
"""

import numpy as np
import jax
import jax.numpy as jnp
import pytest

import ceres_tpu
from ceres_tpu import (
    LinearSolverType,
    PreconditionerType,
    SolverOptions,
    TerminationType,
)
from ceres_tpu.evaluator import Evaluator
from ceres_tpu.io.bal import build_ba_problem, synthetic_bal


def _jac_and_program(seed=3):
    bal = synthetic_bal(5, 40, 160, seed=seed)
    problem, _, _ = build_ba_problem(bal)
    program = problem.compile()
    ev = Evaluator(program)
    state = program.state_vector(ev.dtype)
    _, res_groups, jac, grad = ev.evaluate_groups(state)
    return program, jac, res_groups, grad


def test_lazy_scale_matches_materialized():
    program, jac, res_groups, grad = _jac_and_program()
    rng = np.random.default_rng(0)
    n = program.num_effective_parameters
    scale = jnp.asarray(rng.uniform(0.5, 2.0, size=n), dtype=grad.dtype)
    v = jnp.asarray(rng.standard_normal(n), dtype=grad.dtype)

    lazy = jac.scale_columns(scale)
    assert lazy.col_scale is not None
    mat = lazy.materialize_scale()
    assert mat.col_scale is None

    # products
    jv_l = lazy.right_multiply(v)
    jv_m = mat.right_multiply(v)
    for a, b in zip(jv_l, jv_m):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)
    jtu_l = lazy.left_multiply(res_groups)
    jtu_m = mat.left_multiply(res_groups)
    np.testing.assert_allclose(np.asarray(jtu_l), np.asarray(jtu_m), rtol=1e-12)
    np.testing.assert_allclose(
        np.asarray(lazy.squared_column_norms()),
        np.asarray(mat.squared_column_norms()),
        rtol=1e-12,
    )
    # Gram tables (jacobi preconditioner input)
    for a, b in zip(lazy.block_diag_jtj(), mat.block_diag_jtj()):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)
    # dense / CRS export
    np.testing.assert_allclose(
        np.asarray(lazy.to_dense()), np.asarray(mat.to_dense()), rtol=1e-12
    )
    vl, cl, pl = lazy.to_crs()
    vm, cm, pm = mat.to_crs()
    np.testing.assert_array_equal(cl, cm)
    np.testing.assert_array_equal(pl, pm)
    np.testing.assert_allclose(vl, vm, rtol=1e-12)
    # composition
    lazy2 = lazy.scale_columns(scale)
    np.testing.assert_allclose(
        np.asarray(lazy2.squared_column_norms()),
        np.asarray(mat.scale_columns(scale).materialize_scale().squared_column_norms()),
        rtol=1e-12,
    )


def test_lazy_scale_schur_jacobi_blocks_match():
    from ceres_tpu.linalg.schur import (
        make_ete_solver,
        schur_jacobi_blocks,
        schur_views,
    )

    program, jac, res_groups, grad = _jac_and_program(seed=4)
    rng = np.random.default_rng(1)
    n = program.num_effective_parameters
    scale = jnp.asarray(rng.uniform(0.5, 2.0, size=n), dtype=grad.dtype)
    e_mask, f_mask = program.schur_tangent_masks()
    dsq = jnp.asarray(rng.uniform(0.1, 1.0, size=n), dtype=grad.dtype)

    def blocks_for(j):
        jac_e, jac_f = schur_views(program, j)
        ete = make_ete_solver(program, jac_e, dsq * jnp.asarray(e_mask, grad.dtype))
        return schur_jacobi_blocks(
            program, jac_e, jac_f, ete, dsq * jnp.asarray(f_mask, grad.dtype)
        )

    lazy_blocks = blocks_for(jac.scale_columns(scale))
    mat_blocks = blocks_for(jac.scale_columns(scale).materialize_scale())
    for a, b in zip(lazy_blocks, mat_blocks):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), rtol=1e-10, atol=1e-12
        )


@pytest.mark.parametrize(
    "solver,prec",
    [
        (LinearSolverType.ITERATIVE_SCHUR, PreconditionerType.SCHUR_JACOBI),
        (LinearSolverType.CGNR, PreconditionerType.JACOBI),
    ],
    ids=["iterative_schur", "cgnr"],
)
def test_mixed_precision_solve_converges(solver, prec):
    bal = synthetic_bal(6, 50, 200, seed=2)
    problem_f32, _, _ = build_ba_problem(bal)
    options = SolverOptions(
        linear_solver_type=solver,
        preconditioner_type=prec,
        max_num_iterations=40,
        use_mixed_precision_solves=True,
        dtype=jnp.float32,
    )
    summary = ceres_tpu.solve(options, problem_f32)
    assert summary.termination_type == TerminationType.CONVERGENCE, summary.message

    # f32 full-precision reference on the same problem
    bal2 = synthetic_bal(6, 50, 200, seed=2)
    problem_ref, _, _ = build_ba_problem(bal2)
    ref_options = SolverOptions(
        linear_solver_type=solver,
        preconditioner_type=prec,
        max_num_iterations=40,
        dtype=jnp.float32,
    )
    ref = ceres_tpu.solve(ref_options, problem_ref)
    assert ref.termination_type == TerminationType.CONVERGENCE
    # same basin: final costs agree to ~f32 noise x problem conditioning
    assert abs(summary.final_cost - ref.final_cost) <= 1e-3 * max(
        1.0, abs(ref.final_cost)
    )
