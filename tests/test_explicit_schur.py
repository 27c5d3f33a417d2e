"""Explicit sparse Schur (SPARSE_SCHUR) tests: block values versus the
implicit operator, and the host-factored solve versus dense Cholesky."""

import numpy as np
import pytest

import jax.numpy as jnp

import ceres_tpu
from ceres_tpu import LinearSolverType, SolverOptions, TerminationType
from ceres_tpu.io.bal import build_ba_problem, synthetic_bal
from ceres_tpu.linalg.explicit_schur import ExplicitSchurPlan, solve_sparse_schur
from ceres_tpu.linalg.schur import make_ete_solver, schur_views


def _pieces(problem, dsq_value=0.1):
    program = problem.compile()
    ev = program.evaluator()
    state = program.state_vector()
    _c, _r, jac, _g = ev.evaluate_groups(state)
    e_np, f_np = program.schur_tangent_masks()
    dsq = jnp.full((program.num_effective_parameters,), dsq_value)
    jac_e, jac_f = schur_views(program, jac)
    ete = make_ete_solver(program, jac_e, dsq * jnp.asarray(e_np))
    dsq_f = dsq * jnp.asarray(f_np)

    def s_apply(y):
        t1 = jac_f.right_multiply(y)
        t2 = ete(jac_e.left_multiply(t1))
        et2 = jac_e.right_multiply(t2)
        diff = [a - b for a, b in zip(t1, et2)]
        return jac_f.left_multiply(diff) + dsq_f * y

    return program, jac_e, jac_f, ete, dsq_f, f_np, s_apply


def test_explicit_blocks_match_implicit_operator():
    bal = synthetic_bal(5, 30, 120, seed=4)
    problem, _, _ = build_ba_problem(bal)
    program, jac_e, jac_f, ete, dsq_f, f_np, s_apply = _pieces(problem)
    plan = ExplicitSchurPlan.get(program, jac_e, jac_f)
    ftf = jac_f.block_diag_jtj(dsq=dsq_f)[plan.cam_cls]
    s_blocks = np.asarray(plan.assemble(jac_e, jac_f, ete, ftf))

    # densify the explicit S and compare against the implicit operator
    tf, nc = plan.tf, plan.n_cams
    s_dense = np.zeros((nc * tf, nc * tf))
    for k in range(plan.n_slots):
        row = np.searchsorted(plan.bsr_indptr, k, side="right") - 1
        col = plan.bsr_cols[k]
        s_dense[row * tf:(row + 1) * tf, col * tf:(col + 1) * tf] = s_blocks[k]

    base = int(program.tangent_class_bases[plan.cam_cls])
    n_eff = program.num_effective_parameters
    for j in range(0, nc * tf, 7):  # sample columns
        e = np.zeros(n_eff)
        e[base + j] = 1.0
        col = np.asarray(s_apply(jnp.asarray(e)))[base : base + nc * tf]
        np.testing.assert_allclose(s_dense[:, j], col, rtol=1e-9, atol=1e-11)


def test_sparse_schur_step_matches_dense_schur():
    bal = synthetic_bal(5, 30, 120, seed=4)
    problem, _, _ = build_ba_problem(bal)
    program, jac_e, jac_f, ete, dsq_f, f_np, s_apply = _pieces(problem)
    ev = program.evaluator()
    state = program.state_vector()
    _c, res_groups, jac, grad = ev.evaluate_groups(state)
    dsq = jnp.full((program.num_effective_parameters,), 0.1)

    from ceres_tpu.linalg.schur import schur_solve
    from ceres_tpu.types import PreconditionerType

    opts_dense = SolverOptions(linear_solver_type=LinearSolverType.DENSE_SCHUR,
                               preconditioner_type=PreconditionerType.IDENTITY)
    step_dense, _ = schur_solve(program, opts_dense, jac, res_groups, grad, dsq)
    step_sparse, _ = solve_sparse_schur(
        program, opts_dense, jac, res_groups, grad, dsq
    )
    np.testing.assert_allclose(
        np.asarray(step_sparse), np.asarray(step_dense), rtol=1e-8, atol=1e-10
    )


def test_sparse_schur_end_to_end():
    bal = synthetic_bal(6, 50, 200, seed=2)
    problem, _, _ = build_ba_problem(bal)
    s = ceres_tpu.solve(
        SolverOptions(
            linear_solver_type=LinearSolverType.SPARSE_SCHUR,
            max_num_iterations=30,
        ),
        problem,
    )
    assert s.termination_type == TerminationType.CONVERGENCE
    assert abs(s.final_cost - 112.8969) < 0.5, s.final_cost


def test_sparse_schur_non_ba_shape_falls_back():
    # two camera classes (sizes 9 and 6) -> _camera_streams raises and the
    # step function falls back to the implicit dense-S path; the solve must
    # still converge.
    import jax.numpy as jn

    rng = np.random.default_rng(0)
    problem = ceres_tpu.Problem()
    a = problem.add_parameter_block(rng.normal(size=9))
    b = problem.add_parameter_block(rng.normal(size=6))
    pts = [problem.add_parameter_block(rng.normal(size=3)) for _ in range(8)]

    def res_a(params, data):
        x, p = params
        return p - x[:3] * (1.0 + jn.sum(x[3:] ** 2)) - data[0]

    def res_b(params, data):
        x, p = params
        return p[:2] - x[:2] * (1.0 + jn.sum(x[2:] ** 2)) - data[0]

    cfa = ceres_tpu.CostFunction(res_a, 3, name="ra")
    cfb = ceres_tpu.CostFunction(res_b, 2, name="rb")
    for p in pts:
        problem.add_residual_block(cfa, None, [a, p], (rng.normal(size=3),))
        problem.add_residual_block(cfb, None, [b, p], (rng.normal(size=2),))
    s = ceres_tpu.solve(
        SolverOptions(
            linear_solver_type=LinearSolverType.SPARSE_SCHUR,
            max_num_iterations=60,
        ),
        problem,
    )
    assert s.termination_type == TerminationType.CONVERGENCE, s.message
