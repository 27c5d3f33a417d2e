"""Power-series expansion: SPSE preconditioner + PCG warm start.

reference: power_series_expansion_preconditioner.cc:51-72 (the truncated
Neumann series), iterative_schur_complement_solver.cc:95-107
(use_spse_initialization warm start). These tests pin that the options are
live: the series converges to S^{-1} v, the warm start reduces PCG
iterations, and spse_tolerance controls the truncation depth.
"""

import numpy as np
import jax.numpy as jnp

import ceres_tpu
from ceres_tpu import LinearSolverType, PreconditionerType, SolverOptions
from ceres_tpu.io.bal import build_ba_problem, synthetic_bal
from ceres_tpu.linalg.schur import (
    make_ete_solver,
    make_power_series_applier,
    schur_solve,
    schur_views,
)


def _pieces(dsq_value=10.0, seed=4):
    bal = synthetic_bal(5, 30, 120, seed=seed)
    problem, _, _ = build_ba_problem(bal)
    program = problem.compile()
    ev = program.evaluator()
    state = program.state_vector()
    _c, res_groups, jac, grad = ev.evaluate_groups(state)
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

    return (program, jac_e, jac_f, ete, dsq_f, np.asarray(f_np), s_apply,
            res_groups, jac, grad, dsq)


def _dense_s(program, f_np, s_apply):
    n_eff = program.num_effective_parameters
    f_idx = np.nonzero(f_np)[0]
    cols = []
    for j in f_idx:
        e = np.zeros(n_eff)
        e[j] = 1.0
        cols.append(np.asarray(s_apply(jnp.asarray(e)))[f_idx])
    return np.stack(cols, axis=1), f_idx


def test_power_series_matches_dense_neumann_series():
    """The applier must produce exactly the reference's truncated series
    y = sum_k (P^{-1} C)^k P^{-1} v with P = blockdiag(F'F + D_f^2) and
    C = P - S (power_series_expansion_preconditioner.cc:51-72), and deeper
    truncations must approach the exact S^{-1} v."""
    (program, jac_e, jac_f, ete, dsq_f, f_np, s_apply,
     *_rest) = _pieces(dsq_value=50.0)
    s_dense, f_idx = _dense_s(program, f_np, s_apply)

    # dense P: blockdiag(F'F + D_f^2) restricted to the f-coordinates
    n_eff = program.num_effective_parameters
    tables = jac_f.block_diag_jtj(dsq=dsq_f)
    p_dense = np.zeros((n_eff, n_eff))
    for cls, tbl in enumerate(tables):
        if tbl is None:
            continue
        s = program.tangent_class_sizes[cls]
        cnt = program.tangent_class_counts[cls]
        base = int(program.tangent_class_bases[cls])
        t = np.asarray(tbl)[:, :cnt]
        for c in range(cnt):
            p_dense[base + c * s : base + (c + 1) * s,
                    base + c * s : base + (c + 1) * s] = t[:, c].reshape(s, s)
    p_f = p_dense[np.ix_(f_idx, f_idx)]
    c_f = p_f - s_dense

    rng = np.random.RandomState(0)
    v = np.zeros(n_eff)
    v[f_idx] = rng.randn(f_idx.size)
    exact = np.linalg.solve(s_dense, v[f_idx])

    def dense_series(k_terms):
        y0 = np.linalg.solve(p_f, v[f_idx])
        y, term = y0.copy(), y0.copy()
        for _ in range(k_terms):
            term = np.linalg.solve(p_f, c_f @ term)
            y = y + term
        return y

    errs = []
    for k in (1, 5, 40):
        applier = make_power_series_applier(
            program, jac_e, jac_f, ete, dsq_f, spse_tolerance=0.0,
            max_iterations=k,
        )
        got = np.asarray(applier(jnp.asarray(v)))[f_idx]
        np.testing.assert_allclose(got, dense_series(k), rtol=1e-8, atol=1e-10)
        errs.append(np.linalg.norm(got - exact) / np.linalg.norm(exact))
    # deeper series -> closer to the exact solve
    assert errs[2] < errs[1] < errs[0]


def test_spse_initialization_reduces_pcg_iterations():
    (program, jac_e, jac_f, ete, dsq_f, f_np, s_apply,
     res_groups, jac, grad, dsq) = _pieces(dsq_value=10.0)

    def solve_with(use_init):
        opts = SolverOptions(
            linear_solver_type=LinearSolverType.ITERATIVE_SCHUR,
            preconditioner_type=PreconditionerType.JACOBI,
            use_spse_initialization=use_init,
            max_num_spse_iterations=20,
            spse_tolerance=1e-3,
            eta=1e-9,
            max_linear_solver_iterations=500,
        )
        return schur_solve(program, opts, jac, res_groups, grad, dsq)

    step_cold, iters_cold = solve_with(False)
    step_warm, iters_warm = solve_with(True)
    # same linear system, same solution
    np.testing.assert_allclose(
        np.asarray(step_warm), np.asarray(step_cold), rtol=1e-4, atol=1e-8
    )
    # the warm start must observably change (reduce) the PCG work
    assert int(iters_warm) < int(iters_cold)


def test_spse_initialization_end_to_end_parity():
    bal = synthetic_bal(4, 28, 112, seed=7)
    problem_a, _, _ = build_ba_problem(bal)
    problem_b, _, _ = build_ba_problem(bal)
    base = dict(
        linear_solver_type=LinearSolverType.ITERATIVE_SCHUR,
        preconditioner_type=PreconditionerType.SCHUR_JACOBI,
        max_num_iterations=10,
    )
    s_cold = ceres_tpu.solve(SolverOptions(**base), problem_a)
    s_warm = ceres_tpu.solve(
        SolverOptions(use_spse_initialization=True, **base), problem_b
    )
    assert s_warm.final_cost <= s_cold.final_cost * (1 + 1e-6) + 1e-10
