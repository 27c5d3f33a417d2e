"""Scatter-free bucketed reduction tests: with the threshold lowered, the
bucketed path must reproduce the segment_sum fallback exactly (gradient,
column norms, block-diagonal JtJ, and a full Schur solve)."""

import numpy as np
import pytest

import ceres_tpu
from ceres_tpu import LinearSolverType, PreconditionerType, SolverOptions
from ceres_tpu.io.bal import build_ba_problem, synthetic_bal
from ceres_tpu.program import Program


@pytest.fixture
def low_threshold(monkeypatch):
    monkeypatch.setattr(Program, "SEG_REDUCE_THRESHOLD", 16)


def build(seed=2):
    bal = synthetic_bal(6, 50, 200, seed=seed)
    return build_ba_problem(bal)[0]


def test_bucket_metadata_well_formed(low_threshold):
    problem = build()
    program = problem.compile()
    metas = [m for m in program.groups if m.seg_reduce]
    assert metas, "expected the BA group to get seg_reduce metadata"
    meta = metas[0]
    (pos, buckets), = meta.seg_reduce.items()
    # buckets cover all rows exactly once, in order
    covered = 0
    for row_start, n_seg, d, out_row in buckets:
        assert row_start == covered
        covered += n_seg * d
    assert covered == meta.n


def test_bucketed_matches_fallback(low_threshold):
    import jax.numpy as jnp

    problem = build()
    program = problem.compile()
    ev = program.evaluator()
    state = program.state_vector()
    cost, res_groups, jac, grad = ev.evaluate_groups(state)

    # fallback: strip seg_reduce and recompute
    saved = [m.seg_reduce for m in program.groups]
    for m in program.groups:
        m.seg_reduce = None
    grad_fb = jac.left_multiply(res_groups)
    cn_fb = jac.squared_column_norms()
    bd_fb = jac.block_diag_jtj()
    for m, s in zip(program.groups, saved):
        m.seg_reduce = s
    grad_bk = jac.left_multiply(res_groups)
    cn_bk = jac.squared_column_norms()
    bd_bk = jac.block_diag_jtj()

    np.testing.assert_allclose(np.asarray(grad_bk), np.asarray(grad_fb), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(cn_bk), np.asarray(cn_fb), rtol=1e-12)
    for a, b in zip(bd_bk, bd_fb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)


def test_solve_with_bucketed_reduction(low_threshold):
    problem = build()
    s = ceres_tpu.solve(
        SolverOptions(
            linear_solver_type=LinearSolverType.ITERATIVE_SCHUR,
            preconditioner_type=PreconditionerType.SCHUR_JACOBI,
            max_num_iterations=30,
        ),
        problem,
    )
    assert s.termination_type == ceres_tpu.TerminationType.CONVERGENCE
    assert abs(s.final_cost - 112.8969) < 0.5, s.final_cost
