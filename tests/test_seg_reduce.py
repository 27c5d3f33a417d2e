"""Layout-plan tests: with the threshold lowered, the bucket (interleaved,
scatter-free) and one-hot (MXU matmul) reduction plans must reproduce the
segment_sum fallback exactly (gradient, column norms, block-diagonal JtJ,
and a full Schur solve)."""

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
    metas = [m for m in program.groups if m.red_plans]
    assert metas, "expected the BA group to get reduction plans"
    meta = metas[0]
    assert meta.owner >= 0
    plan = meta.red_plans[meta.owner]
    assert plan[0] == "bucket"
    buckets = plan[1]
    # buckets cover all lanes exactly once, in order
    covered = 0
    for lane_start, n_seg, d, out_row in buckets:
        assert lane_start == covered
        covered += n_seg * d
    assert covered == meta.n
    # interleaved layout: lane (lane_start + j*n_seg + e) belongs to class
    # row (out_row + e)
    idx = problem.compile().group_idx
    rows = np.asarray(
        program.group_idx[program.groups.index(meta)]["t_rows"][meta.owner]
    )
    for lane_start, n_seg, d, out_row in buckets:
        seg = rows[lane_start : lane_start + n_seg * d].reshape(d, n_seg)
        expect = out_row + np.arange(n_seg)
        assert np.all(seg == expect[None, :])
    # the other (camera) position gets the one-hot plan
    other = [p for p in range(len(meta.positions)) if p != meta.owner]
    assert any(meta.red_plans.get(p, ("",))[0] == "onehot" for p in other)


def test_plans_match_fallback(low_threshold):
    problem = build()
    program = problem.compile()
    ev = program.evaluator()
    state = program.state_vector()
    cost, res_groups, jac, grad = ev.evaluate_groups(state)

    # fallback: strip plans and recompute
    saved = [m.red_plans for m in program.groups]
    for m in program.groups:
        m.red_plans = {}
    grad_fb = jac.left_multiply(res_groups)
    cn_fb = jac.squared_column_norms()
    bd_fb = jac.block_diag_jtj()
    for m, s in zip(program.groups, saved):
        m.red_plans = s
    grad_bk = jac.left_multiply(res_groups)
    cn_bk = jac.squared_column_norms()
    bd_bk = jac.block_diag_jtj()

    np.testing.assert_allclose(np.asarray(grad_bk), np.asarray(grad_fb), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(cn_bk), np.asarray(cn_fb), rtol=1e-12)
    for a, b in zip(bd_bk, bd_fb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)


def test_gathers_match_fallback(low_threshold):
    """right_multiply / scale_columns use the bucket gather; must equal the
    take() fallback."""
    problem = build()
    program = problem.compile()
    ev = program.evaluator()
    state = program.state_vector()
    _, res_groups, jac, _ = ev.evaluate_groups(state)
    rng = np.random.default_rng(0)
    v = rng.standard_normal(program.num_effective_parameters)

    jv = jac.right_multiply(v)
    sc = jac.scale_columns(v)
    saved = [m.red_plans for m in program.groups]
    for m in program.groups:
        m.red_plans = {}
    jv_fb = jac.right_multiply(v)
    sc_fb = jac.scale_columns(v)
    for m, s in zip(program.groups, saved):
        m.red_plans = s
    for a, b in zip(jv, jv_fb):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)
    for ga, gb in zip(sc.jac_groups, sc_fb.jac_groups):
        for a, b in zip(ga, gb):
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
