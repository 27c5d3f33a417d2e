"""Lane-chunked evaluation / reductions must match the single-slice path
exactly (chunking exists to bound XLA fusion temporaries at BAL-13682
scale; the math is identical)."""

import numpy as np
import pytest

import ceres_tpu.jacobian as jacobian_mod
from ceres_tpu.io.bal import build_ba_problem, synthetic_bal
from ceres_tpu.program import Program


@pytest.fixture
def tiny_chunks(monkeypatch):
    monkeypatch.setattr(jacobian_mod, "LANE_CHUNK", 64)
    monkeypatch.setattr(Program, "SEG_REDUCE_THRESHOLD", 16)


def _eval_all(program):
    ev = program.evaluator()
    state = program.state_vector()
    cost, res_groups, jac, grad = ev.evaluate_groups(state)
    cn = jac.squared_column_norms()
    bd = jac.block_diag_jtj()
    v = np.linspace(-1, 1, program.num_effective_parameters)
    jv = jac.right_multiply(v)
    return cost, res_groups, grad, cn, bd, jv


def test_chunked_matches_unchunked(tiny_chunks):
    bal = synthetic_bal(6, 50, 200, seed=3)
    problem, _, _ = build_ba_problem(bal)
    chunked = _eval_all(problem.compile())

    # reference: single slice (LANE_CHUNK larger than the group)
    jacobian_mod.LANE_CHUNK = 1 << 30
    bal2 = synthetic_bal(6, 50, 200, seed=3)
    problem2, _, _ = build_ba_problem(bal2)
    full = _eval_all(problem2.compile())

    for a, b in zip(chunked[1], full[1]):  # residual groups
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(chunked[2]), np.asarray(full[2]), rtol=1e-12)
    np.testing.assert_allclose(np.asarray(chunked[3]), np.asarray(full[3]), rtol=1e-12)
    for a, b in zip(chunked[4], full[4]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)
    for a, b in zip(chunked[5], full[5]):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-12)
    assert abs(float(chunked[0]) - float(full[0])) < 1e-9 * max(1.0, float(full[0]))
