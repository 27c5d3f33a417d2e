"""On-TPU differential test for the single-pass fused S·y kernel
(linalg/pallas_schur.py) against the composed four-product tvec path.

Strategy per the reference's CUDA differential suite
(evaluator_cuda_test.cu.cc): same operator, two implementations, outputs
must agree to accumulation-order noise; plus an end-to-end fused LM solve
with the kernel on vs off (final costs must match).
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

import ceres_tpu  # noqa: E402
from ceres_tpu import HuberLoss  # noqa: E402
from ceres_tpu.evaluator import Evaluator  # noqa: E402
from ceres_tpu.io.bal import build_ba_problem, synthetic_bal  # noqa: E402
from ceres_tpu.linalg import pallas_schur as ps  # noqa: E402
from ceres_tpu.linalg.preconditioners import BlockDiagSolver  # noqa: E402
from ceres_tpu.linalg.schur import (  # noqa: E402
    _pure_class_split,
    _shrink_tvec,
    make_ete_solver,
    schur_views,
)
from ceres_tpu.types import (  # noqa: E402
    LinearSolverType,
    PreconditionerType,
    SolverOptions,
)


@pytest.fixture(scope="module")
def setup():
    bal = synthetic_bal(64, 30_000, 150_000, seed=3)
    problem, _, _ = build_ba_problem(bal, loss=HuberLoss(1.0))
    program = problem.compile()
    ev = Evaluator(program, dtype=jnp.float32)
    state = program.state_vector(jnp.float32)
    _c, _r, jac0, _g = ev.evaluate_groups(state)
    jac = jax.jit(lambda j: j.materialize_scale())(jac0)
    return program, jac


def test_meta_eligible(setup):
    program, _jac = setup
    meta = ps.sy_meta(program)
    assert meta is not None
    assert meta["r"] == 2 and meta["te"] == 3 and meta["tf"] == 9


@pytest.mark.parametrize("dtype", [jnp.float32, jnp.bfloat16])
def test_fused_matches_composed(setup, dtype):
    program, jac = setup
    meta = ps.sy_meta(program)
    e_np, f_np = program.schur_tangent_masks()
    dsq = jnp.full(
        (program.num_effective_parameters,), 0.1, jnp.float32
    )
    dsq_e = dsq * jnp.asarray(e_np, jnp.float32)
    dsq_f = dsq * jnp.asarray(f_np, jnp.float32)
    jac_e, jac_f = schur_views(program, jac)
    jac_e_m = jax.jit(lambda j: j.astype(dtype))(jac_e)
    jac_f_m = jax.jit(lambda j: j.astype(dtype))(jac_f)
    f_set = _pure_class_split(program)[0]
    f_cls = meta["f_cls"]

    @jax.jit
    def setup_fn(jac_e, jac_e_m, jac_f_m):
        ete = make_ete_solver(program, jac_e, dsq_e)
        arrs = ps.build_sy_arrays(program, jac_e_m, jac_f_m, meta)
        minv = ps.build_minv_segments(
            ete.inv_tables[meta["e_cls"]], meta
        )
        return dict(ete.inv_tables), arrs, minv

    ete_tables, arrs, minv_segs = setup_fn(jac_e, jac_e_m, jac_f_m)
    rng = np.random.default_rng(0)
    y = jnp.asarray(
        rng.normal(size=program.num_effective_parameters), jnp.float32
    ) * jnp.asarray(f_np, jnp.float32)
    y_tv = jax.jit(lambda j, v: _shrink_tvec(j.tvec(v), f_set))(jac, y)
    dsq_tv = jax.jit(lambda j, v: _shrink_tvec(j.tvec(v), f_set))(
        jac, dsq_f
    )

    @jax.jit
    def composed(y_tv, ete_tables, dsq_tv):
        ete = BlockDiagSolver.from_inverse_tables(program, ete_tables)
        t1 = jac_f_m.right_multiply_t(y_tv)
        t2 = ete.apply_t(jac_e_m.left_multiply_t(t1))
        et2 = jac_e_m.right_multiply_t(t2)
        diff = [a - b for a, b in zip(t1, et2)]
        out = _shrink_tvec(jac_f_m.left_multiply_t(diff), f_set)
        return [o + d * v for o, d, v in zip(out, dsq_tv, y_tv)]

    @jax.jit
    def fused(y_tv, arrs, minv_segs, dsq_tv):
        out = ps.sy_apply(meta, arrs, minv_segs, y_tv[f_cls], dtype)
        w = y_tv[f_cls].shape[1]
        if out.shape[1] < w:
            out = jnp.pad(out, ((0, 0), (0, w - out.shape[1])))
        return [
            out + dsq_tv[c] * y_tv[c]
            if c == f_cls
            else jnp.zeros_like(y_tv[c])
            for c in range(len(y_tv))
        ]

    want = composed(y_tv, ete_tables, dsq_tv)
    got = fused(y_tv, arrs, minv_segs, dsq_tv)
    tol = 5e-6 if dtype == jnp.float32 else 1e-2
    for a, b in zip(got, want):
        if a.size == 0:
            continue
        scale = float(jnp.max(jnp.abs(b))) or 1.0
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=tol
        )


def test_e2e_solve_parity():
    def run():
        bal = synthetic_bal(
            48,
            20_000,
            140_000,
            seed=5,
            observation_noise=2.0,
            perturb_points=0.5,
        )
        problem, _, _ = build_ba_problem(bal, loss=HuberLoss(1.0))
        options = SolverOptions(
            linear_solver_type=LinearSolverType.ITERATIVE_SCHUR,
            preconditioner_type=PreconditionerType.SCHUR_JACOBI,
            fused_execution_chunk_iters=4,
            max_num_iterations=6,
            eta=1e-1,
            max_linear_solver_iterations=25,
            function_tolerance=0.0,
            gradient_tolerance=0.0,
            parameter_tolerance=0.0,
        )
        return ceres_tpu.solve(options, problem)

    s_on = run()
    os.environ["CERES_TPU_NO_FUSED_SY"] = "1"
    try:
        s_off = run()
    finally:
        del os.environ["CERES_TPU_NO_FUSED_SY"]
    assert s_on.final_cost == pytest.approx(
        s_off.final_cost, rel=1e-5
    )
