"""TPU smoke tier: the 5 on-chip checks every TPU-path change must pass.

Mirrors the reference's differential strategy
(evaluator_cuda_test.cu.cc:426-456 — same problem through the CPU and CUDA
evaluators, values must match) on the actual accelerator:

1. f32 on-chip cost/residual/gradient vs a CPU-f64 reference evaluation
2. Pallas jac+residual kernel vs the on-chip XLA path
3. residual-only kernel variant (default) vs the on-chip XLA residual path
4. one fused ITERATIVE_SCHUR + SCHUR_JACOBI solve
5. eval output stability across repeated dispatch (determinism)
"""

import json
import os
import subprocess
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ceres_tpu.evaluator import evaluate  # noqa: E402
from ceres_tpu.io.bal import build_ba_problem, synthetic_bal  # noqa: E402

# ~100k observations: large enough to exercise the bucket/one-hot plans
# and the Pallas grid, small enough for seconds-scale cached runs
CAMS, PTS, OBS, SEED = 40, 20_000, 100_000, 7


@pytest.fixture(scope="module")
def prog():
    problem, _, _ = build_ba_problem(synthetic_bal(CAMS, PTS, OBS, seed=SEED))
    program = problem.compile()
    arrays = program.arrays(jnp.float32)
    state = program.state_vector(jnp.float32)
    return program, arrays, state


def _clear_kernels(program):
    for m in program.groups:
        if hasattr(m, "_pallas_kernels"):
            del m._pallas_kernels


def _eval(program, arrays, state, with_jacobian, env=None):
    saved = {}
    for k, v in (env or {}).items():
        saved[k] = os.environ.get(k)
        os.environ[k] = v
    _clear_kernels(program)
    try:
        f = jax.jit(
            lambda a, s: evaluate(program, a, s, with_jacobian=with_jacobian)
        )
        c, r, j, g = f(arrays, state)
        out = (
            float(c),
            [np.asarray(x) for x in r],
            None if g is None else np.asarray(g),
        )
        return out
    finally:
        for k, v in saved.items():
            if v is None:
                os.environ.pop(k, None)
            else:
                os.environ[k] = v
        _clear_kernels(program)


def test_f32_chip_matches_cpu_f64(prog, tmp_path):
    """On-chip f32 evaluation against the identical problem evaluated in
    f64 on CPU (subprocess — backends can't mix in-process here)."""
    program, arrays, state = prog
    ref_file = tmp_path / "ref.json"
    script = f"""
import jax
jax.config.update("jax_platforms", "cpu")
jax.config.update("jax_enable_x64", True)
import json, sys
sys.path.insert(0, {REPO!r})
from ceres_tpu.io.bal import build_ba_problem, synthetic_bal
problem, _, _ = build_ba_problem(synthetic_bal({CAMS}, {PTS}, {OBS}, seed={SEED}))
program = problem.compile()
ev = program.evaluator()
state = program.state_vector()
c, res, jac, grad = ev.evaluate(state)
import numpy as np
json.dump({{"cost": float(c),
           "grad_norm": float(np.linalg.norm(np.asarray(grad))),
           "grad_max": float(np.abs(np.asarray(grad)).max())}},
          open({str(ref_file)!r}, "w"))
"""
    subprocess.run(
        [sys.executable, "-c", script], check=True, timeout=900,
        env=dict(os.environ, JAX_PLATFORMS="cpu"),
    )
    ref = json.load(open(ref_file))

    f = jax.jit(lambda a, s: evaluate(program, a, s, with_jacobian=True))
    c, _r, _j, g = f(arrays, state)
    c = float(c)
    gnorm = float(jnp.linalg.norm(g))
    gmax = float(jnp.max(jnp.abs(g)))
    assert abs(c - ref["cost"]) <= 1e-4 * abs(ref["cost"])
    assert abs(gnorm - ref["grad_norm"]) <= 1e-3 * abs(ref["grad_norm"])
    assert abs(gmax - ref["grad_max"]) <= 1e-3 * abs(ref["grad_max"])


def test_pallas_jacobian_path_matches_xla_on_chip(prog):
    program, arrays, state = prog
    c_k, r_k, g_k = _eval(program, arrays, state, True)
    c_x, r_x, g_x = _eval(
        program, arrays, state, True, env={"CERES_TPU_NO_PALLAS": "1"}
    )
    assert abs(c_k - c_x) <= 1e-4 * (1 + abs(c_x))
    # Gradient entries are ~10^3-term f32 reductions of ~10^3-magnitude
    # Jacobian values; the XLA fusion path's fast-math rewrites cost ~1e-3
    # relative per value (pallas_eval.py header — the kernel is the MORE
    # accurate one vs f64), so the A/B tolerance is scaled to the gradient
    # magnitude rather than absolute. True-accuracy anchoring is the f64
    # reference test above.
    g_scale = float(np.abs(g_x).max())
    np.testing.assert_allclose(g_k, g_x, rtol=2e-3, atol=1e-4 * g_scale)
    for a, b in zip(r_k, r_x):
        r_scale = float(np.abs(b).max())
        np.testing.assert_allclose(a, b, rtol=2e-3, atol=1e-5 * r_scale)


def test_residual_only_kernel_matches_xla_on_chip(prog):
    """The residual-only kernel variant (default since round 4; on-chip
    A/B: 11.6 vs 21.9 ms in-graph at 5M lanes) vs the XLA path."""
    program, arrays, state = prog
    c_k, r_k, _ = _eval(program, arrays, state, False)
    c_x, r_x, _ = _eval(
        program, arrays, state, False, env={"CERES_TPU_NO_PALLAS": "1"}
    )
    assert abs(c_k - c_x) <= 1e-4 * (1 + abs(c_x))
    for a, b in zip(r_k, r_x):
        np.testing.assert_allclose(a, b, rtol=1e-3, atol=1e-3)


def test_fused_iterative_schur_solve_on_chip():
    import ceres_tpu
    from ceres_tpu import HuberLoss
    from ceres_tpu.types import (
        LinearSolverType,
        PreconditionerType,
        SolverOptions,
    )

    problem, _, _ = build_ba_problem(
        synthetic_bal(CAMS, PTS, OBS, seed=3, observation_noise=2.0,
                      perturb_points=0.3),
        loss=HuberLoss(1.0),
    )
    options = SolverOptions(
        linear_solver_type=LinearSolverType.ITERATIVE_SCHUR,
        preconditioner_type=PreconditionerType.SCHUR_JACOBI,
        fused_execution_chunk_iters=5,
        max_num_iterations=10,
        max_linear_solver_iterations=25,
    )
    s = ceres_tpu.solve(options, problem)
    assert s.used_fused_execution
    assert np.isfinite(s.final_cost)
    assert s.final_cost < 0.9 * s.initial_cost
    assert s.num_successful_steps > 0


def test_eval_deterministic_across_dispatches(prog):
    """Deterministic reductions (the atomicAdd-analog guarantee): repeated
    dispatch of the same evaluation must be bitwise stable."""
    program, arrays, state = prog
    f = jax.jit(lambda a, s: evaluate(program, a, s, with_jacobian=True))
    c1, _, _, g1 = f(arrays, state)
    c2, _, _, g2 = f(arrays, state)
    assert float(c1) == float(c2)
    assert np.array_equal(np.asarray(g1), np.asarray(g2))
