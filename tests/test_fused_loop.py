"""Device-fused trust-region loop: behavioral parity with the host loop.

The fused chunk (solvers/fused_loop.py) must reproduce the host loop's
decisions exactly — same accepted steps, same radius trajectory, same
termination — since both implement trust_region_minimizer.cc:66-124.
"""

import numpy as np
import pytest

import ceres_tpu
from ceres_tpu import (
    LinearSolverType,
    PreconditionerType,
    Problem,
    SolverOptions,
    TerminationType,
)
from ceres_tpu.autodiff import CostFunction
from ceres_tpu.io.bal import build_ba_problem, synthetic_bal


def _rosenbrock_problem():
    p = Problem()
    xy = p.add_parameter_block(np.array([-1.2, 1.0]))

    def f(ps, d):
        import jax.numpy as jnp

        x, y = ps[0][0], ps[0][1]
        return jnp.stack([10.0 * (y - x * x), 1.0 - x])

    p.add_residual_block(CostFunction(f, 2), None, [xy])
    return p


@pytest.mark.parametrize("fused", [True, False])
def test_rosenbrock_converges(fused):
    p = _rosenbrock_problem()
    s = ceres_tpu.solve(
        SolverOptions(
            linear_solver_type=LinearSolverType.DENSE_QR,
            fused_execution=fused,
            max_num_iterations=200,
        ),
        p,
    )
    assert s.termination_type == TerminationType.CONVERGENCE
    assert s.final_cost < 1e-10


@pytest.mark.parametrize("nonmono", [False, True])
def test_fused_matches_host_loop_trajectory(nonmono):
    """Same iteration count, successful-step count, and final cost."""

    def run(fused):
        bal = synthetic_bal(6, 50, 200, seed=4)
        problem, _, _ = build_ba_problem(bal)
        return ceres_tpu.solve(
            SolverOptions(
                linear_solver_type=LinearSolverType.ITERATIVE_SCHUR,
                preconditioner_type=PreconditionerType.SCHUR_JACOBI,
                max_num_iterations=25,
                fused_execution=fused,
                use_nonmonotonic_steps=nonmono,
                max_consecutive_nonmonotonic_steps=3,
            ),
            problem,
        )

    sf = run(True)
    sh = run(False)
    assert sf.termination_type == sh.termination_type
    assert sf.num_successful_steps == sh.num_successful_steps
    assert sf.num_unsuccessful_steps == sh.num_unsuccessful_steps
    assert len(sf.iterations) == len(sh.iterations)
    np.testing.assert_allclose(sf.final_cost, sh.final_cost, rtol=1e-10)
    # per-iteration radii match
    for a, b in zip(sf.iterations[1:], sh.iterations[1:]):
        np.testing.assert_allclose(
            a.trust_region_radius, b.trust_region_radius, rtol=1e-6
        )
        assert a.step_is_successful == b.step_is_successful


def test_fused_max_iterations():
    p = _rosenbrock_problem()
    s = ceres_tpu.solve(
        SolverOptions(
            linear_solver_type=LinearSolverType.DENSE_QR,
            max_num_iterations=3,
            function_tolerance=0.0,
            gradient_tolerance=0.0,
            parameter_tolerance=0.0,
        ),
        p,
    )
    assert s.termination_type == TerminationType.NO_CONVERGENCE
    assert len(s.iterations) == 4  # iteration 0 + 3


def test_fused_nonmonotonic_steps():
    bal = synthetic_bal(6, 50, 200, seed=5)
    problem, _, _ = build_ba_problem(bal)
    s = ceres_tpu.solve(
        SolverOptions(
            linear_solver_type=LinearSolverType.ITERATIVE_SCHUR,
            use_nonmonotonic_steps=True,
            max_consecutive_nonmonotonic_steps=3,
            max_num_iterations=30,
        ),
        problem,
    )
    assert s.termination_type == TerminationType.CONVERGENCE
