"""Dogleg strategy tests: exact subspace boundary minimizer and
Gauss-Newton reuse across rejected steps.

reference analog: dogleg_strategy.cc ComputeSubspaceDoglegStep (quartic
Lagrange-multiplier boundary solve, here the PD secular equation) and the
reuse_ flag (GN caching across radius-only changes,
dogleg_strategy.cc:74-107,617-643).
"""

import jax.numpy as jnp
import numpy as np
import pytest

import ceres_tpu
from ceres_tpu import (
    DoglegType,
    LinearSolverType,
    SolverOptions,
    TerminationType,
    TrustRegionStrategyType,
)
from ceres_tpu.solvers.dogleg import _boundary_minimizer_2d, _eigh2


def _brute_boundary_min(b, g, radius, n=4_000_000):
    # dense angular scan, then local quadratic polish around the best angle
    ts = np.linspace(0.0, 2 * np.pi, 200_001)
    ys = radius * np.stack([np.cos(ts), np.sin(ts)], axis=1)
    vals = 0.5 * np.einsum("ki,ij,kj->k", ys, b, ys) + ys @ g
    t0 = ts[np.argmin(vals)]

    def f(t):
        y = radius * np.array([np.cos(t), np.sin(t)])
        return 0.5 * y @ b @ y + g @ y

    from scipy.optimize import minimize_scalar

    res = minimize_scalar(
        f, bracket=(t0 - 1e-3, t0, t0 + 1e-3), method="brent",
        options={"xtol": 1e-14},
    )
    t = res.x
    return radius * np.array([np.cos(t), np.sin(t)])


@pytest.mark.parametrize("seed", range(8))
def test_boundary_minimizer_matches_dense_reference(seed):
    rng = np.random.default_rng(seed)
    a = rng.normal(size=(2, 2))
    b = a.T @ a + np.diag(rng.uniform(1e-6, 1.0, 2))  # PD
    g = rng.normal(size=2) * 10.0 ** rng.integers(-2, 3)
    radius = float(10.0 ** rng.uniform(-2, 2))
    # only meaningful when the unconstrained minimum is outside the ball
    y_unc = np.linalg.solve(b, -g)
    if np.linalg.norm(y_unc) <= radius:
        radius = 0.5 * np.linalg.norm(y_unc)

    y = np.asarray(_boundary_minimizer_2d(jnp.asarray(b), jnp.asarray(g), radius))
    y_ref = _brute_boundary_min(b, g, radius)

    def model(x):
        return 0.5 * x @ b @ x + g @ x

    # the model values must agree to 1e-10 relative (the points themselves
    # may differ only in the degenerate symmetric case)
    scale = max(abs(model(y_ref)), 1e-30)
    assert abs(model(y) - model(y_ref)) / scale < 1e-10, (model(y), model(y_ref))
    np.testing.assert_allclose(np.linalg.norm(y), radius, rtol=1e-12)


def test_eigh2_matches_numpy():
    rng = np.random.default_rng(0)
    for _ in range(20):
        a = rng.normal(size=(2, 2))
        b = a.T @ a
        lams, q = _eigh2(jnp.asarray(b))
        w_ref = np.linalg.eigvalsh(b)
        np.testing.assert_allclose(np.asarray(lams), w_ref, rtol=1e-12, atol=1e-12)
        rec = np.asarray(q) @ np.diag(np.asarray(lams)) @ np.asarray(q).T
        np.testing.assert_allclose(rec, b, rtol=1e-10, atol=1e-12)


def _rosenbrock_problem():
    def res(params, data):
        (xy,) = params
        return jnp.stack([10.0 * (xy[1] - xy[0] ** 2), 1.0 - xy[0]])

    from ceres_tpu.autodiff import CostFunction
    from ceres_tpu.problem import Problem

    p = Problem()
    b = p.add_parameter_block(np.array([-1.2, 1.0]))
    p.add_residual_block(CostFunction(res, 2, name="rosen"), None, [b])
    return p, b


@pytest.mark.parametrize("dtype", [DoglegType.TRADITIONAL_DOGLEG,
                                   DoglegType.SUBSPACE_DOGLEG])
def test_dogleg_rosenbrock_converges(dtype):
    p, b = _rosenbrock_problem()
    opts = SolverOptions(
        trust_region_strategy_type=TrustRegionStrategyType.DOGLEG,
        dogleg_type=dtype,
        linear_solver_type=LinearSolverType.DENSE_QR,
        max_num_iterations=300,
    )
    s = ceres_tpu.solve(opts, p)
    assert s.termination_type == TerminationType.CONVERGENCE
    np.testing.assert_allclose(p.parameter_block_value(b), [1.0, 1.0], atol=1e-6)


def test_subspace_beats_or_matches_traditional_on_rosenbrock():
    # the exact subspace step must not be worse than the piecewise path
    iters = {}
    for dtype in (DoglegType.TRADITIONAL_DOGLEG, DoglegType.SUBSPACE_DOGLEG):
        p, _ = _rosenbrock_problem()
        opts = SolverOptions(
            trust_region_strategy_type=TrustRegionStrategyType.DOGLEG,
            dogleg_type=dtype,
            linear_solver_type=LinearSolverType.DENSE_QR,
            max_num_iterations=300,
            fused_execution=False,
        )
        s = ceres_tpu.solve(opts, p)
        assert s.termination_type == TerminationType.CONVERGENCE
        iters[dtype] = s.num_successful_steps + s.num_unsuccessful_steps
    assert iters[DoglegType.SUBSPACE_DOGLEG] <= iters[DoglegType.TRADITIONAL_DOGLEG] + 5


def test_gauss_newton_reuse_across_rejections():
    # host loop: the radius-independent prepare() must be evaluated once
    # per Jacobian, not once per attempt
    import ceres_tpu.solvers.trust_region as tr_mod
    from ceres_tpu.evaluator import Evaluator
    from ceres_tpu.solvers.trust_region import TrustRegionMinimizer
    from ceres_tpu.types import Summary

    p, b = _rosenbrock_problem()
    opts = SolverOptions(
        trust_region_strategy_type=TrustRegionStrategyType.DOGLEG,
        dogleg_type=DoglegType.SUBSPACE_DOGLEG,
        linear_solver_type=LinearSolverType.DENSE_QR,
        max_num_iterations=100,
        initial_trust_region_radius=1e8,  # forces early rejections
        fused_execution=False,
    )
    program = p.compile(opts)
    evaluator = Evaluator(program, dtype=opts.dtype)
    minimizer = TrustRegionMinimizer(program, opts, evaluator)
    assert minimizer._prepare_fn is not None

    calls = {"n": 0}
    orig = minimizer._prepare_fn

    def counting_prepare(*a, **k):
        calls["n"] += 1
        return orig(*a, **k)

    minimizer._prepare_fn = counting_prepare
    summary = Summary()
    state = program.state_vector(opts.dtype)
    minimizer.minimize(state, summary)
    attempts = summary.num_successful_steps + summary.num_unsuccessful_steps
    assert summary.num_unsuccessful_steps > 0  # rejections actually happened
    # one prepare per Jacobian at most (the last Jacobian may terminate on
    # convergence before another step solve), and strictly fewer prepares
    # than step attempts — rejections reuse the cached Gauss-Newton point
    assert calls["n"] <= summary.num_jacobian_evaluations
    assert calls["n"] < attempts, (calls["n"], attempts)
