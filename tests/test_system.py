"""System tests: classic test functions under multiple solver configs.

reference analog: system_test.cc + more_garbow_hillstrom.cc accuracy runs,
plus checkpoint/resume and interpolation module tests.
"""

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
from ceres_tpu.examples.more_garbow_hillstrom import PROBLEMS


EASY = [p for p in PROBLEMS if p.name in (
    "rosenbrock", "beale", "helical_valley", "bard", "box_3d", "wood",
    "freudenstein_roth", "brown_dennis", "jennrich_sampson",
    "powell_singular", "kowalik_osborne", "gaussian", "osborne_1",
    "osborne_2", "biggs_exp6",
)]


@pytest.mark.parametrize("tp", EASY, ids=lambda tp: tp.name)
def test_garbow_hillstrom_lm(tp):
    problem, b = tp.build()
    # brown_dennis is a hard quartic: needs non-monotonic acceptance and
    # many iterations (scipy's LM needs ~400 evaluations too); it then hits
    # the certified minimum exactly.
    hard = tp.name == "brown_dennis"
    options = SolverOptions(
        linear_solver_type=LinearSolverType.DENSE_QR,
        max_num_iterations=2000 if hard else 200,
        use_nonmonotonic_steps=hard,
        function_tolerance=1e-14,
        gradient_tolerance=1e-12 if not hard else 1e-10,
        parameter_tolerance=1e-12,
    )
    summary = ceres_tpu.solve(options, problem)
    assert summary.termination_type == TerminationType.CONVERGENCE, summary.message
    # The certified minimum (or a known secondary local minimum — e.g.
    # Freudenstein-Roth has one at 24.4921 from this start, as the reference
    # notes in more_garbow_hillstrom.cc).
    known_local = {
        "freudenstein_roth": 24.4921,
        # Biggs EXP6 with m=13 has a well-known local minimum at
        # 0.5*5.65565e-3 reachable from the standard start
        "biggs_exp6": 0.5 * 5.65565e-3,
    }
    bound = max(tp.f_min * 1.01 + 1e-10, 1e-10)
    if tp.name in known_local:
        bound = max(bound, known_local[tp.name] * 1.01)
    assert summary.final_cost <= bound, (tp.name, summary.final_cost, tp.f_min)


CONSTRAINED = [p for p in PROBLEMS if p.name in (
    "beale", "gaussian", "box_3d", "wood", "brown_dennis",
)]


@pytest.mark.parametrize("tp", CONSTRAINED, ids=lambda tp: tp.name)
def test_garbow_hillstrom_bounds_constrained(tp):
    """Box-constrained variants against the reference's certified
    constrained optimal costs (more_garbow_hillstrom.cc CONSTRAINED_SOLVE
    list)."""
    problem, b = tp.build(constrained=True)
    options = SolverOptions(
        linear_solver_type=LinearSolverType.DENSE_QR,
        max_num_iterations=500,
        use_nonmonotonic_steps=tp.name == "brown_dennis",
        function_tolerance=1e-14,
        gradient_tolerance=1e-12,
        parameter_tolerance=1e-12,
    )
    summary = ceres_tpu.solve(options, problem)
    # clamped actives can stall the gradient test; cost parity is the check
    assert summary.termination_type in (
        TerminationType.CONVERGENCE,
        TerminationType.NO_CONVERGENCE,
    ), summary.message
    target = tp.constrained_f_min
    assert summary.final_cost <= max(target * 1.02 + 1e-10, 1e-10), (
        tp.name, summary.final_cost, target,
    )


@pytest.mark.parametrize(
    "dogleg", [DoglegType.TRADITIONAL_DOGLEG, DoglegType.SUBSPACE_DOGLEG],
    ids=lambda d: d.value,
)
def test_dogleg_strategy(dogleg):
    tp = next(p for p in PROBLEMS if p.name == "rosenbrock")
    problem, b = tp.build()
    options = SolverOptions(
        trust_region_strategy_type=TrustRegionStrategyType.DOGLEG,
        dogleg_type=dogleg,
        linear_solver_type=LinearSolverType.DENSE_QR,
        max_num_iterations=300,
        function_tolerance=1e-14,
        parameter_tolerance=1e-14,
    )
    summary = ceres_tpu.solve(options, problem)
    assert summary.final_cost < 1e-8, (summary.message, summary.final_cost)
    np.testing.assert_allclose(problem.parameter_block_value(b), [1.0, 1.0], atol=1e-3)


def test_sparse_normal_cholesky_matches_dense():
    from ceres_tpu.examples.test_functions import build_curve_fitting_problem

    finals = []
    for solver in [LinearSolverType.DENSE_QR, LinearSolverType.SPARSE_NORMAL_CHOLESKY]:
        p, mc = build_curve_fitting_problem()
        s = ceres_tpu.solve(
            SolverOptions(linear_solver_type=solver, max_num_iterations=50), p
        )
        assert s.termination_type == TerminationType.CONVERGENCE, s.message
        finals.append(p.parameter_block_value(mc))
    np.testing.assert_allclose(finals[0], finals[1], rtol=1e-8)


def test_checkpoint_roundtrip(tmp_path):
    from ceres_tpu.checkpoint import (
        Checkpoint,
        CheckpointCallback,
        resume_problem_from,
    )
    from ceres_tpu.examples.test_functions import build_curve_fitting_problem

    path = str(tmp_path / "state.npz")
    p, mc = build_curve_fitting_problem()
    cb = CheckpointCallback(p, path, every=1)
    options = SolverOptions(
        max_num_iterations=12, callbacks=[cb], update_state_every_iteration=True
    )
    ceres_tpu.solve(options, p)
    assert np.load(path)["state"].shape == (2,)

    p2, mc2 = build_curve_fitting_problem()
    ckpt = resume_problem_from(p2, path)
    np.testing.assert_allclose(
        p2.parameter_block_value(mc2), p.parameter_block_value(mc)
    )
    assert ckpt.iteration >= 1


def test_interpolation_matches_function():
    import jax
    import jax.numpy as jnp

    from ceres_tpu.interpolation import BiCubicInterpolator, CubicInterpolator

    # Catmull-Rom reproduces quadratics exactly in the interior
    xs = np.arange(10.0)
    vals = 0.5 * xs**2 - xs + 3.0
    interp = CubicInterpolator(vals)
    for q in [2.3, 4.75, 7.5]:
        expected = 0.5 * q**2 - q + 3.0
        np.testing.assert_allclose(float(interp(jnp.asarray(q))), expected, rtol=1e-12)
    # differentiable
    g = jax.grad(lambda q: interp(q))(jnp.asarray(3.7))
    np.testing.assert_allclose(float(g), 3.7 - 1.0, rtol=1e-10)

    # bicubic on a bilinear surface is exact
    r, c = np.meshgrid(np.arange(8.0), np.arange(9.0), indexing="ij")
    surf = 2.0 * r - 3.0 * c + 0.5 * r * c
    bi = BiCubicInterpolator(surf)
    for (qr, qc) in [(2.5, 3.5), (4.1, 6.9)]:
        expected = 2.0 * qr - 3.0 * qc + 0.5 * qr * qc
        np.testing.assert_allclose(
            float(bi(jnp.asarray(qr), jnp.asarray(qc))), expected, rtol=1e-10
        )


def test_loss_function_wrapper_swap():
    import jax.numpy as jnp

    from ceres_tpu import CauchyLoss, CostFunction, Problem, TrivialLoss
    from ceres_tpu.loss import LossFunctionWrapper

    def f(params, data):
        (x,) = params
        return jnp.stack([x[0] - 5.0, x[1] + 5.0])

    wrapper = LossFunctionWrapper(TrivialLoss())
    p = Problem()
    b = p.add_parameter_block([0.0, 0.0])
    p.add_residual_block(CostFunction(f, 2), wrapper, [b])
    c1, _, _, _ = p.evaluate()
    wrapper.reset(CauchyLoss(0.3))
    p.mark_structure_dirty()
    c2, _, _, _ = p.evaluate()
    assert c2 < c1  # Cauchy shrinks the large residuals
