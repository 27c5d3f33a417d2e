"""Cost-function adapter tests (reference analogs: normal_prior_test.cc,
conditioned_cost_function_test.cc, cost_function_to_functor_test.cc)."""

import jax.numpy as jnp
import numpy as np

import ceres_tpu
from ceres_tpu import CostFunction, Problem, SolverOptions
from ceres_tpu.cost_functions import (
    conditioned_cost_function,
    cost_function_to_functor,
    normal_prior,
    scaled_cost_function,
)


def test_normal_prior():
    a = np.array([[2.0, 0.0], [0.0, 3.0], [1.0, 1.0]])
    b = np.array([1.0, -1.0])
    cf = normal_prior(a, b)
    x = jnp.asarray([2.0, 1.0])
    r = np.asarray(cf.fn((x,), ()))
    np.testing.assert_allclose(r, a @ (np.asarray(x) - b))

    # solving drives x to b (overdetermined prior)
    p = Problem()
    h = p.add_parameter_block([5.0, 5.0])
    p.add_residual_block(cf, None, [h])
    ceres_tpu.solve(SolverOptions(max_num_iterations=50), p)
    np.testing.assert_allclose(p.parameter_block_value(h), b, atol=1e-8)


def test_conditioned_cost_function():
    def base(params, data):
        (x,) = params
        return jnp.stack([x[0], x[1]])

    cf = conditioned_cost_function(
        CostFunction(base, 2), [lambda r: 2.0 * r + 1.0, None]
    )
    r = np.asarray(cf.fn((jnp.asarray([3.0, 4.0]),), ()))
    np.testing.assert_allclose(r, [7.0, 4.0])


def test_cost_function_to_functor():
    def base(params, data):
        (x,) = params
        return jnp.stack([x[0] * 2.0])

    inner = cost_function_to_functor(CostFunction(base, 1))

    def outer(params, data):
        (x,) = params
        return inner((x,)) + 1.0

    cf = CostFunction(outer, 1)
    r = np.asarray(cf.fn((jnp.asarray([2.0]),), ()))
    np.testing.assert_allclose(r, [5.0])


def test_scaled_cost_function():
    def base(params, data):
        (x,) = params
        return jnp.stack([x[0] - 1.0])

    cf = scaled_cost_function(CostFunction(base, 1), 3.0)
    r = np.asarray(cf.fn((jnp.asarray([2.0]),), ()))
    np.testing.assert_allclose(r, [3.0])


def test_evaluation_callback_invoked():
    calls = []

    def cb(new_point, with_jac):
        calls.append((new_point, with_jac))

    def f(params, data):
        (x,) = params
        return jnp.stack([x[0] - 1.0])

    p = Problem(evaluation_callback=cb)
    h = p.add_parameter_block([0.0])
    p.add_residual_block(CostFunction(f, 1), None, [h])
    ceres_tpu.solve(SolverOptions(max_num_iterations=5), p)
    assert any(wj for _, wj in calls)  # jacobian evaluations notified
    assert any(not wj for _, wj in calls)  # residual-only too


def test_analytic_cost_function_jacobian_and_solve():
    """AnalyticCostFunction routes user Jacobians through linearize
    (sized_cost_function.h / helloworld_analytic_diff.cc analog)."""
    from ceres_tpu import AnalyticCostFunction
    from ceres_tpu.autodiff import batched_value_and_jacobians

    # r0 = a0*x0 + x1^2 - d,  r1 = sin(x0) * x1 with hand-written Jacobians
    def fn(params, data):
        (x,) = params
        return jnp.stack([3.0 * x[0] + x[1] ** 2 - data[0], jnp.sin(x[0]) * x[1]])

    def jac(params, data):
        (x,) = params
        return (
            jnp.array(
                [
                    [3.0, 2.0 * x[1]],
                    [jnp.cos(x[0]) * x[1], jnp.sin(x[0])],
                ]
            ),
        )

    cf = AnalyticCostFunction(fn, jac, 2)
    x = jnp.asarray([0.7, -1.3])
    data = jnp.asarray([[2.0]])
    vals, jacs = batched_value_and_jacobians(cf.fn, (x[None, :],), data)
    # matches pure autodiff of the same expression
    vals_ad, jacs_ad = batched_value_and_jacobians(fn, (x[None, :],), data)
    np.testing.assert_allclose(np.asarray(vals), np.asarray(vals_ad), atol=1e-12)
    np.testing.assert_allclose(
        np.asarray(jacs[0]), np.asarray(jacs_ad[0]), atol=1e-12
    )

    # end-to-end solve with the analytic block
    p = Problem()
    h = p.add_parameter_block([0.5, 0.5])
    p.add_residual_block(cf, None, [h], data=np.array([2.0]))
    summary = ceres_tpu.solve(SolverOptions(max_num_iterations=60), p)
    assert summary.final_cost < 1e-14


def test_analytic_cost_function_wrong_jac_count():
    from ceres_tpu import AnalyticCostFunction
    from ceres_tpu.autodiff import batched_value_and_jacobians

    def fn(params, data):
        (x,) = params
        return x * 2.0

    def bad_jac(params, data):
        return (jnp.eye(2), jnp.eye(2))  # two jacobians for one block

    cf = AnalyticCostFunction(fn, bad_jac, 2)
    import pytest

    with pytest.raises(ValueError, match="Jacobians"):
        batched_value_and_jacobians(cf.fn, (jnp.ones((1, 2)),), jnp.zeros((1, 0)))
