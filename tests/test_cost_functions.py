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
