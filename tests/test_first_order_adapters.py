"""numeric_diff_first_order + tiny_solver cost_function_adapter
(reference: numeric_diff_first_order_function.h,
tiny_solver_cost_function_adapter.h)."""

import jax.numpy as jnp
import numpy as np

from ceres_tpu import CostFunction, SolverOptions
from ceres_tpu.gradient_problem import (
    GradientProblem,
    numeric_diff_first_order,
    solve_gradient_problem,
)
from ceres_tpu.tiny_solver import cost_function_adapter, tiny_solve


def test_numeric_diff_first_order_rosenbrock():
    def rosenbrock(x):
        return (1.0 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2

    f = numeric_diff_first_order(rosenbrock, method="CENTRAL")
    x, summary = solve_gradient_problem(
        SolverOptions(max_num_iterations=200),
        GradientProblem(f, size=2),
        np.array([-1.2, 1.0]),
    )
    np.testing.assert_allclose(x, [1.0, 1.0], atol=1e-4)


def test_tiny_solver_cost_function_adapter():
    def fn(params, data):
        (x,) = params
        (target,) = data
        return x - target

    cost = CostFunction(fn, 3)
    target = jnp.asarray([1.0, -2.0, 3.0])
    res_fn = cost_function_adapter(cost, (target,))
    result = tiny_solve(res_fn, jnp.zeros(3))
    np.testing.assert_allclose(np.asarray(result.x), np.asarray(target), atol=1e-8)
    assert bool(result.converged)
