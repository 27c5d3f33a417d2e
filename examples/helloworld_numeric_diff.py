#!/usr/bin/env python
"""Minimize 0.5 (10 - x)^2 with numeric (central-difference) derivatives
(reference: examples/helloworld_numeric_diff.cc)."""

import _common  # noqa: F401
import jax.numpy as jnp

import ceres_tpu
from ceres_tpu import SolverOptions
from ceres_tpu.autodiff import NumericDiffCostFunction
from ceres_tpu.problem import Problem


def main():
    problem = Problem()
    x = problem.add_parameter_block([0.5])

    def f(params, data):
        return jnp.stack([10.0 - params[0][0]])

    cf = NumericDiffCostFunction(f, 1, method="CENTRAL", name="hello")
    problem.add_residual_block(cf, None, [x])
    summary = ceres_tpu.solve(SolverOptions(), problem)
    print(summary.brief_report())
    print("x =", float(problem.parameter_block_value(x)[0]))


if __name__ == "__main__":
    main()
