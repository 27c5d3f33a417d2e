#!/usr/bin/env python
"""Minimize 0.5 (10 - x)^2 — the canonical first example.

reference: examples/helloworld.cc (autodiff), helloworld_numeric_diff.cc,
helloworld_analytic_diff.cc — all three differentiation modes shown.
"""

import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import jax

jax.config.update("jax_enable_x64", True)

import jax.numpy as jnp

import ceres_tpu
from ceres_tpu import (
    AnalyticCostFunction,
    CostFunction,
    NumericDiffCostFunction,
    Problem,
    SolverOptions,
)


def f(params, data):
    (x,) = params
    return jnp.stack([10.0 - x[0]])


def f_jac(params, data):
    # hand-derived d(10 - x)/dx = -1 (helloworld_analytic_diff.cc)
    return (jnp.array([[-1.0]]),)


def run(cost_function, label):
    problem = Problem()
    x = problem.add_parameter_block([0.5])
    problem.add_residual_block(cost_function, None, [x])
    summary = ceres_tpu.solve(SolverOptions(max_num_iterations=50), problem)
    print(f"{label}: x = {problem.parameter_block_value(x)[0]:.10f} "
          f"({summary.termination_type.value})")


if __name__ == "__main__":
    run(CostFunction(f, 1), "autodiff      ")
    run(NumericDiffCostFunction(f, 1, method="CENTRAL"), "numeric diff  ")
    run(AnalyticCostFunction(f, f_jac, 1), "analytic      ")
