#!/usr/bin/env python
"""Minimize Rosenbrock as a first-order problem
(reference: examples/rosenbrock.cc, GradientProblemSolver)."""

import _common  # noqa: F401
import numpy as np

from ceres_tpu import SolverOptions
from ceres_tpu.gradient_problem import GradientProblem, solve_gradient_problem


def rosenbrock(x):
    return (1.0 - x[0]) ** 2 + 100.0 * (x[1] - x[0] ** 2) ** 2


def main():
    problem = GradientProblem(rosenbrock, size=2)
    x0 = np.array([-1.2, 1.0])
    x, summary = solve_gradient_problem(
        SolverOptions(max_num_iterations=200), problem, x0
    )
    print(summary.brief_report())
    print("x =", np.asarray(x))


if __name__ == "__main__":
    main()
