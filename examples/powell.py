#!/usr/bin/env python
"""Minimize Powell's singular function (reference: examples/powell.cc)."""

import _common  # noqa: F401
import ceres_tpu
from ceres_tpu import LinearSolverType, SolverOptions
from ceres_tpu.examples.test_functions import build_powell_problem


def main():
    problem, handles = build_powell_problem()
    options = SolverOptions(
        linear_solver_type=LinearSolverType.DENSE_QR,
        max_num_iterations=100,
        minimizer_progress_to_stdout=True,
    )
    summary = ceres_tpu.solve(options, problem)
    print(summary.brief_report())
    x = [float(problem.parameter_block_value(h)[0]) for h in handles]
    print("final x =", x)


if __name__ == "__main__":
    main()
