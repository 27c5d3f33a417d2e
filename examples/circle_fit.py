#!/usr/bin/env python
"""Robust circle fit (reference: examples/circle_fit.cc)."""

import _common  # noqa: F401
import ceres_tpu
from ceres_tpu import SolverOptions
from ceres_tpu.examples.misc_examples import (
    build_circle_fit_problem,
    synthetic_circle_points,
)


def main():
    pts = synthetic_circle_points()
    problem, xy, m = build_circle_fit_problem(pts)
    summary = ceres_tpu.solve(SolverOptions(max_num_iterations=100), problem)
    print(summary.brief_report())
    cx, cy = problem.parameter_block_value(xy)
    r = float(problem.parameter_block_value(m)[0]) ** 2  # r = m^2 (circle_fit.cc)
    print(f"center = ({cx:.4f}, {cy:.4f}), radius = {r:.4f}")


if __name__ == "__main__":
    main()
