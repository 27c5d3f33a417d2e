#!/usr/bin/env python
"""Piecewise-linear curve approximation of ellipse samples
(reference: examples/ellipse_approximation.cc)."""

import _common  # noqa: F401
import numpy as np

import ceres_tpu
from ceres_tpu import SolverOptions
from ceres_tpu.examples.misc_examples import build_ellipse_approximation_problem


def main():
    rng = np.random.default_rng(0)
    t = rng.uniform(-np.pi, np.pi, 200)
    pts = np.stack([2.0 * np.cos(t), np.sin(t)], axis=1)
    pts += rng.normal(0, 0.02, pts.shape)
    problem, verts = build_ellipse_approximation_problem(pts)
    summary = ceres_tpu.solve(
        SolverOptions(max_num_iterations=100, use_inner_iterations=True), problem
    )
    print(summary.brief_report())


if __name__ == "__main__":
    main()
