#!/usr/bin/env python
"""Minimize an interpolated sampled function
(reference: examples/sampled_function/sampled_function.cc)."""

import _common  # noqa: F401
import numpy as np

import ceres_tpu
from ceres_tpu import SolverOptions
from ceres_tpu.examples.denoising import build_sampled_function_problem


def main():
    xs = np.arange(11.0)
    samples = (xs - 4.5) ** 2
    problem, b = build_sampled_function_problem(samples, x0=1.0)
    summary = ceres_tpu.solve(SolverOptions(max_num_iterations=100), problem)
    print(summary.brief_report())
    print("argmin x =", float(problem.parameter_block_value(b)[0]))


if __name__ == "__main__":
    main()
