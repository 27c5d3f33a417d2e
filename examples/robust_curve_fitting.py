#!/usr/bin/env python
"""Exponential curve fit with outliers under CauchyLoss
(reference: examples/robust_curve_fitting.cc)."""

import _common  # noqa: F401
import ceres_tpu
from ceres_tpu import CauchyLoss, SolverOptions
from ceres_tpu.examples.test_functions import (
    build_curve_fitting_problem,
    make_curve_fitting_data,
)


def main():
    import numpy as np

    data = make_curve_fitting_data(seed=2)
    rng = np.random.default_rng(5)
    out_rows = rng.choice(data.shape[0], 8, replace=False)
    data[out_rows, 1] += rng.uniform(2.0, 6.0, 8)  # gross outliers
    problem, mc = build_curve_fitting_problem(data=data, loss=CauchyLoss(2.0))
    summary = ceres_tpu.solve(SolverOptions(max_num_iterations=100), problem)
    print(summary.brief_report())
    m, c = problem.parameter_block_value(mc)
    print(f"m = {m:.4f} (truth 0.3), c = {c:.4f} (truth 0.1)")


if __name__ == "__main__":
    main()
