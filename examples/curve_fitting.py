#!/usr/bin/env python
"""Exponential curve fitting, optionally robustified.

reference: examples/curve_fitting.cc + robust_curve_fitting.cc (structure;
data is generated from the same y = exp(m x + c) + noise model).
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--robust", action="store_true", help="Cauchy loss")
    ap.add_argument("--outliers", type=int, default=0)
    ap.add_argument("--num_points", type=int, default=67)
    args = ap.parse_args()

    import jax

    jax.config.update("jax_enable_x64", True)
    import numpy as np

    import ceres_tpu
    from ceres_tpu import CauchyLoss, SolverOptions
    from ceres_tpu.examples.test_functions import (
        build_curve_fitting_problem,
        make_curve_fitting_data,
    )

    data = make_curve_fitting_data(n=args.num_points)
    if args.outliers:
        rng = np.random.default_rng(5)
        rows = rng.choice(data.shape[0], args.outliers, replace=False)
        data[rows, 1] += rng.normal(0, 10.0, args.outliers)

    loss = CauchyLoss(0.5) if args.robust else None
    problem, mc = build_curve_fitting_problem(data, loss=loss)
    options = SolverOptions(max_num_iterations=100, minimizer_progress_to_stdout=True)
    summary = ceres_tpu.solve(options, problem)
    print(summary.brief_report())
    m, c = problem.parameter_block_value(mc)
    print(f"estimated m = {m:.6f} (truth 0.3), c = {c:.6f} (truth 0.1)")


if __name__ == "__main__":
    main()
