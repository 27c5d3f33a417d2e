#!/usr/bin/env python
"""Minimal BAL bundle adjustment (reference:
examples/simple_bundle_adjuster.cc): load (or synthesize) a BAL problem,
solve with DENSE_SCHUR-style defaults, print the brief report."""

import argparse

import _common  # noqa: F401
import ceres_tpu
from ceres_tpu import LinearSolverType, SolverOptions
from ceres_tpu.io.bal import build_ba_problem, load_bal, synthetic_bal


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="BAL problem file (synthetic if omitted)")
    args = ap.parse_args()
    bal = load_bal(args.input) if args.input else synthetic_bal(8, 128, 512, seed=0)
    bal.normalize()
    problem, _, _ = build_ba_problem(bal)
    options = SolverOptions(
        linear_solver_type=LinearSolverType.ITERATIVE_SCHUR,
        max_num_iterations=50,
        minimizer_progress_to_stdout=True,
    )
    summary = ceres_tpu.solve(options, problem)
    print(summary.full_report())


if __name__ == "__main__":
    main()
