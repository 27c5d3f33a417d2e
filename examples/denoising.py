#!/usr/bin/env python
"""Fields-of-Experts image denoising (reference: examples/denoising.cc).

Usage:
  python examples/denoising.py --input /root/reference/data/ceres_noisy.pgm \
      --foe_file /root/reference/data/2x2.foe --output denoised.pgm
"""

import argparse

import _common  # noqa: F401
import numpy as np

import ceres_tpu
from ceres_tpu import LinearSolverType, SolverOptions
from ceres_tpu.examples.denoising import (
    build_foe_denoising_problem,
    load_foe_file,
    load_pgm,
    save_pgm,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="noisy PGM image")
    ap.add_argument("--foe_file", required=True, help="trained FoE prior")
    ap.add_argument("--output", help="output PGM")
    ap.add_argument("--sigma", type=float, default=20.0)
    ap.add_argument("--num_iterations", type=int, default=10)
    args = ap.parse_args()

    foe = load_foe_file(args.foe_file)
    img = load_pgm(args.input)
    problem, px = build_foe_denoising_problem(img, foe, sigma=args.sigma)
    options = SolverOptions(
        linear_solver_type=LinearSolverType.CGNR,
        max_num_iterations=args.num_iterations,
        minimizer_progress_to_stdout=True,
    )
    summary = ceres_tpu.solve(options, problem)
    print(summary.brief_report())
    if args.output:
        out = np.array(
            [problem.parameter_block_value(i)[0] for i in px]
        ).reshape(img.shape)
        save_pgm(args.output, out)


if __name__ == "__main__":
    main()
