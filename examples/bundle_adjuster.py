#!/usr/bin/env python
"""Bundle adjustment driver over BAL datasets.

reference: examples/bundle_adjuster.cc / bundle_adjuster.cu.cc (the program
behind the README benchmarks; flag surface at bundle_adjuster.cu.cc:74-145).

Usage:
  python examples/bundle_adjuster.py --input problem-16-22106-pre.txt \
      --linear_solver iterative_schur --preconditioner schur_jacobi \
      --num_iterations 20
  python examples/bundle_adjuster.py --synthetic 16,2210,8000   # no dataset

Prints the solver full report and per-phase timings, like
Solver::Summary::FullReport().
"""

import argparse
import os
import sys

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

import numpy as np


def main():
    ap = argparse.ArgumentParser(description=__doc__)
    ap.add_argument("--input", help="BAL problem file")
    ap.add_argument(
        "--synthetic",
        help="generate a synthetic BAL problem: num_cameras,num_points,num_obs",
    )
    ap.add_argument(
        "--linear_solver",
        default="iterative_schur",
        choices=[
            "dense_qr",
            "dense_normal_cholesky",
            "sparse_normal_cholesky",
            "dense_schur",
            "sparse_schur",
            "iterative_schur",
            "cgnr",
        ],
    )
    ap.add_argument(
        "--preconditioner",
        default="schur_jacobi",
        choices=[
            "identity",
            "jacobi",
            "schur_jacobi",
            "schur_power_series_expansion",
        ],
    )
    ap.add_argument("--num_iterations", type=int, default=20)
    ap.add_argument("--eta", type=float, default=1e-1)
    ap.add_argument("--robustify", action="store_true", help="use Huber loss")
    ap.add_argument("--inner_iterations", action="store_true")
    ap.add_argument("--nonmonotonic_steps", action="store_true")
    ap.add_argument("--mixed_precision", action="store_true", help="f32 path")
    ap.add_argument("--num_devices", type=int, default=1, help="mesh size (dp)")
    ap.add_argument("--initial_ply", help="write initial reconstruction PLY")
    ap.add_argument("--final_ply", help="write final reconstruction PLY")
    args = ap.parse_args()

    import jax

    jax.config.update("jax_compilation_cache_dir", "/root/repo/.jax_cache")
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    jax.config.update("jax_persistent_cache_min_entry_size_bytes", -1)
    if not args.mixed_precision:
        jax.config.update("jax_enable_x64", True)

    import ceres_tpu
    from ceres_tpu import (
        HuberLoss,
        LinearSolverType,
        PreconditionerType,
        SolverOptions,
    )
    from ceres_tpu.io.bal import build_ba_problem, load_bal, synthetic_bal

    if args.input:
        bal = load_bal(args.input)
    elif args.synthetic:
        nc, np_, no = (int(x) for x in args.synthetic.split(","))
        bal = synthetic_bal(nc, np_, no, seed=1)
    else:
        ap.error("provide --input or --synthetic")
    print(
        f"problem: {bal.num_cameras} cameras, {bal.num_points} points, "
        f"{bal.num_observations} observations"
    )
    bal.normalize()
    if args.initial_ply:
        bal.write_ply(args.initial_ply)

    loss = HuberLoss(1.0) if args.robustify else None
    problem, cams, pts = build_ba_problem(bal, loss=loss)

    mesh = None
    if args.num_devices > 1:
        from jax.sharding import Mesh

        mesh = Mesh(np.array(jax.devices()[: args.num_devices]), ("dp",))

    options = SolverOptions(
        linear_solver_type=LinearSolverType[args.linear_solver.upper()],
        preconditioner_type=PreconditionerType[args.preconditioner.upper()],
        max_num_iterations=args.num_iterations,
        eta=args.eta,
        use_inner_iterations=args.inner_iterations,
        use_nonmonotonic_steps=args.nonmonotonic_steps,
        minimizer_progress_to_stdout=True,
        mesh=mesh,
    )
    summary = ceres_tpu.solve(options, problem)
    print()
    print(summary.full_report())

    if args.final_ply:
        bal.cameras = np.stack([problem.parameter_block_value(c) for c in cams])
        bal.points = np.stack([problem.parameter_block_value(p) for p in pts])
        bal.write_ply(args.final_ply)


if __name__ == "__main__":
    main()
