#!/usr/bin/env python
"""2-D pose-graph SLAM (reference: examples/slam/pose_graph_2d)."""

import argparse

import _common  # noqa: F401
import ceres_tpu
from ceres_tpu import SolverOptions
from ceres_tpu.examples.pose_graph import (
    build_pose_graph_2d_problem,
    load_g2o_2d,
    synthetic_pose_graph_2d,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", help="g2o file (synthetic loop if omitted)")
    args = ap.parse_args()
    g = load_g2o_2d(args.input) if args.input else synthetic_pose_graph_2d()[0]
    problem, handles = build_pose_graph_2d_problem(g)
    summary = ceres_tpu.solve(SolverOptions(max_num_iterations=100), problem)
    print(summary.brief_report())


if __name__ == "__main__":
    main()
