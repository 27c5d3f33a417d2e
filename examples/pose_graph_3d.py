#!/usr/bin/env python
"""3-D pose-graph SLAM (reference: examples/slam/pose_graph_3d)."""

import argparse

import _common  # noqa: F401
import ceres_tpu
from ceres_tpu import SolverOptions
from ceres_tpu.examples.pose_graph import (
    build_pose_graph_3d_problem,
    load_g2o_3d,
)


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--input", required=True, help="g2o 3D file")
    args = ap.parse_args()
    g = load_g2o_3d(args.input)
    problem, handles = build_pose_graph_3d_problem(g)
    summary = ceres_tpu.solve(SolverOptions(max_num_iterations=100), problem)
    print(summary.brief_report())


if __name__ == "__main__":
    main()
