#!/usr/bin/env python
"""1-D hallway robot localization MLE (reference: examples/robot_pose_mle.cc):
odometry + range residuals over the pose chain."""

import _common  # noqa: F401
import ceres_tpu
from ceres_tpu import SolverOptions
from ceres_tpu.examples.misc_examples import (
    build_robot_pose_mle_problem,
    simulate_robot,
)


def main():
    odometry, ranges, truth = simulate_robot()
    out = build_robot_pose_mle_problem(odometry, ranges)
    problem, handles = out[0], out[1]
    summary = ceres_tpu.solve(SolverOptions(max_num_iterations=100), problem)
    print(summary.brief_report())
    est = [float(problem.parameter_block_value(h)[0]) for h in handles]
    print("estimated step sizes:", [round(v, 3) for v in est[:8]], "...")


if __name__ == "__main__":
    main()
