"""Tests for the smaller example problems (circle fit, robot pose MLE,
ellipse approximation). reference analogs: examples/circle_fit.cc,
robot_pose_mle.cc, ellipse_approximation.cc."""

import numpy as np

import ceres_tpu
from ceres_tpu import SolverOptions, TerminationType
from ceres_tpu.examples.misc_examples import (
    CORRIDOR_LENGTH,
    build_circle_fit_problem,
    build_ellipse_approximation_problem,
    build_robot_pose_mle_problem,
    simulate_robot,
    synthetic_circle_points,
)


def test_circle_fit_robust_to_outliers():
    pts = synthetic_circle_points(cx=2.0, cy=-1.0, r=3.0, n=120, outliers=8, seed=1)
    problem, xy, m = build_circle_fit_problem(pts)
    summary = ceres_tpu.solve(SolverOptions(max_num_iterations=100), problem)
    assert summary.final_cost < summary.initial_cost
    cx, cy = problem.parameter_block_value(xy)
    r = problem.parameter_block_value(m)[0] ** 2
    np.testing.assert_allclose([cx, cy, r], [2.0, -1.0, 3.0], atol=0.1)


def test_robot_pose_mle_localizes():
    odometry, ranges, truth = simulate_robot(n_steps=12, seed=3)
    problem, odom_ids = build_robot_pose_mle_problem(odometry, ranges)
    summary = ceres_tpu.solve(SolverOptions(max_num_iterations=100), problem)
    assert summary.termination_type == TerminationType.CONVERGENCE
    est_positions = np.cumsum(
        [problem.parameter_block_value(i)[0] for i in odom_ids]
    )
    # range sensor (sigma 0.01) should dominate odometry (sigma 0.1)
    assert np.abs(est_positions - truth).max() < 0.05


def test_ellipse_approximation():
    rng = np.random.default_rng(5)
    t = rng.uniform(-np.pi, np.pi, 200)
    pts = np.stack([2.0 * np.cos(t), np.sin(t)], axis=1) + rng.normal(0, 0.01, (200, 2))
    problem, vert_ids = build_ellipse_approximation_problem(pts, n_segments=24)
    summary = ceres_tpu.solve(SolverOptions(max_num_iterations=60), problem)
    assert summary.final_cost < summary.initial_cost
    # vertices should lie near the ellipse: (x/2)^2 + y^2 ~ 1
    verts = np.stack([problem.parameter_block_value(v) for v in vert_ids])
    vals = (verts[:, 0] / 2.0) ** 2 + verts[:, 1] ** 2
    assert np.abs(vals - 1.0).mean() < 0.1
