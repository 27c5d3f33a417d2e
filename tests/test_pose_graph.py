"""Pose-graph SLAM tests (reference analog: examples/slam/*)."""

import numpy as np
import pytest

import ceres_tpu
from ceres_tpu import LinearSolverType, SolverOptions, TerminationType
from ceres_tpu.examples.pose_graph import (
    build_pose_graph_2d_problem,
    load_g2o_2d,
    normalize_angle_np,
    synthetic_pose_graph_2d,
)


def test_pose_graph_2d_recovers_trajectory():
    g, truth = synthetic_pose_graph_2d(n=24, noise=0.01, seed=1)
    problem, ids = build_pose_graph_2d_problem(g)
    options = SolverOptions(
        linear_solver_type=LinearSolverType.CGNR, max_num_iterations=50
    )
    summary = ceres_tpu.solve(options, problem)
    assert summary.termination_type == TerminationType.CONVERGENCE, summary.message
    est = np.stack([problem.parameter_block_value(i) for i in ids])
    # positions close to truth (gauge fixed by constant first pose)
    err = np.linalg.norm(est[:, :2] - truth[:, :2], axis=1).mean()
    assert err < 0.2, err
    ang_err = np.abs(normalize_angle_np(est[:, 2] - truth[:, 2])).mean()
    assert ang_err < 0.05


def test_g2o_2d_roundtrip(tmp_path):
    g, _ = synthetic_pose_graph_2d(n=8, seed=2)
    path = tmp_path / "g.g2o"
    with open(path, "w") as f:
        for i, p in enumerate(g.poses):
            f.write(f"VERTEX_SE2 {i} {p[0]:.17g} {p[1]:.17g} {p[2]:.17g}\n")
        for e, m, si in zip(g.edges_ij, g.measurements, g.sqrt_informations):
            info = si.T @ si
            f.write(
                f"EDGE_SE2 {e[0]} {e[1]} {m[0]:.17g} {m[1]:.17g} {m[2]:.17g} "
                f"{info[0,0]:.17g} {info[0,1]:.17g} {info[0,2]:.17g} "
                f"{info[1,1]:.17g} {info[1,2]:.17g} {info[2,2]:.17g}\n"
            )
    loaded = load_g2o_2d(path)
    np.testing.assert_allclose(loaded.poses, g.poses)
    np.testing.assert_array_equal(loaded.edges_ij, g.edges_ij)
    np.testing.assert_allclose(loaded.measurements, g.measurements)
    np.testing.assert_allclose(loaded.sqrt_informations, g.sqrt_informations, rtol=1e-8)


def test_pose_graph_3d_improves():
    # small synthetic 3D pose graph: ring with noisy initialization
    from ceres_tpu.examples.pose_graph import (
        PoseGraph3D,
        build_pose_graph_3d_problem,
    )
    from ceres_tpu.rotation import (
        angle_axis_to_quaternion,
    )
    import jax.numpy as jnp

    rng = np.random.default_rng(3)
    n = 10
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    pos_true = np.stack([5 * np.cos(ang), 5 * np.sin(ang), np.zeros(n)], 1)
    # identity orientations (wxyz -> xyzw storage)
    quat_true = np.tile([0.0, 0.0, 0.0, 1.0], (n, 1))

    edges, tm, qm = [], [], []
    for i in range(n):
        j = (i + 1) % n
        edges.append((i, j))
        tm.append(pos_true[j] - pos_true[i])  # identity rotations
        qm.append([0.0, 0.0, 0.0, 1.0])
    sqrt_info = np.tile(np.eye(6) * 10.0, (len(edges), 1, 1))

    pos_init = pos_true + rng.normal(0, 0.3, pos_true.shape)
    pos_init[0] = pos_true[0]
    g = PoseGraph3D(
        pos_init,
        quat_true.copy(),
        np.asarray(edges),
        np.asarray(tm),
        np.asarray(qm),
        sqrt_info,
    )
    problem, pos_ids, q_ids = build_pose_graph_3d_problem(g)
    options = SolverOptions(
        linear_solver_type=LinearSolverType.CGNR, max_num_iterations=50
    )
    summary = ceres_tpu.solve(options, problem)
    assert summary.final_cost < 1e-2 * summary.initial_cost, summary.message
    est = np.stack([problem.parameter_block_value(i) for i in pos_ids])
    assert np.linalg.norm(est - pos_true, axis=1).mean() < 0.05
