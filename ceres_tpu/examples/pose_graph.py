"""Pose-graph SLAM (2D and 3D): g2o parsing, cost functors, problem build.

reference: examples/slam/pose_graph_2d/*, examples/slam/pose_graph_3d/*.
2D poses are (x, y, yaw) with yaw handled on SO(2) via angle normalization;
3D poses are (position, quaternion) with the quaternion on the
EigenQuaternionManifold, matching the reference's parameterization. The
residual weighting uses the square root of the information matrix.
"""

from __future__ import annotations

import dataclasses

import jax.numpy as jnp
import numpy as np

from ..autodiff import CostFunction
from ..manifolds import EigenQuaternionManifold, SubsetManifold
from ..problem import Problem


# ------------------------------- 2D ---------------------------------- #


def normalize_angle(a):
    """Wrap to (-pi, pi]; pose_graph_2d/normalize_angle.h."""
    return a - 2.0 * jnp.pi * jnp.floor((a + jnp.pi) / (2.0 * jnp.pi))


def pose_graph_2d_residual(params, data):
    """params = (xa[2], ya_yaw[1], xb[2], yb_yaw[1])? — we use
    (pose_a[3], pose_b[3]) with pose = [x, y, yaw].
    data = (measurement [3], sqrt_information [3,3]).
    reference: pose_graph_2d_error_term.h."""
    pa, pb = params
    meas, sqrt_info = data
    cos_a = jnp.cos(pa[2])
    sin_a = jnp.sin(pa[2])
    # R_a^T (p_b - p_a)
    dx = pb[0] - pa[0]
    dy = pb[1] - pa[1]
    p_ab = jnp.stack([cos_a * dx + sin_a * dy, -sin_a * dx + cos_a * dy])
    r_pos = p_ab - meas[:2]
    r_ang = normalize_angle((pb[2] - pa[2]) - meas[2])
    return sqrt_info @ jnp.concatenate([r_pos, r_ang[None]])


@dataclasses.dataclass
class PoseGraph2D:
    poses: np.ndarray  # [n, 3] (x, y, yaw)
    edges_ij: np.ndarray  # [m, 2]
    measurements: np.ndarray  # [m, 3]
    sqrt_informations: np.ndarray  # [m, 3, 3]


def build_pose_graph_2d_problem(g: PoseGraph2D):
    """reference: pose_graph_2d.cc BuildOptimizationProblem (first pose
    fixed to remove gauge freedom)."""
    problem = Problem()
    ids = problem.add_parameter_blocks(g.poses)
    cf = CostFunction(pose_graph_2d_residual, 3, name="pg2d")
    pid = np.stack([ids[g.edges_ij[:, 0]], ids[g.edges_ij[:, 1]]], axis=1)
    problem.add_residual_blocks(cf, None, pid, (g.measurements, g.sqrt_informations))
    problem.set_parameter_block_constant(ids[0])
    return problem, ids


def synthetic_pose_graph_2d(n: int = 40, noise: float = 0.05, seed: int = 0):
    """Circle trajectory with odometry + one loop-closure edge."""
    rng = np.random.default_rng(seed)
    ang = np.linspace(0, 2 * np.pi, n, endpoint=False)
    poses_true = np.stack(
        [10 * np.cos(ang), 10 * np.sin(ang), normalize_angle_np(ang + np.pi / 2)], 1
    )
    edges, meas = [], []
    for i in range(n):
        j = (i + 1) % n
        edges.append((i, j))
        meas.append(relative_pose_2d(poses_true[i], poses_true[j]))
    # extra loop closures
    for _ in range(n // 4):
        i, j = rng.integers(0, n, 2)
        if i != j:
            edges.append((i, j))
            meas.append(relative_pose_2d(poses_true[i], poses_true[j]))
    meas = np.asarray(meas) + rng.normal(0, noise, (len(edges), 3))
    sqrt_info = np.tile(np.eye(3) / noise, (len(edges), 1, 1))
    poses_init = poses_true + rng.normal(0, 0.5, poses_true.shape)
    poses_init[0] = poses_true[0]
    return (
        PoseGraph2D(poses_init, np.asarray(edges), meas, sqrt_info),
        poses_true,
    )


def normalize_angle_np(a):
    return a - 2.0 * np.pi * np.floor((a + np.pi) / (2.0 * np.pi))


def relative_pose_2d(pa, pb):
    c, s = np.cos(pa[2]), np.sin(pa[2])
    d = pb[:2] - pa[:2]
    return np.array(
        [c * d[0] + s * d[1], -s * d[0] + c * d[1], normalize_angle_np(pb[2] - pa[2])]
    )


def load_g2o_2d(path) -> PoseGraph2D:
    """Parse VERTEX_SE2 / EDGE_SE2 lines; pose_graph_2d/read_g2o.h format."""
    poses = {}
    edges, meas, infos = [], [], []
    with open(path) as f:
        for line in f:
            tok = line.split()
            if not tok:
                continue
            if tok[0] == "VERTEX_SE2":
                poses[int(tok[1])] = [float(tok[2]), float(tok[3]), float(tok[4])]
            elif tok[0] == "EDGE_SE2":
                i, j = int(tok[1]), int(tok[2])
                edges.append((i, j))
                meas.append([float(tok[3]), float(tok[4]), float(tok[5])])
                # upper-triangular information: I11 I12 I13 I22 I23 I33
                v = [float(t) for t in tok[6:12]]
                info = np.array(
                    [[v[0], v[1], v[2]], [v[1], v[3], v[4]], [v[2], v[4], v[5]]]
                )
                infos.append(np.linalg.cholesky(info).T)
    n = max(poses) + 1
    pose_arr = np.zeros((n, 3))
    for k, v in poses.items():
        pose_arr[k] = v
    return PoseGraph2D(pose_arr, np.asarray(edges), np.asarray(meas), np.asarray(infos))


# ------------------------------- 3D ---------------------------------- #


def pose_graph_3d_residual(params, data):
    """params = (pa_pos[3], pa_q[4 xyzw], pb_pos[3], pb_q[4 xyzw]);
    data = (t_ab[3], q_ab [4 xyzw], sqrt_information [6,6]).
    reference: pose_graph_3d_error_term.h."""
    pa, qa, pb, qb = params
    t_ab, q_ab, sqrt_info = data

    def conj(q):
        return q * jnp.asarray([-1.0, -1.0, -1.0, 1.0], dtype=q.dtype)

    def qmul(a, b):
        # xyzw order
        x = a[3] * b[0] + a[0] * b[3] + a[1] * b[2] - a[2] * b[1]
        y = a[3] * b[1] - a[0] * b[2] + a[1] * b[3] + a[2] * b[0]
        z = a[3] * b[2] + a[0] * b[1] - a[1] * b[0] + a[2] * b[3]
        w = a[3] * b[3] - a[0] * b[0] - a[1] * b[1] - a[2] * b[2]
        return jnp.stack([x, y, z, w])

    def rotate(q, p):
        t = 2.0 * jnp.cross(q[:3], p)
        return p + q[3] * t + jnp.cross(q[:3], t)

    qa_inv = conj(qa)
    p_ab_est = rotate(qa_inv, pb - pa)
    q_ab_est = qmul(qa_inv, qb)
    delta_q = qmul(conj(q_ab), q_ab_est)
    r = jnp.concatenate([p_ab_est - t_ab, 2.0 * delta_q[:3]])
    return sqrt_info @ r


@dataclasses.dataclass
class PoseGraph3D:
    positions: np.ndarray  # [n, 3]
    quaternions: np.ndarray  # [n, 4] xyzw
    edges_ij: np.ndarray  # [m, 2]
    t_measurements: np.ndarray  # [m, 3]
    q_measurements: np.ndarray  # [m, 4] xyzw
    sqrt_informations: np.ndarray  # [m, 6, 6]


def build_pose_graph_3d_problem(g: PoseGraph3D):
    """reference: pose_graph_3d.cc BuildOptimizationProblem."""
    problem = Problem()
    pos_ids = problem.add_parameter_blocks(g.positions)
    q_ids = problem.add_parameter_blocks(
        g.quaternions, manifold=EigenQuaternionManifold()
    )
    cf = CostFunction(pose_graph_3d_residual, 6, name="pg3d")
    pid = np.stack(
        [
            pos_ids[g.edges_ij[:, 0]],
            q_ids[g.edges_ij[:, 0]],
            pos_ids[g.edges_ij[:, 1]],
            q_ids[g.edges_ij[:, 1]],
        ],
        axis=1,
    )
    problem.add_residual_blocks(
        cf, None, pid, (g.t_measurements, g.q_measurements, g.sqrt_informations)
    )
    problem.set_parameter_block_constant(pos_ids[0])
    problem.set_parameter_block_constant(q_ids[0])
    return problem, pos_ids, q_ids


def load_g2o_3d(path) -> PoseGraph3D:
    """Parse VERTEX_SE3:QUAT / EDGE_SE3:QUAT; pose_graph_3d/read_g2o.h."""
    positions, quats = {}, {}
    edges, tm, qm, infos = [], [], [], []
    with open(path) as f:
        for line in f:
            tok = line.split()
            if not tok:
                continue
            if tok[0] == "VERTEX_SE3:QUAT":
                idx = int(tok[1])
                positions[idx] = [float(t) for t in tok[2:5]]
                quats[idx] = [float(t) for t in tok[5:9]]
            elif tok[0] == "EDGE_SE3:QUAT":
                edges.append((int(tok[1]), int(tok[2])))
                tm.append([float(t) for t in tok[3:6]])
                qm.append([float(t) for t in tok[6:10]])
                v = [float(t) for t in tok[10:31]]
                info = np.zeros((6, 6))
                k = 0
                for i in range(6):
                    for j in range(i, 6):
                        info[i, j] = info[j, i] = v[k]
                        k += 1
                infos.append(np.linalg.cholesky(info).T)
    n = max(positions) + 1
    pos = np.zeros((n, 3))
    q = np.zeros((n, 4))
    for k2, v in positions.items():
        pos[k2] = v
    for k2, v in quats.items():
        q[k2] = v
    return PoseGraph3D(
        pos, q, np.asarray(edges), np.asarray(tm), np.asarray(qm), np.asarray(infos)
    )
