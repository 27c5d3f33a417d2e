"""BAL (Bundle Adjustment in the Large) dataset handling.

reference: examples/bal_problem.cc/.h — loader, normalizer, perturber. The
file format (grail.cs.washington.edu/projects/bal): header
`num_cameras num_points num_observations`, then one observation per line
`cam_idx point_idx x y`, then 9 doubles per camera, then 3 per point.

Since the benchmark files are not bundled and this environment has no
network egress, `synthetic_bal` generates problems with the same structural
shape (cameras on a ring looking at a point cloud, observations with noise)
at any scale — used by tests and bench.py.
"""

from __future__ import annotations

import dataclasses

import numpy as np


@dataclasses.dataclass
class BalProblem:
    cameras: np.ndarray  # [num_cameras, 9]
    points: np.ndarray  # [num_points, 3]
    camera_index: np.ndarray  # [num_obs]
    point_index: np.ndarray  # [num_obs]
    observations: np.ndarray  # [num_obs, 2]

    @property
    def num_cameras(self) -> int:
        return self.cameras.shape[0]

    @property
    def num_points(self) -> int:
        return self.points.shape[0]

    @property
    def num_observations(self) -> int:
        return self.observations.shape[0]

    # -- reference parity helpers (bal_problem.cc) ---------------------- #

    def normalize(self, median_scale: float = 100.0):
        """Center the reconstruction and scale to a fixed median absolute
        deviation — improves conditioning (bal_problem.cc Normalize)."""
        median = np.median(self.points, axis=0)
        dev = np.abs(self.points - median).sum(axis=1)
        scale = median_scale / np.median(dev)
        self.points = scale * (self.points - median)
        # camera center c = -R' t  =>  t = -R c; normalize centers likewise
        for i in range(self.num_cameras):
            aa = self.cameras[i, :3]
            t = self.cameras[i, 3:6]
            r = _angle_axis_to_matrix(aa)
            center = -r.T @ t
            center = scale * (center - median)
            self.cameras[i, 3:6] = -r @ center

    def perturb(self, rotation_sigma=0.0, translation_sigma=0.0, point_sigma=0.0, seed=0):
        """Add Gaussian noise (bal_problem.cc Perturb)."""
        rng = np.random.default_rng(seed)
        if point_sigma > 0:
            self.points += rng.normal(0, point_sigma, self.points.shape)
        if translation_sigma > 0:
            self.cameras[:, 3:6] += rng.normal(
                0, translation_sigma, (self.num_cameras, 3)
            )
        if rotation_sigma > 0:
            self.cameras[:, :3] += rng.normal(0, rotation_sigma, (self.num_cameras, 3))

    def write_ply(self, path):
        """Export cameras+points as a PLY point cloud (bal_problem.cc
        WriteToPLYFile)."""
        with open(path, "w") as f:
            n = self.num_cameras + self.num_points
            f.write(
                "ply\nformat ascii 1.0\n"
                f"element vertex {n}\n"
                "property float x\nproperty float y\nproperty float z\n"
                "property uchar red\nproperty uchar green\nproperty uchar blue\n"
                "end_header\n"
            )
            for i in range(self.num_cameras):
                aa = self.cameras[i, :3]
                t = self.cameras[i, 3:6]
                c = -_angle_axis_to_matrix(aa).T @ t
                f.write(f"{c[0]} {c[1]} {c[2]} 0 255 0\n")
            for p in self.points:
                f.write(f"{p[0]} {p[1]} {p[2]} 255 255 255\n")


def _angle_axis_to_matrix(aa: np.ndarray) -> np.ndarray:
    theta = np.linalg.norm(aa)
    if theta < 1e-12:
        k = np.array(
            [[0, -aa[2], aa[1]], [aa[2], 0, -aa[0]], [-aa[1], aa[0], 0]]
        )
        return np.eye(3) + k
    axis = aa / theta
    k = np.array(
        [[0, -axis[2], axis[1]], [axis[2], 0, -axis[0]], [-axis[1], axis[0], 0]]
    )
    return np.eye(3) + np.sin(theta) * k + (1 - np.cos(theta)) * (k @ k)


class BalFileObservations:
    """File-backed [num_obs, 2] observation payload (io.lazy source).

    Streams the observation section of a BAL text file in bounded chunks
    and keeps only requested rows — the host-local-loading primitive for
    multi-host runs (each process gathers just the rows its devices own,
    so the full payload never exists on one host). I/O is one sequential
    scan per gather, which happens once at sharded-array construction.
    """

    def __init__(self, path):
        self.path = str(path)
        with open(self.path, "rb") as f:
            header = f.readline().split()
            self.num_cameras = int(header[0])
            self.num_points = int(header[1])
            self.num_obs = int(header[2])
            self._obs_start = f.tell()
        self.shape = (self.num_obs, 2)
        self.dtype = np.dtype(np.float64)

    def _stream_chunks(self, f, chunk_lines=1 << 19):
        """Yield (row0, [n,4] float64) chunks of the observation section."""
        row = 0
        while row < self.num_obs:
            n = min(chunk_lines, self.num_obs - row)
            lines = [f.readline() for _ in range(n)]
            vals = np.array(b" ".join(lines).split(), dtype=np.float64)
            yield row, vals.reshape(n, 4)
            row += n

    def read_indices(self):
        """(camera_index, point_index) int arrays for the whole file —
        global metadata every process needs for preprocessing."""
        cam = np.empty(self.num_obs, dtype=np.int64)
        pt = np.empty(self.num_obs, dtype=np.int64)
        with open(self.path, "rb") as f:
            f.seek(self._obs_start)
            for row0, chunk in self._stream_chunks(f):
                cam[row0 : row0 + chunk.shape[0]] = chunk[:, 0].astype(np.int64)
                pt[row0 : row0 + chunk.shape[0]] = chunk[:, 1].astype(np.int64)
            self._params_start = f.tell()
        return cam, pt

    def read_params(self):
        """(cameras [n,9], points [n,3]) from the file tail (replicated
        solver state — every process holds the parameters)."""
        with open(self.path, "rb") as f:
            start = getattr(self, "_params_start", None)
            if start is None:
                f.seek(self._obs_start)
                for _ in range(self.num_obs):
                    f.readline()
            else:
                f.seek(start)
            rest = np.array(f.read().split(), dtype=np.float64)
        nc, npnt = self.num_cameras, self.num_points
        cameras = rest[: 9 * nc].reshape(nc, 9)
        points = rest[9 * nc : 9 * nc + 3 * npnt].reshape(npnt, 3)
        return cameras, points

    def gather(self, rows) -> np.ndarray:
        rows = np.asarray(rows)
        out = np.empty((rows.shape[0], 2), dtype=np.float64)
        if rows.size == 0:
            return out
        hi = int(rows.max())
        with open(self.path, "rb") as f:
            f.seek(self._obs_start)
            for row0, chunk in self._stream_chunks(f):
                r1 = row0 + chunk.shape[0]
                sel = (rows >= row0) & (rows < r1)
                if sel.any():
                    out[sel] = chunk[rows[sel] - row0, 2:4]
                if r1 > hi:
                    break
        return out


def load_bal_lazy(path):
    """Host-local BAL loading for multi-host runs.

    Returns a BalProblem whose `observations` is a LazyRows handle: index
    columns and parameters are parsed eagerly (global metadata), the float
    observation payload stays file-backed until
    parallel.sharding.build_sharded_arrays gathers each process's shard
    rows. reference: examples/bal_problem.cc constructor (single-host) —
    this is the capability the reference lacks (SURVEY.md §2d:332-339).
    """
    from .lazy import LazyRows

    src = BalFileObservations(path)
    cam_idx, pt_idx = src.read_indices()
    cameras, points = src.read_params()
    return BalProblem(
        cameras=cameras,
        points=points,
        camera_index=cam_idx,
        point_index=pt_idx,
        observations=LazyRows(src),
    )


def load_bal(path) -> BalProblem:
    """Parse a BAL text file (examples/bal_problem.cc constructor).

    Uses the native mmap+from_chars parser (io/native.py) when the compiled
    library exists; pure-Python fallback otherwise."""
    from .native import load_bal_native

    native = load_bal_native(str(path))
    if native is not None:
        cameras, points, cam_idx, pt_idx, obs = native
        return BalProblem(cameras, points, cam_idx, pt_idx, obs)
    with open(path) as f:
        tokens = f.read().split()
    it = iter(tokens)
    num_cameras = int(next(it))
    num_points = int(next(it))
    num_obs = int(next(it))
    cam_idx = np.empty(num_obs, dtype=np.int64)
    pt_idx = np.empty(num_obs, dtype=np.int64)
    obs = np.empty((num_obs, 2), dtype=np.float64)
    for i in range(num_obs):
        cam_idx[i] = int(next(it))
        pt_idx[i] = int(next(it))
        obs[i, 0] = float(next(it))
        obs[i, 1] = float(next(it))
    rest = np.asarray(
        [float(next(it)) for _ in range(9 * num_cameras + 3 * num_points)]
    )
    cameras = rest[: 9 * num_cameras].reshape(num_cameras, 9)
    points = rest[9 * num_cameras :].reshape(num_points, 3)
    return BalProblem(cameras, points, cam_idx, pt_idx, obs)


def synthetic_bal(
    num_cameras: int,
    num_points: int,
    num_observations: int,
    seed: int = 0,
    observation_noise: float = 1.0,
    perturb_points: float = 0.05,
    perturb_rotation: float = 0.002,
) -> BalProblem:
    """Generate a BAL-shaped synthetic problem.

    Cameras on a ring of radius ~20 looking at a unit-ish point cloud at the
    origin; observations are the true projections plus pixel noise; the
    returned initial parameters are perturbed so the solver has real work.
    Observation sparsity pattern: each observation picks a (camera, point)
    pair with point locality per camera, mimicking BAL's visibility
    structure.
    """
    rng = np.random.default_rng(seed)

    points_true = rng.normal(0.0, 3.0, (num_points, 3))
    cameras_true = np.zeros((num_cameras, 9))
    for i in range(num_cameras):
        ang = 2 * np.pi * i / num_cameras
        center = np.array([20 * np.cos(ang), 2.0 * np.sin(3 * ang), 20 * np.sin(ang)])
        # look-at rotation: camera z axis toward origin (BAL looks down -z)
        z = center / np.linalg.norm(center)  # -view direction
        up = np.array([0.0, 1.0, 0.0])
        x = np.cross(up, z)
        x /= np.linalg.norm(x)
        y = np.cross(z, x)
        r = np.stack([x, y, z])  # world->cam
        aa = _matrix_to_angle_axis(r)
        t = -r @ center
        cameras_true[i, :3] = aa
        cameras_true[i, 3:6] = t
        cameras_true[i, 6] = 500.0 + rng.normal(0, 10)
        cameras_true[i, 7] = rng.normal(0, 1e-4)
        cameras_true[i, 8] = rng.normal(0, 1e-6)

    # observations: round-robin cameras, points sampled per camera
    cam_idx = rng.integers(0, num_cameras, num_observations)
    pt_idx = rng.integers(0, num_points, num_observations)
    # ensure every point is observed at least twice where possible
    base = np.arange(num_points)
    k = min(2 * num_points, num_observations)
    pt_idx[:k] = np.concatenate([base, base])[:k]

    obs = np.empty((num_observations, 2))
    p = points_true[pt_idx]
    cams = cameras_true[cam_idx]
    pc = _rotate_np(cams[:, :3], p) + cams[:, 3:6]
    xp = -pc[:, 0] / pc[:, 2]
    yp = -pc[:, 1] / pc[:, 2]
    r2 = xp * xp + yp * yp
    distortion = 1.0 + r2 * (cams[:, 7] + cams[:, 8] * r2)
    obs[:, 0] = cams[:, 6] * distortion * xp + rng.normal(0, observation_noise, num_observations)
    obs[:, 1] = cams[:, 6] * distortion * yp + rng.normal(0, observation_noise, num_observations)

    cameras = cameras_true.copy()
    points = points_true + rng.normal(0, perturb_points, points_true.shape)
    cameras[:, :3] += rng.normal(0, perturb_rotation, (num_cameras, 3))
    return BalProblem(cameras, points, cam_idx, pt_idx, obs)


def _matrix_to_angle_axis(r: np.ndarray) -> np.ndarray:
    angle = np.arccos(np.clip((np.trace(r) - 1) / 2, -1.0, 1.0))
    if angle < 1e-12:
        return np.zeros(3)
    axis = (
        np.array([r[2, 1] - r[1, 2], r[0, 2] - r[2, 0], r[1, 0] - r[0, 1]])
        / (2 * np.sin(angle))
    )
    return angle * axis


def _rotate_np(aa: np.ndarray, p: np.ndarray) -> np.ndarray:
    """Batched numpy Rodrigues rotation (for synthetic data generation)."""
    theta = np.linalg.norm(aa, axis=1, keepdims=True)
    small = theta[:, 0] < 1e-12
    axis = aa / np.where(theta > 0, theta, 1.0)
    cos_t = np.cos(theta)
    sin_t = np.sin(theta)
    w_cross_p = np.cross(axis, p)
    dot = np.sum(axis * p, axis=1, keepdims=True)
    out = cos_t * p + sin_t * w_cross_p + (1 - cos_t) * dot * axis
    out[small] = p[small] + np.cross(aa[small], p[small])
    return out


def build_ba_problem(
    bal: BalProblem,
    loss=None,
    use_quaternions: bool = False,
    use_manifolds: bool = False,
):
    """Assemble a ceres_tpu Problem from a BalProblem.

    reference: examples/bundle_adjuster.cc BuildProblem. Uses the bulk
    residual-batch API: all observations become ONE signature group.
    With `use_quaternions` the camera block becomes
    [q(4) | t(3) | f k1 k2] (10 params); `use_manifolds` additionally puts
    Quaternion x Euclidean(6) product manifold on it
    (bundle_adjuster.cc BuildProblem's --use_quaternions/--use_manifolds).
    """
    from ..autodiff import CostFunction
    from ..examples.snavely import (
        snavely_reprojection_error,
        snavely_reprojection_error_with_quaternions,
    )
    from ..problem import Problem

    problem = Problem()
    if use_quaternions:
        import jax.numpy as jnp

        from ..manifolds import (
            EuclideanManifold,
            ProductManifold,
            QuaternionManifold,
        )
        from ..rotation import angle_axis_to_quaternion

        import jax

        quats = np.asarray(
            jax.vmap(angle_axis_to_quaternion)(jnp.asarray(bal.cameras[:, :3]))
        )
        cams10 = np.concatenate([quats, bal.cameras[:, 3:]], axis=1)
        manifold = (
            ProductManifold(QuaternionManifold(), EuclideanManifold(6))
            if use_manifolds
            else None
        )
        cam_ids = problem.add_parameter_blocks(cams10, manifold=manifold)
        cf = CostFunction(
            snavely_reprojection_error_with_quaternions, 2,
            name="snavely_quat",
        )
    else:
        cam_ids = problem.add_parameter_blocks(bal.cameras)
        cf = CostFunction(snavely_reprojection_error, 2, name="snavely")
    pt_ids = problem.add_parameter_blocks(bal.points)
    param_ids = np.stack(
        [cam_ids[bal.camera_index], pt_ids[bal.point_index]], axis=1
    )
    problem.add_residual_blocks(cf, loss, param_ids, (bal.observations,))
    return problem, cam_ids, pt_ids
