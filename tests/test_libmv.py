"""libmv homography + EUC bundle adjustment example tests.

reference analog: examples/libmv_homography.cc main() (synthetic H recovery)
and libmv_bundle_adjuster.cc (EUC bundle with shared intrinsics).
"""

import numpy as np

import ceres_tpu
from ceres_tpu import TerminationType
from ceres_tpu.examples.libmv import (
    BundleConstraints,
    BundleIntrinsics,
    EstimateHomographyOptions,
    estimate_homography,
    euc_bundle_adjust,
    homography_dlt,
)


def _project(h, x):
    y = (h @ np.concatenate([x, np.ones((x.shape[0], 1))], axis=1).T).T
    return y[:, :2] / y[:, 2:3]


def test_homography_recovery():
    # same spirit as libmv_homography.cc main(): known H, exact points
    h_true = np.array([[1.243715, -0.461057, -111.964454],
                       [0.0, 0.617589, -192.379252],
                       [0.0, -0.000983, 1.0]])
    rng = np.random.default_rng(0)
    x1 = rng.uniform(0, 500, (10, 2))
    x2 = _project(h_true, x1)

    h_est, summary = estimate_homography(
        x1, x2, EstimateHomographyOptions(
            max_num_iterations=60,
            expected_average_symmetric_distance=1e-12,
        )
    )
    np.testing.assert_allclose(h_est, h_true, rtol=1e-4, atol=1e-4)
    assert summary.termination_type in (
        TerminationType.CONVERGENCE,
        TerminationType.USER_SUCCESS,
    )


def test_homography_dlt_exact():
    h_true = np.array([[1.1, 0.02, 3.0], [-0.05, 0.95, -2.0], [1e-4, -2e-4, 1.0]])
    rng = np.random.default_rng(1)
    x1 = rng.uniform(-100, 100, (8, 2))
    x2 = _project(h_true, x1)
    h = homography_dlt(x1, x2)
    np.testing.assert_allclose(h, h_true, rtol=1e-8, atol=1e-8)


def _synthetic_euc_scene(seed=0, k1=-0.05):
    rng = np.random.default_rng(seed)
    n_cams, n_pts = 4, 40
    intrinsics = np.array([800.0, 320.0, 240.0, k1, 0.0, 0.0, 0.0, 0.0])
    points = rng.normal(0.0, 1.0, (n_pts, 3)) + np.array([0.0, 0.0, 8.0])
    cams = []
    for i in range(n_cams):
        aa = rng.normal(0, 0.05, 3)
        t = np.array([0.5 * i - 1.0, 0.1 * i, 0.0]) + rng.normal(0, 0.02, 3)
        cams.append(np.concatenate([aa, t]))
    cams = np.stack(cams)

    import jax.numpy as jnp

    from ceres_tpu.examples.libmv import opencv_reprojection_residual

    cam_idx = np.repeat(np.arange(n_cams), n_pts)
    pt_idx = np.tile(np.arange(n_pts), n_cams)
    obs = []
    for c, p in zip(cam_idx, pt_idx):
        r = opencv_reprojection_residual(
            (jnp.asarray(intrinsics), jnp.asarray(cams[c]), jnp.asarray(points[p])),
            (jnp.zeros(2),),
        )
        obs.append(np.asarray(r))
    return intrinsics, cams, points, cam_idx, pt_idx, np.stack(obs)


def test_euc_bundle_no_intrinsics():
    intr, cams, pts, ci, pi, obs = _synthetic_euc_scene()
    rng = np.random.default_rng(3)
    cams_noisy = cams + rng.normal(0, 1e-3, cams.shape)
    pts_noisy = pts + rng.normal(0, 1e-2, pts.shape)
    intr2, cams2, pts2, summary = euc_bundle_adjust(
        intr, cams_noisy, pts_noisy, ci, pi, obs,
        bundle_intrinsics=BundleIntrinsics.NO_INTRINSICS,
    )
    assert summary.termination_type == TerminationType.CONVERGENCE
    assert summary.final_cost < 1e-6, summary.final_cost
    np.testing.assert_array_equal(intr2, intr)  # held constant


def test_euc_bundle_refine_focal_and_k1():
    intr, cams, pts, ci, pi, obs = _synthetic_euc_scene(k1=-0.05)
    wrong = intr.copy()
    wrong[0] = 780.0  # focal off
    wrong[3] = 0.0    # k1 off
    intr2, cams2, pts2, summary = euc_bundle_adjust(
        wrong, cams, pts, ci, pi, obs,
        bundle_intrinsics=BundleIntrinsics.FOCAL_LENGTH | BundleIntrinsics.RADIAL_K1,
    )
    assert summary.final_cost < 1e-5, summary.final_cost
    assert abs(intr2[0] - 800.0) < 1.0, intr2[0]
    assert abs(intr2[3] - (-0.05)) < 5e-3, intr2[3]
    # non-bundled coefficients stay frozen
    np.testing.assert_array_equal(intr2[[1, 2, 4, 5, 6, 7]], wrong[[1, 2, 4, 5, 6, 7]])


def test_euc_bundle_no_translation():
    intr, cams, pts, ci, pi, obs = _synthetic_euc_scene()
    rng = np.random.default_rng(5)
    cams_noisy = cams.copy()
    cams_noisy[:, :3] += rng.normal(0, 1e-3, (cams.shape[0], 3))  # rotation only
    _, cams2, _, summary = euc_bundle_adjust(
        intr, cams_noisy, pts, ci, pi, obs,
        bundle_constraints=BundleConstraints.NO_TRANSLATION,
    )
    assert summary.final_cost < 1e-6, summary.final_cost
    # translations must be untouched
    np.testing.assert_array_equal(cams2[:, 3:], cams_noisy[:, 3:])


# ------------------------------------------------------------------ #
# real blender problem dumps mounted with the reference
# ------------------------------------------------------------------ #

import os
import pytest

from ceres_tpu.examples.libmv import read_libmv_problem, solve_libmv_problem

LIBMV_DIR = "/root/reference/data/libmv-ba-problems"

requires_libmv_data = pytest.mark.skipif(
    not os.path.isdir(LIBMV_DIR), reason="libmv problem dumps not mounted"
)


@requires_libmv_data
def test_read_all_binary_problems():
    expected = {  # (cameras, points, markers) per file, from the dumps
        "problem_01.bin": (333, 26, 5421),
        "problem_02.bin": (440, 71, 16718),
        "problem_03.bin": (500, 37, 6184),
    }
    for fname, (ncams, npts, nmarkers) in expected.items():
        p = read_libmv_problem(os.path.join(LIBMV_DIR, fname))
        assert p.is_image_space
        assert int(p.camera_valid.sum()) == ncams
        assert int(p.point_valid.sum()) == npts
        assert p.markers.shape == (nmarkers, 4)
        assert p.intrinsics.shape == (8,)
        assert p.intrinsics[0] > 100.0  # plausible focal length in pixels
        # markers reference only valid cameras/points (blender dumps are clean)
        img = p.markers[:, 0].astype(int)
        trk = p.markers[:, 1].astype(int)
        assert p.camera_valid[img].all() and p.point_valid[trk].all()
        # rotations survived the R -> angle-axis -> R round trip
        from ceres_tpu.rotation import angle_axis_to_rotation_matrix
        import jax.numpy as jnp

        first = int(np.flatnonzero(p.camera_valid)[0])
        r = np.asarray(
            angle_axis_to_rotation_matrix(jnp.asarray(p.cameras_Rt[first, :3]))
        )
        np.testing.assert_allclose(r @ r.T, np.eye(3), atol=1e-6)


@requires_libmv_data
def test_solve_problem_01():
    # mirrors `libmv_bundle_adjuster --input=problem_01.bin
    # --refine_intrinsics=none`; the dump is blender's already-bundled
    # output, so the solve must converge with a (small) cost decrease.
    p = read_libmv_problem(os.path.join(LIBMV_DIR, "problem_01.bin"))
    intr, cams, pts, summary = solve_libmv_problem(p, refine_intrinsics="none")
    assert summary.termination_type in (
        TerminationType.CONVERGENCE,
        TerminationType.NO_CONVERGENCE,
    )
    assert summary.final_cost <= summary.initial_cost
    # intrinsics stay fixed under refine_intrinsics=none
    np.testing.assert_array_equal(intr, p.intrinsics)
    # reprojection RMS stays subpixel on the bundled dump
    n = (p.camera_valid[p.markers[:, 0].astype(int)]
         & p.point_valid[p.markers[:, 1].astype(int)]).sum()
    rms = np.sqrt(2.0 * summary.final_cost / (2 * n))
    assert rms < 2.0, rms
