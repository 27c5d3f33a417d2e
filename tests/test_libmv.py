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
