"""Snavely reprojection error for BAL bundle adjustment, in JAX.

reference: examples/snavely_reprojection_error.h (the functor the jwmak CUDA
layer benchmarks with, examples/bundle_adjuster.cu.cc:336-342). The model is
the published BAL camera: 9 camera params [angle-axis(3), t(3), f, k1, k2],
3 point params; pixel = f * distortion * perspective_divide(R x + t) with
radial distortion 1 + k1 r^2 + k2 r^4 and the BAL sign convention
(camera looks down -z).

Written directly in jnp; jax.linearize supplies the Jacobians (no Jet type).
"""

from __future__ import annotations

import jax.numpy as jnp


def angle_axis_rotate_point(aa, p):
    """Rotate p by the angle-axis vector aa (Rodrigues).

    reference behaviour: include/ceres/rotation.h AngleAxisRotatePoint,
    including the small-angle linearization, written branch-free.
    """
    theta2 = jnp.sum(aa * aa)
    theta = jnp.sqrt(jnp.maximum(theta2, 1e-32))
    small = theta2 < 1e-24
    cos_t = jnp.cos(theta)
    sin_t = jnp.sin(theta)
    axis = aa / theta
    w_cross_p = jnp.cross(axis, p)
    tmp = jnp.dot(axis, p) * (1.0 - cos_t)
    rotated = cos_t * p + sin_t * w_cross_p + tmp * axis
    # small-angle: p + aa x p
    approx = p + jnp.cross(aa, p)
    return jnp.where(small, approx, rotated)


def snavely_reprojection_error(params, data):
    """params = (camera [9], point [3]); data = (observed_xy [2],) -> [2]."""
    camera, point = params
    (observed,) = data
    p = angle_axis_rotate_point(camera[:3], point) + camera[3:6]
    # BAL convention: negative z plane projection
    xp = -p[0] / p[2]
    yp = -p[1] / p[2]
    f, k1, k2 = camera[6], camera[7], camera[8]
    r2 = xp * xp + yp * yp
    distortion = 1.0 + r2 * (k1 + k2 * r2)
    predicted_x = f * distortion * xp
    predicted_y = f * distortion * yp
    return jnp.stack([predicted_x - observed[0], predicted_y - observed[1]])


def snavely_reprojection_error_with_quaternions(params, data):
    """params = (camera [10] = [q(4) | t(3) | f k1 k2], point [3]);
    data = (observed_xy [2],) -> [2].

    reference: SnavelyReprojectionErrorWithQuaternions
    (examples/snavely_reprojection_error.h:89-152)."""
    from ..rotation import unit_quaternion_rotate_point

    camera, point = params
    (observed,) = data
    p = unit_quaternion_rotate_point(camera[:4], point) + camera[4:7]
    xp = -p[0] / p[2]
    yp = -p[1] / p[2]
    f, k1, k2 = camera[7], camera[8], camera[9]
    r2 = xp * xp + yp * yp
    distortion = 1.0 + r2 * (k1 + k2 * r2)
    return jnp.stack(
        [f * distortion * xp - observed[0], f * distortion * yp - observed[1]]
    )
