"""Rotation conversions and applications, branch-free in JAX.

Capability parity with include/ceres/rotation.h (903 LoC): angle-axis /
quaternion / rotation-matrix conversions and point rotation, written so
every function is JAX-differentiable (smooth select-based small-angle
handling) and vmappable. Quaternions are [w, x, y, z] (Ceres order).
"""

from __future__ import annotations

import jax.numpy as jnp


def angle_axis_rotate_point(aa, p):
    """Rodrigues rotation; differentiable at aa = 0."""
    theta2 = jnp.sum(aa * aa)
    small = theta2 < 1e-24
    theta = jnp.sqrt(jnp.where(small, 1.0, theta2))
    cos_t = jnp.cos(theta)
    sin_t = jnp.sin(theta)
    axis = aa / theta
    w_cross_p = jnp.cross(axis, p)
    tmp = jnp.dot(axis, p) * (1.0 - cos_t)
    rotated = cos_t * p + sin_t * w_cross_p + tmp * axis
    approx = p + jnp.cross(aa, p)
    return jnp.where(small, approx, rotated)


def angle_axis_to_quaternion(aa):
    """[w, x, y, z]; rotation.h AngleAxisToQuaternion."""
    theta2 = jnp.sum(aa * aa)
    small = theta2 < 1e-24
    theta = jnp.sqrt(jnp.where(small, 1.0, theta2))
    half = 0.5 * theta
    k = jnp.where(small, 0.5, jnp.sin(half) / theta)
    w = jnp.where(small, 1.0, jnp.cos(half))
    return jnp.concatenate([w[None], k * aa])


def quaternion_to_angle_axis(q):
    """rotation.h QuaternionToAngleAxis."""
    sin2 = jnp.sum(q[1:] * q[1:])
    small = sin2 < 1e-24
    sin_theta = jnp.sqrt(jnp.where(small, 1.0, sin2))
    cos_theta = q[0]
    # two_theta in [0, 2pi); use atan2 with sign handling (rotation.h:
    # k = two_theta / sin_theta)
    two_theta = 2.0 * jnp.where(
        cos_theta < 0,
        jnp.arctan2(-sin_theta, -cos_theta),
        jnp.arctan2(sin_theta, cos_theta),
    )
    k = jnp.where(small, 2.0, two_theta / sin_theta)
    return k * q[1:]


def quaternion_to_rotation_matrix(q):
    """Row-major R from a unit quaternion; rotation.h QuaternionToRotation
    (normalizes first)."""
    n = jnp.sqrt(jnp.sum(q * q))
    w, x, y, z = q[0] / n, q[1] / n, q[2] / n, q[3] / n
    return jnp.array(
        [
            [1 - 2 * (y * y + z * z), 2 * (x * y - w * z), 2 * (x * z + w * y)],
            [2 * (x * y + w * z), 1 - 2 * (x * x + z * z), 2 * (y * z - w * x)],
            [2 * (x * z - w * y), 2 * (y * z + w * x), 1 - 2 * (x * x + y * y)],
        ]
    )


def rotation_matrix_to_quaternion(r):
    """Shepperd's method, branch-free via select over the four cases."""
    t = jnp.trace(r)
    # candidate 0: trace
    q0 = jnp.stack(
        [
            1.0 + t,
            r[2, 1] - r[1, 2],
            r[0, 2] - r[2, 0],
            r[1, 0] - r[0, 1],
        ]
    )
    q1 = jnp.stack(
        [
            r[2, 1] - r[1, 2],
            1.0 + r[0, 0] - r[1, 1] - r[2, 2],
            r[0, 1] + r[1, 0],
            r[0, 2] + r[2, 0],
        ]
    )
    q2 = jnp.stack(
        [
            r[0, 2] - r[2, 0],
            r[0, 1] + r[1, 0],
            1.0 - r[0, 0] + r[1, 1] - r[2, 2],
            r[1, 2] + r[2, 1],
        ]
    )
    q3 = jnp.stack(
        [
            r[1, 0] - r[0, 1],
            r[0, 2] + r[2, 0],
            r[1, 2] + r[2, 1],
            1.0 - r[0, 0] - r[1, 1] + r[2, 2],
        ]
    )
    mags = jnp.stack([1.0 + t, 1.0 + r[0, 0] - r[1, 1] - r[2, 2],
                      1.0 - r[0, 0] + r[1, 1] - r[2, 2],
                      1.0 - r[0, 0] - r[1, 1] + r[2, 2]])
    cands = jnp.stack([q0, q1, q2, q3])
    best = jnp.argmax(mags)
    q = cands[best]
    q = q / jnp.linalg.norm(q)
    # canonical sign: w >= 0
    return q * jnp.where(q[0] < 0, -1.0, 1.0)


def angle_axis_to_rotation_matrix(aa):
    return quaternion_to_rotation_matrix(angle_axis_to_quaternion(aa))


def rotation_matrix_to_angle_axis(r):
    return quaternion_to_angle_axis(rotation_matrix_to_quaternion(r))


def quaternion_product(a, b):
    """Hamilton product [w,x,y,z]; rotation.h QuaternionProduct."""
    w = a[0] * b[0] - a[1] * b[1] - a[2] * b[2] - a[3] * b[3]
    x = a[0] * b[1] + a[1] * b[0] + a[2] * b[3] - a[3] * b[2]
    y = a[0] * b[2] - a[1] * b[3] + a[2] * b[0] + a[3] * b[1]
    z = a[0] * b[3] + a[1] * b[2] - a[2] * b[1] + a[3] * b[0]
    return jnp.stack([w, x, y, z])


def quaternion_conjugate(q):
    return q * jnp.asarray([1.0, -1.0, -1.0, -1.0], dtype=q.dtype)


def unit_quaternion_rotate_point(q, p):
    """rotation.h UnitQuaternionRotatePoint."""
    t = 2.0 * jnp.cross(q[1:], p)
    return p + q[0] * t + jnp.cross(q[1:], t)


def quaternion_rotate_point(q, p):
    """Non-unit quaternion: normalize then rotate."""
    return unit_quaternion_rotate_point(q / jnp.linalg.norm(q), p)


def cross_product_matrix(v):
    return jnp.array(
        [
            [0.0, -v[2], v[1]],
            [v[2], 0.0, -v[0]],
            [-v[1], v[0], 0.0],
        ]
    )


def euler_angles_to_rotation_matrix(euler_deg):
    """ZYX convention in degrees; rotation.h EulerAnglesToRotationMatrix."""
    rad = euler_deg * (jnp.pi / 180.0)
    c = jnp.cos(rad)
    s = jnp.sin(rad)
    c1, c2, c3 = c[0], c[1], c[2]
    s1, s2, s3 = s[0], s[1], s[2]
    return jnp.array(
        [
            [c1 * c2, -s1 * c3 + c1 * s2 * s3, s1 * s3 + c1 * s2 * c3],
            [s1 * c2, c1 * c3 + s1 * s2 * s3, -c1 * s3 + s1 * s2 * c3],
            [-s2, c2 * s3, c2 * c3],
        ]
    )
