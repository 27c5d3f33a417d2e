"""Rotation utility tests (reference analog: rotation_test.cc)."""

import jax.numpy as jnp
import numpy as np
import pytest

from ceres_tpu.rotation import (
    angle_axis_rotate_point,
    angle_axis_to_quaternion,
    angle_axis_to_rotation_matrix,
    quaternion_product,
    quaternion_rotate_point,
    quaternion_to_angle_axis,
    quaternion_to_rotation_matrix,
    rotation_matrix_to_angle_axis,
    rotation_matrix_to_quaternion,
    unit_quaternion_rotate_point,
)

RNG = np.random.default_rng(17)


def random_angle_axis(scale=np.pi * 0.8):
    v = RNG.standard_normal(3)
    return jnp.asarray(scale * RNG.uniform(0.1, 1.0) * v / np.linalg.norm(v))


def test_angle_axis_quaternion_roundtrip():
    for _ in range(10):
        aa = random_angle_axis()
        q = angle_axis_to_quaternion(aa)
        np.testing.assert_allclose(np.linalg.norm(q), 1.0, atol=1e-12)
        back = quaternion_to_angle_axis(q)
        np.testing.assert_allclose(back, aa, atol=1e-10)


def test_angle_axis_matrix_roundtrip():
    for _ in range(10):
        aa = random_angle_axis()
        r = angle_axis_to_rotation_matrix(aa)
        np.testing.assert_allclose(np.asarray(r) @ np.asarray(r).T, np.eye(3), atol=1e-12)
        np.testing.assert_allclose(np.linalg.det(r), 1.0, atol=1e-12)
        back = rotation_matrix_to_angle_axis(r)
        np.testing.assert_allclose(back, aa, atol=1e-9)


def test_small_angle_stability():
    aa = jnp.asarray([1e-14, -2e-14, 1e-14])
    q = angle_axis_to_quaternion(aa)
    np.testing.assert_allclose(q, [1.0, 5e-15, -1e-14, 5e-15], atol=1e-12)
    p = jnp.asarray([1.0, 2.0, 3.0])
    np.testing.assert_allclose(angle_axis_rotate_point(aa, p), p, atol=1e-10)
    # differentiable at zero
    import jax

    j = jax.jacfwd(lambda a: angle_axis_rotate_point(a, p))(jnp.zeros(3))
    assert np.all(np.isfinite(np.asarray(j)))


def test_rotate_point_consistency():
    for _ in range(5):
        aa = random_angle_axis()
        p = jnp.asarray(RNG.standard_normal(3))
        r_mat = angle_axis_to_rotation_matrix(aa)
        q = angle_axis_to_quaternion(aa)
        expected = np.asarray(r_mat) @ np.asarray(p)
        np.testing.assert_allclose(angle_axis_rotate_point(aa, p), expected, atol=1e-12)
        np.testing.assert_allclose(unit_quaternion_rotate_point(q, p), expected, atol=1e-12)
        np.testing.assert_allclose(quaternion_rotate_point(3.7 * q, p), expected, atol=1e-12)


def test_quaternion_product_matches_matrix_product():
    a = random_angle_axis()
    b = random_angle_axis()
    qa = angle_axis_to_quaternion(a)
    qb = angle_axis_to_quaternion(b)
    q_ab = quaternion_product(qa, qb)
    r_ab = np.asarray(angle_axis_to_rotation_matrix(a)) @ np.asarray(
        angle_axis_to_rotation_matrix(b)
    )
    np.testing.assert_allclose(
        np.asarray(quaternion_to_rotation_matrix(q_ab)), r_ab, atol=1e-12
    )
