"""Manifold unit tests (reference analog: internal/ceres/manifold_test.cc).

Checks the manifold axioms numerically plus plus_jacobian consistency with
finite differences of Plus at delta=0.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ceres_tpu.manifolds import (
    AutoDiffManifold,
    EigenQuaternionManifold,
    EuclideanManifold,
    LineManifold,
    ProductManifold,
    QuaternionManifold,
    SphereManifold,
    SubsetManifold,
)

RNG = np.random.default_rng(5)


def random_point(m):
    x = RNG.standard_normal(m.ambient_size)
    if isinstance(m, (QuaternionManifold, EigenQuaternionManifold)):
        x /= np.linalg.norm(x)
    if isinstance(m, SphereManifold):
        x /= np.linalg.norm(x)
    if isinstance(m, LineManifold):
        n = m.size
        x[n:] /= np.linalg.norm(x[n:])
    if isinstance(m, ProductManifold):
        # valid point per factor (quaternion factors must be unit norm)
        parts, off = [], 0
        for f in m.manifolds:
            parts.append(np.asarray(random_point(f)))
            off += f.ambient_size
        return jnp.concatenate([jnp.asarray(p) for p in parts])
    return jnp.asarray(x)


MANIFOLDS = [
    EuclideanManifold(3),
    SubsetManifold(4, (1, 3)),
    QuaternionManifold(),
    EigenQuaternionManifold(),
    SphereManifold(4),
    LineManifold(3),
    ProductManifold(QuaternionManifold(), EuclideanManifold(3)),
]


@pytest.mark.parametrize("m", MANIFOLDS, ids=lambda m: type(m).__name__)
def test_plus_zero_is_identity(m):
    x = random_point(m)
    delta = jnp.zeros(m.tangent_size)
    np.testing.assert_allclose(m.plus(x, delta), x, atol=1e-12)


@pytest.mark.parametrize("m", MANIFOLDS, ids=lambda m: type(m).__name__)
def test_plus_jacobian_matches_fd(m):
    x = random_point(m)
    jac = np.asarray(m.plus_jacobian(x))
    assert jac.shape == (m.ambient_size, m.tangent_size)
    eps = 1e-7
    for j in range(m.tangent_size):
        d = np.zeros(m.tangent_size)
        d[j] = eps
        fd = (
            np.asarray(m.plus(x, jnp.asarray(d)))
            - np.asarray(m.plus(x, jnp.asarray(-d)))
        ) / (2 * eps)
        np.testing.assert_allclose(jac[:, j], fd, atol=1e-6)


@pytest.mark.parametrize("m", MANIFOLDS, ids=lambda m: type(m).__name__)
def test_minus_plus_roundtrip(m):
    x = random_point(m)
    delta = jnp.asarray(0.1 * RNG.standard_normal(m.tangent_size))
    y = m.plus(x, delta)
    recovered = m.minus(y, x)
    np.testing.assert_allclose(recovered, delta, atol=1e-9)


@pytest.mark.parametrize("m", MANIFOLDS, ids=lambda m: type(m).__name__)
def test_plus_vmaps(m):
    xs = jnp.stack([random_point(m) for _ in range(5)])
    ds = jnp.asarray(0.05 * RNG.standard_normal((5, m.tangent_size)))
    ys = jax.vmap(m.plus)(xs, ds)
    for i in range(5):
        np.testing.assert_allclose(ys[i], m.plus(xs[i], ds[i]), atol=1e-12)


def test_quaternion_plus_keeps_unit_norm():
    m = QuaternionManifold()
    x = random_point(m)
    d = jnp.asarray([0.2, -0.1, 0.3])
    y = m.plus(x, d)
    np.testing.assert_allclose(jnp.linalg.norm(y), 1.0, atol=1e-12)


def test_quaternion_convention_matches_reference():
    # Plus(x, delta) = exp(delta) ⊗ x with angle |delta|
    # (reference: manifold.cc:27-67). Check against explicit product.
    m = QuaternionManifold()
    x = np.array([1.0, 0.0, 0.0, 0.0])
    d = np.array([0.3, 0.0, 0.0])
    y = np.asarray(m.plus(jnp.asarray(x), jnp.asarray(d)))
    np.testing.assert_allclose(y, [np.cos(0.3), np.sin(0.3), 0.0, 0.0], atol=1e-12)

    # identity delta on a generic unit quaternion: rotation composition
    x = RNG.standard_normal(4)
    x /= np.linalg.norm(x)
    d = np.array([0.0, 0.25, 0.0])
    y = np.asarray(m.plus(jnp.asarray(x), jnp.asarray(d)))
    qd = np.array([np.cos(0.25), 0.0, np.sin(0.25), 0.0])
    w, xx, yy, zz = qd
    a, b, c, e = x
    expected = np.array(
        [
            w * a - xx * b - yy * c - zz * e,
            w * b + xx * a + yy * e - zz * c,
            w * c - xx * e + yy * a + zz * b,
            w * e + xx * c - yy * b + zz * a,
        ]
    )
    np.testing.assert_allclose(y, expected, atol=1e-12)


def test_eigen_quaternion_ordering():
    mc = QuaternionManifold()
    me = EigenQuaternionManifold()
    xc = random_point(mc)  # [w,x,y,z]
    xe = jnp.concatenate([xc[1:], xc[:1]])  # [x,y,z,w]
    d = jnp.asarray([0.1, -0.2, 0.15])
    yc = np.asarray(mc.plus(xc, d))
    ye = np.asarray(me.plus(xe, d))
    np.testing.assert_allclose(ye, np.concatenate([yc[1:], yc[:1]]), atol=1e-12)


def test_sphere_plus_keeps_radius():
    m = SphereManifold(5)
    x = 2.5 * random_point(m)
    d = jnp.asarray(0.3 * RNG.standard_normal(4))
    y = m.plus(x, d)
    np.testing.assert_allclose(jnp.linalg.norm(y), jnp.linalg.norm(x), atol=1e-10)


def test_subset_manifold_holds_constants():
    m = SubsetManifold(4, (1, 3))
    x = jnp.asarray([1.0, 2.0, 3.0, 4.0])
    d = jnp.asarray([0.5, -0.5])
    y = m.plus(x, d)
    np.testing.assert_allclose(y, [1.5, 2.0, 2.5, 4.0], atol=1e-12)


def test_autodiff_manifold_matches_explicit():
    def plus_fn(x, d):
        return x + d**1  # Euclidean

    def minus_fn(y, x):
        return y - x

    m = AutoDiffManifold(plus_fn, minus_fn, 3, 3)
    x = jnp.asarray([1.0, 2.0, 3.0])
    np.testing.assert_allclose(m.plus_jacobian(x), np.eye(3), atol=1e-12)


@pytest.mark.parametrize("m", MANIFOLDS, ids=lambda m: type(m).__name__)
def test_check_manifold_invariants(m):
    """The manifold_test_utils.h matcher suite as one callable."""
    from ceres_tpu.manifolds import check_manifold_invariants

    rng = np.random.default_rng(7)
    x = random_point(m)
    delta = jnp.asarray(0.2 * rng.standard_normal(m.tangent_size))
    check_manifold_invariants(m, x, delta, tol=1e-8)


def test_check_manifold_invariants_catches_bad_manifold():
    from ceres_tpu.manifolds import check_manifold_invariants

    class Bad(AutoDiffManifold):
        pass

    # plus/minus disagree: Minus(Plus(x, d), x) != d
    m = AutoDiffManifold(lambda x, d: x + 2.0 * d, lambda y, x: y - x, 3, 3)
    with pytest.raises(AssertionError, match="MinusPlusIsIdentity"):
        check_manifold_invariants(
            m, jnp.asarray([1.0, 2.0, 3.0]), jnp.asarray([0.1, 0.2, 0.3])
        )
