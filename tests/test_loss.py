"""Loss function tests (reference analog: loss_function_test.cc).

Each loss is checked for value/derivative consistency: rho1 ≈ d rho0/ds and
rho2 ≈ d rho1/ds by finite differences, plus the reference's closed-form
values at characteristic points.
"""

import jax.numpy as jnp
import numpy as np
import pytest

from ceres_tpu.loss import (
    ArctanLoss,
    CauchyLoss,
    ComposedLoss,
    HuberLoss,
    ScaledLoss,
    SoftLOneLoss,
    TolerantLoss,
    TrivialLoss,
    TukeyLoss,
)

LOSSES = [
    TrivialLoss(),
    HuberLoss(0.7),
    SoftLOneLoss(0.7),
    CauchyLoss(1.3),
    ArctanLoss(1.3),
    TolerantLoss(1.3, 0.1),
    TukeyLoss(2.0),
    ScaledLoss(CauchyLoss(1.3), 0.5),
    ComposedLoss(HuberLoss(1.0), SoftLOneLoss(0.5)),
]


def rho_floats(loss, s):
    return tuple(float(np.asarray(v)[0]) for v in loss.rho(jnp.asarray([float(s)])))


def assert_loss_is_valid(loss, s):
    s = float(s)
    rho0, rho1, rho2 = rho_floats(loss, s)
    eps = 1e-6 * max(s, 1.0)
    r0p, r1p, _ = rho_floats(loss, s + eps)
    r0m, r1m, _ = rho_floats(loss, s - eps)
    np.testing.assert_allclose(rho1, (r0p - r0m) / (2 * eps), rtol=1e-4, atol=1e-7)
    np.testing.assert_allclose(rho2, (r1p - r1m) / (2 * eps), rtol=1e-3, atol=1e-6)


@pytest.mark.parametrize("loss", LOSSES, ids=lambda l: type(l).__name__)
@pytest.mark.parametrize("s", [0.25, 0.79, 1.1, 2.3, 6.0])
def test_derivative_consistency(loss, s):
    # avoid testing exactly at non-smooth switch points
    assert_loss_is_valid(loss, s)


def test_trivial():
    rho0, rho1, rho2 = rho_floats(TrivialLoss(), 3.0)
    assert rho0 == 3.0 and rho1 == 1.0 and rho2 == 0.0


def test_huber_branches():
    a = 1.5
    loss = HuberLoss(a)
    # inlier: rho = s
    rho0, rho1, rho2 = rho_floats(loss, 1.0)
    assert rho0 == 1.0 and rho1 == 1.0 and rho2 == 0.0
    # outlier: rho = 2 a sqrt(s) - a^2  (loss_function.cc:50-58)
    s = 9.0
    rho0, rho1, rho2 = rho_floats(loss, s)
    np.testing.assert_allclose(rho0, 2 * a * 3.0 - a * a)
    np.testing.assert_allclose(rho1, a / 3.0)
    np.testing.assert_allclose(rho2, -(a / 3.0) / (2 * s))


def test_cauchy_value():
    loss = CauchyLoss(1.0)
    rho0, rho1, rho2 = rho_floats(loss, 1.0)
    np.testing.assert_allclose(rho0, np.log(2.0))
    np.testing.assert_allclose(rho1, 0.5)
    np.testing.assert_allclose(rho2, -0.25)


def test_tukey_outlier_flat():
    loss = TukeyLoss(1.0)
    rho0, rho1, rho2 = rho_floats(loss, 4.0)
    np.testing.assert_allclose(rho0, 1.0 / 3.0)
    assert rho1 == 0.0 and rho2 == 0.0


def test_scaled_loss_scales():
    base = CauchyLoss(1.3)
    scaled = ScaledLoss(base, 2.0)
    s = jnp.asarray([1.7])
    for a, b in zip(base.rho(s), scaled.rho(s)):
        np.testing.assert_allclose(2.0 * np.asarray(a), np.asarray(b))


def test_scaled_none_is_scaled_trivial():
    scaled = ScaledLoss(None, 3.0)
    rho0, rho1, rho2 = rho_floats(scaled, 2.0)
    assert rho0 == 6.0 and rho1 == 3.0 and rho2 == 0.0


def test_tolerant_loss_large_s_no_overflow():
    loss = TolerantLoss(1.0, 0.01)
    rho0, rho1, rho2 = rho_floats(loss, 1e6)
    assert np.isfinite(rho0) and np.isfinite(rho1) and np.isfinite(rho2)
    np.testing.assert_allclose(rho1, 1.0)


def test_losses_vectorize():
    s = jnp.asarray([0.1, 1.0, 10.0, 100.0])
    for loss in LOSSES:
        rho0, rho1, rho2 = loss.rho(s)
        assert rho0.shape == s.shape
        assert bool(jnp.all(rho1 > 0)) or isinstance(loss, TukeyLoss)
