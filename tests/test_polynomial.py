"""Polynomial interpolation for line search (reference polynomial.cc:200-389).

Mirrors the reference's polynomial_test.cc strategy: fit interpolants from
value/gradient constraints and check minimization on an interval, plus the
line_search.cc contract that CUBIC actually fits a cubic (and therefore
recovers the exact minimizer of a cubic phi from one bracket, which the
quadratic fit cannot).
"""

import numpy as np
import pytest

from ceres_tpu.solvers.polynomial import (
    FunctionSample,
    evaluate_polynomial,
    find_interpolating_polynomial,
    minimize_interpolating_polynomial,
    minimize_polynomial,
)
from ceres_tpu.solvers.line_search import _interpolate_step


def _poly(coeffs, x):
    return float(np.polyval(coeffs, x))


class TestFindInterpolatingPolynomial:
    def test_quadratic_from_value_gradient_value(self):
        # phi(x) = 2(x-3)^2 + 5 = 2x^2 -12x + 23
        truth = np.array([2.0, -12.0, 23.0])
        samples = [
            FunctionSample.with_gradient(0.0, _poly(truth, 0.0), -12.0),
            FunctionSample.valued(4.0, _poly(truth, 4.0)),
        ]
        fit = find_interpolating_polynomial(samples)
        np.testing.assert_allclose(fit, truth, atol=1e-10)

    def test_cubic_from_two_hermite_samples(self):
        # phi(x) = x^3 - 6x^2 + 9x + 1; phi'(x) = 3x^2 - 12x + 9
        truth = np.array([1.0, -6.0, 9.0, 1.0])
        dtruth = np.polyder(truth)
        samples = [
            FunctionSample.with_gradient(0.5, _poly(truth, 0.5), _poly(dtruth, 0.5)),
            FunctionSample.with_gradient(4.0, _poly(truth, 4.0), _poly(dtruth, 4.0)),
        ]
        fit = find_interpolating_polynomial(samples)
        np.testing.assert_allclose(fit, truth, atol=1e-9)

    def test_cubic_from_gradient_and_three_values(self):
        truth = np.array([1.0, -3.0, 2.0, 7.0])
        dtruth = np.polyder(truth)
        samples = [
            FunctionSample.with_gradient(0.0, _poly(truth, 0.0), _poly(dtruth, 0.0)),
            FunctionSample.valued(1.0, _poly(truth, 1.0)),
            FunctionSample.valued(3.0, _poly(truth, 3.0)),
        ]
        fit = find_interpolating_polynomial(samples)
        np.testing.assert_allclose(fit, truth, atol=1e-9)


class TestMinimizePolynomial:
    def test_interior_minimum(self):
        # 2(x-3)^2+5 on [0, 10] -> x=3
        x, v = minimize_polynomial(np.array([2.0, -12.0, 23.0]), 0.0, 10.0)
        assert x == pytest.approx(3.0, abs=1e-10)
        assert v == pytest.approx(5.0, abs=1e-10)

    def test_endpoint_minimum(self):
        # increasing linear on [1, 2] -> x=1
        x, _ = minimize_polynomial(np.array([4.0, 0.0]), 1.0, 2.0)
        assert x == pytest.approx(1.0)

    def test_cubic_picks_right_stationary_point(self):
        # x^3 - 6x^2 + 9x + 1: local max at x=1, local min at x=3
        # (phi(0) ties phi(3), so start the interval at 0.5)
        x, _ = minimize_polynomial(np.array([1.0, -6.0, 9.0, 1.0]), 0.5, 4.0)
        assert x == pytest.approx(3.0, abs=1e-9)

    def test_minimize_interpolating(self):
        truth = np.array([2.0, -12.0, 23.0])
        samples = [
            FunctionSample.with_gradient(0.0, 23.0, -12.0),
            FunctionSample.valued(5.0, _poly(truth, 5.0)),
        ]
        x, v = minimize_interpolating_polynomial(samples, 0.0, 5.0)
        assert x == pytest.approx(3.0, abs=1e-9)
        assert evaluate_polynomial(truth, x) == pytest.approx(v)


class TestInterpolateStep:
    """line_search.cc:415-470 contract at the _interpolate_step seam."""

    # phi(a) = a^3 - 6a^2 + 9a + 1 has its interior minimum at a=3.
    PHI = np.array([1.0, -6.0, 9.0, 1.0])
    DPHI = np.polyder(PHI)

    def _phi(self, a):
        return _poly(self.PHI, a)

    def _dphi(self, a):
        return _poly(self.DPHI, a)

    def test_cubic_exact_on_cubic_phi(self):
        # With gradients at both bracket ends, CUBIC recovers a=3 exactly
        # (up to the 5% bracket margin, which 3.0 is inside).
        a = _interpolate_step(
            1.0, self._phi(1.0), self._dphi(1.0),
            4.5, self._phi(4.5), "CUBIC", g_hi=self._dphi(4.5),
        )
        assert a == pytest.approx(3.0, abs=1e-9)

    def test_quadratic_not_exact_on_cubic_phi(self):
        a = _interpolate_step(
            1.0, self._phi(1.0), self._dphi(1.0),
            4.5, self._phi(4.5), "QUADRATIC",
        )
        assert abs(a - 3.0) > 1e-3  # quadratic model cannot be exact here

    def test_cubic_from_extra_value_sample(self):
        # Armijo-style: no gradient at hi, but a previous value sample
        # supplies the 4th constraint for a true cubic fit.
        a = _interpolate_step(
            0.0, self._phi(0.0), self._dphi(0.0),
            4.5, self._phi(4.5), "CUBIC",
            extra_sample=(2.0, self._phi(2.0)),
        )
        assert a == pytest.approx(3.0, abs=1e-9)

    def test_bisection(self):
        assert _interpolate_step(1.0, 0.0, -1.0, 3.0, 5.0, "BISECTION") == 2.0

    def test_nonfinite_hi_falls_back_to_bisection(self):
        assert _interpolate_step(
            1.0, 0.0, -1.0, 3.0, float("nan"), "CUBIC"
        ) == 2.0

    def test_result_stays_inside_bracket(self):
        # Steep gradient would put the quadratic minimizer beyond hi;
        # the 5% margin clamp keeps it interior.
        a = _interpolate_step(0.0, 1.0, -1e-8, 1.0, 1.0 - 1e-9, "QUADRATIC")
        assert 0.05 <= a <= 0.95
