"""Corrector tests (reference analog: internal/ceres/corrector_test.cc).

The key invariant (Triggs et al. BAMS eq. 10-11): the corrected
Gauss-Newton approximation reproduces the robustified gradient and
(clamped) Hessian:
    g  = rho1 * J^T r
    H  = rho1 * J^T J + 2 * rho2 * J^T r r^T J  (when rho2 > 0)
with corrected quantities  g_hat = J_hat^T r_hat,  H_hat = J_hat^T J_hat.
"""

import jax.numpy as jnp
import numpy as np

from ceres_tpu.corrector import correct_batched
from ceres_tpu.loss import CauchyLoss, HuberLoss, SoftLOneLoss, TrivialLoss

RNG = np.random.default_rng(7)


def check_invariants(loss, res, jac):
    res_b = jnp.asarray(res)[None, :]
    jac_b = jnp.asarray(jac)[None, :, :]
    s = float(np.dot(res, res))
    rho0, rho1, rho2 = (np.asarray(v) for v in loss.rho(jnp.asarray([s])))
    r_hat, (j_hat,) = correct_batched(res_b, [jac_b], rho0, rho1, rho2)
    r_hat = np.asarray(r_hat[0])
    j_hat = np.asarray(j_hat[0])

    g_expected = rho1[0] * jac.T @ res
    g_hat = j_hat.T @ r_hat
    np.testing.assert_allclose(g_hat, g_expected, rtol=1e-10, atol=1e-12)

    h_expected = rho1[0] * jac.T @ jac
    if rho2[0] > 0:
        jtr = jac.T @ res
        h_expected = h_expected + 2.0 * rho2[0] * np.outer(jtr, jtr)
    h_hat = j_hat.T @ j_hat
    np.testing.assert_allclose(h_hat, h_expected, rtol=1e-9, atol=1e-11)


def test_trivial_loss_is_identity():
    res = RNG.standard_normal(3)
    jac = RNG.standard_normal((3, 5))
    rho0, rho1, rho2 = (np.asarray(v) for v in TrivialLoss().rho(jnp.asarray([res @ res])))
    r_hat, (j_hat,) = correct_batched(
        jnp.asarray(res)[None], [jnp.asarray(jac)[None]], rho0, rho1, rho2
    )
    np.testing.assert_allclose(np.asarray(r_hat[0]), res, atol=1e-14)
    np.testing.assert_allclose(np.asarray(j_hat[0]), jac, atol=1e-14)


def test_gauss_newton_invariants_inlier_and_outlier():
    for loss in [HuberLoss(1.0), CauchyLoss(1.0), SoftLOneLoss(1.0)]:
        for scale in [0.1, 0.9, 3.0, 10.0]:
            res = scale * RNG.standard_normal(2)
            jac = RNG.standard_normal((2, 4))
            check_invariants(loss, res, jac)


def test_zero_residual_correction():
    loss = CauchyLoss(1.0)
    res = np.zeros(2)
    jac = RNG.standard_normal((2, 3))
    s = 0.0
    rho0, rho1, rho2 = (np.asarray(v) for v in loss.rho(jnp.asarray([s])))
    r_hat, (j_hat,) = correct_batched(
        jnp.asarray(res)[None], [jnp.asarray(jac)[None]], rho0, rho1, rho2
    )
    # sq_norm == 0: scale both by sqrt(rho1) (corrector.h:126-131)
    np.testing.assert_allclose(np.asarray(j_hat[0]), np.sqrt(rho1[0]) * jac, atol=1e-14)
    assert np.all(np.isfinite(np.asarray(r_hat)))


def test_batch_matches_per_block():
    loss = CauchyLoss(0.7)
    n, r, p = 6, 2, 3
    res = RNG.standard_normal((n, r))
    jac = RNG.standard_normal((n, r, p))
    s = np.sum(res * res, axis=1)
    rho0, rho1, rho2 = (np.asarray(v) for v in loss.rho(jnp.asarray(s)))
    r_hat, (j_hat,) = correct_batched(jnp.asarray(res), [jnp.asarray(jac)], rho0, rho1, rho2)
    for i in range(n):
        r1, (j1,) = correct_batched(
            jnp.asarray(res[i : i + 1]),
            [jnp.asarray(jac[i : i + 1])],
            rho0[i : i + 1],
            rho1[i : i + 1],
            rho2[i : i + 1],
        )
        np.testing.assert_allclose(np.asarray(r_hat[i]), np.asarray(r1[0]), atol=1e-14)
        np.testing.assert_allclose(np.asarray(j_hat[i]), np.asarray(j1[0]), atol=1e-14)
