"""Robust-loss correction of residuals and Jacobians (Triggs et al., BAMS).

Parity with the reference Corrector (include/ceres/internal/corrector.h:83-220)
as a pure, batched function: where the reference constructs one Corrector per
residual block inside the CUDA kernel, here the correction for an entire
signature batch is one fused set of elementwise/matmul ops:

  sqrt_rho1      = sqrt(rho1)
  outlier region (sq_norm == 0 or rho2 <= 0):
      r <- sqrt_rho1 * r;  J <- sqrt_rho1 * J
  inlier region:
      D     = 1 + 2 s rho2 / rho1          (> 1)
      alpha = 1 - sqrt(D)
      r <- sqrt_rho1 / (1 - alpha) * r
      J <- sqrt_rho1 * (J - alpha/s * r r^T J)   (uncorrected r)

Cost contribution stays 0.5 * rho0.
"""

from __future__ import annotations

import jax.numpy as jnp


def correct_batched(res, jacs, rho0, rho1, rho2):
    """Apply the Triggs correction to a batch of residual blocks.

    Args:
      res:  [n, r] uncorrected residuals.
      jacs: list of [n, r, p_i] block Jacobians (may be empty for
            residual-only evaluation).
      rho0, rho1, rho2: [n] loss value and derivatives at s = |res|^2.

    Returns:
      (corrected_res [n, r], corrected_jacs list).
    """
    sq_norm = jnp.sum(res * res, axis=-1)  # [n]
    sqrt_rho1 = jnp.sqrt(rho1)

    inlier = (sq_norm > 0.0) & (rho2 > 0.0)
    safe_sq_norm = jnp.where(inlier, sq_norm, 1.0)
    safe_rho1 = jnp.where(rho1 > 0.0, rho1, 1.0)
    d = 1.0 + 2.0 * sq_norm * rho2 / safe_rho1
    alpha = jnp.where(inlier, 1.0 - jnp.sqrt(jnp.maximum(d, 0.0)), 0.0)

    residual_scaling = jnp.where(inlier, sqrt_rho1 / (1.0 - alpha), sqrt_rho1)
    alpha_sq_norm = jnp.where(inlier, alpha / safe_sq_norm, 0.0)

    corrected_jacs = []
    for jac in jacs:
        # r^T J : [n, p]; correction uses the *uncorrected* residuals
        # (corrector.h:80-82 "CorrectJacobian before CorrectResiduals").
        rtj = jnp.einsum("nr,nrp->np", res, jac, precision="highest")
        corrected = sqrt_rho1[:, None, None] * (
            jac - alpha_sq_norm[:, None, None] * res[:, :, None] * rtj[:, None, :]
        )
        corrected_jacs.append(corrected)

    corrected_res = residual_scaling[:, None] * res
    return corrected_res, corrected_jacs
