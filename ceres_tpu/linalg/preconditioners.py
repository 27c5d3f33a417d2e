"""Preconditioners and batched block-diagonal solvers.

reference: IDENTITY / JACOBI (block_jacobi_preconditioner.cc), SCHUR_JACOBI
(schur_jacobi_preconditioner.cc), SCHUR_POWER_SERIES_EXPANSION
(power_series_expansion_preconditioner.cc). The TPU shape: every
block-diagonal operator is a batched [count, s, s] Cholesky factorization
per tangent-size class + batched triangular solves — MXU/VPU-friendly
small-batch linear algebra (SURVEY.md §7 translation table).
"""

from __future__ import annotations

from typing import Callable, Optional

import jax
import jax.numpy as jnp


def identity_preconditioner():
    return lambda r: r


class BlockDiagSolver:
    """Factorized block-diagonal operator over tangent-size classes.

    Given per-class batches of SPD blocks [count, s, s], applies M^{-1} to
    the matching segments of a full tangent vector (other entries pass
    through a zero-block ridge as 0 -> 0). Shared by the Jacobi
    preconditioner and the (E'E)^{-1} inner solve of implicit Schur
    (implicit_schur_complement.cc block_diagonal_EtE_inverse_).
    """

    def __init__(self, program, blocks_per_class, only_classes=None):
        self.program = program
        self.factors = {}
        for cls, b in enumerate(blocks_per_class):
            if only_classes is not None and cls not in only_classes:
                continue
            s = program.tangent_class_sizes[cls]
            # Tiny ridge: keeps all-zero blocks (e.g. f-blocks sharing an
            # e-class) finite; 0 -> 0 under the solve.
            eps = 1e-14 * jnp.maximum(
                1.0, jnp.max(jnp.abs(b), axis=(1, 2), keepdims=True)
            ) + 1e-300
            b = b + eps * jnp.eye(s, dtype=b.dtype)
            self.factors[cls] = jnp.linalg.cholesky(b)

    @property
    def classes(self):
        return sorted(self.factors.keys())

    def __call__(self, r):
        """Apply M^{-1}: per-class reshape -> batched cho_solve -> reassemble
        (the class-contiguous layout makes this scatter-free)."""
        from ..evaluator import tangent_tables

        tables = tangent_tables(self.program, r)
        out = []
        for cls, seg in enumerate(tables):
            chol = self.factors.get(cls)
            if chol is None:
                out.append(seg)
            else:
                out.append(
                    jax.vmap(
                        lambda c, v: jax.scipy.linalg.cho_solve((c, True), v)
                    )(chol, seg)
                )
        return jnp.concatenate([t.reshape(-1) for t in out])


class BlockJacobiPreconditioner:
    """M = block-diag(J^T J + diag(dsq)) per free parameter block.

    reference: block_jacobi_preconditioner.cc (BSM and CRS variants).
    """

    def __init__(self, program, jac, dsq=None):
        blocks = jac.block_diag_jtj(dsq=dsq)
        self._solver = BlockDiagSolver(program, blocks)

    def __call__(self, r):
        return self._solver(r)


def make_preconditioner(kind, program, jac, dsq=None):
    from ..types import PreconditionerType

    if kind == PreconditionerType.IDENTITY:
        return identity_preconditioner()
    if kind == PreconditionerType.JACOBI:
        return BlockJacobiPreconditioner(program, jac, dsq=dsq)
    raise NotImplementedError(f"preconditioner {kind} not implemented for this solver")
