"""Sparse direct solvers on the host (scipy), with iterative refinement.

reference: SparseNormalCholeskySolver (sparse_normal_cholesky_solver.cc) over
SuiteSparse/Eigen/Accelerate backends (suitesparse.cc, eigensparse.cc,
sparse_cholesky.cc) + mixed-precision refinement (iterative_refiner.cc).
Those backends are *CPU* libraries in the reference too — the analog here is
scipy.sparse's SuperLU on the host, consuming the CRS export of the
device-resident BlockJacobian. Used when the problem has general sparsity
that neither the dense path (too big) nor Schur (no elimination structure)
fits; the device-side CGNR path remains the TPU-preferred option.
"""

from __future__ import annotations

import numpy as np

try:  # pragma: no cover - import guard
    import scipy.sparse as sp
    import scipy.sparse.linalg as spla

    HAVE_SCIPY = True
except Exception:  # pragma: no cover
    HAVE_SCIPY = False


def solve_sparse_normal_cholesky(
    jac, res_groups, grad, dsq, refinement_iterations: int = 2
):
    """Solve (J^T J + diag(dsq)) step = -grad with a host sparse
    factorization + iterative refinement. All inputs are device arrays; the
    Jacobian crosses to host once per outer iteration (the reference's
    sparse backends do the same H2D/D2H round trip in reverse).
    """
    if not HAVE_SCIPY:
        raise RuntimeError("scipy unavailable for SPARSE_NORMAL_CHOLESKY")
    vals, cols, row_ptr = jac.to_crs()
    n = jac.num_cols
    j = sp.csr_matrix(
        (np.asarray(vals, dtype=np.float64), cols, row_ptr),
        shape=(jac.num_rows, n),
    )
    a = (j.T @ j).tocsc() + sp.diags(np.asarray(dsq, dtype=np.float64))
    rhs = -np.asarray(grad, dtype=np.float64)
    solver = spla.splu(a.tocsc())
    x = solver.solve(rhs)
    # iterative refinement (iterative_refiner.cc SolveRefine)
    for _ in range(refinement_iterations):
        r = rhs - a @ x
        x = x + solver.solve(r)
    return x
