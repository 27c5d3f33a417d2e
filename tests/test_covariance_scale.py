"""ITERATIVE_PCG covariance: device-resident column solves at BA scale.

reference role: covariance_impl.cc:700-889 (threaded SUITE_SPARSE_QR on
the full Jacobian) — the path that stays usable when the problem is too
large to densify. Cross-checked against DENSE_SVD on a gauge-fixed BA
problem (round-2 verdict #7 done-criterion: camera-block covariance on a
BA problem matching the dense reference).
"""

import numpy as np

from ceres_tpu import Covariance, CovarianceOptions
from ceres_tpu.io.bal import build_ba_problem, synthetic_bal
from ceres_tpu.types import CovarianceAlgorithmType


def _gauge_fixed_ba(seed=11):
    bal = synthetic_bal(10, 300, 3000, seed=seed, observation_noise=0.5)
    problem, cams, pts = build_ba_problem(bal)
    # fix the gauge (7 dof): hold two cameras constant
    problem.set_parameter_block_constant(cams[0])
    problem.set_parameter_block_constant(cams[1])
    return problem, cams[2:], pts


def test_iterative_pcg_matches_dense_svd_on_camera_blocks():
    problem, cams, _ = _gauge_fixed_ba()
    pairs = [(int(c), int(c)) for c in cams[:8]]
    pairs.append((int(cams[0]), int(cams[1])))  # one cross block

    cov_dense = Covariance(
        CovarianceOptions(algorithm_type=CovarianceAlgorithmType.DENSE_SVD)
    )
    assert cov_dense.compute(pairs, problem)

    cov_pcg = Covariance(
        CovarianceOptions(
            algorithm_type=CovarianceAlgorithmType.ITERATIVE_PCG,
            iterative_tolerance=1e-13,
            iterative_max_iterations=20000,
        )
    )
    assert cov_pcg.compute(pairs, problem)

    for bi, bj in pairs:
        a = np.asarray(cov_dense.get_covariance_block(bi, bj))
        b = np.asarray(cov_pcg.get_covariance_block(bi, bj))
        scale = max(1.0, np.abs(a).max())
        np.testing.assert_allclose(b, a, rtol=0, atol=1e-8 * scale)


def test_iterative_pcg_detects_rank_deficiency():
    """With the gauge NOT fixed, J^T J is singular; the PCG columns must
    fail to converge and compute() must return False (the role of the
    reference's factorization failure return)."""
    bal = synthetic_bal(6, 80, 400, seed=5, observation_noise=0.0)
    problem, cams, _ = build_ba_problem(bal)
    cov = Covariance(
        CovarianceOptions(
            algorithm_type=CovarianceAlgorithmType.ITERATIVE_PCG,
            iterative_tolerance=1e-12,
            iterative_max_iterations=200,
        )
    )
    assert not cov.compute([(int(cams[2]), int(cams[2]))], problem)
