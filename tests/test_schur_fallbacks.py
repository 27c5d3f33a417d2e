"""Adversarial tests for the documented BA-shape approximations.

Round-2 verdict weak #7: schur_jacobi_blocks drops cross terms when a
(camera, point) pair appears in more than one residual block
(schur.py), and the explicit-Schur/visibility machinery assumes the BA
shape (explicit_schur.py:16-18), falling back silently otherwise. These
tests CONSTRUCT the violating shapes and assert the approximation only
degrades preconditioner quality / the fallback engages — never the
answer.
"""

import numpy as np
import jax.numpy as jnp
import pytest

import ceres_tpu
from ceres_tpu import CostFunction, LinearSolverType, PreconditionerType, SolverOptions
from ceres_tpu.problem import Problem


def _repeated_pair_problem(seed=3):
    """BA-shaped problem where every (camera, point) pair appears in TWO
    residual blocks (two independent observations of the same pair) —
    the shape whose cross terms schur_jacobi_blocks drops."""
    rng = np.random.RandomState(seed)
    p = Problem()
    cams = [p.add_parameter_block(rng.randn(4)) for _ in range(4)]
    pts = [p.add_parameter_block(rng.randn(3)) for _ in range(30)]

    def project(params, data):
        cam, pt = params
        (target,) = data
        return cam[:3] * (1.0 + 0.1 * jnp.dot(pt, pt)) + cam[3] * pt - target

    cf = CostFunction(project, 3, name="toy_proj")
    for pi, pt in enumerate(pts):
        for cam in (cams[pi % 4], cams[(pi + 1) % 4]):
            # the SAME pair twice, different data
            for _ in range(2):
                p.add_residual_block(cf, None, [cam, pt], (rng.randn(3),))
    return p


def _solve(problem, **kw):
    options = SolverOptions(max_num_iterations=40, **kw)
    return ceres_tpu.solve(options, problem)


def test_schur_jacobi_with_repeated_pairs_still_correct():
    """Dropping cross terms in the SCHUR_JACOBI preconditioner must only
    affect PCG iteration counts, never the solution: the solve on the
    violating shape must match DENSE_QR's final cost."""
    s_ref = _solve(
        _repeated_pair_problem(),
        linear_solver_type=LinearSolverType.DENSE_QR,
    )
    s_is = _solve(
        _repeated_pair_problem(),
        linear_solver_type=LinearSolverType.ITERATIVE_SCHUR,
        preconditioner_type=PreconditionerType.SCHUR_JACOBI,
        eta=1e-6,
    )
    assert s_is.final_cost <= s_ref.final_cost * (1 + 1e-5) + 1e-10


def _two_e_class_problem(seed=5):
    """Two eliminated classes of different tangent sizes — NOT the BA
    shape (_camera_streams raises ValueError): explicit Schur must fall
    back, not produce a wrong answer."""
    rng = np.random.RandomState(seed)
    p = Problem()
    cams = [p.add_parameter_block(rng.randn(4)) for _ in range(3)]
    pts3 = [p.add_parameter_block(rng.randn(3)) for _ in range(12)]
    pts2 = [p.add_parameter_block(rng.randn(2)) for _ in range(12)]

    def f3(params, data):
        cam, pt = params
        (t,) = data
        return cam[:3] + cam[3] * pt - t

    def f2(params, data):
        cam, pt = params
        (t,) = data
        return cam[:2] * (1.0 + pt[0]) + pt - t

    cf3 = CostFunction(f3, 3, name="f3")
    cf2 = CostFunction(f2, 2, name="f2")
    for i, pt in enumerate(pts3):
        for cam in (cams[i % 3], cams[(i + 1) % 3]):
            p.add_residual_block(cf3, None, [cam, pt], (rng.randn(3),))
    for i, pt in enumerate(pts2):
        for cam in (cams[i % 3], cams[(i + 1) % 3]):
            p.add_residual_block(cf2, None, [cam, pt], (rng.randn(2),))
    return p


def test_sparse_schur_falls_back_on_non_ba_shape():
    from ceres_tpu.linalg.visibility import _camera_streams
    from ceres_tpu.linalg.schur import schur_views

    problem = _two_e_class_problem()
    program = problem.compile()
    ev = program.evaluator()
    _c, _r, jac, _g = ev.evaluate_groups(program.state_vector())
    jac_e, jac_f = schur_views(program, jac)
    # the violating shape is detected, not silently mis-assembled
    with pytest.raises(ValueError):
        _camera_streams(program, jac_e, jac_f)

    # and the SPARSE_SCHUR solve routes through the fallback to the same
    # answer as DENSE_QR
    s_ref = _solve(
        _two_e_class_problem(),
        linear_solver_type=LinearSolverType.DENSE_QR,
    )
    s_ss = _solve(
        _two_e_class_problem(),
        linear_solver_type=LinearSolverType.SPARSE_SCHUR,
    )
    assert abs(s_ss.final_cost - s_ref.final_cost) <= (
        1e-6 * max(abs(s_ref.final_cost), 1.0)
    )
