"""Differential tests for the fused Pallas group-evaluation kernel.

Strategy (SURVEY.md §4.3): evaluate the SAME problem through the Pallas
kernel (interpret mode on CPU) and through the XLA path, and require
matching cost/residuals/Jacobians/gradient — the analog of the reference's
CPU-vs-CUDA differential tests (evaluator_cuda_test.cu.cc)."""

import os

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from ceres_tpu import pallas_eval
from ceres_tpu.autodiff import CostFunction
from ceres_tpu.evaluator import _group_eval, evaluate, state_tables
from ceres_tpu.io.bal import build_ba_problem, synthetic_bal
from ceres_tpu.loss import CauchyLoss, HuberLoss
from ceres_tpu.problem import Problem


@pytest.fixture(autouse=True)
def _interpret_mode(monkeypatch):
    monkeypatch.setenv("CERES_TPU_PALLAS", "interpret")
    yield


def _clear_kernel_cache(program):
    for m in program.groups:
        if hasattr(m, "_pallas_kernels"):
            del m._pallas_kernels


def _eval_both(program, dtype=jnp.float32):
    arrays = program.arrays(dtype)
    state = program.state_vector(dtype)
    f = jax.jit(lambda a, s: evaluate(program, a, s, with_jacobian=True))
    c1, r1, j1, g1 = f(arrays, state)
    os.environ["CERES_TPU_NO_PALLAS"] = "1"
    _clear_kernel_cache(program)
    try:
        f2 = jax.jit(lambda a, s: evaluate(program, a, s, with_jacobian=True))
        c2, r2, j2, g2 = f2(arrays, state)
    finally:
        del os.environ["CERES_TPU_NO_PALLAS"]
        _clear_kernel_cache(program)
    return (c1, r1, j1, g1), (c2, r2, j2, g2)


def _assert_close(out_pallas, out_xla, tol=5e-4):
    (c1, r1, j1, g1), (c2, r2, j2, g2) = out_pallas, out_xla
    assert abs(float(c1) - float(c2)) <= tol * (1.0 + abs(float(c2)))
    np.testing.assert_allclose(g1, g2, rtol=tol, atol=tol)
    for a, b in zip(r1, r2):
        np.testing.assert_allclose(a, b, rtol=tol, atol=tol)
    for ga, gb in zip(j1.jac_groups, j2.jac_groups):
        for ta, tb in zip(ga, gb):
            np.testing.assert_allclose(ta, tb, rtol=tol, atol=tol)


def test_snavely_group_matches_xla_path():
    bal = synthetic_bal(6, 40, 150, seed=3)
    problem, _, _ = build_ba_problem(bal)
    program = problem.compile()
    # kernel must actually engage for the observation group
    arrays = program.arrays(jnp.float32)
    assert any(
        pallas_eval.group_kernel(m, g, jnp.float32, True) is not None
        for m, g in zip(program.groups, arrays["groups"])
    )
    _assert_close(*_eval_both(program))


@pytest.mark.parametrize("loss", [HuberLoss(0.5), CauchyLoss(0.3)])
def test_robust_loss_group_matches_xla_path(loss):
    rng = np.random.RandomState(0)
    p = Problem()
    xs = [p.add_parameter_block(rng.randn(3)) for _ in range(10)]
    data = rng.randn(40, 2)
    idx = rng.randint(0, 10, 40)
    cf = CostFunction(lambda params, d: params[0][:2] * params[0][2] - d[0], 2)
    for i in range(40):
        p.add_residual_block(cf, loss, [xs[idx[i]]], data=(data[i],))
    _assert_close(*_eval_both(p.compile()))


def test_masked_lanes_are_zeroed():
    """Sharding pads groups with masked lanes; the kernel must zero their
    residual/Jacobian contributions exactly like the XLA path."""
    bal = synthetic_bal(4, 20, 64, seed=5)
    problem, _, _ = build_ba_problem(bal)
    program = problem.compile()
    arrays = program.arrays(jnp.float32)
    state = program.state_vector(jnp.float32)
    garr = dict(arrays["groups"][0])
    n = garr["a_rows"][0].shape[0]
    mask = np.ones(n, np.float32)
    mask[-5:] = 0.0
    garr["mask"] = jnp.asarray(mask)
    meta = program.groups[0]

    def run(a_garr):
        s2d = state_tables(program, state)
        return _group_eval(meta, a_garr, s2d, True, True, None)

    c1, r1, j1 = jax.jit(run)(garr)
    os.environ["CERES_TPU_NO_PALLAS"] = "1"
    _clear_kernel_cache(program)
    try:
        c2, r2, j2 = jax.jit(run)(garr)
    finally:
        del os.environ["CERES_TPU_NO_PALLAS"]
        _clear_kernel_cache(program)
    assert abs(float(c1) - float(c2)) <= 1e-5 * (1 + abs(float(c2)))
    np.testing.assert_allclose(r1, r2, rtol=1e-5, atol=1e-5)
    # masked lanes must be exactly zero
    np.testing.assert_array_equal(np.asarray(r1)[:, -5:], 0.0)
    for ta, tb in zip(j1, j2):
        np.testing.assert_allclose(ta, tb, rtol=5e-4, atol=5e-4)
        np.testing.assert_array_equal(np.asarray(ta)[:, -5:], 0.0)


def test_unsupported_functor_falls_back():
    """A functor using a primitive the lane interpreter cannot re-emit
    (sort) must disqualify the group, not break evaluation."""
    rng = np.random.RandomState(1)
    p = Problem()
    x = p.add_parameter_block(rng.randn(4))
    cf = CostFunction(lambda params, d: jnp.sort(params[0])[:2], 2)
    for _ in range(3):
        p.add_residual_block(cf, None, [x])
    program = p.compile()
    arrays = program.arrays(jnp.float32)
    assert (
        pallas_eval.group_kernel(
            program.groups[0], arrays["groups"][0], jnp.float32, True
        )
        is None
    )
    # evaluation still works through the XLA path
    state = program.state_vector(jnp.float32)
    c, _, _, g = jax.jit(lambda a, s: evaluate(program, a, s, True))(arrays, state)
    assert np.isfinite(float(c))


def test_f64_disables_kernel():
    bal = synthetic_bal(4, 20, 64, seed=7)
    problem, _, _ = build_ba_problem(bal)
    program = problem.compile()
    arrays = program.arrays(jnp.float64)
    assert (
        pallas_eval.group_kernel(
            program.groups[0], arrays["groups"][0], jnp.float64, True
        )
        is None
    )


def _quaternion_ba_problem(seed=9, num_cams=5, num_pts=30, num_obs=100):
    """Mini-BA with quaternion-manifold cameras — the shape of the
    reference's flagship differential test (evaluator_cuda_test.cu.cc:451:
    quaternion manifold + robust losses on the CUDA evaluator)."""
    from ceres_tpu.manifolds import QuaternionManifold
    from ceres_tpu.rotation import unit_quaternion_rotate_point

    rng = np.random.RandomState(seed)
    p = Problem()
    qs, ts, pts = [], [], []
    for _ in range(num_cams):
        q = rng.randn(4)
        q /= np.linalg.norm(q)
        qs.append(p.add_parameter_block(q, manifold=QuaternionManifold()))
        ts.append(p.add_parameter_block(rng.randn(3) * 0.1))
    for _ in range(num_pts):
        pts.append(p.add_parameter_block(rng.randn(3) + [0, 0, 4]))

    def reproj(params, data):
        q, t, x = params
        (obs,) = data
        xc = unit_quaternion_rotate_point(q, x) + t
        return jnp.stack([xc[0] / xc[2] - obs[0], xc[1] / xc[2] - obs[1]])

    cf = CostFunction(reproj, 2, name="quat_reproj")
    cam_idx = rng.randint(0, num_cams, num_obs)
    pt_idx = rng.randint(0, num_pts, num_obs)
    obs = rng.randn(num_obs, 2) * 0.1
    ids = np.stack(
        [
            np.asarray([qs[c] for c in cam_idx]),
            np.asarray([ts[c] for c in cam_idx]),
            np.asarray([pts[i] for i in pt_idx]),
        ],
        axis=1,
    )
    p.add_residual_blocks(cf, HuberLoss(0.5), ids, (obs,))
    return p


def test_quaternion_manifold_group_uses_kernel_and_matches_xla():
    """The plus-Jacobian chain rule is fused into the kernel trace; a
    quaternion-manifold BA group must be kernel-eligible AND match the XLA
    path (which applies the chain rule as a separate einsum)."""
    p = _quaternion_ba_problem()
    program = p.compile()
    arrays = program.arrays(jnp.float32)
    manifold_groups = [
        (m, g)
        for m, g in zip(program.groups, arrays["groups"])
        if any(pm.manifold is not None for pm in m.positions)
    ]
    assert manifold_groups, "fixture must produce a manifold group"
    for m, g in manifold_groups:
        assert pallas_eval.group_kernel(m, g, jnp.float32, True) is not None, (
            f"manifold group '{m.cost_function.name}' fell back to XLA"
        )
    _assert_close(*_eval_both(p.compile()))


def test_quaternion_manifold_jacobian_is_tangent_sized():
    p = _quaternion_ba_problem(num_cams=2, num_pts=6, num_obs=12)
    program = p.compile()
    arrays = program.arrays(jnp.float32)
    for m, g in zip(program.groups, arrays["groups"]):
        k = pallas_eval.group_kernel(m, g, jnp.float32, True)
        if k is None or all(pm.manifold is None for pm in m.positions):
            continue
        # quaternion block: ambient 4, tangent 3 -> jac rows = r * 3
        qpos = next(
            i for i, pm in enumerate(m.positions) if pm.manifold is not None
        )
        assert m.positions[qpos].size == 4
        assert m.positions[qpos].tangent_size == 3
        assert k.tangent_sizes[qpos] == 3


def test_residual_only_kernel_matches_xla():
    """The residual-only kernel variant (no pushforwards) must match the
    XLA path's cost and loss-scaled residuals."""
    bal = synthetic_bal(6, 40, 150, seed=13)
    problem, _, _ = build_ba_problem(bal, loss=None)
    program = problem.compile()
    arrays = program.arrays(jnp.float32)
    # kernel engages for with_jacobian=False
    assert any(
        pallas_eval.group_kernel(m, g, jnp.float32, True, with_jacobian=False)
        is not None
        for m, g in zip(program.groups, arrays["groups"])
    )
    state = program.state_vector(jnp.float32)
    f = jax.jit(lambda a, s: evaluate(program, a, s, with_jacobian=False))
    c1, r1, _, _ = f(arrays, state)
    os.environ["CERES_TPU_NO_PALLAS"] = "1"
    _clear_kernel_cache(program)
    try:
        f2 = jax.jit(lambda a, s: evaluate(program, a, s, with_jacobian=False))
        c2, r2, _, _ = f2(arrays, state)
    finally:
        del os.environ["CERES_TPU_NO_PALLAS"]
        _clear_kernel_cache(program)
    assert abs(float(c1) - float(c2)) <= 1e-4 * (1.0 + abs(float(c2)))
    for a, b in zip(r1, r2):
        np.testing.assert_allclose(a, b, rtol=5e-5, atol=5e-5)


def test_residual_only_kernel_with_loss_scales_residuals():
    rng = np.random.RandomState(2)
    p = Problem()
    xs = [p.add_parameter_block(rng.randn(3)) for _ in range(8)]
    data = rng.randn(30, 2) * 2.0
    idx = rng.randint(0, 8, 30)
    cf = CostFunction(lambda params, d: params[0][:2] * params[0][2] - d[0], 2)
    for i in range(30):
        p.add_residual_block(cf, HuberLoss(0.5), [xs[idx[i]]], data=(data[i],))
    program = p.compile()
    arrays = program.arrays(jnp.float32)
    state = program.state_vector(jnp.float32)
    f = jax.jit(lambda a, s: evaluate(program, a, s, with_jacobian=False))
    c1, r1, _, _ = f(arrays, state)
    os.environ["CERES_TPU_NO_PALLAS"] = "1"
    _clear_kernel_cache(program)
    try:
        c2, r2, _, _ = jax.jit(
            lambda a, s: evaluate(program, a, s, with_jacobian=False)
        )(arrays, state)
    finally:
        del os.environ["CERES_TPU_NO_PALLAS"]
        _clear_kernel_cache(program)
    assert abs(float(c1) - float(c2)) <= 1e-4 * (1.0 + abs(float(c2)))
    for a, b in zip(r1, r2):
        np.testing.assert_allclose(a, b, rtol=5e-5, atol=5e-5)


def test_quaternion_manifold_group_matches_xla_path():
    """Product-manifold (Quaternion x Euclidean) camera blocks: the
    plus-Jacobian chain rule is traced into the kernel, including the
    `pad` ops of the block-diagonal construction (lane rule added after
    the round-4 differential tier found the group silently falling back)."""
    bal = synthetic_bal(6, 40, 150, seed=4)
    problem, _, _ = build_ba_problem(
        bal, use_quaternions=True, use_manifolds=True
    )
    program = problem.compile()
    arrays = program.arrays(jnp.float32)
    assert any(
        pallas_eval.group_kernel(m, g, jnp.float32, True) is not None
        for m, g in zip(program.groups, arrays["groups"])
    )
    _assert_close(*_eval_both(program))
