"""On-TPU parity for the fused one-hot Pallas kernels (pallas_onehot.py).

Differential strategy (reference:
internal/ceres/evaluator_cuda_test.cu.cc:426-461 — same inputs through
both implementations, outputs must match): every Jacobian product that
can route through the fused gather/reduce kernels is compared against the
XLA one-hot path on the same chip, f32 and bf16, at a scale above
MIN_LANES so the kernels actually engage.

f32 gathers must be BIT-exact (the framework's gather-precision rule,
jacobian._onehot_precision); f32 reduces are element-exact with only the
A-dimension accumulation order differing from the XLA HIGH path, so the
tolerance is the f32 sum-ordering noise of ~2.8k-term sums.
"""

import os
import sys

import numpy as np
import pytest

import jax
import jax.numpy as jnp

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

from ceres_tpu import HuberLoss  # noqa: E402
from ceres_tpu.evaluator import Evaluator  # noqa: E402
from ceres_tpu.io.bal import build_ba_problem, synthetic_bal  # noqa: E402


@pytest.fixture(scope="module")
def ba():
    import ceres_tpu.pallas_onehot as po

    n_obs = max(2 * po.MIN_LANES, 150_000)
    bal = synthetic_bal(64, 20_000, n_obs, seed=7)
    problem, _, _ = build_ba_problem(bal, loss=HuberLoss(1.0))
    program = problem.compile()
    ev = Evaluator(program, dtype=jnp.float32)
    state = program.state_vector(jnp.float32)
    _c, _r, jac0, _g = ev.evaluate_groups(state)
    jac = jax.jit(lambda j: j.materialize_scale())(jac0)
    rng = np.random.default_rng(0)
    v = jnp.asarray(
        rng.normal(size=program.num_effective_parameters), jnp.float32
    )
    return program, jac, v


def _engaged(jac):
    """The camera position must resolve to the onehot plan and the kernel
    gate must be open — otherwise this file tests nothing."""
    import ceres_tpu.pallas_onehot as po
    from ceres_tpu.jacobian import use_onehot_kernel

    hits = 0
    for gi in range(len(jac.jac_groups)):
        for vp in range(len(jac.jac_groups[gi])):
            plan = jac.plan(gi, vp)
            if use_onehot_kernel(plan, jac._group_n(gi), jac._dtype()):
                hits += 1
    return hits


def _with_flag(fn, *args):
    os.environ["CERES_TPU_NO_ONEHOT_KERNEL"] = "1"
    try:
        # fresh jit wrapper: the kernel decision is baked in at trace time
        return jax.jit(fn)(*args)
    finally:
        del os.environ["CERES_TPU_NO_ONEHOT_KERNEL"]


def test_kernels_engage(ba):
    _program, jac, _v = ba
    assert _engaged(jac) >= 1


def test_tvec_products_parity(ba):
    _program, jac, v = ba
    tv = jax.jit(lambda j, x: j.tvec(x))(jac, v)
    got = jax.jit(lambda j, x: j.right_multiply_t(x))(jac, tv)
    want = _with_flag(lambda j, x: j.right_multiply_t(x), jac, tv)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    got_l = jax.jit(lambda j, u: j.left_multiply_t(u))(jac, list(got))
    want_l = _with_flag(lambda j, u: j.left_multiply_t(u), jac, list(got))
    for a, b in zip(got_l, want_l):
        scale = float(jnp.max(jnp.abs(b))) or 1.0
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=5e-6
        )


def test_flat_products_parity(ba):
    _program, jac, v = ba
    got = jax.jit(lambda j, x: j.right_multiply(x))(jac, v)
    want = _with_flag(lambda j, x: j.right_multiply(x), jac, v)
    for a, b in zip(got, want):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))

    got_l = jax.jit(lambda j, u: j.left_multiply(u))(jac, list(got))
    want_l = _with_flag(lambda j, u: j.left_multiply(u), jac, list(got))
    scale = float(jnp.max(jnp.abs(want_l))) or 1.0
    np.testing.assert_allclose(
        np.asarray(got_l) / scale, np.asarray(want_l) / scale, atol=5e-6
    )


def test_bf16_products_parity(ba):
    _program, jac, v = ba
    jac16 = jax.jit(lambda j: j.astype(jnp.bfloat16))(jac)
    tv = jax.jit(lambda j, x: j.tvec(x))(jac, v)
    got = jax.jit(lambda j, x: j.right_multiply_t(x))(jac16, tv)
    want = _with_flag(lambda j, x: j.right_multiply_t(x), jac16, tv)
    for a, b in zip(got, want):
        scale = float(jnp.max(jnp.abs(b))) or 1.0
        # bf16 leaves: product rounding sites differ between the kernel and
        # the XLA path — bf16-epsilon-level agreement is the contract
        np.testing.assert_allclose(
            np.asarray(a) / scale, np.asarray(b) / scale, atol=1e-2
        )
