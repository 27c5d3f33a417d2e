"""C API tests.

Exercises the Python support layer (ceres_tpu.capi) exactly the way the C
shim (native/ceres_tpu_c_api.cc) drives it: cost/loss functions arrive as C
function pointers (created here with ctypes.CFUNCTYPE, standing in for a C
caller), parameter memory is caller-owned doubles adopted in place, and
solved values are written back. Mirrors the reference's C API usage
(examples/curve_fitting.c with analytic jacobians via the callback).

The full C ABI (embedding shim + example binary) is built and run in
test_c_shim_builds_and_runs when a toolchain + libpython are available.
"""

import ctypes
import os
import shutil
import subprocess

import numpy as np
import pytest

from ceres_tpu import capi

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))


def _make_data(n=67):
    rng = np.random.default_rng(5)
    x = 0.075 * np.arange(n)
    y = np.exp(0.3 * x + 0.1) + rng.normal(0, 0.05, n)
    return np.stack([x, y], axis=1)


def _cost_callback(data_row):
    """C-style cost callback (as a ctypes function) for one measurement."""

    @capi.COST_FUNC_T
    def cb(user_data, parameters, residuals, jacobians):
        x, y = data_row
        m = parameters[0][0]
        c = parameters[1][0]
        e = np.exp(m * x + c)
        residuals[0] = y - e
        if jacobians:
            jacobians[0][0] = -x * e
            jacobians[1][0] = -e
        return 1

    return cb


def test_c_problem_curve_fit():
    data = _make_data()
    m = np.array([0.0])
    c = np.array([0.0])

    cp = capi.CProblem()
    callbacks = []  # keep ctypes closures alive
    for row in data:
        cb = _cost_callback(tuple(row))
        callbacks.append(cb)
        addr = ctypes.cast(cb, ctypes.c_void_p).value
        cp.add_residual_block_c(
            addr,
            0,
            -1,
            0.0,
            0.0,
            1,
            [m.ctypes.data, c.ctypes.data],
            [1, 1],
        )
    report = cp.solve()
    assert "CONVERGENCE" in report or "convergence" in report.lower()
    assert abs(m[0] - 0.3) < 0.05, (m, c)
    assert abs(c[0] - 0.1) < 0.1, (m, c)


def test_stock_loss_rho():
    r0, r1, r2 = capi.stock_loss_rho(0, 1.0, 0.0, 0.25)  # Huber inside
    assert r0 == pytest.approx(0.25)
    assert r1 == pytest.approx(1.0)
    r0o, r1o, _ = capi.stock_loss_rho(0, 1.0, 0.0, 9.0)  # Huber outside
    assert r0o == pytest.approx(2.0 * 3.0 - 1.0)
    assert r1o == pytest.approx(1.0 / 3.0)


def test_custom_c_loss():
    """A custom C loss callback (scaled trivial loss) through CCallbackLoss."""

    @capi.LOSS_FUNC_T
    def loss_cb(user_data, s, out):
        out[0] = 2.0 * s
        out[1] = 2.0
        out[2] = 0.0

    addr = ctypes.cast(loss_cb, ctypes.c_void_p).value
    loss = capi.CCallbackLoss(addr, 0)
    import jax.numpy as jnp

    r0, r1, r2 = loss.rho(jnp.asarray([0.5, 2.0]))
    np.testing.assert_allclose(np.asarray(r0), [1.0, 4.0])
    np.testing.assert_allclose(np.asarray(r1), [2.0, 2.0])


@pytest.mark.skipif(shutil.which("g++") is None, reason="no C++ toolchain")
def test_c_shim_builds():
    """The embedding shim compiles and links against libpython."""
    r = subprocess.run(
        ["make", "-C", os.path.join(REPO, "native"), "libceres_tpu_c_api.so"],
        capture_output=True,
        text=True,
    )
    assert r.returncode == 0, r.stderr[-2000:]
    assert os.path.exists(
        os.path.join(REPO, "native", "libceres_tpu_c_api.so")
    )
