"""NIST harness tests using synthetic datasets written in StRD format.

(The real NIST .dat files are not bundled; the harness's parser, model
library, and LRE scoring are validated on generated data whose certified
values are known by construction.)
"""

import numpy as np
import pytest

from ceres_tpu.examples.nist import (
    MODELS,
    log_relative_error,
    parse_nist_dat,
    run_nist,
)


def write_strd(path, name, b_true, b_start1, b_start2, x, y, rss):
    lines = []
    lines.append(f"NIST/ITL StRD synthetic dataset {name}")
    lines.append("")
    lines.append("Starting values                  Certified Values")
    lines.append("")
    for i, (s1, s2, bt) in enumerate(zip(b_start1, b_start2, b_true)):
        lines.append(
            f"  b{i+1} =   {s1:.8E}   {s2:.8E}   {bt:.10E}  1.0E-5"
        )
    lines.append(f"Residual Sum of Squares:    {rss:.10E}")
    lines.append("")
    lines.append("Data:   y          x")
    for yi, xi in zip(y, x):
        lines.append(f"  {yi:.10E}   {xi:.10E}")
    with open(path, "w") as f:
        f.write("\n".join(lines))


@pytest.fixture
def synthetic_nist_dir(tmp_path):
    import jax.numpy as jnp

    rng = np.random.default_rng(0)
    # misra1a-shaped synthetic: y = b0 (1 - exp(-b1 x))
    b_true = np.array([240.0, 5.5e-4])
    x = np.linspace(50.0, 700.0, 20)
    y = np.asarray(MODELS["misra1a"](jnp.asarray(b_true), jnp.asarray(x)))
    noise = rng.normal(0, 0.05, x.shape)
    y = y + noise
    # "certified" = tight refit with scipy for ground truth
    from scipy.optimize import least_squares

    def res(b):
        return y - b[0] * (1.0 - np.exp(-b[1] * x))

    sol = least_squares(res, b_true, xtol=1e-15, ftol=1e-15)
    rss = float(sol.fun @ sol.fun)
    write_strd(
        tmp_path / "Misra1a.dat",
        "misra1a",
        sol.x,
        [500.0, 1e-4],
        [250.0, 5e-4],
        x,
        y,
        rss,
    )
    return tmp_path, sol.x


def test_parse_and_fit(synthetic_nist_dir):
    data_dir, certified = synthetic_nist_dir
    ds = parse_nist_dat(str(data_dir / "Misra1a.dat"))
    assert ds.name == "misra1a"
    assert ds.starts.shape == (2, 2)
    np.testing.assert_allclose(ds.certified, certified, rtol=1e-8)

    results = run_nist(str(data_dir))
    assert "misra1a" in results
    lre, final_cost, cert_cost = results["misra1a"]
    # solved to >= 6 certified digits
    assert lre >= 6.0, results
    np.testing.assert_allclose(final_cost, cert_cost, rtol=1e-6)


def test_lre_scoring():
    assert log_relative_error(np.array([1.0]), np.array([1.0])) == 11.0
    assert 2.9 < log_relative_error(np.array([1.001]), np.array([1.0])) < 3.1
    assert log_relative_error(np.array([2.0]), np.array([1.0])) == 0.0
