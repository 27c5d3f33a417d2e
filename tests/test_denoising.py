"""Denoising / sampled-function example tests (reference analogs:
denoising.cc + fields_of_experts.cc, sampled_function/)."""

import numpy as np

import ceres_tpu
from ceres_tpu import LinearSolverType, SolverOptions
from ceres_tpu.examples.denoising import (
    build_denoising_problem,
    build_sampled_function_problem,
)


def test_denoising_reduces_noise():
    rng = np.random.default_rng(0)
    h, w = 16, 16
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    clean = ((xx // 4 + yy // 4) % 2).astype(np.float64)  # checkerboard
    noisy = clean + rng.normal(0, 0.2, (h, w))

    problem, px = build_denoising_problem(noisy, data_weight=1.0, prior_weight=0.5)
    options = SolverOptions(
        linear_solver_type=LinearSolverType.CGNR, max_num_iterations=20
    )
    summary = ceres_tpu.solve(options, problem)
    assert summary.final_cost < summary.initial_cost
    denoised = np.array(
        [problem.parameter_block_value(i)[0] for i in px]
    ).reshape(h, w)
    err_noisy = np.abs(noisy - clean).mean()
    err_denoised = np.abs(denoised - clean).mean()
    assert err_denoised < err_noisy


def test_sampled_function_minimization():
    # samples of (x - 5)^2 on integer grid
    xs = np.arange(11.0)
    samples = (xs - 5.0) ** 2 + 1.0
    problem, b = build_sampled_function_problem(samples, x0=2.0)
    summary = ceres_tpu.solve(SolverOptions(max_num_iterations=100), problem)
    assert abs(problem.parameter_block_value(b)[0] - 5.0) < 1e-3
    assert summary.final_cost < 1.1  # min value ~1 (cost = 0.5*f^2... f=1)


# ------------------------------------------------------------------ #
# real trained FoE filters + noisy PGM shipped with the reference
# ------------------------------------------------------------------ #

import os
import pytest

from ceres_tpu.examples.denoising import (
    FieldsOfExpertsLoss,
    build_foe_denoising_problem,
    load_foe_file,
    load_pgm,
    save_pgm,
)

DATA_DIR = "/root/reference/data"

requires_foe_data = pytest.mark.skipif(
    not os.path.exists(os.path.join(DATA_DIR, "2x2.foe")),
    reason="trained FoE data not mounted",
)


@requires_foe_data
def test_load_trained_foe_filters():
    for name, size, k in [("2x2", 2, 3), ("3x3", 3, 8), ("5x5", 5, 24)]:
        m = load_foe_file(os.path.join(DATA_DIR, f"{name}.foe"))
        assert m.size == size
        assert m.filters.shape == (k, size * size)
        assert m.alphas.shape == (k,)
        assert (m.alphas > 0).all()
        assert m.x_deltas.min() == 0 and m.x_deltas.max() == size - 1
        assert m.y_deltas.min() == 0 and m.y_deltas.max() == size - 1


@requires_foe_data
def test_load_noisy_pgm():
    img = load_pgm(os.path.join(DATA_DIR, "ceres_noisy.pgm"))
    assert img.shape == (213, 177)
    assert img.min() >= 0.0 and img.max() <= 255.0
    assert img.std() > 10.0  # non-degenerate content


def test_pgm_round_trip(tmp_path):
    rng = np.random.default_rng(0)
    img = rng.integers(0, 256, (7, 5)).astype(np.float64)
    save_pgm(tmp_path / "x.pgm", img)
    back = load_pgm(tmp_path / "x.pgm")
    np.testing.assert_array_equal(back, img)


def test_foe_loss_derivative_contract():
    import jax

    loss = FieldsOfExpertsLoss(alpha=1.3)
    s = jnp_arr = np.linspace(0.1, 9.0, 8)
    import jax.numpy as jnp

    r0, r1, r2 = loss.rho(jnp.asarray(s))
    d1 = jax.vmap(jax.grad(lambda v: loss.rho(v)[0]))(jnp.asarray(s))
    d2 = jax.vmap(jax.grad(lambda v: loss.rho(v)[1]))(jnp.asarray(s))
    np.testing.assert_allclose(r1, d1, rtol=1e-10)
    np.testing.assert_allclose(r2, d2, rtol=1e-10)


@requires_foe_data
def test_denoise_real_image_window():
    # reference run: denoising --input=ceres_noisy.pgm --foe_file=2x2.foe;
    # a 40x40 window keeps the test fast while using the real trained prior
    foe = load_foe_file(os.path.join(DATA_DIR, "2x2.foe"))
    img = load_pgm(os.path.join(DATA_DIR, "ceres_noisy.pgm"))
    window = img[80:120, 60:100]

    problem, px = build_foe_denoising_problem(window, foe, sigma=20.0)
    options = SolverOptions(
        linear_solver_type=LinearSolverType.CGNR,
        max_num_iterations=15,
    )
    summary = ceres_tpu.solve(options, problem)
    assert summary.final_cost < summary.initial_cost

    out = np.array([problem.parameter_block_value(i)[0] for i in px]).reshape(
        window.shape
    )
    # output stays in image range and close to the data
    assert out.min() > -20 and out.max() < 275
    assert np.abs(out - window).mean() < 25.0
    # the trained prior smooths: total variation strictly drops
    tv = lambda a: np.abs(np.diff(a, axis=0)).sum() + np.abs(
        np.diff(a, axis=1)
    ).sum()
    assert tv(out) < 0.9 * tv(window), (tv(out), tv(window))
