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
