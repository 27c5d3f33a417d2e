#!/usr/bin/env python
"""Fit a translation between a 2-D grid and sampled values through a
differentiable bicubic interpolator
(reference: examples/bicubic_interpolation.cc)."""

import _common  # noqa: F401
import jax.numpy as jnp
import numpy as np

import ceres_tpu
from ceres_tpu import SolverOptions
from ceres_tpu.autodiff import CostFunction
from ceres_tpu.interpolation import BiCubicInterpolator
from ceres_tpu.problem import Problem


def main():
    # ground-truth surface f(r, c) = r*10 + c, sampled on a shifted grid
    rows, cols = 10, 10
    rr, cc = np.meshgrid(np.arange(rows), np.arange(cols), indexing="ij")
    # curved surface so the shift is fully determined (a planar grid
    # leaves one shift direction unobservable)
    grid = np.sin(0.7 * rr) * 5.0 + np.cos(0.9 * cc) * 3.0 + rr * cc * 0.1
    interp = BiCubicInterpolator(grid)

    shift_true = np.array([1.3, 0.7])
    rng = np.random.default_rng(0)
    samples = rng.uniform(2, 7, (40, 2))
    r = samples[:, 0] + shift_true[0]
    c = samples[:, 1] + shift_true[1]
    values = np.sin(0.7 * r) * 5.0 + np.cos(0.9 * c) * 3.0 + r * c * 0.1

    def res(params, data):
        (shift,) = params
        (s,) = data
        return jnp.stack([interp(s[0] + shift[0], s[1] + shift[1]) - s[2]])

    problem = Problem()
    b = problem.add_parameter_block([0.0, 0.0])
    data = np.concatenate([samples, values[:, None]], axis=1)
    problem.add_residual_blocks(
        CostFunction(res, 1, name="bicubic"), None,
        np.full((40, 1), b), (data,),
    )
    summary = ceres_tpu.solve(SolverOptions(max_num_iterations=50), problem)
    print(summary.brief_report())
    print("shift =", problem.parameter_block_value(b), "(truth", shift_true, ")")


if __name__ == "__main__":
    main()
