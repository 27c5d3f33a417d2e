"""Classic Moré–Garbow–Hillstrom unconstrained test problems.

reference: examples/more_garbow_hillstrom.cc (35 problems). The functions
below implement the standard published formulas ("Testing Unconstrained
Optimization Software", TOMS 7(1), 1981) fresh in JAX — a representative
set spanning the difficulty range, each with its certified start point and
global minimum for system testing.
"""

from __future__ import annotations

import dataclasses
from typing import Callable, Optional

import jax.numpy as jnp
import numpy as np

from ..autodiff import CostFunction
from ..problem import Problem


@dataclasses.dataclass
class TestProblem:
    name: str
    residual_fn: Callable  # (params, data) -> residuals
    num_residuals: int
    x0: np.ndarray
    f_min: float  # certified minimal 0.5*|r|^2... stored as sum-of-squares/2
    x_min: Optional[np.ndarray] = None  # a known minimizer (if unique)

    def build(self) -> tuple:
        p = Problem()
        b = p.add_parameter_block(self.x0)
        p.add_residual_block(
            CostFunction(self.residual_fn, self.num_residuals, name=self.name),
            None,
            [b],
        )
        return p, b


def _rosenbrock(params, data):
    (x,) = params
    return jnp.stack([10.0 * (x[1] - x[0] ** 2), 1.0 - x[0]])


def _freudenstein_roth(params, data):
    (x,) = params
    return jnp.stack(
        [
            -13.0 + x[0] + ((5.0 - x[1]) * x[1] - 2.0) * x[1],
            -29.0 + x[0] + ((x[1] + 1.0) * x[1] - 14.0) * x[1],
        ]
    )


def _powell_badly_scaled(params, data):
    (x,) = params
    return jnp.stack([1e4 * x[0] * x[1] - 1.0, jnp.exp(-x[0]) + jnp.exp(-x[1]) - 1.0001])


def _brown_badly_scaled(params, data):
    (x,) = params
    return jnp.stack([x[0] - 1e6, x[1] - 2e-6, x[0] * x[1] - 2.0])


def _beale(params, data):
    (x,) = params
    return jnp.stack(
        [
            1.5 - x[0] * (1.0 - x[1]),
            2.25 - x[0] * (1.0 - x[1] ** 2),
            2.625 - x[0] * (1.0 - x[1] ** 3),
        ]
    )


def _helical_valley(params, data):
    (x,) = params
    theta = jnp.arctan2(x[1], x[0]) / (2.0 * jnp.pi)
    return jnp.stack(
        [
            10.0 * (x[2] - 10.0 * theta),
            10.0 * (jnp.sqrt(x[0] ** 2 + x[1] ** 2) - 1.0),
            x[2],
        ]
    )


def _bard(params, data):
    (x,) = params
    y = jnp.asarray(
        [0.14, 0.18, 0.22, 0.25, 0.29, 0.32, 0.35, 0.39,
         0.37, 0.58, 0.73, 0.96, 1.34, 2.10, 4.39]
    )
    u = jnp.arange(1.0, 16.0)
    v = 16.0 - u
    w = jnp.minimum(u, v)
    return y - (x[0] + u / (x[1] * v + x[2] * w))


def _gaussian(params, data):
    (x,) = params
    y = jnp.asarray(
        [0.0009, 0.0044, 0.0175, 0.0540, 0.1295, 0.2420, 0.3521, 0.3989,
         0.3521, 0.2420, 0.1295, 0.0540, 0.0175, 0.0044, 0.0009]
    )
    t = (8.0 - jnp.arange(1.0, 16.0)) / 2.0
    return x[0] * jnp.exp(-0.5 * x[1] * (t - x[2]) ** 2) - y


def _box_3d(params, data):
    (x,) = params
    t = 0.1 * jnp.arange(1.0, 11.0)
    return (
        jnp.exp(-t * x[0])
        - jnp.exp(-t * x[1])
        - x[2] * (jnp.exp(-t) - jnp.exp(-10.0 * t))
    )


def _wood(params, data):
    (x,) = params
    return jnp.stack(
        [
            10.0 * (x[1] - x[0] ** 2),
            1.0 - x[0],
            jnp.sqrt(90.0) * (x[3] - x[2] ** 2),
            1.0 - x[2],
            jnp.sqrt(10.0) * (x[1] + x[3] - 2.0),
            (x[1] - x[3]) / jnp.sqrt(10.0),
        ]
    )


def _brown_dennis(params, data):
    (x,) = params
    t = jnp.arange(1.0, 21.0) / 5.0
    a = x[0] + t * x[1] - jnp.exp(t)
    b = x[2] + x[3] * jnp.sin(t) - jnp.cos(t)
    return a * a + b * b


PROBLEMS = [
    TestProblem("rosenbrock", _rosenbrock, 2, np.array([-1.2, 1.0]), 0.0,
                np.array([1.0, 1.0])),
    TestProblem("freudenstein_roth", _freudenstein_roth, 2,
                np.array([0.5, -2.0]), 0.0, np.array([5.0, 4.0])),
    TestProblem("powell_badly_scaled", _powell_badly_scaled, 2,
                np.array([0.0, 1.0]), 0.0),
    TestProblem("brown_badly_scaled", _brown_badly_scaled, 3,
                np.array([1.0, 1.0]), 0.0, np.array([1e6, 2e-6])),
    TestProblem("beale", _beale, 3, np.array([1.0, 1.0]), 0.0,
                np.array([3.0, 0.5])),
    TestProblem("helical_valley", _helical_valley, 3,
                np.array([-1.0, 0.0, 0.0]), 0.0, np.array([1.0, 0.0, 0.0])),
    TestProblem("bard", _bard, 15, np.array([1.0, 1.0, 1.0]),
                0.5 * 8.21487e-3),
    TestProblem("gaussian", _gaussian, 15, np.array([0.4, 1.0, 0.0]),
                0.5 * 1.12793e-8),
    TestProblem("box_3d", _box_3d, 10, np.array([0.0, 10.0, 20.0]), 0.0),
    TestProblem("wood", _wood, 6, np.array([-3.0, -1.0, -3.0, -1.0]), 0.0,
                np.array([1.0, 1.0, 1.0, 1.0])),
    TestProblem("brown_dennis", _brown_dennis, 20,
                np.array([25.0, 5.0, -5.0, -1.0]), 0.5 * 85822.2),
]
