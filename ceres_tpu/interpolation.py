"""Cubic & bicubic interpolation of gridded data, differentiable in JAX.

reference: include/ceres/cubic_interpolation.h (CubicHermiteSpline,
Grid1D/Grid2D, CubicInterpolator, BiCubicInterpolator) — used by the
sampled_function and bicubic_interpolation examples and by user cost
functions interpolating image/sampled data. The JAX version is
differentiable end-to-end (jax.grad through the spline replaces the
hand-coded derivative outputs) and vmaps over query batches.

Catmull-Rom spline, matching the reference's CubicHermiteSpline
coefficients.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def cubic_hermite(p0, p1, p2, p3, x):
    """Catmull-Rom interpolation on [0,1] given 4 support points
    (cubic_interpolation.h:63-89)."""
    a = 0.5 * (-p0 + 3.0 * p1 - 3.0 * p2 + p3)
    b = 0.5 * (2.0 * p0 - 5.0 * p1 + 4.0 * p2 - p3)
    c = 0.5 * (-p0 + p2)
    d = p1
    return d + x * (c + x * (b + x * a))


class CubicInterpolator:
    """1-D interpolation of uniformly sampled values [n] or [n, k].

    reference: CubicInterpolator<Grid1D> (cubic_interpolation.h:120-180).
    Out-of-range queries clamp to the edge (same as Grid1D).
    """

    def __init__(self, values):
        self.values = jnp.asarray(values)
        self.n = self.values.shape[0]

    def __call__(self, x):
        xi = jnp.floor(x)
        frac = x - xi
        i = xi.astype(jnp.int32)

        def sample(j):
            return self.values[jnp.clip(j, 0, self.n - 1)]

        return cubic_hermite(sample(i - 1), sample(i), sample(i + 1), sample(i + 2), frac)

    def evaluate_with_derivative(self, x):
        f, df = jax.value_and_grad(lambda q: jnp.sum(self(q)))(x)
        return self(x), df


class BiCubicInterpolator:
    """2-D interpolation of values [rows, cols] or [rows, cols, k].

    reference: BiCubicInterpolator<Grid2D> (cubic_interpolation.h:300-423):
    row-major grid, query (r, c), edge clamping.
    """

    def __init__(self, values):
        self.values = jnp.asarray(values)
        self.rows = self.values.shape[0]
        self.cols = self.values.shape[1]

    def __call__(self, r, c):
        ri = jnp.floor(r)
        ci = jnp.floor(c)
        fr = r - ri
        fc = c - ci
        i = ri.astype(jnp.int32)
        j = ci.astype(jnp.int32)

        def sample(dr, dc):
            rr = jnp.clip(i + dr, 0, self.rows - 1)
            cc = jnp.clip(j + dc, 0, self.cols - 1)
            return self.values[rr, cc]

        rows = [
            cubic_hermite(
                sample(dr, -1), sample(dr, 0), sample(dr, 1), sample(dr, 2), fc
            )
            for dr in (-1, 0, 1, 2)
        ]
        return cubic_hermite(rows[0], rows[1], rows[2], rows[3], fr)
