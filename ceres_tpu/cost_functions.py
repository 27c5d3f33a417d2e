"""Cost-function adapters and stock cost functions.

reference: normal_prior.h, conditioned_cost_function.h,
cost_function_to_functor.h. In a functional framework most adapters are
trivial function composition — provided here for API parity and
convenience.
"""

from __future__ import annotations

from typing import Callable, Sequence

import jax.numpy as jnp
import numpy as np

from .autodiff import CostFunction


def normal_prior(a, b) -> CostFunction:
    """residual = A (x - b): Mahalanobis prior with stiffness matrix A.

    reference: normal_prior.h (A need not be square; r = A(x - b)).
    """
    a = jnp.asarray(np.asarray(a, dtype=np.float64))
    b = jnp.asarray(np.asarray(b, dtype=np.float64))
    if a.ndim != 2 or a.shape[1] != b.shape[0]:
        raise ValueError("A must be [k, n] and b [n]")

    def fn(params, data):
        (x,) = params
        return a @ (x - b)

    return CostFunction(fn, int(a.shape[0]), name="normal_prior")


def conditioned_cost_function(
    wrapped: CostFunction, conditioners: Sequence[Callable]
) -> CostFunction:
    """Apply per-residual scalar conditioner functions c_i to the wrapped
    residuals: r_i' = c_i(r_i). reference: conditioned_cost_function.h.

    Each conditioner is a scalar JAX function (or None for identity).
    """
    if len(conditioners) != wrapped.num_residuals:
        raise ValueError("need one conditioner per residual")

    def fn(params, data):
        r = wrapped.fn(params, data)
        outs = [
            r[i] if c is None else c(r[i]) for i, c in enumerate(conditioners)
        ]
        return jnp.stack(outs)

    return CostFunction(fn, wrapped.num_residuals, name=f"conditioned_{wrapped.name}")


def cost_function_to_functor(cost: CostFunction) -> Callable:
    """Use an existing CostFunction inside another functor
    (reference: cost_function_to_functor.h). In JAX this is just calling it;
    provided for API parity."""

    def functor(params, data=()):
        return cost.fn(tuple(params), data)

    return functor


def scaled_cost_function(wrapped: CostFunction, s: float) -> CostFunction:
    """Multiply residuals by a constant scale."""

    def fn(params, data):
        return s * wrapped.fn(params, data)

    return CostFunction(fn, wrapped.num_residuals, name=f"scaled_{wrapped.name}")
