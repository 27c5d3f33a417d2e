"""Fields-of-Experts image denoising + sampled-function interpolation
examples.

reference: examples/denoising.cc + fields_of_experts.cc (FoE MRF prior over
image cliques with robust potentials) and examples/sampled_function/ +
bicubic interpolation examples. The reference ships trained FoE filter
files (data/*.foe); those are not bundled here, so `simple_foe_filters`
provides derivative-style filters demonstrating the same machinery — user
code can load trained filters into the same builder.
"""

from __future__ import annotations

import jax.numpy as jnp
import numpy as np

from ..autodiff import CostFunction
from ..interpolation import CubicInterpolator
from ..loss import CauchyLoss
from ..problem import Problem


def simple_foe_filters():
    """3x3 derivative-like clique filters (stand-in for trained FoE)."""
    fx = np.array([[0, 0, 0], [-1, 1, 0], [0, 0, 0]], dtype=np.float64)
    fy = fx.T.copy()
    lap = np.array([[0, -1, 0], [-1, 4, -1], [0, -1, 0]], dtype=np.float64) / 4.0
    return [fx, fy, lap]


def build_denoising_problem(noisy: np.ndarray, filters=None, data_weight=1.0,
                            prior_weight=0.2):
    """min sum_p w_d (x_p - y_p)^2 + w_p sum_f rho((F_f * x)_p)

    Each pixel is one parameter block; each filter application at each
    valid location is one residual block over its 3x3 clique — the same
    clique structure as fields_of_experts.cc, batched into one signature
    group per filter.
    """
    filters = filters if filters is not None else simple_foe_filters()
    h, w = noisy.shape
    problem = Problem()
    px = problem.add_parameter_blocks(noisy.reshape(-1, 1))
    pix_id = np.arange(h * w).reshape(h, w)

    # data term: one residual per pixel
    def data_res(params, data):
        (x,) = params
        (y,) = data
        return jnp.sqrt(data_weight) * (x - y)

    problem.add_residual_blocks(
        CostFunction(data_res, 1, name="denoise_data"),
        None,
        px.reshape(-1, 1),
        (noisy.reshape(-1, 1),),
    )

    # FoE clique terms: one group per filter
    for fi, filt in enumerate(filters):
        taps = [(dy, dx, filt[dy, dx]) for dy in range(3) for dx in range(3)
                if filt[dy, dx] != 0.0]
        coeffs = np.array([c for _, _, c in taps])
        ids = np.stack(
            [
                pix_id[dy : h - 2 + dy, dx : w - 2 + dx].reshape(-1)
                for dy, dx, _ in taps
            ],
            axis=1,
        )

        def clique_res(params, data, coeffs=jnp.asarray(coeffs)):
            vals = jnp.stack([p[0] for p in params])
            return jnp.sqrt(prior_weight) * jnp.stack([jnp.dot(coeffs, vals)])

        problem.add_residual_blocks(
            CostFunction(clique_res, 1, name=f"foe_{fi}"),
            CauchyLoss(0.3),
            px[ids.reshape(-1)].reshape(ids.shape),
            (),
        )
    return problem, px


def build_sampled_function_problem(samples: np.ndarray, x0: float = 1.0):
    """Minimize an interpolated 1-D sampled function
    (examples/sampled_function/sampled_function.cc): the cost functor reads
    the function value through a differentiable cubic interpolator."""
    interp = CubicInterpolator(samples)

    def res(params, data):
        (x,) = params
        return jnp.stack([interp(x[0])])

    problem = Problem()
    b = problem.add_parameter_block([x0])
    problem.add_residual_block(CostFunction(res, 1, name="sampled"), None, [b])
    return problem, b
