"""Fields-of-Experts image denoising + sampled-function interpolation
examples.

reference: examples/denoising.cc + fields_of_experts.cc (FoE MRF prior over
image cliques with robust potentials) and examples/sampled_function/ +
bicubic interpolation examples. The reference ships Stefan Roth's trained
FoE filter files (data/{2x2,3x3,5x5}.foe, loader fields_of_experts.cc:89-131)
and a noisy test image (data/ceres_noisy.pgm); `load_foe_file`/`load_pgm`
read those directly, `build_foe_denoising_problem` mirrors the reference's
CreateProblem, and `simple_foe_filters` remains for synthetic smoke tests.
"""

from __future__ import annotations

import dataclasses
import re

import jax.numpy as jnp
import numpy as np

from ..autodiff import CostFunction
from ..interpolation import CubicInterpolator
from ..loss import CauchyLoss, LossFunction
from ..problem import Problem


def simple_foe_filters():
    """3x3 derivative-like clique filters (stand-in for trained FoE)."""
    fx = np.array([[0, 0, 0], [-1, 1, 0], [0, 0, 0]], dtype=np.float64)
    fy = fx.T.copy()
    lap = np.array([[0, -1, 0], [-1, 4, -1], [0, -1, 0]], dtype=np.float64) / 4.0
    return [fx, fy, lap]


@dataclasses.dataclass
class FoEModel:
    """Trained Fields-of-Experts prior (fields_of_experts.h:89-135)."""

    size: int                 # clique side length
    x_deltas: np.ndarray      # [size*size] x offset of each clique variable
    y_deltas: np.ndarray      # [size*size] y offset
    alphas: np.ndarray        # [K] per-filter loss weights
    filters: np.ndarray       # [K, size*size] linear filter taps


def load_foe_file(path) -> FoEModel:
    """ASCII .foe reader (format: fields_of_experts.cc LoadFromFile:89-131 —
    `size K`, then x-deltas, y-deltas, alphas, and K filter rows)."""
    with open(path) as f:
        tokens = f.read().split()
    size, k = int(tokens[0]), int(tokens[1])
    nv = size * size
    vals = np.asarray(tokens[2:], dtype=np.float64)
    expected = 2 * nv + k + k * nv
    if vals.size != expected:
        raise ValueError(
            f"{path}: expected {expected} values for size={size} K={k}, "
            f"got {vals.size}"
        )
    x_deltas = vals[:nv].astype(int)
    y_deltas = vals[nv:2 * nv].astype(int)
    alphas = vals[2 * nv:2 * nv + k]
    filters = vals[2 * nv + k:].reshape(k, nv)
    return FoEModel(size, x_deltas, y_deltas, alphas, filters)


def load_pgm(path) -> np.ndarray:
    """P2/P5 PGM reader (role of examples/pgm_image.h). Returns float64
    [h, w] in [0, maxval]."""
    with open(path, "rb") as f:
        buf = f.read()
    # strip comments
    header = []
    pos = 0
    while len(header) < 4:
        m = re.match(rb"\s*(#[^\n]*\n|\S+)", buf[pos:])
        if m is None:
            raise ValueError(f"{path}: truncated PGM header")
        pos += m.end()
        tok = m.group(1)
        if not tok.startswith(b"#"):
            header.append(tok)
    magic, w, h, maxval = header[0], int(header[1]), int(header[2]), int(header[3])
    if magic == b"P5":
        dtype = np.dtype(">u2") if maxval > 255 else np.dtype(np.uint8)
        # binary data begins exactly one whitespace char after maxval
        img = np.frombuffer(buf, dtype=dtype, count=w * h, offset=pos + 1)
    elif magic == b"P2":
        img = np.asarray(buf[pos:].split()[: w * h], dtype=np.float64)
    else:
        raise ValueError(f"{path}: not a PGM file (magic {magic!r})")
    return np.asarray(img, dtype=np.float64).reshape(h, w)


def save_pgm(path, img: np.ndarray, maxval: int = 255) -> None:
    """P2 (ASCII) PGM writer, clamping to [0, maxval] like the reference's
    PGMImage<double>::WriteToFile."""
    img = np.clip(np.round(np.asarray(img)), 0, maxval).astype(int)
    h, w = img.shape
    lines = [f"P2\n{w} {h}\n{maxval}\n"]
    lines += [" ".join(str(v) for v in row) + "\n" for row in img]
    with open(path, "w") as f:
        f.writelines(lines)


@dataclasses.dataclass(frozen=True)
class FieldsOfExpertsLoss(LossFunction):
    """rho(s) = alpha log(1 + s/2) (fields_of_experts.cc:77-85)."""

    alpha: float

    def rho(self, s):
        c = 0.5
        total = 1.0 + s * c
        inv = 1.0 / total
        return (
            self.alpha * jnp.log(total),
            self.alpha * c * inv,
            -self.alpha * c * c * inv * inv,
        )


def build_foe_denoising_problem(noisy: np.ndarray, foe: FoEModel,
                                sigma: float = 20.0):
    """Reference CreateProblem (denoising.cc:133-176): per-pixel quadratic
    data term sqrt(1/(2 sigma^2)) (x - y), plus, for every clique position
    and every filter k, a linear residual filter_k . patch under
    FieldsOfExpertsLoss(alpha_k).

    Returns (problem, pixel_block_ids [h*w]).
    """
    h, w = noisy.shape
    problem = Problem()
    px = problem.add_parameter_blocks(noisy.reshape(-1, 1))
    pix_id = np.arange(h * w).reshape(h, w)

    coeff = np.sqrt(1.0 / (2.0 * sigma * sigma))

    def data_res(params, data):
        (x,) = params
        (y,) = data
        return coeff * (x - y)

    problem.add_residual_blocks(
        CostFunction(data_res, 1, name="foe_data"),
        None,
        px.reshape(-1, 1),
        (noisy.reshape(-1, 1),),
    )

    # clique index table: rows = positions, cols = clique variables
    span = foe.size - 1
    ids = np.stack(
        [
            pix_id[dy : h - span + dy, dx : w - span + dx].reshape(-1)
            for dx, dy in zip(foe.x_deltas, foe.y_deltas)
        ],
        axis=1,
    )

    for k in range(foe.filters.shape[0]):
        taps = jnp.asarray(foe.filters[k])

        def foe_res(params, data, taps=taps):
            vals = jnp.stack([p[0] for p in params])
            return jnp.stack([jnp.dot(taps, vals)])

        problem.add_residual_blocks(
            CostFunction(foe_res, 1, name=f"foe_filter_{k}"),
            FieldsOfExpertsLoss(float(foe.alphas[k])),
            px[ids.reshape(-1)].reshape(ids.shape),
            (),
        )
    return problem, px


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
