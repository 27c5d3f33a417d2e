"""NIST StRD nonlinear-regression accuracy harness.

reference: examples/nist.cc — fits the NIST Statistical Reference Datasets
(https://www.itl.nist.gov/div898/strd/nls/nls_main.shtml) and scores LRE
(log relative error) digits against certified parameter values. The .dat
files are not bundled (no egress); point `run_nist` at a directory of them.

The standard model library is implemented fresh in JAX from the published
model equations; each dataset name maps to its model.
"""

from __future__ import annotations

import dataclasses
import os
import re

import jax.numpy as jnp
import numpy as np

from ..autodiff import CostFunction
from ..problem import Problem


# --- model library (published NIST NLS model equations) ------------------- #

def _misra1a(b, x):
    return b[0] * (1.0 - jnp.exp(-b[1] * x))


def _misra1b(b, x):
    return b[0] * (1.0 - 1.0 / (1.0 + b[1] * x / 2.0) ** 2)


def _misra1c(b, x):
    return b[0] * (1.0 - 1.0 / jnp.sqrt(1.0 + 2.0 * b[1] * x))


def _misra1d(b, x):
    return b[0] * b[1] * x / (1.0 + b[1] * x)


def _chwirut(b, x):
    return jnp.exp(-b[0] * x) / (b[1] + b[2] * x)


def _lanczos(b, x):
    return (
        b[0] * jnp.exp(-b[1] * x)
        + b[2] * jnp.exp(-b[3] * x)
        + b[4] * jnp.exp(-b[5] * x)
    )


def _gauss(b, x):
    return (
        b[0] * jnp.exp(-b[1] * x)
        + b[2] * jnp.exp(-((x - b[3]) ** 2) / b[4] ** 2)
        + b[5] * jnp.exp(-((x - b[6]) ** 2) / b[7] ** 2)
    )


def _dan_wood(b, x):
    return b[0] * x ** b[1]


def _rat42(b, x):
    return b[0] / (1.0 + jnp.exp(b[1] - b[2] * x))


def _rat43(b, x):
    return b[0] / (1.0 + jnp.exp(b[1] - b[2] * x)) ** (1.0 / b[3])


def _thurber(b, x):
    num = b[0] + b[1] * x + b[2] * x**2 + b[3] * x**3
    den = 1.0 + b[4] * x + b[5] * x**2 + b[6] * x**3
    return num / den


def _boxbod(b, x):
    return b[0] * (1.0 - jnp.exp(-b[1] * x))


def _mgh09(b, x):
    return b[0] * (x**2 + x * b[1]) / (x**2 + x * b[2] + b[3])


def _mgh10(b, x):
    return b[0] * jnp.exp(b[1] / (x + b[2]))


def _mgh17(b, x):
    return b[0] + b[1] * jnp.exp(-x * b[3]) + b[2] * jnp.exp(-x * b[4])


def _eckerle4(b, x):
    return (b[0] / b[1]) * jnp.exp(-0.5 * ((x - b[2]) / b[1]) ** 2)


def _roszman1(b, x):
    return b[0] - b[1] * x - jnp.arctan(b[2] / (x - b[3])) / jnp.pi


def _enso(b, x):
    pi2 = 2.0 * jnp.pi
    return (
        b[0]
        + b[1] * jnp.cos(pi2 * x / 12.0)
        + b[2] * jnp.sin(pi2 * x / 12.0)
        + b[4] * jnp.cos(pi2 * x / b[3])
        + b[5] * jnp.sin(pi2 * x / b[3])
        + b[7] * jnp.cos(pi2 * x / b[6])
        + b[8] * jnp.sin(pi2 * x / b[6])
    )


def _bennett5(b, x):
    return b[0] * (b[1] + x) ** (-1.0 / b[2])


def _kirby2(b, x):
    return (b[0] + b[1] * x + b[2] * x**2) / (1.0 + b[3] * x + b[4] * x**2)


def _hahn1(b, x):
    num = b[0] + b[1] * x + b[2] * x**2 + b[3] * x**3
    den = 1.0 + b[4] * x + b[5] * x**2 + b[6] * x**3
    return num / den


MODELS = {
    "misra1a": _misra1a,
    "misra1b": _misra1b,
    "misra1c": _misra1c,
    "misra1d": _misra1d,
    "chwirut1": _chwirut,
    "chwirut2": _chwirut,
    "lanczos1": _lanczos,
    "lanczos2": _lanczos,
    "lanczos3": _lanczos,
    "gauss1": _gauss,
    "gauss2": _gauss,
    "gauss3": _gauss,
    "danwood": _dan_wood,
    "rat42": _rat42,
    "rat43": _rat43,
    "thurber": _thurber,
    "boxbod": _boxbod,
    "mgh09": _mgh09,
    "mgh10": _mgh10,
    "mgh17": _mgh17,
    "eckerle4": _eckerle4,
    "roszman1": _roszman1,
    "enso": _enso,
    "bennett5": _bennett5,
    "kirby2": _kirby2,
    "hahn1": _hahn1,
}


@dataclasses.dataclass
class NistDataset:
    name: str
    starts: np.ndarray  # [num_starts, p] starting points
    certified: np.ndarray  # [p] certified parameter values
    certified_cost: float  # residual sum of squares / 2
    data: np.ndarray  # [n, 2] (y, x) as in the file ordering


def parse_nist_dat(path) -> NistDataset:
    """Parse the NIST StRD .dat format (same layout nist.cc consumes)."""
    with open(path, errors="replace") as f:
        lines = f.readlines()
    name = os.path.splitext(os.path.basename(path))[0].lower()

    def find(pattern):
        for i, line in enumerate(lines):
            if re.search(pattern, line):
                return i
        raise ValueError(f"{path}: missing {pattern}")

    # header tells where data/certified values live
    i = find(r"Starting [Vv]alues")
    # parameter lines look like: b1 = start1 start2 certified stddev
    starts1, starts2, certified = [], [], []
    j = i + 2
    while j < len(lines):
        m = re.match(
            r"\s*b\d+\s*=?\s*([-\d.eED+]+)\s+([-\d.eED+]+)\s+([-\d.eED+]+)", lines[j]
        )
        if not m:
            break
        vals = [float(v.replace("D", "E").replace("d", "e")) for v in m.groups()]
        starts1.append(vals[0])
        starts2.append(vals[1])
        certified.append(vals[2])
        j += 1
    i = find(r"Residual Sum of Squares")
    rss = float(
        re.search(r"([-\d.eED+]+)\s*$", lines[i]).group(1).replace("D", "E")
    )
    i = find(r"^Data:|Data\s+1")
    rows = []
    for line in lines[i + 1 :]:
        toks = line.split()
        if len(toks) >= 2:
            try:
                rows.append([float(t) for t in toks[:2]])
            except ValueError:
                continue
    return NistDataset(
        name=name,
        starts=np.stack([np.asarray(starts1), np.asarray(starts2)]),
        certified=np.asarray(certified),
        certified_cost=0.5 * rss,
        data=np.asarray(rows),
    )


def log_relative_error(estimate, truth) -> float:
    """LRE digits (nist.cc ComputeLRE)."""
    err = np.abs(estimate - truth)
    rel = np.where(np.abs(truth) > 0, err / np.abs(truth), err)
    worst = np.max(rel)
    if worst == 0:
        return 11.0
    return float(min(11.0, max(0.0, -np.log10(worst))))


def run_nist(data_dir, options=None, names=None):
    """Fit every recognized dataset in `data_dir`; returns
    {name: (lre_digits, final_cost, certified_cost)}."""
    import ceres_tpu
    from ceres_tpu import SolverOptions

    options = options or SolverOptions(
        max_num_iterations=500,
        function_tolerance=1e-14,
        gradient_tolerance=1e-14,
        parameter_tolerance=1e-14,
        use_nonmonotonic_steps=True,
    )
    results = {}
    for fname in sorted(os.listdir(data_dir)):
        if not fname.lower().endswith(".dat"):
            continue
        name = os.path.splitext(fname)[0].lower()
        if name not in MODELS or (names and name not in names):
            continue
        ds = parse_nist_dat(os.path.join(data_dir, fname))
        model = MODELS[name]
        y = ds.data[:, 0]
        x = ds.data[:, 1]

        def residual(params, data, model=model):
            (b,) = params
            (xy,) = data
            return jnp.stack([xy[0] - model(b, xy[1])])

        best = None
        for start in ds.starts:
            problem = Problem()
            b = problem.add_parameter_block(start)
            ids = np.full((len(y), 1), b)
            problem.add_residual_blocks(
                CostFunction(residual, 1, name=name), None, ids,
                (np.stack([y, x], axis=1),),
            )
            summary = ceres_tpu.solve(options, problem)
            est = problem.parameter_block_value(b)
            lre = log_relative_error(est, ds.certified)
            if best is None or lre > best[0]:
                best = (lre, summary.final_cost, ds.certified_cost)
        results[name] = best
    return results
