"""Precision policy helpers.

The reference runs fp64 end to end (Eigen doubles; CUDA kernels in double,
reference: include/ceres/jet.h). On TPU f64 is emulated and slow, so the
framework is dtype-parametric: float64 when `jax_enable_x64` is active (the
correctness baseline, used by the CPU test suite), float32 otherwise (the fast
TPU path, with f64-sensitive scalar reductions promoted explicitly where it
matters — see evaluator cost accumulation).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def x64_enabled() -> bool:
    return bool(jax.config.jax_enable_x64)


def default_dtype():
    """Solver working dtype: f64 under x64, else f32."""
    return jnp.float64 if x64_enabled() else jnp.float32


def accum_dtype():
    """Dtype for cost/norm accumulation (promoted where hardware allows)."""
    return jnp.float64 if x64_enabled() else jnp.float32


def finfo_eps(dtype=None) -> float:
    return float(np.finfo(np.dtype(dtype or default_dtype())).eps)


def tiny(dtype=None) -> float:
    return float(np.finfo(np.dtype(dtype or default_dtype())).tiny)
