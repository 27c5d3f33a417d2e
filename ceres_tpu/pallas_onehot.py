"""Fused one-hot gather/reduce Pallas kernels for the Jacobian products.

The implicit-Schur PCG matvec spends its time in the camera half of
S·y — the F·y gather-contract and the Fᵀ·u contract-reduce over the
"onehot"-plan positions of jacobian.py (reference:
partitioned_matrix_view_impl.h RightMultiplyAndAccumulateF /
LeftMultiplyAndAccumulateF; implicit_schur_complement.cc:118-165).
The XLA one-hot formulation is algebraically right but materializes the
two-level [t*B, n] one-hot intermediates in HBM (~2.8 GB round trip per
PCG iteration at BAL-1778 scale — measured 15.5 ms of the 16.2 ms
s_apply). These kernels run the identical math with every intermediate
VMEM-resident: per lane-chunk, generate the one-hot planes on the VPU,
contract on the MXU, and stream only the [r*t, n] Jacobian leaf and the
[r, n] lane vectors through HBM.

Measured (v5e, 5M lanes, 1778 cameras, r=2, t=9): gather-contract
1.48 ms f32 / 1.20 ms bf16; contract-reduce 1.47 ms f32 / 1.27 ms bf16 —
vs 15.5 ms for the XLA pair, with the f32 gather bit-exact
(Precision.HIGHEST decomposition on the MXU; the bf16-plane-split
alternative is defeated by XLA's excess-precision convert folding) and
the f32 reduce exact per element (one-hot weights are exact; only the
deterministic A-dimension accumulation order differs from segment_sum).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from .utils.flags import env_flag

# Two-level one-hot base — MUST match jacobian.ONEHOT_LO so table layouts
# and dump-row routing agree with the XLA fallback path.
B = 8


def _int_planes(x, nplanes=3):
    """Split f32 -> bf16 planes via integer mantissa truncation.

    Truncating to the top 16 bits is exactly bf16 round-toward-zero, so
    each plane is bf16-representable, the residuals are exact f32
    subtractions, and three planes (7+1 significand bits each, with the
    residual renormalizing) reconstruct any f32 EXACTLY. Products against
    one-hot (0/1, bf16-exact) operands on the MXU with an f32 accumulator
    are then bit-exact at 3 bf16 passes — half the cost of
    Precision.HIGHEST (measured 7.7 -> 3.2 ms per chained F-product at 5M
    lanes). The floating-point plane split (astype round trips) does NOT
    work: XLA's excess-precision pass folds f32->bf16->f32 converts away;
    integer masking is opaque to it.
    """
    out = []
    r = x
    for _ in range(nplanes):
        hi = jax.lax.bitcast_convert_type(r, jnp.uint32) & jnp.uint32(
            0xFFFF0000
        )
        p = jax.lax.bitcast_convert_type(hi, jnp.float32)
        out.append(p.astype(jnp.bfloat16))
        r = r - p
    return out


def enabled() -> bool:
    """Kernels engage on real TPU (or under CERES_TPU_PALLAS=interpret),
    unless CERES_TPU_NO_ONEHOT_KERNEL opts out."""
    if env_flag("CERES_TPU_NO_ONEHOT_KERNEL"):
        return False
    from .pallas_eval import pallas_enabled

    return pallas_enabled()


def _interpret():
    from .pallas_eval import _interpret_mode

    return _interpret_mode()


# Minimum lane count: below this the XLA path is already sub-100µs and
# kernel launch overhead dominates.
MIN_LANES = 65_536


def _chunk_for(A: int) -> int:
    """Lane-chunk size: largest power-of-two C with the [A, C] one-hot
    block under ~4 MB of VMEM (A grows with the class count — 223 at
    BAL-1778's cameras, 1711 at BAL-13682's)."""
    for c in (4096, 2048, 1024, 512, 256):
        if A * c * 4 <= 4 * 1024 * 1024:
            return c
    return 128


def _pack_table(table_t, A):
    """[t, ncols] -> [t*B, A] with row t_i*B + b holding column a*B + b
    (zero-padded past ncols, so dump/pad rows gather zeros)."""
    t, ncols = table_t.shape
    tbl = jnp.pad(table_t, ((0, 0), (0, A * B - ncols)))
    return jnp.transpose(tbl.reshape(t, A, B), (0, 2, 1)).reshape(t * B, A)


def _unpack_table(packed, t, A, ncols):
    """Inverse of _pack_table for the reduce output."""
    return jnp.transpose(packed.reshape(t, B, A), (0, 2, 1)).reshape(
        t, A * B
    )[:, :ncols]


def _gather_contract_kernel(rows_ref, jac_ref, tbl_ref, out_ref):
    """out[r, l] = sum_t jac[r*t + t, l] * table[t, rows[l]]."""
    C = jac_ref.shape[1]
    tB, A = tbl_ref.shape
    t = tB // B
    r = out_ref.shape[0]
    rows = rows_ref[0, :]
    hi = rows // B
    lo = rows % B
    f32 = tbl_ref.dtype == jnp.float32
    iota_a = jax.lax.broadcasted_iota(jnp.int32, (A, C), 0)
    oh_hi = (iota_a == hi[None, :]).astype(jnp.bfloat16)
    # f32: exact 3-plane split (gathered VALUES must be bit-exact — the
    # jacobian._onehot_precision rule, enforced in-kernel); bf16 leaves
    # are a single native pass.
    planes = _int_planes(tbl_ref[:]) if f32 else [tbl_ref[:]]
    tmp = jnp.zeros((tB, C), jnp.float32)
    for p in planes:
        tmp = tmp + jax.lax.dot_general(
            p,
            oh_hi,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (B, C), 0)
    oh_lo = (iota_b == lo[None, :]).astype(jnp.float32)
    ylane = (tmp.reshape(t, B, C) * oh_lo[None]).sum(axis=1)  # [t, C]
    jac3 = jac_ref[:].astype(jnp.float32).reshape(r, t, C)
    out_ref[:] = (jac3 * ylane[None]).sum(axis=1)


def _contract_reduce_kernel(rows_ref, jac_ref, u_ref, out_ref, *, n, r, t):
    """out[t*B + b, a] += sum_{l in chunk, rows[l] = a*B + b}
                           sum_r jac[r*t + t, l] * u[r, l]."""
    from jax.experimental import pallas as pl

    C = jac_ref.shape[1]
    tB, A = out_ref.shape
    i = pl.program_id(0)
    rows = rows_ref[0, :]
    hi = rows // B
    lo = rows % B
    f32 = jac_ref.dtype == jnp.float32
    jac3 = jac_ref[:].reshape(r, t, C)
    if f32:
        contrib = (jac3 * u_ref[:][:, None, :]).sum(axis=0)  # [t, C]
    else:
        # bf16 leaves: products at leaf precision (parity with the XLA
        # path), f32 accumulation on the MXU below
        contrib = (jac3 * u_ref[:].astype(jac3.dtype)[:, None, :]).sum(
            axis=0
        )
    # tail chunk: lanes past n carry unspecified pad values — zero them so
    # they cannot contaminate the matmul (0 * one_hot == 0 everywhere).
    # The mask is generated at contrib's full shape: Mosaic cannot
    # relayout a broadcast i1 vector (measured failure on bf16 leaves).
    lane2 = i * C + jax.lax.broadcasted_iota(jnp.int32, contrib.shape, 1)
    contrib = jnp.where(lane2 < n, contrib, jnp.zeros((), contrib.dtype))
    iota_b = jax.lax.broadcasted_iota(jnp.int32, (B, C), 0)
    oh_lo = (iota_b == lo[None, :]).astype(contrib.dtype)
    ctmp = (contrib[:, None, :] * oh_lo[None]).reshape(t * B, C)
    iota_a = jax.lax.broadcasted_iota(jnp.int32, (A, C), 0)
    oh_hi = (iota_a == hi[None, :]).astype(jnp.bfloat16)
    # f32: exact 3-plane split — BETTER than the XLA path's HIGH reduce
    # (6.3e-6 element error) at the same 3-pass MXU cost.
    planes = _int_planes(ctmp) if f32 else [ctmp]
    part = jnp.zeros((tB, A), jnp.float32)
    for p in planes:
        part = part + jax.lax.dot_general(
            p,
            oh_hi,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )

    @pl.when(i == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += part


def gather_contract(jac, rows, table_t, r):
    """Fused table-gather + position contraction: [r, n] from jac [r*t, n],
    rows [n], table_t [t, ncols].

    Equivalent to gather_T_t(onehot) followed by the per-position
    (jac3 * vg).sum(1) — without the HBM-materialized [t*B, n]
    intermediates. Output is f32 (the accumulation dtype); pad lanes (past
    n) and dump rows (>= real count) behave like the XLA path: dump rows
    gather the zero-padded table columns.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rt, n = jac.shape
    t = rt // r
    ncols = table_t.shape[1]
    A = -(-ncols // B)
    tbl3 = _pack_table(table_t, A).astype(jac.dtype)
    C = _chunk_for(A)
    G = -(-n // C)
    out = pl.pallas_call(
        _gather_contract_kernel,
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, C), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, C), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec(
                (t * B, A), lambda i: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (r, C), lambda i: (0, i), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((r, G * C), jnp.float32),
        interpret=_interpret(),
    )(rows.reshape(1, n), jac, tbl3)
    return out[:, :n]


def contract_reduce(jac, rows, u, ncols, r):
    """Fused residual contraction + one-hot segment-reduce:
    [t, ncols] table from jac [r*t, n], rows [n], u [r, n].

    Equivalent to reduce_T(onehot) of (jac3 * u).sum(0) — all
    intermediates VMEM-resident, f32 accumulation across chunks in the
    kernel output block (sequential TPU grid). Deterministic.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    rt, n = jac.shape
    t = rt // r
    A = -(-ncols // B)
    C = _chunk_for(A)
    G = -(-n // C)
    out = pl.pallas_call(
        functools.partial(_contract_reduce_kernel, n=n, r=r, t=t),
        grid=(G,),
        in_specs=[
            pl.BlockSpec((1, C), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((rt, C), lambda i: (0, i), memory_space=pltpu.VMEM),
            pl.BlockSpec((r, C), lambda i: (0, i), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (t * B, A), lambda i: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((t * B, A), jnp.float32),
        interpret=_interpret(),
    )(rows.reshape(1, n), jac, u)
    return _unpack_table(out, t, A, ncols)
