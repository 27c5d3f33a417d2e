"""Fused Pallas TPU kernel for signature-group evaluation.

TPU-native replacement for the reference's EvaluateKernel
(include/ceres/internal/cuda_evaluator_kernel.h:301-422): one fused kernel
computes residuals, Jacobians, robust-loss correction, and the cost partial
for a whole signature group, streaming lane blocks HBM->VMEM. Where the
reference assigns one CUDA thread per residual block, here one grid step
processes a C-lane block with every op in the transposed SoA layout
([small, C], lane axis minor) so the VPU runs at full lane utilization and
the Jacobian is written directly in its final [r*t, n] layout.

Why a kernel at all: the XLA path (evaluator._group_eval_range) evaluates
`jax.linearize` + per-tangent pushforwards as separate fusions whose
linearization residuals round-trip through HBM once per tangent dimension —
measured 43 ms/eval at BAL-1778 scale (5M observations) on v5e. This kernel
keeps all linearization state in VMEM: 21 ms/eval measured, and the values
are *closer to f64 ground truth* than the XLA fusion output (5.5e-6 vs
2.3e-3 max relative error — XLA's fast-math rewrites cost real precision).

How user cost functors become kernel code: the functor is traced ONCE at
scalar level (`jax.linearize` over [size]-shaped params — the moral
equivalent of the reference instantiating Jet<double, N> autodiff per
functor type, jet.h / autodiff.h:318), then the resulting jaxpr is
re-emitted by a lane-extending interpreter that appends a trailing lane
axis of size C to every value. dot_generals expand to transpose+mul+sum
(contractions are tiny), bools ride as int32 through shape ops (Mosaic
cannot relayout 1-bit vectors), and any primitive the interpreter does not
support simply disqualifies the group — the evaluator falls back to the XLA
path (decided per group at trace time, never an error).
"""

from __future__ import annotations

import os

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LANE_BLOCK = 2048  # measured best on v5e (VMEM live-set bound)
_VMEM_LIMIT = 100 * 1024 * 1024

_CALL_PRIMS = (
    "pjit",
    "jit",
    "closed_call",
    "core_call",
    "custom_jvp_call",
    "custom_vjp_call",
    "custom_jvp_call_jaxpr",
    "remat",
    "checkpoint",
)


class _LaneVal:
    __slots__ = ("val", "lane")

    def __init__(self, val, lane):
        self.val = val
        self.lane = lane  # True when val carries the trailing lane axis


def _promote(lv, shape, C):
    """Broadcast a lane-less value onto the leading dims of shape + (C,)."""
    if lv.lane:
        return lv.val
    v = jnp.asarray(lv.val)
    return jax.lax.broadcast_in_dim(v, tuple(shape) + (C,), tuple(range(v.ndim)))


def _expand_dot_lane(lhs, rhs, dimension_numbers):
    """dot_general on lane-carrying operands -> transpose + mul + sum.

    Contractions in cost functors are tiny (3-vectors, quaternions); the MXU
    has nothing to win and Mosaic cannot lower lane-batched dots, so expand
    to VPU ops with the lane axis untouched (stays minor).
    """
    (lc, rc), (lb, rb) = dimension_numbers
    nl = lhs.ndim - 1
    nr = rhs.ndim - 1
    l_free = [d for d in range(nl) if d not in lc and d not in lb]
    r_free = [d for d in range(nr) if d not in rc and d not in rb]
    lt = jnp.transpose(lhs, list(lb) + l_free + list(lc) + [nl])
    rt = jnp.transpose(rhs, list(rb) + r_free + list(rc) + [nr])
    nb, nlf, nrf, nc = len(lb), len(l_free), len(r_free), len(lc)
    lt = jnp.expand_dims(lt, axis=tuple(range(nb + nlf, nb + nlf + nrf)))
    rt = jnp.expand_dims(rt, axis=tuple(range(nb, nb + nlf)))
    prod = lt * rt
    return jnp.sum(prod, axis=tuple(range(nb + nlf + nrf, nb + nlf + nrf + nc)))


def lane_eval(jaxpr, consts, args, C):
    """Evaluate a scalar-level jaxpr with a trailing lane axis of size C
    appended to every value. consts/args: lists of _LaneVal.

    Raises NotImplementedError on primitives with no lane rule (gather,
    scatter, control flow, ...) — callers treat that as "group not
    kernel-eligible".
    """
    env = {}

    def read(v):
        if isinstance(v, jax.extend.core.Literal):
            return _LaneVal(v.val, False)
        return env[v]

    def write(v, lv):
        env[v] = lv

    for v, c in zip(jaxpr.constvars, consts):
        write(v, c)
    for v, a in zip(jaxpr.invars, args):
        write(v, a)

    for eqn in jaxpr.eqns:
        name = eqn.primitive.name
        ins = [read(v) for v in eqn.invars]
        any_lane = any(i.lane for i in ins)
        out_aval = eqn.outvars[0].aval if eqn.outvars else None

        if name in _CALL_PRIMS:
            if "jaxpr" in eqn.params:
                cj = eqn.params["jaxpr"]
                sub_jaxpr, sub_consts = cj.jaxpr, cj.consts
            elif "call_jaxpr" in eqn.params:
                cj = eqn.params["call_jaxpr"]
                if hasattr(cj, "jaxpr"):
                    sub_jaxpr, sub_consts = cj.jaxpr, cj.consts
                else:
                    sub_jaxpr, sub_consts = cj, ()
            else:
                raise NotImplementedError(f"call prim {name} without jaxpr")
            outs = lane_eval(
                sub_jaxpr, [_LaneVal(c, False) for c in sub_consts], ins, C
            )
            for v, o in zip(eqn.outvars, outs):
                write(v, o)
            continue

        if not any_lane:
            vals = [i.val for i in ins]
            out = eqn.primitive.bind(*vals, **eqn.params)
            if not eqn.primitive.multiple_results:
                out = [out]
            for v, o in zip(eqn.outvars, out):
                write(v, _LaneVal(o, False))
            continue

        if name == "dot_general":
            l = _promote(ins[0], eqn.invars[0].aval.shape, C)
            r = _promote(ins[1], eqn.invars[1].aval.shape, C)
            out = _expand_dot_lane(l, r, eqn.params["dimension_numbers"])
            pet = eqn.params.get("preferred_element_type")
            if pet is not None and out.dtype != pet:
                out = out.astype(pet)
            write(eqn.outvars[0], _LaneVal(out, True))
        elif name == "broadcast_in_dim":
            shape = tuple(eqn.params["shape"]) + (C,)
            op = ins[0]
            if op.lane:
                bdims = tuple(eqn.params["broadcast_dimensions"]) + (len(shape) - 1,)
                v = op.val
                if v.dtype == jnp.bool_:
                    # Mosaic cannot relayout 1-bit vectors; ride as i32
                    v = v.astype(jnp.int32)
                    out = jax.lax.broadcast_in_dim(v, shape, bdims)
                    out = jax.lax.ne(out, jnp.zeros_like(out))
                else:
                    out = jax.lax.broadcast_in_dim(v, shape, bdims)
            else:
                small = jax.lax.broadcast_in_dim(
                    jnp.asarray(op.val),
                    tuple(eqn.params["shape"]),
                    eqn.params["broadcast_dimensions"],
                )
                out = _promote(_LaneVal(small, False), eqn.params["shape"], C)
            write(eqn.outvars[0], _LaneVal(out, True))
        elif name == "reshape":
            if eqn.params.get("dimensions") is not None:
                raise NotImplementedError("reshape with dimensions")
            ns = tuple(eqn.params["new_sizes"]) + (C,)
            write(eqn.outvars[0], _LaneVal(ins[0].val.reshape(ns), True))
        elif name == "squeeze":
            out = jax.lax.squeeze(ins[0].val, eqn.params["dimensions"])
            write(eqn.outvars[0], _LaneVal(out, True))
        elif name == "transpose":
            perm = tuple(eqn.params["permutation"]) + (ins[0].val.ndim - 1,)
            write(eqn.outvars[0], _LaneVal(jnp.transpose(ins[0].val, perm), True))
        elif name == "slice":
            p = eqn.params
            starts = tuple(p["start_indices"]) + (0,)
            limits = tuple(p["limit_indices"]) + (C,)
            st = p["strides"]
            st = (tuple(st) if st is not None else (1,) * (len(starts) - 1)) + (1,)
            out = jax.lax.slice(ins[0].val, starts, limits, st)
            write(eqn.outvars[0], _LaneVal(out, True))
        elif name == "concatenate":
            dim = eqn.params["dimension"]
            ops = [_promote(i, vi.aval.shape, C) for i, vi in zip(ins, eqn.invars)]
            write(eqn.outvars[0], _LaneVal(jax.lax.concatenate(ops, dim), True))
        elif name == "pad":
            # block-diagonal construction (e.g. ProductManifold
            # plus_jacobian) pads sub-Jacobians with zeros; the lane axis
            # is never padded
            if ins[1].lane:
                raise NotImplementedError("pad with lane-varying value")
            cfg = tuple(eqn.params["padding_config"]) + ((0, 0, 0),)
            op = _promote(ins[0], eqn.invars[0].aval.shape, C)
            pval = jnp.asarray(ins[1].val).astype(op.dtype).reshape(())
            write(eqn.outvars[0], _LaneVal(jax.lax.pad(op, pval, cfg), True))
        elif name in ("reduce_sum", "reduce_max", "reduce_min", "reduce_prod"):
            out = eqn.primitive.bind(ins[0].val, axes=tuple(eqn.params["axes"]))
            write(eqn.outvars[0], _LaneVal(out, True))
        elif name in ("reduce_or", "reduce_and"):
            v = ins[0].val.astype(jnp.int32)
            op = jnp.max if name == "reduce_or" else jnp.min
            out = op(v, axis=tuple(eqn.params["axes"]))
            write(eqn.outvars[0], _LaneVal(jax.lax.ne(out, jnp.zeros_like(out)), True))
        elif name == "iota":
            shape = tuple(eqn.params["shape"]) + (C,)
            out = jax.lax.broadcasted_iota(
                eqn.params["dtype"], shape, eqn.params["dimension"]
            )
            write(eqn.outvars[0], _LaneVal(out, True))
        elif name == "select_n":
            target = tuple(out_aval.shape) + (C,)
            ops = [_promote(i, vi.aval.shape, C) for i, vi in zip(ins, eqn.invars)]
            pred = ops[0]
            if pred.shape != target:
                if pred.dtype == jnp.bool_:
                    pred = pred.astype(jnp.int32)
                pred = jnp.broadcast_to(
                    pred.reshape(
                        pred.shape[:-1] + (1,) * (len(target) - pred.ndim) + pred.shape[-1:]
                    ),
                    target,
                )
            if pred.dtype != jnp.bool_:
                pred = jax.lax.ne(pred, jnp.zeros_like(pred))
            ops[1:] = [jnp.broadcast_to(o, target) for o in ops[1:]]
            write(eqn.outvars[0], _LaneVal(jax.lax.select_n(pred, *ops[1:]), True))
        elif name == "convert_element_type":
            out = jax.lax.convert_element_type(ins[0].val, eqn.params["new_dtype"])
            write(eqn.outvars[0], _LaneVal(out, ins[0].lane))
        elif name in ("stop_gradient", "copy"):
            write(eqn.outvars[0], ins[0])
        else:
            # elementwise default: promote operands to out shape + lane
            if out_aval is None:
                raise NotImplementedError(f"no lane rule for {name}")
            target = tuple(out_aval.shape) + (C,)
            ops = []
            for i, vi in zip(ins, eqn.invars):
                v = _promote(i, vi.aval.shape, C)
                if v.shape != target:
                    v = jnp.broadcast_to(v, target)
                ops.append(v)
            out = eqn.primitive.bind(*ops, **eqn.params)
            if not eqn.primitive.multiple_results:
                out = [out]
            for v, o in zip(eqn.outvars, out):
                write(v, _LaneVal(o, True))

    return [read(v) for v in jaxpr.outvars]


# ---------------------------------------------------------------------- #
# scalar-level trace: primal + all Jacobian columns, one linearize
# ---------------------------------------------------------------------- #


def _scalar_full_jaxpr(fn, sizes, data_avals, dtype, manifolds=None,
                       with_jacobian=True):
    """Closed jaxpr of (p_0..p_k, d_0..) -> (res [r], col_0 [r], ...,
    col_{T-1} [r]): one primal linearize + T unrolled pushforwards (the
    per-signature Jet evaluation of the reference, autodiff.h:318, with the
    Jet algebra replaced by jax.linearize).

    For a position with a manifold, the pushforward tangents are the
    plus-Jacobian columns, so the emitted columns are TANGENT-space
    Jacobian columns directly — the manifold chain rule
    (cuda_evaluator_kernel.h:362-369 MatrixMultiply, evaluator.py einsum)
    is fused into the same trace instead of a separate [n,r,s]x[n,s,t]
    batched matmul after the kernel."""
    manifolds = manifolds or [None] * len(sizes)

    def scalar_full(*args):
        params = args[: len(sizes)]
        data = args[len(sizes):]
        if not with_jacobian:
            return (fn(params, data),)
        res, jvp = jax.linearize(lambda *ps: fn(ps, data), *params)
        cols = []
        for i, s in enumerate(sizes):
            if manifolds[i] is None:
                for j in range(s):
                    # numpy-constant basis tangents: zeros fold away inside
                    # the linearized pushforward (traced jnp zeros leave
                    # dead multiply-by-zero equations that the lane
                    # extension then pays for at every lane)
                    tangents = [np.zeros((sz,), dtype) for sz in sizes]
                    tangents[i][j] = 1.0
                    cols.append(jvp(*[jnp.asarray(t) for t in tangents]))
            else:
                pj = manifolds[i].plus_jacobian(params[i])  # [s, t_i]
                for j in range(pj.shape[1]):
                    targs = [
                        jnp.asarray(np.zeros((sz,), dtype)) for sz in sizes
                    ]
                    targs[i] = pj[:, j].astype(dtype)
                    cols.append(jvp(*targs))
        return (res, *cols)

    in_avals = [jax.ShapeDtypeStruct((s,), dtype) for s in sizes] + [
        jax.ShapeDtypeStruct(a.shape, a.dtype) for a in data_avals
    ]
    return jax.make_jaxpr(scalar_full)(*in_avals)


def _pack_const(c):
    """VMEM inputs must be >= 2-D; flatten small consts to (1, k)."""
    a = jnp.asarray(c)
    if a.dtype == jnp.bool_:
        a = a.astype(jnp.int32)
    return a if a.ndim >= 2 else a.reshape(1, -1)


def _unpack_const(ref_val, template):
    t = np.asarray(template)
    v = ref_val
    if v.shape != t.shape:
        v = v.reshape(t.shape)
    if t.dtype == np.bool_:
        v = jax.lax.ne(v, jnp.zeros_like(v))
    return v


# ---------------------------------------------------------------------- #
# group kernel
# ---------------------------------------------------------------------- #


def _lane_corrector(res, cols, rho0, rho1, rho2):
    """Triggs correction in lane layout: res [r, C], cols list of [r, C]
    Jacobian columns (one per global tangent dim). Mirrors
    corrector.correct_batched (corrector.h:82-220) with the batch axis on
    lanes."""
    sq_norm = jnp.sum(res * res, axis=0)  # [C]
    sqrt_rho1 = jnp.sqrt(rho1)
    inlier = (sq_norm > 0.0) & (rho2 > 0.0)
    safe_sq_norm = jnp.where(inlier, sq_norm, 1.0)
    safe_rho1 = jnp.where(rho1 > 0.0, rho1, 1.0)
    d = 1.0 + 2.0 * sq_norm * rho2 / safe_rho1
    alpha = jnp.where(inlier, 1.0 - jnp.sqrt(jnp.maximum(d, 0.0)), 0.0)
    residual_scaling = jnp.where(inlier, sqrt_rho1 / (1.0 - alpha), sqrt_rho1)
    alpha_sq_norm = jnp.where(inlier, alpha / safe_sq_norm, 0.0)

    new_cols = []
    for col in cols:  # [r, C]; correction uses the *uncorrected* residuals
        rtj = jnp.sum(res * col, axis=0)  # [C]
        new_cols.append(sqrt_rho1 * (col - alpha_sq_norm * res * rtj))
    return residual_scaling * res, new_cols


def _interpret_mode():
    return os.environ.get("CERES_TPU_PALLAS", "") == "interpret"


def pallas_enabled():
    if os.environ.get("CERES_TPU_NO_PALLAS", ""):
        return False
    if _interpret_mode():
        return True
    try:
        return jax.default_backend() == "tpu"
    except Exception:
        return False


class GroupKernel:
    """Compiled fused evaluation for one signature group.

    Produces (cost, res_T [r, n], jacs_T tuple of [r*s_i, n]) given
    transposed parameter blocks and data. The kernel streams lane blocks;
    VMEM use is constant in n, so arbitrarily large groups need no lane
    chunking (the XLA path's LANE_CHUNK machinery exists because its fusion
    temporaries scale with the slice size)."""

    def __init__(self, meta, data_avals, dtype, apply_loss, has_mask,
                 with_jacobian=True):
        self.meta = meta
        self.sizes = tuple(int(pm.size) for pm in meta.positions)
        # Jacobian blocks are emitted in tangent space; for manifold
        # positions the plus-Jacobian chain rule is fused into the trace
        self.tangent_sizes = tuple(
            int(pm.tangent_size) for pm in meta.positions
        )
        self.r = int(meta.cost_function.num_residuals)
        self.dtype = dtype
        self.apply_loss = apply_loss
        self.with_jacobian = with_jacobian
        self.has_mask = has_mask
        self.loss = meta.loss if apply_loss else None
        self.data_scalar_shapes = tuple(tuple(a.shape) for a in data_avals)
        self.closed = _scalar_full_jaxpr(
            meta.cost_function.fn, self.sizes, data_avals, dtype,
            manifolds=[pm.manifold for pm in meta.positions],
            with_jacobian=with_jacobian,
        )
        # probe the lane interpreter (and the loss) on abstract values now so
        # unsupported primitives surface here — group_kernel() catches and
        # falls back to the XLA path
        C = LANE_BLOCK

        def probe(*xs):
            outs = lane_eval(
                self.closed.jaxpr,
                [_LaneVal(c, False) for c in self.closed.consts],
                [_LaneVal(x, True) for x in xs],
                C,
            )
            vals = [o.val for o in outs]
            if self.loss is not None:
                vals.append(self.loss.rho(jnp.sum(vals[0] * vals[0], axis=0))[0])
            return vals

        probe_avals = [
            jnp.zeros((s, C), dtype) for s in self.sizes
        ] + [jnp.zeros(sh + (C,), a.dtype) for sh, a in zip(self.data_scalar_shapes, data_avals)]
        jax.eval_shape(probe, *probe_avals)

    def __call__(self, params_T, data_T, mask_T=None):
        """params_T: tuple of [s_i, n]; data_T: tuple of [d..., n] (>= 2-D);
        mask_T: optional [1, n] (nonzero = real lane). Returns
        (cost [], res_T [r, n], jacs_T tuple of [r*s_i, n])."""
        n = int(params_T[0].shape[1])
        C = LANE_BLOCK
        grid = pl.cdiv(n, C)
        r = self.r
        sizes = self.sizes
        tangent_sizes = self.tangent_sizes
        closed = self.closed
        loss = self.loss
        data_scalar_shapes = self.data_scalar_shapes
        has_mask = mask_T is not None
        n_consts = len(closed.consts)
        n_params = len(params_T)
        n_jac = n_params if self.with_jacobian else 0
        n_data = len(data_T)

        def kernel(*refs):
            const_refs = refs[:n_consts]
            prefs = refs[n_consts : n_consts + n_params]
            drefs = refs[n_consts + n_params : n_consts + n_params + n_data]
            k = n_consts + n_params + n_data
            mref = refs[k] if has_mask else None
            outs_off = k + (1 if has_mask else 0)
            res_ref = refs[outs_off]
            jac_refs = refs[outs_off + 1 : outs_off + 1 + n_jac]
            cost_ref = refs[outs_off + 1 + n_jac]

            i = pl.program_id(0)
            consts = [
                _LaneVal(_unpack_const(cr[...], cv), False)
                for cr, cv in zip(const_refs, closed.consts)
            ]
            args = [_LaneVal(p[...], True) for p in prefs]
            for dref, sh in zip(drefs, data_scalar_shapes):
                v = dref[...]
                if len(sh) == 0:
                    v = v[0]  # [1, C] block -> scalar-level () + lane
                args.append(_LaneVal(v, True))
            outs = lane_eval(closed.jaxpr, consts, args, C)
            # functors with constant residuals/Jacobian entries (e.g. an
            # identity-Jacobian tether) produce lane-LESS outputs — promote
            # them to the [r, C] lane layout
            res = _promote(outs[0], (r,), C)  # [r, C]
            cols = [_promote(o, (r,), C) for o in outs[1:]]  # T x [r, C]

            # validity: lane < n AND mask nonzero; carried as i32 (Mosaic
            # cannot relayout 1-bit vectors across sublanes)
            lane = jax.lax.broadcasted_iota(jnp.int32, (1, C), 1) + i * C
            ok_i = (lane < n).astype(jnp.int32)
            if mref is not None:
                ok_i = ok_i * (mref[...] != 0).astype(jnp.int32)
            okr = jax.lax.ne(
                jnp.broadcast_to(ok_i, (r, C)), jnp.zeros((r, C), jnp.int32)
            )
            ok1 = jax.lax.ne(ok_i, jnp.zeros_like(ok_i))  # [1, C]
            res = jnp.where(okr, res, 0.0)
            cols = [jnp.where(okr, c, 0.0) for c in cols]

            if loss is not None:
                s = jnp.sum(res * res, axis=0)  # [C]
                rho0, rho1, rho2 = loss.rho(s)
                rho0 = jnp.where(ok1[0], rho0, 0.0)
                cost_part = 0.5 * jnp.sum(rho0)
                res, cols = _lane_corrector(res, cols, rho0, rho1, rho2)
            else:
                cost_part = 0.5 * jnp.sum(res * res)

            @pl.when(i == 0)
            def _():
                cost_ref[0, 0] = cost_part

            @pl.when(i > 0)
            def _():
                cost_ref[0, 0] = cost_ref[0, 0] + cost_part

            res_ref[...] = res
            off = 0
            for pos, t in enumerate(tangent_sizes if jac_refs else ()):
                block = jnp.concatenate(
                    [
                        jnp.stack([cols[off + j][rr] for j in range(t)])
                        for rr in range(r)
                    ],
                    axis=0,
                )  # row rr*t + j = d res_rr / d tangent_j
                jac_refs[pos][...] = block
                off += t

        in_specs = (
            [pl.BlockSpec(memory_space=pltpu.VMEM) for _ in range(n_consts)]
            + [
                pl.BlockSpec((s, C), lambda i: (0, i), memory_space=pltpu.VMEM)
                for s in sizes
            ]
            + [
                pl.BlockSpec(
                    tuple(d.shape[:-1]) + (C,),
                    (lambda nd: (lambda i: (0,) * (nd - 1) + (i,)))(d.ndim),
                    memory_space=pltpu.VMEM,
                )
                for d in data_T
            ]
        )
        if has_mask:
            in_specs.append(
                pl.BlockSpec((1, C), lambda i: (0, i), memory_space=pltpu.VMEM)
            )
        jac_ts = tangent_sizes if self.with_jacobian else ()
        out_specs = (
            [pl.BlockSpec((r, C), lambda i: (0, i), memory_space=pltpu.VMEM)]
            + [
                pl.BlockSpec((r * t, C), lambda i: (0, i), memory_space=pltpu.VMEM)
                for t in jac_ts
            ]
            + [pl.BlockSpec((1, 1), lambda i: (0, 0), memory_space=pltpu.SMEM)]
        )
        out_shape = (
            [jax.ShapeDtypeStruct((r, n), self.dtype)]
            + [
                jax.ShapeDtypeStruct((r * t, n), self.dtype)
                for t in jac_ts
            ]
            + [jax.ShapeDtypeStruct((1, 1), self.dtype)]
        )

        inputs = (
            [_pack_const(c) for c in closed.consts]
            + list(params_T)
            + list(data_T)
        )
        if has_mask:
            inputs.append(mask_T)

        outs = pl.pallas_call(
            kernel,
            grid=(grid,),
            in_specs=in_specs,
            out_specs=out_specs,
            out_shape=out_shape,
            compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
            interpret=_interpret_mode(),
        )(*inputs)
        res_T = outs[0]
        jacs_T = tuple(outs[1 : 1 + n_jac])
        cost = outs[-1][0, 0]
        return cost, res_T, jacs_T


def group_kernel(meta, garr, dtype, apply_loss, with_jacobian=True):
    """Build (and cache on meta) a GroupKernel, or return None when the
    group is not kernel-eligible: non-f32 dtype (Mosaic has no f64), data
    leaves of rank > 2, unsupported primitives in the functor OR in a
    manifold's plus_jacobian (the chain rule is traced into the kernel),
    or a non-TPU platform without CERES_TPU_PALLAS=interpret."""
    if not pallas_enabled():
        return None
    if dtype != jnp.float32:
        return None
    for d in garr["data"]:
        if not hasattr(d, "ndim") or d.ndim > 2:
            return None
        if jnp.issubdtype(d.dtype, jnp.integer):
            return None
    has_mask = garr.get("mask") is not None
    key = (bool(apply_loss), has_mask, str(dtype), bool(with_jacobian))
    cache = getattr(meta, "_pallas_kernels", None)
    if cache is None:
        cache = {}
        meta._pallas_kernels = cache
    if key in cache:
        return cache[key]
    try:
        data_avals = tuple(
            jax.ShapeDtypeStruct(tuple(d.shape[1:]), d.dtype) for d in garr["data"]
        )
        k = GroupKernel(meta, data_avals, dtype, apply_loss, has_mask,
                        with_jacobian=with_jacobian)
    except Exception:
        k = None
    cache[key] = k
    return k
