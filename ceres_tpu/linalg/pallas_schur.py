"""Single-pass fused implicit-Schur matvec (the PCG hot loop) on TPU.

reference: ImplicitSchurComplement::RightMultiplyAndAccumulate
(implicit_schur_complement.cc:118-165) — the four partitioned products

    t1 = F y;  t2 = (E'E + D_e^2)^{-1} E' t1;  S y = F'(t1 - E t2) + D_f^2 y

The composed tvec path (schur.py s_apply_t) runs these as four separate
device passes: F is streamed twice, E twice, t1/diff make HBM round
trips, and the camera one-hot is generated twice (measured 12 ms f32 per
PCG iteration at BAL-1778 scale against ~0.6 ms of irreducible HBM
traffic). This kernel exploits the bucket layout's point contiguity —
all d lanes of a point sit at a fixed stride within one bucket segment —
to run the ENTIRE product in one pass per segment: per block of C points
it gathers y (one-hot MXU matmul, generated once and reused), forms t1
in VMEM scratch, reduces E' t1 across the point's d lanes in-register,
applies the per-point (E'E + D_e^2)^{-1} block, and pushes F'(t1 - E t2)
partials into the accumulated output table. F and E are each read
exactly once per matvec; t1 never touches HBM.

Eligibility (build_sy returns None otherwise, callers keep the composed
path): single signature group, exactly one e-position on the bucket plan
and one f-position on the onehot plan, pure e/f tangent classes,
unsharded, f32/bf16 leaves, TPU present.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp

from ..pallas_onehot import (
    B,
    MIN_LANES,
    _int_planes,
    _pack_table,
    _unpack_table,
    enabled as _onehot_enabled,
)
from ..utils.flags import env_flag


def _f32(x):
    return x.astype(jnp.float32)


# ------------------------------------------------------------------ #
# static segment meta (recomputed from the program; never in pytrees)
# ------------------------------------------------------------------ #


def _chunk_points(d, A, rt_f):
    """Point-block size C: the stored one-hots [d, A, C] (bf16) must fit
    ~4 MB of VMEM and the double-buffered F block ~3 MB. Capped at 2048 so
    the preconditioner-build kernel (ctmp [tf*tf*B, C]) can reuse the same
    segment arrays."""
    c_oh = (4 * 1024 * 1024) // max(1, d * A * 2)
    c_f = (3 * 1024 * 1024) // max(1, 2 * rt_f * d * 4)
    c = min(c_oh, c_f, 2048)
    return max(128, (c // 128) * 128)


def sy_meta(program):
    """Static per-segment meta [(lane_start, n_seg, n_pad, d, out_row, C)]
    or None when the problem shape is not the fusable BA structure."""
    if env_flag("CERES_TPU_NO_FUSED_SY"):
        return None
    if not _onehot_enabled():
        return None
    if len(program.groups) != 1:
        return None
    from .schur import _pure_class_split

    split = _pure_class_split(program)
    if split is None:
        return None
    f_set, e_set = split
    _, e_positions, f_positions = program.compute_schur_partition()
    if len(e_positions[0]) != 1 or len(f_positions[0]) != 1:
        return None
    meta = program.groups[0]
    if meta.n < MIN_LANES:
        return None
    e_pm = meta.positions[e_positions[0][0]]
    f_pm = meta.positions[f_positions[0][0]]
    if e_pm.t_cls < 0 or f_pm.t_cls < 0:
        return None
    if {e_pm.t_cls} != e_set or {f_pm.t_cls} != f_set:
        return None
    plans = meta.red_plans or {}
    e_plan = plans.get(e_positions[0][0])
    f_plan = plans.get(f_positions[0][0])
    if e_plan is None or e_plan[0] != "bucket":
        return None
    if f_plan is None or f_plan[0] != "onehot":
        return None
    cnt_f = program.tangent_class_counts[f_pm.t_cls]
    ncols_f = cnt_f + 1  # dump column (unsharded: no overhang pad)
    A = -(-ncols_f // B)
    rt_f = meta.num_residuals * f_pm.tangent_size
    segs = []
    for (lane_start, n_seg, d, out_row) in e_plan[1]:
        C = min(_chunk_points(d, A, rt_f), -(-n_seg // 128) * 128)
        n_pad = -(-n_seg // C) * C
        segs.append((lane_start, n_seg, n_pad, d, out_row, C))
    return {
        "segs": segs,
        "e_cls": e_pm.t_cls,
        "f_cls": f_pm.t_cls,
        "te": e_pm.tangent_size,
        "tf": f_pm.tangent_size,
        "r": meta.num_residuals,
        "A": A,
        "ncols_f": ncols_f,
        "cnt_f": cnt_f,
    }


# ------------------------------------------------------------------ #
# operand preparation (once per LM iteration / prepare cache)
# ------------------------------------------------------------------ #


def build_sy_arrays(program, jac_e_m, jac_f_m, meta):
    """Per-segment (F3, E3, rows3) pytree from MATERIALIZED (scale folded,
    possibly bf16) E/F views. Pure arrays — safe to carry in the fused
    loop's prepare cache; the static meta is recomputed via sy_meta."""
    f_leaf = jac_f_m.jac_groups[0][0]
    e_leaf = jac_e_m.jac_groups[0][0]
    rows_f = jac_f_m.t_rows[0][0]
    dump = meta["cnt_f"]
    rt_f, rt_e = f_leaf.shape[0], e_leaf.shape[0]
    out = []
    for (ls, n_seg, n_pad, d, _out_row, _C) in meta["segs"]:
        pad = n_pad - n_seg

        # layout (d, rt, n): the kernel's per-j slice x[j] is then a
        # contiguous zero-offset [rt, C] block — Mosaic rejects reduces
        # over offset layouts, which middle-axis slices of (rt, d, n)
        # would produce
        def seg3(leaf, k):
            x = leaf[:, ls : ls + d * n_seg].reshape(k, d, n_seg)
            x = jnp.transpose(x, (1, 0, 2))
            return jnp.pad(x, ((0, 0), (0, 0), (0, pad)))

        rows3 = jnp.pad(
            rows_f[ls : ls + d * n_seg].reshape(d, 1, n_seg),
            ((0, 0), (0, 0), (0, pad)),
            constant_values=dump,
        )
        out.append((seg3(f_leaf, rt_f), seg3(e_leaf, rt_e), rows3))
    return out


def _scale_tables(program, jac_f, meta):
    from ..evaluator import tangent_tables

    cs = jac_f.col_scale
    if cs is None:
        return None, None
    st = tangent_tables(program, cs, pad_zero_row=True)
    return st[meta["f_cls"]].T, st[meta["e_cls"]]  # [tf, cnt_f+1], [cnt_e+1, te]


def build_one_scaled_segment(
    program, jac_e, jac_f, meta, seg_idx, st_f=None, st_e=None
):
    """One segment's (F3, E3, rows3) in working precision from LAZY-scaled
    views — the column scale folds per segment (camera side: one-hot
    gather on the sliced lanes; point side: a contiguous scale-table
    slice broadcast over the d repeats), so the full scale-materialized
    Jacobian copy never exists."""
    from ..jacobian import _onehot_gather_rows

    f_leaf = jac_f.jac_groups[0][0]
    e_leaf = jac_e.jac_groups[0][0]
    rows_f = jac_f.t_rows[0][0]
    dump = meta["cnt_f"]
    rt_f, rt_e = f_leaf.shape[0], e_leaf.shape[0]
    r, te, tf = meta["r"], meta["te"], meta["tf"]
    (ls, n_seg, n_pad, d, out_row, _C) = meta["segs"][seg_idx]
    pad = n_pad - n_seg
    dn = d * n_seg
    rows_sl = jax.lax.dynamic_slice(rows_f, (ls,), (dn,))
    fsl = jax.lax.dynamic_slice(f_leaf, (0, ls), (rt_f, dn))
    esl = jax.lax.dynamic_slice(e_leaf, (0, ls), (rt_e, dn))
    if st_f is not None:
        sf = _onehot_gather_rows(st_f.astype(fsl.dtype), rows_sl)
        fsl = (fsl.reshape(r, tf, dn) * sf[None]).reshape(rt_f, dn)
        se = jax.lax.dynamic_slice(
            st_e, (out_row, 0), (n_seg, te)
        ).T.astype(esl.dtype)  # [te, n_seg], same for every repeat j
        esl = (
            esl.reshape(r, te, d, n_seg) * se[None, :, None, :]
        ).reshape(rt_e, dn)

    def seg3(x, k):
        x = jnp.transpose(x.reshape(k, d, n_seg), (1, 0, 2))
        return jnp.pad(x, ((0, 0), (0, 0), (0, pad)))

    rows3 = jnp.pad(
        rows_sl.reshape(d, 1, n_seg),
        ((0, 0), (0, 0), (0, pad)),
        constant_values=dump,
    )
    return seg3(fsl, rt_f), seg3(esl, rt_e), rows3


def build_sy_arrays_scaled(program, jac_e, jac_f, meta):
    """All segments via build_one_scaled_segment (callers that can afford
    every working-precision segment live at once; the peak-HBM path in
    schur_prepare interleaves build/consume/cast per segment instead)."""
    st_f, st_e = _scale_tables(program, jac_f, meta)
    return [
        build_one_scaled_segment(
            program, jac_e, jac_f, meta, i, st_f, st_e
        )
        for i in range(len(meta["segs"]))
    ]


def build_minv_segments(inv_table, meta):
    """Slice the (E'E + D_e^2)^{-1} class table [te*te, cnt_e] per bucket
    segment (radius-dependent: rebuilt once per linear solve, outside the
    PCG loop)."""
    tete = inv_table.shape[0]
    out = []
    for (_ls, n_seg, n_pad, _d, out_row, _C) in meta["segs"]:
        sl = jax.lax.dynamic_slice(
            inv_table, (0, out_row), (tete, n_seg)
        )
        out.append(jnp.pad(sl, ((0, 0), (0, n_pad - n_seg))))
    return out


def pack_y_planes(y_table, meta, dtype):
    """[tf, ncols_f(+pad)] camera tvec -> ONE stacked bf16 plane matrix
    [n_planes*tf*B, A] (planes stacked along rows: a single MXU matmul at
    ~0.84 row utilization instead of three at 0.56)."""
    tbl = _pack_table(y_table[:, : meta["ncols_f"]], meta["A"])
    if dtype == jnp.bfloat16:
        return tbl.astype(jnp.bfloat16)
    planes = []
    r = tbl.astype(jnp.float32)
    for _ in range(3):
        hi = jax.lax.bitcast_convert_type(r, jnp.uint32) & jnp.uint32(
            0xFFFF0000
        )
        p = jax.lax.bitcast_convert_type(hi, jnp.float32)
        planes.append(p.astype(jnp.bfloat16))
        r = r - p
    return jnp.concatenate(planes, axis=0)


# ------------------------------------------------------------------ #
# the kernel
# ------------------------------------------------------------------ #


def _sy_kernel(
    rows_ref,
    f_ref,
    e_ref,
    minv_ref,
    ystack_ref,
    out_ref,
    t1_ref,
    oh_ref,
    *,
    d,
    r,
    te,
    tf,
    A,
    bf16,
):
    from jax.experimental import pallas as pl

    C = minv_ref.shape[1]
    tfB = tf * B
    n_planes = ystack_ref.shape[0] // tfB
    k = pl.program_id(0)
    leaf_dt = jnp.bfloat16 if bf16 else jnp.float32

    # ---- phase A: gather y per lane, form t1 = F y (VMEM scratch) ----
    for j in range(d):
        rows = rows_ref[j, 0, :]
        hi = rows // B
        lo = rows % B
        iota_a = jax.lax.broadcasted_iota(jnp.int32, (A, C), 0)
        oh_hi = (iota_a == hi[None, :]).astype(jnp.bfloat16)
        oh_ref[j] = oh_hi
        tmp3 = jax.lax.dot_general(
            ystack_ref[:],
            oh_hi,
            (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [n_planes*tfB, C]
        tmp = sum(
            tmp3[p * tfB : (p + 1) * tfB] for p in range(n_planes)
        )
        iota_b = jax.lax.broadcasted_iota(jnp.int32, (B, C), 0)
        oh_lo = (iota_b == lo[None, :]).astype(jnp.float32)
        ylane = (tmp.reshape(tf, B, C) * oh_lo[None]).sum(axis=1)
        fj = f_ref[j].reshape(r, tf, C)
        if bf16:
            t1_j = (fj * ylane[None].astype(leaf_dt)).sum(axis=1)
        else:
            t1_j = (fj * ylane[None]).sum(axis=1)
        t1_ref[j] = _f32(t1_j)

    # ---- phase B: s_pt = E' t1 per point; t2 = M^{-1} s_pt ----
    s_pt = jnp.zeros((te, C), jnp.float32)
    for j in range(d):
        ej = e_ref[j].reshape(r, te, C)
        t1j = t1_ref[j]
        if bf16:
            t1j = t1j.astype(leaf_dt)
        # unrolled over r: Mosaic cannot lower axis-0 multi_reductions of
        # 3-D vectors ("unsupported output implicit dimension")
        contrib = sum(ej[ri] * t1j[ri][None, :] for ri in range(r))
        s_pt = s_pt + _f32(contrib)
    m = minv_ref[:]  # [te*te, C] f32
    t2 = [
        sum(m[i * te + jj] * s_pt[jj] for jj in range(te))
        for i in range(te)
    ]

    # ---- phase C: diff = t1 - E t2; out += F' diff (one-hot reduce) ----
    acc = jnp.zeros((tfB, A), jnp.float32)
    for j in range(d):
        ej = e_ref[j].reshape(r, te, C)
        if bf16:
            et2_j = sum(
                _f32(ej[:, i, :] * t2[i].astype(leaf_dt)) for i in range(te)
            )
        else:
            et2_j = sum(ej[:, i, :] * t2[i] for i in range(te))
        diff_j = t1_ref[j] - et2_j  # [r, C] f32
        fj = f_ref[j].reshape(r, tf, C)
        u = diff_j.astype(leaf_dt)
        # unrolled over r (see phase B note)
        contrib = sum(fj[ri] * u[ri][None, :] for ri in range(r))
        rows = rows_ref[j, 0, :]
        lo = rows % B
        iota_b = jax.lax.broadcasted_iota(jnp.int32, (B, C), 0)
        oh_lo = (iota_b == lo[None, :]).astype(contrib.dtype)
        ctmp = (contrib[:, None, :] * oh_lo[None]).reshape(tfB, C)
        if bf16:
            cstack = ctmp
        else:
            cstack = jnp.concatenate(_int_planes(_f32(ctmp)), axis=0)
        oh_hi = oh_ref[j]
        acc3 = jax.lax.dot_general(
            cstack,
            oh_hi,
            (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32,
        )  # [n_planes*tfB, A]
        acc = acc + sum(
            acc3[p * tfB : (p + 1) * tfB]
            for p in range(cstack.shape[0] // tfB)
        )

    @pl.when(k == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += acc


def _seg_call(seg_meta, meta, rows3, F3, E3, minv, ystack, dtype):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    (_ls, _n_seg, n_pad, d, _out_row, C) = seg_meta
    r, te, tf, A = meta["r"], meta["te"], meta["tf"], meta["A"]
    rt_f, rt_e = F3.shape[1], E3.shape[1]
    tete = te * te
    K = n_pad // C
    bf16 = dtype == jnp.bfloat16
    kern = functools.partial(
        _sy_kernel, d=d, r=r, te=te, tf=tf, A=A, bf16=bf16
    )
    from ..pallas_eval import _interpret_mode

    return pl.pallas_call(
        kern,
        grid=(K,),
        in_specs=[
            pl.BlockSpec(
                (d, 1, C), lambda k: (0, 0, k), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (d, rt_f, C), lambda k: (0, 0, k), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (d, rt_e, C), lambda k: (0, 0, k), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (tete, C), lambda k: (0, k), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                ystack.shape, lambda k: (0, 0), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (tf * B, A), lambda k: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((tf * B, A), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((d, r, C), jnp.float32),
            pltpu.VMEM((d, A, C), jnp.bfloat16),
        ],
        interpret=_interpret_mode(),
    )(rows3, F3, E3, minv, ystack)


def sy_apply(meta, seg_arrays, minv_segs, y_table, dtype):
    """F'(I - E (E'E+D_e^2)^{-1} E') F y for a camera tvec y_table
    [tf, ncols_f(+pad)] -> [tf, ncols_f] (dsq_f·y added by the caller)."""
    ystack = pack_y_planes(y_table, meta, dtype)
    acc = None
    for seg_meta, (F3, E3, rows3), minv in zip(
        meta["segs"], seg_arrays, minv_segs
    ):
        part = _seg_call(
            seg_meta, meta, rows3, F3, E3, minv, ystack, dtype
        )
        acc = part if acc is None else acc + part
    tf, A = meta["tf"], meta["A"]
    return _unpack_table(acc, tf, A, meta["ncols_f"])


# ------------------------------------------------------------------ #
# fused SCHUR_JACOBI diagonal build (the prepare-phase hot spot)
# ------------------------------------------------------------------ #


def _p0_kernel(rows_ref, f_ref, e_ref, minv_ref, out_ref, *, d, r, te, tf, A):
    """Per camera block c:
        P_c = sum_lanes outer(F_lane) - (E'F)' M0^{-1} (E'F)  per lane,
    one-hot-reduced into [tf*tf*B, A] (accumulated across the grid).
    reference: schur_jacobi_preconditioner.cc via the schur_eliminator's
    chunk-diagonal assembly; composition as in schur.schur_jacobi_blocks.
    f32-exact: 3-plane contributions, M0 applied in f32.
    """
    from jax.experimental import pallas as pl

    C = minv_ref.shape[1]
    k2 = tf * tf
    kb = k2 * B
    gi = pl.program_id(0)
    # process in lane sub-chunks: the [kb, SC] intermediates at full C
    # exceed the 16 MB VMEM scope (measured: 16.31M at d=9, C=2048)
    acc = jnp.zeros((kb, A), jnp.float32)
    for j in range(d):
        for s0 in range(0, C, 1024):
            SC = min(1024, C - s0)
            sl = slice(s0, s0 + SC)
            fj = f_ref[j, :, sl].reshape(r, tf, SC)
            ej = e_ref[j, :, sl].reshape(r, te, SC)
            m3 = minv_ref[:, sl].reshape(te, te, SC)
            # outer(F) [tf, tf, SC]
            outer = sum(
                fj[ri][:, None, :] * fj[ri][None, :, :] for ri in range(r)
            )
            # etf[e, f, SC] = sum_r E[r,e] F[r,f]
            etf = sum(
                ej[ri][:, None, :] * fj[ri][None, :, :] for ri in range(r)
            )
            # minvetf[e, f, SC] = sum_e2 M0[e, e2] etf[e2, f]
            minvetf = sum(
                m3[:, e2, :][:, None, :] * etf[e2][None, :, :]
                for e2 in range(te)
            )
            # corr[a, b, SC] = sum_e etf[e, a] minvetf[e, b]
            corr = sum(
                etf[e][:, None, :] * minvetf[e][None, :, :]
                for e in range(te)
            )
            total = (outer - corr).reshape(k2, SC)
            rows = rows_ref[j, 0, sl]
            hi = rows // B
            lo = rows % B
            iota_b = jax.lax.broadcasted_iota(jnp.int32, (B, SC), 0)
            oh_lo = (iota_b == lo[None, :]).astype(jnp.float32)
            ctmp = (total[:, None, :] * oh_lo[None]).reshape(kb, SC)
            iota_a = jax.lax.broadcasted_iota(jnp.int32, (A, SC), 0)
            oh_hi = (iota_a == hi[None, :]).astype(jnp.bfloat16)
            # serialized planes ([kb, SC] rows already saturate the MXU;
            # keeping all three live doubles peak VMEM)
            res = ctmp
            for _ in range(3):
                hi_bits = jax.lax.bitcast_convert_type(
                    res, jnp.uint32
                ) & jnp.uint32(0xFFFF0000)
                p = jax.lax.bitcast_convert_type(hi_bits, jnp.float32)
                acc = acc + jax.lax.dot_general(
                    p.astype(jnp.bfloat16),
                    oh_hi,
                    (((1,), (1,)), ((), ())),
                    preferred_element_type=jnp.float32,
                )
                res = res - p

    @pl.when(gi == 0)
    def _():
        out_ref[:] = jnp.zeros_like(out_ref)

    out_ref[:] += acc


def p0_seg_call(seg_meta, meta, F3, E3, rows3, minv):
    """One segment's partial SCHUR_JACOBI accumulation [tf*tf*B, A]."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ..pallas_eval import _interpret_mode

    r, te, tf, A = meta["r"], meta["te"], meta["tf"], meta["A"]
    kb = tf * tf * B
    (_ls, _n_seg, n_pad, d, _out_row, C) = seg_meta
    rt_f, rt_e = F3.shape[1], E3.shape[1]
    kern = functools.partial(_p0_kernel, d=d, r=r, te=te, tf=tf, A=A)
    return pl.pallas_call(
        kern,
        grid=(n_pad // C,),
        in_specs=[
            pl.BlockSpec(
                (d, 1, C), lambda k: (0, 0, k), memory_space=pltpu.VMEM
            ),
            pl.BlockSpec(
                (d, rt_f, C),
                lambda k: (0, 0, k),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (d, rt_e, C),
                lambda k: (0, 0, k),
                memory_space=pltpu.VMEM,
            ),
            pl.BlockSpec(
                (te * te, C), lambda k: (0, k), memory_space=pltpu.VMEM
            ),
        ],
        out_specs=pl.BlockSpec(
            (kb, A), lambda k: (0, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((kb, A), jnp.float32),
        interpret=_interpret_mode(),
    )(rows3, F3, E3, minv)


def p0_unpack(acc, meta):
    tf = meta["tf"]
    tbl = _unpack_table(acc, tf * tf, meta["A"], meta["ncols_f"])
    return tbl[:, : meta["cnt_f"]]


def p0_apply(meta, seg_arrays, minv0_segs):
    """SCHUR_JACOBI diagonal [tf*tf, cnt_f] (no LM diagonal) from
    working-precision segment arrays + the ridge-(E'E)^{-1} slices."""
    acc = None
    for seg_meta, (F3, E3, rows3), minv in zip(
        meta["segs"], seg_arrays, minv0_segs
    ):
        part = p0_seg_call(seg_meta, meta, F3, E3, rows3, minv)
        acc = part if acc is None else acc + part
    return p0_unpack(acc, meta)
