"""Schur-complement linear solvers (the bundle-adjustment workhorse).

reference: ImplicitSchurComplement (implicit_schur_complement.cc),
IterativeSchurComplementSolver (iterative_schur_complement_solver.cc),
SchurComplementSolver (schur_complement_solver.cc), PartitionedMatrixView
(partitioned_matrix_view_impl.h).

TPU design (SURVEY.md §7): J is partitioned as [E F] by *signature-group
position* (e.g. for BA: E = d r/d point, F = d r/d camera), so all four
partitioned products E x, E^T u, F x, F^T u are the same einsum +
gather/scatter kernels as the full Jacobian, restricted to a position
subset (BlockJacobian.position_view). (E^T E + D_e^2)^{-1} is one batched
small Cholesky per e-class (vmapped, MXU-shaped). The PCG loop on the
reduced camera system runs entirely on device via lax.while_loop; nothing
is ever materialized.

The matrix-free S y product (implicit_schur_complement.cc:118-165):
    t1 = F y
    t2 = (E^T E + D_e^2)^{-1} E^T t1
    S y = F^T t1 - F^T E t2 + D_f^2 y
Back-substitution (implicit_schur_complement.h:135):
    dx_e = -(E^T E + D_e^2)^{-1} (g_e + E^T F dx_f)
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from ..types import LinearSolverType, PreconditionerType
from .cg import conjugate_gradients
from .preconditioners import BlockDiagSolver


def _sum_groups(a_groups, b_groups):
    return [a + b for a, b in zip(a_groups, b_groups)]


def schur_views(program, jac):
    """Split the (scaled) Jacobian into E and F position views."""
    _, e_positions, f_positions = program.compute_schur_partition()
    jac_e = jac.position_view(e_positions)
    jac_f = jac.position_view(f_positions)
    return jac_e, jac_f


def make_ete_solver(program, jac_e, dsq_e):
    """Factorized (E^T E + D_e^2)^{-1} as batched per-class Cholesky."""
    e_blocks, _, _ = program.compute_schur_partition()
    e_classes = {
        int(program.block_class[i])
        for i in range(len(e_blocks))
        if e_blocks[i] and program.block_class[i] >= 0
    }
    blocks = jac_e.block_diag_jtj(dsq=dsq_e, class_ids=e_classes)
    return BlockDiagSolver(program, blocks, only_classes=e_classes)


def schur_jacobi_blocks(program, jac_e, jac_f, ete_solver, dsq_f):
    """Block diagonal of S for the SCHUR_JACOBI preconditioner.

    For each f-block c: S_cc = sum_o F_o^T F_o + D_f^2
                              - sum_o F_o^T E_o M_{p(o)}^{-1} E_o^T F_o
    (valid when each residual block touches at most one e-block and one
    (c, e) pair appears in at most one residual block — the BA structure;
    extra cross terms are dropped, which only affects preconditioner
    quality, like the reference's clustered approximations).
    reference: schur_jacobi_preconditioner.cc via schur_eliminator's
    chunk-diagonal assembly.
    """
    program = jac_f.program
    ftf = jac_f.block_diag_jtj(dsq=dsq_f)  # list per class [count, s, s]
    # correction per group: F^T E M^{-1} E^T F for each residual block, then
    # segment-sum into the f-block diagonal.
    corrections = [jnp.zeros((b.shape[0] + 1, *b.shape[1:]), b.dtype) for b in ftf]
    for gi in range(len(jac_f.jac_groups)):
        if not jac_e.jac_groups[gi]:
            continue
        meta = program.groups[gi]
        n = jac_f._group_n(gi)
        r = meta.num_residuals
        e_jac = jac_e.jac_groups[gi][0]  # flat [n*r*te]; one e-position/group
        e_tr = jac_e.t_rows[gi][0]  # [n] rows in the e-class
        e_pm = meta.positions[jac_e.positions[gi][0]]
        for vpos, (f_jac, f_tr) in enumerate(
            zip(jac_f.jac_groups[gi], jac_f.t_rows[gi])
        ):
            pm = meta.positions[jac_f.positions[gi][vpos]]
            if pm.t_cls < 0:
                continue
            cnt = program.tangent_class_counts[pm.t_cls]
            tf = pm.tangent_size
            flat = _chunked_correction(
                ete_solver,
                e_pm.t_cls,
                e_jac,
                e_tr,
                f_jac,
                f_tr,
                n,
                r,
                e_pm.tangent_size,
                tf,
                cnt + 1,
            )
            corrections[pm.t_cls] = corrections[pm.t_cls] + flat.reshape(
                cnt + 1, tf, tf
            )
    out = []
    for cls in range(len(ftf)):
        # corrections are shard-local partial sums; ftf was already psummed
        # inside block_diag_jtj.
        out.append(ftf[cls] - jac_f._psum(corrections[cls][:-1]))
    return out


def _apply_ete_rows(ete_solver, e_cls, e_rows, etf):
    """Apply M^{-1} (factorized per e-block) to per-row [te, tf] matrices:
    fetch each row's Cholesky factor by its class row index (a row take)."""
    chol = jnp.take(ete_solver.factors[e_cls], e_rows, axis=0)  # [n, te, te]
    return jax.vmap(lambda c, m: jax.scipy.linalg.cho_solve((c, True), m))(chol, etf)


def _chunked_correction(
    ete_solver, e_cls, e_jac, e_tr, f_jac, f_tr, n, r, te, tf, num_segments,
    chunk: int = 131_072,
):
    """segment_sum over f-blocks of F^T E M^{-1} E^T F per residual block.

    e_jac/f_jac are flat [n*r*t]; computed chunk-wise with flattened
    [chunk, tf*tf] accumulation (a full [n, tf, tf] would be TPU-tile-padded
    ~32x and OOM at BA scale)."""

    def corr_chunk(ej, fj, etr):
        etf = jnp.einsum("nre,nrf->nef", ej, fj)  # [c, te, tf]
        minv = _apply_ete_rows(ete_solver, e_cls, etr, etf)
        return jnp.einsum("nef,neg->nfg", minv, etf).reshape(-1, tf * tf)

    if n <= chunk:
        return jax.ops.segment_sum(
            corr_chunk(e_jac.reshape(n, r, te), f_jac.reshape(n, r, tf), e_tr),
            f_tr,
            num_segments=num_segments,
        )

    nchunks = -(-n // chunk)

    def body(i, acc):
        ej = jax.lax.dynamic_slice(
            e_jac, (i * chunk * r * te,), (chunk * r * te,)
        ).reshape(chunk, r, te)
        fj = jax.lax.dynamic_slice(
            f_jac, (i * chunk * r * tf,), (chunk * r * tf,)
        ).reshape(chunk, r, tf)
        etr = jax.lax.dynamic_slice(e_tr, (i * chunk,), (chunk,))
        ftr = jax.lax.dynamic_slice(f_tr, (i * chunk,), (chunk,))
        return acc + jax.ops.segment_sum(
            corr_chunk(ej, fj, etr), ftr, num_segments=num_segments
        )

    init = jnp.zeros((num_segments, tf * tf), e_jac.dtype)
    return jax.lax.fori_loop(0, nchunks, body, init)


def schur_solve(program, options, jac_s, res_groups, grad_s, dsq):
    """Solve (J^T J + diag(dsq)) step = -grad via the Schur complement.

    Implicit S (ITERATIVE_SCHUR) with PCG, or dense S (DENSE_SCHUR /
    SPARSE_SCHUR fallback) materialized through the implicit operator.
    Returns (step [num_eff], linear iterations).
    """
    dtype = grad_s.dtype
    e_mask_np, f_mask_np = program.schur_tangent_masks()
    e_mask = jnp.asarray(e_mask_np, dtype=dtype)
    f_mask = jnp.asarray(f_mask_np, dtype=dtype)

    jac_e, jac_f = schur_views(program, jac_s)
    dsq_e = dsq * e_mask
    dsq_f = dsq * f_mask
    g_e = grad_s * e_mask
    g_f = grad_s * f_mask

    ete = make_ete_solver(program, jac_e, dsq_e)

    def s_apply(y):
        t1 = jac_f.right_multiply(y)  # F y, group residual batches
        ett1 = jac_e.left_multiply(t1)  # E^T F y
        t2 = ete(ett1)
        et2 = jac_e.right_multiply(t2)  # E t2, residual space
        diff = [a - b for a, b in zip(t1, et2)]
        return jac_f.left_multiply(diff) + dsq_f * y

    # rhs = -g_f + F^T E M^{-1} g_e
    t2 = ete(g_e)
    et2 = jac_e.right_multiply(t2)
    rhs = -g_f + jac_f.left_multiply(et2)

    if options.linear_solver_type == LinearSolverType.ITERATIVE_SCHUR:
        if options.preconditioner_type == PreconditionerType.SCHUR_JACOBI:
            blocks = schur_jacobi_blocks(program, jac_e, jac_f, ete, dsq_f)
            prec = BlockDiagSolver(program, blocks)
        elif options.preconditioner_type == PreconditionerType.JACOBI:
            blocks = jac_f.block_diag_jtj(dsq=dsq_f)
            prec = BlockDiagSolver(program, blocks)
        elif options.preconditioner_type in (
            PreconditionerType.CLUSTER_JACOBI,
            PreconditionerType.CLUSTER_TRIDIAGONAL,
        ):
            from .visibility import VisibilityPreconditioner

            prec = VisibilityPreconditioner(
                program,
                jac_e,
                jac_f,
                ete,
                dsq_f,
                options.preconditioner_type,
                options.visibility_clustering_type,
            )
        elif (
            options.preconditioner_type
            == PreconditionerType.SCHUR_POWER_SERIES_EXPANSION
        ):
            # M^{-1} v ~ truncated Neumann series around P = blockdiag(S):
            # y <- y + P^{-1}(v - S y), a fixed number of fixed-point steps.
            # reference: power_series_expansion_preconditioner.cc.
            blocks = schur_jacobi_blocks(program, jac_e, jac_f, ete, dsq_f)
            pinv = BlockDiagSolver(program, blocks)
            iters = max(1, options.max_num_spse_iterations)

            def prec(v, _pinv=pinv, _iters=iters):
                y0 = _pinv(v)

                def body(_, y):
                    return y + _pinv(v - s_apply(y))

                return jax.lax.fori_loop(0, _iters - 1, body, y0)
        else:
            prec = None
        result = conjugate_gradients(
            matvec=s_apply,
            b=rhs,
            preconditioner=prec,
            max_iterations=options.max_linear_solver_iterations,
            min_iterations=options.min_linear_solver_iterations,
            tolerance=options.eta,
        )
        dx_f = result.x * f_mask
        lin_iters = result.iterations
    else:
        # DENSE_SCHUR (and SPARSE_SCHUR capability fallback): materialize S
        # restricted to f-coordinates through the implicit operator — a
        # batched matvec (= one big matmul on the MXU) — then Cholesky.
        # reference: schur_complement_solver.cc dense path.
        nf = int(f_mask_np.sum())
        f_positions = jnp.asarray(_np_nonzero(f_mask_np), dtype=jnp.int32)
        basis = jnp.zeros((nf, grad_s.shape[0]), dtype=dtype)
        basis = basis.at[jnp.arange(nf), f_positions].set(1.0)
        s_cols = jax.vmap(s_apply)(basis)  # [nf, num_eff]
        s_dense = s_cols[:, f_positions]  # [nf, nf]
        rhs_f = rhs[f_positions]
        chol, low = jax.scipy.linalg.cho_factor(s_dense, lower=True)
        y = jax.scipy.linalg.cho_solve((chol, low), rhs_f)
        dx_f = jnp.zeros_like(grad_s).at[f_positions].set(y)
        lin_iters = jnp.asarray(1, jnp.int32)

    # back-substitute e-part: dx_e = -M^{-1} (g_e + E^T F dx_f)
    fdx = jac_f.right_multiply(dx_f)
    etfdx = jac_e.left_multiply(fdx)
    dx_e = -ete(g_e + etfdx) * e_mask
    return dx_f + dx_e, lin_iters


def _np_nonzero(mask):
    import numpy as np

    return np.nonzero(mask)[0]
