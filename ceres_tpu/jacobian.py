"""BlockJacobian: the matrix-free Jacobian operator.

TPU-native replacement for the reference's materialized sparse Jacobians
(BlockSparseMatrix, block_sparse_matrix.cc; CompressedRowSparseMatrix) and
their CUDA views (cuda_block_sparse_crs_view.cc): the Jacobian is kept as
per-signature-group dense tensors [n_blocks, r, tangent_size] plus gather /
scatter index tables, and every consumer product

    J v, J^T u, J^T J v, squared column norms, per-block J_i^T J_i

is an einsum + gather/scatter-add — MXU/VPU-shaped and fusion-friendly,
never materializing global sparsity (the design translation table in
SURVEY.md §7). `to_dense`/`to_crs` exist for small problems and parity
export only.

Registered as a JAX pytree so it flows through jit / lax loops / shard_map.
Under sharding (axis_name set) the group tensors are shard-local slices and
all tangent-space reductions psum over the mesh axis.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np


@jax.tree_util.register_pytree_node_class
class BlockJacobian:
    def __init__(self, program, jac_groups, t_idx, c_idx, axis_name=None, positions=None):
        self.program = program
        self.jac_groups = jac_groups  # tuple over groups of tuple over pos [n,r,t]
        self.t_idx = t_idx  # tuple over groups of tuple over pos [n,t]
        self.c_idx = c_idx  # tuple over groups of tuple over pos [n]
        self.axis_name = axis_name
        # original position index of each retained position, per group
        # (identity unless this is a position view, e.g. the E or F half of a
        # Schur partition — reference: PartitionedMatrixView).
        if positions is None:
            positions = tuple(
                tuple(range(len(jacs))) for jacs in jac_groups
            )
        self.positions = positions

    # -- pytree protocol ------------------------------------------------ #

    def tree_flatten(self):
        children = (self.jac_groups, self.t_idx, self.c_idx)
        aux = (self.program, self.axis_name, self.positions)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        program, axis_name, positions = aux
        jac_groups, t_idx, c_idx = children
        return cls(program, jac_groups, t_idx, c_idx, axis_name, positions)

    @classmethod
    def build(cls, program, arrays, jac_groups, axis_name=None):
        t_idx = tuple(g["t_idx"] for g in arrays["groups"])
        c_idx = tuple(g["c_idx"] for g in arrays["groups"])
        return cls(program, tuple(jac_groups), t_idx, c_idx, axis_name)

    def position_view(self, keep_positions):
        """Restrict to a subset of parameter positions per group — the E or F
        half of the Schur partition (reference: partitioned_matrix_view_impl.h
        views J as [E F] without copying).

        keep_positions: list over groups of iterables of *original* position
        indices to retain.
        """
        jac_groups, t_idx, c_idx, positions = [], [], [], []
        for gi, keep in enumerate(keep_positions):
            keep = tuple(keep)
            orig = self.positions[gi]
            sel = tuple(orig.index(p) for p in keep)
            jac_groups.append(tuple(self.jac_groups[gi][s] for s in sel))
            t_idx.append(tuple(self.t_idx[gi][s] for s in sel))
            c_idx.append(tuple(self.c_idx[gi][s] for s in sel))
            positions.append(keep)
        return BlockJacobian(
            self.program,
            tuple(jac_groups),
            tuple(t_idx),
            tuple(c_idx),
            self.axis_name,
            tuple(positions),
        )

    # -- shapes ---------------------------------------------------------- #

    @property
    def num_cols(self) -> int:
        return self.program.num_effective_parameters

    @property
    def num_rows(self) -> int:
        return self.program.num_residuals

    def _psum(self, x):
        return jax.lax.psum(x, self.axis_name) if self.axis_name else x

    def _pad(self, v):
        return jnp.concatenate([v, jnp.zeros((1,), dtype=v.dtype)])

    # -- products --------------------------------------------------------- #

    def right_multiply(self, v):
        """J v: tangent vector [num_cols] -> per-group residual batches [n, r].

        reference: BlockSparseMatrix::RightMultiplyAndAccumulate.
        """
        v_pad = self._pad(v)
        out = []
        for jacs, tix in zip(self.jac_groups, self.t_idx):
            acc = None
            for jac, ti in zip(jacs, tix):
                term = jnp.einsum("nrt,nt->nr", jac, v_pad[ti])
                acc = term if acc is None else acc + term
            out.append(acc)
        return out

    def left_multiply(self, u_groups):
        """J^T u for per-group residual batches u [n, r] -> [num_cols].

        reference: BlockSparseMatrix::LeftMultiplyAndAccumulate; the
        reference's atomicAdd reduction becomes a deterministic scatter-add.
        """
        out = jnp.zeros(self.num_cols + 1, dtype=u_groups[0].dtype)
        for jacs, tix, u in zip(self.jac_groups, self.t_idx, u_groups):
            for jac, ti in zip(jacs, tix):
                out = out.at[ti].add(jnp.einsum("nrt,nr->nt", jac, u))
        return self._psum(out[: self.num_cols])

    def jtj_multiply(self, v, dsq=None):
        """(J^T J + diag(dsq)) v — the CGNR/LM normal-equations operator.

        reference: CgnrSolver operator (cgnr_solver.cc:219-242).
        """
        jv = self.right_multiply(v)
        out = self.left_multiply(jv)
        if dsq is not None:
            out = out + dsq * v
        return out

    def squared_column_norms(self):
        """Per-tangent-column sum of squares (LM diagonal / Jacobi scaling).

        reference: BlockSparseMatrix::SquaredColumnNorm,
        levenberg_marquardt_strategy.cc:83-95.
        """
        out = jnp.zeros(self.num_cols + 1, dtype=self.jac_groups[0][0].dtype)
        for jacs, tix in zip(self.jac_groups, self.t_idx):
            for jac, ti in zip(jacs, tix):
                out = out.at[ti].add(jnp.sum(jac * jac, axis=1))
        return self._psum(out[: self.num_cols])

    def scale_columns(self, scale):
        """Return a new BlockJacobian with tangent columns scaled by `scale`
        (Jacobi scaling; reference: trust_region_minimizer.cc jacobian_scaling_)."""
        s_pad = jnp.concatenate([scale, jnp.ones((1,), dtype=scale.dtype)])
        new_groups = []
        for jacs, tix in zip(self.jac_groups, self.t_idx):
            new_groups.append(
                tuple(
                    jac * s_pad[ti][:, None, :] for jac, ti in zip(jacs, tix)
                )
            )
        return BlockJacobian(
            self.program,
            tuple(new_groups),
            self.t_idx,
            self.c_idx,
            self.axis_name,
            self.positions,
        )

    # -- block-diagonal J^T J  ------------------------------------------- #

    def block_diag_jtj(self, dsq=None, class_ids=None):
        """Per-parameter-block diagonal blocks of J^T J (+ diag(dsq)).

        Returns a list over tangent-size classes of [count, s, s] batches —
        the input of the JACOBI preconditioner and of (E^T E)^{-1} in the
        implicit Schur path. reference: block_jacobi_preconditioner.cc.
        """
        program = self.program
        dtype = self.jac_groups[0][0].dtype if self.jac_groups else jnp.float32
        per_class = [
            jnp.zeros((count + 1, s, s), dtype=dtype)
            for s, count in zip(program.class_tsizes, program.class_counts)
        ]
        for gi, (jacs, cix) in enumerate(zip(self.jac_groups, self.c_idx)):
            meta = program.groups[gi]
            for vpos, (jac, ci) in enumerate(zip(jacs, cix)):
                pos = self.positions[gi][vpos]
                tsize = meta.positions[pos].tangent_size
                cls = program.class_of_tsize.get(tsize)
                if cls is None:
                    continue
                if class_ids is not None and cls not in class_ids:
                    continue
                jtj = jnp.einsum("nrp,nrq->npq", jac, jac)
                per_class[cls] = per_class[cls].at[ci].add(jtj)
        out = []
        for cls, acc in enumerate(per_class):
            acc = acc[:-1]  # trim dump slot
            acc = self._psum(acc)
            if dsq is not None:
                # gather this class's diagonal entries of dsq
                toff = jnp.asarray(program.class_t_offsets[cls])
                s = program.class_tsizes[cls]
                idx = toff[:, None] + jnp.arange(s)[None, :]
                d = self._pad(dsq)[idx]  # [count, s]
                acc = acc + jax.vmap(jnp.diag)(d)
            out.append(acc)
        return out

    # -- materialization (small problems / parity export) ----------------- #

    def to_dense(self):
        """Dense [num_rows, num_cols] Jacobian (DENSE_QR/DENSE_NORMAL_CHOLESKY
        path and tests; reference: DenseSparseMatrix)."""
        dtype = self.jac_groups[0][0].dtype
        a = jnp.zeros((self.num_rows, self.num_cols + 1), dtype=dtype)
        for gi, (jacs, tix) in enumerate(zip(self.jac_groups, self.t_idx)):
            meta = self.program.groups[gi]
            n, r = meta.n, meta.num_residuals
            rows = meta.row_offset + jnp.arange(n * r).reshape(n, r, 1)
            for jac, ti in zip(jacs, tix):
                cols = jnp.broadcast_to(ti[:, None, :], jac.shape)
                rr = jnp.broadcast_to(rows, jac.shape)
                a = a.at[rr, cols].add(jac)
        return a[:, : self.num_cols]

    def to_crs(self):
        """Host-side CRS triple (values, col_indices, row_pointers) over free
        tangent columns. reference: CompressedRowSparseMatrix layout."""
        rows_list, cols_list, vals_list = [], [], []
        for gi, (jacs, tix) in enumerate(zip(self.jac_groups, self.t_idx)):
            meta = self.program.groups[gi]
            n, r = meta.n, meta.num_residuals
            base_rows = meta.row_offset + np.arange(n * r).reshape(n, r, 1)
            for jac, ti in zip(jacs, tix):
                jac = np.asarray(jac)
                ti = np.asarray(ti)
                t = jac.shape[-1]
                rows = np.broadcast_to(base_rows, (n, r, t)).reshape(-1)
                cols = np.broadcast_to(ti[:, None, :], (n, r, t)).reshape(-1)
                vals = jac.reshape(-1)
                keep = cols < self.num_cols  # drop constant-block dump columns
                rows_list.append(rows[keep])
                cols_list.append(cols[keep])
                vals_list.append(vals[keep])
        if not rows_list:
            return (
                np.zeros(0),
                np.zeros(0, dtype=np.int32),
                np.zeros(self.num_rows + 1, dtype=np.int32),
            )
        rows = np.concatenate(rows_list)
        cols = np.concatenate(cols_list)
        vals = np.concatenate(vals_list)
        order = np.lexsort((cols, rows))
        rows, cols, vals = rows[order], cols[order], vals[order]
        row_ptr = np.zeros(self.num_rows + 1, dtype=np.int64)
        np.add.at(row_ptr, rows + 1, 1)
        row_ptr = np.cumsum(row_ptr)
        return vals, cols.astype(np.int32), row_ptr.astype(np.int32)
