"""BlockJacobian: the matrix-free Jacobian operator.

TPU-native replacement for the reference's materialized sparse Jacobians
(BlockSparseMatrix, block_sparse_matrix.cc; CompressedRowSparseMatrix) and
their CUDA views (cuda_block_sparse_crs_view.cc): the Jacobian is kept as
per-signature-group dense tensors [n_blocks, r, tangent_size] plus row
tables into the class-contiguous tangent layout, and every consumer product

    J v, J^T u, J^T J v, squared column norms, per-block J_i^T J_i

is an einsum + row take / segment-sum — never element gathers or scatters,
never materializing global sparsity (the design translation table in
SURVEY.md §7; the row-op layout is the measured 7x TPU win over element
indexing). `to_dense`/`to_crs` exist for small problems and parity export.

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
    def __init__(self, program, jac_groups, t_rows, axis_name=None, positions=None):
        self.program = program
        self.jac_groups = jac_groups  # tuple over groups of tuple over pos [n,r,t]
        self.t_rows = t_rows  # tuple over groups of tuple over pos [n]
        self.axis_name = axis_name
        # original position index of each retained position, per group
        # (identity unless this is a position view, e.g. the E or F half of a
        # Schur partition — reference: PartitionedMatrixView).
        if positions is None:
            positions = tuple(tuple(range(len(jacs))) for jacs in jac_groups)
        self.positions = positions

    # -- pytree protocol ------------------------------------------------ #

    def tree_flatten(self):
        children = (self.jac_groups, self.t_rows)
        aux = (self.program, self.axis_name, self.positions)
        return children, aux

    @classmethod
    def tree_unflatten(cls, aux, children):
        program, axis_name, positions = aux
        jac_groups, t_rows = children
        return cls(program, jac_groups, t_rows, axis_name, positions)

    @classmethod
    def build(cls, program, arrays, jac_groups, axis_name=None):
        t_rows = tuple(g["t_rows"] for g in arrays["groups"])
        return cls(program, tuple(jac_groups), t_rows, axis_name)

    def position_view(self, keep_positions):
        """Restrict to a subset of parameter positions per group — the E or F
        half of the Schur partition (reference: partitioned_matrix_view_impl.h
        views J as [E F] without copying)."""
        jac_groups, t_rows, positions = [], [], []
        for gi, keep in enumerate(keep_positions):
            keep = tuple(keep)
            orig = self.positions[gi]
            sel = tuple(orig.index(p) for p in keep)
            jac_groups.append(tuple(self.jac_groups[gi][s] for s in sel))
            t_rows.append(tuple(self.t_rows[gi][s] for s in sel))
            positions.append(keep)
        return BlockJacobian(
            self.program,
            tuple(jac_groups),
            tuple(t_rows),
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

    def _dtype(self):
        for jacs in self.jac_groups:
            for j in jacs:
                return j.dtype
        return jnp.float32

    def _iter(self, gi):
        """Yields (pos_meta, jac, t_rows) for group gi."""
        meta = self.program.groups[gi]
        for vpos, (jac, tr) in enumerate(zip(self.jac_groups[gi], self.t_rows[gi])):
            pm = meta.positions[self.positions[gi][vpos]]
            yield pm, jac, tr

    def _v_tables(self, v):
        from .evaluator import tangent_tables

        return tangent_tables(self.program, v, pad_zero_row=True)

    def _class_accumulators(self):
        p = self.program
        dtype = self._dtype()
        return [
            jnp.zeros((cnt + 1, s), dtype)
            for cnt, s in zip(p.tangent_class_counts, p.tangent_class_sizes)
        ]

    def _flatten_classes(self, tables):
        from .evaluator import flatten_tangent

        return flatten_tangent(self.program, [t[:-1] for t in tables])

    # -- products --------------------------------------------------------- #

    def right_multiply(self, v):
        """J v: tangent vector [num_cols] -> per-group residual batches [n, r].

        reference: BlockSparseMatrix::RightMultiplyAndAccumulate.
        """
        vt = self._v_tables(v)
        out = []
        for gi in range(len(self.jac_groups)):
            acc = None
            for pm, jac, tr in self._iter(gi):
                if pm.t_cls < 0:
                    continue
                rows = jnp.take(vt[pm.t_cls], tr, axis=0)  # [n, t]
                term = jnp.einsum("nrt,nt->nr", jac, rows)
                acc = term if acc is None else acc + term
            if acc is None:
                meta = self.program.groups[gi]
                n = self.jac_groups[gi][0].shape[0] if self.jac_groups[gi] else meta.n
                acc = jnp.zeros((n, meta.num_residuals), self._dtype())
            out.append(acc)
        return out

    def left_multiply(self, u_groups):
        """J^T u for per-group residual batches u [n, r] -> [num_cols].

        reference: BlockSparseMatrix::LeftMultiplyAndAccumulate; the
        reference's atomicAdd becomes a deterministic segment-sum.
        """
        acc = self._class_accumulators()
        for gi in range(len(self.jac_groups)):
            u = u_groups[gi]
            for pm, jac, tr in self._iter(gi):
                if pm.t_cls < 0:
                    continue
                contrib = jnp.einsum("nrt,nr->nt", jac, u)
                cnt = self.program.tangent_class_counts[pm.t_cls]
                acc[pm.t_cls] = acc[pm.t_cls] + jax.ops.segment_sum(
                    contrib, tr, num_segments=cnt + 1
                )
        return self._psum(self._flatten_classes(acc))

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

        reference: BlockSparseMatrix::SquaredColumnNorm.
        """
        acc = self._class_accumulators()
        for gi in range(len(self.jac_groups)):
            for pm, jac, tr in self._iter(gi):
                if pm.t_cls < 0:
                    continue
                cnt = self.program.tangent_class_counts[pm.t_cls]
                acc[pm.t_cls] = acc[pm.t_cls] + jax.ops.segment_sum(
                    jnp.sum(jac * jac, axis=1), tr, num_segments=cnt + 1
                )
        return self._psum(self._flatten_classes(acc))

    def scale_columns(self, scale):
        """Return a new BlockJacobian with tangent columns scaled by `scale`
        (Jacobi scaling; reference: trust_region_minimizer.cc)."""
        st = self._v_tables(scale)
        new_groups = []
        for gi in range(len(self.jac_groups)):
            jacs = []
            for pm, jac, tr in self._iter(gi):
                if pm.t_cls < 0:
                    jacs.append(jac)
                    continue
                rows = jnp.take(st[pm.t_cls], tr, axis=0)  # [n, t]
                jacs.append(jac * rows[:, None, :])
            new_groups.append(tuple(jacs))
        return BlockJacobian(
            self.program,
            tuple(new_groups),
            self.t_rows,
            self.axis_name,
            self.positions,
        )

    # -- block-diagonal J^T J  ------------------------------------------- #

    def block_diag_jtj(self, dsq=None, class_ids=None):
        """Per-parameter-block diagonal blocks of J^T J (+ diag(dsq)).

        Returns a list over tangent classes of [count, s, s] batches — the
        input of the JACOBI preconditioner and of (E^T E)^{-1} in implicit
        Schur. reference: block_jacobi_preconditioner.cc.
        """
        p = self.program
        dtype = self._dtype()
        per_class = [
            jnp.zeros((cnt + 1, s, s), dtype)
            for cnt, s in zip(p.tangent_class_counts, p.tangent_class_sizes)
        ]
        for gi in range(len(self.jac_groups)):
            for pm, jac, tr in self._iter(gi):
                if pm.t_cls < 0:
                    continue
                if class_ids is not None and pm.t_cls not in class_ids:
                    continue
                jtj = jnp.einsum("nrp,nrq->npq", jac, jac)
                cnt = p.tangent_class_counts[pm.t_cls]
                per_class[pm.t_cls] = per_class[pm.t_cls] + jax.ops.segment_sum(
                    jtj, tr, num_segments=cnt + 1
                )
        out = []
        if dsq is not None:
            from .evaluator import tangent_tables

            dt = tangent_tables(p, dsq)
        for cls, acc in enumerate(per_class):
            acc = self._psum(acc[:-1])
            if dsq is not None:
                acc = acc + jax.vmap(jnp.diag)(dt[cls])
            out.append(acc)
        return out

    # -- materialization (small problems / parity export) ----------------- #

    def _global_cols(self, pm, tr):
        """Global tangent column indices [n, t] for a position (export)."""
        p = self.program
        base = int(p.tangent_class_bases[pm.t_cls])
        cnt = p.tangent_class_counts[pm.t_cls]
        t = pm.tangent_size
        # dump rows (== cnt) map past num_cols; callers mask them
        return base + tr[:, None] * t + jnp.arange(t)[None, :]

    def to_dense(self):
        """Dense [num_rows, num_cols] Jacobian (DENSE_QR/DENSE_NORMAL_CHOLESKY
        path and tests; reference: DenseSparseMatrix)."""
        dtype = self._dtype()
        num_cols_pad = self.num_cols + max(
            (self.program.tangent_class_sizes or [1])
        )
        a = jnp.zeros((self.num_rows, num_cols_pad), dtype=dtype)
        for gi in range(len(self.jac_groups)):
            meta = self.program.groups[gi]
            n, r = meta.n, meta.num_residuals
            rows = meta.row_offset + jnp.arange(n * r).reshape(n, r, 1)
            for pm, jac, tr in self._iter(gi):
                if pm.t_cls < 0:
                    continue
                cnt = self.program.tangent_class_counts[pm.t_cls]
                base = int(self.program.tangent_class_bases[pm.t_cls])
                t = pm.tangent_size
                # clamp dump rows into the padding area
                col0 = jnp.where(
                    tr < cnt, base + tr * t, self.num_cols
                )
                cols = col0[:, None, None] + jnp.arange(t)[None, None, :]
                cols = jnp.broadcast_to(cols, jac.shape)
                rr = jnp.broadcast_to(rows, jac.shape)
                a = a.at[rr, cols].add(jac)
        return a[:, : self.num_cols]

    def to_crs(self):
        """Host-side CRS triple (values, col_indices, row_pointers) over free
        tangent columns. reference: CompressedRowSparseMatrix layout."""
        rows_list, cols_list, vals_list = [], [], []
        for gi in range(len(self.jac_groups)):
            meta = self.program.groups[gi]
            n, r = meta.n, meta.num_residuals
            base_rows = meta.row_offset + np.arange(n * r).reshape(n, r, 1)
            for pm, jac, tr in self._iter(gi):
                if pm.t_cls < 0:
                    continue
                jac = np.asarray(jac)
                tr = np.asarray(tr)
                t = pm.tangent_size
                cnt = self.program.tangent_class_counts[pm.t_cls]
                base = int(self.program.tangent_class_bases[pm.t_cls])
                cols = (
                    base
                    + tr[:, None, None] * t
                    + np.arange(t)[None, None, :]
                )
                cols = np.broadcast_to(cols, (n, r, t)).reshape(-1)
                rows = np.broadcast_to(base_rows, (n, r, t)).reshape(-1)
                vals = jac.reshape(-1)
                keep = np.broadcast_to(
                    (tr < cnt)[:, None, None], (n, r, t)
                ).reshape(-1)
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
        from .io.native import coo_to_crs

        perm, row_ptr = coo_to_crs(rows, cols, self.num_rows)
        return vals[perm], cols[perm].astype(np.int32), row_ptr.astype(np.int32)
