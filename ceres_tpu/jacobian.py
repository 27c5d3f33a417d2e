"""BlockJacobian: the matrix-free Jacobian operator (flat storage, chunked).

TPU-native replacement for the reference's materialized sparse Jacobians
(BlockSparseMatrix, block_sparse_matrix.cc; CompressedRowSparseMatrix) and
their CUDA views. Two hardware facts drive the design (measured on v5e at
5M observations):

1. element gathers/scatters are ~7x slower than row takes / segment-sums;
2. ANY materialized [n, small] tensor is tile-padded (minor dim -> 128,
   second-minor -> 8): f32[5M,2,3] costs 42.7x its logical size and OOMs.

So the Jacobian block tensors live as FLAT 1-D arrays [n*r*t] (T(1024)
tiling, zero padding), and every product

    J v, J^T u, J^T J v, column norms, per-block Gram blocks

runs as a fori_loop over row chunks: slice flat -> reshape [chunk, r, t]
(small, transient) -> einsum + row-take / segment-sum -> accumulate. Group
row counts are padded to a chunk multiple at array-build time (masked rows),
so the loops are exact.

Registered as a JAX pytree; under sharding the flats are shard-local slices
and all tangent-space reductions psum over the mesh axis.
"""

from __future__ import annotations

from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

CHUNK = 262_144  # rows per chunk in streamed products


def _window_sum(x2d, d: int):
    """Sum consecutive groups of d rows: [n*d, k] -> [n, k] via
    reduce_window (avoids a tile-padded 3-D reshape transient)."""
    return jax.lax.reduce_window(
        x2d,
        jnp.zeros((), x2d.dtype),
        jax.lax.add,
        window_dimensions=(d, 1),
        window_strides=(d, 1),
        padding="VALID",
    )


def _nchunks(n: int, chunk: int = None) -> int:
    chunk = chunk or CHUNK
    return max(1, -(-n // chunk))


def segment_outer_flat(jac_flat, tr, n, r, t, num_segments, chunk: int = None):
    """segment_sum of per-row Gram blocks J_i^T J_i from a flat [n*r*t]
    jacobian; returns [num_segments, t*t]. Chunked + flattened to avoid
    TPU tile padding."""
    chunk = chunk or CHUNK
    if n <= chunk:
        jl = jac_flat.reshape(n, r, t)
        outer = jnp.einsum("nrp,nrq->npq", jl, jl).reshape(n, t * t)
        return jax.ops.segment_sum(outer, tr, num_segments=num_segments)

    nc = _nchunks(n, chunk)

    def body(i, acc):
        jl = jax.lax.dynamic_slice(
            jac_flat, (i * chunk * r * t,), (chunk * r * t,)
        ).reshape(chunk, r, t)
        trl = jax.lax.dynamic_slice(tr, (i * chunk,), (chunk,))
        outer = jnp.einsum("nrp,nrq->npq", jl, jl).reshape(chunk, t * t)
        return acc + jax.ops.segment_sum(outer, trl, num_segments=num_segments)

    init = jnp.zeros((num_segments, t * t), jac_flat.dtype)
    return jax.lax.fori_loop(0, nc, body, init)


@jax.tree_util.register_pytree_node_class
class BlockJacobian:
    def __init__(self, program, jac_groups, t_rows, axis_name=None, positions=None):
        self.program = program
        self.jac_groups = jac_groups  # tuple over groups of tuple over pos: flat [n*r*t]
        self.t_rows = t_rows  # tuple over groups of tuple over pos [n]
        self.axis_name = axis_name
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
        half of the Schur partition (reference: partitioned_matrix_view_impl.h)."""
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

    def _group_n(self, gi) -> int:
        """Row count of group gi (from the live arrays — padded under
        sharding/chunking)."""
        if self.t_rows[gi]:
            return self.t_rows[gi][0].shape[0]
        return self.program.groups[gi].n

    def _iter(self, gi):
        """Yields (vpos, pos_meta, jac_flat, t_rows) for group gi."""
        meta = self.program.groups[gi]
        for vpos, (jac, tr) in enumerate(zip(self.jac_groups[gi], self.t_rows[gi])):
            pm = meta.positions[self.positions[gi][vpos]]
            yield vpos, pm, jac, tr

    def _seg_buckets(self, gi, vpos):
        """Bucket metadata for the scatter-free reduction, or None.

        Valid only for the global (unsharded) row layout: shard-local slices
        break the bucket boundaries, so sharded Jacobians fall back to
        segment_sum."""
        if self.axis_name is not None:
            return None
        meta = self.program.groups[gi]
        if not meta.seg_reduce:
            return None
        return meta.seg_reduce.get(self.positions[gi][vpos])

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
        """J v: tangent vector [num_cols] -> per-group flat residuals [n*r].

        reference: BlockSparseMatrix::RightMultiplyAndAccumulate.
        """
        vt = self._v_tables(v)
        out = []
        for gi in range(len(self.jac_groups)):
            meta = self.program.groups[gi]
            n = self._group_n(gi)
            r = meta.num_residuals
            acc = jnp.zeros(n * r, self._dtype())
            nc = _nchunks(n)
            chunk = min(n, CHUNK)

            for vpos, pm, jac, tr in self._iter(gi):
                if pm.t_cls < 0:
                    continue
                t = pm.tangent_size
                table = vt[pm.t_cls]

                if n <= CHUNK:
                    rows = jnp.take(table, tr, axis=0)
                    jl = jac.reshape(n, r, t)
                    acc = acc + jnp.einsum("nrt,nt->nr", jl, rows).reshape(-1)
                    continue

                def body(i, a, jac=jac, tr=tr, table=table, t=t):
                    jl = jax.lax.dynamic_slice(
                        jac, (i * chunk * r * t,), (chunk * r * t,)
                    ).reshape(chunk, r, t)
                    trl = jax.lax.dynamic_slice(tr, (i * chunk,), (chunk,))
                    rows = jnp.take(table, trl, axis=0)
                    term = jnp.einsum("nrt,nt->nr", jl, rows).reshape(-1)
                    return jax.lax.dynamic_update_slice(
                        a,
                        jax.lax.dynamic_slice(a, (i * chunk * r,), (chunk * r,))
                        + term,
                        (i * chunk * r,),
                    )

                acc = jax.lax.fori_loop(0, nc, body, acc)
            out.append(acc)
        return out

    def left_multiply(self, u_groups):
        """J^T u for per-group flat residuals u [n*r] -> [num_cols].

        reference: BlockSparseMatrix::LeftMultiplyAndAccumulate; the
        reference's atomicAdd becomes a deterministic segment-sum.
        """
        acc = self._class_accumulators()
        for gi in range(len(self.jac_groups)):
            meta = self.program.groups[gi]
            n = self._group_n(gi)
            r = meta.num_residuals
            u = u_groups[gi]
            chunk = min(n, CHUNK)
            nc = _nchunks(n)

            for vpos, pm, jac, tr in self._iter(gi):
                if pm.t_cls < 0:
                    continue
                t = pm.tangent_size
                cnt = self.program.tangent_class_counts[pm.t_cls]

                seg = self._seg_buckets(gi, vpos)
                if seg is not None:
                    table = jnp.zeros((cnt + 1, t), self._dtype())
                    for (row_start, n_seg, d, out_row) in seg:
                        jl = jax.lax.dynamic_slice(
                            jac, (row_start * r * t,), (n_seg * d * r * t,)
                        ).reshape(n_seg * d, r, t)
                        ul = jax.lax.dynamic_slice(
                            u, (row_start * r,), (n_seg * d * r,)
                        ).reshape(n_seg * d, r)
                        contrib = jnp.einsum("nrt,nr->nt", jl, ul)
                        if d > 1:
                            contrib = _window_sum(contrib, d)
                        table = jax.lax.dynamic_update_slice(
                            table, contrib, (out_row, 0)
                        )
                    acc[pm.t_cls] = acc[pm.t_cls] + table
                    continue

                if n <= CHUNK:
                    jl = jac.reshape(n, r, t)
                    contrib = jnp.einsum("nrt,nr->nt", jl, u.reshape(n, r))
                    acc[pm.t_cls] = acc[pm.t_cls] + jax.ops.segment_sum(
                        contrib, tr, num_segments=cnt + 1
                    )
                    continue

                def body(i, a, jac=jac, tr=tr, t=t, cnt=cnt):
                    jl = jax.lax.dynamic_slice(
                        jac, (i * chunk * r * t,), (chunk * r * t,)
                    ).reshape(chunk, r, t)
                    ul = jax.lax.dynamic_slice(
                        u, (i * chunk * r,), (chunk * r,)
                    ).reshape(chunk, r)
                    trl = jax.lax.dynamic_slice(tr, (i * chunk,), (chunk,))
                    contrib = jnp.einsum("nrt,nr->nt", jl, ul)
                    return a + jax.ops.segment_sum(
                        contrib, trl, num_segments=cnt + 1
                    )

                acc[pm.t_cls] = jax.lax.fori_loop(0, nc, body, acc[pm.t_cls])
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
        """Per-tangent-column sum of squares (LM diagonal / Jacobi scaling)."""
        acc = self._class_accumulators()
        for gi in range(len(self.jac_groups)):
            meta = self.program.groups[gi]
            n = self._group_n(gi)
            r = meta.num_residuals
            chunk = min(n, CHUNK)
            nc = _nchunks(n)
            for vpos, pm, jac, tr in self._iter(gi):
                if pm.t_cls < 0:
                    continue
                t = pm.tangent_size
                cnt = self.program.tangent_class_counts[pm.t_cls]

                seg = self._seg_buckets(gi, vpos)
                if seg is not None:
                    table = jnp.zeros((cnt + 1, t), self._dtype())
                    for (row_start, n_seg, d, out_row) in seg:
                        jl = jax.lax.dynamic_slice(
                            jac, (row_start * r * t,), (n_seg * d * r * t,)
                        ).reshape(n_seg * d, r, t)
                        contrib = jnp.sum(jl * jl, axis=1)
                        if d > 1:
                            contrib = _window_sum(contrib, d)
                        table = jax.lax.dynamic_update_slice(
                            table, contrib, (out_row, 0)
                        )
                    acc[pm.t_cls] = acc[pm.t_cls] + table
                    continue

                if n <= CHUNK:
                    jl = jac.reshape(n, r, t)
                    acc[pm.t_cls] = acc[pm.t_cls] + jax.ops.segment_sum(
                        jnp.sum(jl * jl, axis=1), tr, num_segments=cnt + 1
                    )
                    continue

                def body(i, a, jac=jac, tr=tr, t=t, cnt=cnt):
                    jl = jax.lax.dynamic_slice(
                        jac, (i * chunk * r * t,), (chunk * r * t,)
                    ).reshape(chunk, r, t)
                    trl = jax.lax.dynamic_slice(tr, (i * chunk,), (chunk,))
                    return a + jax.ops.segment_sum(
                        jnp.sum(jl * jl, axis=1), trl, num_segments=cnt + 1
                    )

                acc[pm.t_cls] = jax.lax.fori_loop(0, nc, body, acc[pm.t_cls])
        return self._psum(self._flatten_classes(acc))

    def scale_columns(self, scale):
        """Return a new BlockJacobian with tangent columns scaled by `scale`
        (Jacobi scaling; reference: trust_region_minimizer.cc). Chunked so
        the scaled copy is written flat (unpadded)."""
        st = self._v_tables(scale)
        new_groups = []
        for gi in range(len(self.jac_groups)):
            meta = self.program.groups[gi]
            n = self._group_n(gi)
            r = meta.num_residuals
            chunk = min(n, CHUNK)
            nc = _nchunks(n)
            jacs = []
            for vpos, pm, jac, tr in self._iter(gi):
                if pm.t_cls < 0:
                    jacs.append(jac)
                    continue
                t = pm.tangent_size
                table = st[pm.t_cls]

                if n <= CHUNK:
                    rows = jnp.take(table, tr, axis=0)
                    jl = jac.reshape(n, r, t)
                    jacs.append((jl * rows[:, None, :]).reshape(-1))
                    continue

                def body(i, a, jac=jac, tr=tr, table=table, t=t):
                    jl = jax.lax.dynamic_slice(
                        jac, (i * chunk * r * t,), (chunk * r * t,)
                    ).reshape(chunk, r, t)
                    trl = jax.lax.dynamic_slice(tr, (i * chunk,), (chunk,))
                    rows = jnp.take(table, trl, axis=0)
                    return jax.lax.dynamic_update_slice(
                        a,
                        (jl * rows[:, None, :]).reshape(-1),
                        (i * chunk * r * t,),
                    )

                jacs.append(jax.lax.fori_loop(0, nc, body, jnp.zeros_like(jac)))
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
            jnp.zeros((cnt + 1, s * s), dtype)
            for cnt, s in zip(p.tangent_class_counts, p.tangent_class_sizes)
        ]
        for gi in range(len(self.jac_groups)):
            meta = self.program.groups[gi]
            n = self._group_n(gi)
            r = meta.num_residuals
            for vpos, pm, jac, tr in self._iter(gi):
                if pm.t_cls < 0:
                    continue
                if class_ids is not None and pm.t_cls not in class_ids:
                    continue
                cnt = p.tangent_class_counts[pm.t_cls]
                t = pm.tangent_size

                # NOTE: no bucketed path here. The [n, t, t] outer-product
                # form measured pathological on TPU either way: the
                # reduce_window variant compiles for 25+ min through the
                # relay, and folding the degree-sum into a batched einsum
                # runs 12x slower than segment_sum (tiny t x t matmuls
                # don't tile the MXU). segment_sum stays the fast path.
                per_class[pm.t_cls] = per_class[pm.t_cls] + segment_outer_flat(
                    jac, tr, n, r, t, cnt + 1
                )
        out = []
        if dsq is not None:
            from .evaluator import tangent_tables

            dt = tangent_tables(p, dsq)
        for cls, acc in enumerate(per_class):
            s = p.tangent_class_sizes[cls]
            acc = self._psum(acc[:-1]).reshape(-1, s, s)
            if dsq is not None:
                acc = acc + jax.vmap(jnp.diag)(dt[cls])
            out.append(acc)
        return out

    # -- materialization (small problems / parity export) ----------------- #

    def to_dense(self):
        """Dense [num_rows, num_cols] Jacobian (small problems / tests)."""
        dtype = self._dtype()
        num_cols_pad = self.num_cols + max(
            (self.program.tangent_class_sizes or [1])
        )
        a = jnp.zeros((self.num_rows, num_cols_pad), dtype=dtype)
        for gi in range(len(self.jac_groups)):
            meta = self.program.groups[gi]
            n_arr = self._group_n(gi)
            n, r = meta.n, meta.num_residuals  # logical rows (unpadded)
            rows = meta.row_offset + jnp.arange(n * r).reshape(n, r, 1)
            for vpos, pm, jac, tr in self._iter(gi):
                if pm.t_cls < 0:
                    continue
                cnt = self.program.tangent_class_counts[pm.t_cls]
                base = int(self.program.tangent_class_bases[pm.t_cls])
                t = pm.tangent_size
                jl = jac.reshape(n_arr, r, t)[:n]
                trl = tr[:n]
                col0 = jnp.where(trl < cnt, base + trl * t, self.num_cols)
                cols = col0[:, None, None] + jnp.arange(t)[None, None, :]
                cols = jnp.broadcast_to(cols, jl.shape)
                rr = jnp.broadcast_to(rows, jl.shape)
                a = a.at[rr, cols].add(jl)
        return a[:, : self.num_cols]

    def to_crs(self):
        """Host-side CRS triple (values, col_indices, row_pointers) over free
        tangent columns. reference: CompressedRowSparseMatrix layout."""
        rows_list, cols_list, vals_list = [], [], []
        for gi in range(len(self.jac_groups)):
            meta = self.program.groups[gi]
            n_arr = self._group_n(gi)
            n, r = meta.n, meta.num_residuals
            base_rows = meta.row_offset + np.arange(n * r).reshape(n, r, 1)
            for vpos, pm, jac, tr in self._iter(gi):
                if pm.t_cls < 0:
                    continue
                jl = np.asarray(jac).reshape(n_arr, r, pm.tangent_size)[:n]
                trl = np.asarray(tr)[:n]
                t = pm.tangent_size
                cnt = self.program.tangent_class_counts[pm.t_cls]
                base = int(self.program.tangent_class_bases[pm.t_cls])
                cols = base + trl[:, None, None] * t + np.arange(t)[None, None, :]
                cols = np.broadcast_to(cols, (n, r, t)).reshape(-1)
                rows = np.broadcast_to(base_rows, (n, r, t)).reshape(-1)
                vals = jl.reshape(-1)
                keep = np.broadcast_to(
                    (trl < cnt)[:, None, None], (n, r, t)
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
