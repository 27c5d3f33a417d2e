"""Program: the lowered, executable form of a Problem.

TPU-native counterpart of the reference's Program + preprocess step
(internal/ceres/program.cc, registered_cuda_evaluators.cc:226-280 Init): the
problem is compiled into

- a flat state vector layout (ambient offsets per block; tangent offsets per
  free block, with one trailing "dump" slot absorbing gradient/jacobian
  contributions of constant blocks — the functional replacement for the
  reference's per-block constancy flag checks),
- a Plus structure: one fused index-add for all Euclidean blocks plus vmapped
  batches per non-Euclidean manifold class (reference: Program::Plus,
  program.cc; ParameterBlockCUDA plus-Jacobian upload,
  registered_cuda_evaluators.cc:105-121),
- signature groups: residual blocks bucketed by (functor, residual size,
  param sizes, manifolds, loss) with gather/scatter index tables — the analog
  of the reference's per-type CUDA evaluators keyed by std::type_index
  (problem_cuda.h:462-468), which simultaneously solves XLA's static-shape
  requirement.

All index tables are numpy on the host; `arrays()` materializes the jnp
pytree consumed by the jitted evaluator (evaluator.py).
"""

from __future__ import annotations

import dataclasses
from typing import Optional

import numpy as np

from .autodiff import CostFunction
from .loss import LossFunction
from .manifolds import EuclideanManifold, Manifold


@dataclasses.dataclass(frozen=True)
class PositionMeta:
    """Static description of one parameter slot of a signature."""

    size: int
    tangent_size: int
    manifold: Optional[Manifold]  # None == Euclidean


@dataclasses.dataclass
class SigGroupMeta:
    """Static description of one signature group."""

    cost_function: CostFunction
    loss: Optional[LossFunction]
    positions: tuple
    n: int
    row_offset: int

    @property
    def num_residuals(self) -> int:
        return self.cost_function.num_residuals

    @property
    def rows(self) -> int:
        return self.n * self.num_residuals


@dataclasses.dataclass
class ManifoldGroupMeta:
    manifold: Manifold
    n: int


class Program:
    """Executable lowering of a Problem. See module docstring."""

    def __init__(self, blocks, batches):
        self._blocks = blocks
        self._batches = batches
        self._build_layout()
        self._build_plus_structure()
        self._build_classes()
        self._build_groups()
        self._evaluator = None

    def _build_classes(self):
        """Bucket free parameter blocks by tangent size.

        Per-class contiguous tables let block-diagonal JtJ (Jacobi /
        Schur-Jacobi preconditioners, (EtE)^-1 in implicit Schur) be computed
        as one batched [count, s, s] scatter-add + Cholesky per class — the
        TPU shape of the reference's per-block small dense blocks
        (block_jacobi_preconditioner.cc).
        """
        nb = len(self._blocks)
        self.block_class = np.full(nb, -1, dtype=np.int64)  # class id per block
        self.block_class_index = np.full(nb, -1, dtype=np.int64)  # index in class
        tsizes = sorted(
            {
                int(b.tangent_size)
                for b in self._blocks
                if not b.removed and not b.constant
            }
        )
        self.class_of_tsize = {s: i for i, s in enumerate(tsizes)}
        counts = [0] * len(tsizes)
        class_members: list[list[int]] = [[] for _ in tsizes]
        for b in self._blocks:
            if b.removed or b.constant:
                continue
            c = self.class_of_tsize[int(b.tangent_size)]
            self.block_class[b.index] = c
            self.block_class_index[b.index] = counts[c]
            class_members[c].append(b.index)
            counts[c] += 1
        self.class_tsizes = tsizes
        self.class_counts = counts
        # t_offset of each block in each class: [count] -> tangent offset
        self.class_t_offsets = [
            np.asarray([self.t_offsets[i] for i in members], dtype=np.int32)
            for members in class_members
        ]

    # ------------------------------------------------------------------ #
    # layout
    # ------------------------------------------------------------------ #

    def _build_layout(self):
        blocks = self._blocks
        nb = len(blocks)
        self.x_offsets = np.zeros(nb, dtype=np.int64)
        self.t_offsets = np.zeros(nb, dtype=np.int64)
        self.sizes = np.zeros(nb, dtype=np.int64)
        self.tangent_sizes = np.zeros(nb, dtype=np.int64)

        x_off = 0
        t_off = 0
        for b in blocks:
            self.x_offsets[b.index] = x_off
            self.sizes[b.index] = b.size
            self.tangent_sizes[b.index] = b.tangent_size
            if not b.removed:
                x_off += b.size
            if b.removed or b.constant:
                self.t_offsets[b.index] = -1
            else:
                self.t_offsets[b.index] = t_off
                t_off += b.tangent_size

        self.num_parameters = int(x_off)
        self.num_effective_parameters = int(t_off)

        self.state0 = np.zeros(self.num_parameters, dtype=np.float64)
        for b in blocks:
            if not b.removed:
                o = self.x_offsets[b.index]
                self.state0[o : o + b.size] = b.values

        # bounds (reference: ParameterBlock bounds clamping,
        # parameter_block.h PlusWithBoundsClamping)
        self.has_bounds = any(
            (b.lower_bound is not None or b.upper_bound is not None)
            for b in blocks
            if not b.removed
        )
        if self.has_bounds:
            self.lower_bound = np.full(self.num_parameters, -np.inf)
            self.upper_bound = np.full(self.num_parameters, np.inf)
            for b in blocks:
                if b.removed:
                    continue
                o = self.x_offsets[b.index]
                if b.lower_bound is not None:
                    self.lower_bound[o : o + b.size] = b.lower_bound
                if b.upper_bound is not None:
                    self.upper_bound[o : o + b.size] = b.upper_bound
        else:
            self.lower_bound = None
            self.upper_bound = None

    # ------------------------------------------------------------------ #
    # Plus structure
    # ------------------------------------------------------------------ #

    def _build_plus_structure(self):
        euclid_x, euclid_d = [], []
        mgroups: dict = {}
        for b in self._blocks:
            if b.removed or b.constant:
                continue
            xo, to = int(self.x_offsets[b.index]), int(self.t_offsets[b.index])
            m = b.manifold
            if m is None or isinstance(m, EuclideanManifold):
                euclid_x.append(np.arange(xo, xo + b.size))
                euclid_d.append(np.arange(to, to + b.size))
            else:
                key = m
                rec = mgroups.setdefault(key, {"x": [], "d": []})
                rec["x"].append(np.arange(xo, xo + m.ambient_size))
                rec["d"].append(np.arange(to, to + m.tangent_size))

        self.euclid_x_idx = (
            np.concatenate(euclid_x).astype(np.int32)
            if euclid_x
            else np.zeros(0, dtype=np.int32)
        )
        self.euclid_d_idx = (
            np.concatenate(euclid_d).astype(np.int32)
            if euclid_d
            else np.zeros(0, dtype=np.int32)
        )

        self.manifold_group_meta: list[ManifoldGroupMeta] = []
        self.manifold_group_idx: list[dict] = []
        for m, rec in mgroups.items():
            x_idx = np.stack(rec["x"]).astype(np.int32)
            d_idx = np.stack(rec["d"]).astype(np.int32)
            self.manifold_group_meta.append(ManifoldGroupMeta(m, x_idx.shape[0]))
            self.manifold_group_idx.append({"x_idx": x_idx, "d_idx": d_idx})

    # ------------------------------------------------------------------ #
    # signature groups
    # ------------------------------------------------------------------ #

    def _sig_key(self, batch):
        cf = batch.cost_function
        sizes = tuple(int(self.sizes[b]) for b in batch.param_ids[0])
        manifolds = tuple(
            None
            if (
                self._blocks[b].manifold is None
                or isinstance(self._blocks[b].manifold, EuclideanManifold)
            )
            else self._blocks[b].manifold
            for b in batch.param_ids[0]
        )
        data_sig = tuple(
            (np.asarray(d).shape[1:], np.asarray(d).dtype.str) for d in batch.data
        )
        return (cf.fn, cf.num_residuals, batch.loss, sizes, manifolds, data_sig)

    def _build_groups(self):
        # Bucket batches by signature. Within a batch all rows share one
        # signature *only if* every row's parameter blocks have identical
        # (size, manifold) tuples — enforced here by keying on row 0 and
        # verifying uniformity.
        buckets: dict = {}
        order: list = []
        self._handle_map: dict = {}  # (batch_idx, row) -> (group_idx, group_row)

        for bi, batch in enumerate(self._batches):
            alive_rows = np.nonzero(batch.alive)[0]
            if alive_rows.size == 0:
                continue
            sizes0 = self.sizes[batch.param_ids[alive_rows[0]]]
            if not np.all(self.sizes[batch.param_ids[alive_rows]] == sizes0):
                raise ValueError(
                    "all rows of a residual batch must have uniform block sizes"
                )
            key = self._sig_key_for_row(batch, alive_rows[0])
            if key not in buckets:
                buckets[key] = []
                order.append(key)
            buckets[key].append((bi, alive_rows))

        self.groups: list[SigGroupMeta] = []
        self.group_idx: list[dict] = []
        row_offset = 0
        for gi, key in enumerate(order):
            members = buckets[key]
            bi0, rows0 = members[0]
            batch0 = self._batches[bi0]
            k = batch0.param_ids.shape[1]
            pid = np.concatenate(
                [self._batches[bi].param_ids[rows] for bi, rows in members]
            )
            data = tuple(
                np.concatenate(
                    [np.asarray(self._batches[bi].data[di])[rows] for bi, rows in members]
                )
                for di in range(len(batch0.data))
            )
            n = pid.shape[0]

            positions = []
            x_idx, t_idx, c_idx, block_ids = [], [], [], []
            for pos in range(k):
                ids = pid[:, pos]
                size = int(self.sizes[ids[0]])
                b0 = self._blocks[ids[0]]
                manifold = (
                    None
                    if (
                        b0.manifold is None
                        or isinstance(b0.manifold, EuclideanManifold)
                    )
                    else b0.manifold
                )
                tsize = manifold.tangent_size if manifold is not None else size
                positions.append(PositionMeta(size, tsize, manifold))
                xo = self.x_offsets[ids]
                x_idx.append(
                    (xo[:, None] + np.arange(size)[None, :]).astype(np.int32)
                )
                to = self.t_offsets[ids]
                # constant blocks scatter into the trailing dump slot
                ti = np.where(
                    to[:, None] >= 0,
                    to[:, None] + np.arange(tsize)[None, :],
                    self.num_effective_parameters,
                )
                t_idx.append(ti.astype(np.int32))
                # index within tangent-size class (dump slot = class count)
                cls = self.class_of_tsize.get(tsize)
                ci = self.block_class_index[ids]
                dump = self.class_counts[cls] if cls is not None else 0
                c_idx.append(np.where(ci >= 0, ci, dump).astype(np.int32))
                block_ids.append(ids.astype(np.int32))

            meta = SigGroupMeta(
                cost_function=batch0.cost_function,
                loss=batch0.loss,
                positions=tuple(positions),
                n=n,
                row_offset=row_offset,
            )
            self.groups.append(meta)
            self.group_idx.append(
                {
                    "x_idx": tuple(x_idx),
                    "t_idx": tuple(t_idx),
                    "c_idx": tuple(c_idx),
                    "block_ids": tuple(block_ids),
                    "data": data,
                }
            )

            # handle bookkeeping
            grow = 0
            for bi, rows in members:
                for r in rows:
                    self._handle_map[(bi, int(r))] = (gi, grow)
                    grow += 1

            row_offset += meta.rows

        self.num_residuals = row_offset
        self.num_residual_blocks = sum(g.n for g in self.groups)

    def _sig_key_for_row(self, batch, row):
        cf = batch.cost_function
        sizes = tuple(int(self.sizes[b]) for b in batch.param_ids[row])
        manifolds = tuple(
            None
            if (
                self._blocks[b].manifold is None
                or isinstance(self._blocks[b].manifold, EuclideanManifold)
            )
            else self._blocks[b].manifold
            for b in batch.param_ids[row]
        )
        data_sig = tuple(
            (np.asarray(d).shape[1:], np.asarray(d).dtype.str) for d in batch.data
        )
        return (cf.fn, cf.num_residuals, batch.loss, sizes, manifolds, data_sig)

    # ------------------------------------------------------------------ #
    # Schur elimination partition
    # ------------------------------------------------------------------ #

    def compute_schur_partition(self):
        """Classify free parameter blocks into e-blocks (eliminated, e.g. BA
        points) and f-blocks (kept, e.g. cameras).

        TPU-native replacement of the reference's greedy maximal independent
        set ordering (parameter_block_ordering.cc:used via
        graph_algorithms.h IndependentSetOrdering): each residual row elects
        the lowest-degree block it touches as its winner; a block is an
        e-candidate iff it wins every row it appears in — which yields an
        independent set in one vectorized pass. Group positions with mixed
        e/f membership are demoted until every retained e-position is pure,
        so the partition maps onto whole signature-group positions (the unit
        of batched evaluation).

        Returns (e_mask_blocks [nb] bool, e_positions, f_positions) where
        e/f_positions are lists over groups of position-index tuples.
        Caches the result.
        """
        if getattr(self, "_schur_partition", None) is not None:
            return self._schur_partition

        nb = len(self._blocks)
        degree = np.zeros(nb, dtype=np.int64)
        rows_count = np.zeros(nb, dtype=np.int64)
        for gi, idx in enumerate(self.group_idx):
            for ids in idx["block_ids"]:
                np.add.at(degree, ids, 1)
        # winner of each row: free block with min (degree, id)
        wins = np.zeros(nb, dtype=np.int64)
        for gi, idx in enumerate(self.group_idx):
            ids_mat = np.stack(idx["block_ids"], axis=1)  # [n, k]
            free = np.asarray(
                [[self.t_offsets[b] >= 0 for b in row] for row in ids_mat]
            )
            key = degree[ids_mat] * (nb + 1) + ids_mat
            key = np.where(free, key, np.iinfo(np.int64).max)
            has_free = free.any(axis=1)
            winner = ids_mat[np.arange(ids_mat.shape[0]), np.argmin(key, axis=1)]
            np.add.at(wins, winner[has_free], 1)
            for pos in range(ids_mat.shape[1]):
                np.add.at(rows_count, ids_mat[:, pos], 1)

        e_mask = (wins == rows_count) & (rows_count > 0) & (self.t_offsets >= 0)

        # demote until every group position is uniformly e or f, and at most
        # one e-position per group (each residual row may touch only one
        # eliminated block — the Schur chunk invariant,
        # schur_eliminator.h:167-380).
        changed = True
        while changed:
            changed = False
            for gi, idx in enumerate(self.group_idx):
                e_positions = []
                for pos, ids in enumerate(idx["block_ids"]):
                    flags = e_mask[ids]
                    if flags.any() and not flags.all():
                        e_mask[ids[flags]] = False
                        changed = True
                    elif flags.all() and flags.size:
                        e_positions.append(pos)
                if len(e_positions) > 1:
                    for pos in e_positions[1:]:
                        e_mask[idx["block_ids"][pos]] = False
                    changed = True

        e_positions, f_positions = [], []
        for gi, idx in enumerate(self.group_idx):
            eps, fps = [], []
            for pos, ids in enumerate(idx["block_ids"]):
                if ids.size and e_mask[ids].all() and e_mask[ids].any():
                    eps.append(pos)
                else:
                    fps.append(pos)
            e_positions.append(tuple(eps))
            f_positions.append(tuple(fps))

        self._schur_partition = (e_mask, e_positions, f_positions)
        return self._schur_partition

    def schur_tangent_masks(self):
        """(e_mask, f_mask) over the tangent vector [num_eff]."""
        e_blocks, _, _ = self.compute_schur_partition()
        e = np.zeros(self.num_effective_parameters, dtype=np.float64)
        for b in self._blocks:
            if b.removed or b.constant:
                continue
            if e_blocks[b.index]:
                o = int(self.t_offsets[b.index])
                e[o : o + b.tangent_size] = 1.0
        return e, 1.0 - e

    # ------------------------------------------------------------------ #
    # runtime arrays
    # ------------------------------------------------------------------ #

    def arrays(self, dtype=None):
        """Materialize the jnp pytree consumed by the evaluator."""
        import jax.numpy as jnp

        from .utils.dtypes import default_dtype

        dtype = dtype or default_dtype()
        groups = []
        for idx in self.group_idx:
            groups.append(
                {
                    "x_idx": tuple(jnp.asarray(a) for a in idx["x_idx"]),
                    "t_idx": tuple(jnp.asarray(a) for a in idx["t_idx"]),
                    "c_idx": tuple(jnp.asarray(a) for a in idx["c_idx"]),
                    "data": tuple(
                        jnp.asarray(d, dtype=dtype)
                        if np.issubdtype(np.asarray(d).dtype, np.floating)
                        else jnp.asarray(d)
                        for d in idx["data"]
                    ),
                }
            )
        arrays = {
            "groups": groups,
            "euclid_x_idx": jnp.asarray(self.euclid_x_idx),
            "euclid_d_idx": jnp.asarray(self.euclid_d_idx),
            "manifold_groups": [
                {
                    "x_idx": jnp.asarray(g["x_idx"]),
                    "d_idx": jnp.asarray(g["d_idx"]),
                }
                for g in self.manifold_group_idx
            ],
        }
        if self.has_bounds:
            arrays["lower_bound"] = jnp.asarray(self.lower_bound, dtype=dtype)
            arrays["upper_bound"] = jnp.asarray(self.upper_bound, dtype=dtype)
        return arrays

    def state_vector(self, dtype=None):
        import jax.numpy as jnp

        from .utils.dtypes import default_dtype

        return jnp.asarray(self.state0, dtype=dtype or default_dtype())

    def set_block_value(self, block: int, values: np.ndarray):
        o = int(self.x_offsets[block])
        self.state0[o : o + len(values)] = values

    def write_state_back(self, state, blocks=None):
        """Copy a solved state vector back into the Problem's blocks."""
        state = np.asarray(state, dtype=np.float64)
        self.state0 = state.copy()
        for b in self._blocks:
            if b.removed:
                continue
            o = int(self.x_offsets[b.index])
            b.values[:] = state[o : o + b.size]

    # ------------------------------------------------------------------ #
    # evaluation entry points
    # ------------------------------------------------------------------ #

    def evaluator(self):
        if self._evaluator is None:
            from .evaluator import Evaluator

            self._evaluator = Evaluator(self)
        return self._evaluator

    def evaluate_full(self, apply_loss: bool = True):
        """(cost, residuals, gradient, jacobian-CRS) at the current state.

        Parity: Problem::Evaluate (problem.h:430). The Jacobian columns are
        tangent-space coordinates of the free parameter blocks.
        """
        ev = self.evaluator()
        state = self.state_vector()
        cost, res, jac, grad = ev.evaluate(state, apply_loss=apply_loss)
        crs = jac.to_crs() if jac is not None else None
        return float(cost), np.asarray(res), np.asarray(grad), crs
