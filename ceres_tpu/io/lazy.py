"""Row-lazy data handles for multi-host shard construction.

A LazyRows wraps a row-indexed data source (e.g. the observation payload of
a BAL file) plus a composed row map, so Program construction can permute /
subset residual-block data WITHOUT materializing it, and
parallel.sharding.put_global can ask each process for exactly the rows its
local devices own. This is the host-local-loading half of the multi-host
design (SURVEY.md §2d:332-339): the full observation payload never exists
on any single process.

The source contract is one method: `gather(rows: np.ndarray) -> np.ndarray`
returning the requested rows (any order, duplicates allowed), plus `shape`
and `dtype` describing the full virtual array.
"""

from __future__ import annotations

from typing import Optional

import numpy as np


class LazyRows:
    """A virtual [n, ...] array = source rows viewed through a row map."""

    def __init__(self, source, row_map: Optional[np.ndarray] = None):
        self.source = source
        self.row_map = None if row_map is None else np.asarray(row_map)

    @property
    def shape(self):
        n = (
            self.source.shape[0]
            if self.row_map is None
            else self.row_map.shape[0]
        )
        return (n,) + tuple(self.source.shape[1:])

    @property
    def dtype(self):
        return np.dtype(self.source.dtype)

    @property
    def ndim(self):
        return len(self.shape)

    def __len__(self):
        return self.shape[0]

    def __getitem__(self, rows):
        """Row subset/permutation -> a new LazyRows (no materialization).

        Only whole-row indexing by an integer array or slice is supported —
        exactly what Program's group building and the shard layout apply.
        """
        if isinstance(rows, slice):
            rows = np.arange(*rows.indices(self.shape[0]))
        rows = np.asarray(rows)
        if rows.ndim != 1 or not np.issubdtype(rows.dtype, np.integer):
            raise TypeError(
                "LazyRows supports 1-D integer-array row indexing only"
            )
        new_map = rows if self.row_map is None else self.row_map[rows]
        return LazyRows(self.source, new_map)

    def gather(self, rows) -> np.ndarray:
        """Materialize the given (virtual) rows as a numpy array."""
        rows = np.asarray(rows)
        src_rows = rows if self.row_map is None else self.row_map[rows]
        return self.source.gather(src_rows)

    def materialize(self) -> np.ndarray:
        """Materialize every row (single-process / export paths)."""
        return self.gather(np.arange(self.shape[0]))

    def __array__(self, dtype=None, copy=None):
        out = self.materialize()
        return out if dtype is None else out.astype(dtype)


class ArraySource:
    """In-memory source (testing / already-loaded data)."""

    def __init__(self, array: np.ndarray):
        self.array = np.asarray(array)
        self.shape = self.array.shape
        self.dtype = self.array.dtype

    def gather(self, rows: np.ndarray) -> np.ndarray:
        return self.array[np.asarray(rows)]
