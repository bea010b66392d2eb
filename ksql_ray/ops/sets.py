"""Distributed set operations: INTERSECT / EXCEPT (distinct) and
broadcast semi / anti joins.

ksqlDB (and the Go reference client, ksql/*.go) has no set operators or
semi-join verbs; corpus curation needs both constantly: "documents in
this crawl but not in the last one", "users who did X and also Y",
"keep only rows whose key appears in an allowlist".

Scale shapes:

* ``intersect_distinct`` / ``except_distinct``: tag each side (int8),
  union lazily, ONE hash shuffle on the key columns, then a vectorized
  per-partition sorted-segment scan (``np.minimum/maximum.reduceat``
  over the tag) emits each distinct key tuple once. No driver
  materialization, payload = the two key-column projections.
* ``semi_join_filter``: the DISTINCT right key set is reduced with
  per-batch uniques then one small groupby, broadcast ONCE via
  ``ray.put``, and every left batch filters with one ``pc.is_in``
  kernel inside an actor pool (keys resolved in ``__init__``, once per
  actor — never per batch). Same contract as every broadcast join: the
  distinct right KEY SET (not the right table) must fit in worker
  memory; for large-key-set sides use the engine's hash join
  (exec/joins.py) instead.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .dedup import _partition_by, _pin
from .rows import _key_arrays, _segment_starts

__all__ = ["intersect_distinct", "except_distinct", "union_distinct",
           "semi_join_filter"]

# key sets at or under this size ride the task closure (serialized once
# per worker); larger sets go through ray.put + an actor pool so the
# bytes live in plasma instead of every task spec
_CLOSURE_KEYS_BYTES = 8 * 1024 * 1024


def _tagged(ds: ray.data.Dataset, cols: list[str], tag: int):
    """Per-batch-DISTINCT key projection tagged with its side: the
    set-op shuffle ships batch-distinct keys, never one row per input
    row (the result is distinct anyway, so batch-level dedup is free
    payload reduction)."""

    def add(batch: pa.Table) -> pa.Table:
        import pandas as pd

        t = batch.select(cols)
        if t.num_rows:
            df = t.to_pandas().drop_duplicates()
            t = pa.table({c: pa.Array.from_pandas(
                df[c], type=t.schema.field(c).type) for c in cols})
        return t.append_column(
            "__src", pa.array(np.full(t.num_rows, tag, dtype=np.int8)))

    return ds.map_batches(_pin(add), batch_format="pyarrow",
                          zero_copy_batch=True)


def _emit_set(group: pa.Table, cols: list[str],
              mode: str) -> pa.Table:
    """Sorted-segment reduceat over the side tag: emit each distinct
    key once iff it satisfies the INTERSECT / EXCEPT / UNION
    membership rule."""
    if "__part" in group.column_names:
        group = group.drop_columns(["__part"])
    if group.num_rows == 0:
        return group.select(cols)
    tbl = group.take(pc.sort_indices(
        group, sort_keys=[(c, "ascending") for c in cols]))
    n = tbl.num_rows
    starts = np.unique(_segment_starts(_key_arrays(tbl, cols), n))
    src = tbl.column("__src").to_numpy(zero_copy_only=False)
    lo = np.minimum.reduceat(src, starts)
    hi = np.maximum.reduceat(src, starts)
    if mode == "intersect":     # key seen on both sides
        mask = (lo == 0) & (hi == 1)
    elif mode == "except":      # key seen on the left only
        mask = hi == 0
    else:                       # UNION: every distinct key
        mask = np.ones(len(starts), dtype=bool)
    return tbl.take(pa.array(starts[mask])).select(cols)


@ray.remote
def _setop_merge_task(cols: list[str], mode: str,
                      *blocks: pa.Table) -> pa.Table:
    from .smallagg import _with_schema

    blocks = _with_schema(blocks, cols + ["__src"])
    if not blocks:
        return pa.table({})
    return _emit_set(pa.concat_tables(blocks, promote_options="default"),
                     cols, mode)


def _set_op(left: ray.data.Dataset, right: ray.data.Dataset,
            cols: list[str], mode: str,
            num_partitions: int) -> ray.data.Dataset:
    union = _tagged(left, cols, 0).union(
        _tagged(right, cols, 1)).materialize()

    from .cube import _SMALL_PARTIAL_BYTES

    if union.size_bytes() <= _SMALL_PARTIAL_BYTES:
        # batch-deduped tagged keys fit the small budget: one task
        # instead of a key exchange
        ref = _setop_merge_task.remote(cols, mode,
                                       *union.to_arrow_refs())
        return ray.data.from_arrow_refs([ref])

    return _partition_by(union, cols, num_partitions).map_groups(
        _pin(lambda g: _emit_set(g, cols, mode)),
        batch_format="pyarrow")


def intersect_distinct(left: ray.data.Dataset, right: ray.data.Dataset,
                       cols: list[str],
                       num_partitions: int = 32) -> ray.data.Dataset:
    """Distinct key tuples present in BOTH inputs — SQL
    ``SELECT DISTINCT cols FROM left INTERSECT SELECT ... FROM right``
    (INTERSECT is distinct by definition). String/object NULL keys
    compare equal (SQL set-op semantics); float NaN keys do not —
    filter nulls first for float keys."""
    return _set_op(left, right, cols, mode="intersect",
                   num_partitions=num_partitions)


def except_distinct(left: ray.data.Dataset, right: ray.data.Dataset,
                    cols: list[str],
                    num_partitions: int = 32) -> ray.data.Dataset:
    """Distinct key tuples present in ``left`` but NOT in ``right`` —
    SQL ``EXCEPT``."""
    return _set_op(left, right, cols, mode="except",
                   num_partitions=num_partitions)


def union_distinct(left: ray.data.Dataset, right: ray.data.Dataset,
                   cols: list[str],
                   num_partitions: int = 32) -> ray.data.Dataset:
    """Distinct key tuples present in EITHER input — SQL ``UNION``
    (distinct by definition; ``UNION ALL`` is plain
    ``Dataset.union``). Same batch-distinct + one-key-shuffle shape
    as INTERSECT/EXCEPT."""
    return _set_op(left, right, cols, mode="union",
                   num_partitions=num_partitions)


class _IsInFilter:
    """Actor-pool stage: broadcast key set resolved once per actor in
    ``__init__`` (perf lesson #3: never ``ray.get`` per batch)."""

    def __init__(self, keys_ref, col: str, anti: bool):
        keys = ray.get(keys_ref)
        self._set = keys.combine_chunks() if isinstance(
            keys, pa.ChunkedArray) else keys
        self._col, self._anti = col, anti
        from ..streaming.driver import limit_worker_threads

        limit_worker_threads()

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = pc.is_in(batch.column(self._col), value_set=self._set)
        # is_in is null-safe false for null probes: IN over a non-null
        # set never matches NULL, and SQL semi/anti predicates drop
        # unknown rows, so fill false either way
        m = pc.fill_null(m, False)
        return batch.filter(pc.invert(m) if self._anti else m)


def semi_join_filter(left: ray.data.Dataset, right: ray.data.Dataset,
                     left_on: str, right_on: str, anti: bool = False,
                     concurrency=(1, 8)) -> ray.data.Dataset:
    """Left rows whose ``left_on`` value appears (semi) / does not
    appear (anti) in ``right``'s ``right_on`` column — SQL
    ``WHERE left_on IN (SELECT right_on FROM right)`` and its
    NOT-EXISTS counterpart (NULL probes never match; under ``anti``
    they are KEPT, i.e. NOT-EXISTS semantics, not 3-valued NOT IN —
    expr.py's NotIn covers that form).

    Broadcast shape: per-batch unique partials bound the distinct
    reduction's shuffle, the final key set ships to each actor once.
    """

    def per_batch_unique(batch: pa.Table) -> pa.Table:
        u = pc.unique(batch.column(right_on))
        return pa.table({right_on: pc.drop_null(u)})

    from .smallagg import distinct_small

    # per-batch-unique partials are small whenever the broadcast
    # contract holds -> one merge task, no exchange
    keys_ds = distinct_small(
        right.select_columns([right_on]).map_batches(
            per_batch_unique, batch_format="pyarrow",
            zero_copy_batch=True), [right_on])
    # the DISTINCT key set is the broadcast side: small by contract.
    # Sparse groupby outputs include schema-less EMPTY blocks (perf
    # lesson #16) that concat_tables rejects — drop them first.
    parts = [t for t in ray.get(keys_ds.to_arrow_refs()) if t.num_rows]
    if parts:
        keys = pa.concat_tables(parts).column(right_on).combine_chunks()
    else:  # empty right side: semi keeps nothing, anti keeps all
        keys = pa.array(
            [], type=left.schema().base_schema.field(left_on).type)
    if keys.nbytes <= _CLOSURE_KEYS_BYTES:
        # small key set: ship it in the task closure (serialized once
        # per worker process) — plain tasks skip the actor pool's
        # ~2 s startup, which was 3x the whole op's runtime
        def fil(batch: pa.Table) -> pa.Table:
            m = pc.fill_null(
                pc.is_in(batch.column(left_on), value_set=keys), False)
            return batch.filter(pc.invert(m) if anti else m)

        return left.map_batches(_pin(fil), batch_format="pyarrow",
                                zero_copy_batch=True)
    ref = ray.put(keys)
    return left.map_batches(
        _IsInFilter, fn_constructor_args=(ref, left_on, anti),
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency,
        max_restarts=0,  # ctor args in object store + restarts -> ray#53727 warning
    )
