"""Shared small-partial merge for ops whose partials are compact.

Ray's sort-based groupby costs ~2.4 s FIXED per exchange on this
version regardless of row count (measured; BASELINE.md perf lesson
#14). Many ops reduce per-batch partials that are bounded by something
small — a histogram's bin count, a transition matrix's alphabet², a
pivot's distinct keys — so the final merge should be one remote task,
not an all-to-all exchange. This module centralizes that pattern:
materialize the partials, and when they fit the same 64 MB budget as
the bounded engine's fast path, merge them in ONE task (refs stay in
the object store; the driver never touches rows). Above the budget the
distributed groupby runs unchanged, so semantics never depend on size.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .cube import _SMALL_PARTIAL_BYTES

__all__ = ["grouped_sum", "grouped_max", "grouped_agg", "distinct_small",
           "topk_table"]


def _with_schema(blocks: tuple[pa.Table, ...],
                 cols: list[str]) -> list[pa.Table]:
    """Sparse map_groups outputs include schema-less EMPTY blocks
    (BASELINE.md perf lesson #16) that concat/pandas reject."""
    return [b for b in blocks
            if all(c in b.column_names for c in cols)]


@ray.remote
def _sum_merge_task(key_cols: list[str], sum_cols: list[str],
                    *blocks: pa.Table) -> pa.Table:
    blocks = _with_schema(blocks, key_cols + sum_cols)
    if not blocks:
        return pa.table({})
    t = pa.concat_tables(blocks, promote_options="default")
    df = t.to_pandas()
    g = df.groupby(key_cols, dropna=False, sort=False)[sum_cols].sum(
    ).reset_index()
    out = {}
    for k in key_cols:
        out[k] = pa.Array.from_pandas(g[k], type=t.schema.field(k).type)
    for c in sum_cols:
        out[c] = pa.Array.from_pandas(g[c], type=t.schema.field(c).type)
    return pa.table(out)


def grouped_sum(parts: ray.data.Dataset, key_cols: list[str],
                sum_cols: list[str]) -> ray.data.Dataset:
    """``parts.groupby(key_cols).sum(sum_cols)`` with the output
    columns named ``key_cols + sum_cols`` — merged in one task when
    the materialized partials fit the small budget."""
    m = parts.materialize()
    if m.size_bytes() <= _SMALL_PARTIAL_BYTES:
        ref = _sum_merge_task.remote(key_cols, sum_cols,
                                     *m.to_arrow_refs())
        return ray.data.from_arrow_refs([ref])
    from .dedup import _partition_by, _pin

    def merge(group: pa.Table) -> pa.Table:
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        df = group.to_pandas().groupby(
            key_cols, dropna=False, sort=False)[sum_cols].sum(
        ).reset_index()
        return pa.table({c: pa.Array.from_pandas(
            df[c], type=group.schema.field(c).type)
            for c in key_cols + sum_cols})

    return _partition_by(m, key_cols).map_groups(
        _pin(merge), batch_format="pyarrow")


@ray.remote
def _max_merge_task(key_cols: list[str], max_cols: list[str],
                    *blocks: pa.Table) -> pa.Table:
    blocks = _with_schema(blocks, key_cols + max_cols)
    if not blocks:
        return pa.table({})
    t = pa.concat_tables(blocks, promote_options="default")
    df = t.to_pandas()
    g = df.groupby(key_cols, dropna=False, sort=False)[max_cols].max(
    ).reset_index()
    out = {}
    for k in key_cols:
        out[k] = pa.Array.from_pandas(g[k], type=t.schema.field(k).type)
    for c in max_cols:
        out[c] = pa.Array.from_pandas(g[c], type=t.schema.field(c).type)
    return pa.table(out)


def grouped_max(parts: ray.data.Dataset, key_cols: list[str],
                max_cols: list[str]) -> ray.data.Dataset:
    """``parts.groupby(key_cols).max(max_cols)`` with the output
    columns named ``key_cols + max_cols`` — merged in one task when
    the materialized partials fit the small budget."""
    m = parts.materialize()
    if m.size_bytes() <= _SMALL_PARTIAL_BYTES:
        ref = _max_merge_task.remote(key_cols, max_cols,
                                     *m.to_arrow_refs())
        return ray.data.from_arrow_refs([ref])
    from .dedup import _partition_by, _pin

    def merge(group: pa.Table) -> pa.Table:
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        df = group.to_pandas().groupby(
            key_cols, dropna=False, sort=False)[max_cols].max(
        ).reset_index()
        return pa.table({c: pa.Array.from_pandas(
            df[c], type=group.schema.field(c).type)
            for c in key_cols + max_cols})

    return _partition_by(m, key_cols).map_groups(
        _pin(merge), batch_format="pyarrow")


def _agg_merge(t: pa.Table, key_cols: list[str],
               aggs: dict[str, str]) -> pa.Table:
    df = t.to_pandas()
    g = df.groupby(key_cols, dropna=False, sort=False).agg(aggs).reset_index()
    # from_pandas THEN cast: NULL-bearing int columns round-trip
    # through pandas as NaN floats, and from_pandas with an explicit
    # int type raises on the NaN instead of making it NULL
    return pa.table({c: pa.Array.from_pandas(g[c]).cast(
        t.schema.field(c).type) for c in key_cols + list(aggs)})


@ray.remote
def _mixed_merge_task(key_cols: list[str], aggs: dict[str, str],
                      *blocks: pa.Table) -> pa.Table:
    blocks = _with_schema(blocks, key_cols + list(aggs))
    if not blocks:
        return pa.table({})
    return _agg_merge(pa.concat_tables(blocks, promote_options="default"),
                      key_cols, aggs)


def grouped_agg(parts: ray.data.Dataset, key_cols: list[str],
                aggs: dict[str, str]) -> ray.data.Dataset:
    """Mixed-function partial merge: ``aggs`` maps column -> one of
    {'sum', 'min', 'max'} (the self-merging aggregates — a count
    partial merges by sum). Output columns are ``key_cols +
    list(aggs)``; one task when small, a hash exchange otherwise."""
    bad = {f for f in aggs.values() if f not in ("sum", "min", "max")}
    if bad:
        raise ValueError(f"non-mergeable agg functions: {sorted(bad)}")
    m = parts.materialize()
    if m.size_bytes() <= _SMALL_PARTIAL_BYTES:
        ref = _mixed_merge_task.remote(key_cols, aggs, *m.to_arrow_refs())
        return ray.data.from_arrow_refs([ref])
    from .dedup import _partition_by, _pin

    def merge(group: pa.Table) -> pa.Table:
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        return _agg_merge(group, key_cols, aggs)

    return _partition_by(m, key_cols).map_groups(
        _pin(merge), batch_format="pyarrow")


@ray.remote
def _distinct_merge_task(cols: list[str], *blocks: pa.Table) -> pa.Table:
    blocks = _with_schema(blocks, cols)
    if not blocks:
        return pa.table({})
    t = pa.concat_tables(blocks, promote_options="default")
    df = t.to_pandas().drop_duplicates()
    return pa.table({c: pa.Array.from_pandas(df[c],
                                             type=t.schema.field(c).type)
                     for c in cols})


def distinct_small(parts: ray.data.Dataset,
                   cols: list[str]) -> ray.data.Dataset:
    """Global DISTINCT over already per-batch-deduped partials: one
    merge task when small, ``groupby(cols).count`` exchange otherwise."""
    m = parts.materialize()
    if m.size_bytes() <= _SMALL_PARTIAL_BYTES:
        ref = _distinct_merge_task.remote(cols, *m.to_arrow_refs())
        return ray.data.from_arrow_refs([ref])
    from .dedup import _partition_by, _pin

    def merge(group: pa.Table) -> pa.Table:
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        df = group.to_pandas().drop_duplicates()
        return pa.table({c: pa.Array.from_pandas(
            df[c], type=group.schema.field(c).type) for c in cols})

    return _partition_by(m, cols).map_groups(
        _pin(merge), batch_format="pyarrow")


@ray.remote
def _topk_merge_task(sort_keys, k: int, *blocks: pa.Table) -> pa.Table:
    bs = [b for b in blocks if b.num_columns]
    if not bs:
        return pa.table({})
    t = pa.concat_tables(bs, promote_options="default")
    idx = pc.sort_indices(t, sort_keys=sort_keys)
    return t.take(idx.slice(0, k))


def topk_table(ds: ray.data.Dataset, sort_keys, k: int) -> ray.data.Dataset:
    """Global top-k rows under ``sort_keys`` (list of (col, order)):
    per-block local top-k, then ONE merge task over the B·k survivors
    — exact (every global top-k row is in its own block's top-k) and
    replaces Ray's global sort + limit (a full range shuffle). Merge
    memory is O(blocks x k); for k beyond ~10^5 prefer ds.sort()."""

    def local(b: pa.Table) -> pa.Table:
        if b.num_rows <= k:
            return b
        idx = pc.sort_indices(b, sort_keys=sort_keys)
        return b.take(idx.slice(0, k))

    m = ds.map_batches(local, batch_format="pyarrow",
                       zero_copy_batch=True).materialize()
    ref = _topk_merge_task.remote(list(sort_keys), k, *m.to_arrow_refs())
    return ray.data.from_arrow_refs([ref])
