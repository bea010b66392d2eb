"""List explode (SQL UNNEST) as a stateless zero-shuffle flat-map.

ksqlDB's EXPLODE is a table function applied per row inside a SELECT
(reference surface: ksql/select_builder.go builds plain projections —
the Go client exposes no table functions; absence verified across
/root/reference/ksql/*.go). Training pipelines need the rows-out form
constantly: token tables from documents, one row per extracted span,
per-element embedding rows.

Scale shape: pure ``map_batches`` — each output block derives from one
input block, no shuffle, no state, perfectly streaming. The flatten is
zero-copy (`list_flatten` returns a slice view of the child array) and
the parent repeat is one ``take`` per kept column. Position ordinals
come from the list offsets with two vectorized subtractions; no
per-row Python anywhere.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .dedup import _pin

__all__ = ["explode_list", "split_tokens", "melt"]


def _explode_batch(batch: pa.Table, list_col: str, keep: list[str],
                   value_out: str, pos_col: str | None,
                   pos_base: int) -> pa.Table:
    col = batch.column(list_col)
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    parents = pc.list_parent_indices(col)          # one entry per element
    flat = pc.list_flatten(col)                    # zero-copy child slice
    out = {k: batch.column(k).take(parents) for k in keep}
    out[value_out] = flat
    if pos_col is not None:
        # element ordinal inside its list: global index minus the
        # (repeated) start offset of the parent list
        lens = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        lens = np.nan_to_num(lens.astype(np.float64)).astype(np.int64)
        starts = np.repeat(np.cumsum(lens) - lens, lens)
        pos = np.arange(starts.size, dtype=np.int64) - starts + pos_base
        out[pos_col] = pa.array(pos, type=pa.int64())
    return pa.table(out)


def explode_list(ds: ray.data.Dataset, list_col: str,
                 keep: list[str] | None = None, value_out: str = "value",
                 pos_col: str | None = None,
                 pos_base: int = 1) -> ray.data.Dataset:
    """One output row per list element (SQL ``UNNEST``): the kept
    columns are repeated per element, ``value_out`` carries the
    element, and ``pos_col`` (optional) its ``pos_base``-based ordinal
    within the list — DuckDB's zipped
    ``unnest(l), unnest(generate_series(1, len(l)))``. NULL and empty
    lists produce no rows (SQL UNNEST semantics); NULL *elements* are
    kept."""
    keep = list(keep or [])
    return ds.map_batches(
        _pin(lambda b: _explode_batch(b, list_col, keep, value_out,
                                      pos_col, pos_base)),
        batch_format="pyarrow", zero_copy_batch=True)


def melt(ds: ray.data.Dataset, id_cols: list[str],
         value_cols: list[str], name_out: str = "name",
         value_out: str = "value") -> ray.data.Dataset:
    """UNPIVOT / wide-to-long: one output row per (input row, value
    column) with the column's name and its value cast to float64 —
    SQL ``UNPIVOT INCLUDE NULLS (value FOR name IN (...))``. Note
    DuckDB's UNPIVOT *excludes* NULL values unless INCLUDE NULLS is
    given. Stateless per-batch concat of column slices — no shuffle,
    no row loop."""
    if not value_cols:
        raise ValueError("value_cols must be non-empty")

    def fn(batch: pa.Table) -> pa.Table:
        outs = []
        for c in value_cols:
            outs.append(pa.table({
                **{k: batch.column(k) for k in id_cols},
                name_out: pa.array([c] * batch.num_rows),
                value_out: pc.cast(batch.column(c), pa.float64()),
            }))
        return pa.concat_tables(outs)

    return ds.map_batches(_pin(fn), batch_format="pyarrow",
                          zero_copy_batch=True)


def split_tokens(ds: ray.data.Dataset, text_col: str,
                 keep: list[str], token_out: str = "tok",
                 pos_col: str | None = "pos") -> ray.data.Dataset:
    """Whitespace-token table: split ``text_col`` on single spaces and
    explode — one row per token with its 1-based position. Matches
    DuckDB ``unnest(str_split(text, ' '))`` exactly (consecutive
    delimiters yield empty-string tokens on both sides)."""

    def add_list(batch: pa.Table) -> pa.Table:
        toks = pc.split_pattern(batch.column(text_col), pattern=" ")
        return batch.select(keep).append_column("__toks", toks)

    listed = ds.map_batches(_pin(add_list), batch_format="pyarrow",
                            zero_copy_batch=True)
    return explode_list(listed, "__toks", keep=keep, value_out=token_out,
                        pos_col=pos_col, pos_base=1)
