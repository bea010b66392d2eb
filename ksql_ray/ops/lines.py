"""Line-level corpus cleanup: intra-document line dedup and
corpus-wide boilerplate (frequent-line) removal.

Two standard web-corpus passes the document-level dedup family
(ops/dedup.py, ops/spans.py) doesn't cover:

* ``dedup_lines`` — keep the FIRST occurrence of each line within a
  document (self-repetition cleanup: nav menus duplicated by the
  extractor, chat transcripts with re-sent messages). Penedo et al.
  2023 (RefinedWeb §4.2) and Raffel et al. 2020 (C4) both apply
  line-granular repetition rules before document-level dedup.
* ``strip_frequent_lines`` — remove lines that appear in at least
  ``min_docs`` DISTINCT documents (cookie banners, footers, share
  buttons): the corpus-frequency boilerplate rule of RefinedWeb /
  CCNet. Two phases: a counting pass whose shuffle carries one
  (line-hash, count) partial row per distinct line per batch (uint64
  hashes, never the line text), then the small frequent set —
  boilerplate is by definition a tiny fraction of distinct lines —
  broadcast once (``ray.put``) and a stateless filter pass with a
  searchsorted membership test. No driver materialization of the
  corpus; only the frequent-hash array (bounded by the true amount of
  boilerplate; guarded by ``max_frequent``) returns to the driver.

Both passes are fully vectorized: Arrow ``split_pattern`` for line
explosion, pandas hash-table ``duplicated`` for first-occurrence,
``np.bincount`` + ``ListArray.from_arrays`` + Arrow ``binary_join``
for reassembly — no Python loop over rows or lines.

Hash note: frequent-line counting keys on 64-bit ``hash_array``; a
collision can only merge two distinct lines' counts (over-removal of a
non-boilerplate line at ~n²/2⁶⁴ odds), never under-removal.

No reference counterpart (the Go client, ksql/*.go, builds query
strings only); corpus-curation infrastructure like ops/c4.py.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .dedup import _pin

__all__ = ["dedup_lines", "strip_frequent_lines", "frequent_line_hashes"]

_HKEY = "ksql_ray_lines_0"  # pd.util.hash_array needs exactly 16 bytes


def _exploded(batch: pa.Table, text_col: str):
    """(flat line values, per-row doc index, n_rows) for a batch."""
    col = batch.column(text_col)
    if pa.types.is_null(col.type):
        col = pc.cast(col, pa.string())
    col = pc.fill_null(col, "")
    lst = pc.split_pattern(col, "\n")
    if isinstance(lst, pa.ChunkedArray):
        lst = lst.combine_chunks()
    lens = np.asarray(pc.list_value_length(lst), dtype=np.int64)
    doc_idx = np.repeat(np.arange(batch.num_rows, dtype=np.int64), lens)
    return lst.values, doc_idx


def _reassemble(batch: pa.Table, text_col: str, values: pa.Array,
                doc_idx: np.ndarray, keep: np.ndarray) -> pa.Table:
    kept_vals = values.filter(pa.array(keep))
    new_lens = np.bincount(doc_idx[keep], minlength=batch.num_rows)
    offsets = np.concatenate(([0], np.cumsum(new_lens))).astype(np.int32)
    if isinstance(kept_vals, pa.LargeStringArray) or pa.types.is_large_string(
            kept_vals.type):
        offsets = offsets.astype(np.int64)
        lst = pa.LargeListArray.from_arrays(pa.array(offsets,
                                                     type=pa.int64()),
                                            kept_vals)
    else:
        lst = pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()),
                                       kept_vals)
    sep = pa.scalar("\n", type=kept_vals.type)  # kernel wants same width
    joined = pc.binary_join(lst, sep)
    i = batch.column_names.index(text_col)
    return batch.set_column(i, text_col, joined)


def dedup_lines(ds: "ray.data.Dataset",
                text_col: str = "text") -> "ray.data.Dataset":
    """Keep the first occurrence of each line WITHIN each document;
    rebuild ``text_col`` with surviving lines joined by ``\\n``.
    Stateless per-batch pass (a document is one row, so first-
    occurrence is batch-local) — embarrassingly parallel, no shuffle."""

    @_pin
    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        values, doc_idx = _exploded(batch, text_col)
        dup = pd.DataFrame(
            {"d": doc_idx,
             "l": values.to_numpy(zero_copy_only=False)}).duplicated(
        ).to_numpy()
        return _reassemble(batch, text_col, values, doc_idx, ~dup)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def frequent_line_hashes(ds: "ray.data.Dataset", text_col: str = "text",
                         min_docs: int = 10, num_partitions: int = 32,
                         max_frequent: int = 2_000_000) -> "ray.ObjectRef":
    """Counting pass -> ObjectRef of the SORTED uint64 hash array of
    lines appearing in >= ``min_docs`` distinct documents. The shuffle
    carries (hash, partial-count) rows — one per distinct line per
    batch — and each exchange partition emits only its frequent hashes.
    ``max_frequent`` guards the driver gather (raise it deliberately;
    boilerplate beyond 2M distinct lines means min_docs is too low)."""
    from .dedup import _partition_by

    @_pin
    def partial(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({"h": pa.array([], type=pa.uint64()),
                             "cnt": pa.array([], type=pa.int64())})
        values, doc_idx = _exploded(batch, text_col)
        lines = values.to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(lines, hash_key=_HKEY).astype(np.uint64)
        # one count per DISTINCT (doc, line): repeats within a doc
        # must not inflate the distinct-document count
        first = ~pd.DataFrame({"d": doc_idx, "h": h}).duplicated(
        ).to_numpy()
        vc = pd.Series(h[first]).value_counts()
        return pa.table({
            "h": pa.array(vc.index.to_numpy(), type=pa.uint64()),
            "cnt": pa.array(vc.to_numpy(), type=pa.int64()),
        })

    def merge(part: pa.Table) -> pa.Table:
        df = part.select(["h", "cnt"]).to_pandas()
        s = df.groupby("h")["cnt"].sum()
        s = s[s >= min_docs]
        return pa.table({"h": pa.array(s.index.to_numpy(),
                                       type=pa.uint64())})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    freq = _partition_by(parts, ["h"], num_partitions).map_groups(
        merge, batch_format="pyarrow")
    tbls = [t for t in ray.get(freq.materialize().to_arrow_refs())
            if t.num_columns]
    hs = (np.sort(np.concatenate(
        [t.column("h").to_numpy(zero_copy_only=False) for t in tbls]))
        if tbls else np.array([], dtype=np.uint64))
    if len(hs) > max_frequent:
        raise ValueError(
            f"frequent-line set has {len(hs)} entries > max_frequent="
            f"{max_frequent}; raise min_docs (or max_frequent)")
    return ray.put(hs)


def strip_frequent_lines(ds: "ray.data.Dataset", text_col: str = "text",
                         min_docs: int = 10, num_partitions: int = 32,
                         frequent_ref: "ray.ObjectRef | None" = None
                         ) -> "ray.data.Dataset":
    """Remove boilerplate lines (appearing in >= ``min_docs`` distinct
    documents) from every document. Pass ``frequent_ref`` to reuse a
    precomputed :func:`frequent_line_hashes` set."""
    if frequent_ref is None:
        frequent_ref = frequent_line_hashes(
            ds, text_col, min_docs=min_docs,
            num_partitions=num_partitions)

    @_pin
    def strip(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        freq = _STRIP_CACHE.get(frequent_ref.hex())
        if freq is None:
            _STRIP_CACHE.clear()  # one live frequent set per worker
            freq = _STRIP_CACHE[frequent_ref.hex()] = ray.get(
                frequent_ref)
        values, doc_idx = _exploded(batch, text_col)
        lines = values.to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(lines, hash_key=_HKEY).astype(np.uint64)
        pos = np.searchsorted(freq, h)
        pos[pos >= len(freq)] = 0 if len(freq) else 0
        hit = (freq[pos] == h) if len(freq) else np.zeros(
            len(h), dtype=bool)
        return _reassemble(batch, text_col, values, doc_idx, ~hit)

    return ds.map_batches(strip, batch_format="pyarrow",
                          zero_copy_batch=True)


# worker-process-local frequent-hash cache (one plasma fetch/worker)
_STRIP_CACHE: dict = {}
