"""Span-level (chunk) exact deduplication — RefinedWeb-style repeated-
passage removal generalized to fixed-width token chunks.

Corpus-wide boilerplate (license headers, navigation blocks, repeated
paragraphs) survives document-level dedup; production pipelines
(RefinedWeb, Dolma) remove the repeated SPANS and keep the documents.
Each document is split into consecutive ``width``-token chunks; a chunk
occurrence is a duplicate iff the same chunk text occurred at a
lexicographically earlier ``(doc_id, chunk_idx)`` anywhere in the
corpus. Output is one row per document: chunk counts plus the text
rebuilt from the surviving chunks.

The reference ksql builder has no text surface (absence verified across
/root/reference/ksql/*.go); this is part of the engine's training-data
extension set.

Scale shape — the corpus text crosses the wire ONCE (the doc_id
shuffle); the dedup decision travels as 16-byte hashes:

1. chunking + hashing is one stateless zero-copy ``map_batches``: Arrow
   ``split_pattern_regex`` tokens, chunk boundaries built on the flat
   token buffer (no per-row Python), chunk strings via ``binary_join``,
   two independent ``pd.util.hash_array`` 64-bit keys per chunk (128
   bits total — same false-merge stance as ``add_fast_fingerprint``);
2. one hash shuffle of (h1, h2, doc_id, chunk_idx) — 32 bytes per chunk
   regardless of chunk text size — finds each hash's first occurrence
   (min (doc_id, chunk_idx), a sorted-segment scan per partition) and
   emits only the DUPLICATE positions;
3. the duplicate positions (tiny: the boilerplate fraction of the
   corpus) are UNIONED with the documents and co-partitioned by doc_id
   in one hash shuffle — no join operator, no aggregator actor per
   partition (perf lesson #9); the rebuild pass re-derives chunk
   boundaries from the original text and drops the flagged positions,
   flat-buffer vectorized end to end.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .dedup import _partition_by, _pin

__all__ = ["chunk_dedup"]

_WS = r"\s+"


def _chunk_arrays(text_col, width: int):
    """-> (chunk strings as a flat StringArray, chunks-per-doc int64
    array, within-doc chunk_idx int64 array). Mirrors the oracle exactly:
    DuckDB ``regexp_split_to_array(trim(text), '\\s+')`` gives [''] for
    empty text, so every doc has >= 1 chunk."""
    if pa.types.is_large_string(text_col.type):
        # binary_join has no list<large_string> kernel; int32-offset
        # string is fine per batch (blocks are far below 2 GiB of text)
        text_col = pc.cast(text_col, pa.string())
    toks = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(pc.fill_null(text_col, "")), _WS)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offs = toks.offsets.to_numpy().astype(np.int64)
    vals = toks.values
    ntok = np.diff(offs)
    nch = (ntok + width - 1) // width  # ntok >= 1 always -> nch >= 1
    total = int(nch.sum())
    doc_of_chunk = np.repeat(np.arange(len(nch), dtype=np.int64), nch)
    first = np.zeros(len(nch) + 1, dtype=np.int64)
    np.cumsum(nch, out=first[1:])
    within = np.arange(total, dtype=np.int64) - first[doc_of_chunk]
    starts = offs[:-1][doc_of_chunk] + within * width
    # consecutive chunk starts tile the flat token buffer exactly
    # (chunk i ends where chunk i+1 starts; the last ends at offs[-1]),
    # so one offsets vector turns the token values into a chunk list
    chunk_offsets = pa.array(np.append(starts, offs[-1]), type=pa.int32())
    chunk_lists = pa.ListArray.from_arrays(chunk_offsets, vals)
    chunks = pc.binary_join(chunk_lists, " ")
    return chunks, nch, within, doc_of_chunk


def _hash2(chunks: pa.Array) -> tuple[np.ndarray, np.ndarray]:
    import pandas as pd

    nparr = chunks.to_numpy(zero_copy_only=False)
    h1 = pd.util.hash_array(nparr, hash_key="ksql_ray_chunks0").astype(np.uint64)
    h2 = pd.util.hash_array(nparr, hash_key="ksql_ray_chunks1").astype(np.uint64)
    return h1.view(np.int64), h2.view(np.int64)


def chunk_dedup(ds: ray.data.Dataset, width: int = 16,
                id_col: str = "doc_id", text_col: str = "text",
                num_partitions: int = 32) -> ray.data.Dataset:
    """-> (id_col, n_chunks, dup_chunks, clean_text) with one row per
    input document. See the module docstring for semantics and the
    distributed shape. ``width`` is the chunk size in whitespace tokens;
    the last chunk of a doc may be shorter."""
    docs = ds.select_columns([id_col, text_col])
    id_type = docs.schema().base_schema.field(id_col).type

    def emit(batch: pa.Table) -> pa.Table:
        chunks, nch, within, doc_of = _chunk_arrays(batch.column(text_col), width)
        h1, h2 = _hash2(chunks)
        ids = batch.column(id_col).take(pa.array(doc_of))
        return pa.table({
            "h1": pa.array(h1), "h2": pa.array(h2),
            id_col: ids, "chunk_idx": pa.array(within),
        })

    hashed = docs.map_batches(_pin(emit), batch_format="pyarrow",
                              zero_copy_batch=True)

    def first_occurrence(group: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], type=id_type),
                          "chunk_idx": pa.array([], type=pa.int64())})
        if group.num_rows == 0:
            return empty
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        tbl = group.take(pc.sort_indices(group, sort_keys=[
            ("h1", "ascending"), ("h2", "ascending"),
            (id_col, "ascending"), ("chunk_idx", "ascending")]))
        h1 = tbl.column("h1").to_numpy(zero_copy_only=False)
        h2 = tbl.column("h2").to_numpy(zero_copy_only=False)
        dup = np.zeros(len(h1), dtype=bool)
        dup[1:] = (h1[1:] == h1[:-1]) & (h2[1:] == h2[:-1])
        if not dup.any():
            return empty
        kept = tbl.filter(pa.array(dup))
        return pa.table({id_col: kept.column(id_col),
                         "chunk_idx": kept.column("chunk_idx")})

    dups = _partition_by(hashed, ["h1"], num_partitions).map_groups(
        _pin(first_occurrence), batch_format="pyarrow")

    # co-partition the duplicate positions WITH the documents in one
    # hash shuffle on doc_id (a Ray hash-shuffle join would spawn an
    # aggregator actor per partition — perf lesson #9 — and rejects the
    # schema-less empty blocks sparse dup outputs produce): doc rows
    # carry text, dup rows carry chunk_idx; the other column rides null.
    def tag_docs(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_col: batch.column(id_col),
            # plain string so the union schema matches tag_dups' nulls
            text_col: pc.cast(batch.column(text_col), pa.string()),
            "chunk_idx": pa.nulls(batch.num_rows, pa.int64()),
        })

    def tag_dups(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_col: batch.column(id_col),
            text_col: pa.nulls(batch.num_rows, pa.string()),
            "chunk_idx": batch.column("chunk_idx"),
        })

    unioned = docs.map_batches(
        _pin(tag_docs), batch_format="pyarrow", zero_copy_batch=True,
    ).union(dups.map_batches(
        _pin(tag_dups), batch_format="pyarrow", zero_copy_batch=True))

    def rebuild(group: pa.Table) -> pa.Table:
        empty = pa.table({
            id_col: pa.array([], type=id_type),
            "n_chunks": pa.array([], type=pa.int64()),
            "dup_chunks": pa.array([], type=pa.int64()),
            "clean_text": pa.array([], type=pa.string()),
        })
        if group.num_rows == 0:
            return empty
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        is_doc = pc.is_valid(group.column(text_col))
        doc_rows = group.filter(is_doc)
        if doc_rows.num_rows == 0:
            return empty
        doc_rows = doc_rows.take(
            pc.sort_indices(doc_rows, sort_keys=[(id_col, "ascending")]))
        dup_rows = group.filter(pc.invert(is_doc))
        chunks, nch, within, doc_of = _chunk_arrays(
            doc_rows.column(text_col), width)
        first = np.zeros(len(nch) + 1, dtype=np.int64)
        np.cumsum(nch, out=first[1:])
        keep = np.ones(int(nch.sum()), dtype=bool)
        dup_counts = np.zeros(len(nch), dtype=np.int64)
        if dup_rows.num_rows:
            doc_ids = doc_rows.column(id_col).to_numpy(zero_copy_only=False)
            dup_ids = dup_rows.column(id_col).to_numpy(zero_copy_only=False)
            pos = dup_rows.column("chunk_idx").to_numpy(zero_copy_only=False)
            rows = np.searchsorted(doc_ids, dup_ids)
            keep[first[rows] + pos.astype(np.int64)] = False
            dup_counts = np.bincount(rows, minlength=len(nch)).astype(np.int64)
        kept_per_doc = nch - dup_counts
        off = pa.array(np.append(np.zeros(1, np.int64),
                                 np.cumsum(kept_per_doc)).astype(np.int32))
        kept = chunks.filter(pa.array(keep))
        if isinstance(kept, pa.ChunkedArray):
            kept = kept.combine_chunks()
        kept_lists = pa.ListArray.from_arrays(off, kept)
        return pa.table({
            id_col: doc_rows.column(id_col),
            "n_chunks": pa.array(nch),
            "dup_chunks": pa.array(dup_counts),
            "clean_text": pc.binary_join(kept_lists, " "),
        })

    return _partition_by(unioned, [id_col], num_partitions).map_groups(
        _pin(rebuild), batch_format="pyarrow")
