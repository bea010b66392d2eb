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

__all__ = ["chunk_dedup", "window_dedup"]

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


# --------------------------------------------------------------- sliding
# Sliding-window substring dedup (Lee et al. 2022, "Deduplicating
# Training Data Makes Language Models Better"): hash EVERY overlapping
# width-token window; a window occurrence is duplicate iff the same
# window text occurred at a lexicographically earlier (doc_id, pos);
# every token covered by a duplicate window is removed. Catches
# repeated passages at ANY alignment (chunk_dedup only catches
# chunk-aligned repeats); costs one hash per token instead of one per
# chunk. Docs shorter than ``width`` have no windows and are never cut
# (document-level dedup is exact_dedup_keys' job).

_WPOW_BASE = (np.uint64(0x9E3779B97F4A7C15), np.uint64(0xC2B2AE3D27D4EB4F))


def _window_hashes(text_col, width: int):
    """-> (h1, h2, doc_of_window, win_idx, per-doc token counts, flat
    tokens, token offsets). Window hash = polynomial over per-token
    64-bit hashes with DISTINCT power-of-base multipliers per offset
    (wrapping uint64); two independent bases give 128 bits, so hash
    equality == window-text equality in practice. One vectorized pass
    over the flat token stream — windows are never materialized."""
    import pandas as pd

    if isinstance(text_col, pa.ChunkedArray):
        text_col = text_col.combine_chunks()
    if pa.types.is_large_string(text_col.type):
        text_col = pc.cast(text_col, pa.string())
    toks = pc.split_pattern_regex(
        pc.utf8_trim_whitespace(pc.fill_null(text_col, "")), _WS)
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offs = toks.offsets.to_numpy().astype(np.int64)
    vals = toks.values
    ntok = np.diff(offs)
    total = int(offs[-1])
    flat_np = vals.to_numpy(zero_copy_only=False)
    nw = np.maximum(ntok - width + 1, 0)
    if total < width or int(nw.sum()) == 0:
        e = np.empty(0, np.int64)
        return e, e, e, e, ntok, vals, offs
    h = [pd.util.hash_array(flat_np, hash_key=k).astype(np.uint64)
         for k in ("ksql_ray_window0", "ksql_ray_window1")]
    n_starts = total - width + 1
    g1 = np.zeros(n_starts, dtype=np.uint64)
    g2 = np.zeros(n_starts, dtype=np.uint64)
    m1, m2 = np.uint64(1), np.uint64(1)
    with np.errstate(over="ignore"):
        for j in range(width - 1, -1, -1):
            g1 += h[0][j:j + n_starts] * m1
            g2 += h[1][j:j + n_starts] * m2
            m1 *= _WPOW_BASE[0]
            m2 *= _WPOW_BASE[1]
    # valid starts: window must not cross its doc's end
    doc_of = np.repeat(np.arange(len(nw), dtype=np.int64), nw)
    first_w = np.zeros(len(nw) + 1, dtype=np.int64)
    np.cumsum(nw, out=first_w[1:])
    win_idx = np.arange(int(nw.sum()), dtype=np.int64) - first_w[doc_of]
    starts = offs[:-1][doc_of] + win_idx
    return (g1[starts].view(np.int64), g2[starts].view(np.int64),
            doc_of, win_idx, ntok, vals, offs)


def window_dedup(ds: ray.data.Dataset, width: int = 8,
                 id_col: str = "doc_id", text_col: str = "text",
                 num_partitions: int = 32) -> ray.data.Dataset:
    """-> (id_col, n_tokens, removed_tokens, clean_text) per input doc;
    clean_text joins the surviving tokens with single spaces ('' when a
    doc is removed entirely). Physical plan identical to chunk_dedup:
    the corpus text moves ONCE (the doc_id co-partition); the dedup
    decision travels as 16-byte window hashes + 16-byte positions."""
    docs = ds.select_columns([id_col, text_col])
    id_type = docs.schema().base_schema.field(id_col).type

    def emit(batch: pa.Table) -> pa.Table:
        h1, h2, doc_of, win_idx, *_ = _window_hashes(
            batch.column(text_col), width)
        ids = batch.column(id_col).take(pa.array(doc_of))
        return pa.table({
            "h1": pa.array(h1), "h2": pa.array(h2),
            id_col: ids, "win_idx": pa.array(win_idx),
        })

    hashed = docs.map_batches(_pin(emit), batch_format="pyarrow",
                              zero_copy_batch=True)

    def first_occurrence(group: pa.Table) -> pa.Table:
        empty = pa.table({id_col: pa.array([], type=id_type),
                          "win_idx": pa.array([], type=pa.int64())})
        if group.num_rows == 0:
            return empty
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        tbl = group.take(pc.sort_indices(group, sort_keys=[
            ("h1", "ascending"), ("h2", "ascending"),
            (id_col, "ascending"), ("win_idx", "ascending")]))
        h1 = tbl.column("h1").to_numpy(zero_copy_only=False)
        h2 = tbl.column("h2").to_numpy(zero_copy_only=False)
        dup = np.zeros(len(h1), dtype=bool)
        dup[1:] = (h1[1:] == h1[:-1]) & (h2[1:] == h2[:-1])
        if not dup.any():
            return empty
        kept = tbl.filter(pa.array(dup))
        return pa.table({id_col: kept.column(id_col),
                         "win_idx": kept.column("win_idx")})

    dups = _partition_by(hashed, ["h1"], num_partitions).map_groups(
        _pin(first_occurrence), batch_format="pyarrow")

    def tag_docs(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_col: batch.column(id_col),
            text_col: pc.cast(batch.column(text_col), pa.string()),
            "win_idx": pa.nulls(batch.num_rows, pa.int64()),
        })

    def tag_dups(batch: pa.Table) -> pa.Table:
        return pa.table({
            id_col: batch.column(id_col),
            text_col: pa.nulls(batch.num_rows, pa.string()),
            "win_idx": batch.column("win_idx"),
        })

    unioned = docs.map_batches(
        _pin(tag_docs), batch_format="pyarrow", zero_copy_batch=True,
    ).union(dups.map_batches(
        _pin(tag_dups), batch_format="pyarrow", zero_copy_batch=True))

    def rebuild(group: pa.Table) -> pa.Table:
        empty = pa.table({
            id_col: pa.array([], type=id_type),
            "n_tokens": pa.array([], type=pa.int64()),
            "removed_tokens": pa.array([], type=pa.int64()),
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
        *_, ntok, vals, offs = _window_hashes(
            doc_rows.column(text_col), width)
        total = int(offs[-1])
        # duplicate coverage as a diff array over the flat token stream:
        # +1 at each dup window start, -1 one past its end; covered
        # positions are where the running sum is positive
        diff = np.zeros(total + 1, dtype=np.int64)
        if dup_rows.num_rows:
            doc_ids = doc_rows.column(id_col).to_numpy(
                zero_copy_only=False)
            dup_ids = dup_rows.column(id_col).to_numpy(
                zero_copy_only=False)
            pos = dup_rows.column("win_idx").to_numpy(
                zero_copy_only=False).astype(np.int64)
            rows = np.searchsorted(doc_ids, dup_ids)
            starts = offs[:-1][rows] + pos
            np.add.at(diff, starts, 1)
            np.add.at(diff, starts + width, -1)
        covered = np.cumsum(diff[:total]) > 0
        keep = ~covered
        removed = np.zeros(len(ntok), dtype=np.int64)
        if covered.any():
            doc_of_tok = np.searchsorted(offs, np.flatnonzero(covered),
                                         side="right") - 1
            removed = np.bincount(doc_of_tok,
                                  minlength=len(ntok)).astype(np.int64)
        kept_per_doc = ntok - removed
        off = pa.array(np.append(np.zeros(1, np.int64),
                                 np.cumsum(kept_per_doc)).astype(np.int32))
        kept_vals = vals.filter(pa.array(keep))
        if isinstance(kept_vals, pa.ChunkedArray):
            kept_vals = kept_vals.combine_chunks()
        kept_lists = pa.ListArray.from_arrays(off, kept_vals)
        return pa.table({
            id_col: doc_rows.column(id_col),
            "n_tokens": pa.array(ntok),
            "removed_tokens": pa.array(removed),
            "clean_text": pc.binary_join(kept_lists, " "),
        })

    return _partition_by(unioned, [id_col], num_partitions).map_groups(
        _pin(rebuild), batch_format="pyarrow")
