"""End-to-end training-data prep pipeline: the composed shape a corpus
actually ships through — normalize → quality-filter → exact-dedup →
shuffle-shard — as ONE lazy Ray Data chain.

Each stage is an existing §2.11 operator; this module proves they
COMPOSE (the "a user could run every pipeline they run today" bar):
one streaming pass for normalize+filter (stateless map_batches fused
by the executor), one fingerprint shuffle for dedup, one shard shuffle
for the export — the corpus text crosses the wire exactly twice.
The whole chain is SQL-expressible, so the driver gate
(op_prep_pipeline) checks the COMPOSITION end-to-end, not just the
stages.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from ..ops.dedup import _partition_by, _pin
from ..ops.quality import quality_filter
from ..ops.shard import shuffle_shard
from ..ops.text import normalize_documents

__all__ = ["dedup_rows", "prep_pipeline", "prep_batch"]


def dedup_rows(ds: ray.data.Dataset, id_col: str = "doc_id",
               text_col: str = "text", fingerprint: str = "md5",
               num_partitions: int = 32) -> ray.data.Dataset:
    """Keep the FIRST (min id) row of every distinct normalized text —
    the row-level form of ops/dedup.exact_dedup_keys (which emits keeper
    IDS; pipelines need the surviving ROWS without a second join):
    one fingerprint-hash shuffle, per-partition sort + segment-first."""
    from ..ops.text import add_fast_fingerprint, add_fingerprint

    def fp(batch: pa.Table) -> pa.Table:
        if fingerprint == "md5":
            return add_fingerprint(batch, text_col, "__fp")
        b = add_fast_fingerprint(batch, text_col, "__fp", bits=128)
        return b

    with_fp = ds.map_batches(_pin(fp), batch_format="pyarrow",
                             zero_copy_batch=True)
    fp_cols = (["__fp"] if fingerprint == "md5"
               else ["__fp", "__fp_hi"])

    def first(group: pa.Table) -> pa.Table:
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        if group.num_rows == 0:
            return group.drop_columns(fp_cols)
        tbl = group.take(pc.sort_indices(group, sort_keys=[
            *[(c, "ascending") for c in fp_cols],
            (id_col, "ascending")]))
        keys = [tbl.column(c).to_numpy(zero_copy_only=False)
                for c in fp_cols]
        keep = np.ones(tbl.num_rows, dtype=bool)
        same = np.ones(tbl.num_rows - 1, dtype=bool)
        for k in keys:
            same &= k[1:] == k[:-1]
        keep[1:] = ~same
        return tbl.filter(pa.array(keep)).drop_columns(fp_cols)

    return _partition_by(with_fp, [fp_cols[0]], num_partitions).map_groups(
        _pin(first), batch_format="pyarrow")


def prep_pipeline(ds: ray.data.Dataset, *, id_col: str = "doc_id",
                  text_col: str = "text", n_shards: int = 8,
                  form: str = "none", fingerprint: str = "md5",
                  shard_method: str = "md5",
                  **quality_kwargs) -> ray.data.Dataset:
    """normalize → quality-filter → exact-dedup → shuffle-shard.
    Returns (id_col, text, shard, pos) — text is the NORMALIZED form
    (the canonical bytes every downstream consumer should see)."""
    norm = normalize_documents(ds, text_col=text_col, id_col=id_col,
                               out="__norm", form=form)

    def rebind(batch: pa.Table) -> pa.Table:
        return pa.table({id_col: batch.column(id_col),
                         text_col: batch.column("__norm")})

    canon = norm.map_batches(_pin(rebind), batch_format="pyarrow",
                             zero_copy_batch=True)
    kept = quality_filter(canon, text_col=text_col, **quality_kwargs)
    unique = dedup_rows(kept, id_col=id_col, text_col=text_col,
                        fingerprint=fingerprint)
    return shuffle_shard(unique, id_col, n_shards=n_shards,
                         method=shard_method)


def prep_batch(batch: pa.Table, id_col: str = "doc_id",
               text_col: str = "text", **quality_kwargs) -> pa.Table:
    """Batch-level normalize → quality-filter: the stateless prefix of
    :func:`prep_pipeline` as ONE callable, usable as a streaming
    ``pre_transform`` (StreamingDedupJob) so the whole prep chain —
    normalize → filter → first-occurrence dedup — runs ON INGEST.
    Output rows: (id_col, text) with text in the normalized form
    (lower, whitespace collapsed, trimmed — ``form="none"``, the
    all-Arrow scale path; SQL: trim(regexp_replace(lower(text),
    '\\s+', ' ', 'g')))."""
    from ..ops.quality import add_repetition_stats, quality_keep_mask

    t = batch.column(text_col)
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    if pa.types.is_large_string(t.type):
        t = pc.cast(t, pa.string())
    # NULL text behaves as the empty string (normalizes to "", then
    # fails the quality thresholds like any contentless row)
    norm = pc.utf8_trim_whitespace(pc.replace_substring_regex(
        pc.utf8_lower(pc.fill_null(t, "")), r"\s+", " "))
    out = pa.table({id_col: batch.column(id_col), text_col: norm})
    out = add_repetition_stats(out, text_col)
    keep = quality_keep_mask(out, **quality_kwargs)
    return out.filter(keep).select([id_col, text_col])
