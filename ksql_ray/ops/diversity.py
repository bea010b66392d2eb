"""Corpus diversity metrics: distinct-n (Li et al. 2016, "A
Diversity-Promoting Objective Function for Neural Conversation
Models") — the fraction of distinct word n-grams among all n-gram
occurrences, the standard template-collapse / mode-collapse smell test
for generated or scraped corpora (distinct-1 ~ vocabulary richness,
distinct-2/3 ~ phrase diversity).

Scale shape: per-batch partial (gram-hash, count) tables bound the
shuffle to each batch's distinct grams (like ops/terms.py); ONE direct
exchange per n merges partials and emits per-partition (distinct,
total) pairs — partitions are gram-disjoint so the counts add; the
driver folds P pairs per n. Total occurrence counts are exact int64
sums; distinct counts are exact (hash-partitioned exact distinct, not
a sketch — use ops/hll.py for the approximate regime).

Tokenization contract (same as ops/terms.py):
``unnest(regexp_split_to_array(trim(lower(text)), '\\s+'))``; n-grams
are space-joined and stay within a document.

No reference counterpart (the Go client builds query strings only);
corpus-curation infrastructure like ops/quality.py.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

__all__ = ["distinct_ngram_ratios"]


def distinct_ngram_ratios(ds: "ray.data.Dataset", text_col: str = "text",
                          ns: tuple = (1, 2, 3),
                          num_partitions: int = 32) -> pa.Table:
    """-> one row per n: (n, distinct_grams, total_grams, distinct_ratio)
    over the whole corpus. Returns a small pa.Table (len(ns) rows)."""
    from .dedup import _partition_by, _pin
    from .terms import _partial_counts, _partial_ngram_counts

    rows = []
    for n in ns:
        if n == 1:
            parts = ds.map_batches(
                _pin(lambda b, _t=text_col: _partial_counts(b, _t)),
                batch_format="pyarrow", zero_copy_batch=True)
        else:
            parts = ds.map_batches(
                _pin(lambda b, _t=text_col, _n=n: _partial_ngram_counts(
                    b, _t, _n)),
                batch_format="pyarrow", zero_copy_batch=True)

        def fold(group: pa.Table) -> pa.Table:
            if "__part" in group.column_names:
                group = group.drop_columns(["__part"])
            import pandas as pd

            s = group.to_pandas().groupby("term", sort=False)["cnt"].sum()
            return pa.table({
                "distinct": pa.array([int(len(s))], type=pa.int64()),
                "total": pa.array([int(s.sum()) if len(s) else 0],
                                  type=pa.int64()),
            })

        folded = _partition_by(parts, ["term"], num_partitions).map_groups(
            fold, batch_format="pyarrow")
        d = t = 0
        for blk in ray.get(folded.materialize().to_arrow_refs()):
            if blk.num_columns and blk.num_rows:
                d += int(blk.column("distinct")[0].as_py())
                t += int(blk.column("total")[0].as_py())
        rows.append((int(n), d, t, (d / t) if t else 0.0))
    return pa.table({
        "n": pa.array([r[0] for r in rows], type=pa.int64()),
        "distinct_grams": pa.array([r[1] for r in rows], type=pa.int64()),
        "total_grams": pa.array([r[2] for r in rows], type=pa.int64()),
        "distinct_ratio": pa.array([round(r[3], 6) for r in rows],
                                   type=pa.float64()),
    })
