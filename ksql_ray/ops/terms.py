"""Corpus term statistics: top-k most frequent tokens.

The classic corpus-inspection pass (vocabulary skew, boilerplate
detection, stopword discovery) over a document table. Extends the
engine's training-data surface; the reference ksql builder has no
corpus-level string aggregation (absence verified across
/root/reference/ksql/*.go).

Shape (scale-first): per-batch **partial counts** inside
``map_batches`` (pandas ``value_counts`` — one cython hash table per
batch, no row loop) bound the shuffle to the per-batch vocabulary,
then a distributed ``groupby(term).sum(cnt)`` merges partials and a
``sort + limit`` takes the top k. At 100 TB the shuffle carries one
(term, count) row per distinct term per batch — not one row per token
occurrence (a ~10^3-10^4x reduction for natural text).

Tokenization contract (same as ops/quality.py):
``unnest(regexp_split_to_array(trim(lower(text)), '\\s+'))`` — the
DuckDB oracle form is bit-equal; ties broken by ascending term so the
top-k cut is deterministic on both sides.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

__all__ = ["top_terms", "top_ngrams"]


def _partial_counts(batch: pa.Table, text_col: str) -> pa.Table:
    import pandas as pd

    norm = pc.utf8_lower(pc.utf8_trim_whitespace(batch.column(text_col)))
    toks = pc.split_pattern_regex(norm, r"\s+")
    lst = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    flat = lst.values.to_numpy(zero_copy_only=False)
    vc = pd.Series(flat).value_counts()
    return pa.table({
        "term": pa.array(vc.index.to_numpy(), type=pa.string()),
        "cnt": pa.array(vc.to_numpy(), type=pa.int64()),
    })


def _partial_ngram_counts(batch: pa.Table, text_col: str,
                          n: int) -> pa.Table:
    import numpy as np
    import pandas as pd

    norm = pc.utf8_lower(pc.utf8_trim_whitespace(batch.column(text_col)))
    toks = pc.split_pattern_regex(pc.fill_null(norm, ""), r"\s+")
    lst = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    offs = lst.offsets.to_numpy().astype(np.int64)
    vals = lst.values
    total = len(vals)
    if total < n:
        return pa.table({"term": pa.array([], type=pa.string()),
                         "cnt": pa.array([], type=pa.int64())})
    # candidate gram at flat position p joins vals[p..p+n-1]; valid iff
    # it stays inside its document (within-doc index <= ntok - n)
    ntok = np.diff(offs)
    doc_of = np.repeat(np.arange(len(ntok), dtype=np.int64), ntok)
    within = np.arange(total, dtype=np.int64) - offs[:-1][doc_of]
    valid = (within <= ntok[doc_of] - n)[: total - n + 1]
    shifted = [vals.slice(i, total - n + 1) for i in range(n)]
    # separator scalar must match the value type (large_string inputs
    # produce large_string token values; a plain str literal is string)
    grams = pc.binary_join_element_wise(*shifted,
                                        pa.scalar(" ", type=vals.type))
    flat = grams.filter(pa.array(valid)).to_numpy(zero_copy_only=False)
    vc = pd.Series(flat).value_counts()
    return pa.table({
        "term": pa.array(vc.index.to_numpy(), type=pa.string()),
        "cnt": pa.array(vc.to_numpy(), type=pa.int64()),
    })


def top_ngrams(ds: ray.data.Dataset, text_col: str = "text",
               n: int = 2, k: int = 20) -> ray.data.Dataset:
    """Top-k (term, cnt) word n-grams (space-joined, same tokenization
    as ``top_terms``; documents shorter than n tokens contribute
    nothing), ordered by cnt desc then term asc. Same scale shape:
    per-batch partial counts bound the shuffle to the per-batch gram
    vocabulary."""
    if n < 2:
        raise ValueError("n must be >= 2 (use top_terms for unigrams)")
    parts = ds.map_batches(
        lambda b: _partial_ngram_counts(b, text_col, n),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    agg = parts.groupby("term").sum("cnt")
    agg = agg.map_batches(
        lambda b: b.rename_columns(["term", "cnt"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return agg.sort(["cnt", "term"], descending=[True, False]).limit(k)


def top_terms(ds: ray.data.Dataset, text_col: str = "text",
              k: int = 20) -> ray.data.Dataset:
    """Top-k (term, cnt) rows, ordered by cnt desc then term asc."""
    parts = ds.map_batches(
        lambda b: _partial_counts(b, text_col),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    agg = parts.groupby("term").sum("cnt")
    agg = agg.map_batches(
        lambda b: b.rename_columns(["term", "cnt"]),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return agg.sort(["cnt", "term"], descending=[True, False]).limit(k)
