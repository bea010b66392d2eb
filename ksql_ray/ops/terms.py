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
import ray
import ray.data

__all__ = ["top_terms", "top_ngrams", "tfidf_top_terms",
           "corpus_zipf_stats"]


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
    return _top_counts(parts, k)


def _doc_term_counts(batch: pa.Table, id_col: str,
                     text_col: str) -> pa.Table:
    """Distinct (doc, term, tf) rows for one batch — globally distinct
    because every document is exactly one input row."""
    import numpy as np
    import pandas as pd

    norm = pc.utf8_lower(pc.utf8_trim_whitespace(batch.column(text_col)))
    toks = pc.split_pattern_regex(norm, r"\s+")
    lst = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    offs = lst.offsets.to_numpy().astype(np.int64)
    flat = lst.values.to_numpy(zero_copy_only=False)
    if not len(flat):
        return pa.table({
            id_col: pa.array([], type=batch.schema.field(id_col).type),
            "term": pa.array([], type=pa.string()),
            "tf": pa.array([], type=pa.int64())})
    doc_idx = np.repeat(np.arange(batch.num_rows, dtype=np.int64),
                        np.diff(offs))
    codes, uniq = pd.factorize(flat)
    packed = doc_idx * len(uniq) + codes
    upacked, tf = np.unique(packed, return_counts=True)
    return pa.table({
        id_col: batch.column(id_col).take(pa.array(upacked // len(uniq))),
        "term": pa.array(np.asarray(uniq, dtype=object)[
            upacked % len(uniq)], type=pa.string()),
        "tf": pa.array(tf.astype(np.int64))})


def tfidf_top_terms(ds: ray.data.Dataset, id_col: str = "doc_id",
                    text_col: str = "text", k: int = 5,
                    num_partitions: int = 32) -> ray.data.Dataset:
    """Per-document top-k terms by tf-idf -> (id_col, term, tfidf,
    rank) with 0-based rank — the classic keyword/feature extraction
    pass over a corpus. ``tfidf = tf · ln(N / df)`` with raw term
    counts, document frequency over distinct docs, and N = number of
    documents contributing at least one token (so NULL-text docs are
    out of both numerator and denominator on both sides of the gate).
    Ties rank by ascending term, so the cut is deterministic.

    Scale shape (two bounded shuffles, no broadcast vocabulary):
    per-batch distinct (doc, term, tf) partials (each doc is one row,
    so rows are globally distinct), materialized ONCE (consumed by the
    distinct-doc count and the scoring pass — perf lesson 10); one
    hash shuffle by TERM computes df as a segment length and scores
    rows in place (the corpus vocabulary never concentrates — each
    term's postings land whole in one partition); one hash shuffle by
    DOC takes the per-doc top-k with a sorted-segment rank. The
    shuffled payload is distinct (doc, term) pairs — ~10³–10⁴× smaller
    than token occurrences for natural text."""
    import numpy as np

    from .dedup import _partition_by, _pin
    from .rows import _key_arrays, _segment_ends, _segment_starts
    from .smallagg import distinct_small

    if k < 1:
        raise ValueError("k must be >= 1")
    tf = ds.map_batches(
        lambda b: _doc_term_counts(b, id_col, text_col),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    n_docs = distinct_small(
        tf.select_columns([id_col]).map_batches(
            lambda b: pa.table({id_col: pc.unique(b.column(id_col))}),
            batch_format="pyarrow", zero_copy_batch=True),
        [id_col]).count()

    def score(group: pa.Table) -> pa.Table:
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        if group.num_rows == 0:
            return group.append_column(
                "tfidf", pa.array([], type=pa.float64()))
        tbl = group.take(pc.sort_indices(
            group, sort_keys=[("term", "ascending")]))
        n = tbl.num_rows
        seg = _segment_starts(_key_arrays(tbl, ["term"]), n)
        df = (_segment_ends(seg, n) - seg).astype(np.float64)
        tfv = tbl.column("tf").to_numpy(zero_copy_only=False)
        return tbl.append_column(
            "tfidf", pa.array(tfv * np.log(n_docs / df)))

    scored = _partition_by(tf, ["term"], num_partitions).map_groups(
        _pin(score), batch_format="pyarrow")

    def topk(group: pa.Table) -> pa.Table:
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        if group.num_rows == 0:
            return (group.select([id_col, "term", "tfidf"])
                    .append_column("rank",
                                   pa.array([], type=pa.int64())))
        tbl = group.take(pc.sort_indices(group, sort_keys=[
            (id_col, "ascending"), ("tfidf", "descending"),
            ("term", "ascending")]))
        n = tbl.num_rows
        seg = _segment_starts(_key_arrays(tbl, [id_col]), n)
        rank = np.arange(n, dtype=np.int64) - seg
        tbl = tbl.append_column("rank", pa.array(rank))
        return tbl.select([id_col, "term", "tfidf", "rank"]).filter(
            pa.array(rank < k))

    return _partition_by(scored, [id_col], num_partitions).map_groups(
        _pin(topk), batch_format="pyarrow")


def corpus_zipf_stats(ds: ray.data.Dataset, text_col: str = "text",
                      k: int = 100,
                      num_partitions: int = 32) -> ray.data.Dataset:
    """One-row corpus vocabulary-shape summary: ``vocab_size`` (distinct
    terms), ``total_tokens``, ``hapax_cnt`` (terms occurring exactly
    once — the Zipf tail), and ``top_mass`` (fraction of all token
    occurrences covered by the k most frequent terms — the Zipf head;
    boilerplate/template corpora show top_mass near 1). Tokenization
    contract as ``top_terms``.

    Scale shape: per-batch partial counts (shuffle = per-batch
    vocabulary, not token occurrences) -> ONE hash exchange by term
    (partitions are term-disjoint, so vocab / hapax / local top-k are
    all exact per partition) -> a single merge task folds P scalar
    partials + P·k top-k candidate rows. Nothing global ever
    materializes beyond P·(k+1) rows."""
    import numpy as np

    from .dedup import _partition_by, _pin

    parts = ds.map_batches(
        lambda b: _partial_counts(b, text_col),
        batch_format="pyarrow", zero_copy_batch=True)

    def local(group: pa.Table) -> pa.Table:
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        empty = pa.table({
            "cnt": pa.array([], type=pa.int64()),
            "vocab_p": pa.array([], type=pa.int64()),
            "tokens_p": pa.array([], type=pa.int64()),
            "hapax_p": pa.array([], type=pa.int64())})
        if group.num_rows == 0 or "term" not in group.column_names:
            return empty
        s = group.to_pandas().groupby("term", sort=False)["cnt"].sum()
        cnts = s.to_numpy()
        top = np.sort(cnts)[::-1][:k].astype(np.int64)
        if len(top) == 0:
            return empty
        # scalar partials ride row 0 of the top-k block (zeros below),
        # so one table type carries both through the merge
        vocab = np.zeros(len(top), dtype=np.int64)
        vocab[0] = len(cnts)
        tokens = np.zeros(len(top), dtype=np.int64)
        tokens[0] = int(cnts.sum())
        hapax = np.zeros(len(top), dtype=np.int64)
        hapax[0] = int((cnts == 1).sum())
        return pa.table({"cnt": pa.array(top),
                         "vocab_p": pa.array(vocab),
                         "tokens_p": pa.array(tokens),
                         "hapax_p": pa.array(hapax)})

    locals_ds = _partition_by(parts, ["term"], num_partitions).map_groups(
        _pin(local), batch_format="pyarrow")

    @ray.remote
    def merge(*blocks: pa.Table) -> pa.Table:
        bs = [b for b in blocks
              if "cnt" in b.column_names and b.num_rows]
        if not bs:
            return pa.table({
                "vocab_size": pa.array([0], type=pa.int64()),
                "total_tokens": pa.array([0], type=pa.int64()),
                "hapax_cnt": pa.array([0], type=pa.int64()),
                "top_mass": pa.array([0.0], type=pa.float64())})
        t = pa.concat_tables(bs, promote_options="default")
        df = t.to_pandas()
        total = int(df["tokens_p"].sum())
        top = np.sort(df["cnt"].to_numpy())[::-1][:k]
        return pa.table({
            "vocab_size": pa.array([int(df["vocab_p"].sum())],
                                   type=pa.int64()),
            "total_tokens": pa.array([total], type=pa.int64()),
            "hapax_cnt": pa.array([int(df["hapax_p"].sum())],
                                  type=pa.int64()),
            "top_mass": pa.array(
                [float(top.sum()) / total if total else 0.0],
                type=pa.float64())})

    refs = locals_ds.materialize().to_arrow_refs()
    return ray.data.from_arrow_refs([merge.remote(*refs)])


def _top_counts(parts: ray.data.Dataset, k: int,
                num_partitions: int = 32) -> ray.data.Dataset:
    """(term, cnt) partials -> global top-k, ordered by cnt desc then
    term asc. One direct exchange by term (partitions are term-
    disjoint, so a per-partition top-k cut is EXACT), then the P·k
    survivors merge in a single task — no Ray-native sort-groupby or
    global sort anywhere (measured ~3x on the 200k corpus)."""
    import pandas as pd

    from .dedup import _partition_by, _pin

    def local_topk(group: pa.Table) -> pa.Table:
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        df = group.to_pandas().groupby("term", sort=False)["cnt"].sum(
        ).reset_index()
        df = df.sort_values(["cnt", "term"],
                            ascending=[False, True]).head(k)
        return pa.table({"term": pa.array(df["term"], type=pa.string()),
                         "cnt": pa.array(df["cnt"], type=pa.int64())})

    tops = _partition_by(parts, ["term"], num_partitions).map_groups(
        _pin(local_topk), batch_format="pyarrow")

    @ray.remote
    def merge(*blocks: pa.Table) -> pa.Table:
        bs = [b for b in blocks if b.num_columns]
        if not bs:
            return pa.table({"term": pa.array([], type=pa.string()),
                             "cnt": pa.array([], type=pa.int64())})
        t = pa.concat_tables(bs, promote_options="default")
        idx = pc.sort_indices(t, sort_keys=[("cnt", "descending"),
                                            ("term", "ascending")])
        return t.take(idx.slice(0, k))

    refs = tops.materialize().to_arrow_refs()
    return ray.data.from_arrow_refs([merge.remote(*refs)])


def top_terms(ds: ray.data.Dataset, text_col: str = "text",
              k: int = 20) -> ray.data.Dataset:
    """Top-k (term, cnt) rows, ordered by cnt desc then term asc."""
    parts = ds.map_batches(
        lambda b: _partial_counts(b, text_col),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    return _top_counts(parts, k)
