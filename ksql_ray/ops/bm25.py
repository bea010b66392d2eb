"""BM25 full-text retrieval over a document table.

The standard lexical-retrieval scorer (Robertson & Zaragoza 2009,
"The Probabilistic Relevance Framework: BM25 and Beyond") — the
workhorse for corpus search, hard-negative mining and RAG candidate
generation over training corpora. The reference ksql builder has no
text-retrieval surface (absence verified across /root/reference/ksql/
*.go); this extends the engine's training-data ops alongside
ops/terms.py and ops/lm.py.

Tokenization contract (shared with ops/terms.py / ops/lm.py):
``unnest(regexp_split_to_array(trim(lower(text)), '\\s+'))``.

Two passes, both Ray-Data-native and scale-shaped:

1. **Corpus stats** (one stateless ``map_batches``): per-batch partials
   carry ONE row per query term (its in-batch document frequency) plus
   one doc-stats row (doc count, token sum) — O(|query|) bytes per
   batch regardless of corpus size. A distributed ``groupby(term).sum``
   merges them; the merged table (≤ |query|+1 rows) is collected once.
   Nothing corpus-sized ever reaches the driver.
2. **Score** (one stateless ``map_batches``): the per-term IDF vector is
   a tiny plain-Python capture (a handful of floats — no actor pool;
   perf lesson #15: actor-pool startup costs seconds and only pays for
   big broadcasts). Per-batch work is fully vectorized: one tokenize,
   per-doc lengths from list offsets, ONE cython hash pass
   (``pd.Index.get_indexer``) maps every token to its query-term id,
   the (doc × term) tf matrix is one ``np.bincount``, and the BM25
   kernel is numpy arithmetic over that matrix. Each batch emits at
   most k candidate rows (its local top-k), so the final global
   ``sort + limit k`` sees O(k × n_batches) rows — never the corpus.

Scoring (classic Okapi with the non-negative idf variant):
``idf(t) = ln(1 + (N - df + 0.5) / (df + 0.5))``,
``score(d) = Σ_t idf(t) · tf · (k1+1) / (tf + k1·(1 − b + b·dl/avgdl))``
over the query's distinct terms. Docs matching no query term are not
emitted (their score is 0), mirroring the SQL oracle's inner-join
shape. Ties break by ascending doc id on both sides.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from .lm import _tokens

__all__ = ["bm25_topk", "bm25_topk_multi"]


def _query_terms(query: str) -> list[str]:
    """Distinct query terms under the shared tokenization contract,
    sorted so term-id assignment is deterministic."""
    return sorted(set(query.strip().lower().split()))


def _tf_matrix(batch: pa.Table, text_col: str, terms: list[str]):
    """-> (tf int64 [n_docs, n_terms], doc lengths int64 [n_docs]).
    One tokenize + one hash pass per batch; no per-term scans."""
    import pandas as pd

    flat, offsets = _tokens(batch, text_col)
    n_docs = len(offsets) - 1 if len(offsets) else 0
    T = len(terms)
    if n_docs == 0:
        return np.zeros((0, T), dtype=np.int64), np.zeros(0, np.int64)
    dl = np.diff(offsets)
    tid = pd.Index(terms).get_indexer(flat)      # -1 = not a query term
    m = tid >= 0
    row_idx = np.repeat(np.arange(n_docs, dtype=np.int64), dl)
    comb = row_idx[m] * T + tid[m]
    tf = np.bincount(comb, minlength=n_docs * T).reshape(n_docs, T)
    return tf, dl


def _partial_stats(batch: pa.Table, text_col: str,
                   terms: list[str]) -> pa.Table:
    tf, dl = _tf_matrix(batch, text_col, terms)
    # doc-stats row first: df column carries the doc count, tok the
    # token sum ('\0docstats' can never be a real whitespace-split term)
    dfs = np.concatenate(([tf.shape[0]], (tf > 0).sum(axis=0)))
    toks = np.concatenate(([dl.sum()], np.zeros(len(terms), np.int64)))
    return pa.table({
        "term": pa.array(["\0docstats"] + list(terms), type=pa.string()),
        "df": pa.array(dfs, type=pa.int64()),
        "tok": pa.array(toks, type=pa.int64()),
    })


def _corpus_stats(ds: ray.data.Dataset, text_col: str,
                  terms: list[str]) -> tuple[int, float, dict[str, int]]:
    """-> (N docs, avg doc length, per-term document frequency)."""
    parts = ds.map_batches(
        lambda b: _partial_stats(b, text_col, terms),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    from .smallagg import grouped_sum

    agg = grouped_sum(parts, ["term"], ["df", "tok"])
    rows = {r["term"]: r for r in agg.take_all()}
    stats = rows.pop("\0docstats")
    n = int(stats["df"])
    avgdl = float(stats["tok"]) / n if n else 0.0
    df = {t: int(rows[t]["df"]) if t in rows else 0 for t in terms}
    return n, avgdl, df


def _score_batch(batch: pa.Table, text_col: str, id_col: str,
                 terms: list[str], idf: np.ndarray, avgdl: float,
                 k1: float, b: float, k: int) -> pa.Table:
    tf, dl = _tf_matrix(batch, text_col, terms)
    empty = pa.table({
        id_col: pa.array([], type=batch.schema.field(id_col).type),
        "score": pa.array([], type=pa.float64()),
    })
    n_docs = tf.shape[0]
    if n_docs == 0:
        return empty
    dl = dl.astype(np.float64)
    denom_dl = (k1 * (1.0 - b + b * dl / avgdl) if avgdl > 0
                else np.full(n_docs, k1))
    tff = tf.astype(np.float64)
    # tf == 0 cells contribute exactly 0 (w * 0 / denom)
    score = ((idf * (k1 + 1.0)) * tff
             / (tff + denom_dl[:, None])).sum(axis=1)
    hit = np.flatnonzero(score > 0.0)
    if len(hit) == 0:
        return empty
    if len(hit) > k:
        # local top-k cap: the global sort sees O(k) rows per batch
        order = np.lexsort((hit, -score[hit]))[:k]
        hit = hit[order]
    ids = batch.column(id_col).combine_chunks().take(
        pa.array(hit, type=pa.int64()))
    return pa.table({id_col: ids,
                     "score": pa.array(score[hit], type=pa.float64())})


def bm25_topk_multi(ds: ray.data.Dataset, queries: dict[str, str],
                    k: int = 10, k1: float = 1.2, b: float = 0.75,
                    text_col: str = "text",
                    id_col: str = "doc_id") -> ray.data.Dataset:
    """Batch retrieval: top-k documents for EVERY query in one corpus
    scan — (qid, id_col, score) rows, k per query, score desc then id
    asc within a query. Scale shape: the union vocabulary's tf matrix
    and length normalization are computed ONCE per batch, then all Q
    queries score in a single [docs × terms] @ [terms × Q] matmul
    (per-query work is a BLAS column, not a corpus pass); per-batch
    per-query top-k caps bound the final per-key rank stage to
    O(k × batches × Q) rows."""
    if not queries:
        raise ValueError("bm25_topk_multi: no queries")
    per_q = {qid: _query_terms(q) for qid, q in queries.items()}
    if any(not t for t in per_q.values()):
        raise ValueError("bm25_topk_multi: empty query")
    terms = sorted(set().union(*per_q.values()))
    tpos = {t: i for i, t in enumerate(terms)}
    n, avgdl, df = _corpus_stats(ds, text_col, terms)
    idf = {t: float(np.log1p((n - df[t] + 0.5) / (df[t] + 0.5)))
           for t in terms}
    qids = sorted(per_q)
    # W[t, q] = idf(t) iff t in query q
    W = np.zeros((len(terms), len(qids)), dtype=np.float64)
    for qi, qid in enumerate(qids):
        for t in per_q[qid]:
            W[tpos[t], qi] = idf[t]

    def score_batch(batch: pa.Table) -> pa.Table:
        tf, dl = _tf_matrix(batch, text_col, terms)
        n_docs = tf.shape[0]
        empty = pa.table({
            "qid": pa.array([], type=pa.string()),
            id_col: pa.array([], type=batch.schema.field(id_col).type),
            "score": pa.array([], type=pa.float64()),
        })
        if n_docs == 0:
            return empty
        dlf = dl.astype(np.float64)
        denom = (k1 * (1.0 - b + b * dlf / avgdl) if avgdl > 0
                 else np.full(n_docs, k1))
        tff = tf.astype(np.float64)
        sat = tff * (k1 + 1.0) / (tff + denom[:, None])
        scores = sat @ W                       # [docs, Q]
        out_q, out_d, out_s = [], [], []
        ids = batch.column(id_col).combine_chunks()
        for qi, qid in enumerate(qids):
            col = scores[:, qi]
            hit = np.flatnonzero(col > 0.0)
            if len(hit) == 0:
                continue
            if len(hit) > k:
                order = np.lexsort((hit, -col[hit]))[:k]
                hit = hit[order]
            out_q.append(np.full(len(hit), qid, dtype=object))
            out_d.append(hit)
            out_s.append(col[hit])
        if not out_q:
            return empty
        didx = np.concatenate(out_d)
        return pa.table({
            "qid": pa.array(np.concatenate(out_q), type=pa.string()),
            id_col: ids.take(pa.array(didx, type=pa.int64())),
            "score": pa.array(np.concatenate(out_s),
                              type=pa.float64()),
        })

    from .rows import top_n_per_key

    scored = ds.map_batches(score_batch, batch_format="pyarrow",
                            zero_copy_batch=True)
    ranked = top_n_per_key(scored, ["qid"], "score", n=k,
                           descending=True, tiebreak=id_col,
                           num_partitions=max(4, min(32, len(qids))))
    return ranked.drop_columns(["rank"])


def bm25_topk(ds: ray.data.Dataset, query: str, k: int = 10,
              k1: float = 1.2, b: float = 0.75,
              text_col: str = "text",
              id_col: str = "doc_id") -> ray.data.Dataset:
    """Top-k documents for ``query`` by BM25, ordered score desc then
    ``id_col`` asc. Returns a Dataset of (id_col, score)."""
    terms = _query_terms(query)
    if not terms:
        raise ValueError("bm25_topk: empty query")
    n, avgdl, df = _corpus_stats(ds, text_col, terms)
    idf = np.array([np.log1p((n - df[t] + 0.5) / (df[t] + 0.5))
                    for t in terms], dtype=np.float64)
    scored = ds.map_batches(
        lambda bt: _score_batch(bt, text_col, id_col, terms, idf,
                                avgdl, k1, b, k),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    from .smallagg import topk_table

    return topk_table(scored, [("score", "descending"),
                               (id_col, "ascending")], k)
