"""DSIR — data selection with importance resampling.

Selects raw-corpus documents whose hashed-n-gram distribution looks
like a TARGET corpus (Xie et al. 2023, "Data Selection for Language
Models via Importance Resampling", NeurIPS). The standard recipe for
skimming a quality-targeted subset out of a web crawl. The reference
ksql builder has no corpus-modelling surface (absence verified across
/root/reference/ksql/*.go); this extends the engine's training-data
ops alongside ops/lm.py and ops/sample.py.

Tokenization contract (shared with ops/lm.py / ops/terms.py):
``unnest(regexp_split_to_array(trim(lower(text)), '\\s+'))``; features
are within-doc adjacent token pairs (bigrams), hashed into ``buckets``
bins.

Two hash methods (same stance as ops/sample.py):

- ``hash="md5"`` — oracle form: bucket =
  ``uint32(first 8 hex of md5(w1 || ' ' || w2)) % buckets``, DuckDB-
  expressible verbatim. md5 runs on the batch's DISTINCT bigrams only
  (one ``pd.factorize`` pass; the per-unique Python loop is gate-only).
- ``hash="fast"`` — scale path: vectorized ``pd.util.hash_array`` over
  the concatenated bigram strings, no row loop. Same statistical
  contract, different hash — NOT oracle-comparable.

Pipeline shape (all Ray-Data-native, nothing corpus-sized on the driver):

1. **Bucket counts** over the target and raw corpora: per-batch partial
   ``np.bincount`` emits ≤ ``buckets`` (bucket, cnt) rows per batch,
   merged by a distributed ``groupby(bucket).sum``; the merged vector
   (``buckets`` floats) is collected once. ``buckets`` is a few
   thousand — constant in corpus size.
2. **Log importance weights** per bucket, add-a smoothed:
   ``lw[b] = ln((tgt[b]+a)/(tgt_tot+a·B)) − ln((raw[b]+a)/(raw_tot+a·B))``.
3. **Score** (one stateless ``map_batches`` over the raw corpus): per-doc
   ``dsir_logw = Σ lw[bucket(gram)]`` via one weighted ``np.bincount``
   segment reduction; docs with < 2 tokens score 0.0 with n_grams 0.
4. **Select**: global ``sort(score desc, id asc) + limit n`` — the
   deterministic top-n variant of the paper's Gumbel-top-k resample
   (exactly reproducible and oracle-checkable; add Gumbel noise keyed
   on a hash of doc_id upstream if sampling-without-replacement
   semantics are needed).
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import ray.data

from .lm import _tokens, _transitions

__all__ = ["hashed_bigram_counts", "dsir_logweights", "score_dsir",
           "dsir_select"]


def _gram_buckets(batch: pa.Table, text_col: str, buckets: int,
                  hash: str) -> tuple[np.ndarray, np.ndarray, int]:
    """-> (bucket id per bigram, doc row per bigram, n_docs)."""
    import pandas as pd

    flat, offsets = _tokens(batch, text_col)
    n_docs = len(offsets) - 1 if len(offsets) else 0
    w1, w2, idx = _transitions(flat, offsets)
    if len(w1) == 0:
        return (np.empty(0, np.int64), np.empty(0, np.int64), n_docs)
    grams = w1 + " "              # object dtype: elementwise concat
    grams = grams + w2
    if hash == "md5":
        codes, uniq = pd.factorize(grams)
        ub = np.fromiter(
            (int(hashlib.md5(g.encode()).hexdigest()[:8], 16) % buckets
             for g in uniq),
            dtype=np.int64, count=len(uniq))
        bk = ub[codes]
    elif hash == "fast":
        bk = (pd.util.hash_array(grams) % np.uint64(buckets)).astype(
            np.int64)
    else:
        raise ValueError("hash must be 'md5' or 'fast'")
    # doc row of each transition: searchsorted over the list offsets
    row = np.searchsorted(offsets, idx, side="right") - 1
    return bk, row, n_docs


def hashed_bigram_counts(ds: ray.data.Dataset, text_col: str = "text",
                         buckets: int = 1024,
                         hash: str = "md5") -> np.ndarray:
    """Corpus-wide hashed-bigram bucket counts (length ``buckets``)."""
    def partial(batch: pa.Table) -> pa.Table:
        bk, _, _ = _gram_buckets(batch, text_col, buckets, hash)
        cnt = np.bincount(bk, minlength=buckets)
        nz = np.flatnonzero(cnt)
        return pa.table({"b": pa.array(nz, type=pa.int64()),
                         "cnt": pa.array(cnt[nz], type=pa.int64())})

    from .smallagg import grouped_sum

    agg = grouped_sum(ds.map_batches(partial, batch_format="pyarrow",
                                     zero_copy_batch=True),
                      ["b"], ["cnt"])
    out = np.zeros(buckets, dtype=np.int64)
    for r in agg.take_all():
        out[int(r["b"])] = int(r["cnt"])
    return out


def dsir_logweights(target_counts: np.ndarray, raw_counts: np.ndarray,
                    a: float = 0.5) -> np.ndarray:
    """Per-bucket add-a smoothed log importance weights."""
    B = len(raw_counts)
    tt, rt = float(target_counts.sum()), float(raw_counts.sum())
    return (np.log((target_counts + a) / (tt + a * B))
            - np.log((raw_counts + a) / (rt + a * B)))


def score_dsir(ds: ray.data.Dataset, logweights: np.ndarray,
               text_col: str = "text", id_col: str = "doc_id",
               hash: str = "md5") -> ray.data.Dataset:
    """Append per-doc DSIR log importance weight:
    (id_col, n_grams, dsir_logw)."""
    buckets = len(logweights)

    def fn(batch: pa.Table) -> pa.Table:
        bk, row, n_docs = _gram_buckets(batch, text_col, buckets, hash)
        n_grams = np.bincount(row, minlength=n_docs)
        score = np.bincount(row, weights=logweights[bk],
                            minlength=n_docs)
        return pa.table({
            id_col: batch.column(id_col),
            "n_grams": pa.array(n_grams, type=pa.int64()),
            "dsir_logw": pa.array(score, type=pa.float64()),
        })

    return ds.map_batches(fn, batch_format="pyarrow",
                          zero_copy_batch=True)


def _fused_counts(ds: ray.data.Dataset, text_col: str, buckets: int,
                  hash: str, target_mask) -> tuple[np.ndarray, np.ndarray]:
    """ONE pass over the raw corpus producing both raw and target
    bucket counts (target membership decided per row by
    ``target_mask(batch) -> bool ndarray``) — halves the corpus reads
    vs two hashed_bigram_counts passes."""
    def partial(batch: pa.Table) -> pa.Table:
        bk, row, _n = _gram_buckets(batch, text_col, buckets, hash)
        raw = np.bincount(bk, minlength=buckets)
        m = np.asarray(target_mask(batch), dtype=bool)
        tgt = np.bincount(bk[m[row]], minlength=buckets)
        nz = np.flatnonzero(raw)
        return pa.table({"b": pa.array(nz, type=pa.int64()),
                         "raw": pa.array(raw[nz], type=pa.int64()),
                         "tgt": pa.array(tgt[nz], type=pa.int64())})

    from .smallagg import grouped_sum

    agg = grouped_sum(ds.map_batches(partial, batch_format="pyarrow",
                                     zero_copy_batch=True),
                      ["b"], ["raw", "tgt"])
    raw = np.zeros(buckets, dtype=np.int64)
    tgt = np.zeros(buckets, dtype=np.int64)
    for r in agg.take_all():
        raw[int(r["b"])] = int(r["raw"])
        tgt[int(r["b"])] = int(r["tgt"])
    return tgt, raw


def dsir_select(raw_ds: ray.data.Dataset,
                target_ds: ray.data.Dataset | None = None,
                n: int = 100, text_col: str = "text",
                id_col: str = "doc_id",
                buckets: int = 1024, a: float = 0.5,
                hash: str = "md5", target_mask=None) -> ray.data.Dataset:
    """Top-n raw docs by DSIR importance (score desc, id asc):
    (id_col, n_grams, dsir_logw).

    Two target forms: ``target_ds`` (an arbitrary separate corpus — two
    counting passes) or ``target_mask`` (a ``batch -> bool ndarray``
    predicate marking the target subset of the RAW corpus — ONE fused
    counting pass, the cheaper shape when the target is a filter of the
    corpus being scored, e.g. "high-quality docs")."""
    if (target_ds is None) == (target_mask is None):
        raise ValueError("exactly one of target_ds / target_mask")
    if target_mask is not None:
        tgt, raw = _fused_counts(raw_ds, text_col, buckets, hash,
                                 target_mask)
    else:
        tgt = hashed_bigram_counts(target_ds, text_col, buckets, hash)
        raw = hashed_bigram_counts(raw_ds, text_col, buckets, hash)
    lw = dsir_logweights(tgt, raw, a)
    scored = score_dsir(raw_ds, lw, text_col, id_col, hash)
    from .smallagg import topk_table

    return topk_table(scored, [("dsir_logw", "descending"),
                               (id_col, "ascending")], n)
