"""Benchmark decontamination: flag training docs sharing word n-grams
with an evaluation/benchmark set.

The standard pre-training hygiene pass (the GPT-3 appendix-C method:
a document is contaminated if any length-n token span also appears in
a benchmark document; production pipelines use n≈13). Extends the
engine's training-data surface; the reference ksql builder has no
corpus-overlap operator (absence verified across /root/reference/ksql/*.go).

Scale shape — built on one asymmetry: the corpus is ~100 TB but
benchmark suites are megabytes. So the benchmark side is reduced to a
sorted uint64 gram-hash array and **broadcast** (``ray.put`` once, one
zero-copy plasma read per actor), and the training side streams through
a stateless ``map_batches`` probe — no shuffle at all, the only
all-to-all is the tiny distinct-gram reduction on the benchmark side.
Probe cost per batch is one ``np.searchsorted`` over the batch's grams
(vectorized; no Python loop). ``bench_gram_limit`` guards the broadcast
assumption: if the benchmark side produces more distinct grams than the
limit the op raises instead of silently materializing a corpus-sized
array on the driver (the "no silent caps" rule, inverted).

n-gram semantics are strict (docs with < n tokens contribute zero
grams — exactly what SQL ``list_transform(range(...))`` yields), unlike
the near-dup shingles which use a whole-doc fallback gram.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .dedup import _pin, _word_ngram_hashes

__all__ = ["benchmark_gram_set", "contamination"]


def benchmark_gram_set(bench: ray.data.Dataset, n: int = 13,
                       text_col: str = "text",
                       bench_gram_limit: int = 50_000_000) -> "ray.ObjectRef":
    """Distinct word-n-gram hashes of the benchmark set, as ONE broadcast
    sorted uint64 array. Per-batch np.unique bounds what leaves each
    task; the final cross-batch union runs on the driver because the
    benchmark side is small by contract (guarded by ``bench_gram_limit``)."""

    @_pin
    def batch_grams(batch: pa.Table) -> pa.Table:
        flat, _ = _word_ngram_hashes(batch.column(text_col), n=n,
                                     whole_doc_short=False)
        return pa.table({"g": np.unique(flat)})

    parts = bench.map_batches(batch_grams, batch_format="pyarrow",
                              zero_copy_batch=True)
    chunks = [t.column("g").to_numpy(zero_copy_only=False)
              for t in ray.get(parts.to_arrow_refs()) if t.num_columns]
    total = sum(len(c) for c in chunks)
    if total > bench_gram_limit:
        raise ValueError(
            f"benchmark side produced {total} grams (> {bench_gram_limit}); "
            "the broadcast-small-side contract does not hold — raise the "
            "limit explicitly or swap the sides")
    grams = np.unique(np.concatenate(chunks)) if chunks else np.empty(0, np.uint64)
    return ray.put(grams)  # np.unique output is sorted


class _ContaminationProbe:
    """Actor-pool probe: benchmark gram array fetched once per actor
    (__init__, zero-copy from plasma), one searchsorted per batch."""

    def __init__(self, grams_ref, n: int, id_col: str, text_col: str):
        from ..streaming.driver import limit_worker_threads

        limit_worker_threads()
        self.grams = ray.get(grams_ref) if isinstance(grams_ref, ray.ObjectRef) else grams_ref
        self.n = n
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        flat, offsets = _word_ngram_hashes(batch.column(self.text_col),
                                           n=self.n, whole_doc_short=False)
        matched = np.zeros(len(ids), dtype=np.int64)
        if len(flat) and len(self.grams):
            pos = np.searchsorted(self.grams, flat)
            hit = pos < len(self.grams)
            hit[hit] = self.grams[pos[hit]] == flat[hit]
            if hit.any():
                doc_idx = np.repeat(np.arange(len(ids)), np.diff(offsets))
                # distinct (doc, gram) hits: a gram repeated inside one doc
                # counts once (mirrors the SQL DISTINCT)
                pairs = np.empty(int(hit.sum()),
                                 dtype=[("d", "<i8"), ("g", "<u8")])
                pairs["d"], pairs["g"] = doc_idx[hit], flat[hit]
                uniq = np.unique(pairs)
                matched = np.bincount(uniq["d"], minlength=len(ids)).astype(np.int64)
        return pa.table({
            self.id_col: ids,
            "matched_grams": matched,
            "contaminated": matched > 0,
        })


def contamination(docs: ray.data.Dataset, bench: ray.data.Dataset,
                  n: int = 13, id_col: str = "doc_id", text_col: str = "text",
                  concurrency=(1, 8),
                  bench_gram_limit: int = 50_000_000) -> ray.data.Dataset:
    """-> (id_col, matched_grams, contaminated) for every training doc:
    ``matched_grams`` = number of DISTINCT word n-grams the doc shares
    with any benchmark doc, ``contaminated`` = matched_grams > 0."""
    gref = benchmark_gram_set(bench, n=n, text_col=text_col,
                              bench_gram_limit=bench_gram_limit)
    return docs.map_batches(
        _ContaminationProbe,
        fn_constructor_kwargs={"grams_ref": gref, "n": n,
                               "id_col": id_col, "text_col": text_col},
        batch_format="pyarrow",
        concurrency=concurrency,
        max_restarts=0,  # ctor args in object store + restarts -> ray#53727
    )
