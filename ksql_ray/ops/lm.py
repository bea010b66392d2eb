"""Corpus-trained bigram language-model scoring (CCNet-style quality pass).

Web-scale pipelines score every document with an n-gram LM and filter on
perplexity (Wenzek et al. 2020 "CCNet", which uses a 5-gram KenLM; the
same two-pass shape at bigram order here). The reference ksql builder has
no corpus-level modelling surface (absence verified across
/root/reference/ksql/*.go) — this extends the engine's training-data ops
alongside ops/quality.py and ops/terms.py.

Tokenization contract (shared with ops/quality.py / ops/terms.py):
``unnest(regexp_split_to_array(trim(lower(text)), '\\s+'))``.

Two passes, both Ray-Data-native:

1. **Train** (`train_bigram_lm`): per-batch partial ``value_counts`` over
   the in-batch transitions — the shuffle carries one (w1, w2, cnt) row
   per distinct transition per batch, not one row per token — merged by a
   distributed ``groupby(["w1","w2"]).sum``. Context counts c1(w) derive
   from the merged transition table (sum over w2); the vocabulary size V
   is a distinct-unigram count that never leaves the cluster
   (``groupby(tok).count().count()``). The merged model (distinct
   transitions only) is collected once and broadcast with ``ray.put``.
   Scale bound: the broadcast is O(distinct transitions); at 10^10-doc
   scale pass ``min_count > 1`` to prune the tail (standard KenLM
   practice — pruned transitions fall back to the add-k smoothing mass,
   so scoring stays total).
2. **Score** (`score_bigram_lm`): actor-pool ``map_batches`` — the model
   broadcast is resolved ONCE per actor in ``__init__`` (perf lesson:
   never ``ray.get`` per batch), lookups are cython hash maps
   (``pd.Series.map``), per-doc log-prob sums are one ``np.bincount``
   segment reduction. No Python loop over rows or tokens.

Model: add-k smoothed conditional bigram,
``lp(doc) = sum_i ln((c2(w_{i-1}, w_i) + k) / (c1(w_{i-1}) + k * V))``
over interior transitions (docs with < 2 tokens score 0.0 with
``n_trans = 0``). Trained on the scored corpus itself, every observed
transition has c2 >= 1, so the oracle needs no OOV branch. The DuckDB
oracle form replicates the formula verbatim (see ``op_lm_score`` in
pipelines/driver_queries.py).
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

__all__ = ["BigramLM", "train_bigram_lm", "score_bigram_lm"]


def _tokens(batch: pa.Table, text_col: str):
    """Flat token array + list offsets for the shared tokenization
    contract. Whitespace-only text yields one '' token (DuckDB agrees);
    NULL text yields zero tokens on both sides."""
    norm = pc.utf8_lower(pc.utf8_trim_whitespace(batch.column(text_col)))
    toks = pc.split_pattern_regex(norm, r"\s+")
    lst = toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks
    offsets = lst.offsets.to_numpy(zero_copy_only=False).astype(np.int64)
    flat = lst.values.to_numpy(zero_copy_only=False)
    # normalize to offset-0 (a sliced ListArray's .values is the unsliced
    # child; indexing below assumes flat[0] is the first row's first token)
    if len(offsets) and offsets[0] != 0:
        flat = flat[offsets[0]:]
        offsets = offsets - offsets[0]
    flat = flat[: offsets[-1] if len(offsets) else 0]
    return flat, offsets


def _transitions(flat: np.ndarray, offsets: np.ndarray):
    """(w1, w2, first_index) of every within-doc adjacent token pair.
    Vectorized: a boolean mask over the flat token stream with the last
    token of every row switched off."""
    n = len(flat)
    if n == 0:
        e = np.empty(0, dtype=object)
        return e, e, np.empty(0, dtype=np.int64)
    mask = np.ones(n, dtype=bool)
    last = offsets[1:] - 1          # last-token index per row; empty rows
    last = last[last >= 0]          # collapse onto the previous row's slot
    mask[last] = False
    i = np.flatnonzero(mask)
    return flat[i], flat[i + 1], i


def _partial_trans_counts(batch: pa.Table, text_col: str) -> pa.Table:
    import pandas as pd

    flat, offsets = _tokens(batch, text_col)
    w1, w2, _ = _transitions(flat, offsets)
    if len(w1) == 0:
        return pa.table({"w1": pa.array([], type=pa.string()),
                         "w2": pa.array([], type=pa.string()),
                         "cnt": pa.array([], type=pa.int64())})
    df = pd.DataFrame({"w1": w1, "w2": w2})
    vc = df.groupby(["w1", "w2"], sort=False).size().reset_index(name="cnt")
    return pa.table({
        "w1": pa.array(vc["w1"].to_numpy(), type=pa.string()),
        "w2": pa.array(vc["w2"].to_numpy(), type=pa.string()),
        "cnt": pa.array(vc["cnt"].to_numpy(), type=pa.int64()),
    })


def _partial_tok_counts(batch: pa.Table, text_col: str) -> pa.Table:
    import pandas as pd

    flat, _ = _tokens(batch, text_col)
    vc = pd.Series(flat).value_counts()
    return pa.table({
        "tok": pa.array(vc.index.to_numpy(), type=pa.string()),
        "cnt": pa.array(vc.to_numpy(), type=pa.int64()),
    })


@dataclass
class BigramLM:
    """Broadcastable trained model: distinct transitions + context counts
    + vocabulary size. ``gram_ref``/``ctx_ref`` are object-store refs to
    pandas Series (cython hash maps), put once, shared by every scorer
    actor."""

    gram_ref: object   # ObjectRef[pd.Series]: "w1\x1fw2" -> c2
    ctx_ref: object    # ObjectRef[pd.Series]: w1 -> c1
    vocab_size: int
    n_transitions: int


_SEP = "\x1f"


def train_bigram_lm(ds: ray.data.Dataset, text_col: str = "text",
                    min_count: int = 1) -> BigramLM:
    """Count transitions distributedly; collect the distinct-transition
    table once (scale bound documented in the module docstring) and
    broadcast it."""
    import pandas as pd

    parts = ds.map_batches(
        lambda b: _partial_trans_counts(b, text_col),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    from .smallagg import grouped_sum

    agg = grouped_sum(parts, ["w1", "w2"], ["cnt"])
    tables = [t for t in ray.get(agg.to_arrow_refs()) if t.num_rows]
    if tables:
        merged = pa.concat_tables(tables, promote_options="permissive")
        w1 = merged.column("w1").combine_chunks().to_numpy(
            zero_copy_only=False)
        w2 = merged.column("w2").combine_chunks().to_numpy(
            zero_copy_only=False)
        c2 = merged.column("cnt").combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
    else:
        w1 = w2 = np.empty(0, dtype=object)
        c2 = np.empty(0, dtype=np.int64)
    n_transitions = int(c2.sum())

    # context counts derive from the (already distinct-transition-sized)
    # merged table — vocabulary-bounded driver work, no extra shuffle
    ctx = pd.Series(c2).groupby(pd.Series(w1)).sum()
    if min_count > 1:
        keep = c2 >= min_count
        w1, w2, c2 = w1[keep], w2[keep], c2[keep]

    keys = pd.Series(w1, dtype=object).str.cat(
        pd.Series(w2, dtype=object), sep=_SEP) if len(w1) else pd.Series(
        [], dtype=object)
    gram = pd.Series(c2, index=keys.to_numpy() if len(w1) else [])

    # V: distinct unigrams, counted in-cluster (never collected)
    tok_parts = ds.map_batches(
        lambda b: _partial_tok_counts(b, text_col),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    vocab_size = int(tok_parts.groupby("tok").sum("cnt").count())

    return BigramLM(gram_ref=ray.put(gram), ctx_ref=ray.put(ctx),
                    vocab_size=vocab_size, n_transitions=n_transitions)


class _Scorer:
    """Actor-pool stage: model resolved once per actor (__init__), one
    vectorized lookup + segment-sum per batch (__call__)."""

    def __init__(self, gram_ref, ctx_ref, vocab_size: int, k: float,
                 id_col: str, text_col: str):
        self.gram = ray.get(gram_ref) if isinstance(
            gram_ref, ray.ObjectRef) else gram_ref
        self.ctx = ray.get(ctx_ref) if isinstance(
            ctx_ref, ray.ObjectRef) else ctx_ref
        self.v = float(vocab_size)
        self.k = float(k)
        self.id_col = id_col
        self.text_col = text_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        flat, offsets = _tokens(batch, self.text_col)
        w1, w2, _ = _transitions(flat, offsets)
        nrows = batch.num_rows
        lens = np.diff(offsets)
        nt = np.maximum(lens - 1, 0)           # transitions per row
        if len(w1):
            keys = pd.Series(w1, dtype=object).str.cat(
                pd.Series(w2, dtype=object), sep=_SEP)
            c2 = keys.map(self.gram).fillna(0.0).to_numpy(dtype=np.float64)
            c1 = pd.Series(w1, dtype=object).map(self.ctx).fillna(0.0) \
                .to_numpy(dtype=np.float64)
            lp = np.log((c2 + self.k) / (c1 + self.k * self.v))
            row_ids = np.repeat(np.arange(nrows), nt)
            doc_lp = np.bincount(row_ids, weights=lp, minlength=nrows)
        else:
            doc_lp = np.zeros(nrows, dtype=np.float64)
        return pa.table({
            self.id_col: batch.column(self.id_col),
            "n_trans": pa.array(nt, type=pa.int64()),
            "lm_logprob": pa.array(doc_lp, type=pa.float64()),
        })


def score_bigram_lm(ds: ray.data.Dataset, lm: BigramLM, k: float = 0.1,
                    id_col: str = "doc_id", text_col: str = "text",
                    concurrency=(1, 8)) -> ray.data.Dataset:
    """Per-doc add-k bigram log-probability: (id, n_trans, lm_logprob).
    Docs with < 2 tokens get n_trans = 0, lm_logprob = 0.0."""
    return ds.map_batches(
        _Scorer,
        fn_constructor_kwargs={
            "gram_ref": lm.gram_ref, "ctx_ref": lm.ctx_ref,
            "vocab_size": lm.vocab_size, "k": k,
            "id_col": id_col, "text_col": text_col,
        },
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency,
    )
