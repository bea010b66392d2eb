"""Distributed multinomial Naive Bayes: model-based corpus classification.

The classic model-based quality / domain filter for LLM training data
(CCNet / GPT-3-style "train a cheap linear classifier, score every
document"): learn per-class token statistics from a labeled corpus in
ONE distributed counting pass, broadcast the tiny model, and score an
arbitrarily large corpus with a vectorized per-batch pass. Extends the
engine's training-data surface; the reference ksql builder has no
model surface at all (absence verified across /root/reference/ksql/*.go
— it builds query strings for a ksqlDB server).

Model (add-alpha multinomial NB over whitespace tokens):

  score(doc, c) = ln P(c) + sum_{tok in doc} ln P(tok | c)
  P(c)          = n_docs_c / n_docs
  P(tok | c)    = (cnt(tok, c) + alpha) / (total_c + alpha * V)

where ``V`` is the corpus vocabulary size (distinct tokens across ALL
classes) and ``total_c`` the total token count of class ``c``. Tokens
unseen in class ``c`` but present in the corpus vocabulary get the
smoothed ``alpha / (total_c + alpha * V)`` mass; tokens outside the
training vocabulary entirely (OOV at scoring time) are smoothed the
same way by default (``oov="smooth"``) or skipped (``oov="skip"``).

Tokenization contract (same as ops/terms.py / ops/quality.py):
``unnest(regexp_split_to_array(trim(lower(text)), '\\s+'))`` — the
DuckDB oracle in pipelines/driver_queries.py is bit-equal.

Shape (scale-first):
- **Train** is one ``map_batches`` partial-counts pass — each batch
  reduces to its distinct (label, term, cnt) rows (pandas value_counts,
  no row loop) — merged by ``smallagg.grouped_sum`` (a single merge
  task; per-batch vocabulary rows are the only shuffle payload, not one
  row per token occurrence). Class priors ride the same pass as
  ``(label, '', n_docs)`` sentinel rows, so training is ONE pass over
  the corpus.
- The fitted model is a dense (V x C) float64 log-prob matrix plus a
  sorted vocab array — broadcast once via ``ray.put`` and shared
  zero-copy by every scoring task. For open-vocabulary corpora cap the
  matrix with ``max_vocab`` (top-N terms by corpus count, deterministic
  ``(cnt desc, term asc)`` tie-break); dropped terms score as OOV.
- **Score** is stateless ``map_batches``: tokenize with Arrow kernels,
  ``np.searchsorted`` the flat token array into the vocab, gather
  log-prob rows and segment-sum per document with ``np.add.reduceat``
  — no Python loop over rows or tokens.
"""

from __future__ import annotations

from dataclasses import dataclass

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

__all__ = ["NBModel", "train_nb", "score_nb", "classify_nb"]

# sentinel "term" used to carry per-class document counts through the
# same (label, term, cnt) counting pass; real tokens can never collide
# (regexp_split never yields a token containing a space)
_DOC_SENTINEL = " docs "


def _tokens(batch: pa.Table, text_col: str) -> pa.ListArray:
    norm = pc.utf8_lower(pc.utf8_trim_whitespace(
        pc.fill_null(pc.cast(batch.column(text_col), pa.string()), "")))
    toks = pc.split_pattern_regex(norm, r"\s+")
    return toks.combine_chunks() if isinstance(toks, pa.ChunkedArray) else toks


def _partial_label_counts(batch: pa.Table, text_col: str,
                          label_col: str) -> pa.Table:
    """Per-batch (label, term, cnt) partials + per-label doc-count
    sentinels. NULL labels are dropped (unlabeled rows train nothing)."""
    import pandas as pd

    lab = pc.cast(batch.column(label_col), pa.string())
    lab = lab.combine_chunks() if isinstance(lab, pa.ChunkedArray) else lab
    keep = pc.is_valid(lab)
    if not pc.all(keep).as_py():
        batch = batch.filter(keep)
        lab = lab.filter(keep)
    if batch.num_rows == 0:
        return pa.table({"label": pa.array([], pa.string()),
                         "term": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    toks = _tokens(batch, text_col)
    offs = toks.offsets.to_numpy().astype(np.int64)
    labels = lab.to_numpy(zero_copy_only=False)
    flat_lab = np.repeat(labels, np.diff(offs))
    flat_tok = toks.values.to_numpy(zero_copy_only=False)
    df = pd.DataFrame({"label": flat_lab, "term": flat_tok})
    vc = df.value_counts(sort=False)
    lv = vc.index.get_level_values
    # doc-count sentinels for the priors
    dl, dc = np.unique(labels, return_counts=True)
    return pa.table({
        "label": pa.array(np.concatenate([lv(0).to_numpy(), dl]),
                          type=pa.string()),
        "term": pa.array(np.concatenate(
            [lv(1).to_numpy(),
             np.full(len(dl), _DOC_SENTINEL, dtype=object)]),
            type=pa.string()),
        "cnt": pa.array(np.concatenate([vc.to_numpy(), dc]),
                        type=pa.int64()),
    })


@dataclass
class NBModel:
    """Fitted multinomial NB: sorted vocab + (V x C) token log-probs."""

    labels: np.ndarray          # (C,) sorted label strings
    vocab: np.ndarray           # (V,) sorted term strings
    log_prob: np.ndarray        # (V, C) ln P(tok | c)
    log_prior: np.ndarray       # (C,) ln P(c)
    oov_log_prob: np.ndarray    # (C,) ln P(unseen tok | c)
    alpha: float
    vocab_size: int             # V used in smoothing (pre-cap corpus V)


def train_nb(ds: ray.data.Dataset, text_col: str = "text",
             label_col: str = "lang", alpha: float = 1.0,
             max_vocab: int | None = None) -> NBModel:
    """One counting pass over ``ds`` -> broadcastable NBModel."""
    if alpha <= 0:
        raise ValueError("alpha must be > 0")
    from .smallagg import grouped_sum

    parts = ds.map_batches(
        lambda b: _partial_label_counts(b, text_col, label_col),
        batch_format="pyarrow", zero_copy_batch=True)
    merged = _concat(grouped_sum(parts, ["label", "term"], ["cnt"]))
    lab = merged.column("label").to_numpy(zero_copy_only=False)
    term = merged.column("term").to_numpy(zero_copy_only=False)
    cnt = merged.column("cnt").to_numpy(zero_copy_only=False)

    is_doc = term == _DOC_SENTINEL
    labels, prior_cnt = lab[is_doc], cnt[is_doc]
    if len(labels) == 0:
        raise ValueError(f"no labeled rows in column {label_col!r}")
    order = np.argsort(labels)
    labels, prior_cnt = labels[order], prior_cnt[order]
    C = len(labels)

    lab_t, term_t, cnt_t = lab[~is_doc], term[~is_doc], cnt[~is_doc]
    vocab = np.unique(term_t)
    V = int(len(vocab))                      # smoothing V: full corpus vocab
    # per-class token totals BEFORE any vocab cap (the cap changes which
    # rows get a dense log-prob, not the class distribution)
    lcode = np.searchsorted(labels, lab_t)
    total_c = np.zeros(C, dtype=np.int64)
    np.add.at(total_c, lcode, cnt_t)

    if max_vocab is not None and V > max_vocab:
        corpus_cnt = np.zeros(V, dtype=np.int64)
        np.add.at(corpus_cnt, np.searchsorted(vocab, term_t), cnt_t)
        # (cnt desc, term asc): vocab is sorted asc, stable mergesort on
        # -cnt keeps the ascending-term order inside each count tie
        top = np.argsort(-corpus_cnt, kind="stable")[:max_vocab]
        kept = np.zeros(V, dtype=bool)
        kept[top] = True
        in_cap = kept[np.searchsorted(vocab, term_t)]
        vocab = np.sort(vocab[top])
        lab_t, term_t, cnt_t = lab_t[in_cap], term_t[in_cap], cnt_t[in_cap]
        lcode = np.searchsorted(labels, lab_t)

    counts = np.zeros((len(vocab), C), dtype=np.float64)
    counts[np.searchsorted(vocab, term_t), lcode] = cnt_t
    denom = total_c.astype(np.float64) + alpha * V
    return NBModel(
        labels=labels, vocab=vocab,
        log_prob=np.log((counts + alpha) / denom),
        log_prior=np.log(prior_cnt / prior_cnt.sum()),
        oov_log_prob=np.log(alpha / denom),
        alpha=float(alpha), vocab_size=V)


def _concat(ds: ray.data.Dataset) -> pa.Table:
    tabs = [t for t in ray.get(ds.to_arrow_refs()) if t.num_rows]
    if not tabs:
        return pa.table({"label": pa.array([], pa.string()),
                         "term": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    return pa.concat_tables(tabs, promote_options="permissive")


class _NBScorer:
    """Actor-pool scoring stage: model deserialized once per actor."""

    def __init__(self, model_ref, text_col: str, id_col: str,
                 oov: str, explode: bool):
        m = ray.get(model_ref) if isinstance(
            model_ref, ray.ObjectRef) else model_ref
        self.m = m
        self.text_col = text_col
        self.id_col = id_col
        self.oov = oov
        self.explode = explode

    def __call__(self, batch: pa.Table) -> pa.Table:
        m = self.m
        toks = _tokens(batch, self.text_col)
        offs = toks.offsets.to_numpy().astype(np.int64)
        flat = toks.values.to_numpy(zero_copy_only=False)
        lp = (m.log_prob if len(m.vocab)
              else np.zeros((1, len(m.labels))))
        if len(m.vocab):
            idx = np.searchsorted(m.vocab, flat)
            idx_c = np.minimum(idx, len(m.vocab) - 1)
            known = m.vocab[idx_c] == flat
        else:
            idx_c = np.zeros(len(flat), dtype=np.int64)
            known = np.zeros(len(flat), dtype=bool)
        # (n_tokens, C) per-token log-probs; OOV rows get the smoothed
        # class mass or zero (skip)
        tl = lp[idx_c]
        if self.oov == "smooth":
            tl = np.where(known[:, None], tl, m.oov_log_prob[None, :])
        else:
            tl = np.where(known[:, None], tl, 0.0)
        # segment-sum per document (empty docs: reduceat needs care —
        # prepend a zero row and use cumsum differences instead)
        csum = np.vstack([np.zeros((1, tl.shape[1])), np.cumsum(tl, axis=0)])
        doc_ll = csum[offs[1:]] - csum[offs[:-1]]
        scores = doc_ll + m.log_prior[None, :]
        ids = batch.column(self.id_col)
        if self.explode:
            n, C = scores.shape
            idv = np.repeat(ids.to_numpy(zero_copy_only=False), C)
            return pa.table({
                self.id_col: pa.array(idv, type=ids.type),
                "label": pa.array(np.tile(m.labels, n), type=pa.string()),
                "score": pa.array(scores.ravel(), type=pa.float64()),
            })
        best = np.argmax(scores, axis=1)
        return pa.table({
            self.id_col: ids,
            "pred": pa.array(m.labels[best], type=pa.string()),
            "score": pa.array(scores[np.arange(len(best)), best],
                              type=pa.float64()),
        })


def score_nb(ds: ray.data.Dataset, model: NBModel, text_col: str = "text",
             id_col: str = "doc_id", oov: str = "smooth",
             concurrency=(1, 8)) -> ray.data.Dataset:
    """Per-document per-class log-scores: (id, label, score) rows,
    ``n_docs x C`` of them. The model ships once per actor."""
    if oov not in ("smooth", "skip"):
        raise ValueError("oov must be 'smooth' or 'skip'")
    ref = ray.put(model)
    return ds.map_batches(
        _NBScorer, fn_constructor_args=(ref, text_col, id_col, oov, True),
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency)


def classify_nb(ds: ray.data.Dataset, model: NBModel, text_col: str = "text",
                id_col: str = "doc_id", oov: str = "smooth",
                concurrency=(1, 8)) -> ray.data.Dataset:
    """Argmax classification: (id, pred, score) with ties broken by
    ascending label (np.argmax takes the first maximum and labels are
    sorted ascending)."""
    if oov not in ("smooth", "skip"):
        raise ValueError("oov must be 'smooth' or 'skip'")
    ref = ray.put(model)
    return ds.map_batches(
        _NBScorer, fn_constructor_args=(ref, text_col, id_col, oov, False),
        batch_format="pyarrow", zero_copy_batch=True,
        concurrency=concurrency)
