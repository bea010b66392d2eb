"""Byte-pair-encoding subword vocabulary: distributed learning +
distributed encoding (Sennrich, Haddow & Birch, ACL 2016 — "Neural
Machine Translation of Rare Words with Subword Units").

The training-data use: learn a subword vocabulary ON the corpus being
curated (token-budget planning, tokenizer drift detection between
corpus snapshots, per-document subword token counts for packing).
The reference ksql builder has no tokenizer surface (absence verified
across /root/reference/ksql/*.go); this extends the engine's
training-data ops.

Scale shape — the classic two-regime split:

* **corpus pass (distributed)**: BPE training never touches running
  text — it operates on the (word, freq) table. That table is built
  with the same bounded shuffle as ``ops/terms.py``: per-batch partial
  ``value_counts`` inside ``map_batches`` (one cython hash table per
  batch), then a distributed merge + top-``max_word_vocab`` cut. The
  shuffle carries one (word, count) row per distinct word per batch —
  never one row per token occurrence.
* **merge loop (driver)**: the merge iteration is inherently
  sequential (merge k+1 depends on counts after merge k), so it runs
  on the driver over the SMALL word-freq table — ``max_word_vocab``
  rows (default 65 536; the standard "train on the frequency table"
  bound, NOT a corpus-size bound: 100 TB of text still reduces to one
  bounded vocabulary). Incremental pair-count maintenance (only words
  containing the merged pair are revisited) keeps it
  O(merges x touched-words), not O(merges x vocab).
* **encode pass (distributed)**: merges broadcast once
  (``ray.put``); each batch encodes only its UNIQUE words (pandas
  ``value_counts`` — the vocab trick) through a worker-local
  word->tokens cache, then scatters per-word token counts back to
  rows with one vectorized take. Python cost is per distinct word per
  worker lifetime, not per token.

Determinism: ties in pair frequency break on the lexicographically
smallest pair, so the learned merge table is stable across runs and
partitionings (counts are exact integers).

Tokenization contract (same as ops/terms.py / ops/quality.py):
``unnest(regexp_split_to_array(trim(lower(text)), '\\s+'))``; each
word becomes ``list(word) + ["</w>"]`` symbols, so with zero merges a
word costs ``len(word) + 1`` tokens — the SQL-checkable invariant the
``op_bpe_token_count`` gate pins bit-exactly.
"""

from __future__ import annotations

from collections import Counter, defaultdict

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

__all__ = ["learn_bpe", "bpe_token_counts", "merges_table"]

_EOW = "</w>"


# ------------------------------------------------------------ training
def _word_symbols(word: str) -> tuple:
    return tuple(word) + (_EOW,)


def _pair_stats(words: list[tuple], freqs: list[int]):
    pairs: Counter = Counter()
    where: defaultdict = defaultdict(set)
    for i, (syms, f) in enumerate(zip(words, freqs)):
        for a, b in zip(syms, syms[1:]):
            pairs[(a, b)] += f
            where[(a, b)].add(i)
    return pairs, where


def _merge_word(syms: tuple, a: str, b: str) -> tuple:
    out = []
    i, n = 0, len(syms)
    while i < n:
        if i < n - 1 and syms[i] == a and syms[i + 1] == b:
            out.append(a + b)
            i += 2
        else:
            out.append(syms[i])
            i += 1
    return tuple(out)


def learn_bpe(ds: "ray.data.Dataset", text_col: str = "text",
              num_merges: int = 200,
              max_word_vocab: int = 65_536) -> list[tuple[str, str]]:
    """Learn ``num_merges`` BPE merges from the corpus. Returns the
    ranked merge list [(left, right), ...] (rank = list position).

    One distributed corpus pass (word-frequency table, top
    ``max_word_vocab`` words by count with deterministic ties), then
    the driver-side Sennrich merge loop with incremental pair counts.
    """
    from .terms import top_terms

    wf = top_terms(ds, text_col=text_col, k=max_word_vocab)
    tbl = pa.concat_tables(
        [t for t in ray.get(wf.materialize().to_arrow_refs())
         if t.num_columns], promote_options="default")
    words = [_word_symbols(w) for w in tbl.column("term").to_pylist()]
    freqs = [int(c) for c in tbl.column("cnt").to_pylist()]

    pairs, where = _pair_stats(words, freqs)
    merges: list[tuple[str, str]] = []
    for _ in range(num_merges):
        if not pairs:
            break
        # deterministic best: max count, then smallest pair
        best = min(pairs.items(), key=lambda kv: (-kv[1], kv[0]))[0]
        if pairs[best] < 2:
            break
        merges.append(best)
        a, b = best
        for i in list(where[best]):
            old = words[i]
            new = _merge_word(old, a, b)
            f = freqs[i]
            # retract old pair counts for this word, add the new ones
            for p in zip(old, old[1:]):
                pairs[p] -= f
                if pairs[p] <= 0:
                    del pairs[p]
                s = where[p]
                s.discard(i)
                if not s:
                    del where[p]
            for p in zip(new, new[1:]):
                pairs[p] += f
                where[p].add(i)
            words[i] = new
    return merges


def merges_table(merges: list[tuple[str, str]]) -> pa.Table:
    """The learned vocabulary as an Arrow table (rank, left, right,
    token) — what a gate/sink sees."""
    return pa.table({
        "rank": pa.array(range(len(merges)), type=pa.int64()),
        "left": pa.array([a for a, _ in merges], type=pa.string()),
        "right": pa.array([b for _, b in merges], type=pa.string()),
        "token": pa.array([a + b for a, b in merges], type=pa.string()),
    })


# ------------------------------------------------------------ encoding
def _encode_word(word: str, ranks: dict, cache: dict) -> int:
    """Greedy lowest-rank merge (the standard BPE apply). Returns the
    TOKEN COUNT for the word; cached per worker."""
    n = cache.get(word)
    if n is not None:
        return n
    syms = list(word) + [_EOW]
    while len(syms) > 1:
        best_rank, best_pair = None, None
        for p in zip(syms, syms[1:]):
            r = ranks.get(p)
            if r is not None and (best_rank is None or r < best_rank):
                best_rank, best_pair = r, p
        if best_pair is None:
            break
        a, b = best_pair
        out, i, m = [], 0, len(syms)
        while i < m:
            if i < m - 1 and syms[i] == a and syms[i + 1] == b:
                out.append(a + b)
                i += 2
            else:
                out.append(syms[i])
                i += 1
        syms = out
    cache[word] = len(syms)
    return len(syms)


# worker-process-local: (id of merges object) -> (ranks, word cache)
_ENC_CACHE: dict = {}


def bpe_token_counts(ds: "ray.data.Dataset",
                     merges: "list[tuple[str, str]] | ray.ObjectRef",
                     text_col: str = "text",
                     out_col: str = "bpe_token_count") -> "ray.data.Dataset":
    """Append per-row BPE token counts under the learned ``merges``.
    Merges are broadcast (``ray.put`` once when given as a list); each
    batch encodes its unique words only (vocab trick) via a
    worker-local cache."""
    merges_ref = ray.put(merges) if not isinstance(
        merges, ray.ObjectRef) else merges

    def encode_batch(batch: pa.Table) -> pa.Table:
        key = merges_ref.hex()
        state = _ENC_CACHE.get(key)
        if state is None:
            _ENC_CACHE.clear()  # one live vocabulary per worker
            ms = ray.get(merges_ref)
            state = _ENC_CACHE[key] = (
                {tuple(p): r for r, p in enumerate(ms)}, {})
        ranks, cache = state
        col = batch.column(text_col)
        if pa.types.is_null(col.type):  # all-null block → null-typed
            col = pc.cast(col, pa.string())
        norm = pc.utf8_lower(pc.utf8_trim_whitespace(
            pc.fill_null(col, "")))
        toks = pc.split_pattern_regex(norm, r"\s+")
        lst = toks.combine_chunks() if isinstance(
            toks, pa.ChunkedArray) else toks
        flat = lst.values.to_numpy(zero_copy_only=False)
        offs = lst.offsets.to_numpy(zero_copy_only=False)
        # vocab trick: encode unique words once, scatter counts back
        uniq, inv = np.unique(flat.astype(str), return_inverse=True)
        per_uniq = np.fromiter(
            (_encode_word(w, ranks, cache) if w else 0 for w in uniq),
            dtype=np.int64, count=len(uniq))
        per_tok = per_uniq[inv] if len(flat) else np.zeros(
            0, dtype=np.int64)
        csum = np.concatenate(([0], np.cumsum(per_tok)))
        per_doc = csum[offs[1:]] - csum[offs[:-1]]
        return batch.append_column(
            out_col, pa.array(per_doc, type=pa.int64()))

    return ds.map_batches(encode_batch, batch_format="pyarrow",
                          zero_copy_batch=True)
