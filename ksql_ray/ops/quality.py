"""Gopher-style repetition / quality-filter statistics.

Large-scale training-data pipelines filter documents on repetition
heuristics (Rae et al. 2021 "Scaling Language Models" §A1.1: duplicate
line / word fractions, top n-gram fraction, symbol-to-word ratios).
The reference ksql builder has no scalar string library (absence
verified across /root/reference/ksql/*.go) — this extends the engine's
training-data surface alongside ops/text.py.

Ray-Data-native: one stateless ``map_batches`` transform over zero-copy
Arrow batches. Per-row token statistics are computed with ONE flattened
lexsort over (row, token-hash) pairs per batch — no Python loop over
rows or tokens — so a batch with millions of tokens costs O(T log T)
numpy, not O(rows) interpreter time.

Oracle forms (DuckDB, bit-equal; see pipelines/driver_queries.py
``op_quality_filter``):

- ``dup_word_frac``  = ROUND(1 - count(DISTINCT tok)::DOUBLE / count(tok), 6)
- ``top_word_frac``  = ROUND(max(per-token count)::DOUBLE / count(tok), 6)
- ``mean_word_len``  = ROUND(avg(length(tok)), 6)
- ``symbol_word_ratio`` = ROUND((#'#' + #'...') / count(tok), 6)
- ``dup_line_frac``  like dup_word_frac over string_split(text, chr(10))

where tok = unnest(regexp_split_to_array(trim(lower(text)), '\\s+')).
An all-whitespace document splits to one empty token on BOTH sides
(Arrow and DuckDB agree), so no special-casing is needed.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

__all__ = ["add_char_entropy", "add_repetition_stats",
           "add_ngram_repetition", "quality_filter",
           "quality_keep_mask"]


def _round6(x: np.ndarray) -> np.ndarray:
    # SQL ROUND half-away-from-zero; np.round's half-even differs on
    # exact ties (BASELINE.md perf lesson #13). Values here are >= 0.
    return np.floor(x * 1e6 + 0.5) / 1e6


def _segment_stats(flat: pa.Array, lens: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Per-row (distinct count, max run length) over a flattened list
    column. One lexsort over (row, hash64) — vectorized, no row loop.
    64-bit token hashing: within-row collision odds are ~k^2/2^65 per
    row (negligible even at 10^6-token documents)."""
    import pandas as pd

    n = len(lens)
    row_ids = np.repeat(np.arange(n, dtype=np.int64), lens)
    vals = flat.to_numpy(zero_copy_only=False)
    h = pd.util.hash_array(vals).astype(np.uint64)
    order = np.lexsort((h, row_ids))
    sr, sh = row_ids[order], h[order]
    new = np.ones(len(sr), dtype=bool)
    if len(sr) > 1:
        new[1:] = (sr[1:] != sr[:-1]) | (sh[1:] != sh[:-1])
    starts = np.flatnonzero(new)
    distinct = np.bincount(sr[starts], minlength=n)
    run_len = np.diff(np.append(starts, len(sr)))
    top = np.zeros(n, dtype=np.int64)
    np.maximum.at(top, sr[starts], run_len)
    return distinct, top


def _list_parts(col: pa.Array | pa.ChunkedArray) -> tuple[pa.Array, np.ndarray]:
    lst = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    offsets = lst.offsets.to_numpy()
    return lst.values, np.diff(offsets)


def add_char_entropy(batch: pa.Table, text_col: str = "text",
                     out: str = "char_entropy") -> pa.Table:
    """Append the Shannon entropy of each document's CODEPOINT
    distribution (bits/char, rounded to 6 dp with SQL ROUND) — a cheap
    low-quality signal: boilerplate, base64/hex blobs, and key-mash
    text sit far from natural language's ~4 bits/char. NULL text →
    NULL; empty text → 0.0 (entropy of the empty distribution).

    Vectorized: the batch's strings are encoded once to a flat UTF-32
    buffer, per-(doc, codepoint) counts come from one ``np.unique``
    over packed ``doc_idx·2²¹ | codepoint`` keys, entropy is a
    ``np.add.reduceat`` per doc segment (summands sorted by codepoint,
    so the float sum order is layout-independent). No per-row Python
    beyond one C-level ``str.join``."""
    t = batch.column(text_col)
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    s = pc.cast(t, pa.string())
    null = pc.is_null(s).to_numpy(zero_copy_only=False)
    lens = pc.fill_null(pc.utf8_length(s), 0).to_numpy(
        zero_copy_only=False).astype(np.int64)
    ent = np.zeros(batch.num_rows, dtype=np.float64)
    if int(lens.sum()):
        joined = "".join(pc.fill_null(s, "").to_pylist())
        cps = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
        doc_idx = np.repeat(
            np.arange(batch.num_rows, dtype=np.int64), lens)
        packed = (doc_idx << 21) | cps.astype(np.int64)
        upacked, cnt = np.unique(packed, return_counts=True)
        docs = upacked >> 21
        starts = np.flatnonzero(np.r_[True, docs[1:] != docs[:-1]])
        p = cnt / lens[docs]
        sums = np.add.reduceat(p * np.log2(p), starts)
        ent[docs[starts]] = -sums
    ent = _round6(np.abs(ent))        # -0.0 from single-char docs
    return batch.append_column(
        out, pa.array(np.where(null, 0.0, ent), mask=null))


def add_repetition_stats(batch: pa.Table, text_col: str = "text") -> pa.Table:
    """Append dup_word_frac / top_word_frac / mean_word_len /
    symbol_word_ratio / dup_line_frac (all float64, rounded to 6 dp
    with SQL ROUND semantics)."""
    t = batch.column(text_col)
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    norm = pc.utf8_lower(pc.utf8_trim_whitespace(t))
    flat_tok, n_tok = _list_parts(pc.split_pattern_regex(norm, r"\s+"))
    distinct, top = _segment_stats(flat_tok, n_tok)
    tok_chars = pc.utf8_length(flat_tok).to_numpy(zero_copy_only=False)
    # every row has >= 1 token ('' splits to ['']) so reduceat is safe
    char_sums = np.add.reduceat(tok_chars, np.concatenate(([0], np.cumsum(n_tok)[:-1])))

    nt = n_tok.astype(np.float64)
    dup_word = _round6(1.0 - distinct / nt)
    top_word = _round6(top / nt)
    mean_len = _round6(char_sums / nt)

    hashes = pc.count_substring(t, "#").to_numpy(zero_copy_only=False)
    ellipses = pc.count_substring(t, "...").to_numpy(zero_copy_only=False)
    symbol = _round6((hashes + ellipses) / nt)

    flat_line, n_line = _list_parts(pc.split_pattern(t, "\n"))
    line_distinct, _ = _segment_stats(flat_line, n_line)
    dup_line = _round6(1.0 - line_distinct / n_line.astype(np.float64))

    for name, arr in (
        ("dup_word_frac", dup_word), ("top_word_frac", top_word),
        ("mean_word_len", mean_len), ("symbol_word_ratio", symbol),
        ("dup_line_frac", dup_line),
    ):
        batch = batch.append_column(name, pa.array(arr, type=pa.float64()))
    return batch


def add_ngram_repetition(
    batch: pa.Table,
    text_col: str = "text",
    top_ns: tuple[int, ...] = (2, 3, 4),
    dup_ns: tuple[int, ...] = (5, 6, 7, 8, 9, 10),
) -> pa.Table:
    """Append Gopher's n-gram repetition signals (Rae et al. 2021
    §A1.1, the half :func:`add_repetition_stats` doesn't cover):

    - ``top_{n}gram_char_frac`` (n in ``top_ns``): fraction of word
      characters contained in the occurrences of the doc's most
      frequent word n-gram (count × n-gram char length / total word
      chars; overlaps double-count, per the paper's definition). Ties
      on count break to the larger char total, so the VALUE is
      deterministic even when the winning gram isn't.
    - ``dup_{n}gram_char_frac`` (n in ``dup_ns``): fraction of word
      characters covered by at least one occurrence of a DUPLICATED
      n-gram (union coverage — chars counted once, per the paper).

    Tokenization: lowercase, split on ``\\s+``, empty tokens dropped
    (so leading/trailing whitespace is irrelevant and no SQL ``trim``
    semantics mismatch exists); char totals count word characters
    only, never separators. NULL/empty/too-short docs get 0.0.

    Vectorized, no row loops: one 64-bit token-hash pass, per-n
    rolling Horner window hashes, one lexsort per n for the
    (doc, gram) group counts, and a diff-array prefix sum for the
    duplicate-coverage union. Gram equality is by 64-bit hash —
    within-doc collision odds ~k²/2⁻⁶⁵ (negligible; the oracle gate
    compares true string grams and has never diverged at test scale).
    """
    import pandas as pd

    ns = sorted(set(top_ns) | set(dup_ns))
    if any(n < 2 for n in ns):
        raise ValueError("n-gram sizes must be >= 2")
    t = batch.column(text_col)
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    norm = pc.utf8_lower(pc.fill_null(pc.cast(t, pa.string()), ""))
    flat, lens = _list_parts(pc.split_pattern_regex(norm, r"\s+"))
    n_rows = batch.num_rows
    tok_len_all = pc.utf8_length(flat).to_numpy(zero_copy_only=False)
    row_all = np.repeat(np.arange(n_rows, dtype=np.int64), lens)
    keep = tok_len_all > 0
    row_ids = row_all[keep]
    tok_len = tok_len_all[keep].astype(np.int64)
    vals = flat.to_numpy(zero_copy_only=False)[keep]
    ht = pd.util.hash_array(vals).astype(np.uint64)
    total = np.bincount(row_ids, weights=tok_len,
                        minlength=n_rows)
    safe_total = np.where(total > 0, total, 1.0)
    T = len(row_ids)

    out_cols: dict[str, np.ndarray] = {}
    MIX = np.uint64(0x100000001B3)
    for n in ns:
        top_chars = np.zeros(n_rows, dtype=np.float64)
        cov_chars = np.zeros(n_rows, dtype=np.float64)
        if T >= n:
            W = T - n + 1
            valid = row_ids[:W] == row_ids[n - 1:]
            gh = np.zeros(W, dtype=np.uint64)
            gl = np.zeros(W, dtype=np.int64)
            for j in range(n):
                gh = gh * MIX + ht[j:W + j]
                gl += tok_len[j:W + j]
            starts = np.flatnonzero(valid)
            if len(starts):
                w_row = row_ids[starts]
                w_gh, w_gl = gh[starts], gl[starts]
                order = np.lexsort((w_gh, w_row))
                sr, sh = w_row[order], w_gh[order]
                sgl, sstart = w_gl[order], starts[order]
                new = np.ones(len(sr), dtype=bool)
                new[1:] = (sr[1:] != sr[:-1]) | (sh[1:] != sh[:-1])
                g_start = np.flatnonzero(new)
                g_cnt = np.diff(np.append(g_start, len(sr)))
                g_row, g_gl = sr[g_start], sgl[g_start]
                if n in top_ns:
                    o2 = np.lexsort((g_gl, g_cnt, g_row))
                    rr = g_row[o2]
                    last = np.ones(len(rr), dtype=bool)
                    last[:-1] = rr[1:] != rr[:-1]
                    li = o2[last]
                    top_chars[g_row[li]] = (
                        g_cnt[li] * g_gl[li]).astype(np.float64)
                if n in dup_ns:
                    dup_occ = sstart[np.repeat(g_cnt > 1, g_cnt)]
                    if len(dup_occ):
                        d = np.zeros(T + 1, dtype=np.int64)
                        np.add.at(d, dup_occ, 1)
                        np.add.at(d, dup_occ + n, -1)
                        cov = np.cumsum(d[:T]) > 0
                        cov_chars = np.bincount(
                            row_ids[cov], weights=tok_len[cov],
                            minlength=n_rows)
        if n in top_ns:
            out_cols[f"top_{n}gram_char_frac"] = _round6(
                np.where(total > 0, top_chars / safe_total, 0.0))
        if n in dup_ns:
            out_cols[f"dup_{n}gram_char_frac"] = _round6(
                np.where(total > 0, cov_chars / safe_total, 0.0))
    for name, arr in out_cols.items():
        batch = batch.append_column(
            name, pa.array(arr, type=pa.float64()))
    return batch


def quality_filter(
    ds: ray.data.Dataset,
    text_col: str = "text",
    max_dup_word_frac: float = 0.30,
    max_top_word_frac: float = 0.20,
    max_dup_line_frac: float = 0.30,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    max_symbol_word_ratio: float = 0.10,
    keep_stats: bool = False,
) -> ray.data.Dataset:
    """Gopher-style repetition filter: drop documents whose repetition
    stats fall outside the thresholds. Streaming ``map_batches`` —
    filtering happens inside the batch transform (no separate
    ``Dataset.filter`` row pass)."""
    stat_cols = ["dup_word_frac", "top_word_frac", "mean_word_len",
                 "symbol_word_ratio", "dup_line_frac"]

    def fn(batch: pa.Table) -> pa.Table:
        orig = batch.column_names
        batch = add_repetition_stats(batch, text_col)
        keep = quality_keep_mask(
            batch, max_dup_word_frac=max_dup_word_frac,
            max_top_word_frac=max_top_word_frac,
            max_dup_line_frac=max_dup_line_frac,
            min_mean_word_len=min_mean_word_len,
            max_mean_word_len=max_mean_word_len,
            max_symbol_word_ratio=max_symbol_word_ratio)
        out = batch.filter(keep)
        return out if keep_stats else out.select(orig)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def quality_keep_mask(
    batch: pa.Table,
    max_dup_word_frac: float = 0.30,
    max_top_word_frac: float = 0.20,
    max_dup_line_frac: float = 0.30,
    min_mean_word_len: float = 2.0,
    max_mean_word_len: float = 12.0,
    max_symbol_word_ratio: float = 0.10,
) -> pa.Array:
    """Boolean keep mask over a batch that already carries the
    :func:`add_repetition_stats` columns — the one threshold rule
    shared by the bounded ``quality_filter`` and the streaming prep
    pre-transform (pipelines/prep.prep_batch)."""
    return pc.and_(
        pc.and_(
            pc.and_(
                pc.less_equal(batch.column("dup_word_frac"),
                              max_dup_word_frac),
                pc.less_equal(batch.column("top_word_frac"),
                              max_top_word_frac),
            ),
            pc.and_(
                pc.less_equal(batch.column("dup_line_frac"),
                              max_dup_line_frac),
                pc.less_equal(batch.column("symbol_word_ratio"),
                              max_symbol_word_ratio),
            ),
        ),
        pc.and_(
            pc.greater_equal(batch.column("mean_word_len"),
                             min_mean_word_len),
            pc.less_equal(batch.column("mean_word_len"),
                          max_mean_word_len),
        ),
    )


def add_readability(batch: pa.Table, text_col: str = "text",
                    out: str = "flesch") -> pa.Table:
    """Append a Flesch-reading-ease approximation per document —
    `206.835 - 1.015·(words/sentences) - 84.6·(syllables/words)` with
    words = whitespace tokens, sentences = max(1, count of `[.!?]+`
    runs), syllables = vowel-group count with a floor of 1 per word
    (Flesch 1948; the vowel-run syllable heuristic is the standard
    cheap approximation, e.g. textstat). Natural prose scores ~30-80;
    boilerplate/code/key-mash text goes strongly negative or >100 —
    a corpus-quality dimension orthogonal to entropy/repetition.

    Vectorized: three Arrow RE2 kernels (`count_substring_regex` for
    vowel runs and sentence runs — a vowel run cannot cross the
    whitespace that separates tokens, so the doc-level count equals
    the per-word sum — plus one split for word counts) and a
    no-vowel-word correction via `match_substring_regex` over the flat
    token buffer. NULL text → NULL; rounded to 4 dp (SQL ROUND form).
    """
    t = batch.column(text_col)
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    s = pc.cast(t, pa.string())
    null = pc.is_null(s).to_numpy(zero_copy_only=False)
    lower = pc.utf8_lower(pc.utf8_trim_whitespace(pc.fill_null(s, "")))
    toks = pc.split_pattern_regex(lower, r"\s+")
    if isinstance(toks, pa.ChunkedArray):
        toks = toks.combine_chunks()
    offs = toks.offsets.to_numpy().astype(np.int64)
    words = np.diff(offs).astype(np.float64)          # >= 1 ('' token)
    vowel_runs = pc.count_substring_regex(
        lower, "[aeiouy]+").to_numpy(zero_copy_only=False).astype(
        np.float64)
    # words with no vowel still count one syllable: add their number
    has_vowel = pc.match_substring_regex(
        toks.values, "[aeiouy]").to_numpy(zero_copy_only=False)
    no_vowel = np.add.reduceat(
        (~has_vowel).astype(np.int64), offs[:-1]) if len(
        has_vowel) else np.zeros(0, np.int64)
    no_vowel = np.where(words > 0, no_vowel, 0).astype(np.float64)
    syllables = vowel_runs + no_vowel
    sentences = np.maximum(pc.count_substring_regex(
        lower, "[.!?]+").to_numpy(zero_copy_only=False), 1).astype(
        np.float64)
    score = (206.835 - 1.015 * (words / sentences)
             - 84.6 * (syllables / words))
    scale = 10.0 ** 4
    score = np.trunc(score * scale + np.where(score >= 0, 0.5,
                                              -0.5)) / scale
    return batch.append_column(
        out, pa.array(np.where(null, 0.0, score), mask=null))


def auto_quality_filter(
    ds: ray.data.Dataset,
    keep: dict[str, float],
    lower_better: tuple[str, ...] = (),
    capacity: int = 1 << 17,
    require_exact: bool = True,
) -> tuple[ray.data.Dataset, dict[str, float]]:
    """Percentile-calibrated quality filtering: instead of hand-tuned
    absolute thresholds (which rot as the corpus mix shifts), keep the
    top ``keep[col]`` fraction of the corpus by each metric — the
    threshold is the corpus's own ``quantile_disc(1 - frac)`` (or
    ``quantile_disc(frac)`` with ``col in lower_better``, where small
    values win, e.g. perplexity). Rows must clear EVERY metric; NULL
    metric values never pass (SQL comparison semantics). Returns
    ``(filtered_ds, {col: threshold})``.

    Scale shape: one ``dataset_quantiles`` sketch pass per metric (the
    only thing shuffled is sketch state, <= ~capacity rows per batch
    partial; exact quantile_disc while max_rank_error is 0, which the
    sketch guarantees until ~capacity^2 rows — ``require_exact``
    enforces it), then ONE stateless filter map with the thresholds in
    the task closure. The metric columns never shuffle."""
    from .quantiles import dataset_quantiles

    if not keep:
        raise ValueError("keep must be non-empty")
    for col, frac in keep.items():
        if not 0.0 < frac <= 1.0:
            raise ValueError(f"keep[{col!r}] must be in (0, 1]")
    thresholds: dict[str, float] = {}
    for col, frac in keep.items():
        lb = col in lower_better
        q = frac if lb else 1.0 - frac
        t, err = dataset_quantiles(ds, col, [q], capacity)
        if require_exact and err != 0:
            raise ValueError(
                f"rank error {err} != 0 for {col}: raise capacity "
                "above the row count for exact thresholds")
        thresholds[col] = float(t.column("value")[0].as_py())

    def keep_mask(batch: pa.Table) -> pa.Table:
        mask = np.ones(batch.num_rows, dtype=bool)
        for col, thr in thresholds.items():
            v = pc.cast(batch.column(col), pa.float64()).to_numpy(
                zero_copy_only=False)
            with np.errstate(invalid="ignore"):
                ok = v <= thr if col in lower_better else v >= thr
            mask &= np.where(np.isnan(v), False, ok)
        return batch.filter(pa.array(mask))

    return (ds.map_batches(keep_mask, batch_format="pyarrow",
                           zero_copy_batch=True), thresholds)
