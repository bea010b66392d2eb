"""C4-style line-level document cleanup (Raffel et al. 2020, JMLR —
"Exploring the Limits of Transfer Learning", §2.2).

The C4 pipeline's page cleanup is the canonical pre-training text
filter: keep only lines that end in a terminal punctuation mark and
have at least five words, drop lines containing the word
"javascript", drop whole pages containing "lorem ipsum" or a curly
brace, and drop pages left with fewer than three lines. The reference
ksql builder has no string-processing surface at all (absence
verified across /root/reference/ksql/*.go); this extends the engine's
training-data ops alongside ops/quality.py (Gopher repetition rules)
and ops/scrub.py (PII).

Shape (scale-first): ONE stateless ``map_batches`` transform, no
shuffle, nothing materialized. All line work is Arrow kernels over the
flattened line array (split -> per-line predicates -> filter ->
``pa.ListArray.from_arrays`` rebuild -> ``pc.binary_join``); the only
numpy is a ``bincount`` over row ids for the kept-line offsets. No
Python loop over rows or lines, so a batch with millions of lines
costs vectorized kernels only.

Oracle form (DuckDB, bit-equal; see ``op_c4_clean`` in
pipelines/driver_queries.py): the same predicates via
``regexp_matches(line, '[.!?"]$')``, word counts via
``length(regexp_split_to_array(trim(...), '\\s+'))`` and per-doc
reassembly via ``string_agg(line, chr(10) ORDER BY pos)``.

Tokenization/trim contract: lines are trimmed with the explicit
character set ``" \\t\\r"`` (NOT the unicode-whitespace trim) so
DuckDB's ``trim(line, ' ' || chr(9) || chr(13))`` reproduces it
exactly; word counting splits the trimmed line on ``\\s+`` where an
empty line yields one empty token on both sides.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

__all__ = ["c4_clean_batch", "c4_clean", "strip_markup_batch",
           "strip_markup"]

_TRIM_CHARS = " \t\r"
_TERMINAL_RE = r'[.!?"]$'


def _flat_lines(col: pa.Array | pa.ChunkedArray):
    lst = pc.split_pattern(col, "\n")
    if isinstance(lst, pa.ChunkedArray):
        lst = lst.combine_chunks()
    lens = np.asarray(pc.list_value_length(lst), dtype=np.int64)
    return lst.values, lens


def c4_clean_batch(
    batch: pa.Table,
    text_col: str = "text",
    min_words: int = 5,
    min_lines: int = 3,
) -> pa.Table:
    """Apply the C4 page-cleanup rules to one Arrow batch.

    Output schema: the input columns with ``text_col`` replaced by the
    cleaned text, plus ``n_lines`` (lines before filtering) and
    ``n_kept`` (lines surviving). Pages failing the page-level rules
    (banned substring, or fewer than ``min_lines`` surviving lines)
    are dropped from the batch.
    """
    txt = batch.column(text_col)
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()
    low = pc.utf8_lower(txt)
    page_ok = pc.and_(
        pc.invert(pc.match_substring(low, "lorem ipsum")),
        pc.invert(pc.match_substring(txt, "{")),
    )
    batch = batch.filter(page_ok)
    if batch.num_rows == 0:
        out = batch.append_column("n_lines", pa.array([], pa.int64()))
        return out.append_column("n_kept", pa.array([], pa.int64()))
    txt = batch.column(text_col)
    if isinstance(txt, pa.ChunkedArray):
        txt = txt.combine_chunks()

    flat, lens = _flat_lines(txt)
    n = len(lens)
    trimmed = pc.utf8_trim(flat, _TRIM_CHARS)
    words = pc.split_pattern_regex(trimmed, r"\s+")
    wc = pc.list_value_length(words)
    keep = pc.and_(
        pc.and_(
            pc.greater_equal(wc, min_words),
            pc.match_substring_regex(trimmed, _TERMINAL_RE),
        ),
        pc.invert(pc.match_substring(pc.utf8_lower(flat), "javascript")),
    )
    keep_np = keep.to_numpy(zero_copy_only=False)

    row_ids = np.repeat(np.arange(n, dtype=np.int64), lens)
    kept_counts = np.bincount(row_ids[keep_np], minlength=n)
    offsets = np.zeros(n + 1, dtype=np.int64)
    np.cumsum(kept_counts, out=offsets[1:])
    kept_flat = flat.filter(keep)
    if pa.types.is_large_string(kept_flat.type):
        # the large_list kernel only matches a large_string separator
        rebuilt = pa.LargeListArray.from_arrays(
            pa.array(offsets, type=pa.int64()), kept_flat)
        sep = pa.scalar("\n", type=pa.large_string())
    else:
        rebuilt = pa.ListArray.from_arrays(
            pa.array(offsets, type=pa.int32()), kept_flat)
        sep = pa.scalar("\n", type=pa.string())
    joined = pc.binary_join(rebuilt, sep)

    i = batch.column_names.index(text_col)
    out = batch.set_column(i, text_col, joined)
    out = out.append_column("n_lines", pa.array(lens, type=pa.int64()))
    out = out.append_column(
        "n_kept", pa.array(kept_counts, type=pa.int64()))
    return out.filter(
        pc.greater_equal(out.column("n_kept"), min_lines))


def c4_clean(
    ds: ray.data.Dataset,
    text_col: str = "text",
    min_words: int = 5,
    min_lines: int = 3,
) -> ray.data.Dataset:
    """C4 page cleanup over a Dataset — stateless, streaming, zero
    shuffle; safe at any corpus size."""
    return ds.map_batches(
        lambda b: c4_clean_batch(b, text_col=text_col,
                                 min_words=min_words,
                                 min_lines=min_lines),
        batch_format="pyarrow", zero_copy_batch=True)


# markup-strip rules applied IN ORDER (order matters: fenced blocks
# before inline backticks, tags before URL squeeze). Both sides run
# RE2 — pyarrow's replace_substring_regex and DuckDB's regexp_replace
# share the engine, so the oracle reproduces every rule verbatim.
_MARKUP_RULES: tuple[tuple[str, str], ...] = (
    (r"```[\s\S]*?```", " "),        # fenced code blocks (non-greedy)
    (r"`[^`]*`", " "),               # inline code spans
    (r"<[^>]+>", " "),               # html/xml tags
    (r"https?://[^\s]+", " "),       # bare URLs
    (r"[ \t]+", " "),                # collapse runs of spaces/tabs
)


def strip_markup_batch(batch: pa.Table,
                       text_col: str = "text") -> pa.Table:
    """Strip web/chat markup from the text column: fenced code blocks,
    inline code spans, html tags and bare URLs become single spaces,
    then space/tab runs collapse and the result is trimmed (explicit
    ``" \\t\\r"`` set — the same DuckDB-reproducible trim contract as
    :func:`c4_clean_batch`). The standard pre-tokenization cleanup for
    scraped/chat corpora where markup tokens poison n-gram stats and
    dedup fingerprints. One stateless vectorized transform: five RE2
    kernels over the whole column, no shuffle, no row loop."""
    t = batch.column(text_col)
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    out = t
    for pat, rep in _MARKUP_RULES:
        out = pc.replace_substring_regex(out, pat, rep)
    out = pc.utf8_trim(out, " \t\r")
    i = batch.column_names.index(text_col)
    return batch.set_column(i, text_col, out)


def strip_markup(ds: ray.data.Dataset,
                 text_col: str = "text") -> ray.data.Dataset:
    """Dataset wrapper over :func:`strip_markup_batch`."""
    return ds.map_batches(
        lambda b: strip_markup_batch(b, text_col),
        batch_format="pyarrow", zero_copy_batch=True)
