"""Winnowing rolling-hash document fingerprints over Ray Datasets.

The classic local document-fingerprinting scheme (Schleimer, Wilkerson,
Aiken, "Winnowing: Local Algorithms for Document Fingerprinting",
SIGMOD 2003 — public): hash every word k-gram of a document, slide a
window of ``window`` consecutive gram hashes, and select the minimum
hash of each window (rightmost position on ties). The selected
(position, hash) set is the fingerprint: any shared substring of length
>= window + k - 1 tokens between two documents is guaranteed to share
at least one selected hash, so fingerprints support containment /
plagiarism / near-dup detection at a fraction of the full gram set.

The reference has no fingerprint verb (its only dedup surface is
COLLECT_SET / TOPK_DISTINCT aggregation, ksql/aggregate_fn.go); this is
part of the §2.11 training-data layer.

Two hash forms (the repo's exact-dedup pattern, ops/text.py):
* ``hash="md5"`` — gram hash = first 15 hex digits of md5(gram text)
  as int64 (60 bits, SQL-expressible: DuckDB
  ``('0x' || substr(md5(g), 1, 15))::BIGINT`` — the driver-gate oracle
  form). Gram STRINGS are built vectorized (Arrow
  ``binary_join_element_wise`` over shifted token slices); only the md5
  itself is a C-loop over the flat gram array.
* ``hash="fast"`` (default) — the vectorized multiply-xor gram hash the
  LSH dedup ops use (cython ``pd.util.hash_array`` over the flat token
  stream, no per-gram loop), masked to 60 bits so both forms share an
  output type. The scale path; selection logic is identical and pinned
  against the md5 form by property tests.

Scale shape: fingerprinting is per-document — ONE stateless
``map_batches`` pass, no shuffle, no state. The window-min selection is
one ``sliding_window_view`` argmin over the batch's flattened gram
array (doc-crossing windows masked out), not a per-doc loop. Output is
(doc_id, pos, h) — downstream joins group by ``h`` exactly like the
exact-dedup digest shuffle.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .asof import _pin

_MASK60 = np.uint64((1 << 60) - 1)


def _tokenize(texts) -> tuple[pa.Array, np.ndarray]:
    """Lower/trim/whitespace-split (the dedup ops' token rule).
    Returns (flat tokens, per-doc token counts); empty docs count 0."""
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if pa.types.is_large_string(texts.type):
        texts = pc.cast(texts, pa.string())
    t = pc.utf8_lower(pc.utf8_trim_whitespace(pc.fill_null(texts, "")))
    toks = pc.split_pattern_regex(t, r"\s+")
    counts = pc.list_value_length(toks).to_numpy(
        zero_copy_only=False).astype(np.int64)
    flat = pc.list_flatten(toks)
    if isinstance(flat, pa.ChunkedArray):
        flat = flat.combine_chunks()
    # "" splits to one "" token; count it as an empty doc
    empty = np.asarray(pc.equal(t, "").to_numpy(zero_copy_only=False))
    counts = np.where(empty, 0, counts)
    if empty.any():  # drop the phantom "" tokens from the flat stream
        keep = np.repeat(~empty, np.where(empty, 1, counts))
        flat = flat.filter(pa.array(keep))
    return flat, counts


def _gram_hashes_fast(flat: pa.Array, counts: np.ndarray, k: int) -> np.ndarray:
    import pandas as pd

    from .dedup import _GRAM_PRIMES

    h = pd.util.hash_array(
        flat.to_numpy(zero_copy_only=False), hash_key="ksql_ray_shingle"
    ).astype(np.uint64)
    total = len(h)
    if total < k:
        return np.empty(0, dtype=np.uint64)
    g = h[: total - k + 1] * _GRAM_PRIMES[0]
    for j in range(1, k):
        g = g ^ (h[j: total - k + 1 + j] * _GRAM_PRIMES[j % len(_GRAM_PRIMES)])
    return g & _MASK60


def _gram_hashes_md5(flat: pa.Array, counts: np.ndarray, k: int) -> np.ndarray:
    total = len(flat)
    if total < k:
        return np.empty(0, dtype=np.uint64)
    # element-wise join of the k shifted token slices; the LAST argument
    # is the separator
    parts = [flat.slice(j, total - k + 1) for j in range(k)]
    grams = pc.binary_join_element_wise(*parts, " ")
    md5 = hashlib.md5
    out = np.fromiter(
        (int(md5(s).hexdigest()[:15], 16) for s in
         grams.cast(pa.binary()).to_pylist()),
        dtype=np.uint64, count=total - k + 1)
    return out


def winnow_fingerprints(ds: ray.data.Dataset, *, k: int = 3, window: int = 4,
                        id_col: str = "doc_id", text_col: str = "text",
                        hash: str = "fast") -> ray.data.Dataset:
    """Per document: all word k-grams, hashed; winnowing window-min
    selection (rightmost min per window of ``window`` gram hashes; a doc
    with 1..window-1 grams contributes its single all-grams window).
    Output rows: (id_col, pos, h) — pos = 0-based gram start token
    index, h = int64 gram hash (60-bit in both hash forms).
    """
    if k < 1 or window < 1:
        raise ValueError("k and window must be >= 1")
    if hash not in ("fast", "md5"):
        raise ValueError("hash must be 'fast' or 'md5'")
    gram_fn = _gram_hashes_fast if hash == "fast" else _gram_hashes_md5

    @_pin
    def fp(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col)
        flat, counts = _tokenize(batch.column(text_col))
        n_docs = len(counts)
        # per-doc gram counts; the flat gram array from gram_fn holds a
        # sliding k-window over the whole token stream — positions whose
        # k tokens span a doc boundary are garbage and masked out below
        gcounts = np.maximum(counts - k + 1, 0)
        gcounts[counts == 0] = 0
        all_g = gram_fn(flat, counts, k)
        tok_off = np.concatenate(([0], np.cumsum(counts)))
        # valid gram start positions: [tok_off[d], tok_off[d] + gcounts[d])
        g_doc = np.repeat(np.arange(n_docs), gcounts)
        g_pos_local = np.arange(len(g_doc)) - np.repeat(
            np.cumsum(gcounts) - gcounts, gcounts)
        g_flat_idx = tok_off[g_doc] + g_pos_local
        h = all_g[g_flat_idx] if len(all_g) else np.empty(0, np.uint64)
        ng = len(h)
        if ng == 0:
            return pa.table({id_col: ids.slice(0, 0),
                             "pos": pa.array([], pa.int64()),
                             "h": pa.array([], pa.int64())})
        g_off = np.concatenate(([0], np.cumsum(gcounts)))
        W = window
        sel_doc_parts, sel_pos_parts = [], []
        # full windows: every global start s with s..s+W-1 in one doc
        if ng >= W:
            sw = np.lib.stride_tricks.sliding_window_view(h, W)
            # rightmost min: argmin over the reversed window
            rarg = W - 1 - sw[:, ::-1].argmin(axis=1)
            starts_doc = g_doc[: ng - W + 1]
            in_doc = g_doc[W - 1:] == starts_doc
            s_idx = np.flatnonzero(in_doc)
            pick = s_idx + rarg[s_idx]
            sel_doc_parts.append(g_doc[pick])
            sel_pos_parts.append(g_pos_local[pick])
        # short docs (1 <= grams < W): one window over all their grams
        short = np.flatnonzero((gcounts >= 1) & (gcounts < W))
        if len(short):
            cnt = gcounts[short]
            seg = np.concatenate(([0], np.cumsum(cnt)))[:-1]
            # gathered global gram indices, contiguous per short doc (so
            # reduceat segments stay doc-exact)
            idx = np.repeat(g_off[short], cnt) + (
                np.arange(int(cnt.sum())) - np.repeat(seg, cnt))
            vals = h[idx]
            mins = np.minimum.reduceat(vals, seg)
            is_min = vals == np.repeat(mins, cnt)
            best = np.maximum.reduceat(np.where(is_min, idx, -1), seg)
            sel_doc_parts.append(short)
            sel_pos_parts.append(g_pos_local[best])
        sel_doc = np.concatenate(sel_doc_parts) if sel_doc_parts else \
            np.empty(0, np.int64)
        sel_pos = np.concatenate(sel_pos_parts) if sel_pos_parts else \
            np.empty(0, np.int64)
        # distinct (doc, pos): overlapping windows re-select the same gram
        key = sel_doc.astype(np.uint64) * np.uint64(1 << 32) + \
            sel_pos.astype(np.uint64)
        uniq = np.unique(key)
        u_doc = (uniq >> np.uint64(32)).astype(np.int64)
        u_pos = (uniq & np.uint64(0xFFFFFFFF)).astype(np.int64)
        u_h = h[g_off[u_doc] + u_pos].astype(np.int64)
        return pa.table({
            id_col: ids.take(pa.array(u_doc)),
            "pos": pa.array(u_pos, pa.int64()),
            "h": pa.array(u_h, pa.int64()),
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        fp, batch_format="pyarrow", zero_copy_batch=True)
