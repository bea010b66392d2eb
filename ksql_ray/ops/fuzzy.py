"""Fuzzy (edit-distance <= 1) pair detection over a string column.

Typo-level near-duplicate keys — spelling variants in a vocabulary,
mistyped usernames/URLs/product codes — are the string analogue of the
dedup family in ops/dedup.py. The reference has no string-similarity
surface (absence verified across /root/reference/ksql/*.go).

Algorithm: symmetric-delete candidate generation (the SymSpell scheme,
public domain — Garbe 2012) + exact vectorized verification:

1. distinct values of the column (per-batch unique, one key shuffle);
2. each value emits itself + every single-codepoint deletion as a
   fixed-width binary VARIANT key — two values within edit distance 1
   (insert / delete / substitute) necessarily share a variant
   (substitution: delete the differing position from both; indel: the
   shorter string is itself a deletion of the longer), so candidate
   generation is exact-complete;
3. variants hash-shuffle; multi-member buckets emit unique candidate
   pairs (jumbo buckets star-cap like ops/dedup, counted to op-stats);
4. pairs dedupe by one (tok_a, tok_b) shuffle and are verified with an
   exact edit-distance-<=1 check — sharing a variant is necessary but
   NOT sufficient (e.g. "ab"/"ba" share "a" at distance 2).

Everything is numpy over UTF-32 codepoint matrices (one C-level join +
encode per call, no per-string Python): the verify step compares
equal-length pairs by substitution count and length-±1 pairs by the
first-mismatch + shifted-suffix rule, both as whole-matrix kernels.

Scale shape: the variant shuffle carries O(distinct · max_len) rows of
4·max_len bytes each — bounded by the VOCABULARY, never the corpus row
count; verification touches only candidate pairs. max_len caps the
per-value fan-out (longer values are excluded, mirrored by the gate
oracle's length filter).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .dedup import _bucket_segments, _partition_by, _pin

__all__ = ["fuzzy_pairs"]


def _cp_matrix(strs, width: int) -> tuple[np.ndarray, np.ndarray]:
    """(n, width) uint32 codepoint matrix (zero-padded; codepoint 0
    never occurs in real text, so padding is injective) + lengths."""
    if not isinstance(strs, (pa.Array, pa.ChunkedArray)):
        strs = pa.array(list(strs), type=pa.string())
    if isinstance(strs, pa.ChunkedArray):
        strs = strs.combine_chunks()
    s = pc.cast(strs, pa.string())
    lens = pc.utf8_length(s).to_numpy(zero_copy_only=False).astype(
        np.int64)
    n = len(lens)
    mat = np.zeros((n, width), dtype=np.uint32)
    if n and lens.sum():
        joined = "".join(s.to_pylist())
        cps = np.frombuffer(joined.encode("utf-32-le"), dtype=np.uint32)
        off = np.r_[0, np.cumsum(lens)[:-1]]
        mat[np.repeat(np.arange(n), lens),
            np.arange(len(cps)) - np.repeat(off, lens)] = cps
    return mat, lens


def _ed1_mask(a_strs, b_strs, width: int) -> np.ndarray:
    """Exact edit-distance <= 1 per pair (strings must fit width)."""
    ma, la = _cp_matrix(a_strs, width)
    mb, lb = _cp_matrix(b_strs, width)
    n = len(la)
    res = np.zeros(n, dtype=bool)
    same = la == lb
    if same.any():
        res[same] = (ma[same] != mb[same]).sum(axis=1) <= 1
    d1 = np.abs(la - lb) == 1
    if d1.any():
        swap = (lb > la)[:, None]
        lng = np.where(swap, mb, ma)     # the longer string
        sht = np.where(swap, ma, mb)
        neq = lng != sht
        k = np.where(neq.any(axis=1), neq.argmax(axis=1), width)
        # delete lng[k]: prefix [0,k) already equal; suffix must
        # satisfy lng[j+1] == sht[j] for all j >= k (padding included)
        eq2 = lng[:, 1:] == sht[:, :-1]
        sfx = np.flip(
            np.cumprod(np.flip(eq2, axis=1), axis=1), axis=1
        ).astype(bool)
        ok = k >= width - 1
        kk = np.minimum(k, width - 2)
        ok |= sfx[np.arange(n), kk]
        res[d1] = ok[d1]
    return res


def fuzzy_pairs(ds: ray.data.Dataset, col: str, min_len: int = 1,
                max_len: int = 24, max_full_pairwise: int = 64,
                num_partitions: int = 32) -> ray.data.Dataset:
    """All unordered pairs (tok_a < tok_b) of DISTINCT non-null values
    of ``col`` (length in [min_len, max_len]) with Levenshtein
    distance <= 1. Exact — candidate generation is complete and every
    candidate is verified (except inside star-capped jumbo buckets,
    counted to op-stats)."""
    if not 1 <= min_len <= max_len:
        raise ValueError("need 1 <= min_len <= max_len")
    width = max_len

    @_pin
    def batch_distinct(b: pa.Table) -> pa.Table:
        s = pc.cast(b.column(col), pa.string())
        s = s.drop_null() if isinstance(s, pa.Array) else \
            s.combine_chunks().drop_null()
        ln = pc.utf8_length(s)
        s = s.filter(pc.and_(pc.greater_equal(ln, min_len),
                             pc.less_equal(ln, max_len)))
        return pa.table({"s": pc.unique(s)})

    def part_distinct(g: pa.Table) -> pa.Table:
        if "__part" in g.column_names:
            g = g.drop_columns(["__part"])
        s = g.column("s")
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        return pa.table({"s": pc.unique(s)})

    def variants(b: pa.Table) -> pa.Table:
        s = b.column("s")
        if isinstance(s, pa.ChunkedArray):
            s = s.combine_chunks()
        mat, lens = _cp_matrix(s, width)
        n = len(lens)
        row_bytes = f"S{4 * width}"
        outs_v = [np.ascontiguousarray(mat).view(row_bytes).ravel()]
        outs_i = [np.arange(n, dtype=np.int64)]
        pad = np.zeros((n, 1), dtype=np.uint32)
        for d in range(width):
            m = lens > d
            if not m.any():
                break
            dele = np.hstack([mat[m, :d], mat[m, d + 1:], pad[m]])
            outs_v.append(np.ascontiguousarray(dele).view(
                row_bytes).ravel())
            outs_i.append(np.flatnonzero(m))
        v = np.concatenate(outs_v)
        idx = pa.array(np.concatenate(outs_i))
        return pa.table({"variant": pa.array(v),
                         "s": s.take(idx)})

    def bucket_pairs(group: pa.Table) -> pa.Table:
        from .stats import record_stats

        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        tbl, starts, sizes = _bucket_segments(group, ["variant"])
        outs_a, outs_b = [], []
        capped_buckets = capped_members = 0
        multi = np.nonzero(sizes >= 2)[0]
        if len(multi):
            sv = tbl.column("s").to_numpy(zero_copy_only=False)
            for m in multi:
                s0, sz = starts[m], sizes[m]
                vals = np.unique(sv[s0:s0 + sz])
                k = len(vals)
                if k < 2:
                    continue
                if k <= max_full_pairwise:
                    iu = np.triu_indices(k, k=1)
                    outs_a.append(vals[iu[0]])
                    outs_b.append(vals[iu[1]])
                else:
                    outs_a.append(np.full(k - 1, vals[0]))
                    outs_b.append(vals[1:])
                    capped_buckets += 1
                    capped_members += k
        record_stats("fuzzy", capped_buckets=capped_buckets,
                     capped_members=capped_members)
        a = np.concatenate(outs_a) if outs_a else np.empty(0, object)
        b = np.concatenate(outs_b) if outs_b else np.empty(0, object)
        return pa.table({"tok_a": pa.array(a, type=pa.string()),
                         "tok_b": pa.array(b, type=pa.string())})

    def verify(group: pa.Table) -> pa.Table:
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        tbl, starts, _ = _bucket_segments(group, ["tok_a", "tok_b"])
        if not len(starts):
            return pa.table({"tok_a": pa.array([], pa.string()),
                             "tok_b": pa.array([], pa.string())})
        tbl = tbl.take(pa.array(starts))         # dedupe pairs
        keep = _ed1_mask(tbl.column("tok_a"), tbl.column("tok_b"),
                         width)
        return tbl.filter(pa.array(keep))

    dstrs = _partition_by(
        ds.map_batches(batch_distinct, batch_format="pyarrow",
                       zero_copy_batch=True),
        ["s"], num_partitions).map_groups(
        _pin(part_distinct), batch_format="pyarrow")
    vr = dstrs.map_batches(_pin(variants), batch_format="pyarrow")
    cands = _partition_by(vr, ["variant"], num_partitions).map_groups(
        _pin(bucket_pairs), batch_format="pyarrow")
    return _partition_by(cands, ["tok_a", "tok_b"],
                         num_partitions).map_groups(
        _pin(verify), batch_format="pyarrow")
