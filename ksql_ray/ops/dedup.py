"""Deduplication stages for web-scale corpora (SURVEY-mandated additions).

All stages are Ray-Data-native and designed for the 100 TB shape:

* **exact** — hash-partition on the normalized-text digest, keep the
  first (min doc_id) per digest. The shuffle moves (digest, doc_id)
  pairs only, never text.
* **MinHash + LSH** — shingle -> 64 minhashes (vectorized reduceat over
  flattened shingle hashes) -> banded bucket keys -> groupby(bucket)
  emits candidate pairs -> exact n-gram Jaccard verification per pair.
  Only bucket-colliding pairs are ever compared (no O(n²)).
* **SimHash** — 64-bit simhash over token hashes; near-dup candidates
  bucketed by 16-bit chunks (any chunk equal => candidate, catches all
  pairs within Hamming distance 3), verified by exact Hamming distance.
* **embedding cosine** — normalized vectors, candidates via sign-LSH
  (random hyperplanes, seeded), verified by exact cosine >= threshold.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .text import add_fingerprint

_H1 = np.uint64(1469598103934665603)  # FNV offset
_H2 = np.uint64(1099511628211)  # FNV prime
_MERSENNE = np.uint64((1 << 61) - 1)


# ---------------------------------------------------------------- exact
def exact_dedup_keys(ds: ray.data.Dataset, id_col: str = "doc_id",
                     text_col: str = "text",
                     fingerprint: str = "md5") -> ray.data.Dataset:
    """-> (fingerprint h, doc_id keeper, dup_count) one row per distinct
    document text. Distributed: digest in map_batches, then a two-phase
    min/count groupby on the digest. ``fingerprint="fast"`` swaps the
    per-row md5 loop for the vectorized 64-bit hash (the scale path —
    exact dedup only needs equality); "md5" keeps the hex digest the
    DuckDB oracle reproduces."""
    from ..aggregates import Count, Min
    from ..exec.groupby import GroupByPlan
    from ..expr import F
    from .text import add_fast_fingerprint

    fast = fingerprint == "fast"

    def digest(batch: pa.Table) -> pa.Table:
        sel = batch.select([id_col, text_col])
        # fast mode groups on TWO independent 64-bit keys (128 bits total)
        # — a single 64-bit key has birthday collisions at 10^9+ docs
        b = add_fast_fingerprint(sel, text_col, "h") if fast \
            else add_fingerprint(sel, text_col, "h")
        return b.drop_columns([text_col])

    keys = [F("h"), F("h_hi")] if fast else [F("h")]
    hashed = ds.map_batches(_pin(digest), batch_format="pyarrow", zero_copy_batch=True)
    plan = GroupByPlan(keys, [Min(F(id_col)), Count(F(id_col))], [], num_partitions=16)
    partials = hashed.map_batches(_pin(plan.partial_fn), batch_format="pyarrow", zero_copy_batch=True)
    merged = partials.groupby("__part").map_groups(_pin(plan.merge_fn), batch_format="pyarrow")

    def rename(batch: pa.Table) -> pa.Table:
        mapping = {"__k0": "h", "__k1": "h_hi",
                   "__agg0": id_col, "__agg1": "dup_count"}
        return batch.rename_columns([mapping.get(n, n) for n in batch.column_names])

    return merged.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)



def _pin(fn):
    """Pin Arrow's per-process thread pool before running a stage fn:
    N concurrent workers x multithreaded kernels oversubscribe the node
    (measured 4x at 32 CPUs — BASELINE.md perf lesson #2)."""
    import functools

    @functools.wraps(fn)
    def wrapped(*a, **kw):
        from ..streaming.driver import limit_worker_threads

        limit_worker_threads()
        return fn(*a, **kw)

    return wrapped


# ---------------------------------------------------------------- bucketing
class _Partitioned:
    """What ``_partition_by`` returns: holds the __part-tagged dataset
    and dispatches ``map_groups`` to the direct task exchange
    (``exec/exchange.py``) or Ray's sort-groupby (KSQL_RAY_EXCHANGE=
    sort). Group fns see the same whole-partition pa.Table (including
    the __part column) either way."""

    def __init__(self, ds: ray.data.Dataset, num_partitions: int):
        self._ds = ds
        self._num_partitions = num_partitions

    def map_groups(self, fn, batch_format: str = "pyarrow"):
        from ..exec.exchange import exchange_map_groups, use_direct_exchange

        if batch_format == "pyarrow" and use_direct_exchange():
            return exchange_map_groups(self._ds, self._num_partitions, fn)
        return self._ds.groupby("__part").map_groups(
            fn, batch_format=batch_format)


def _partition_by(ds: ray.data.Dataset, key_cols: list[str], num_partitions: int = 32):
    """Hash-partition rows by key columns and group by the partition id.
    Downstream fns receive WHOLE partitions (a handful of Python calls),
    never one call per distinct key — groupby(key).map_groups with
    millions of tiny buckets spends everything on per-group overhead
    (measured on the 200k-doc dedup bench). The exchange itself is the
    direct scatter/gather in ``exec/exchange.py`` (~3x faster than the
    sort-based groupby shuffle it replaced; env-revertible)."""
    from ..exec.groupby import hash_partition_ids

    @_pin
    def add_part(batch: pa.Table) -> pa.Table:
        part = hash_partition_ids(batch, key_cols, num_partitions)
        return batch.append_column("__part", pa.array(part, type=pa.int64()))

    return _Partitioned(
        ds.map_batches(add_part, batch_format="pyarrow",
                       zero_copy_batch=True),
        num_partitions)


def _bucket_segments(tbl: pa.Table, key_cols: list[str]):
    """Sort a partition by its bucket keys; return (sorted tbl, segment
    start indices, segment sizes)."""
    si = pc.sort_indices(tbl, sort_keys=[(k, "ascending") for k in key_cols])
    tbl = tbl.take(si)
    n = tbl.num_rows
    if n == 0:
        return tbl, np.array([], dtype=np.int64), np.array([], dtype=np.int64)
    change = np.zeros(n - 1, dtype=bool)
    for k in key_cols:
        col = tbl.column(k)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        v = col.to_numpy(zero_copy_only=False)
        change |= v[1:] != v[:-1]
    starts = np.concatenate(([0], np.nonzero(change)[0] + 1)).astype(np.int64)
    sizes = np.diff(np.concatenate((starts, [n])))
    return tbl, starts, sizes


# ---------------------------------------------------------------- shingles
_P1 = np.uint64(0x9E3779B97F4A7C15)
_P2 = np.uint64(0xC2B2AE3D27D4EB4F)
_P3 = np.uint64(0x165667B19E3779F9)
_GRAM_PRIMES = (_P1, _P2, _P3, np.uint64(0x27D4EB2F165667C5), np.uint64(0x85EBCA6B27D4EB4F))


def _word_ngram_hashes(texts, n: int = 3,
                       whole_doc_short: bool = True) -> tuple[np.ndarray, np.ndarray]:
    """All word n-gram hashes per doc, flattened: (hashes, per-doc offsets).

    Fully vectorized: tokens hashed with the cython ``pd.util.hash_array``
    over the FLATTENED token stream, n-grams combined with shifted
    multiply-xor under uint64 wraparound — no per-gram Python loop (the
    original per-byte FNV loop dominated the 200k-doc dedup bench).
    Docs with fewer than n tokens contribute one whole-doc gram, unless
    ``whole_doc_short=False`` (strict n-gram semantics: short docs get
    zero grams — what SQL ``list_transform(range(...))`` produces)."""
    import pandas as pd

    if not isinstance(texts, (pa.Array, pa.ChunkedArray)):
        texts = pa.array(["" if t is None else t for t in texts], type=pa.string())
    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if pa.types.is_large_string(texts.type):
        texts = pc.cast(texts, pa.string())
    t = pc.utf8_lower(pc.utf8_trim_whitespace(pc.fill_null(texts, "")))
    toks = pc.split_pattern_regex(t, r"\s+")
    tok_counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat_toks = pc.list_flatten(toks)
    if isinstance(flat_toks, pa.ChunkedArray):
        flat_toks = flat_toks.combine_chunks()
    # empty docs: split of "" yields one "" token; treat as zero tokens
    n_docs = len(tok_counts)
    h = pd.util.hash_array(
        flat_toks.to_numpy(zero_copy_only=False), hash_key="ksql_ray_shingle"
    ).astype(np.uint64)
    tok_off = np.concatenate(([0], np.cumsum(tok_counts)))
    doc_ids = np.repeat(np.arange(n_docs), tok_counts)
    total = len(h)

    # full n-grams: position i starts a gram if i+n-1 is in the same doc
    if total >= n:
        g = h[: total - n + 1] * _GRAM_PRIMES[0]
        for j in range(1, n):
            g = g ^ (h[j : total - n + 1 + j] * _GRAM_PRIMES[j % len(_GRAM_PRIMES)])
        same_doc = doc_ids[: total - n + 1] == doc_ids[n - 1 :]
    else:
        g = np.empty(0, dtype=np.uint64)
        same_doc = np.zeros(0, dtype=bool)

    gram_counts = np.maximum(tok_counts - n + 1, 0)
    # short docs (1..n-1 tokens): one whole-doc gram via xor-reduce
    short = (tok_counts > 0) & (tok_counts < n)
    if not whole_doc_short:
        short = np.zeros_like(short)
    short_grams = np.empty(0, dtype=np.uint64)
    if short.any():
        starts = np.minimum(tok_off[:-1], max(total - 1, 0))
        red = np.bitwise_xor.reduceat(h * _P1, starts) if total else np.zeros(n_docs, dtype=np.uint64)
        short_grams = red[short]

    counts = gram_counts + short.astype(np.int64)
    offsets = np.concatenate(([0], np.cumsum(counts)))
    flat = np.empty(int(counts.sum()), dtype=np.uint64)
    # place full grams (they are contiguous per doc within `g[same_doc]`)
    full_sel = g[same_doc]
    # vectorized placement: full grams of doc d occupy offsets[d] .. +gram_counts[d]
    full_docs = np.repeat(np.arange(n_docs), gram_counts)
    full_pos_within = np.arange(len(full_docs)) - np.repeat(
        np.concatenate(([0], np.cumsum(gram_counts)))[:-1], gram_counts
    )
    flat[offsets[full_docs] + full_pos_within] = full_sel
    if short.any():
        flat[offsets[:-1][short]] = short_grams  # short docs have exactly 1 gram
    return flat, offsets


def _minhash_signatures(flat: np.ndarray, offsets: np.ndarray, num_hashes: int = 64,
                        seed: int = 42) -> np.ndarray:
    """(n_docs, num_hashes) minhash matrix, vectorized via minimum.reduceat
    per hash function over the flattened shingle hashes."""
    rng = np.random.default_rng(seed)
    n_docs = len(offsets) - 1
    a = rng.integers(1, int(_MERSENNE), num_hashes, dtype=np.uint64)
    b = rng.integers(0, int(_MERSENNE), num_hashes, dtype=np.uint64)
    sig = np.full((n_docs, num_hashes), np.iinfo(np.uint64).max, dtype=np.uint64)
    if len(flat) == 0:
        return sig
    starts = np.minimum(offsets[:-1], len(flat) - 1)  # clip trailing empties
    nonempty = np.diff(offsets) > 0
    x = flat % _MERSENNE
    for k in range(num_hashes):
        hk = (a[k] * x + b[k]) % _MERSENNE
        mins = np.minimum.reduceat(hk, starts) if len(starts) else hk[:0]
        # reduceat on empty segments repeats another value; mask them out
        sig[nonempty, k] = mins[nonempty]
    return sig


def _candidate_pairs_fn(key_cols: list[str], id_col: str,
                        max_full_pairwise: int = 64,
                        stat_prefix: str = "lsh"):
    """map_groups closure over one PARTITION of bucket rows: vectorized
    pair generation inside multi-member buckets. Jumbo buckets
    (> max_full_pairwise members — spam/boilerplate clusters) emit STAR
    pairs (min id vs each member, linear) instead of the quadratic
    all-pairs set: the cluster stays dedupable through its representative,
    and cost stays linear in bucket size (the production LSH-dedup
    pattern). Capped buckets are counted to the op-stats actor — the cap
    trades recall inside jumbo buckets and must never be silent."""
    from .stats import record_stats

    def candidates(group: pa.Table) -> pa.Table:
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        tbl, starts, sizes = _bucket_segments(group, key_cols)
        outs_a, outs_b = [], []
        capped_buckets = capped_members = 0
        multi = np.nonzero(sizes >= 2)[0]
        if len(multi):
            idn = tbl.column(id_col).to_numpy(zero_copy_only=False)
            for m in multi:
                s0, sz = starts[m], sizes[m]
                ids = np.unique(idn[s0 : s0 + sz])
                k = len(ids)
                if k < 2:
                    continue
                if k <= max_full_pairwise:
                    iu = np.triu_indices(k, k=1)
                    outs_a.append(ids[iu[0]])
                    outs_b.append(ids[iu[1]])
                else:
                    outs_a.append(np.full(k - 1, ids[0]))
                    outs_b.append(ids[1:])
                    capped_buckets += 1
                    capped_members += k
        record_stats(stat_prefix, capped_buckets=capped_buckets,
                     capped_members=capped_members)
        a = np.concatenate(outs_a) if outs_a else np.empty(0, dtype=np.int64)
        b = np.concatenate(outs_b) if outs_b else np.empty(0, dtype=np.int64)
        return pa.table({
            "doc_a": pa.array(a.astype(np.int64)),
            "doc_b": pa.array(b.astype(np.int64)),
        })

    return candidates


def _score_via_store(cands: ray.data.Dataset, store: ray.data.Dataset,
                     id_col: str, score_fn, num_partitions: int = 32):
    """Distributed pair scoring WITHOUT any driver-side materialization:

      1. candidate pairs are globally deduped (hash-partitioned by pair),
         then exploded into two (key=doc, doc_a, doc_b) side rows;
      2. a hash-shuffle JOIN against the doc store attaches each side's
         payload (signature / shingle set / vector as packed binary);
      3. pairs are re-co-located by (doc_a, doc_b) and ``score_fn``
         scores each 2-row pair segment vectorized.

    The store never leaves the object store as one object — at 10^10 docs
    it stays sharded across the cluster and only the candidate docs'
    payloads (rare) ride the pair shuffle."""

    def dedup_explode(group: pa.Table) -> pa.Table:
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        if group.num_rows == 0:
            return pa.table({
                "key": pa.array([], type=pa.int64()),
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
            })
        gb = pa.TableGroupBy(group, ["doc_a", "doc_b"], use_threads=False)
        dedup = gb.aggregate([])
        a = dedup.column("doc_a").to_numpy(zero_copy_only=False)
        b = dedup.column("doc_b").to_numpy(zero_copy_only=False)
        return pa.table({
            "key": pa.array(np.concatenate((a, b)).astype(np.int64)),
            "doc_a": pa.array(np.concatenate((a, a)).astype(np.int64)),
            "doc_b": pa.array(np.concatenate((b, b)).astype(np.int64)),
        })

    # materialize the id-only side rows BEFORE the join: when the
    # candidate lineage is still streaming the two stages starve each
    # other (measured 3-5x on the 200k bench: ~10 s staged vs 33-56 s
    # as one lazy DAG). `sides` is (key, doc_a, doc_b) only —
    # ~24 B/row, sharded in the object store, never on the driver.
    sides = _partition_by(cands, ["doc_a", "doc_b"], num_partitions).map_groups(
        _pin(dedup_explode), batch_format="pyarrow"
    ).materialize()
    joined = _store_join(sides, store, id_col, num_partitions).materialize()
    return _partition_by(joined, ["doc_a", "doc_b"], num_partitions).map_groups(
        _pin(score_fn), batch_format="pyarrow"
    )


def _store_join(sides: ray.data.Dataset, store: ray.data.Dataset,
                id_col: str, num_partitions: int) -> ray.data.Dataset:
    """Inner-join ``sides.key == store[id_col]`` through ONE union
    exchange instead of Ray's hash-shuffle join (whose per-partition
    aggregator ACTORS reserve CPUs up front and cost ~3 s of spin-up +
    drain per call — measured vs ~1 s for this task-based join on the
    200k bench; the actor-count-vs-CPU deadlock guard the old path
    needed disappears with it). Store rows ride the exchange null-
    padded with the sides columns (validity-bitmap-only overhead);
    each partition sorts its store shard by id once and gathers
    payloads for its side rows with one searchsorted + take. Store ids
    are unique by construction (one row per doc)."""
    store_schema = store.schema().base_schema
    payload = [f for f in store_schema if f.name != id_col]
    key_t = store_schema.field(id_col).type

    @_pin
    def tag_sides(b: pa.Table) -> pa.Table:
        cols = {"key": pc.cast(b.column("key"), key_t),
                "doc_a": b.column("doc_a"), "doc_b": b.column("doc_b")}
        for f in payload:
            cols[f.name] = pa.nulls(b.num_rows, f.type)
        cols["__sd"] = pa.array(np.zeros(b.num_rows, dtype=np.int8))
        return pa.table(cols)

    @_pin
    def tag_store(b: pa.Table) -> pa.Table:
        cols = {"key": b.column(id_col),
                "doc_a": pa.nulls(b.num_rows, pa.int64()),
                "doc_b": pa.nulls(b.num_rows, pa.int64())}
        for f in payload:
            cols[f.name] = b.column(f.name)
        cols["__sd"] = pa.array(np.ones(b.num_rows, dtype=np.int8))
        return pa.table(cols)

    unioned = sides.map_batches(
        tag_sides, batch_format="pyarrow", zero_copy_batch=True).union(
        store.map_batches(tag_store, batch_format="pyarrow",
                          zero_copy_batch=True))

    def resolve(part: pa.Table) -> pa.Table:
        if "__part" in part.column_names:
            part = part.drop_columns(["__part"])
        sd = part.column("__sd").to_numpy(zero_copy_only=False)
        part = part.drop_columns(["__sd"])
        s = part.filter(pa.array(sd == 0))
        r = part.filter(pa.array(sd == 1))
        if s.num_rows == 0 or r.num_rows == 0:
            return pa.table({n: pa.array([], type=part.schema.field(n).type)
                             for n in part.column_names})
        rk = r.column("key")
        if isinstance(rk, pa.ChunkedArray):
            rk = rk.combine_chunks()
        rkv = rk.to_numpy(zero_copy_only=False)
        order = np.argsort(rkv, kind="stable")
        rks = rkv[order]
        sk = s.column("key").to_numpy(zero_copy_only=False)
        pos = np.searchsorted(rks, sk)
        pos[pos >= len(rks)] = 0
        valid = rks[pos] == sk
        take = order[pos[valid]]
        s_hit = s.filter(pa.array(valid))
        gathered = r.take(pa.array(take))
        cols = {"key": s_hit.column("key"),
                "doc_a": s_hit.column("doc_a"),
                "doc_b": s_hit.column("doc_b")}
        for f in payload:
            cols[f.name] = gathered.column(f.name)
        return pa.table(cols)

    return _partition_by(unioned, ["key"], num_partitions).map_groups(
        _pin(resolve), batch_format="pyarrow")


def _pair_segments(group: pa.Table, stat_prefix: str = "lsh"):
    """Sort a scored-join partition by (doc_a, doc_b); return the rows of
    complete 2-row pair segments (side a first) or None if empty.

    Segments of any other size indicate corrupt input and are counted to
    the op-stats actor instead of vanishing silently: >2 rows means
    duplicate doc ids in the store (e.g. a per-batch arange reused across
    files — the round-1 bench bug), 1 row means a candidate id missing
    from the store entirely."""
    from .stats import record_stats

    if "__part" in group.column_names:
        group = group.drop_columns(["__part"])
    if group.num_rows == 0:
        return None
    si = pc.sort_indices(group, sort_keys=[
        ("doc_a", "ascending"), ("doc_b", "ascending"), ("key", "ascending")
    ])
    tbl = group.take(si)
    a = tbl.column("doc_a").to_numpy(zero_copy_only=False)
    b = tbl.column("doc_b").to_numpy(zero_copy_only=False)
    n = len(a)
    new = np.ones(n, dtype=bool)
    new[1:] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
    seg_id = np.cumsum(new) - 1
    sizes = np.bincount(seg_id)
    keep_seg = sizes == 2  # both sides found in the store
    record_stats(stat_prefix,
                 dropped_dup_id_segments=int((sizes > 2).sum()),
                 dropped_orphan_segments=int((sizes == 1).sum()))
    keep = keep_seg[seg_id]
    if not keep.any():
        return None
    return tbl.filter(pa.array(keep))


def _mh_store_stage(batch: pa.Table, id_col: str, text_col: str, ngram: int,
                    num_hashes: int, seed: int, with_shingles: bool,
                    sig_dtype=np.uint64) -> pa.Table:
    """Doc store row: (doc_id, sig packed binary[, shingles packed binary
    of the SORTED-UNIQUE shingle hashes]). One row per doc; computed once.
    ``sig_dtype=np.uint32`` truncates signature values (per-element
    collision 2^-32 — est bias ~1e-9) and halves the est-mode payload."""
    from .vectors import pack_u64_rows, pack_u64_var

    texts = batch.column(text_col)
    flat, offsets = _word_ngram_hashes(texts, ngram)
    sig = _minhash_signatures(flat, offsets, num_hashes, seed)
    if sig_dtype is not np.uint64:
        sig = (sig & np.uint64(0xFFFFFFFF)).astype(sig_dtype)
    cols: dict = {
        id_col: batch.column(id_col),
        "sig": pack_u64_rows(sig),
    }
    if with_shingles:
        n_docs = batch.num_rows
        doc_ids = np.repeat(np.arange(n_docs), np.diff(offsets))
        order = np.lexsort((flat, doc_ids))
        d_s, v_s = doc_ids[order], flat[order]
        uniq = np.ones(len(v_s), dtype=bool)
        if len(v_s) > 1:
            uniq[1:] = (d_s[1:] != d_s[:-1]) | (v_s[1:] != v_s[:-1])
        u_docs, u_vals = d_s[uniq], v_s[uniq]
        counts = np.bincount(u_docs, minlength=n_docs)
        cols["shingles"] = pack_u64_var(u_vals, counts)
    return pa.table(cols)


def _band_rows_fn(id_col: str, num_hashes: int, bands: int,
                  sig_dtype=np.uint64):
    """Bucket rows from the doc store: (band, bucket, doc_id) ONLY —
    20 bytes/row through the shuffle, never the signature (shipping sigs
    per band row was 16x redundant, measured round 1)."""
    from .vectors import unpack_u64

    rows_per_band = num_hashes // bands

    def bucket_stage(batch: pa.Table) -> pa.Table:
        n_docs = batch.num_rows
        flat, _ = unpack_u64(batch.column("sig"), dtype=sig_dtype)
        sig = flat.astype(np.uint64, copy=False).reshape(n_docs, num_hashes)
        band_sig = sig.reshape(n_docs, bands, rows_per_band)
        bucket = np.zeros((n_docs, bands), dtype=np.uint64)
        for r in range(rows_per_band):
            bucket = bucket * np.uint64(31) + band_sig[:, :, r]
        return pa.table({
            "band": pa.array(np.repeat(np.arange(bands), n_docs), type=pa.int32()),
            "bucket": pa.array(bucket.T.reshape(-1).view(np.int64)),
            id_col: batch.column(id_col).take(
                pa.array(np.tile(np.arange(n_docs), bands))
            ),
        })

    return bucket_stage


def _exact_jaccard_of_pairs(tbl: pa.Table) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """tbl = 2k rows (pair segments of 2, sorted). Returns (doc_a, doc_b,
    jaccard) per pair. The cross-side intersection count uses ONE
    primitive ``np.sort`` over packed uint64 keys
    ``(pair_idx << 33) | (folded_hash32 << 1) | side`` — adjacent keys
    differing only in the side bit are cross-side hits — instead of an
    indirect two-key lexsort over the raw 64-bit hashes (measured 5x
    slower). The 32-bit fold adds ~1e-7 collision noise per pair; set
    sizes (and thus unions) stay exact from the 64-bit store."""
    from .vectors import unpack_u64

    a = tbl.column("doc_a").to_numpy(zero_copy_only=False)
    b = tbl.column("doc_b").to_numpy(zero_copy_only=False)
    flat, counts = unpack_u64(tbl.column("shingles"))
    n_rows = len(a)
    n_pairs = n_rows // 2
    pair_of_row = np.arange(n_rows, dtype=np.uint64) >> np.uint64(1)
    rep = np.repeat(pair_of_row, counts)
    side = np.repeat((np.arange(n_rows) & 1).astype(np.uint64), counts)
    h32 = (flat ^ (flat >> np.uint64(32))) & np.uint64(0xFFFFFFFF)
    key = (rep << np.uint64(33)) | (h32 << np.uint64(1)) | side
    key.sort()
    inter = np.zeros(n_pairs, dtype=np.int64)
    if len(key) > 1:
        hits = (key[1:] ^ key[:-1]) == np.uint64(1)
        inter = np.bincount(
            (key[1:][hits] >> np.uint64(33)).astype(np.int64), minlength=n_pairs
        )
    union = counts[0::2] + counts[1::2] - inter
    jac = inter / np.maximum(union, 1)
    return a[0::2], b[0::2], jac


def _minhash_est_of_pairs(tbl: pa.Table, num_hashes: int,
                          sig_dtype=np.uint64) -> np.ndarray:
    from .vectors import unpack_u64

    flat, _ = unpack_u64(tbl.column("sig"), dtype=sig_dtype)
    sig = flat.reshape(-1, num_hashes)
    return (sig[0::2] == sig[1::2]).mean(axis=1)


def minhash_dedup_pairs(ds: ray.data.Dataset, id_col: str = "doc_id",
                        text_col: str = "text", threshold: float = 0.7,
                        num_hashes: int = 64, bands: int = 16,
                        ngram: int = 3, seed: int = 42,
                        verify: str = "exact",
                        num_partitions: int = 32) -> ray.data.Dataset:
    """MinHash-LSH near-dup pipeline -> distinct verified pairs
    (doc_a, doc_b, est_jaccard, jaccard).

    Scale shape (fully distributed — nothing materializes on the driver):
    the doc store (id, packed sig, packed sorted-unique shingles) is
    computed once per doc and stays sharded in the object store; the
    bucket shuffle carries (band, bucket, doc_id) only; candidate pairs
    are deduped, joined against the store shard-to-shard (hash-shuffle
    join), and verified vectorized. ``verify="exact"`` keeps pairs with
    exact n-gram Jaccard >= threshold (oracle-checkable); ``"est"`` keeps
    pairs by the 64-hash signature estimate (classic MinHash semantics)."""
    from .stats import ensure_stats_actor

    ensure_stats_actor()  # workers record capped-bucket counters by name
    if verify not in ("exact", "est"):
        raise ValueError("verify must be 'exact' or 'est'")
    with_shingles = verify == "exact"
    # uint32 lanes in BOTH modes: per-lane truncation collision is 2^-32
    # (est bias ~1e-9) and the packed signature is the verify join's
    # fattest column — halving it cut the exact-mode store join + pair
    # shuffle measurably (stage-timed at 200k docs)
    sig_dtype = np.uint32

    # the store feeds TWO consumers (bucket branch + verify join);
    # materialize once so its lineage is not recomputed per consumer —
    # it is the compact derived table (0.5-1.5 KB/doc), sharded across
    # the cluster's object store (spill-backed), never on the driver
    store = ds.map_batches(
        _pin(lambda b: _mh_store_stage(
            b, id_col, text_col, ngram, num_hashes, seed, with_shingles,
            sig_dtype=sig_dtype,
        )),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()
    buckets = store.map_batches(
        _pin(_band_rows_fn(id_col, num_hashes, bands, sig_dtype=sig_dtype)),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    cands = _partition_by(buckets, ["band", "bucket"], num_partitions).map_groups(
        _pin(_candidate_pairs_fn(["band", "bucket"], id_col,
                                 stat_prefix="minhash")),
        batch_format="pyarrow",
    )

    def score(group: pa.Table) -> pa.Table:
        cols = {
            "doc_a": pa.array([], type=pa.int64()),
            "doc_b": pa.array([], type=pa.int64()),
            "est_jaccard": pa.array([], type=pa.float64()),
        }
        if with_shingles:
            cols["jaccard"] = pa.array([], type=pa.float64())
        tbl = _pair_segments(group, "minhash")
        if tbl is None:
            return pa.table(cols)
        a = tbl.column("doc_a").to_numpy(zero_copy_only=False)[0::2]
        b = tbl.column("doc_b").to_numpy(zero_copy_only=False)[0::2]
        est = _minhash_est_of_pairs(tbl, num_hashes, sig_dtype=sig_dtype)
        if verify == "exact":
            _, _, jac = _exact_jaccard_of_pairs(tbl)
            keep = jac >= threshold
            return pa.table({
                "doc_a": pa.array(a[keep].astype(np.int64)),
                "doc_b": pa.array(b[keep].astype(np.int64)),
                "est_jaccard": pa.array(est[keep], type=pa.float64()),
                "jaccard": pa.array(jac[keep], type=pa.float64()),
            })
        keep = est >= threshold
        return pa.table({
            "doc_a": pa.array(a[keep].astype(np.int64)),
            "doc_b": pa.array(b[keep].astype(np.int64)),
            "est_jaccard": pa.array(est[keep], type=pa.float64()),
        })

    return _score_via_store(cands, store, id_col, score, num_partitions)


def similarity_join(left: ray.data.Dataset, right: ray.data.Dataset,
                    id_col: str = "doc_id", text_col: str = "text",
                    threshold: float = 0.7, num_hashes: int = 64,
                    bands: int = 16, ngram: int = 3, seed: int = 42,
                    num_partitions: int = 32) -> ray.data.Dataset:
    """Set-similarity JOIN between two tables -> (left_id, right_id,
    est_jaccard, jaccard) for every cross-table pair with exact n-gram
    Jaccard >= threshold (the MinHash-LSH join of Broder 1997 /
    Xiao et al. WWW'08's candidate-verify shape): fuzzy record linkage,
    "which scraped pages match a licensed corpus", near-dup
    contamination ACROSS datasets rather than within one.

    Scale shape: identical to :func:`minhash_dedup_pairs` — one shared
    doc store over the UNION of both sides (sharded, never on the
    driver), a (band, bucket, id)-only shuffle, star-capped buckets,
    and a store-join verify. The side bit rides the id's low bit
    (id' = id·2 + side), so cross-side filtering is a vectorized parity
    test on the candidate stream — no extra lookup or shuffle — and
    same-side pairs are dropped BEFORE the (fatter) verify join.
    ids must fit in 62 bits (|id| < 2^62; parity/shift decode is exact
    for negative ids under two's complement).
    """
    from .stats import ensure_stats_actor

    ensure_stats_actor()
    sig_dtype = np.uint32

    def tag(side: int):
        def fn(batch: pa.Table) -> pa.Table:
            ids = batch.column(id_col)
            tagged = pc.add(pc.multiply(pc.cast(ids, pa.int64()),
                                        pa.scalar(2, pa.int64())),
                            pa.scalar(side, pa.int64()))
            i = batch.column_names.index(id_col)
            return batch.set_column(i, id_col, tagged)
        return fn

    union = left.map_batches(tag(0), batch_format="pyarrow",
                             zero_copy_batch=True).union(
        right.map_batches(tag(1), batch_format="pyarrow",
                          zero_copy_batch=True))
    store = union.map_batches(
        _pin(lambda b: _mh_store_stage(
            b, id_col, text_col, ngram, num_hashes, seed, True,
            sig_dtype=sig_dtype,
        )),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()
    buckets = store.map_batches(
        _pin(_band_rows_fn(id_col, num_hashes, bands,
                           sig_dtype=sig_dtype)),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    cands = _partition_by(buckets, ["band", "bucket"],
                          num_partitions).map_groups(
        _pin(_candidate_pairs_fn(["band", "bucket"], id_col,
                                 stat_prefix="simjoin")),
        batch_format="pyarrow",
    )

    def cross_only(batch: pa.Table) -> pa.Table:
        a = batch.column("doc_a").to_numpy(zero_copy_only=False)
        b = batch.column("doc_b").to_numpy(zero_copy_only=False)
        return batch.filter(pa.array((a & 1) != (b & 1)))

    cands = cands.map_batches(cross_only, batch_format="pyarrow",
                              zero_copy_batch=True)

    def score(group: pa.Table) -> pa.Table:
        empty = pa.table({
            "left_id": pa.array([], type=pa.int64()),
            "right_id": pa.array([], type=pa.int64()),
            "est_jaccard": pa.array([], type=pa.float64()),
            "jaccard": pa.array([], type=pa.float64()),
        })
        tbl = _pair_segments(group, "simjoin")
        if tbl is None:
            return empty
        a = tbl.column("doc_a").to_numpy(zero_copy_only=False)[0::2]
        b = tbl.column("doc_b").to_numpy(zero_copy_only=False)[0::2]
        est = _minhash_est_of_pairs(tbl, num_hashes, sig_dtype=sig_dtype)
        _, _, jac = _exact_jaccard_of_pairs(tbl)
        keep = jac >= threshold
        a = a[keep].astype(np.int64)
        b = b[keep].astype(np.int64)
        a_left = (a & 1) == 0
        lid = np.where(a_left, a, b) >> 1
        rid = np.where(a_left, b, a) >> 1
        return pa.table({
            "left_id": pa.array(lid),
            "right_id": pa.array(rid),
            "est_jaccard": pa.array(est[keep], type=pa.float64()),
            "jaccard": pa.array(jac[keep], type=pa.float64()),
        })

    return _score_via_store(cands, store, id_col, score, num_partitions)


def ngram_jaccard_pairs(ds: ray.data.Dataset, id_col: str = "doc_id",
                        text_col: str = "text", threshold: float = 0.5,
                        ngram: int = 3, num_hashes: int = 64, bands: int = 16,
                        seed: int = 42,
                        num_partitions: int = 32) -> ray.data.Dataset:
    """EXACT word-n-gram Jaccard similarity, computed only for LSH-bucket
    candidate pairs -> (doc_a, doc_b, jaccard). Same distributed shape as
    minhash_dedup_pairs: the bucket shuffle ships (band, bucket, doc_id)
    only (never the shingle lists — round 1 shipped them x16, measured),
    and the verify pass is a sorted-array intersection per pair segment
    (no Python set ops)."""
    from .stats import ensure_stats_actor

    ensure_stats_actor()
    store = ds.map_batches(
        _pin(lambda b: _mh_store_stage(b, id_col, text_col, ngram, num_hashes, seed, True)),
        batch_format="pyarrow", zero_copy_batch=True,
    ).materialize()  # two consumers; see minhash_dedup_pairs
    buckets = store.map_batches(
        _pin(_band_rows_fn(id_col, num_hashes, bands)),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    cands = _partition_by(buckets, ["band", "bucket"], num_partitions).map_groups(
        _pin(_candidate_pairs_fn(["band", "bucket"], id_col,
                                 stat_prefix="ngram")),
        batch_format="pyarrow",
    )

    def score(group: pa.Table) -> pa.Table:
        empty = pa.table({
            "doc_a": pa.array([], type=pa.int64()),
            "doc_b": pa.array([], type=pa.int64()),
            "jaccard": pa.array([], type=pa.float64()),
        })
        tbl = _pair_segments(group, "ngram")
        if tbl is None:
            return empty
        a, b, jac = _exact_jaccard_of_pairs(tbl)
        keep = jac >= threshold
        return pa.table({
            "doc_a": pa.array(a[keep].astype(np.int64)),
            "doc_b": pa.array(b[keep].astype(np.int64)),
            "jaccard": pa.array(jac[keep], type=pa.float64()),
        })

    return _score_via_store(cands, store, id_col, score, num_partitions)


# ---------------------------------------------------------------- simhash
def _md5_token_hashes(texts) -> tuple[np.ndarray, np.ndarray]:
    """Per-token 64-bit hashes from the first 16 hex chars of md5 —
    the oracle-checkable form (DuckDB: ('0x' || substr(md5(tok), 1,
    16))::UBIGINT). md5 runs once per UNIQUE token (vocabulary-sized
    Python loop), then broadcasts via np.unique inverse — the per-token
    cost stays vectorized. Tokenization matches _word_ngram_hashes."""
    import hashlib

    if isinstance(texts, pa.ChunkedArray):
        texts = texts.combine_chunks()
    if pa.types.is_large_string(texts.type):
        texts = pc.cast(texts, pa.string())
    t = pc.utf8_lower(pc.utf8_trim_whitespace(pc.fill_null(texts, "")))
    toks = pc.split_pattern_regex(t, r"\s+")
    tok_counts = pc.list_value_length(toks).to_numpy(zero_copy_only=False).astype(np.int64)
    flat_toks = pc.list_flatten(toks)
    if isinstance(flat_toks, pa.ChunkedArray):
        flat_toks = flat_toks.combine_chunks()
    uniq, inv = np.unique(flat_toks.to_numpy(zero_copy_only=False), return_inverse=True)
    uh = np.array(
        [int(hashlib.md5(s.encode("utf-8")).hexdigest()[:16], 16) for s in uniq],
        dtype=np.uint64,
    ) if len(uniq) else np.empty(0, dtype=np.uint64)
    offsets = np.concatenate(([0], np.cumsum(tok_counts)))
    return uh[inv] if len(uniq) else np.empty(0, dtype=np.uint64), offsets


def simhash_stage(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text",
                  token_hash: str = "fast") -> pa.Table:
    """64-bit simhash per doc, vectorized bit-count accumulation.
    ``token_hash="md5"`` derives token hashes from md5 (SQL-replicable,
    the oracle form); ``"fast"`` uses the vectorized cython hash (the
    scale path — same semantics, not SQL-expressible)."""
    texts = batch.column(text_col)
    if token_hash == "md5":
        flat, offsets = _md5_token_hashes(texts)
    else:
        flat, offsets = _word_ngram_hashes(texts, 1)  # token hashes
    n_docs = len(texts)
    sims = np.zeros(n_docs, dtype=np.uint64)
    if len(flat):
        # bit votes: majority rule "acc > 0" == "2*ones > n_tokens".
        # unpackbits gives the (n_tokens, 64) 0/1 matrix at 1 byte/bit
        # (little bit-order column i == bit i of the uint64), and tokens
        # are contiguous per doc, so per-doc one-counts are a single
        # add.reduceat — the previous broadcast built the same matrix at
        # int64 width (8x the bytes) and scatter-added with np.add.at
        # (measured: THE simhash_stage hot spot, ~10s of the 13s stage
        # at 200k docs)
        bits = np.unpackbits(
            flat.view(np.uint8).reshape(-1, 8), axis=1, bitorder="little"
        ).astype(np.int32)
        counts = np.diff(offsets)
        starts = np.minimum(offsets[:-1], len(flat) - 1)
        ones = np.add.reduceat(bits, starts, axis=0)
        # reduceat repeats a neighbor for empty segments; mask them out
        simbits = (2 * ones) > counts[:, None]
        simbits &= (counts > 0)[:, None]
        sims = (simbits.astype(np.uint64)
                << np.arange(64, dtype=np.uint64)).sum(axis=1, dtype=np.uint64)
    return pa.table({
        id_col: batch.column(id_col),
        "simhash": pa.array(sims.view(np.int64)),
    })


def _block_combos(max_hamming: int):
    """Block-union tables (Manku et al., WWW'07 §3): split the 64 bits
    into ``max_hamming + 3`` blocks and key each table on a distinct
    3-block union. Any ``max_hamming`` flipped bits touch at most that
    many blocks, so some 3 blocks are untouched and that table's key
    collides — exact, like the chunk scheme, but with a ~2^33 bucket
    space instead of 2^16: per-bucket population (and thus star-cap
    recall loss) stays flat to ~10^9-10^10 docs. Cost: C(m, 3) tables
    (20 rows/doc at max_hamming=3) instead of 4."""
    from itertools import combinations

    m = max_hamming + 3
    sizes = [64 // m + (1 if i < 64 % m else 0) for i in range(m)]
    shifts = np.concatenate(([0], np.cumsum(sizes[:-1]))).astype(np.uint64)
    masks = [np.uint64((1 << s) - 1) for s in sizes]
    combos = list(combinations(range(m), 3))
    return sizes, shifts, masks, combos


def simhash_pairs(ds: ray.data.Dataset, id_col: str = "doc_id",
                  text_col: str = "text", max_hamming: int = 3,
                  token_hash: str = "fast",
                  scheme: str = "chunks") -> ray.data.Dataset:
    """Near-dup pairs within Hamming distance.

    ``scheme="chunks"``: bucket by each of four 16-bit chunks
    (pigeonhole: distance<=3 shares at least one chunk). Exact and
    cheapest (4 rows/doc), but the 4 x 65,536 bucket space means bucket
    population grows linearly with corpus size — beyond ~10^8 docs the
    64-member star cap starts trading recall (visible via op stats
    ``simhash.capped_buckets``).

    ``scheme="blocks"``: block-union tables (see _block_combos) — ~2^33
    buckets, flat per-bucket population to 10^9+ docs, C(max_hamming+3,
    3) rows/doc through the shuffle. Same exact guarantee; use it when
    the chunk scheme's capped-bucket stats come back nonzero.

    ``token_hash`` selects the simhash_stage hash form ("md5" is the
    oracle-checkable variant)."""
    from .stats import ensure_stats_actor

    if scheme not in ("chunks", "blocks"):
        raise ValueError("scheme must be 'chunks' or 'blocks'")
    if scheme == "chunks" and max_hamming > 3:
        raise ValueError("chunks scheme is exact only for max_hamming <= 3")
    ensure_stats_actor()
    hashed = ds.map_batches(
        _pin(lambda b: simhash_stage(b, id_col, text_col, token_hash)),
        batch_format="pyarrow", zero_copy_batch=True,
    )

    def explode_chunks(batch: pa.Table) -> pa.Table:
        sims = batch.column("simhash").to_numpy(zero_copy_only=False).view(np.uint64)
        n = len(sims)
        chunk_ids = np.repeat(np.arange(4), n)
        doc_idx = np.tile(np.arange(n), 4)
        chunks = np.concatenate([((sims >> np.uint64(16 * c)) & np.uint64(0xFFFF)) for c in range(4)])
        return pa.table({
            "chunk": pa.array(chunk_ids, type=pa.int32()),
            "bucket": pa.array(chunks.astype(np.int64)),
            id_col: batch.column(id_col).take(pa.array(doc_idx)),
            "simhash": batch.column("simhash").take(pa.array(doc_idx)),
        })

    def explode_blocks(batch: pa.Table) -> pa.Table:
        sizes, shifts, masks, combos = _block_combos(max_hamming)
        sims = batch.column("simhash").to_numpy(zero_copy_only=False).view(np.uint64)
        n = len(sims)
        blocks = [(sims >> shifts[i]) & masks[i] for i in range(len(sizes))]
        keys = []
        for (i, j, k) in combos:
            keys.append(
                (blocks[i] << np.uint64(sizes[j] + sizes[k]))
                | (blocks[j] << np.uint64(sizes[k]))
                | blocks[k]
            )
        t = len(combos)
        doc_idx = np.tile(np.arange(n), t)
        return pa.table({
            "chunk": pa.array(np.repeat(np.arange(t), n).astype(np.int32)),
            "bucket": pa.array(np.concatenate(keys).view(np.int64) if keys else
                               np.empty(0, dtype=np.int64)),
            id_col: batch.column(id_col).take(pa.array(doc_idx)),
            "simhash": batch.column("simhash").take(pa.array(doc_idx)),
        })

    explode = explode_chunks if scheme == "chunks" else explode_blocks
    exploded = hashed.map_batches(_pin(explode), batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs(group: pa.Table) -> pa.Table:
        from .stats import record_stats

        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        tbl, starts, sizes = _bucket_segments(group, ["chunk", "bucket"])
        outs_a, outs_b, outs_d = [], [], []
        capped_buckets = capped_members = 0
        multi = np.nonzero(sizes >= 2)[0]
        if len(multi):
            ids_np = tbl.column(id_col).to_numpy(zero_copy_only=False)
            sims_np = tbl.column("simhash").to_numpy(zero_copy_only=False).view(np.uint64)
            for m in multi:
                s0, sz = starts[m], sizes[m]
                ids = ids_np[s0 : s0 + sz]
                sims = sims_np[s0 : s0 + sz]
                # jumbo buckets (boilerplate clusters): star pairs against
                # the min-id representative, linear cost (see minhash)
                if sz > 64:
                    capped_buckets += 1
                    capped_members += int(sz)
                anchor_rows = range(sz) if sz <= 64 else [int(np.argmin(ids))]
                for i in anchor_rows:
                    x = (sims[i] ^ sims).astype(np.uint64)
                    hd = np.unpackbits(
                        x.view(np.uint8).reshape(len(x), 8), axis=1
                    ).sum(axis=1)
                    close = (hd <= max_hamming) & (ids != ids[i])
                    if sz <= 64:
                        close &= np.arange(sz) > i  # each unordered pair once
                    sel = np.nonzero(close)[0]
                    if len(sel):
                        outs_a.append(np.minimum(ids[i], ids[sel]))
                        outs_b.append(np.maximum(ids[i], ids[sel]))
                        outs_d.append(hd[sel].astype(np.int64))
        record_stats("simhash", capped_buckets=capped_buckets,
                     capped_members=capped_members)
        a = np.concatenate(outs_a) if outs_a else np.empty(0, dtype=np.int64)
        b = np.concatenate(outs_b) if outs_b else np.empty(0, dtype=np.int64)
        d = np.concatenate(outs_d) if outs_d else np.empty(0, dtype=np.int64)
        return pa.table({
            "doc_a": pa.array(a.astype(np.int64)),
            "doc_b": pa.array(b.astype(np.int64)),
            "hamming": pa.array(d),
        })

    pairs = _partition_by(exploded, ["chunk", "bucket"]).map_groups(
        _pin(bucket_pairs), batch_format="pyarrow"
    )

    def dedupe(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        if "__part" in batch.column_names:
            batch = batch.drop_columns(["__part"])
        gb = pa.TableGroupBy(batch, ["doc_a", "doc_b"], use_threads=False)
        return gb.aggregate([("hamming", "min")]).rename_columns(["doc_a", "doc_b", "hamming"])

    return _partition_by(pairs, ["doc_a", "doc_b"]).map_groups(
        _pin(dedupe), batch_format="pyarrow"
    )


# ---------------------------------------------------------------- embeddings
def embedding_neardup_pairs(ds: ray.data.Dataset, id_col: str = "vec_id",
                            vec_col: str = "embedding", threshold: float = 0.95,
                            n_planes: int = 4, n_tables: int = 8,
                            seed: int = 42,
                            num_partitions: int = 32,
                            max_full_pairwise: int = 64,
                            vec_dtype=np.float64) -> ray.data.Dataset:
    """Cosine near-dup -> (vec_a, vec_b, cosine). Multi-table sign-LSH
    (``n_tables`` independent tables of ``n_planes`` seeded hyperplanes):
    a pair collides if ANY table buckets it together — recall
    1-(1-p^planes)^tables with p = 1 - angle/pi, tunable to ~1 for a
    target cosine. Same distributed shape as minhash_dedup_pairs: the
    bucket shuffle ships (table, bucket, vec_id) only; jumbo buckets are
    star-capped; exact cosine is verified against the sharded normalized-
    vector store via a hash-shuffle join (vectors ride as packed binary,
    decoded zero-copy — never ``to_pylist()``)."""
    from .stats import ensure_stats_actor
    from .vectors import normalize_rows, pack_u64_rows, unpack_u64, vecs_np

    ensure_stats_actor()

    def store_stage(batch: pa.Table) -> pa.Table:
        # vec_dtype=np.float32 halves the store/join payload (use for
        # throughput; keep float64 where bit-exact cosines matter)
        m = normalize_rows(vecs_np(batch.column(vec_col))).astype(vec_dtype, copy=False)
        return pa.table({
            id_col: batch.column(id_col),
            "vec": pack_u64_rows(m),
        })

    store = ds.map_batches(
        _pin(store_stage), batch_format="pyarrow", zero_copy_batch=True
    ).materialize()  # two consumers; see minhash_dedup_pairs

    def bucket_stage(batch: pa.Table) -> pa.Table:
        flat, counts = unpack_u64(batch.column("vec"), dtype=vec_dtype)
        n = batch.num_rows
        if n == 0 or len(flat) == 0:
            return pa.table({
                "band": pa.array([], type=pa.int32()),
                "bucket": pa.array([], type=pa.int64()),
                id_col: pa.array([], type=batch.column(id_col).type),
            })
        dim = len(flat) // n
        m = flat.reshape(n, dim)
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((dim, n_tables * n_planes))
        signs = (m @ planes > 0).astype(np.uint64).reshape(n, n_tables, n_planes)
        shifts = np.arange(n_planes, dtype=np.uint64)
        bucket = (signs << shifts).sum(axis=2, dtype=np.uint64)  # (n, n_tables)
        return pa.table({
            "band": pa.array(np.repeat(np.arange(n_tables), n), type=pa.int32()),
            "bucket": pa.array(bucket.T.reshape(-1).view(np.int64)),
            id_col: batch.column(id_col).take(
                pa.array(np.tile(np.arange(n), n_tables))
            ),
        })

    buckets = store.map_batches(_pin(bucket_stage), batch_format="pyarrow", zero_copy_batch=True)
    cands = _partition_by(buckets, ["band", "bucket"], num_partitions).map_groups(
        _pin(_candidate_pairs_fn(["band", "bucket"], id_col, max_full_pairwise,
                                 stat_prefix="embedding")),
        batch_format="pyarrow",
    )

    def score(group: pa.Table) -> pa.Table:
        empty = pa.table({
            "vec_a": pa.array([], type=pa.int64()),
            "vec_b": pa.array([], type=pa.int64()),
            "cosine": pa.array([], type=pa.float64()),
        })
        tbl = _pair_segments(group, "embedding")
        if tbl is None:
            return empty
        a = tbl.column("doc_a").to_numpy(zero_copy_only=False)
        b = tbl.column("doc_b").to_numpy(zero_copy_only=False)
        flat, _ = unpack_u64(tbl.column("vec"), dtype=vec_dtype)
        m = flat.reshape(len(a), -1)
        cos = np.einsum("ij,ij->i", m[0::2], m[1::2]).astype(np.float64)
        keep = cos >= threshold
        return pa.table({
            "vec_a": pa.array(a[0::2][keep].astype(np.int64)),
            "vec_b": pa.array(b[0::2][keep].astype(np.int64)),
            "cosine": pa.array(cos[keep], type=pa.float64()),
        })

    return _score_via_store(cands, store, id_col, score, num_partitions)


def source_overlap(ds: ray.data.Dataset, text_col: str = "text",
                   source_col: str = "source",
                   fingerprint: str = "md5",
                   num_partitions: int = 32) -> ray.data.Dataset:
    """Cross-source duplication matrix — the provenance diagnostic run
    before mixing corpora ("how much of source A is already in B?"):
    one row per source pair (source_a <= source_b) with ``n_groups`` =
    number of distinct duplicate-content groups the pair shares.
    Off-diagonal rows count content present in BOTH sources; diagonal
    rows count content duplicated (>= 2 copies) WITHIN one source.

    Scale shape: per-batch distinct (fingerprint, source, cnt) partials
    (the shuffle carries one row per distinct text per source per
    batch, never documents) -> ONE hash exchange by fingerprint
    (hash-disjoint partitions make each group's source set complete) ->
    per-partition vectorized pair expansion (the per-group source list
    is bounded by the source alphabet, so pairs come from <=n_sources
    strided same-segment comparisons, no row loop) -> per-partition
    (source_a, source_b, n) partials merged by smallagg.grouped_sum.
    ``fingerprint="fast"`` swaps md5 for the 128-bit vectorized hash
    (the 10^9-doc path; "md5" is the oracle-reproducible form)."""
    from .smallagg import grouped_sum
    from .text import add_fast_fingerprint

    fast = fingerprint == "fast"
    hcols = ["h", "h_hi"] if fast else ["h"]

    def digest(batch: pa.Table) -> pa.Table:
        import pandas as pd

        sel = batch.select([source_col, text_col])
        b = add_fast_fingerprint(sel, text_col, "h") if fast \
            else add_fingerprint(sel, text_col, "h")
        df = b.drop_columns([text_col]).to_pandas()
        g = df.groupby(hcols + [source_col], sort=False,
                       dropna=False).size()
        g = g.rename("cnt").reset_index()
        out = {c: pa.Array.from_pandas(g[c], type=b.schema.field(c).type)
               for c in hcols + [source_col]}
        out["cnt"] = pa.array(g["cnt"].to_numpy(), type=pa.int64())
        return pa.table(out)

    parts = ds.map_batches(_pin(digest), batch_format="pyarrow",
                           zero_copy_batch=True)

    def expand(group: pa.Table) -> pa.Table:
        import pandas as pd

        st = group.schema.field(source_col).type if \
            source_col in group.column_names else pa.string()
        empty = pa.table({"source_a": pa.nulls(0, st),
                          "source_b": pa.nulls(0, st),
                          "n": pa.array([], type=pa.int64())})
        if group.num_rows == 0 or "cnt" not in group.column_names:
            return empty
        df = group.to_pandas().groupby(
            hcols + [source_col], sort=False, dropna=False)[
            "cnt"].sum().reset_index()
        df = df.sort_values(hcols + [source_col], kind="stable")
        src_all = df[source_col].to_numpy()
        cnt_all = df["cnt"].to_numpy()
        # SQL three-valued semantics: NULL sources (`a.source <
        # b.source`) and NULL fingerprints (`a.h = b.h`, null text)
        # join no off-diagonal pair; diagonals (GROUP BY keeps NULL)
        # stay
        valid = ~pd.isna(src_all)
        for hc in hcols:
            valid &= ~pd.isna(df[hc].to_numpy())
        df = df[valid]
        src = df[source_col].to_numpy()
        cnt = df["cnt"].to_numpy()
        hkey = df[hcols[0]].to_numpy() if len(hcols) == 1 else \
            list(zip(df["h"].to_numpy(), df["h_hi"].to_numpy()))
        hkey = pd.factorize(pd.Series(hkey))[0]
        n = len(df)
        pairs_a = [src_all[cnt_all >= 2]]            # diagonal
        pairs_b = [src_all[cnt_all >= 2]]
        d = 1
        while True:  # <= per-group source-alphabet iterations, not rows
            same = hkey[d:] == hkey[:-d] if d < n else np.zeros(0, bool)
            if not same.any():
                break
            pairs_a.append(src[:-d][same])
            pairs_b.append(src[d:][same])
            d += 1
        a = np.concatenate(pairs_a)
        b = np.concatenate(pairs_b)
        if not len(a):
            return empty
        pdf = pd.DataFrame({"source_a": a, "source_b": b})
        g = pdf.groupby(["source_a", "source_b"], sort=False,
                        dropna=False).size()
        g = g.rename("n").reset_index()
        return pa.table({
            "source_a": pa.Array.from_pandas(g["source_a"], type=st),
            "source_b": pa.Array.from_pandas(g["source_b"], type=st),
            "n": pa.array(g["n"].to_numpy(), type=pa.int64())})

    expanded = _partition_by(parts, hcols, num_partitions).map_groups(
        _pin(expand), batch_format="pyarrow")
    merged = grouped_sum(expanded, ["source_a", "source_b"], ["n"])
    return merged.map_batches(
        lambda b: b.rename_columns(
            ["source_a", "source_b", "n_groups"]
            if b.column_names == ["source_a", "source_b", "n"]
            else b.column_names),
        batch_format="pyarrow", zero_copy_batch=True)
