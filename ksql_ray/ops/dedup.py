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
                     text_col: str = "text") -> ray.data.Dataset:
    """-> (fingerprint h, doc_id keeper, dup_count) one row per distinct
    document text. Distributed: digest in map_batches, then a two-phase
    min/count groupby on the digest."""
    from ..aggregates import Count, Min
    from ..exec.groupby import GroupByPlan
    from ..expr import F

    def digest(batch: pa.Table) -> pa.Table:
        b = add_fingerprint(batch.select([id_col, text_col]), text_col, "h")
        return b.drop_columns([text_col])

    hashed = ds.map_batches(digest, batch_format="pyarrow", zero_copy_batch=True)
    plan = GroupByPlan([F("h")], [Min(F(id_col)), Count(F(id_col))], [], num_partitions=16)
    partials = hashed.map_batches(plan.partial_fn, batch_format="pyarrow", zero_copy_batch=True)
    merged = partials.groupby("__part").map_groups(plan.merge_fn, batch_format="pyarrow")

    def rename(batch: pa.Table) -> pa.Table:
        mapping = {"__k0": "h", "__agg0": id_col, "__agg1": "dup_count"}
        return batch.rename_columns([mapping.get(n, n) for n in batch.column_names])

    return merged.map_batches(rename, batch_format="pyarrow", zero_copy_batch=True)



# ---------------------------------------------------------------- bucketing
def _partition_by(ds: ray.data.Dataset, key_cols: list[str], num_partitions: int = 32):
    """Hash-partition rows by key columns and group by the partition id.
    Downstream fns receive WHOLE partitions (a handful of Python calls),
    never one call per distinct key — groupby(key).map_groups with
    millions of tiny buckets spends everything on per-group overhead
    (measured on the 200k-doc dedup bench)."""
    from ..exec.groupby import hash_partition_ids

    def add_part(batch: pa.Table) -> pa.Table:
        part = hash_partition_ids(batch, key_cols, num_partitions)
        return batch.append_column("__part", pa.array(part, type=pa.int64()))

    return ds.map_batches(add_part, batch_format="pyarrow", zero_copy_batch=True).groupby("__part")


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


def _word_ngram_hashes(texts, n: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """All word n-gram hashes per doc, flattened: (hashes, per-doc offsets).

    Fully vectorized: tokens hashed with the cython ``pd.util.hash_array``
    over the FLATTENED token stream, n-grams combined with shifted
    multiply-xor under uint64 wraparound — no per-gram Python loop (the
    original per-byte FNV loop dominated the 200k-doc dedup bench).
    Docs with fewer than n tokens contribute one whole-doc gram."""
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


def minhash_stage(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text",
                  num_hashes: int = 64, bands: int = 16, ngram: int = 3,
                  seed: int = 42) -> pa.Table:
    """map_batches stage: doc -> `bands` rows of (band, bucket_hash, doc_id,
    signature). Bucket co-location happens in the downstream groupby."""
    texts = batch.column(text_col)
    ids = batch.column(id_col)
    flat, offsets = _word_ngram_hashes(texts, ngram)
    sig = _minhash_signatures(flat, offsets, num_hashes, seed)
    n_docs, rows_per_band = len(texts), num_hashes // bands
    band_ids = np.repeat(np.arange(bands), n_docs)
    doc_idx = np.tile(np.arange(n_docs), bands)
    band_sig = sig.reshape(n_docs, bands, rows_per_band)
    # bucket hash per (doc, band): FNV-combine the band's rows
    bucket = np.zeros((n_docs, bands), dtype=np.uint64)
    for r in range(rows_per_band):
        bucket = (bucket * np.uint64(31) + band_sig[:, :, r]) & np.uint64(0xFFFFFFFFFFFFFFFF)
    out = pa.table({
        "band": pa.array(band_ids, type=pa.int32()),
        "bucket": pa.array(bucket.T.reshape(-1).view(np.int64)),
        id_col: ids.take(pa.array(doc_idx)),
        "sig": pa.FixedSizeListArray.from_arrays(
            pa.array(sig[doc_idx].reshape(-1).view(np.int64)), num_hashes
        ),
    })
    return out


def minhash_candidate_pairs(group: pa.Table, id_col: str = "doc_id",
                            threshold: float = 0.7) -> pa.Table:
    """One PARTITION of (band, bucket) rows: pairs are generated only
    inside multi-member buckets (rare), scored by signature agreement."""
    if "__part" in group.column_names:
        group = group.drop_columns(["__part"])
    tbl, starts, sizes = _bucket_segments(group, ["band", "bucket"])
    a_out, b_out, est = [], [], []
    multi = np.nonzero(sizes >= 2)[0]
    if len(multi):
        ids_np = tbl.column(id_col).to_numpy(zero_copy_only=False)
        sig_col = tbl.column("sig")
        if isinstance(sig_col, pa.ChunkedArray):
            sig_col = sig_col.combine_chunks()
        width = sig_col.type.list_size
        sig_all = sig_col.flatten().to_numpy(zero_copy_only=False).reshape(-1, width)
        for m in multi:
            s0, sz = starts[m], sizes[m]
            ids = ids_np[s0 : s0 + sz]
            sigs = sig_all[s0 : s0 + sz]
            for i in range(sz):
                agree = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
                for j, e in enumerate(agree, start=i + 1):
                    if e >= threshold and ids[i] != ids[j]:
                        lo, hi = sorted((int(ids[i]), int(ids[j])))
                        a_out.append(lo)
                        b_out.append(hi)
                        est.append(float(e))
    return pa.table({
        "doc_a": pa.array(a_out, type=pa.int64()),
        "doc_b": pa.array(b_out, type=pa.int64()),
        "est_jaccard": pa.array(est, type=pa.float64()),
    })


def minhash_dedup_pairs(ds: ray.data.Dataset, id_col: str = "doc_id",
                        text_col: str = "text", threshold: float = 0.7,
                        num_hashes: int = 64, bands: int = 16,
                        seed: int = 42) -> ray.data.Dataset:
    """Full MinHash-LSH near-dup pipeline -> distinct candidate pairs.

    Scale shape: signatures are computed ONCE per doc; the bucket shuffle
    carries only (band, bucket, doc_id) — 24 bytes/row, never the 64-hash
    signature (shipping sigs per band row was 16x redundant, measured).
    Candidate pairs (post bucket-collision + distinct) are scored against
    a broadcast signature matrix (`ray.put` once; at multi-node scale,
    shard the matrix per node the same way)."""
    import ray as _ray

    def sig_stage(batch: pa.Table) -> pa.Table:
        flat, offsets = _word_ngram_hashes(batch.column(text_col), 3)
        sig = _minhash_signatures(flat, offsets, num_hashes, seed)
        n_docs = batch.num_rows
        return pa.table({
            id_col: batch.column(id_col),
            "sig": pa.FixedSizeListArray.from_arrays(
                pa.array(sig.reshape(-1).view(np.int64)), num_hashes
            ),
        })

    sig_ds = ds.map_batches(sig_stage, batch_format="pyarrow", zero_copy_batch=True)
    sig_tbl = pa.concat_tables(
        [t for t in _ray.get(sig_ds.to_arrow_refs()) if t.num_columns],
        promote_options="permissive",
    )
    ids_np = sig_tbl.column(id_col).to_numpy(zero_copy_only=False)
    order = np.argsort(ids_np, kind="stable")
    sorted_ids = ids_np[order]
    sc = sig_tbl.column("sig")
    if isinstance(sc, pa.ChunkedArray):
        sc = sc.combine_chunks()
    sig_mat = sc.flatten().to_numpy(zero_copy_only=False).reshape(-1, num_hashes)[order]
    sig_ref = _ray.put({"ids": sorted_ids, "mat": sig_mat})

    rows_per_band = num_hashes // bands

    def bucket_stage(batch: pa.Table) -> pa.Table:
        scol = batch.column("sig")
        if isinstance(scol, pa.ChunkedArray):
            scol = scol.combine_chunks()
        n_docs = batch.num_rows
        sig = scol.flatten().to_numpy(zero_copy_only=False).reshape(n_docs, num_hashes)
        band_sig = sig.view(np.uint64).reshape(n_docs, bands, rows_per_band)
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

    buckets = sig_ds.map_batches(bucket_stage, batch_format="pyarrow", zero_copy_batch=True)

    def candidates(group: pa.Table, max_full_pairwise: int = 64) -> pa.Table:
        """Vectorized pair generation. Jumbo buckets (> max_full_pairwise
        members — spam/boilerplate clusters) emit STAR pairs (min id vs
        each member, linear) instead of the quadratic all-pairs set: the
        cluster stays dedupable through its representative, and cost stays
        linear in bucket size (the production LSH-dedup pattern)."""
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        tbl, starts, sizes = _bucket_segments(group, ["band", "bucket"])
        outs_a, outs_b = [], []
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
        a = np.concatenate(outs_a) if outs_a else np.empty(0, dtype=np.int64)
        b = np.concatenate(outs_b) if outs_b else np.empty(0, dtype=np.int64)
        return pa.table({
            "doc_a": pa.array(a.astype(np.int64)),
            "doc_b": pa.array(b.astype(np.int64)),
        })

    cands = _partition_by(buckets, ["band", "bucket"]).map_groups(
        candidates, batch_format="pyarrow"
    )

    def score(batch: pa.Table) -> pa.Table:
        if "__part" in batch.column_names:
            batch = batch.drop_columns(["__part"])
        if batch.num_rows == 0:
            return pa.table({
                "doc_a": pa.array([], type=pa.int64()),
                "doc_b": pa.array([], type=pa.int64()),
                "est_jaccard": pa.array([], type=pa.float64()),
            })
        # distinct pairs within this partition (same pair from many bands)
        gb = pa.TableGroupBy(batch, ["doc_a", "doc_b"], use_threads=False)
        dedup = gb.aggregate([])
        a = dedup.column("doc_a").to_numpy(zero_copy_only=False)
        b = dedup.column("doc_b").to_numpy(zero_copy_only=False)
        sigd = _ray.get(sig_ref) if isinstance(sig_ref, _ray.ObjectRef) else sig_ref
        ia = np.searchsorted(sigd["ids"], a)
        ib = np.searchsorted(sigd["ids"], b)
        est = (sigd["mat"][ia] == sigd["mat"][ib]).mean(axis=1)
        keep = est >= threshold
        return pa.table({
            "doc_a": pa.array(a[keep]),
            "doc_b": pa.array(b[keep]),
            "est_jaccard": pa.array(est[keep], type=pa.float64()),
        })

    return _partition_by(cands, ["doc_a", "doc_b"]).map_groups(
        score, batch_format="pyarrow"
    )


def ngram_jaccard_pairs(ds: ray.data.Dataset, id_col: str = "doc_id",
                        text_col: str = "text", threshold: float = 0.5,
                        ngram: int = 3, num_hashes: int = 64, bands: int = 16,
                        seed: int = 42) -> ray.data.Dataset:
    """EXACT word-n-gram Jaccard similarity, computed only for LSH-bucket
    candidate pairs (the scale path: MinHash bands prune the O(n²) space,
    the exact set intersection verifies). -> (doc_a, doc_b, jaccard)."""

    def stage(batch: pa.Table) -> pa.Table:
        out = minhash_stage(batch, id_col, text_col, num_hashes, bands, ngram, seed)
        # carry each doc's exact shingle-hash set for the verify step
        texts = batch.column(text_col)
        flat, offsets = _word_ngram_hashes(texts, ngram)
        n_docs = len(texts)
        per_doc = pa.ListArray.from_arrays(
            pa.array(offsets.astype(np.int32), type=pa.int32()),
            pa.array(flat),
        )
        doc_idx = np.tile(np.arange(n_docs), bands)
        return out.append_column("shingles", per_doc.take(pa.array(doc_idx)))

    staged = ds.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True)

    def verify(group: pa.Table) -> pa.Table:
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        tbl, starts, sizes = _bucket_segments(group, ["band", "bucket"])
        a_out, b_out, jac = [], [], []
        multi = np.nonzero(sizes >= 2)[0]
        if len(multi):
            ids_np = tbl.column(id_col).to_numpy(zero_copy_only=False)
            sh_col = tbl.column("shingles")
            if isinstance(sh_col, pa.ChunkedArray):
                sh_col = sh_col.combine_chunks()
            sh_py = None
            for m in multi:
                s0, sz = starts[m], sizes[m]
                ids = ids_np[s0 : s0 + sz]
                sh = [set(sh_col[s0 + i].as_py()) for i in range(sz)]
                for i in range(sz):
                    for j in range(i + 1, sz):
                        if ids[i] == ids[j]:
                            continue
                        inter = len(sh[i] & sh[j])
                        union = len(sh[i] | sh[j])
                        jv = inter / union if union else 0.0
                        if jv >= threshold:
                            lo, hi = sorted((int(ids[i]), int(ids[j])))
                            a_out.append(lo)
                            b_out.append(hi)
                            jac.append(jv)
        return pa.table({
            "doc_a": pa.array(a_out, type=pa.int64()),
            "doc_b": pa.array(b_out, type=pa.int64()),
            "jaccard": pa.array(jac, type=pa.float64()),
        })

    pairs = _partition_by(staged, ["band", "bucket"]).map_groups(
        verify, batch_format="pyarrow"
    )

    def dedupe(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        if "__part" in batch.column_names:
            batch = batch.drop_columns(["__part"])
        gb = pa.TableGroupBy(batch, ["doc_a", "doc_b"], use_threads=False)
        return gb.aggregate([("jaccard", "max")]).rename_columns(
            ["doc_a", "doc_b", "jaccard"]
        )

    return _partition_by(pairs, ["doc_a", "doc_b"]).map_groups(
        dedupe, batch_format="pyarrow"
    )


# ---------------------------------------------------------------- simhash
def simhash_stage(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """64-bit simhash per doc, vectorized bit-count accumulation."""
    texts = batch.column(text_col)
    flat, offsets = _word_ngram_hashes(texts, 1)  # token hashes
    n_docs = len(texts)
    sims = np.zeros(n_docs, dtype=np.uint64)
    if len(flat):
        bits = ((flat[:, None] >> np.arange(64, dtype=np.uint64)) & np.uint64(1)).astype(np.int64)
        contrib = bits * 2 - 1  # ±1 per bit
        doc_ids = np.repeat(np.arange(n_docs), np.diff(offsets))
        acc = np.zeros((n_docs, 64), dtype=np.int64)
        np.add.at(acc, doc_ids, contrib)
        simbits = (acc > 0).astype(np.uint64)
        sims = (simbits << np.arange(64, dtype=np.uint64)).sum(axis=1, dtype=np.uint64)
    return pa.table({
        id_col: batch.column(id_col),
        "simhash": pa.array(sims.view(np.int64)),
    })


def simhash_pairs(ds: ray.data.Dataset, id_col: str = "doc_id",
                  text_col: str = "text", max_hamming: int = 3) -> ray.data.Dataset:
    """Near-dup pairs within Hamming distance: bucket by each of four
    16-bit chunks (pigeonhole: distance<=3 shares at least one chunk)."""
    hashed = ds.map_batches(
        lambda b: simhash_stage(b, id_col, text_col),
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

    exploded = hashed.map_batches(explode_chunks, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs(group: pa.Table) -> pa.Table:
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        tbl, starts, sizes = _bucket_segments(group, ["chunk", "bucket"])
        outs_a, outs_b, outs_d = [], [], []
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
        a = np.concatenate(outs_a) if outs_a else np.empty(0, dtype=np.int64)
        b = np.concatenate(outs_b) if outs_b else np.empty(0, dtype=np.int64)
        d = np.concatenate(outs_d) if outs_d else np.empty(0, dtype=np.int64)
        return pa.table({
            "doc_a": pa.array(a.astype(np.int64)),
            "doc_b": pa.array(b.astype(np.int64)),
            "hamming": pa.array(d),
        })

    pairs = _partition_by(exploded, ["chunk", "bucket"]).map_groups(
        bucket_pairs, batch_format="pyarrow"
    )

    def dedupe(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        if "__part" in batch.column_names:
            batch = batch.drop_columns(["__part"])
        gb = pa.TableGroupBy(batch, ["doc_a", "doc_b"], use_threads=False)
        return gb.aggregate([("hamming", "min")]).rename_columns(["doc_a", "doc_b", "hamming"])

    return _partition_by(pairs, ["doc_a", "doc_b"]).map_groups(
        dedupe, batch_format="pyarrow"
    )


# ---------------------------------------------------------------- embeddings
def embedding_neardup_pairs(ds: ray.data.Dataset, id_col: str = "vec_id",
                            vec_col: str = "embedding", threshold: float = 0.95,
                            n_planes: int = 12, seed: int = 42) -> ray.data.Dataset:
    """Cosine near-dup: sign-LSH bucket (seeded hyperplanes) -> exact
    cosine within bucket. The scale path: only bucket collisions compared."""
    def bucketize(batch: pa.Table) -> pa.Table:
        emb = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
        norms = np.linalg.norm(emb, axis=1, keepdims=True)
        emb = emb / np.where(norms == 0, 1, norms)
        rng = np.random.default_rng(seed)
        planes = rng.standard_normal((emb.shape[1], n_planes))
        signs = (emb @ planes > 0).astype(np.uint64)
        bucket = (signs << np.arange(n_planes, dtype=np.uint64)).sum(axis=1, dtype=np.uint64)
        return pa.table({
            "bucket": pa.array(bucket.astype(np.int64)),
            id_col: batch.column(id_col),
            "vec": pa.array([list(map(float, r)) for r in emb], type=pa.list_(pa.float64())),
        })

    bucketed = ds.map_batches(bucketize, batch_format="pyarrow", zero_copy_batch=True)

    def bucket_pairs(group: pa.Table) -> pa.Table:
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        tbl, starts, sizes = _bucket_segments(group, ["bucket"])
        a_out, b_out, cos = [], [], []
        multi = np.nonzero(sizes >= 2)[0]
        for mseg in multi:
            s0, sz = starts[mseg], sizes[mseg]
            sub = tbl.slice(s0, sz)
            ids = sub.column(id_col).to_pylist()
            m = np.array(sub.column("vec").to_pylist(), dtype=np.float64)
            sims = m @ m.T
            iu = np.triu_indices(sz, k=1)
            for i, j in zip(*iu):
                if sims[i, j] >= threshold:
                    lo, hi = sorted((ids[i], ids[j]))
                    a_out.append(lo)
                    b_out.append(hi)
                    cos.append(float(sims[i, j]))
        return pa.table({
            "vec_a": pa.array(a_out, type=pa.int64()),
            "vec_b": pa.array(b_out, type=pa.int64()),
            "cosine": pa.array(cos, type=pa.float64()),
        })

    return _partition_by(bucketed, ["bucket"]).map_groups(
        bucket_pairs, batch_format="pyarrow"
    )
