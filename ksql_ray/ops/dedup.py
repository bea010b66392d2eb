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


# ---------------------------------------------------------------- shingles
def _word_ngram_hashes(texts: list[str | None], n: int = 3) -> tuple[np.ndarray, np.ndarray]:
    """All word n-gram hashes per doc, flattened: (hashes, per-doc offsets).
    Deterministic FNV-1a over the joined n-gram bytes."""
    hashes: list[np.ndarray] = []
    counts = np.zeros(len(texts), dtype=np.int64)
    for i, t in enumerate(texts):
        if not t:
            hashes.append(np.empty(0, dtype=np.uint64))
            continue
        toks = t.lower().split()
        if len(toks) < n:
            grams = [" ".join(toks)] if toks else []
        else:
            grams = [" ".join(toks[j : j + n]) for j in range(len(toks) - n + 1)]
        hs = np.empty(len(grams), dtype=np.uint64)
        for j, g in enumerate(grams):
            h = _H1
            for b in g.encode("utf-8"):
                h = np.uint64((int(h) ^ b) * int(_H2) & 0xFFFFFFFFFFFFFFFF)
            hs[j] = h
        hashes.append(hs)
        counts[i] = len(hs)
    flat = np.concatenate(hashes) if hashes else np.empty(0, dtype=np.uint64)
    offsets = np.concatenate(([0], np.cumsum(counts)))
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
    texts = batch.column(text_col).to_pylist()
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
        "sig": pa.array(list(sig[doc_idx].astype(np.int64)), type=pa.list_(pa.int64())),
    })
    return out


def minhash_candidate_pairs(group: pa.Table, id_col: str = "doc_id",
                            threshold: float = 0.7) -> pa.Table:
    """map_groups over (band, bucket): all pairs in the bucket, scored by
    signature agreement (estimated Jaccard); emit pairs >= threshold."""
    n = group.num_rows
    ids = group.column(id_col).to_pylist()
    a_out, b_out, est = [], [], []
    if n >= 2:
        sigs = np.array(group.column("sig").to_pylist(), dtype=np.int64)
        for i in range(n):
            agree = (sigs[i + 1 :] == sigs[i]).mean(axis=1)
            for j, e in enumerate(agree, start=i + 1):
                if e >= threshold and ids[i] != ids[j]:
                    lo, hi = sorted((ids[i], ids[j]))
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
    """Full MinHash-LSH near-dup pipeline -> distinct candidate pairs."""
    staged = ds.map_batches(
        lambda b: minhash_stage(b, id_col, text_col, num_hashes, bands, seed=seed),
        batch_format="pyarrow", zero_copy_batch=True,
    )
    pairs = staged.groupby(["band", "bucket"]).map_groups(
        lambda g: minhash_candidate_pairs(g, id_col, threshold),
        batch_format="pyarrow",
    )

    # distinct pairs (same pair can surface from several bands)
    def dedupe_pairs(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        keys = pa.table({"doc_a": batch.column("doc_a"), "doc_b": batch.column("doc_b")})
        gb = pa.TableGroupBy(batch, ["doc_a", "doc_b"], use_threads=False)
        return gb.aggregate([("est_jaccard", "max")]).rename_columns(
            ["doc_a", "doc_b", "est_jaccard"]
        )

    return pairs.groupby("doc_a").map_groups(dedupe_pairs, batch_format="pyarrow")


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
        texts = batch.column(text_col).to_pylist()
        flat, offsets = _word_ngram_hashes(texts, ngram)
        sets = [
            sorted(set(flat[offsets[i]:offsets[i + 1]].tolist()))
            for i in range(len(texts))
        ]
        n_docs = len(texts)
        doc_idx = np.tile(np.arange(n_docs), bands)
        shingles = pa.array([sets[i] for i in doc_idx], type=pa.list_(pa.uint64()))
        return out.append_column("shingles", shingles)

    staged = ds.map_batches(stage, batch_format="pyarrow", zero_copy_batch=True)

    def verify(group: pa.Table) -> pa.Table:
        n = group.num_rows
        ids = group.column(id_col).to_pylist()
        sh = [set(s) for s in group.column("shingles").to_pylist()]
        a_out, b_out, jac = [], [], []
        for i in range(n):
            for j in range(i + 1, n):
                if ids[i] == ids[j]:
                    continue
                inter = len(sh[i] & sh[j])
                union = len(sh[i] | sh[j])
                jv = inter / union if union else 0.0
                if jv >= threshold:
                    lo, hi = sorted((ids[i], ids[j]))
                    a_out.append(lo)
                    b_out.append(hi)
                    jac.append(jv)
        return pa.table({
            "doc_a": pa.array(a_out, type=pa.int64()),
            "doc_b": pa.array(b_out, type=pa.int64()),
            "jaccard": pa.array(jac, type=pa.float64()),
        })

    pairs = staged.groupby(["band", "bucket"]).map_groups(verify, batch_format="pyarrow")

    def dedupe(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        gb = pa.TableGroupBy(batch, ["doc_a", "doc_b"], use_threads=False)
        return gb.aggregate([("jaccard", "max")]).rename_columns(
            ["doc_a", "doc_b", "jaccard"]
        )

    return pairs.groupby("doc_a").map_groups(dedupe, batch_format="pyarrow")


# ---------------------------------------------------------------- simhash
def simhash_stage(batch: pa.Table, id_col: str = "doc_id", text_col: str = "text") -> pa.Table:
    """64-bit simhash per doc, vectorized bit-count accumulation."""
    texts = batch.column(text_col).to_pylist()
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
        n = group.num_rows
        ids = group.column(id_col).to_pylist()
        sims = group.column("simhash").to_numpy(zero_copy_only=False).view(np.uint64)
        a_out, b_out, dist = [], [], []
        for i in range(n):
            x = sims[i] ^ sims[i + 1 :]
            hd = np.array([bin(int(v)).count("1") for v in x])
            for j, d in enumerate(hd, start=i + 1):
                if d <= max_hamming and ids[i] != ids[j]:
                    lo, hi = sorted((ids[i], ids[j]))
                    a_out.append(lo)
                    b_out.append(hi)
                    dist.append(int(d))
        return pa.table({
            "doc_a": pa.array(a_out, type=pa.int64()),
            "doc_b": pa.array(b_out, type=pa.int64()),
            "hamming": pa.array(dist, type=pa.int64()),
        })

    pairs = exploded.groupby(["chunk", "bucket"]).map_groups(
        bucket_pairs, batch_format="pyarrow"
    )

    def dedupe(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return batch
        gb = pa.TableGroupBy(batch, ["doc_a", "doc_b"], use_threads=False)
        return gb.aggregate([("hamming", "min")]).rename_columns(["doc_a", "doc_b", "hamming"])

    return pairs.groupby("doc_a").map_groups(dedupe, batch_format="pyarrow")


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
        n = group.num_rows
        ids = group.column(id_col).to_pylist()
        a_out, b_out, cos = [], [], []
        if n >= 2:
            m = np.array(group.column("vec").to_pylist(), dtype=np.float64)
            sims = m @ m.T
            iu = np.triu_indices(n, k=1)
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

    return bucketed.groupby("bucket").map_groups(bucket_pairs, batch_format="pyarrow")
