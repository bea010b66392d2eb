"""Approximate-nearest-neighbor search over an embedding column.

Two paths (SURVEY-mandated additions for training-data pipelines):

* **Brute-force cosine top-k** (the correctness baseline): the query
  matrix is broadcast ONCE (``ray.put``) and every ``map_batches`` task
  computes one numpy matmul per batch -> per-batch top-k partials; a
  final small merge keeps the global top-k per query. At 100 TB the
  shuffle carries only (query, candidate, score) partials capped at
  k rows per (query, batch).
* **IVF (LSH-bucketed) variant** (the scale path): vectors are bucketed
  by seeded sign-LSH; queries probe only their own bucket(s), so each
  batch compares against a fraction of the corpus.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data


def _normalize(m: np.ndarray) -> np.ndarray:
    n = np.linalg.norm(m, axis=1, keepdims=True)
    return m / np.where(n == 0, 1, n)


class BruteForceTopK:
    """Actor-pool map_batches stage: query matrix fetched once per actor
    (__init__), one matmul per batch (__call__)."""

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.qids = q["ids"]
        self.qm = q["matrix"]  # already normalized, (n_q, dim)
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = np.array(batch.column(self.vec_col).to_pylist(), dtype=np.float64)
        if emb.size == 0:
            return pa.table({
                "query_id": pa.array([], type=pa.int64()),
                "vec_id": pa.array([], type=pa.int64()),
                "cosine": pa.array([], type=pa.float64()),
            })
        emb = _normalize(emb)
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        sims = self.qm @ emb.T  # (n_q, n_batch)
        # mask self-matches
        for qi, qid in enumerate(self.qids):
            sims[qi, ids == qid] = -np.inf
        k = min(self.k, sims.shape[1])
        top = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
        q_out, v_out, c_out = [], [], []
        for qi in range(sims.shape[0]):
            for j in top[qi]:
                if np.isfinite(sims[qi, j]):
                    q_out.append(int(self.qids[qi]))
                    v_out.append(int(ids[j]))
                    c_out.append(float(sims[qi, j]))
        return pa.table({
            "query_id": pa.array(q_out, type=pa.int64()),
            "vec_id": pa.array(v_out, type=pa.int64()),
            "cosine": pa.array(c_out, type=pa.float64()),
        })


def brute_force_topk(
    ds: ray.data.Dataset,
    query_ids: list[int],
    query_matrix: np.ndarray,
    k: int = 10,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """-> (query_id, vec_id, rank) global top-k per query (rank 1 = best,
    cosine desc, vec_id asc tiebreak)."""
    qref = ray.put({"ids": np.asarray(query_ids), "matrix": _normalize(np.asarray(query_matrix, dtype=np.float64))})

    partials = ds.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs={"queries_ref": qref, "k": k, "id_col": id_col, "vec_col": vec_col},
        batch_format="pyarrow",
        concurrency=(1, 8),
    )

    def merge(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        cos = group.column("cosine").to_numpy(zero_copy_only=False)
        vid = group.column("vec_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((vid, -cos))[:k]
        return pa.table({
            "query_id": pa.array([qid] * len(order), type=pa.int64()),
            "vec_id": pa.array(vid[order], type=pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1), type=pa.int64()),
        })

    return partials.groupby("query_id").map_groups(merge, batch_format="pyarrow")


def ivf_topk(
    ds: ray.data.Dataset,
    query_ids: list[int],
    query_matrix: np.ndarray,
    k: int = 10,
    n_planes: int = 6,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Scale path: sign-LSH bucket both corpus and queries; compare only
    within matching buckets (approximate — recall < 1)."""
    qm = _normalize(np.asarray(query_matrix, dtype=np.float64))
    rng = np.random.default_rng(seed)
    dim = qm.shape[1]
    planes = rng.standard_normal((dim, n_planes))

    def q_bucket(m):
        s = (m @ planes > 0).astype(np.uint64)
        return (s << np.arange(n_planes, dtype=np.uint64)).sum(axis=1, dtype=np.uint64)

    qb = q_bucket(qm)
    # multi-probe: each query also probes every bucket at Hamming distance 1
    # from its own (recall boost at (n_planes+1)x probe cost)
    by_bucket: dict[int, list[int]] = {}
    for qi, b in enumerate(qb):
        probes = {int(b)} | {int(b) ^ (1 << j) for j in range(n_planes)}
        for pb in probes:
            by_bucket.setdefault(pb, []).append(qi)
    qref = ray.put({"ids": np.asarray(query_ids), "matrix": qm, "by_bucket": by_bucket})

    def probe(batch: pa.Table) -> pa.Table:
        q = ray.get(qref) if isinstance(qref, ray.ObjectRef) else qref
        emb = np.array(batch.column(vec_col).to_pylist(), dtype=np.float64)
        out_q, out_v, out_c = [], [], []
        if emb.size:
            emb = _normalize(emb)
            ids = batch.column(id_col).to_numpy(zero_copy_only=False)
            buckets = q_bucket(emb)
            for b, qidx in q["by_bucket"].items():
                mask = buckets == b
                if not mask.any():
                    continue
                sub, sub_ids = emb[mask], ids[mask]
                sims = q["matrix"][qidx] @ sub.T
                for row, qi in enumerate(qidx):
                    for j in np.argsort(-sims[row])[:k]:
                        if sub_ids[j] != q["ids"][qi]:
                            out_q.append(int(q["ids"][qi]))
                            out_v.append(int(sub_ids[j]))
                            out_c.append(float(sims[row, j]))
        return pa.table({
            "query_id": pa.array(out_q, type=pa.int64()),
            "vec_id": pa.array(out_v, type=pa.int64()),
            "cosine": pa.array(out_c, type=pa.float64()),
        })

    partials = ds.map_batches(probe, batch_format="pyarrow", zero_copy_batch=True)

    def merge(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        cos = group.column("cosine").to_numpy(zero_copy_only=False)
        vid = group.column("vec_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((vid, -cos))[:k]
        return pa.table({
            "query_id": pa.array([qid] * len(order), type=pa.int64()),
            "vec_id": pa.array(vid[order], type=pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1), type=pa.int64()),
        })

    return partials.groupby("query_id").map_groups(merge, batch_format="pyarrow")
