"""Distributed k-means (Lloyd's algorithm) over an embedding column.

Corpus organization for training-data pipelines: topic bucketing,
diversity sampling, and IVF coarse quantizers (ops/ann.py) all start
from a k-means pass over document embeddings. The reference ksql
builder has no clustering surface (absence verified across
/root/reference/ksql/*.go); this is part of the engine's
training-data extension set.

Scale shape — the canonical broadcast/partial-reduce loop, NO shuffle:

- the (id, vector) projection is materialized ONCE (perf lesson #10:
  Lloyd is multi-pass, and a lazy Dataset re-executes its lineage on
  every pass);
- each iteration broadcasts the k×d centroid matrix (``ray.put``) and
  runs one stateless ``map_batches`` over the corpus that emits ONE
  (k, d+1) partial — per-cluster vector sums + counts, computed with
  ``np.add.at`` scatter-adds — so the data that leaves a task is k×d
  floats regardless of batch size;
- partials are summed driver-side (k×d is tiny by contract: this op
  targets k up to ~10^5 at d ~10^3, a few hundred MB of partials per
  pass at 32 partitions — far below any corpus-proportional cost).

Determinism contract (what lets the DuckDB oracle be bit-equal):
initial centroids are the vectors of the k smallest ids; distance ties
break to the lowest cluster id; centroids are rounded half-away-from-
zero to ``round_dp`` decimals after every update (pinning both sides to
identical floats despite different summation orders — perf lesson #13);
empty clusters keep their previous centroid.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .dedup import _pin
from .vectors import pack_u64_rows, unpack_u64, vecs_np

__all__ = ["kmeans", "semdedup"]


def _round_half_away(m: np.ndarray, dp: int) -> np.ndarray:
    scale = 10.0 ** dp
    return np.floor(m * scale + np.where(m >= 0, 0.5, -0.5)) / scale


def _assign(emb: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Nearest centroid per row (squared L2, lowest index on tie), via
    one matmul: argmin(||c||^2 - 2 x.c) — BLAS, no (n, k, d) temporary."""
    d2 = (cents * cents).sum(axis=1)[None, :] - 2.0 * (emb @ cents.T)
    return np.argmin(d2, axis=1)


def _seed_centroids(ds: ray.data.Dataset, k: int, id_col: str,
                    vec_col: str) -> np.ndarray:
    """Vectors of the k smallest ids: per-batch local top-k, tiny driver
    merge — never the full table."""

    @_pin
    def local_topk(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False)
        keep = np.argsort(ids, kind="stable")[:k]
        return batch.take(pa.array(np.sort(keep)))

    parts = [t for t in ray.get(
        ds.map_batches(local_topk, batch_format="pyarrow",
                       zero_copy_batch=True).to_arrow_refs()) if t.num_rows]
    if not parts:
        raise ValueError("kmeans: empty input")
    merged = pa.concat_tables(parts, promote_options="permissive")
    ids = merged.column(id_col).to_numpy(zero_copy_only=False)
    if len(ids) < k:
        raise ValueError(f"kmeans: k={k} exceeds row count {len(ids)}")
    order = np.argsort(ids, kind="stable")[:k]
    return vecs_np(merged.column(vec_col))[order]


class _PartialSums:
    """Actor-pool stage: centroids fetched once per actor, one scatter-add
    partial (cluster sums + counts) per batch."""

    def __init__(self, cents_ref, id_col: str, vec_col: str):
        from ..streaming.driver import limit_worker_threads

        limit_worker_threads()
        self.cents = ray.get(cents_ref) if isinstance(cents_ref, ray.ObjectRef) else cents_ref
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        k, d = self.cents.shape
        emb = vecs_np(batch.column(self.vec_col))
        sums = np.zeros((k, d), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        if emb.size:
            a = _assign(emb, self.cents)
            np.add.at(sums, a, emb)
            counts = np.bincount(a, minlength=k).astype(np.int64)
        return pa.table({
            "cl": np.arange(k, dtype=np.int64),
            "s": pack_u64_rows(sums),  # float64 rows packed buffer-level
            "n": counts,
        })


def _lloyd(proj: ray.data.Dataset, k: int, iters: int, id_col: str,
           vec_col: str, round_dp: int, concurrency) -> np.ndarray:
    """Run ``iters`` Lloyd iterations over a MATERIALIZED (id, vector)
    projection; return the final k×d centroid matrix. Shared by
    :func:`kmeans` and :func:`semdedup`."""
    cents = _round_half_away(_seed_centroids(proj, k, id_col, vec_col), round_dp)
    d = cents.shape[1]

    for _ in range(iters):
        cref = ray.put(cents)
        parts = proj.map_batches(
            _PartialSums,
            fn_constructor_kwargs={"cents_ref": cref, "id_col": id_col,
                                   "vec_col": vec_col},
            batch_format="pyarrow", concurrency=concurrency,
            max_restarts=0,
        )
        sums = np.zeros((k, d), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        for t in ray.get(parts.to_arrow_refs()):
            if not t.num_rows:
                continue
            cl = t.column("cl").to_numpy(zero_copy_only=False)
            n = t.column("n").to_numpy(zero_copy_only=False)
            flat, _ = unpack_u64(t.column("s"), dtype=np.float64)
            s = flat.reshape(len(cl), d)
            np.add.at(sums, cl, s)
            np.add.at(counts, cl, n)
        nonempty = counts > 0
        new = cents.copy()  # empty clusters keep their previous centroid
        new[nonempty] = _round_half_away(
            sums[nonempty] / counts[nonempty, None], round_dp)
        cents = new
    return cents


def kmeans(ds: ray.data.Dataset, k: int = 8, iters: int = 3,
           id_col: str = "vec_id", vec_col: str = "embedding",
           round_dp: int = 6, concurrency=(1, 8)) -> ray.data.Dataset:
    """-> (id_col, cluster) after ``iters`` Lloyd iterations from the
    deterministic k-smallest-id seed. The final assignment pass streams;
    only k×d partials and centroids ever leave a task."""
    proj = ds.select_columns([id_col, vec_col]).materialize()
    cents = _lloyd(proj, k, iters, id_col, vec_col, round_dp, concurrency)
    cref = ray.put(cents)

    class _FinalAssign:
        def __init__(self):
            from ..streaming.driver import limit_worker_threads

            limit_worker_threads()
            self.cents = ray.get(cref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            emb = vecs_np(batch.column(vec_col))
            a = (_assign(emb, self.cents) if emb.size
                 else np.empty(0, dtype=np.int64))
            return pa.table({
                id_col: batch.column(id_col),
                "cluster": pa.array(a.astype(np.int64), type=pa.int64()),
            })

    return proj.map_batches(_FinalAssign, batch_format="pyarrow",
                            concurrency=concurrency, max_restarts=0)


def semdedup(ds: ray.data.Dataset, k: int = 8, iters: int = 3,
             tau: float = 0.4, id_col: str = "vec_id",
             vec_col: str = "embedding", round_dp: int = 6,
             concurrency=(1, 8), num_partitions: int = 16,
             max_cluster_pairwise: int = 8192) -> ray.data.Dataset:
    """Semantic deduplication (SemDeDup, Abbas et al. 2023): k-means the
    embedding space, then within each cluster drop every vector whose
    cosine similarity to a LOWER-id vector of the same cluster is
    >= ``tau``. -> (id_col, cluster, keep) with one row per input vector.

    Scale shape: the Lloyd loop is the shuffle-free broadcast/partial-
    reduce of :func:`kmeans`; the dedup pass is ONE hash shuffle on
    ``cluster`` (each cluster lands whole in one partition) followed by a
    per-cluster pairwise cosine — a float64 matmul over normalized rows.
    Per-cluster cost is O(|c|^2·d); clusters larger than
    ``max_cluster_pairwise`` get pairwise over their lowest-id members
    only (the tail is kept unconditionally) and are COUNTED to the stats
    actor (``semdedup.capped_clusters``/``capped_members`` — no silent
    caps). At 10^9+ docs, raise k so |c| ~ corpus/k stays under the cap.

    Determinism contract (what lets the unrolled-Lloyd DuckDB oracle be
    bit-equal): same seed/tie/rounding rules as :func:`kmeans`, cosine =
    dot of float64-normalized rows (matches ``list_inner_product/(na*nb)``
    at the gate's 6-dp rounding), keep-rule ties broken by id order.
    """
    from .dedup import _pin
    from .stats import ensure_stats_actor, record_stats
    from .vectors import normalize_rows

    ensure_stats_actor()
    proj = ds.select_columns([id_col, vec_col]).materialize()
    cents = _lloyd(proj, k, iters, id_col, vec_col, round_dp, concurrency)
    cref = ray.put(cents)

    class _AssignPack:
        """(id, cluster, normalized vector packed as binary) per row."""

        def __init__(self):
            from ..streaming.driver import limit_worker_threads

            limit_worker_threads()
            self.cents = ray.get(cref)

        def __call__(self, batch: pa.Table) -> pa.Table:
            emb = vecs_np(batch.column(vec_col))
            a = (_assign(emb, self.cents) if emb.size
                 else np.empty(0, dtype=np.int64))
            return pa.table({
                id_col: batch.column(id_col),
                "cluster": pa.array(a.astype(np.int64), type=pa.int64()),
                "vec": pack_u64_rows(normalize_rows(emb.astype(np.float64))),
            })

    assigned = proj.map_batches(_AssignPack, batch_format="pyarrow",
                                concurrency=concurrency, max_restarts=0)

    id_type = proj.schema().base_schema.field(id_col).type

    def per_partition(group: pa.Table) -> pa.Table:
        empty = pa.table({
            id_col: pa.array([], type=id_type),
            "cluster": pa.array([], type=pa.int64()),
            "keep": pa.array([], type=pa.bool_()),
        })
        if group.num_rows == 0:
            return empty
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        tbl = group.take(pc.sort_indices(group, sort_keys=[
            ("cluster", "ascending"), (id_col, "ascending")]))
        cl = tbl.column("cluster").to_numpy(zero_copy_only=False)
        flat, _ = unpack_u64(tbl.column("vec"), dtype=np.float64)
        m = flat.reshape(len(cl), -1)
        keep = np.ones(len(cl), dtype=bool)
        starts = np.flatnonzero(np.r_[True, cl[1:] != cl[:-1]])
        ends = np.r_[starts[1:], len(cl)]
        capped_clusters = capped_members = 0
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2:
                continue
            if n > max_cluster_pairwise:
                capped_clusters += 1
                capped_members += int(n - max_cluster_pairwise)
                e = s + max_cluster_pairwise
            sims = m[s:e] @ m[s:e].T
            # rows sorted by id: drop i iff some j<i in-cluster has cos>=tau
            keep[s:e] = ~(np.tril(sims >= tau, k=-1).any(axis=1))
        if capped_clusters:
            record_stats("semdedup", capped_clusters=capped_clusters,
                         capped_members=capped_members)
        return pa.table({
            id_col: tbl.column(id_col),
            "cluster": tbl.column("cluster"),
            "keep": pa.array(keep),
        })

    from .dedup import _partition_by

    return _partition_by(assigned, ["cluster"], num_partitions).map_groups(
        _pin(per_partition), batch_format="pyarrow")
