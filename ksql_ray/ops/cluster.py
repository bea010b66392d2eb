"""Distributed k-means (Lloyd's algorithm) and SemDeDup semantic
deduplication over an embedding column.

Corpus organization for training-data pipelines: topic bucketing,
diversity sampling, and IVF coarse quantizers (ops/ann.py) all start
from a k-means pass over document embeddings. The reference ksql
builder has no clustering surface (absence verified across
/root/reference/ksql/*.go); this is part of the engine's
training-data extension set.

Scale shape — the canonical broadcast/partial-reduce loop, NO shuffle:

- the (id, vector) projection is materialized ONCE (perf lesson #10:
  Lloyd is multi-pass, and a lazy Dataset re-executes its lineage on
  every pass) and its BLOCK REFS drive every subsequent pass as raw
  Ray tasks. This is the one place the engine deliberately drops below
  the Dataset API: a Lloyd iteration is ~0.2 GFLOP of matmul, and a
  per-iteration `map_batches` pays 1–3 s of operator/actor-pool
  startup for it — measured 3.4 s/iteration via the Dataset operator
  vs 0.03 s via ~2·ncpu grouped block tasks on the same 100k×64
  input (BASELINE.md). Iteration over a materialized dataset is
  exactly the pattern the streaming executor cannot amortize;
- each iteration broadcasts the k×d centroid matrix (``ray.put``,
  resolved by Ray at task dispatch — never ``ray.get`` inside) and
  every task emits ONE (k, d+1) partial — per-cluster vector sums +
  counts via ``np.add.at`` scatter-adds — so the data that leaves a
  task is k×d floats regardless of input size;
- partials are summed driver-side (k×d is tiny by contract: this op
  targets k up to ~10^5 at d ~10^3).

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
from .vectors import normalize_rows, pack_u64_rows, vecs_np

__all__ = ["cluster_sample", "kmeans", "semdedup"]


def _round_half_away(m: np.ndarray, dp: int) -> np.ndarray:
    # trunc, NOT floor: floor(x*s - 0.5) shifts every negative value
    # whose fraction is < .5 down a full quantum (round(-17.17) -> -18);
    # trunc matches SQL ROUND's half-away-from-zero on both signs
    # (verified against DuckDB across sign/boundary cases)
    scale = 10.0 ** dp
    return np.trunc(m * scale + np.where(m >= 0, 0.5, -0.5)) / scale


def _assign(emb: np.ndarray, cents: np.ndarray) -> np.ndarray:
    """Nearest centroid per row (squared L2, lowest index on tie), via
    one matmul: argmin(||c||^2 - 2 x.c) — BLAS, no (n, k, d) temporary."""
    d2 = (cents * cents).sum(axis=1)[None, :] - 2.0 * (emb @ cents.T)
    return np.argmin(d2, axis=1)


def _task_groups(proj: ray.data.Dataset) -> list[list]:
    """Block refs of the MATERIALIZED projection, grouped into ~2·ncpu
    task payloads (perf lesson #4: per-task overhead dominates tiny
    tasks — 64 two-thousand-row blocks make 64 sub-ms tasks)."""
    blocks = proj.to_arrow_refs()
    ncpu = int(ray.cluster_resources().get("CPU", 4))
    g = max(1, min(len(blocks), ncpu * 2))
    return [blocks[i::g] for i in range(g)]


@ray.remote
def _seed_task(k: int, id_col: str, vec_col: str, *tbls) -> pa.Table:
    from ..streaming.driver import limit_worker_threads

    limit_worker_threads()
    outs = []
    for t in tbls:
        ids = t.column(id_col).to_numpy(zero_copy_only=False)
        keep = np.argsort(ids, kind="stable")[:k]
        outs.append(t.take(pa.array(np.sort(keep))))
    return pa.concat_tables(outs, promote_options="permissive")


def _seed_centroids(groups: list[list], k: int, id_col: str,
                    vec_col: str) -> np.ndarray:
    """Vectors of the k smallest ids: per-task local top-k, tiny driver
    merge — never the full table."""
    parts = [t for t in ray.get(
        [_seed_task.remote(k, id_col, vec_col, *g) for g in groups])
        if t.num_rows]
    if not parts:
        raise ValueError("kmeans: empty input")
    merged = pa.concat_tables(parts, promote_options="permissive")
    ids = merged.column(id_col).to_numpy(zero_copy_only=False)
    if len(ids) < k:
        raise ValueError(f"kmeans: k={k} exceeds row count {len(ids)}")
    order = np.argsort(ids, kind="stable")[:k]
    return vecs_np(merged.column(vec_col))[order]


@ray.remote
def _sums_task(cents: np.ndarray, id_col: str, vec_col: str, *tbls):
    from ..streaming.driver import limit_worker_threads

    limit_worker_threads()
    k, d = cents.shape
    sums = np.zeros((k, d), dtype=np.float64)
    counts = np.zeros(k, dtype=np.int64)
    for t in tbls:
        emb = vecs_np(t.column(vec_col))
        if emb.size:
            a = _assign(emb, cents)
            np.add.at(sums, a, emb)
            counts += np.bincount(a, minlength=k)
    return sums, counts


def _lloyd(groups: list[list], k: int, iters: int, id_col: str,
           vec_col: str, round_dp: int) -> np.ndarray:
    """Run ``iters`` Lloyd iterations over the grouped block refs;
    return the final k×d centroid matrix. Shared by :func:`kmeans` and
    :func:`semdedup`."""
    cents = _round_half_away(
        _seed_centroids(groups, k, id_col, vec_col), round_dp)
    d = cents.shape[1]

    for _ in range(iters):
        cref = ray.put(cents)
        res = ray.get([_sums_task.remote(cref, id_col, vec_col, *g)
                       for g in groups])
        sums = np.zeros((k, d), dtype=np.float64)
        counts = np.zeros(k, dtype=np.int64)
        for s, n in res:
            sums += s
            counts += n
        nonempty = counts > 0
        new = cents.copy()  # empty clusters keep their previous centroid
        new[nonempty] = _round_half_away(
            sums[nonempty] / counts[nonempty, None], round_dp)
        cents = new
    return cents


@ray.remote
def _assign_task(cents: np.ndarray, id_col: str, vec_col: str,
                 pack_vecs: bool, *tbls) -> pa.Table:
    from ..streaming.driver import limit_worker_threads

    limit_worker_threads()
    outs = []
    for t in tbls:
        emb = vecs_np(t.column(vec_col))
        a = (_assign(emb, cents) if emb.size
             else np.empty(0, dtype=np.int64))
        cols = {
            id_col: t.column(id_col),
            "cluster": pa.array(a.astype(np.int64), type=pa.int64()),
        }
        if pack_vecs:
            cols["vec"] = pack_u64_rows(
                normalize_rows(emb.astype(np.float64)))
        outs.append(pa.table(cols))
    return pa.concat_tables(outs, promote_options="permissive")


def kmeans(ds: ray.data.Dataset, k: int = 8, iters: int = 3,
           id_col: str = "vec_id", vec_col: str = "embedding",
           round_dp: int = 6, concurrency=None) -> ray.data.Dataset:
    """-> (id_col, cluster) after ``iters`` Lloyd iterations from the
    deterministic k-smallest-id seed. Only k×d partials and centroids
    ever leave a task. ``concurrency`` is accepted for API stability
    and ignored (parallelism = ~2·ncpu grouped block tasks)."""
    proj = ds.select_columns([id_col, vec_col]).materialize()
    groups = _task_groups(proj)
    cents = _lloyd(groups, k, iters, id_col, vec_col, round_dp)
    cref = ray.put(cents)
    refs = [_assign_task.remote(cref, id_col, vec_col, False, *g)
            for g in groups]
    return ray.data.from_arrow_refs(refs)


def semdedup(ds: ray.data.Dataset, k: int | None = 8, iters: int = 3,
             tau: float = 0.4, id_col: str = "vec_id",
             vec_col: str = "embedding", round_dp: int = 6,
             concurrency=None, num_partitions: int = 16,
             max_cluster_pairwise: int = 8192,
             rows_per_cluster: int = 1000) -> ray.data.Dataset:
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
    caps).

    ``k=None`` auto-sizes k from the corpus: k = ceil(n /
    ``rows_per_cluster``) (floor 8) — the paper-realistic regime (the
    SemDeDup paper runs k=50,000 on 233M LAION rows ≈ n/4,700; k must
    GROW with the corpus or the per-cluster pairwise term O(n²/k·d)
    dominates: measured on 100k×64d rows, k=8 → 12.5M avg pairwise
    rows² per cluster vs k=100 → 0.08M, an ~18× wall-time drop on the
    dedup pass — see BASELINE.md "SemDeDup auto-k"). The gate pins
    k=fixed for its unrolled-Lloyd oracle; pipelines should prefer
    ``k=None``.

    Determinism contract (what lets the unrolled-Lloyd DuckDB oracle be
    bit-equal): same seed/tie/rounding rules as :func:`kmeans`, cosine =
    dot of float64-normalized rows (matches ``list_inner_product/(na*nb)``
    at the gate's 6-dp rounding), keep-rule ties broken by id order.
    """
    from .dedup import _partition_by
    from .stats import ensure_stats_actor, record_stats
    from .vectors import unpack_u64

    ensure_stats_actor()
    proj = ds.select_columns([id_col, vec_col]).materialize()
    if k is None:
        n_rows = proj.count()   # materialized: metadata-only, no scan
        k = min(n_rows, max(8, -(-n_rows // rows_per_cluster)))
    groups = _task_groups(proj)
    cents = _lloyd(groups, k, iters, id_col, vec_col, round_dp)
    cref = ray.put(cents)
    assigned = ray.data.from_arrow_refs(
        [_assign_task.remote(cref, id_col, vec_col, True, *g)
         for g in groups])

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
        B = 1024  # row-block the pairwise: an n^2 float64 matrix for a
        # 6k-row cluster is ~300 MB; blocks keep it at B*n (~50 MB) and
        # compare each row only against EARLIER rows (incl. dropped
        # ones — SemDeDup drops against any earlier member)
        for s, e in zip(starts, ends):
            n = e - s
            if n < 2:
                continue
            if n > max_cluster_pairwise:
                capped_clusters += 1
                capped_members += int(n - max_cluster_pairwise)
                e = s + max_cluster_pairwise
            for b0 in range(s + 1, e, B):
                b1 = min(b0 + B, e)
                sims = m[b0:b1] @ m[s:b1].T  # (rows b0..b1) x (cols s..b1)
                hit = sims >= tau
                # mask cols at/after each row's own position
                cols = np.arange(s, b1)
                hit &= cols[None, :] < np.arange(b0, b1)[:, None]
                keep[b0:b1] = ~hit.any(axis=1)
        if capped_clusters:
            record_stats("semdedup", capped_clusters=capped_clusters,
                         capped_members=capped_members)
        return pa.table({
            id_col: tbl.column(id_col),
            "cluster": tbl.column("cluster"),
            "keep": pa.array(keep),
        })

    return _partition_by(assigned, ["cluster"], num_partitions).map_groups(
        _pin(per_partition), batch_format="pyarrow")


def cluster_sample(ds: ray.data.Dataset, k: int = 8, iters: int = 3,
                   n_per_cluster: int = 10, id_col: str = "vec_id",
                   vec_col: str = "embedding", round_dp: int = 6,
                   by: str = "id") -> ray.data.Dataset:
    """Diversity sampling: k-means the embedding space, keep
    ``n_per_cluster`` vectors per cluster -> (id_col, cluster) of the
    kept rows. ``by="id"`` keeps each cluster's lowest ids
    (deterministic, oracle-able); ``by="hash"`` keeps the lowest
    ``pd.util.hash_array(id)`` values — a deterministic pseudo-random
    draw (same rule the stratified sampler uses).

    Scale shape: the :func:`kmeans` Lloyd loop (no shuffle), then ONE
    per-task top-n over assignments + a tiny driver merge of k·n
    candidate rows per task group — the corpus never shuffles at all.
    Training-data use: cluster-balanced subsets for diversity-preserving
    downsampling (the SemDeDup paper's "keep one per semantic
    neighborhood", relaxed to n)."""
    if by not in ("id", "hash"):
        raise ValueError("by must be 'id' or 'hash'")
    proj = ds.select_columns([id_col, vec_col]).materialize()
    groups = _task_groups(proj)
    cents = _lloyd(groups, k, iters, id_col, vec_col, round_dp)
    cref = ray.put(cents)

    @ray.remote
    def local_topn(cents_in, *tbls) -> pa.Table:
        from ..streaming.driver import limit_worker_threads

        limit_worker_threads()
        outs = []
        for t in tbls:
            emb = vecs_np(t.column(vec_col))
            a = (_assign(emb, cents_in) if emb.size
                 else np.empty(0, dtype=np.int64))
            ids = t.column(id_col).to_numpy(zero_copy_only=False)
            key = (ids if by == "id" else _sample_hash(ids))
            # per-cluster lowest-n: sort by (cluster, key), take the
            # first n of each cluster segment
            order = np.lexsort((key, a))
            a_s = a[order]
            new = np.ones(len(a_s), dtype=bool)
            new[1:] = a_s[1:] != a_s[:-1]
            seg_start = np.maximum.accumulate(
                np.where(new, np.arange(len(a_s)), 0))
            rank = np.arange(len(a_s)) - seg_start
            keep = order[rank < n_per_cluster]
            outs.append(pa.table({
                id_col: t.column(id_col).take(pa.array(np.sort(keep))),
                "cluster": pa.array(a[np.sort(keep)].astype(np.int64)),
            }))
        return pa.concat_tables(outs, promote_options="permissive")

    parts = [t for t in ray.get(
        [local_topn.remote(cref, *g) for g in groups]) if t.num_rows]
    merged = pa.concat_tables(parts, promote_options="permissive")
    # final top-n per cluster over k*n*len(groups) candidate rows
    cl = merged.column("cluster").to_numpy(zero_copy_only=False)
    ids = merged.column(id_col).to_numpy(zero_copy_only=False)
    key = (ids if by == "id" else _sample_hash(ids))
    order = np.lexsort((key, cl))
    cl_s = cl[order]
    new = np.ones(len(cl_s), dtype=bool)
    new[1:] = cl_s[1:] != cl_s[:-1]
    seg_start = np.maximum.accumulate(np.where(new, np.arange(len(cl_s)), 0))
    rank = np.arange(len(cl_s)) - seg_start
    keep = np.sort(order[rank < n_per_cluster])
    return ray.data.from_arrow(merged.take(pa.array(keep)))


def _sample_hash(ids: np.ndarray) -> np.ndarray:
    import pandas as pd

    return pd.util.hash_array(np.ascontiguousarray(ids),
                              hash_key="ksql_ray_clsampl").astype(np.uint64)
