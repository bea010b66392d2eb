"""Product quantization (PQ) over an embedding column — train, encode,
and ADC top-k search (Jégou et al., "Product Quantization for Nearest
Neighbor Search", TPAMI 2011).

At 10^10+ vectors the raw float corpus does not fit a cluster's RAM;
PQ stores each vector as ``m`` one-byte codes (one k-means codebook per
contiguous subspace) for a 32×+ compression, and search scans codes
with a per-query lookup table (asymmetric distance computation — ADC)
instead of float matmuls. This composes with the IVF path in
``ops/ann.py`` (coarse quantizer → PQ-compressed residual scan) the way
production IVF-PQ indexes do.

The reference ksql builder has no vector surface (absence verified
across /root/reference/ksql/*.go); this is part of the engine's
training-data extension set.

Scale shape:

* **train** is the :mod:`ops.cluster` broadcast/partial-reduce Lloyd
  loop run over ALL ``m`` subspaces at once — one pass per iteration
  (not per subspace), each task emitting an (m·k, sub_d+1) partial;
* **encode** is one stateless pass of raw block tasks: m small
  matmuls per task, codes out — corpus floats never cross the wire;
* **search** broadcasts the (n_q, m, k) ADC lookup tables once
  (``ray.put``, resolved per actor in ``__init__``), per batch gathers
  LUT[s, code] and sums over s (pure numpy fancy-indexing), emits
  per-batch top-k partials capped at k rows per query.

Determinism contract (mirrors :func:`ops.cluster.kmeans`, which is what
lets the per-subspace unrolled-Lloyd DuckDB oracle be bit-equal):
per-subspace seeds are the sub-vectors of the k smallest ids, distance
ties break to the lowest code, centroid updates round half-away-from-
zero to ``round_dp`` decimals, empty cells keep their previous centroid.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .cluster import _assign, _round_half_away, _seed_centroids, _task_groups
from .vectors import pack_u64_rows, unpack_u64, vecs_np

__all__ = ["pq_train", "pq_encode", "pq_topk"]


def _split_subspaces(d: int, m: int) -> list[tuple[int, int]]:
    if d % m:
        raise ValueError(f"pq: dim {d} not divisible by m={m}")
    sd = d // m
    return [(s * sd, (s + 1) * sd) for s in range(m)]


@ray.remote
def _pq_sums_task(cents: np.ndarray, vec_col: str, *tbls):
    """One Lloyd partial per task covering every subspace: per-subspace
    scatter-add sums + counts (raw task over materialized block refs —
    same rationale as ops.cluster._sums_task)."""
    from ..streaming.driver import limit_worker_threads

    limit_worker_threads()
    m, k, sd = cents.shape
    sums = np.zeros((m * k, sd), dtype=np.float64)
    counts = np.zeros(m * k, dtype=np.int64)
    for t in tbls:
        emb = vecs_np(t.column(vec_col))
        if emb.size:
            for s in range(m):
                sub = emb[:, s * sd:(s + 1) * sd]
                a = _assign(sub, cents[s])
                np.add.at(sums, s * k + a, sub)
                counts[s * k:(s + 1) * k] += np.bincount(a, minlength=k)
    return sums, counts


def pq_train(ds: ray.data.Dataset, m: int = 8, k: int = 16,
             iters: int = 2, id_col: str = "vec_id",
             vec_col: str = "embedding", round_dp: int = 4,
             concurrency=(1, 8)) -> np.ndarray:
    """-> (m, k, sub_d) float64 codebooks. ``concurrency`` is accepted
    for API stability and ignored (parallelism = ~2·ncpu block tasks)."""
    # materialized: Lloyd is multi-pass (perf lesson #10)
    proj = ds.select_columns([id_col, vec_col]).materialize()
    groups = _task_groups(proj)
    seed = _seed_centroids(groups, k, id_col, vec_col)  # (k, d)
    d = seed.shape[1]
    spans = _split_subspaces(d, m)
    sd = d // m
    cents = _round_half_away(
        np.stack([seed[:, lo:hi] for lo, hi in spans]), round_dp)  # (m,k,sd)

    for _ in range(iters):
        cref = ray.put(cents)
        res = ray.get([_pq_sums_task.remote(cref, vec_col, *g)
                       for g in groups])
        sums = np.zeros((m * k, sd), dtype=np.float64)
        counts = np.zeros(m * k, dtype=np.int64)
        for su, n in res:
            sums += su
            counts += n
        flatc = cents.reshape(m * k, sd).copy()
        nonempty = counts > 0
        flatc[nonempty] = _round_half_away(
            sums[nonempty] / counts[nonempty, None], round_dp)
        cents = flatc.reshape(m, k, sd)
    return cents


@ray.remote
def _pq_encode_task(cents: np.ndarray, id_col: str, vec_col: str,
                    pack: bool, *tbls) -> pa.Table:
    from ..streaming.driver import limit_worker_threads

    limit_worker_threads()
    m, k, sd = cents.shape
    outs = []
    for t in tbls:
        emb = vecs_np(t.column(vec_col))
        n = t.num_rows
        codes = np.zeros((n, m), dtype=np.int64)
        if emb.size:
            for s in range(m):
                codes[:, s] = _assign(emb[:, s * sd:(s + 1) * sd], cents[s])
        cols = {id_col: t.column(id_col)}
        if pack:
            cols["codes"] = pack_u64_rows(codes.astype(np.uint8))
        else:
            for s in range(m):
                cols[f"c{s}"] = pa.array(codes[:, s])
        outs.append(pa.table(cols))
    return pa.concat_tables(outs, promote_options="permissive")


def pq_encode(ds: ray.data.Dataset, cents: np.ndarray,
              id_col: str = "vec_id", vec_col: str = "embedding",
              pack: bool = True, concurrency=(1, 8)) -> ray.data.Dataset:
    """-> (id_col, codes) with codes a packed per-vector byte string
    (``pack=True``, the storage form: m bytes/vector), or m int64
    columns ``c0..c{m-1}`` (``pack=False``, the oracle-comparable
    form)."""
    m, k, sd = cents.shape
    if pack and k > 256:
        raise ValueError("pq: packed codes need k <= 256")
    cref = ray.put(cents)
    proj = ds.select_columns([id_col, vec_col]).materialize()
    groups = _task_groups(proj)
    return ray.data.from_arrow_refs(
        [_pq_encode_task.remote(cref, id_col, vec_col, pack, *g)
         for g in groups])


class _ADCTopK:
    """Actor-pool scan over PACKED code rows: LUT gathers + row sums,
    per-batch top-k partials (smallest approximate distance first)."""

    def __init__(self, lut_ref, k: int, id_col: str):
        from ..streaming.driver import limit_worker_threads

        limit_worker_threads()
        q = ray.get(lut_ref) if isinstance(lut_ref, ray.ObjectRef) else lut_ref
        self.qids = q["ids"]          # (n_q,)
        self.lut = q["lut"]           # (n_q, m, k) squared distances
        self.k = k
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        empty = pa.table({
            "query_id": pa.array([], type=pa.int64()),
            "vec_id": pa.array([], type=pa.int64()),
            "adc_dist": pa.array([], type=pa.float64()),
        })
        if batch.num_rows == 0:
            return empty
        flat, counts = unpack_u64(batch.column("codes"), dtype=np.uint8)
        n_q, m, k = self.lut.shape
        codes = flat.reshape(batch.num_rows, m).astype(np.int64)
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        # dist[q, x] = sum_s lut[q, s, codes[x, s]] — one fancy-indexed
        # gather per subspace, accumulated in place
        dist = np.zeros((n_q, len(ids)), dtype=np.float64)
        for s in range(m):
            dist += self.lut[:, s, codes[:, s]]
        kk = min(self.k, len(ids))
        top = np.argpartition(dist, kth=kk - 1, axis=1)[:, :kk]
        rows = np.repeat(np.arange(n_q), kk)
        cols = top.reshape(-1)
        return pa.table({
            "query_id": pa.array(self.qids[rows].astype(np.int64)),
            "vec_id": pa.array(ids[cols].astype(np.int64)),
            "adc_dist": pa.array(dist[rows, cols], type=pa.float64()),
        })


def pq_topk(codes_ds: ray.data.Dataset, cents: np.ndarray,
            query_ids: list[int], query_matrix: np.ndarray,
            k: int = 10, id_col: str = "vec_id") -> ray.data.Dataset:
    """-> (query_id, vec_id, rank): ADC top-k per query over PACKED
    codes (``pq_encode(pack=True)``), smallest approximate squared L2
    first, vec_id asc tiebreak. Self-matches are not excluded (codes
    carry no raw vectors to compare against)."""
    m, kc, sd = cents.shape
    qm = np.asarray(query_matrix, dtype=np.float64)
    n_q = qm.shape[0]
    lut = np.zeros((n_q, m, kc), dtype=np.float64)
    for s in range(m):
        qs = qm[:, s * sd:(s + 1) * sd]               # (n_q, sd)
        diff = qs[:, None, :] - cents[s][None, :, :]  # (n_q, k, sd)
        lut[:, s, :] = (diff * diff).sum(axis=2)
    lref = ray.put({"ids": np.asarray(query_ids), "lut": lut})
    partials = codes_ds.map_batches(
        _ADCTopK, fn_constructor_kwargs={"lut_ref": lref, "k": k,
                                         "id_col": id_col},
        batch_format="pyarrow", concurrency=(1, 8), max_restarts=0)

    def merge(group: pa.Table) -> pa.Table:
        qid = group.column("query_id")[0].as_py()
        d = group.column("adc_dist").to_numpy(zero_copy_only=False)
        vid = group.column("vec_id").to_numpy(zero_copy_only=False)
        order = np.lexsort((vid, d))[:k]
        return pa.table({
            "query_id": pa.array([qid] * len(order), type=pa.int64()),
            "vec_id": pa.array(vid[order], type=pa.int64()),
            "rank": pa.array(np.arange(1, len(order) + 1), type=pa.int64()),
        })

    return partials.groupby("query_id").map_groups(
        merge, batch_format="pyarrow")
