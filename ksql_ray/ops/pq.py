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
import pyarrow.compute as pc
import ray
import ray.data

from .cluster import _assign, _round_half_away, _seed_centroids, _task_groups
from .vectors import pack_u64_rows, unpack_u64, vecs_np


@ray.remote
def _merge_adc_topk_task(k: int, *blocks: pa.Table) -> pa.Table:
    """All queries' ADC-distance partials (tiny) merged in ONE task:
    segment-sorted (query asc, dist asc, vec_id asc), per-segment rank
    <= k kept — replaces a Ray sort-groupby shuffle over kilobytes."""
    bs = [b for b in blocks if b.num_columns]
    if not bs:
        return pa.table({"query_id": pa.array([], type=pa.int64()),
                         "vec_id": pa.array([], type=pa.int64()),
                         "rank": pa.array([], type=pa.int64())})
    t = pa.concat_tables(bs, promote_options="default")
    qid = t.column("query_id").to_numpy(zero_copy_only=False)
    d = t.column("adc_dist").to_numpy(zero_copy_only=False)
    vid = t.column("vec_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((vid, d, qid))
    qs = qid[order]
    seg = np.zeros(len(qs), dtype=np.int64)
    newseg = np.flatnonzero(np.diff(qs)) + 1
    seg[newseg] = newseg
    np.maximum.accumulate(seg, out=seg)
    rank = np.arange(len(qs), dtype=np.int64) - seg + 1
    keep = rank <= k
    return pa.table({
        "query_id": pa.array(qs[keep], type=pa.int64()),
        "vec_id": pa.array(vid[order][keep], type=pa.int64()),
        "rank": pa.array(rank[keep], type=pa.int64()),
    })


def _merge_adc_topk(partials: "ray.data.Dataset", k: int):
    m = partials.materialize()
    ref = _merge_adc_topk_task.remote(k, *m.to_arrow_refs())
    return ray.data.from_arrow_refs([ref])


__all__ = ["pq_train", "pq_encode", "pq_topk", "ivfpq_build",
           "ivfpq_topk", "sq8_train", "sq8_encode", "sq8_topk"]


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

    return _merge_adc_topk(partials, k)


# ---------------------------------------------------------------------------
# IVF-PQ: coarse quantizer + residual PQ codes, multi-probe ADC search —
# the composition production-scale ANN indexes use (Jégou et al. §V).

@ray.remote
def _ivfpq_sums_task(coarse: np.ndarray, cents: np.ndarray, vec_col: str,
                     *tbls):
    """PQ-training Lloyd partial over RESIDUALS (x − nearest coarse
    centroid): per-subspace scatter-add sums + counts."""
    from ..streaming.driver import limit_worker_threads

    limit_worker_threads()
    m, k, sd = cents.shape
    sums = np.zeros((m * k, sd), dtype=np.float64)
    counts = np.zeros(m * k, dtype=np.int64)
    for t in tbls:
        emb = vecs_np(t.column(vec_col))
        if not emb.size:
            continue
        r = emb - coarse[_assign(emb, coarse)]
        for s in range(m):
            sub = r[:, s * sd:(s + 1) * sd]
            a = _assign(sub, cents[s])
            np.add.at(sums, s * k + a, sub)
            counts[s * k:(s + 1) * k] += np.bincount(a, minlength=k)
    return sums, counts


@ray.remote
def _ivfpq_encode_task(coarse: np.ndarray, cents: np.ndarray, id_col: str,
                       vec_col: str, pack: bool, *tbls) -> pa.Table:
    from ..streaming.driver import limit_worker_threads

    limit_worker_threads()
    m, k, sd = cents.shape
    outs = []
    for t in tbls:
        emb = vecs_np(t.column(vec_col))
        n = t.num_rows
        lists = (np.empty(0, dtype=np.int64) if not emb.size
                 else _assign(emb, coarse))
        codes = np.zeros((n, m), dtype=np.int64)
        if emb.size:
            r = emb - coarse[lists]
            for s in range(m):
                codes[:, s] = _assign(r[:, s * sd:(s + 1) * sd], cents[s])
        cols = {id_col: t.column(id_col),
                "list": pa.array(lists.astype(np.int64))}
        if pack:
            cols["codes"] = pack_u64_rows(codes.astype(np.uint8))
        else:
            for s in range(m):
                cols[f"c{s}"] = pa.array(codes[:, s])
        outs.append(pa.table(cols))
    return pa.concat_tables(outs, promote_options="permissive")


def ivfpq_build(ds: ray.data.Dataset, nlist: int = 64, m: int = 8,
                k: int = 16, coarse_iters: int = 3, pq_iters: int = 2,
                id_col: str = "vec_id", vec_col: str = "embedding",
                round_dp: int = 6, pack: bool = True):
    """-> (codes_ds, coarse, cents): an inverted-file PQ index.

    ``codes_ds`` has one row per vector — (id, list, m-byte residual
    code); ``coarse`` is the (nlist, d) coarse quantizer; ``cents`` the
    (m, k, sub_d) residual codebooks. At 10^10 vectors the index is
    nlist partitions of m-byte codes (~32×+ smaller than the floats);
    build cost is the two Lloyd loops (coarse + residual PQ), all raw
    block tasks (see module docstring). Write ``codes_ds`` partitioned
    by ``list`` for probe-local reads at serving time.
    """
    from .cluster import _lloyd

    proj = ds.select_columns([id_col, vec_col]).materialize()
    groups = _task_groups(proj)
    coarse = _lloyd(groups, nlist, coarse_iters, id_col, vec_col, round_dp)
    d = coarse.shape[1]
    sd = d // m
    _split_subspaces(d, m)  # validates divisibility
    # residual-PQ seed: residuals of the k smallest ids
    seed = _seed_centroids(groups, k, id_col, vec_col)
    rseed = seed - coarse[_assign(seed, coarse)]
    cents = _round_half_away(
        np.stack([rseed[:, s * sd:(s + 1) * sd] for s in range(m)]),
        round_dp)
    cor = ray.put(coarse)
    for _ in range(pq_iters):
        cref = ray.put(cents)
        res = ray.get([_ivfpq_sums_task.remote(cor, cref, vec_col, *g)
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
    cref = ray.put(cents)
    codes_ds = ray.data.from_arrow_refs(
        [_ivfpq_encode_task.remote(cor, cref, id_col, vec_col, pack, *g)
         for g in groups])
    return codes_ds, coarse, cents


def ivfpq_topk(codes_ds: ray.data.Dataset, coarse: np.ndarray,
               cents: np.ndarray, query_ids: list[int],
               query_matrix: np.ndarray, k: int = 10, nprobe: int = 4,
               id_col: str = "vec_id",
               num_partitions: int = 16) -> ray.data.Dataset:
    """-> (query_id, vec_id, rank): multi-probe ADC top-k per query.

    Each query probes its ``nprobe`` nearest coarse lists; the scan
    touches only those lists' code rows (corpus fraction ≈
    nprobe/nlist). Codes are co-located by ONE hash shuffle on
    ``list``; the per-(query, list) ADC lookup tables — built from the
    query's residual against each probed centroid — broadcast once.
    Ranking is (approximate squared L2 asc, vec_id asc); self-matches
    are not excluded (codes carry no raw vectors). The per-partition
    scan loops over (query, probed list) pairs — vectorized over each
    list's rows — so it assumes a BATCH of queries (10s–1000s); for
    query sets beyond that, shard the query matrix and run several
    calls (LUTs are (n_q · nprobe · m · k) doubles and broadcast whole)."""
    from .dedup import _partition_by, _pin

    m, kc, sd = cents.shape
    qm = np.asarray(query_matrix, dtype=np.float64)
    n_q = qm.shape[0]
    d2 = (coarse * coarse).sum(axis=1)[None, :] - 2.0 * (qm @ coarse.T)
    nprobe = min(nprobe, coarse.shape[0])
    probe = np.argpartition(d2, kth=nprobe - 1, axis=1)[:, :nprobe]
    # order probes by distance (then list id) so results are reproducible
    ordp = np.lexsort((probe, np.take_along_axis(d2, probe, axis=1)))
    probe = np.take_along_axis(probe, ordp, axis=1)  # (n_q, nprobe)
    luts = np.zeros((n_q, nprobe, m, kc), dtype=np.float64)
    for j in range(nprobe):
        rq = qm - coarse[probe[:, j]]  # query residual per probed list
        for s in range(m):
            qs = rq[:, s * sd:(s + 1) * sd]
            diff = qs[:, None, :] - cents[s][None, :, :]
            luts[:, j, s, :] = (diff * diff).sum(axis=2)
    bref = ray.put({"ids": np.asarray(query_ids), "probe": probe,
                    "luts": luts})

    def scan(group: pa.Table) -> pa.Table:
        empty = pa.table({
            "query_id": pa.array([], type=pa.int64()),
            "vec_id": pa.array([], type=pa.int64()),
            "adc_dist": pa.array([], type=pa.float64()),
        })
        if group.num_rows == 0:
            return empty
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        b = ray.get(bref) if isinstance(bref, ray.ObjectRef) else bref
        tbl = group.take(pc.sort_indices(group, sort_keys=[
            ("list", "ascending")]))
        lists = tbl.column("list").to_numpy(zero_copy_only=False)
        flat, _ = unpack_u64(tbl.column("codes"), dtype=np.uint8)
        codes = flat.reshape(tbl.num_rows, m).astype(np.int64)
        ids = tbl.column(id_col).to_numpy(zero_copy_only=False)
        out_q, out_v, out_d = [], [], []
        for q in range(len(b["ids"])):
            for j in range(nprobe):
                lo = np.searchsorted(lists, b["probe"][q, j], "left")
                hi = np.searchsorted(lists, b["probe"][q, j], "right")
                if hi == lo:
                    continue
                lut = b["luts"][q, j]  # (m, kc)
                c = codes[lo:hi]
                dist = np.zeros(hi - lo, dtype=np.float64)
                for s in range(m):
                    dist += lut[s, c[:, s]]
                kk = min(k, hi - lo)
                top = np.argpartition(dist, kth=kk - 1)[:kk]
                out_q.append(np.full(kk, b["ids"][q], dtype=np.int64))
                out_v.append(ids[lo:hi][top].astype(np.int64))
                out_d.append(dist[top])
        if not out_q:
            return empty
        return pa.table({
            "query_id": pa.array(np.concatenate(out_q)),
            "vec_id": pa.array(np.concatenate(out_v)),
            "adc_dist": pa.array(np.concatenate(out_d), type=pa.float64()),
        })

    partials = _partition_by(codes_ds, ["list"], num_partitions).map_groups(
        _pin(scan), batch_format="pyarrow")

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

    return _merge_adc_topk(partials, k)


# --------------------------------------------------------------- SQ8
# Scalar (int8) quantization — the simplest vector-compression tier
# (4x over float32 at near-exact recall; faiss's SQ8 / "scalar
# quantizer" baseline). Complements PQ/IVF-PQ above: SQ8 keeps one
# code PER DIMENSION (affine per-dim grid), so reconstruction is a
# vectorized affine map and search needs no codebook training.


def sq8_train(ds: ray.data.Dataset,
              vec_col: str = "embedding") -> tuple[np.ndarray, np.ndarray]:
    """-> (lo, hi) per-dimension float64 bounds. Shape: per-batch
    extrema partials (two d-vectors per batch) folded in one remote
    task — the column itself never moves twice."""
    def partial(b: pa.Table) -> pa.Table:
        m = vecs_np(b.column(vec_col))
        if m.size == 0:
            return pa.table({"lo": pa.array([], type=pa.float64()),
                             "hi": pa.array([], type=pa.float64())})
        return pa.table({
            "lo": pa.array(m.min(axis=0).astype(np.float64)),
            "hi": pa.array(m.max(axis=0).astype(np.float64))})

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()

    @ray.remote
    def fold(*tbls: pa.Table):
        los = [t.column("lo").to_numpy(zero_copy_only=False)
               for t in tbls if t.num_rows]
        his = [t.column("hi").to_numpy(zero_copy_only=False)
               for t in tbls if t.num_rows]
        if not los:
            raise ValueError("no vectors to train SQ8 bounds on")
        return (np.minimum.reduce(los), np.maximum.reduce(his))

    return ray.get(fold.remote(*parts.to_arrow_refs()))


def _sq8_codes(m: np.ndarray, lo: np.ndarray,
               hi: np.ndarray) -> np.ndarray:
    """Affine uint8 grid: floor((x - lo) * 255 / (hi - lo) + 0.5),
    clamped; constant dims (hi == lo) code 0. float64 arithmetic so
    the DuckDB oracle (::DOUBLE casts) replays bit-exactly."""
    span = hi - lo
    safe = np.where(span == 0, 1.0, span)
    c = np.floor((m.astype(np.float64) - lo) * 255.0 / safe + 0.5)
    c = np.where(span == 0, 0.0, np.clip(c, 0, 255))
    return c.astype(np.uint8)


def sq8_encode(ds: ray.data.Dataset, lo: np.ndarray, hi: np.ndarray,
               id_col: str = "vec_id",
               vec_col: str = "embedding") -> ray.data.Dataset:
    """-> (id, code) rows with the d-byte uint8 code packed as one
    binary value per vector (4x smaller than float32; stateless map,
    bounds ride the task closure)."""
    d = len(lo)

    def enc(b: pa.Table) -> pa.Table:
        m = vecs_np(b.column(vec_col))
        if m.size == 0:
            return pa.table({
                id_col: pa.array([], type=pa.int64()),
                "code": pa.array([], type=pa.binary(d))})
        codes = _sq8_codes(m, lo, hi)
        return pa.table({
            id_col: b.column(id_col),
            "code": pa.FixedSizeBinaryArray.from_buffers(
                pa.binary(d), len(codes),
                [None, pa.py_buffer(codes.tobytes())])})

    return ds.map_batches(enc, batch_format="pyarrow",
                          zero_copy_batch=True)


class _SQ8TopK:
    """Actor-pool search: decode each batch's codes with the affine
    map (lo + code * span / 255) and matmul against the broadcast
    query matrix — asymmetric distance (exact queries vs quantized
    corpus), the standard SQ search mode."""

    def __init__(self, bundle_ref, k: int, id_col: str):
        b = ray.get(bundle_ref) if isinstance(bundle_ref, ray.ObjectRef) \
            else bundle_ref
        self.qids = b["ids"]
        self.qm = b["matrix"]          # (n_q, d) float64
        self.lo = b["lo"]
        self.scale = b["scale"]        # span / 255
        self.k = k
        self.id_col = id_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        from .ann import _topk_partial_table

        if batch.num_rows == 0:
            return pa.table({
                "query_id": pa.array([], type=pa.int64()),
                "vec_id": pa.array([], type=pa.int64()),
                "cosine": pa.array([], type=pa.float64())})
        code_col = batch.column("code").combine_chunks()
        d = len(self.lo)
        raw = np.frombuffer(
            code_col.buffers()[1], dtype=np.uint8,
            count=batch.num_rows * d,
            offset=code_col.offset * d).reshape(batch.num_rows, d)
        recon = self.lo + raw.astype(np.float64) * self.scale
        from .vectors import normalize_rows as _norm

        recon = _norm(recon)
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        sims = self.qm @ recon.T
        sims[self.qids[:, None] == ids[None, :]] = -np.inf
        return _topk_partial_table(self.qids, ids, sims, self.k)


def sq8_topk(codes: ray.data.Dataset, query_ids, query_matrix,
             lo: np.ndarray, hi: np.ndarray, k: int = 10,
             id_col: str = "vec_id") -> ray.data.Dataset:
    """-> (query_id, vec_id, rank) top-k per query over the SQ8-coded
    corpus (cosine on reconstructed vectors; rank 1 = best, vec_id
    tiebreak). Same broadcast/partial/merge shape as
    ``ann.brute_force_topk``."""
    from .ann import _merge_topk
    from .vectors import normalize_rows as _norm

    span = (hi - lo).astype(np.float64)
    bundle = ray.put({
        "ids": np.asarray(query_ids, dtype=np.int64),
        "matrix": _norm(np.asarray(query_matrix, dtype=np.float64)),
        "lo": lo.astype(np.float64),
        "scale": np.where(span == 0, 0.0, span) / 255.0,
    })
    partials = codes.map_batches(
        _SQ8TopK,
        fn_constructor_kwargs={"bundle_ref": bundle, "k": k,
                               "id_col": id_col},
        batch_format="pyarrow",
        concurrency=(1, 8),
        max_restarts=0,  # ctor ref in object store + restarts -> ray#53727
    )
    return _merge_topk(partials, k)
