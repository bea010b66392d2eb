"""Approximate-nearest-neighbor search over an embedding column.

Two paths (SURVEY-mandated additions for training-data pipelines):

* **Brute-force cosine top-k** (the correctness baseline): the query
  matrix is broadcast ONCE (``ray.put``) and every ``map_batches`` task
  computes one numpy matmul per batch -> per-batch top-k partials; a
  final small merge keeps the global top-k per query. At 100 TB the
  shuffle carries only (query, candidate, score) partials capped at
  k rows per (query, batch).
* **IVF (multi-table sign-LSH) variant** (the scale path): corpus vectors
  are bucketed by ``n_tables`` independent tables of seeded hyperplanes;
  each query probes its own bucket per table (plus optional Hamming-ball
  neighbors), so each batch compares against a corpus fraction. Recall is
  tunable via (n_planes, n_tables, probe_radius); with generous probing
  it converges to the exact answer (pytest + the driver gate pin that
  regime on the fixture).

Embedding columns are decoded zero-copy (FixedSizeList/List flatten ->
reshape, ops.vectors.vecs_np) — never ``to_pylist()`` (a per-row Python
loop, the round-1 bench's weak spot). Both stages are callable CLASSES:
the query broadcast is resolved once per actor in ``__init__``, never
``ray.get`` inside the per-batch path (recorded perf lesson #2).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .vectors import normalize_rows, vecs_np


def _topk_partial_table(qids: np.ndarray, ids: np.ndarray, sims: np.ndarray, k: int) -> pa.Table:
    """Vectorized per-batch partial: top-k columns per query row ->
    (query_id, vec_id, cosine) rows, -inf (masked) entries dropped."""
    n_q, n_b = sims.shape
    k = min(k, n_b)
    if k == 0:
        return pa.table({
            "query_id": pa.array([], type=pa.int64()),
            "vec_id": pa.array([], type=pa.int64()),
            "cosine": pa.array([], type=pa.float64()),
        })
    top = np.argpartition(-sims, kth=k - 1, axis=1)[:, :k]
    rows = np.repeat(np.arange(n_q), k)
    cols = top.reshape(-1)
    vals = sims[rows, cols]
    keep = np.isfinite(vals)
    return pa.table({
        "query_id": pa.array(np.asarray(qids)[rows[keep]].astype(np.int64)),
        "vec_id": pa.array(ids[cols[keep]].astype(np.int64)),
        "cosine": pa.array(vals[keep], type=pa.float64()),
    })


class BruteForceTopK:
    """Actor-pool map_batches stage: query matrix fetched once per actor
    (__init__), one matmul per batch (__call__)."""

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.qids = np.asarray(q["ids"])
        self.qm = q["matrix"]  # already normalized, (n_q, dim)
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = vecs_np(batch.column(self.vec_col))
        if emb.size == 0:
            return pa.table({
                "query_id": pa.array([], type=pa.int64()),
                "vec_id": pa.array([], type=pa.int64()),
                "cosine": pa.array([], type=pa.float64()),
            })
        emb = normalize_rows(emb)
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        sims = self.qm @ emb.T  # (n_q, n_batch)
        # mask self-matches, vectorized
        self_mask = self.qids[:, None] == ids[None, :]
        sims[self_mask] = -np.inf
        return _topk_partial_table(self.qids, ids, sims, self.k)


@ray.remote
def _merge_topk_task(k: int, *blocks: pa.Table) -> pa.Table:
    """All queries' per-batch top-k partials (tiny: batches x queries
    x k rows) merged in ONE task: segment-sorted (query asc, cosine
    desc, vec_id asc), per-segment rank, rank <= k kept. Replaces a
    Ray sort-groupby shuffle over kilobytes."""
    bs = [b for b in blocks if b.num_columns]
    if not bs:
        return pa.table({"query_id": pa.array([], type=pa.int64()),
                         "vec_id": pa.array([], type=pa.int64()),
                         "rank": pa.array([], type=pa.int64())})
    t = pa.concat_tables(bs, promote_options="default")
    qid = t.column("query_id").to_numpy(zero_copy_only=False)
    cos = t.column("cosine").to_numpy(zero_copy_only=False)
    vid = t.column("vec_id").to_numpy(zero_copy_only=False)
    order = np.lexsort((vid, -cos, qid))
    qs = qid[order]
    seg_start = np.zeros(len(qs), dtype=np.int64)
    new = np.flatnonzero(np.diff(qs)) + 1
    seg_start[new] = new
    np.maximum.accumulate(seg_start, out=seg_start)
    rank = np.arange(len(qs), dtype=np.int64) - seg_start + 1
    keep = rank <= k
    return pa.table({
        "query_id": pa.array(qs[keep], type=pa.int64()),
        "vec_id": pa.array(vid[order][keep], type=pa.int64()),
        "rank": pa.array(rank[keep], type=pa.int64()),
    })


def _merge_topk(partials: ray.data.Dataset, k: int) -> ray.data.Dataset:
    m = partials.materialize()
    ref = _merge_topk_task.remote(k, *m.to_arrow_refs())
    return ray.data.from_arrow_refs([ref])


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
    qref = ray.put({
        "ids": np.asarray(query_ids),
        "matrix": normalize_rows(np.asarray(query_matrix, dtype=np.float64)),
    })
    partials = ds.map_batches(
        BruteForceTopK,
        fn_constructor_kwargs={"queries_ref": qref, "k": k, "id_col": id_col, "vec_col": vec_col},
        batch_format="pyarrow",
        concurrency=(1, 8),
        max_restarts=0,  # ctor args in object store + restarts -> ray#53727 warning
    )
    return _merge_topk(partials, k)


class IVFTopK:
    """Actor-pool probe stage. __init__ resolves the broadcast query
    bundle and precomputes, per LSH table, the bucket -> query-indices
    probe map (each query probes its own bucket plus the Hamming ball of
    ``probe_radius``). __call__ buckets the batch per table and matmuls
    each probed subset."""

    def __init__(self, queries_ref, k: int, id_col: str, vec_col: str,
                 n_planes: int, n_tables: int, probe_radius: int, seed: int):
        q = ray.get(queries_ref) if isinstance(queries_ref, ray.ObjectRef) else queries_ref
        self.qids = np.asarray(q["ids"])
        self.qm = q["matrix"]
        self.k = k
        self.id_col = id_col
        self.vec_col = vec_col
        self.n_planes = n_planes
        self.n_tables = n_tables
        dim = self.qm.shape[1]
        rng = np.random.default_rng(seed)
        self.planes = rng.standard_normal((dim, n_tables * n_planes))
        shifts = np.arange(n_planes, dtype=np.uint64)
        qsigns = (self.qm @ self.planes > 0).astype(np.uint64).reshape(
            len(self.qids), n_tables, n_planes
        )
        qb = (qsigns << shifts).sum(axis=2, dtype=np.uint64)  # (n_q, n_tables)
        # Hamming-ball probe masks per table
        balls = [np.uint64(0)]
        if probe_radius >= 1:
            balls += [np.uint64(1) << np.uint64(j) for j in range(n_planes)]
        if probe_radius >= 2:
            balls += [
                (np.uint64(1) << np.uint64(i)) | (np.uint64(1) << np.uint64(j))
                for i in range(n_planes) for j in range(i + 1, n_planes)
            ]
        self.by_table: list[dict[int, np.ndarray]] = []
        for t in range(n_tables):
            m: dict[int, list[int]] = {}
            for qi in range(len(self.qids)):
                for d in balls:
                    m.setdefault(int(qb[qi, t] ^ d), []).append(qi)
            self.by_table.append({b: np.array(v) for b, v in m.items()})

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = vecs_np(batch.column(self.vec_col))
        outs = []
        if emb.size:
            emb = normalize_rows(emb)
            ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
            n = len(ids)
            signs = (emb @ self.planes > 0).astype(np.uint64).reshape(
                n, self.n_tables, self.n_planes
            )
            shifts = np.arange(self.n_planes, dtype=np.uint64)
            vb = (signs << shifts).sum(axis=2, dtype=np.uint64)  # (n, n_tables)
            # a (query, vector) pair may collide in several tables; compare once
            seen = np.zeros((len(self.qids), n), dtype=bool)
            for t in range(self.n_tables):
                probe_map = self.by_table[t]
                col = vb[:, t]
                order = np.argsort(col, kind="stable")
                sorted_b = col[order]
                uniq, starts = np.unique(sorted_b, return_index=True)
                bounds = np.concatenate((starts, [n]))
                for u_idx, b in enumerate(uniq):
                    qidx = probe_map.get(int(b))
                    if qidx is None:
                        continue
                    rows = order[bounds[u_idx] : bounds[u_idx + 1]]
                    fresh = ~seen[np.ix_(qidx, rows)]
                    if not fresh.any():
                        continue
                    seen[np.ix_(qidx, rows)] = True
                    sims = self.qm[qidx] @ emb[rows].T
                    sims[~fresh] = -np.inf
                    sims[self.qids[qidx][:, None] == ids[rows][None, :]] = -np.inf
                    outs.append(_topk_partial_table(self.qids[qidx], ids[rows], sims, self.k))
        nonempty = [t for t in outs if t.num_rows]
        if not nonempty:
            return pa.table({
                "query_id": pa.array([], type=pa.int64()),
                "vec_id": pa.array([], type=pa.int64()),
                "cosine": pa.array([], type=pa.float64()),
            })
        return pa.concat_tables(nonempty)


def ivf_topk(
    ds: ray.data.Dataset,
    query_ids: list[int],
    query_matrix: np.ndarray,
    k: int = 10,
    n_planes: int = 6,
    n_tables: int = 1,
    probe_radius: int = 1,
    seed: int = 42,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
) -> ray.data.Dataset:
    """Scale path: multi-table sign-LSH bucket both corpus and queries;
    compare only within probed buckets (approximate — recall tunable via
    n_planes / n_tables / probe_radius, see IVFTopK)."""
    qref = ray.put({
        "ids": np.asarray(query_ids),
        "matrix": normalize_rows(np.asarray(query_matrix, dtype=np.float64)),
    })
    partials = ds.map_batches(
        IVFTopK,
        fn_constructor_kwargs={
            "queries_ref": qref, "k": k, "id_col": id_col, "vec_col": vec_col,
            "n_planes": n_planes, "n_tables": n_tables,
            "probe_radius": probe_radius, "seed": seed,
        },
        batch_format="pyarrow",
        concurrency=(1, 8),
        max_restarts=0,  # ctor args in object store + restarts -> ray#53727 warning
    )
    return _merge_topk(partials, k)


@ray.remote
def _anchor_bundle(id_col: str, label_col: str, vec_col: str,
                   anchor_ids, *blocks: pa.Table) -> dict:
    t = pa.concat_tables([b for b in blocks if b.num_rows],
                         promote_options="default")
    ids = t.column(id_col).to_numpy(zero_copy_only=False)
    if anchor_ids is not None:
        keep = np.isin(ids, np.asarray(anchor_ids))
        t = t.filter(pa.array(keep))
        ids = ids[keep]
    return {
        "ids": ids.astype(np.int64),
        "labels": t.column(label_col).to_numpy(zero_copy_only=False),
        "matrix": normalize_rows(vecs_np(t.column(vec_col))),
    }


class _HardNegTopK:
    """Actor-pool stage: anchor bundle resolved once per actor; one
    matmul per batch; same-id and SAME-LABEL candidates masked out."""

    def __init__(self, bundle_ref, k: int, id_col: str, vec_col: str,
                 label_col: str):
        b = ray.get(bundle_ref) if isinstance(bundle_ref, ray.ObjectRef) \
            else bundle_ref
        self.qids = b["ids"]
        self.qlabels = b["labels"]
        self.qm = b["matrix"]
        self.k, self.id_col, self.vec_col, self.label_col = \
            k, id_col, vec_col, label_col

    def __call__(self, batch: pa.Table) -> pa.Table:
        emb = vecs_np(batch.column(self.vec_col))
        if emb.size == 0:
            return pa.table({
                "query_id": pa.array([], type=pa.int64()),
                "vec_id": pa.array([], type=pa.int64()),
                "cosine": pa.array([], type=pa.float64())})
        emb = normalize_rows(emb)
        ids = batch.column(self.id_col).to_numpy(zero_copy_only=False)
        labels = batch.column(self.label_col).to_numpy(
            zero_copy_only=False)
        sims = self.qm @ emb.T
        mask = (self.qids[:, None] == ids[None, :]) | \
               (self.qlabels[:, None] == labels[None, :])
        # SQL three-valued `label <> label`: a NULL label matches
        # nothing, so NULL-label rows are neither anchors-with-results
        # nor negatives (NaN != NaN would silently pair them with
        # everyone instead)
        import pandas as pd

        q_na = pd.isna(self.qlabels)
        b_na = pd.isna(labels)
        if q_na.any() or b_na.any():
            mask |= q_na[:, None] | b_na[None, :]
        sims[mask] = -np.inf
        return _topk_partial_table(self.qids, ids, sims, self.k)


def mine_hard_negatives(
    ds: ray.data.Dataset,
    k: int = 5,
    id_col: str = "vec_id",
    vec_col: str = "embedding",
    label_col: str = "label",
    anchor_ids: list[int] | None = None,
) -> ray.data.Dataset:
    """Contrastive hard-negative mining: for each anchor vector, the k
    nearest-by-cosine vectors with a DIFFERENT label -> (anchor_id,
    neg_id, rank) with rank 1 = hardest (cosine desc, neg_id asc ties).
    The standard batch-mining pass for embedding/reranker training
    (e.g. Xiong et al. 2021 ANCE): negatives near the decision boundary
    carry the gradient signal that random negatives don't.

    Scale shape: the anchor bundle (ids, labels, normalized matrix) is
    assembled in ONE remote task from the materialized blocks and
    broadcast once per actor; the corpus streams through a matmul per
    batch with per-batch top-k partials (k rows per anchor per batch on
    the wire), one small merge task at the end. The bundle is
    O(n_anchors x dim): mine minibatches via ``anchor_ids`` (the
    training-loop usage) at 10^9-vector scale, or route through
    ``ivf_topk`` buckets first; the full-corpus form here is the
    exact, oracle-checkable baseline."""
    sel = ds.select_columns([id_col, label_col, vec_col])
    m = sel.materialize()
    bref = _anchor_bundle.remote(id_col, label_col, vec_col,
                                 anchor_ids, *m.to_arrow_refs())
    partials = m.map_batches(
        _HardNegTopK,
        fn_constructor_kwargs={"bundle_ref": bref, "k": k,
                               "id_col": id_col, "vec_col": vec_col,
                               "label_col": label_col},
        batch_format="pyarrow",
        concurrency=(1, 8),
        max_restarts=0,  # ctor ref in object store + restarts -> ray#53727
    )
    out = _merge_topk(partials, k)
    return out.map_batches(
        lambda b: b.rename_columns(["anchor_id", "neg_id", "rank"]),
        batch_format="pyarrow", zero_copy_batch=True)
