"""Distributed PageRank over an edge table.

Link-graph centrality is a classic corpus-quality signal (crawl-graph
authority feeding document quality scores); ksqlDB has no graph
surface at all (absence verified across /root/reference/ksql/*.go).

Semantics (mirrored verbatim by the gate oracle, SQL-unrollable):
multi-edge PageRank WITHOUT dangling-mass redistribution —

    r_0(n)   = 1 / N
    r_t+1(d) = (1 - a) / N + a * sum over edge rows (s, d) of
               r_t(s) / outdeg(s)

where ``outdeg`` counts edge ROWS (multi-edges weight naturally, so
no global edge dedup — and therefore NO shuffle — is ever needed) and
rank leaving a dangling node simply leaks (sum < 1; the standard
redistribution variant needs a global dangling-mass term every
iteration — omitted to keep the recurrence purely edge-local).

Scale shape (the lesson-#15 iterative pattern — raw tasks over
materialized block refs, never a per-iteration Dataset operator) with
RANK STATE PARTITIONED BY NODE RANGE (round-4: no dense O(N) vector
per task):

1. node codes are contiguous indexes into the sorted node vocabulary;
   partition ``q`` owns the code range ``[q*stride, (q+1)*stride)``,
   so rank / outdeg / weighted state live as P separate object-store
   slices of ~``N/P`` floats each;
2. encode (once): each edge block becomes P objects — the block's
   edges grouped by SRC partition, each internally sorted by DST
   partition with offsets — then one merge task per src partition
   re-emits its edges as P per-(src,dst)-bucket objects plus that
   partition's inverse outdegree slice;
3. each iteration: P tasks compute ``w_q = r_q * inv_q`` (O(N/P)),
   one task per NONEMPTY (q, p) bucket gathers ``w_q[s_local]`` and
   scatters into a dense ``stride``-sized dst slice (O(N/P + E_qp)),
   and P update tasks sum their ≤P contribution slices into
   ``r_p = (1-a)/N + a*Σ_q c_qp`` (O(N/P) each).

Per-task memory is O(N/P + its bucket's edges); the only O(N) objects
are the sorted node vocabulary itself (read-only, built once, shared
zero-copy from the object store for encode and final output — on a
multi-node cluster it replicates per node at 8-16 B/node) — no
per-iteration task ever holds the full rank vector. Empty buckets are
skipped, so per-iteration task count is P + nonempty(q,p) + P ≤
P² + 2P; ``partitions`` defaults to ~1M nodes per slice (clamped to
[4, 256]) and is overridable for cluster-width tuning.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

__all__ = ["pagerank"]


@ray.remote
def _block_nodes(block: pa.Table, src: str, dst: str) -> np.ndarray:
    s = block.column(src).to_numpy(zero_copy_only=False)
    d = block.column(dst).to_numpy(zero_copy_only=False)
    return np.unique(np.concatenate([s, d]))


@ray.remote
def _merge_nodes(*parts: np.ndarray) -> np.ndarray:
    return np.unique(np.concatenate(parts))


@ray.remote
def _encode_block(block: pa.Table, src: str, dst: str,
                  nodes: np.ndarray, stride: int, nparts: int) -> list:
    """Code the block's edges and group them by SRC partition: return
    ``nparts`` objects, each ``(dst_bucket_counts, s_local, d_local)``
    with rows sorted by dst partition (stable, so within-bucket edge
    order stays block order — deterministic float sums downstream)."""
    s = np.searchsorted(nodes, block.column(src).to_numpy(
        zero_copy_only=False)).astype(np.int64)
    d = np.searchsorted(nodes, block.column(dst).to_numpy(
        zero_copy_only=False)).astype(np.int64)
    q, p = s // stride, d // stride
    order = np.argsort(q * nparts + p, kind="stable")
    s, d, q, p = s[order], d[order], q[order], p[order]
    s_local = (s - q * stride).astype(np.int32)
    d_local = (d - p * stride).astype(np.int32)
    counts = np.bincount(q * nparts + p,
                         minlength=nparts * nparts).reshape(nparts,
                                                            nparts)
    offs = np.concatenate([[0], np.cumsum(counts.sum(axis=1))])
    return [(counts[i], s_local[offs[i]:offs[i + 1]],
             d_local[offs[i]:offs[i + 1]]) for i in range(nparts)]


@ray.remote
def _merge_partition(stride: int, n: int, q: int, nparts: int,
                     *parts) -> list:
    """Merge one src partition's per-block groups into per-(q, p)
    bucket objects + the partition's inverse-outdegree slice + bucket
    sizes. Returns ``nparts + 2`` objects (``num_returns``):
    ``bucket_0..bucket_{P-1}, inv_outdeg_q, sizes``."""
    lo = q * stride
    ln = max(0, min(stride, n - lo))
    # P == 1: num_returns=1 delivered the whole single-element group
    # list as one object — unwrap to the (counts, s, d) tuple
    parts = [pt[0] if isinstance(pt, list) else pt for pt in parts]
    # per-dst-partition concat, preserving block order inside a bucket
    buckets = []
    for p in range(nparts):
        ss, dd = [], []
        for counts, s_local, d_local in parts:
            o = np.concatenate([[0], np.cumsum(counts)])
            ss.append(s_local[o[p]:o[p + 1]])
            dd.append(d_local[o[p]:o[p + 1]])
        buckets.append((np.concatenate(ss) if ss else
                        np.array([], np.int32),
                        np.concatenate(dd) if dd else
                        np.array([], np.int32)))
    deg = np.zeros(ln, dtype=np.float64)
    for s_local, _ in buckets:
        deg += np.bincount(s_local, minlength=ln)
    inv = np.where(deg > 0, 1.0 / np.maximum(deg, 1.0), 0.0)
    sizes = np.array([len(b[0]) for b in buckets], dtype=np.int64)
    return buckets + [inv, sizes]


@ray.remote
def _init_rank(stride: int, n: int, p: int) -> np.ndarray:
    ln = max(0, min(stride, n - p * stride))
    return np.full(ln, 1.0 / n)


@ray.remote
def _weighted(r: np.ndarray, inv: np.ndarray) -> np.ndarray:
    return r * inv


@ray.remote
def _bucket_contrib(bucket, weighted: np.ndarray, stride: int, n: int,
                    p: int) -> np.ndarray:
    """One gather-scatter over bucket (q, p): out[d] += (r/outdeg)[s]
    per edge row — both slices are O(N/P)."""
    s_local, d_local = bucket
    ln = max(0, min(stride, n - p * stride))
    out = np.zeros(ln)
    np.add.at(out, d_local, weighted[s_local])
    return out


@ray.remote
def _update(damping: float, n: int, stride: int, p: int,
            *parts: np.ndarray) -> np.ndarray:
    ln = max(0, min(stride, n - p * stride))
    total = np.zeros(ln)
    for part in parts:
        total += part
    return (1.0 - damping) / n + damping * total


@ray.remote
def _rank_table_part(nodes: np.ndarray, r: np.ndarray, stride: int,
                     p: int, node_type: pa.DataType) -> pa.Table:
    sl = nodes[p * stride:(p + 1) * stride]
    return pa.table({"node": pa.array(sl, type=node_type,
                                      from_pandas=True),
                     "rank": pa.array(r, type=pa.float64())})


def pagerank(ds: ray.data.Dataset, src: str, dst: str,
             damping: float = 0.85, iters: int = 3,
             partitions: int | None = None) -> ray.data.Dataset:
    """(node, rank) after ``iters`` synchronous iterations over the
    edge rows of ``ds`` — see the module docstring for the exact
    recurrence and the partitioned-rank scale contract."""
    if not 0.0 < damping < 1.0:
        raise ValueError("damping must be in (0, 1)")
    if iters < 1:
        raise ValueError("iters must be >= 1")
    if partitions is not None and partitions < 1:
        raise ValueError("partitions must be >= 1")
    node_type = ds.schema().base_schema.field(src).type

    blocks = ds.select_columns([src, dst]).materialize().to_arrow_refs()
    nodes_ref = _merge_nodes.remote(
        *[_block_nodes.remote(b, src, dst) for b in blocks])
    n = int(ray.get(ray.remote(lambda a: len(a)).remote(nodes_ref)))
    if n == 0:
        return ray.data.from_arrow(pa.table({
            "node": pa.array([], type=node_type),
            "rank": pa.array([], type=pa.float64())}))
    # ~1M-node slices by default: 8 MB rank state per task, P² ≤ 65k
    # bucket tasks per iteration at 256 partitions
    P = partitions or int(np.clip(-(-n // 1_000_000), 4, 256))
    P = min(P, n)
    stride = -(-n // P)

    grouped = [_encode_block.options(num_returns=P).remote(
        b, src, dst, nodes_ref, stride, P) for b in blocks]
    if P == 1:      # num_returns=1 yields a bare ref, not a list
        grouped = [[g] for g in grouped]
    merged = [_merge_partition.options(num_returns=P + 2).remote(
        stride, n, q, P, *[g[q] for g in grouped]) for q in range(P)]
    buckets = [m[:P] for m in merged]           # buckets[q][p]
    inv = [m[P] for m in merged]
    sizes = ray.get([m[P + 1] for m in merged])  # small (P,) arrays

    r = [_init_rank.remote(stride, n, p) for p in range(P)]
    for _ in range(iters):
        w = [_weighted.remote(r[q], inv[q]) for q in range(P)]
        r = []
        for p in range(P):
            contribs = [_bucket_contrib.remote(
                buckets[q][p], w[q], stride, n, p)
                for q in range(P) if sizes[q][p] > 0]
            r.append(_update.remote(damping, n, stride, p, *contribs))

    refs = [_rank_table_part.remote(nodes_ref, r[p], stride, p,
                                    node_type) for p in range(P)]
    return ray.data.from_arrow_refs(refs)
