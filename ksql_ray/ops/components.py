"""Duplicate-cluster resolution: distributed connected components.

The near-dup ops (``minhash_dedup_pairs`` / ``ngram_jaccard_pairs`` /
``simhash_pairs`` / ``embedding_neardup_pairs``) emit *pairs*. Batch
dedup pipelines resolve those pairs into clusters — transitively: if
A~B and B~C then A,B,C are one duplicate group even when A~C was never
scored — and keep one canonical doc per cluster. This module implements
that resolution as the alternating **large-star / small-star** algorithm
(Kiveris et al., "Connected Components in MapReduce and Beyond", SoCC
2014): each phase is ONE hash shuffle of the edge set + a vectorized
per-partition segment reduction, and the edge set converges to depth-1
stars rooted at each component's minimum node id in O(log^2 n) rounds
(2-3 rounds in practice for LSH pair graphs, whose components are
near-stars already).

Scale shape: only (int64, int64) edge pairs ever move — never text or
signatures — and the edge set is tiny relative to the corpus (pairs
above a near-dup threshold). Each round materializes the new edge set
(perf lesson #10: a Dataset consumed twice re-executes its lineage) and
reads back ONE int64 change counter; the driver holds no edges.

Node ids must be integers (doc ids are). String ids need a dictionary
pass first; that is a deliberate non-goal here.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray.data

from .dedup import _pin


def _canon_edges_fn(a: str, b: str):
    """(a, b) pairs -> canonical (p, c) int64 edges with p < c, self
    loops dropped, per-batch deduped."""

    @_pin
    def canon(batch: pa.Table) -> pa.Table:
        u = batch.column(a).combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        v = batch.column(b).combine_chunks().to_numpy(zero_copy_only=False).astype(np.int64)
        p = np.minimum(u, v)
        c = np.maximum(u, v)
        keep = p != c
        p, c = p[keep], c[keep]
        p, c = _dedupe_edges(p, c)
        return pa.table({"p": p, "c": c, "chg": np.zeros(len(p), dtype=np.int64)})

    return canon


def _dedupe_edges(p: np.ndarray, c: np.ndarray) -> tuple[np.ndarray, np.ndarray]:
    """Drop duplicate (p, c) rows. One structured-view np.unique — no
    Python pairs, no lexsort (perf lesson #11)."""
    if len(p) == 0:
        return p, c
    pairs = np.empty(len(p), dtype=[("p", "<i8"), ("c", "<i8")])
    pairs["p"], pairs["c"] = p, c
    uniq = np.unique(pairs)
    return uniq["p"].copy(), uniq["c"].copy()


def _segments(keys: np.ndarray) -> tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Sort order + segment starts + sizes for one int64 key array."""
    order = np.argsort(keys, kind="stable")
    s = keys[order]
    starts = np.flatnonzero(np.r_[True, s[1:] != s[:-1]])
    sizes = np.diff(np.r_[starts, len(s)])
    return order, starts, sizes


def _large_star(group: pa.Table) -> pa.Table:
    """large-star(u): for every node u, connect each strictly-larger
    neighbor v to m = min(N(u) + {u}). Input is the mirrored adjacency
    (x node, y neighbor) of one hash partition."""
    x = group.column("x").combine_chunks().to_numpy(zero_copy_only=False)
    y = group.column("y").combine_chunks().to_numpy(zero_copy_only=False)
    if len(x) == 0:
        return pa.table({"p": x, "c": x, "chg": x})
    order, starts, sizes = _segments(x)
    x, y = x[order], y[order]
    m = np.minimum(np.minimum.reduceat(y, starts), x[starts])
    m_row = np.repeat(m, sizes)
    mask = y > x
    p, c = m_row[mask], y[mask]
    changed = int(np.count_nonzero(p != x[mask]))
    p, c = _dedupe_edges(p, c)
    chg = np.zeros(len(p), dtype=np.int64)
    if len(chg):
        chg[0] = changed
    return pa.table({"p": p, "c": c, "chg": chg})


def _small_star(group: pa.Table) -> pa.Table:
    """small-star(c): each child c with parent set P (all < c by the
    p < c invariant) rewires P + {c} onto m = min(P). Input is the
    un-mirrored (p, c) edge set of one hash partition grouped by c."""
    p = group.column("p").combine_chunks().to_numpy(zero_copy_only=False)
    c = group.column("c").combine_chunks().to_numpy(zero_copy_only=False)
    if len(p) == 0:
        return pa.table({"p": p, "c": c, "chg": p})
    order, starts, sizes = _segments(c)
    p, c = p[order], c[order]
    m = np.minimum.reduceat(p, starts)
    m_row = np.repeat(m, sizes)
    rewire = p != m_row  # parents other than the min get re-parented
    out_p = np.concatenate([m, m_row[rewire]])
    out_c = np.concatenate([c[starts], p[rewire]])
    changed = int(np.count_nonzero(rewire))
    out_p, out_c = _dedupe_edges(out_p, out_c)
    chg = np.zeros(len(out_p), dtype=np.int64)
    if len(chg):
        chg[0] = changed
    return pa.table({"p": out_p, "c": out_c, "chg": chg})


def _shuffled(ds: ray.data.Dataset, key: str, num_partitions: int):
    """Hash-partition an edge dataset by one int64 column and hand WHOLE
    partitions to the star fn (millions of per-key map_groups calls
    would be all overhead — same reasoning as dedup._partition_by)."""
    from ..exec.groupby import hash_partition_ids

    @_pin
    def add_part(batch: pa.Table) -> pa.Table:
        part = hash_partition_ids(batch, [key], num_partitions)
        return batch.append_column("__part", pa.array(part, type=pa.int64()))

    from .dedup import _Partitioned

    return _Partitioned(
        ds.map_batches(add_part, batch_format="pyarrow",
                       zero_copy_batch=True),
        num_partitions)


def _mirror(batch: pa.Table) -> pa.Table:
    """(p, c) -> both-direction adjacency rows (x, y)."""
    p = batch.column("p").combine_chunks().to_numpy(zero_copy_only=False)
    c = batch.column("c").combine_chunks().to_numpy(zero_copy_only=False)
    return pa.table({"x": np.concatenate([p, c]), "y": np.concatenate([c, p])})


def connected_components(pairs: ray.data.Dataset, a: str = "doc_a",
                         b: str = "doc_b", num_partitions: int = 16,
                         max_rounds: int = 64) -> ray.data.Dataset:
    """Pairs (a, b) -> (node, cluster_id) for every node that appears in
    at least one pair; ``cluster_id`` is the minimum node id of the
    node's connected component (so roots map to themselves). Nodes in no
    pair are absent — ``dedup_by_components`` fills those in.

    Alternates large-star / small-star until a full round rewires zero
    edges; each phase shuffles (int64, int64) edges once. ``max_rounds``
    is a diverged-input backstop (the algorithm provably converges in
    O(log^2 n) rounds), not a silent cap: hitting it raises.
    """
    edges = pairs.map_batches(_canon_edges_fn(a, b), batch_format="pyarrow",
                              zero_copy_batch=True).materialize()
    if edges.count() == 0:
        return ray.data.from_arrow(pa.table(
            {"node": pa.array([], pa.int64()), "cluster_id": pa.array([], pa.int64())}))

    for _ in range(max_rounds):
        mirrored = edges.map_batches(_pin(_mirror), batch_format="pyarrow",
                                     zero_copy_batch=True)
        edges = _shuffled(mirrored, "x", num_partitions).map_groups(
            _pin(_large_star), batch_format="pyarrow").materialize()
        changed_l = edges.sum("chg") or 0
        edges = _shuffled(edges, "c", num_partitions).map_groups(
            _pin(_small_star), batch_format="pyarrow").materialize()
        changed_s = edges.sum("chg") or 0
        if changed_l + changed_s == 0:
            break
    else:
        raise RuntimeError(
            f"connected_components did not converge in {max_rounds} rounds")

    @_pin
    def star_to_labels(batch: pa.Table) -> pa.Table:
        p = batch.column("p").combine_chunks().to_numpy(zero_copy_only=False)
        c = batch.column("c").combine_chunks().to_numpy(zero_copy_only=False)
        # children + roots; roots repeat across edges -> dedupe per batch,
        # then once more per node-partition below (a root's edges can
        # straddle blocks)
        node = np.concatenate([c, p])
        lbl = np.concatenate([p, p])
        uniq, idx = np.unique(node, return_index=True)
        return pa.table({"node": uniq, "cluster_id": lbl[idx]})

    @_pin
    def dedupe_nodes(group: pa.Table) -> pa.Table:
        node = group.column("node").combine_chunks().to_numpy(zero_copy_only=False)
        lbl = group.column("cluster_id").combine_chunks().to_numpy(zero_copy_only=False)
        uniq, idx = np.unique(node, return_index=True)
        return pa.table({"node": uniq, "cluster_id": lbl[idx]})

    labels = edges.map_batches(star_to_labels, batch_format="pyarrow",
                               zero_copy_batch=True)
    return _shuffled(labels, "node", num_partitions).map_groups(
        dedupe_nodes, batch_format="pyarrow")


def dedup_by_components(docs: ray.data.Dataset, pairs: ray.data.Dataset,
                        id_col: str = "doc_id", a: str = "doc_a",
                        b: str = "doc_b",
                        num_partitions: int = 16) -> ray.data.Dataset:
    """-> (id_col, cluster_id, is_canonical) for EVERY doc: transitive
    near-dup clusters from the pair set, singletons mapped to
    themselves, ``is_canonical`` true iff the doc is its cluster's
    minimum id (the row a keep-one-per-cluster filter retains).

    The doc<->label join is a side-tagged union + ONE hash shuffle on
    the id (the asof-join shape), not a broadcast: at corpus scale the
    label map can itself be large.
    """
    cc = connected_components(pairs, a=a, b=b, num_partitions=num_partitions)

    @_pin
    def tag_docs(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        return pa.table({"node": ids, "cluster_id": np.zeros(len(ids), np.int64),
                         "__tag": np.zeros(len(ids), np.int8)})

    @_pin
    def tag_labels(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("node"),
                         "cluster_id": batch.column("cluster_id"),
                         "__tag": np.ones(batch.num_rows, np.int8)})

    tagged = docs.map_batches(tag_docs, batch_format="pyarrow",
                              zero_copy_batch=True).union(
        cc.map_batches(tag_labels, batch_format="pyarrow", zero_copy_batch=True))

    @_pin
    def resolve(group: pa.Table) -> pa.Table:
        node = group.column("node").combine_chunks().to_numpy(zero_copy_only=False)
        lbl = group.column("cluster_id").combine_chunks().to_numpy(zero_copy_only=False)
        tag = group.column("__tag").combine_chunks().to_numpy(zero_copy_only=False)
        doc_ids = node[tag == 0]
        lnode, llbl = node[tag == 1], lbl[tag == 1]
        order = np.argsort(lnode, kind="stable")
        lnode, llbl = lnode[order], llbl[order]
        pos = np.searchsorted(lnode, doc_ids)
        found = (pos < len(lnode))
        found[found] &= lnode[pos[found]] == doc_ids[found]
        cluster = np.where(found, llbl[np.minimum(pos, max(len(lnode) - 1, 0))],
                           doc_ids) if len(lnode) else doc_ids.copy()
        return pa.table({id_col: doc_ids, "cluster_id": cluster,
                         "is_canonical": cluster == doc_ids})

    return _shuffled(tagged, "node", num_partitions).map_groups(
        resolve, batch_format="pyarrow")


def keep_best_by_components(docs: ray.data.Dataset,
                            pairs: ray.data.Dataset,
                            id_col: str = "doc_id",
                            score_col: str = "score",
                            a: str = "doc_a", b: str = "doc_b",
                            num_partitions: int = 16) -> ray.data.Dataset:
    """Quality-aware dedup representative selection: resolve the pair
    set into transitive clusters, then keep the HIGHEST-``score_col``
    doc of each cluster (ties -> smallest id; null scores sort last)
    instead of the smallest-id doc. One row per cluster:
    (cluster_id, id_col, score_col, n_members) — the kept doc and the
    cluster size. The standard "keep the best copy, not the first
    copy" post-pass of web-corpus dedup (e.g. highest quality score
    among RefinedWeb/Gopher near-dup copies).

    Shape: ``dedup_by_components``'s label resolution (one id-hash
    shuffle joins labels to docs — no broadcast: the label map can be
    corpus-sized), then ONE cluster-hash shuffle and a vectorized
    per-partition argmax (sort + segment starts). Only
    (id, cluster, score) triples move, never payloads."""
    import pyarrow.compute as pc

    cc = connected_components(pairs, a=a, b=b,
                              num_partitions=num_partitions)

    @_pin
    def tag_docs(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).combine_chunks().to_numpy(
            zero_copy_only=False).astype(np.int64)
        score = batch.column(score_col).combine_chunks().cast(
            pa.float64())
        return pa.table({"node": ids,
                         "cluster_id": np.zeros(len(ids), np.int64),
                         "__score": score,
                         "__tag": np.zeros(len(ids), np.int8)})

    @_pin
    def tag_labels(batch: pa.Table) -> pa.Table:
        return pa.table({"node": batch.column("node"),
                         "cluster_id": batch.column("cluster_id"),
                         "__score": pa.nulls(batch.num_rows,
                                             pa.float64()),
                         "__tag": np.ones(batch.num_rows, np.int8)})

    tagged = docs.select_columns([id_col, score_col]).map_batches(
        tag_docs, batch_format="pyarrow", zero_copy_batch=True).union(
        cc.map_batches(tag_labels, batch_format="pyarrow",
                       zero_copy_batch=True))

    @_pin
    def resolve(group: pa.Table) -> pa.Table:
        node = group.column("node").combine_chunks().to_numpy(
            zero_copy_only=False)
        lbl = group.column("cluster_id").combine_chunks().to_numpy(
            zero_copy_only=False)
        tag = group.column("__tag").combine_chunks().to_numpy(
            zero_copy_only=False)
        is_doc = tag == 0
        doc_ids = node[is_doc]
        score = group.column("__score").combine_chunks().filter(
            pa.array(is_doc))
        lnode, llbl = node[~is_doc], lbl[~is_doc]
        order = np.argsort(lnode, kind="stable")
        lnode, llbl = lnode[order], llbl[order]
        if len(lnode):
            pos = np.searchsorted(lnode, doc_ids)
            found = pos < len(lnode)
            found[found] &= lnode[pos[found]] == doc_ids[found]
            cluster = np.where(
                found, llbl[np.minimum(pos, max(len(lnode) - 1, 0))],
                doc_ids)
        else:
            cluster = doc_ids.copy()
        return pa.table({"cluster_id": cluster, id_col: doc_ids,
                         score_col: score})

    labeled = _shuffled(tagged, "node", num_partitions).map_groups(
        resolve, batch_format="pyarrow")

    @_pin
    def best(group: pa.Table) -> pa.Table:
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        if group.num_rows == 0:
            return group
        tbl = group.take(pc.sort_indices(group, sort_keys=[
            ("cluster_id", "ascending"), (score_col, "descending"),
            (id_col, "ascending")]))
        cl = tbl.column("cluster_id").combine_chunks().to_numpy(
            zero_copy_only=False)
        starts = np.flatnonzero(np.r_[True, cl[1:] != cl[:-1]])
        sizes = np.diff(np.r_[starts, len(cl)])
        return tbl.take(pa.array(starts)).append_column(
            "n_members", pa.array(sizes, type=pa.int64()))

    from .dedup import _partition_by

    return _partition_by(labeled, ["cluster_id"],
                         num_partitions).map_groups(
        best, batch_format="pyarrow")


def leakage_safe_split(docs: ray.data.Dataset, pairs: ray.data.Dataset,
                       id_col: str = "doc_id", test_frac: float = 0.1,
                       method: str = "md5", seed: str = "",
                       num_partitions: int = 16) -> ray.data.Dataset:
    """Near-dup-aware train/test split -> (id_col, cluster_id, split):
    the holdout is drawn by hashing the duplicate-CLUSTER label, so a
    near-dup cluster lands atomically on one side — no pair from
    ``pairs`` ever straddles the boundary. A doc-level hash split
    (ops/sample.total_split) leaks near-dups into the eval set, the
    classic train-test contamination failure (Lee et al. 2022 §5
    measure it directly); splitting on the transitive cluster id is the
    standard fix.

    Split rule (same hash contract as ops/sample.py): row is ``'test'``
    iff uint32(first 8 hex of md5(str(cluster_id) + seed)) <
    test_frac * 2^32, else ``'train'`` — retry/reshard-stable and
    DuckDB-expressible for the oracle gate. One extra stateless
    map over :func:`dedup_by_components`'s labeled output; the heavy
    lifting (alternating-star CC + label join) is shared.
    """
    from .sample import _2_32, add_sample_hash

    labeled = dedup_by_components(docs, pairs, id_col=id_col,
                                  num_partitions=num_partitions)
    thr = float(test_frac) * _2_32

    def fn(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0:
            return pa.table({id_col: pa.array([], pa.int64()),
                             "cluster_id": pa.array([], pa.int64()),
                             "split": pa.array([], pa.string())})
        b = add_sample_hash(batch, "cluster_id", "__sh", method=method,
                            seed=seed)
        h = b.column("__sh").to_numpy(zero_copy_only=False)
        split = np.where(h < thr, "test", "train")
        return pa.table({
            id_col: batch.column(id_col),
            "cluster_id": batch.column("cluster_id"),
            "split": pa.array(split, type=pa.string()),
        })

    return labeled.map_batches(fn, batch_format="pyarrow",
                               zero_copy_batch=True)
