"""connected_components / dedup_by_components vs a pure-Python union-find."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data
from hypothesis import given, settings, strategies as st

from ksql_ray.ops.components import connected_components, dedup_by_components


def _union_find(n_nodes, edges):
    parent = list(range(n_nodes))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in edges:
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    # min-id label per component
    labels = {}
    for v in range(n_nodes):
        r = find(v)
        labels.setdefault(r, []).append(v)
    return {v: min(members) for r, members in labels.items() for v in members}


def _cc(edges, **kw):
    a = [e[0] for e in edges]
    b = [e[1] for e in edges]
    ds = ray.data.from_arrow(pa.table({"doc_a": pa.array(a, pa.int64()),
                                       "doc_b": pa.array(b, pa.int64())}))
    out = connected_components(ds, **kw).to_pandas()
    if len(out) == 0:
        return {}
    return dict(zip(out["node"], out["cluster_id"]))


def test_chain_and_star(ray_session):
    got = _cc([(1, 2), (2, 3), (3, 4), (10, 11)])
    assert got == {1: 1, 2: 1, 3: 1, 4: 1, 10: 10, 11: 10}


def test_self_loops_and_duplicates(ray_session):
    got = _cc([(5, 5), (1, 2), (2, 1), (1, 2)])
    assert got == {1: 1, 2: 1}


def test_empty_pairs(ray_session):
    assert _cc([]) == {}


def test_two_cliques_bridged(ray_session):
    clique1 = [(i, j) for i in range(5) for j in range(i + 1, 5)]
    clique2 = [(i, j) for i in range(10, 15) for j in range(i + 1, 15)]
    got = _cc(clique1 + clique2 + [(4, 10)])
    assert all(got[v] == 0 for v in list(range(5)) + list(range(10, 15)))


@settings(max_examples=25, deadline=None)
@given(st.lists(st.tuples(st.integers(0, 40), st.integers(0, 40)),
                min_size=1, max_size=120))
def test_property_vs_union_find(ray_session, edges):
    expected = _union_find(41, edges)
    touched = {v for e in edges if e[0] != e[1] for v in e}
    got = _cc(edges, num_partitions=4)
    assert set(got) == touched
    for v in touched:
        assert got[v] == expected[v], (v, edges)


def test_dedup_by_components_singletons(ray_session):
    docs = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array([1, 2, 3, 4, 7, 9], pa.int64()),
         "text": ["a"] * 6}))
    pairs = ray.data.from_arrow(pa.table({"doc_a": pa.array([2, 3], pa.int64()),
                                          "doc_b": pa.array([3, 4], pa.int64())}))
    out = dedup_by_components(docs, pairs).to_pandas().sort_values("doc_id")
    assert list(out["cluster_id"]) == [1, 2, 2, 2, 7, 9]
    assert list(out["is_canonical"]) == [True, True, False, False, True, True]


def test_dedup_by_components_empty_pairs(ray_session):
    docs = ray.data.from_arrow(pa.table({"doc_id": pa.array([3, 1], pa.int64())}))
    pairs = ray.data.from_arrow(pa.table({"doc_a": pa.array([], pa.int64()),
                                          "doc_b": pa.array([], pa.int64())}))
    out = dedup_by_components(docs, pairs).to_pandas().sort_values("doc_id")
    assert list(out["cluster_id"]) == [1, 3]
    assert list(out["is_canonical"]) == [True, True]


def test_keep_best_by_components_brute(ray_session):
    from ksql_ray.ops.components import keep_best_by_components

    rng = np.random.default_rng(7)
    n = 120
    docs = pa.table({
        "doc_id": pa.array(np.arange(n), pa.int64()),
        "score": pa.array(rng.integers(0, 8, n).astype(float)),
    })
    # random sparse pair graph
    m = 90
    pa_ids = rng.integers(0, n, m)
    pb_ids = rng.integers(0, n, m)
    keep = pa_ids != pb_ids
    pairs = pa.table({"doc_a": pa.array(pa_ids[keep], pa.int64()),
                      "doc_b": pa.array(pb_ids[keep], pa.int64())})
    got = keep_best_by_components(
        ray.data.from_arrow(docs).repartition(3),
        ray.data.from_arrow(pairs).repartition(2),
        score_col="score").to_pandas()
    # union-find brute force
    parent = list(range(n))

    def find(x):
        while parent[x] != x:
            parent[x] = parent[parent[x]]
            x = parent[x]
        return x

    for a, b in zip(pairs["doc_a"].to_pylist(),
                    pairs["doc_b"].to_pylist()):
        ra, rb = find(a), find(b)
        if ra != rb:
            parent[max(ra, rb)] = min(ra, rb)
    byc = {}
    sc = docs["score"].to_pylist()
    for d in range(n):
        byc.setdefault(find(d), []).append(d)
    want = {}
    for root, members in byc.items():
        best = min(members, key=lambda d: (-sc[d], d))
        # cluster_id is the component MIN id (root after path collapse)
        want[min(members)] = (best, sc[best], len(members))
    gm = {r.cluster_id: (r.doc_id, r.score, r.n_members)
          for r in got.itertuples()}
    assert gm == want


def test_leakage_safe_split(ray_session):
    import hashlib

    from ksql_ray.ops.components import leakage_safe_split

    n = 40
    edges = [(0, 1), (1, 2), (5, 6), (10, 11), (11, 12), (12, 13),
             (20, 21), (30, 31), (31, 32)]
    docs = ray.data.from_arrow(pa.table({
        "doc_id": pa.array(list(range(n)), pa.int64())}))
    pairs = ray.data.from_arrow(pa.table({
        "doc_a": pa.array([a for a, _ in edges], pa.int64()),
        "doc_b": pa.array([b for _, b in edges], pa.int64())}))
    out = leakage_safe_split(docs, pairs, test_frac=0.3,
                             method="md5").to_pandas()
    assert len(out) == n
    # 1) no edge straddles the split
    side = dict(zip(out["doc_id"], out["split"]))
    for a, b in edges:
        assert side[a] == side[b], (a, b)
    # 2) split matches the md5 contract on the min-label cluster id
    labels = _union_find(n, edges)
    for _, r in out.iterrows():
        lbl = labels[int(r["doc_id"])]
        assert int(r["cluster_id"]) == lbl
        h = int(hashlib.md5(str(lbl).encode()).hexdigest()[:8], 16)
        want = "test" if h < 0.3 * 2**32 else "train"
        assert r["split"] == want
    # 3) both sides non-empty at this fraction/seed
    assert set(out["split"]) == {"test", "train"}
