"""PageRank (ops/graph.py): brute-force pin + degenerate cases.
sf0.01 DuckDB oracle (3 unrolled SQL iterations) runs via op_pagerank
in test_driver_contract.py."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from conftest import collect
from ksql_ray.ops.graph import pagerank


def _brute(src, dst, nodes, damping, iters):
    idx = {nm: i for i, nm in enumerate(nodes)}
    N = len(nodes)
    si = np.array([idx[v] for v in src])
    di = np.array([idx[v] for v in dst])
    deg = np.bincount(si, minlength=N).astype(float)
    inv = np.where(deg > 0, 1 / np.maximum(deg, 1), 0)
    r = np.full(N, 1 / N)
    for _ in range(iters):
        w = r * inv
        tot = np.zeros(N)
        np.add.at(tot, di, w[si])
        r = (1 - damping) / N + damping * tot
    return {nm: r[idx[nm]] for nm in nodes}


def test_pagerank_brute(ray_session):
    rng = np.random.default_rng(19)
    m = 4000
    src = [f"n{v}" for v in rng.integers(0, 50, m)]
    dst = [f"n{v}" for v in rng.integers(0, 50, m)]
    t = pa.table({"s": pa.array(src), "d": pa.array(dst)})
    got = {r["node"]: r["rank"] for r in collect(pagerank(
        ray.data.from_arrow(t).repartition(5), "s", "d",
        0.85, 4)).to_pylist()}
    want = _brute(src, dst, sorted(set(src) | set(dst)), 0.85, 4)
    assert set(got) == set(want)
    for nm in want:
        assert got[nm] == pytest.approx(want[nm], abs=1e-12), nm


def test_pagerank_partition_invariance(ray_session):
    # rank state partitioned by node range: result must not depend on
    # the partition count (P=1 degenerate vs many slices vs > nodes)
    rng = np.random.default_rng(7)
    m = 3000
    src = [f"n{v:03d}" for v in rng.integers(0, 40, m)]
    dst = [f"n{v:03d}" for v in rng.integers(0, 40, m)]
    t = pa.table({"s": pa.array(src), "d": pa.array(dst)})
    ds = ray.data.from_arrow(t).repartition(4)
    base = collect(pagerank(ds, "s", "d", 0.85, 3, partitions=1))
    base = {r["node"]: r["rank"] for r in base.to_pylist()}
    for P in (3, 7, 64):        # 64 > n_nodes: empty tail slices
        got = {r["node"]: r["rank"] for r in collect(pagerank(
            ds, "s", "d", 0.85, 3, partitions=P)).to_pylist()}
        assert set(got) == set(base)
        for nm in base:
            assert got[nm] == pytest.approx(base[nm], abs=1e-14), (P, nm)
    with pytest.raises(ValueError):
        pagerank(ds, "s", "d", partitions=0)


def test_pagerank_empty(ray_session):
    t = pa.table({"s": pa.array([], pa.string()),
                  "d": pa.array([], pa.string())})
    out = collect(pagerank(ray.data.from_arrow(t), "s", "d"))
    assert out.num_rows == 0
    assert out.column_names == ["node", "rank"]


def test_pagerank_dangling_and_multiedge(ray_session):
    # b is dangling (rank leaks); a->b twice = double weight vs a->c
    t = pa.table({"s": pa.array(["a", "a", "a"]),
                  "d": pa.array(["b", "b", "c"])})
    got = {r["node"]: r["rank"] for r in collect(pagerank(
        ray.data.from_arrow(t), "s", "d", 0.5, 1)).to_pylist()}
    # N=3, r0=1/3; a gets no in-edges: 0.5/3
    assert got["a"] == pytest.approx(0.5 / 3)
    # b: 0.5/3 + 0.5 * (2/3 edges * (1/3)/3) = 0.5/3 + 0.5*2/9
    assert got["b"] == pytest.approx(0.5 / 3 + 0.5 * 2 / 9)
    assert got["c"] == pytest.approx(0.5 / 3 + 0.5 * 1 / 9)
    assert sum(got.values()) < 1.0          # dangling mass leaks
    with pytest.raises(ValueError):
        pagerank(ray.data.from_arrow(t), "s", "d", damping=1.5)
    with pytest.raises(ValueError):
        pagerank(ray.data.from_arrow(t), "s", "d", iters=0)
