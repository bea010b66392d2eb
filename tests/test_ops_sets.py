"""Set ops (ops/sets.py) + numeric histogram (ops/hist.py): brute-force
pins. The sf0.01 DuckDB oracles run via the op_intersect / op_except /
op_semi_join / op_anti_join / op_histogram_bins gates."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from conftest import collect
from ksql_ray.ops.hist import numeric_histogram
from ksql_ray.ops.sets import (except_distinct, intersect_distinct,
                               semi_join_filter)


def _tbl(seed, n, kmax):
    rng = np.random.default_rng(seed)
    return pa.table({
        "k": pa.array(rng.integers(0, kmax, n), pa.int64()),
        "s": pa.array([f"g{v}" for v in rng.integers(0, 5, n)]),
        "v": pa.array(np.round(rng.uniform(0, 100, n), 2)),
    })


def test_intersect_except_brute(ray_session):
    lt, rt = _tbl(1, 300, 40), _tbl(2, 200, 40)
    l = ray.data.from_arrow(lt).repartition(3)
    r = ray.data.from_arrow(rt).repartition(3)
    lset = set(zip(lt.column("k").to_pylist(), lt.column("s").to_pylist()))
    rset = set(zip(rt.column("k").to_pylist(), rt.column("s").to_pylist()))
    got_i = collect(intersect_distinct(l, r, ["k", "s"]))
    got_e = collect(except_distinct(l, r, ["k", "s"]))
    gi = set(zip(got_i.column("k").to_pylist(),
                 got_i.column("s").to_pylist()))
    ge = set(zip(got_e.column("k").to_pylist(),
                 got_e.column("s").to_pylist()))
    assert gi == (lset & rset) and len(gi) == got_i.num_rows
    assert ge == (lset - rset) and len(ge) == got_e.num_rows
    assert gi and ge        # fixture actually exercises both branches


def test_set_ops_disjoint_and_equal(ray_session):
    a = ray.data.from_arrow(pa.table({"k": pa.array([1, 2, 2],
                                                    pa.int64())}))
    b = ray.data.from_arrow(pa.table({"k": pa.array([3], pa.int64())}))
    assert collect(intersect_distinct(a, b, ["k"])).num_rows == 0
    assert sorted(collect(except_distinct(a, b, ["k"]))
                  .column("k").to_pylist()) == [1, 2]
    assert sorted(collect(intersect_distinct(a, a, ["k"]))
                  .column("k").to_pylist()) == [1, 2]
    assert collect(except_distinct(a, a, ["k"])).num_rows == 0


def test_semi_anti_brute(ray_session):
    lt, rt = _tbl(3, 400, 60), _tbl(4, 100, 60)
    l = ray.data.from_arrow(lt).repartition(4)
    r = ray.data.from_arrow(rt).repartition(2)
    rkeys = set(rt.column("k").to_pylist())
    semi = collect(semi_join_filter(l, r, "k", "k"))
    anti = collect(semi_join_filter(l, r, "k", "k", anti=True))
    want_semi = [k for k in lt.column("k").to_pylist() if k in rkeys]
    want_anti = [k for k in lt.column("k").to_pylist() if k not in rkeys]
    assert sorted(semi.column("k").to_pylist()) == sorted(want_semi)
    assert sorted(anti.column("k").to_pylist()) == sorted(want_anti)
    assert semi.num_rows + anti.num_rows == lt.num_rows
    assert semi.num_rows and anti.num_rows


def test_semi_null_probes_dropped_anti_kept(ray_session):
    l = ray.data.from_arrow(pa.table({
        "k": pa.array([1, None, 2], pa.int64())}))
    r = ray.data.from_arrow(pa.table({
        "k": pa.array([1, None], pa.int64())}))
    semi = collect(semi_join_filter(l, r, "k", "k"))
    anti = collect(semi_join_filter(l, r, "k", "k", anti=True))
    assert semi.column("k").to_pylist() == [1]       # NULL never IN
    assert sorted(anti.column("k").to_pylist(),
                  key=lambda x: (x is None, x)) == [2, None]


def test_histogram_brute(ray_session):
    t = _tbl(5, 1000, 10)
    got = collect(numeric_histogram(
        ray.data.from_arrow(t).repartition(4), "v", bins=8))
    v = t.column("v").to_numpy()
    lo, hi = v.min(), v.max()
    w = (hi - lo) / 8
    idx = np.minimum(np.floor((v - lo) / w), 7).astype(int)
    want = np.bincount(idx, minlength=8)
    gm = {r["bin"]: r["cnt"] for r in got.to_pylist()}
    assert gm == {i: int(c) for i, c in enumerate(want) if c}
    assert got.num_rows and sum(gm.values()) == len(v)
    rows = sorted(got.to_pylist(), key=lambda r: r["bin"])
    assert rows[0]["lo"] == pytest.approx(lo)
    assert rows[-1]["hi"] == pytest.approx(hi)


def test_histogram_nulls_constant_and_validation(ray_session):
    t = pa.table({"v": pa.array([5.0, 5.0, None, 5.0])})
    got = collect(numeric_histogram(ray.data.from_arrow(t), "v",
                                    bins=4))
    assert got.to_pylist() == [
        {"bin": 0, "lo": 5.0, "hi": 5.0, "cnt": 3}]
    with pytest.raises(ValueError):
        numeric_histogram(ray.data.from_arrow(t), "v", bins=0)
    # explicit bounds: out-of-range values clamp into the edge bins
    t2 = pa.table({"v": pa.array([-1.0, 0.5, 9.5, 99.0])})
    got2 = collect(numeric_histogram(ray.data.from_arrow(t2), "v",
                                     bins=10, lo=0.0, hi=10.0))
    gm = {r["bin"]: r["cnt"] for r in got2.to_pylist()}
    assert gm == {0: 2, 9: 2}


def test_semi_empty_right(ray_session):
    # sparse groupby outputs include schema-less empty blocks; an
    # entirely-empty right side must still broadcast a typed empty set
    l = ray.data.from_arrow(pa.table({"k": pa.array([1, 2], pa.int64())}))
    r = ray.data.from_arrow(pa.table({"k": pa.array([], pa.int64())}))
    assert collect(semi_join_filter(l, r, "k", "k")).num_rows == 0
    assert collect(semi_join_filter(l, r, "k", "k",
                                    anti=True)).num_rows == 2


def test_union_distinct_brute(ray_session):
    from ksql_ray.ops.sets import union_distinct

    rng = np.random.default_rng(23)
    la = pa.table({"k": pa.array(rng.integers(0, 40, 300), pa.int64()),
                   "g": pa.array([f"s{v}" for v in
                                  rng.integers(0, 3, 300)])})
    rb = pa.table({"k": pa.array(rng.integers(20, 60, 300), pa.int64()),
                   "g": pa.array([f"s{v}" for v in
                                  rng.integers(0, 3, 300)])})
    got = collect(union_distinct(
        ray.data.from_arrow(la).repartition(3),
        ray.data.from_arrow(rb).repartition(3), ["k", "g"]))
    want = ({(k, g) for k, g in zip(la["k"].to_pylist(),
                                    la["g"].to_pylist())}
            | {(k, g) for k, g in zip(rb["k"].to_pylist(),
                                      rb["g"].to_pylist())})
    assert {(r["k"], r["g"]) for r in got.to_pylist()} == want
    assert got.num_rows == len(want)
