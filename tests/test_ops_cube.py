"""ROLLUP / pivot (ops/cube.py) + quantile bucketize: brute-force
pins. sf0.01 DuckDB oracles run via op_rollup / op_pivot /
op_bucketize in test_driver_contract.py."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from conftest import collect
from ksql_ray.ops.cube import pivot_agg, rollup_agg
from ksql_ray.ops.quantiles import quantile_bucketize


def _tbl(seed=7, n=600):
    rng = np.random.default_rng(seed)
    vals = np.round(rng.uniform(0, 50, n), 2)
    vals[rng.random(n) < 0.05] = np.nan
    return pa.table({
        "a": pa.array([f"s{v}" for v in rng.integers(0, 4, n)]),
        "b": pa.array(rng.integers(0, 6, n), pa.int64()),
        "v": pa.array(vals),
    })


def test_rollup_brute(ray_session):
    t = _tbl()
    got = collect(rollup_agg(ray.data.from_arrow(t).repartition(4),
                             ["a", "b"], "v"))
    rows = list(zip(t.column("a").to_pylist(),
                    t.column("b").to_pylist(),
                    t.column("v").to_pylist()))
    want = {}
    for a, b, v in rows:
        for key in ((a, b), (a, None), (None, None)):
            s, c = want.get(key, (0.0, 0))
            if v is not None and not np.isnan(v):
                s, c = s + v, c + 1
            want[key] = (s, c)
    got_map = {}
    for r in got.to_pylist():
        got_map[(r["a"], r["b"])] = (r["sum_v"], r["cnt_v"])
    assert set(got_map) == set(want)
    for k, (s, c) in want.items():
        gs, gc = got_map[k]
        assert gc == c, k
        if c == 0:
            assert gs is None, k
        else:
            assert gs == pytest.approx(s, rel=1e-9), k
    # level sizes: |a×b| + |a| + 1
    na = len(set(t.column("a").to_pylist()))
    assert sum(1 for k in got_map if k[0] is not None and k[1] is None) == na
    assert (None, None) in got_map


def test_rollup_paths_agree(ray_session, monkeypatch):
    """The one-task small-partial fast path and the distributed
    per-level groupby path emit identical rows."""
    import ksql_ray.ops.cube as cube

    t = _tbl(13)
    fast = collect(rollup_agg(ray.data.from_arrow(t).repartition(4),
                              ["a", "b"], "v"))
    monkeypatch.setattr(cube, "_SMALL_PARTIAL_BYTES", 0)
    slow = collect(rollup_agg(ray.data.from_arrow(t).repartition(4),
                              ["a", "b"], "v"))

    def norm(tbl):
        return sorted(
            (str(r["a"]), str(r["b"]), r["cnt_v"],
             None if r["sum_v"] is None else round(r["sum_v"], 9))
            for r in tbl.to_pylist())

    assert norm(fast) == norm(slow)


def test_cube_brute_and_paths_agree(ray_session, monkeypatch):
    import ksql_ray.ops.cube as cube
    from ksql_ray.ops.cube import cube_agg

    t = _tbl(17)
    fast = collect(cube_agg(ray.data.from_arrow(t).repartition(4),
                            ["a", "b"], "v"))
    # brute force: every subset of {a, b}
    rows = list(zip(t.column("a").to_pylist(),
                    t.column("b").to_pylist(),
                    t.column("v").to_pylist()))
    want = {}
    for a, b, v in rows:
        for key in ((a, b), (a, None), (None, b), (None, None)):
            s, c = want.get(key, (0.0, 0))
            if v is not None and not np.isnan(v):
                s, c = s + v, c + 1
            want[key] = (s, c)
    got_map = {(r["a"], r["b"]): (r["sum_v"], r["cnt_v"])
               for r in fast.to_pylist()}
    assert set(got_map) == set(want)
    for k, (s, c) in want.items():
        gs, gc = got_map[k]
        assert gc == c and (gs is None if c == 0
                            else gs == pytest.approx(s, rel=1e-9)), k

    monkeypatch.setattr(cube, "_SMALL_PARTIAL_BYTES", 0)
    slow = collect(cube_agg(ray.data.from_arrow(t).repartition(4),
                            ["a", "b"], "v"))

    def norm(tbl):
        return sorted(
            (str(r["a"]), str(r["b"]), r["cnt_v"],
             None if r["sum_v"] is None else round(r["sum_v"], 9))
            for r in tbl.to_pylist())

    assert norm(fast) == norm(slow)
    with pytest.raises(ValueError):
        cube_agg(ray.data.from_arrow(t), list("abcdefg"), "v")


def test_melt_include_nulls(ray_session):
    from ksql_ray.ops.explode import melt

    t = pa.table({
        "id": pa.array([1, 2], pa.int64()),
        "x": pa.array([1.5, None]),
        "y": pa.array([None, 4], pa.int64()),
    })
    got = sorted(collect(melt(ray.data.from_arrow(t), ["id"],
                              ["x", "y"])).to_pylist(),
                 key=lambda r: (r["id"], r["name"]))
    assert got == [
        {"id": 1, "name": "x", "value": 1.5},
        {"id": 1, "name": "y", "value": None},
        {"id": 2, "name": "x", "value": None},
        {"id": 2, "name": "y", "value": 4.0},
    ]
    with pytest.raises(ValueError):
        melt(ray.data.from_arrow(t), ["id"], [])


def test_pivot_brute(ray_session):
    t = _tbl(9)
    vals = ["s0", "s1", "s2"]          # s3 deliberately not projected
    got = collect(pivot_agg(ray.data.from_arrow(t).repartition(4),
                            "b", "a", vals, "v"))
    want = {}
    for a, b, v in zip(t.column("a").to_pylist(),
                       t.column("b").to_pylist(),
                       t.column("v").to_pylist()):
        if a not in vals or v is None or np.isnan(v):
            continue
        s, c = want.setdefault(b, {}).get(a, (0.0, 0))
        want[b][a] = (s + v, c + 1)
    assert got.num_rows == len(want)
    for r in got.to_pylist():
        for a in vals:
            s, c = want[r["b"]].get(a, (None, 0))
            assert r[f"{a}_cnt"] == c
            if c == 0:
                assert r[f"{a}_sum"] is None
            else:
                assert r[f"{a}_sum"] == pytest.approx(s, rel=1e-9)


def test_pivot_null_group(ray_session):
    # a key with rows only outside the projected pivot values still
    # appears?  No: partials drop unprojected labels entirely, so keys
    # with NO projected rows are absent (SQL GROUP BY would keep them;
    # the op documents 'rows ignored').
    t = pa.table({
        "k": pa.array([1, 1, 2], pa.int64()),
        "p": pa.array(["x", "y", "z"]),
        "v": pa.array([1.0, 2.0, 3.0]),
    })
    got = collect(pivot_agg(ray.data.from_arrow(t), "k", "p",
                            ["x", "y"], "v"))
    assert got.num_rows == 1
    r = got.to_pylist()[0]
    assert r == {"k": 1, "x_sum": 1.0, "x_cnt": 1,
                 "y_sum": 2.0, "y_cnt": 1}
    with pytest.raises(ValueError):
        pivot_agg(ray.data.from_arrow(t), "k", "p", [], "v")


def test_bucketize_brute(ray_session):
    t = _tbl(11)
    got = collect(quantile_bucketize(
        ray.data.from_arrow(t).repartition(4), "v",
        qs=[0.25, 0.5, 0.75]))
    v = t.column("v").to_numpy()
    clean = np.sort(v[~np.isnan(v)])
    # quantile_disc: value at ceil(q*n)-1 (1-based) == index int(q*n+0.5)?
    # use the sketch's own exactness contract: boundaries equal
    # np.quantile(..., method='inverted_cdf')
    bounds = np.quantile(clean, [0.25, 0.5, 0.75],
                         method="inverted_cdf")
    got_sorted = got.sort_by("v")
    gb = got_sorted.column("bucket").to_numpy(zero_copy_only=False)
    gv = got_sorted.column("v").to_numpy(zero_copy_only=False)
    wb = np.searchsorted(bounds, gv[~np.isnan(gv)], side="right")
    nn = ~np.isnan(gv)
    assert (gb[nn] == wb).all()
    # NULL values -> NULL bucket
    assert all(r["bucket"] is None for r in got.to_pylist()
               if r["v"] is None)
    assert len(set(gb[nn])) == 4        # all four buckets populated
    with pytest.raises(ValueError):
        quantile_bucketize(ray.data.from_arrow(t), "v", qs=[1.5])


def test_grouped_quantiles_brute_and_paths(ray_session, monkeypatch):
    from ksql_ray.ops.quantiles import grouped_quantiles

    rng = np.random.default_rng(23)
    n = 4000
    k = rng.integers(0, 12, n)
    v = np.round(rng.uniform(0, 100, n), 2)
    v[rng.random(n) < 0.03] = np.nan
    t = pa.table({"k": pa.array(k, pa.int64()), "v": pa.array(v)})
    fast = collect(grouped_quantiles(
        ray.data.from_arrow(t).repartition(5), ["k"], "v",
        qs=[0.25, 0.5, 0.9]))
    got = {(r["k"], r["q"]): r["value"] for r in fast.to_pylist()}
    for g in range(12):
        vals = np.sort(v[(k == g) & ~np.isnan(v)])
        for q in (0.25, 0.5, 0.9):
            # quantile_disc: value at rank max(1, ceil(q*n)) (1-based)
            tgt = max(1, int(np.ceil(q * len(vals) - 1e-9)))
            assert got[(g, q)] == vals[tgt - 1], (g, q)

    import ksql_ray.ops.smallagg as sa
    monkeypatch.setattr(sa, "_SMALL_PARTIAL_BYTES", 0)
    slow = collect(grouped_quantiles(
        ray.data.from_arrow(t).repartition(5), ["k"], "v",
        qs=[0.25, 0.5, 0.9]))
    norm = lambda tb: sorted((r["k"], r["q"], r["value"])
                             for r in tb.to_pylist())
    assert norm(fast) == norm(slow)
    with pytest.raises(ValueError):
        grouped_quantiles(ray.data.from_arrow(t), ["k"], "v", qs=[2.0])


# ---------------------------------------------------------- grouping sets
def test_grouping_sets_vs_duckdb(ray_session, duck):
    from conftest import SF_DIR, assert_tables_equal, collect
    from ksql_ray.ops.cube import grouping_sets_agg

    ds = ray.data.read_parquet(f"{SF_DIR}/events.parquet")
    got = collect(grouping_sets_agg(
        ds, ["event_type", "user_id"],
        [("event_type", "user_id"), ("user_id",), ()], "value"))
    exp = duck.sql(
        "SELECT event_type, user_id, SUM(value) AS sum_v, "
        "COUNT(value)::BIGINT AS cnt_v FROM events "
        "GROUP BY GROUPING SETS ((event_type, user_id), (user_id), ())"
    ).arrow()
    assert_tables_equal(got, exp)


def test_grouping_sets_duplicate_set_emits_twice(ray_session):
    from ksql_ray.ops.cube import grouping_sets_agg

    t = pa.table({"k": pa.array(["a", "a", "b"]),
                  "u": pa.array([1, 1, 2], pa.int64()),
                  "v": pa.array([1.0, 2.0, 3.0])})
    rows = grouping_sets_agg(ray.data.from_arrow(t), ["k", "u"],
                             [("k",), ("k",)], "v").take_all()
    ks = sorted(r["k"] for r in rows)
    assert ks == ["a", "a", "b", "b"]   # each set listed twice


def test_grouping_sets_validation(ray_session):
    import pytest as _pytest

    from ksql_ray.ops.cube import grouping_sets_agg

    t = pa.table({"k": pa.array(["a"]), "v": pa.array([1.0])})
    ds = ray.data.from_arrow(t)
    with _pytest.raises(ValueError):
        grouping_sets_agg(ds, ["k"], [], "v")
    with _pytest.raises(ValueError):
        grouping_sets_agg(ds, ["k"], [("nope",)], "v")
