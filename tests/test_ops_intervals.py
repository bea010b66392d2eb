"""Interval coalescing + gap-fill (ops/intervals.py): brute-force
pins, timestamp-typed columns, gap tolerance, edge cases. The sf0.01
DuckDB oracles run via the op_interval_merge / op_gap_fill gates."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from conftest import collect
from ksql_ray.ops.intervals import gap_fill, merge_intervals
from ksql_ray.ops.rows import time_range_distinct


def _brute_merge(rows, gap):
    bykey = {}
    for k, a, b in rows:
        bykey.setdefault(k, []).append((a, b))
    want = set()
    for k, lst in bykey.items():
        lst.sort()
        cur_s = cur_e = cnt = None
        for a, b in lst:
            if cur_s is None or a > cur_e + gap:
                if cur_s is not None:
                    want.add((k, cur_s, cur_e, cnt))
                cur_s, cur_e, cnt = a, b, 1
            else:
                cur_e = max(cur_e, b)
                cnt += 1
        want.add((k, cur_s, cur_e, cnt))
    return want


def test_merge_intervals_brute(ray_session):
    rng = np.random.default_rng(11)
    n = 700
    s = rng.integers(0, 1000, n)
    e = s + rng.integers(0, 80, n)
    t = pa.table({"k": pa.array([f"u{x}" for x in rng.integers(0, 10, n)]),
                  "s": pa.array(s, pa.int64()),
                  "e": pa.array(e, pa.int64())})
    for gap in (0, 5):
        got = collect(merge_intervals(
            ray.data.from_arrow(t).repartition(4), ["k"], "s", "e",
            gap_us=gap))
        gs = {(r["k"], r["span_start"], r["span_end"], r["n_rows"])
              for r in got.to_pylist()}
        assert gs == _brute_merge(
            zip(*[t.column(c).to_pylist() for c in ("k", "s", "e")]),
            gap)


def test_merge_intervals_timestamp_type_and_errors(ray_session):
    ts = pa.array([0, 10, 40], pa.int64()).cast(pa.timestamp("us"))
    te = pa.array([15, 20, 50], pa.int64()).cast(pa.timestamp("us"))
    t = pa.table({"k": ["a", "a", "a"], "s": ts, "e": te})
    got = collect(merge_intervals(ray.data.from_arrow(t), ["k"],
                                  "s", "e"))
    assert got.schema.field("span_start").type == pa.timestamp("us")
    rows = sorted(got.to_pylist(), key=lambda r: r["span_start"])
    assert [r["n_rows"] for r in rows] == [2, 1]
    bad = pa.table({"k": ["a"], "s": pa.array([5], pa.int64()),
                    "e": pa.array([3], pa.int64())})
    with pytest.raises(Exception, match="end < start"):
        collect(merge_intervals(ray.data.from_arrow(bad), ["k"],
                                "s", "e"))


def test_gap_fill_brute(ray_session):
    rng = np.random.default_rng(13)
    n = 400
    t = pa.table({
        "k": pa.array([f"u{x}" for x in rng.integers(0, 8, n)]),
        "ts": pa.array(rng.integers(0, 500, n), pa.int64()),
        "v": pa.array(np.round(rng.uniform(0, 9, n), 2)),
        "eid": pa.array(np.arange(n), pa.int64()),
    })
    got = collect(gap_fill(
        ray.data.from_arrow(t).repartition(3), ["k"], "ts",
        ["v", "eid"], step_us=37, tiebreak="eid"))
    bk = {}
    for k, tt, v, eid in zip(*[t.column(c).to_pylist()
                               for c in ("k", "ts", "v", "eid")]):
        bk.setdefault(k, []).append((tt, eid, v))
    want = {}
    for k, lst in bk.items():
        lst.sort()
        g = lst[0][0]
        while g <= lst[-1][0]:
            last = max(x for x in lst if x[0] <= g)
            want[(k, g)] = (last[2], last[1])
            g += 37
    g2 = {(r["k"], r["ts"]): (r["v"], r["eid"])
          for r in got.to_pylist()}
    assert g2 == want


def test_gap_fill_single_event_key(ray_session):
    # one event -> grid is exactly one point carrying that event
    t = pa.table({"k": ["a", "b"], "ts": pa.array([100, 7], pa.int64()),
                  "v": [1.5, 2.5]})
    got = collect(gap_fill(ray.data.from_arrow(t), ["k"], "ts", ["v"],
                           step_us=10))
    assert sorted(got.to_pylist(), key=lambda r: r["k"]) == [
        {"k": "a", "ts": 100, "v": 1.5},
        {"k": "b", "ts": 7, "v": 2.5}]


def test_time_range_distinct_brute(ray_session):
    rng = np.random.default_rng(5)
    n = 800
    vals = np.array([None if rng.random() < 0.07
                     else f"t{rng.integers(0, 6)}"
                     for _ in range(n)], dtype=object)
    t = pa.table({
        "k": pa.array([f"u{x}" for x in rng.integers(0, 12, n)]),
        "eid": pa.array(np.arange(n), pa.int64()),
        "v": pa.array(vals, pa.string()),
        "ts": pa.array(rng.integers(0, 200, n), pa.int64()),
    })
    got = collect(time_range_distinct(
        ray.data.from_arrow(t).repartition(4), ["k"], "ts", "v",
        range_us=30))
    bykey = {}
    for k, ts, e, v in zip(*[t.column(c).to_pylist()
                             for c in ("k", "ts", "eid", "v")]):
        bykey.setdefault(k, []).append((ts, e, v))
    want = {}
    for k, lst in bykey.items():
        for ts, e, _ in lst:
            want[e] = len({v for ts2, _, v in lst
                           if ts - 30 <= ts2 <= ts and v is not None})
    gm = {r["eid"]: r["v_tdistinct"] for r in got.to_pylist()}
    assert gm == want


def test_time_range_distinct_null_ts_rejected(ray_session):
    t = pa.table({"k": ["a", "a"], "v": ["x", "y"],
                  "ts": pa.array([1, None], pa.int64())})
    with pytest.raises(Exception, match="NULL timestamps"):
        collect(time_range_distinct(ray.data.from_arrow(t), ["k"],
                                    "ts", "v", range_us=5))
