"""Per-key row ops (ops/rows.py): brute-force pins, multi-key, edge
cases. The sf0.01 DuckDB oracles run via the op_top_per_key /
op_sessionize gates in test_driver_contract.py."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from conftest import collect
from ksql_ray.ops.rows import sessionize, top_n_per_key


def _events():
    rng = np.random.default_rng(8)
    n = 500
    return pa.table({
        "k": pa.array([f"u{v}" for v in rng.integers(0, 20, n)]),
        "k2": pa.array(rng.integers(0, 3, n), pa.int64()),
        "eid": pa.array(np.arange(n), pa.int64()),
        "v": pa.array(np.round(rng.uniform(0, 100, n), 2)),
        "ts": pa.array(np.sort(rng.integers(0, 10_000_000, n)),
                       pa.int64()),
    })


def test_top_n_per_key_brute(ray_session):
    t = _events()
    got = collect(top_n_per_key(
        ray.data.from_arrow(t).repartition(4), ["k"], "v", n=3,
        tiebreak="eid"))
    rows = sorted(zip(t.column("k").to_pylist(),
                      t.column("v").to_pylist(),
                      t.column("eid").to_pylist()))
    want = {}
    bykey = {}
    for k, v, e in rows:
        bykey.setdefault(k, []).append((-v, e))
    for k, lst in bykey.items():
        for r, (_, e) in enumerate(sorted(lst)[:3]):
            want[e] = r
    got_map = {r["eid"]: r["rank"] for r in got.to_pylist()}
    assert got_map == want


def test_top_n_multi_key_ascending(ray_session):
    t = _events()
    got = collect(top_n_per_key(
        ray.data.from_arrow(t), ["k", "k2"], "v", n=1,
        descending=False, tiebreak="eid"))
    mins = {}
    for k, k2, v, e in zip(t.column("k").to_pylist(),
                           t.column("k2").to_pylist(),
                           t.column("v").to_pylist(),
                           t.column("eid").to_pylist()):
        cur = mins.get((k, k2))
        if cur is None or (v, e) < cur:
            mins[(k, k2)] = (v, e)
    assert got.num_rows == len(mins)
    for r in got.to_pylist():
        assert (r["v"], r["eid"]) == mins[(r["k"], r["k2"])]
        assert r["rank"] == 0


def test_sessionize_brute(ray_session):
    t = _events()
    gap = 400_000
    got = collect(sessionize(ray.data.from_arrow(t).repartition(4),
                             ["k"], "ts", gap_us=gap, tiebreak="eid"))
    bykey = {}
    for k, ts, e in zip(t.column("k").to_pylist(),
                        t.column("ts").to_pylist(),
                        t.column("eid").to_pylist()):
        bykey.setdefault(k, []).append((ts, e))
    want = {}
    for k, lst in bykey.items():
        sid = -1
        prev = None
        for ts, e in sorted(lst):
            if prev is None or ts - prev > gap:
                sid += 1
            want[e] = sid
            prev = ts
    got_map = {r["eid"]: r["session_id"] for r in got.to_pylist()}
    assert got_map == want
    assert max(got_map.values()) > 0      # the gap actually split


def test_sessionize_gap_boundary(ray_session):
    """gap is STRICT: a delta of exactly gap_us stays in-session."""
    t = pa.table({
        "k": pa.array(["a"] * 4),
        "eid": pa.array([0, 1, 2, 3], pa.int64()),
        "ts": pa.array([0, 100, 200, 301], pa.int64()),
    })
    got = collect(sessionize(ray.data.from_arrow(t), ["k"], "ts",
                             gap_us=100, tiebreak="eid"))
    sid = {r["eid"]: r["session_id"] for r in got.to_pylist()}
    assert sid == {0: 0, 1: 0, 2: 0, 3: 1}


def test_rows_validation(ray_session):
    ds = ray.data.from_arrow(_events())
    with pytest.raises(ValueError):
        top_n_per_key(ds, ["k"], "v", n=0)
    with pytest.raises(ValueError):
        sessionize(ds, ["k"], "ts", gap_us=0)


def test_with_lag_brute(ray_session):
    from ksql_ray.ops.rows import with_lag

    t = _events()
    got = collect(with_lag(ray.data.from_arrow(t).repartition(4),
                           ["k"], "ts", ["v"], tiebreak="eid"))
    bykey = {}
    for k, ts, e, v in zip(t.column("k").to_pylist(),
                           t.column("ts").to_pylist(),
                           t.column("eid").to_pylist(),
                           t.column("v").to_pylist()):
        bykey.setdefault(k, []).append((ts, e, v))
    want = {}
    for k, lst in bykey.items():
        prev = None
        for ts, e, v in sorted(lst):
            want[e] = prev
            prev = v
    got_map = {r["eid"]: r["v_prev"] for r in got.to_pylist()}
    assert got_map == want
    assert sum(1 for v in got_map.values() if v is None) == len(bykey)


def test_with_lead_brute(ray_session):
    from ksql_ray.ops.rows import with_lead

    t = _events()
    got = collect(with_lead(ray.data.from_arrow(t).repartition(4),
                            ["k"], "ts", ["v", "eid"], tiebreak="eid"))
    bykey = {}
    for k, ts, e, v in zip(t.column("k").to_pylist(),
                           t.column("ts").to_pylist(),
                           t.column("eid").to_pylist(),
                           t.column("v").to_pylist()):
        bykey.setdefault(k, []).append((ts, e, v))
    want = {}
    for k, lst in bykey.items():
        s = sorted(lst)
        for i, (ts, e, v) in enumerate(s):
            want[e] = (s[i + 1][2], s[i + 1][1]) if i + 1 < len(s) \
                else (None, None)
    got_map = {r["eid"]: (r["v_next"], r["eid_next"])
               for r in got.to_pylist()}
    assert got_map == want
    assert sum(1 for v, _ in got_map.values() if v is None) == len(bykey)


def test_rank_per_key_brute(ray_session):
    from ksql_ray.ops.rows import rank_per_key

    rng = np.random.default_rng(11)
    n = 400
    # small integer order values so ties are common
    t = pa.table({
        "k": pa.array([f"u{v}" for v in rng.integers(0, 12, n)]),
        "eid": pa.array(np.arange(n), pa.int64()),
        "score": pa.array(rng.integers(0, 6, n), pa.int64()),
    })
    for desc in (False, True):
        got = collect(rank_per_key(
            ray.data.from_arrow(t).repartition(4), ["k"], "score",
            descending=desc, tiebreak="eid"))
        bykey = {}
        for k, e, s in zip(t.column("k").to_pylist(),
                           t.column("eid").to_pylist(),
                           t.column("score").to_pylist()):
            bykey.setdefault(k, []).append((-s if desc else s, e, s))
        want = {}
        for k, lst in bykey.items():
            lst.sort()
            first_of_val, dense = {}, {}
            for i, (o, e, s) in enumerate(lst):
                if s not in first_of_val:
                    first_of_val[s] = i + 1
                    dense[s] = len(dense) + 1
                want[e] = (i + 1, first_of_val[s], dense[s])
        got_map = {r["eid"]: (r["row_number"], r["rank"], r["dense_rank"])
                   for r in got.to_pylist()}
        assert got_map == want, desc


def test_transition_counts_brute(ray_session):
    from collections import Counter

    from ksql_ray.ops.rows import transition_counts

    rng = np.random.default_rng(13)
    n = 600
    labels = ["user", "assistant", "tool", "system"]
    t = pa.table({
        "k": pa.array([f"c{v}" for v in rng.integers(0, 25, n)]),
        "eid": pa.array(np.arange(n), pa.int64()),
        "role": pa.array([labels[i] for i in rng.integers(0, 4, n)]),
        "ts": pa.array(rng.integers(0, 10_000, n), pa.int64()),
    })
    got = collect(transition_counts(
        ray.data.from_arrow(t).repartition(4), ["k"], "ts", "role",
        tiebreak="eid"))
    bykey = {}
    for k, ts, e, r in zip(t.column("k").to_pylist(),
                           t.column("ts").to_pylist(),
                           t.column("eid").to_pylist(),
                           t.column("role").to_pylist()):
        bykey.setdefault(k, []).append((ts, e, r))
    want = Counter()
    for k, lst in bykey.items():
        s = sorted(lst)
        for a, b in zip(s, s[1:]):
            want[(a[2], b[2])] += 1
    got_map = {(r["from_label"], r["to_label"]): r["cnt"]
               for r in got.to_pylist()}
    assert got_map == dict(want)


def test_moving_agg_cumulative(ray_session):
    from ksql_ray.ops.rows import moving_agg

    t = _events()
    got = collect(moving_agg(ray.data.from_arrow(t).repartition(4),
                             ["k"], "ts", "v", window_rows=None,
                             tiebreak="eid"))
    bykey = {}
    for k, ts, e, v in zip(t.column("k").to_pylist(),
                           t.column("ts").to_pylist(),
                           t.column("eid").to_pylist(),
                           t.column("v").to_pylist()):
        bykey.setdefault(k, []).append((ts, e, v))
    want = {}
    for k, lst in bykey.items():
        run, cnt = 0.0, 0
        for ts, e, v in sorted(lst):
            run += v
            cnt += 1
            want[e] = (round(run, 6), cnt)
    got_map = {r["eid"]: (round(r["v_rsum"], 6), r["v_rcnt"])
               for r in got.to_pylist()}
    assert got_map == want


def test_top_values_per_key_brute(ray_session, monkeypatch):
    import collections

    from ksql_ray.ops.rows import top_values_per_key

    rng = np.random.default_rng(41)
    k = rng.integers(0, 6, 2500)
    v = rng.choice(list("abcdefgh"), 2500,
                   p=[.3, .2, .15, .1, .1, .05, .05, .05])
    vo = v.astype(object)
    vo[rng.random(2500) < 0.04] = None
    t = pa.table({"k": pa.array(k, pa.int64()), "v": pa.array(vo)})
    got = collect(top_values_per_key(
        ray.data.from_arrow(t).repartition(4), ["k"], "v", 3))
    for g in range(6):
        c = collections.Counter(x for x, kk in zip(vo, k)
                                if kk == g and x is not None)
        want = sorted(c.items(), key=lambda x: (-x[1], x[0]))[:3]
        mine = sorted(((r["v"], r["cnt"]) for r in got.to_pylist()
                       if r["k"] == g), key=lambda x: (-x[1], x[0]))
        assert want == mine, g
    ranks = [r["rank"] for r in got.to_pylist()]
    assert set(ranks) <= {0, 1, 2}

    import ksql_ray.ops.smallagg as sa
    monkeypatch.setattr(sa, "_SMALL_PARTIAL_BYTES", 0)
    slow = collect(top_values_per_key(
        ray.data.from_arrow(t).repartition(4), ["k"], "v", 3))
    norm = lambda tb: sorted((r["k"], r["v"], r["cnt"], r["rank"])
                             for r in tb.to_pylist())
    assert norm(got) == norm(slow)
    with pytest.raises(ValueError):
        top_values_per_key(ray.data.from_arrow(t), ["k"], "v", 0)


def test_rank_dist_per_key_brute(ray_session):
    """PERCENT_RANK/CUME_DIST/NTILE vs a per-key python reference,
    including ties, single-row keys, and cnt < n_tiles."""
    from ksql_ray.ops.rows import rank_dist_per_key

    rng = np.random.default_rng(23)
    n = 800
    k = rng.integers(0, 25, n)
    lab = rng.choice(list("abc"), n)       # small alphabet -> real ties
    t = pa.table({"k": pa.array(k, pa.int64()),
                  "eid": pa.array(np.arange(n), pa.int64()),
                  "lab": pa.array(lab)})
    got = {r["eid"]: r for r in collect(rank_dist_per_key(
        ray.data.from_arrow(t).repartition(4), ["k"], "lab",
        n_tiles=4, tiebreak="eid")).to_pylist()}
    for g in np.unique(k):
        rows = sorted([(lab[i], i) for i in np.flatnonzero(k == g)])
        cnt = len(rows)
        small, extra = divmod(cnt, 4)
        for pos, (lb, eid) in enumerate(rows):
            rank = next(j for j, (l2, _) in enumerate(rows) if l2 == lb) + 1
            peers_end = max(j for j, (l2, _) in enumerate(rows)
                            if l2 == lb) + 1
            r = got[eid]
            want_pr = 0.0 if cnt == 1 else (rank - 1) / (cnt - 1)
            assert r["percent_rank"] == pytest.approx(want_pr, abs=1e-12)
            assert r["cume_dist"] == pytest.approx(peers_end / cnt,
                                                   abs=1e-12)
            boundary = extra * (small + 1)
            want_tile = (pos // (small + 1) if pos < boundary else
                         extra + (pos - boundary) // max(small, 1)) + 1
            assert r["tile"] == want_tile, (g, eid)
    with pytest.raises(ValueError):
        rank_dist_per_key(ray.data.from_arrow(t), ["k"], "lab", n_tiles=0)


def test_first_last_per_key_brute(ray_session):
    from ksql_ray.ops.rows import first_last_per_key

    t = _events()
    got = {r["eid"]: r for r in collect(first_last_per_key(
        ray.data.from_arrow(t).repartition(4), ["k"], "ts", ["v"],
        nth=2, tiebreak="eid")).to_pylist()}
    k = t.column("k").to_numpy(zero_copy_only=False)
    for g in np.unique(k):
        idx = np.flatnonzero(k == g)
        order = sorted(idx, key=lambda i: (t.column("ts")[i].as_py(),
                                           t.column("eid")[i].as_py()))
        first_v = t.column("v")[order[0]].as_py()
        last_v = t.column("v")[order[-1]].as_py()
        nth_v = (t.column("v")[order[1]].as_py()
                 if len(order) >= 2 else None)
        for i in idx:
            eid = t.column("eid")[i].as_py()
            assert got[eid]["v_first"] == first_v
            assert got[eid]["v_last"] == last_v
            assert got[eid]["v_nth"] == nth_v
    with pytest.raises(ValueError):
        first_last_per_key(ray.data.from_arrow(t), ["k"], "ts", ["v"],
                           nth=0)


def test_standardize_per_key_brute(ray_session):
    from ksql_ray.ops.rows import standardize_per_key

    t = _events()
    got = {r["eid"]: r for r in collect(standardize_per_key(
        ray.data.from_arrow(t).repartition(4), ["k"],
        "v")).to_pylist()}
    k = t.column("k").to_numpy(zero_copy_only=False)
    v = t.column("v").to_numpy(zero_copy_only=False)
    for g in np.unique(k):
        idx = np.flatnonzero(k == g)
        vals = v[idx]
        mean, sd = vals.mean(), vals.std(ddof=1)
        lo, hi = vals.min(), vals.max()
        for i in idx:
            eid = t.column("eid")[i].as_py()
            want_z = (None if len(vals) < 2 or sd == 0
                      else (v[i] - mean) / sd)
            want_mm = None if hi <= lo else (v[i] - lo) / (hi - lo)
            if want_z is None:
                assert got[eid]["v_z"] is None
            else:
                assert got[eid]["v_z"] == pytest.approx(want_z,
                                                        abs=1e-9)
            if want_mm is None:
                assert got[eid]["v_minmax"] is None
            else:
                assert got[eid]["v_minmax"] == pytest.approx(
                    want_mm, abs=1e-12)


def test_standardize_single_and_constant_keys(ray_session):
    from ksql_ray.ops.rows import standardize_per_key

    t = pa.table({"k": pa.array([1, 2, 2, 3, 3], pa.int64()),
                  "eid": pa.array([0, 1, 2, 3, 4], pa.int64()),
                  "v": pa.array([5.0, 7.0, 7.0, 1.0, 3.0])})
    got = {r["eid"]: r for r in collect(standardize_per_key(
        ray.data.from_arrow(t), ["k"], "v")).to_pylist()}
    assert got[0]["v_z"] is None and got[0]["v_minmax"] is None
    assert got[1]["v_z"] is None and got[1]["v_minmax"] is None
    assert got[3]["v_z"] == pytest.approx(-(2 ** -0.5) * 1, abs=1e-12)
    assert got[3]["v_minmax"] == 0.0 and got[4]["v_minmax"] == 1.0


def _brute_time_range(t, range_us):
    bykey = {}
    for k, ts, e, v in zip(t.column("k").to_pylist(),
                           t.column("ts").to_pylist(),
                           t.column("eid").to_pylist(),
                           t.column("v").to_pylist()):
        bykey.setdefault(k, []).append((ts, e, v))
    want = {}
    for k, lst in bykey.items():
        for ts, e, _ in lst:
            vals = [v for ts2, _, v in lst
                    if ts - range_us <= ts2 <= ts and v is not None]
            want[e] = (round(sum(vals), 6), len(vals)) if vals \
                else (None, 0)
    return want


def test_time_range_agg_brute(ray_session):
    from ksql_ray.ops.rows import time_range_agg

    rng = np.random.default_rng(17)
    n = 600
    v = np.round(rng.uniform(0, 100, n), 2).astype(object)
    v[rng.random(n) < 0.05] = None
    # small ts range so frames overlap and duplicate ts (peers) occur
    t = pa.table({
        "k": pa.array([f"u{x}" for x in rng.integers(0, 15, n)]),
        "eid": pa.array(np.arange(n), pa.int64()),
        "v": pa.array(v, pa.float64()),
        "ts": pa.array(rng.integers(0, 300, n), pa.int64()),
    })
    got = collect(time_range_agg(
        ray.data.from_arrow(t).repartition(4), ["k"], "ts", "v",
        range_us=40))
    want = _brute_time_range(t, 40)
    got_map = {r["eid"]: ((round(r["v_tsum"], 6)
                           if r["v_tsum"] is not None else None),
                          r["v_tcnt"]) for r in got.to_pylist()}
    assert got_map == want
    # tavg consistency on the same frames
    for r in got.to_pylist():
        if r["v_tcnt"]:
            assert r["v_tavg"] == pytest.approx(
                r["v_tsum"] / r["v_tcnt"], rel=1e-12)
        else:
            assert r["v_tavg"] is None


def test_time_range_agg_fallback_band_overflow(ray_session):
    from ksql_ray.ops.rows import time_range_agg

    rng = np.random.default_rng(19)
    n = 300
    # span ~2**55 across >=128 segments -> banded offsets would
    # overflow int64, forcing the per-segment searchsorted fallback
    ts = rng.integers(0, 2 ** 55, n)
    ts[0] = 0
    ts[1] = 2 ** 55
    t = pa.table({
        "k": pa.array([f"u{x}" for x in rng.integers(0, 140, n)]),
        "eid": pa.array(np.arange(n), pa.int64()),
        "v": pa.array(np.round(rng.uniform(0, 10, n), 2)),
        "ts": pa.array(ts, pa.int64()),
    })
    # num_partitions=1 keeps all ~140 segments in one group so
    # 140 * (span + range + 1) > 2**62 and the fallback really runs
    got = collect(time_range_agg(
        ray.data.from_arrow(t).repartition(3), ["k"], "ts", "v",
        range_us=2 ** 53, num_partitions=1))
    want = _brute_time_range(t, 2 ** 53)
    got_map = {r["eid"]: (round(r["v_tsum"], 6), r["v_tcnt"])
               for r in got.to_pylist()}
    assert got_map == want


def test_time_range_agg_null_ts_rejected(ray_session):
    from ksql_ray.ops.rows import time_range_agg

    t = pa.table({"k": ["a", "a"], "eid": [0, 1],
                  "v": [1.0, 2.0],
                  "ts": pa.array([1, None], pa.int64())})
    with pytest.raises(Exception, match="NULL timestamps"):
        collect(time_range_agg(ray.data.from_arrow(t), ["k"], "ts",
                               "v", range_us=5))


# ------------------------------------------------------------- throttle
def test_throttle_chain_brute_force(ray_session):
    from ksql_ray.ops.rows import throttle

    t = pa.table({
        "k": pa.array(["a"] * 5 + ["b"] * 2),
        "ts": pa.array([0, 5, 11, 12, 25, 0, 100], pa.timestamp("us")),
        "id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
    })
    out = throttle(ray.data.from_arrow(t).repartition(3), ["k"], "ts",
                   10, tiebreak="id").take_all()
    # a: emit 0 -> next >= 10 is ts 11 -> next >= 21 is ts 25; b: both
    assert sorted(r["id"] for r in out) == [1, 3, 5, 6, 7]


def test_throttle_ties_break_by_tiebreak(ray_session):
    from ksql_ray.ops.rows import throttle

    t = pa.table({
        "k": pa.array(["a"] * 4),
        "ts": pa.array([0, 10, 10, 10], pa.timestamp("us")),
        "id": pa.array([9, 3, 2, 8], pa.int64()),
    })
    out = throttle(ray.data.from_arrow(t), ["k"], "ts", 10,
                   tiebreak="id").take_all()
    # deadline 10 lands on three equal-ts rows: smallest id (2) wins
    assert sorted(r["id"] for r in out) == [2, 9]


def test_throttle_bucket_vs_chain_semantics(ray_session):
    from ksql_ray.ops.rows import throttle

    # rows at ts 9 and 10 straddle a bucket edge: bucket keeps both,
    # chain suppresses the second (9 + 10 > 10)
    t = pa.table({
        "k": pa.array(["a", "a"]),
        "ts": pa.array([9, 10], pa.timestamp("us")),
        "id": pa.array([1, 2], pa.int64()),
    })
    chain = throttle(ray.data.from_arrow(t), ["k"], "ts", 10,
                     tiebreak="id").take_all()
    bucket = throttle(ray.data.from_arrow(t), ["k"], "ts", 10,
                      tiebreak="id", mode="bucket").take_all()
    assert [r["id"] for r in chain] == [1]
    assert sorted(r["id"] for r in bucket) == [1, 2]


def test_throttle_validation_and_empty(ray_session):
    import pytest as _pytest

    from ksql_ray.ops.rows import throttle

    t = pa.table({"k": pa.array([], type=pa.string()),
                  "ts": pa.array([], type=pa.timestamp("us")),
                  "id": pa.array([], type=pa.int64())})
    assert throttle(ray.data.from_arrow(t), ["k"], "ts", 10).count() == 0
    with _pytest.raises(ValueError):
        throttle(ray.data.from_arrow(t), ["k"], "ts", 0)
    with _pytest.raises(ValueError):
        throttle(ray.data.from_arrow(t), ["k"], "ts", 10, mode="nope")


def test_throttle_null_ts_rows_dropped(ray_session):
    from ksql_ray.ops.rows import throttle

    t = pa.table({"k": pa.array(["a", "a", "a"]),
                  "ts": pa.array([0, None, 20], pa.timestamp("us")),
                  "id": pa.array([1, 2, 3], pa.int64())})
    out = throttle(ray.data.from_arrow(t), ["k"], "ts", 10,
                   tiebreak="id").take_all()
    # NULL ts: never emitted (SQL e.ts >= prev + T matches nothing)
    assert sorted(r["id"] for r in out) == [1, 3]


def test_throttle_session_all_null_ts_key_vs_oracle(ray_session):
    """ADVICE r4 #1: a key whose rows are ALL NULL-ts must emit
    nothing — including the anchor — in both throttle modes, and must
    not contribute to session_stats counters. The gate oracles now
    filter ``WHERE ts IS NOT NULL``, making the stated SQL equivalence
    exact; this pins engine == fixed oracle on exactly that corpus."""
    import duckdb

    from ksql_ray.ops.rows import session_stats, throttle

    t = pa.table({
        "k": pa.array(["nul", "nul", "mix", "mix", "mix", "ok", "ok"]),
        "ts": pa.array([None, None, None, 0, 25, 5, 40],
                       pa.timestamp("us")),
        "id": pa.array([1, 2, 3, 4, 5, 6, 7], pa.int64()),
    })
    ds = ray.data.from_arrow(t).repartition(3)
    chain = throttle(ds, ["k"], "ts", 10, tiebreak="id").take_all()
    bucket = throttle(ds, ["k"], "ts", 10, tiebreak="id",
                      mode="bucket").take_all()
    # key 'nul' contributes NO rows, not even an anchor
    assert sorted(r["id"] for r in chain) == [4, 5, 6, 7]
    assert sorted(r["id"] for r in bucket) == [4, 5, 6, 7]

    con = duckdb.connect()
    con.register("ev_t", t)
    chain_sql = """
    WITH RECURSIVE ev AS (
      SELECT k, epoch_us(ts) AS tus, id FROM ev_t
      WHERE ts IS NOT NULL),
    chain AS (
      SELECT k, tus, id FROM (
        SELECT *, row_number() OVER (PARTITION BY k
                                     ORDER BY tus, id) AS rn
        FROM ev) WHERE rn = 1
      UNION ALL
      SELECT e.k, e.tus, e.id FROM chain c JOIN ev e
        ON e.k = c.k AND e.tus >= c.tus + 10
      WHERE NOT EXISTS (
        SELECT 1 FROM ev e2 WHERE e2.k = c.k AND e2.tus >= c.tus + 10
          AND (e2.tus < e.tus OR (e2.tus = e.tus AND e2.id < e.id))))
    SELECT id FROM chain ORDER BY id"""
    assert [r[0] for r in con.execute(chain_sql).fetchall()] == \
        sorted(r["id"] for r in chain)

    stats = session_stats(ds, ["k"], "ts", 10, tiebreak="id").take_all()
    ref = con.execute("""
    WITH flagged AS (
      SELECT k, id, ts, CASE WHEN lag(ts) OVER w IS NULL
          OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > 10
          THEN 1 ELSE 0 END AS new_sess
      FROM ev_t WHERE ts IS NOT NULL
      WINDOW w AS (PARTITION BY k ORDER BY ts, id)
    ), sessions AS (
      SELECT *, sum(new_sess) OVER (PARTITION BY k
          ORDER BY ts, id ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM flagged
    ), per AS (
      SELECT k, sess_id, count(*) AS n,
             epoch_us(max(ts) - min(ts)) AS dur
      FROM sessions GROUP BY 1, 2)
    SELECT count(*)::BIGINT, sum(n)::BIGINT FROM per""").fetchone()
    assert (stats[0]["n_sessions"], stats[0]["n_events"]) == ref
