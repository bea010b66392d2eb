"""explode/unnest, regex extract, column profile, sampling ops:
edge-case pins. sf0.01 DuckDB oracles run via op_unnest /
op_regex_extract / op_profile / op_weighted_sample / op_split_assign /
op_sample_per_key in test_driver_contract.py."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from conftest import collect
from ksql_ray.ops.explode import explode_list, split_tokens
from ksql_ray.ops.extract import regex_extract
from ksql_ray.ops.profile import profile_columns
from ksql_ray.ops.sample import sample_per_key, split_assign, weighted_sample


def test_explode_null_empty_and_pos(ray_session):
    t = pa.table({
        "id": pa.array([1, 2, 3, 4], pa.int64()),
        "l": pa.array([["a", "b"], None, [], ["c", None, "d"]],
                      pa.list_(pa.string())),
    })
    got = collect(explode_list(ray.data.from_arrow(t), "l", keep=["id"],
                               value_out="v", pos_col="pos"))
    rows = sorted(got.to_pylist(), key=lambda r: (r["id"], r["pos"]))
    # NULL/empty lists emit nothing; NULL elements are kept
    assert rows == [
        {"id": 1, "v": "a", "pos": 1}, {"id": 1, "v": "b", "pos": 2},
        {"id": 4, "v": "c", "pos": 1}, {"id": 4, "v": None, "pos": 2},
        {"id": 4, "v": "d", "pos": 3},
    ]


def test_split_tokens_consecutive_spaces(ray_session):
    t = pa.table({"id": pa.array([1], pa.int64()),
                  "text": pa.array(["a  b"])})
    got = collect(split_tokens(ray.data.from_arrow(t), "text", ["id"]))
    # DuckDB str_split keeps the empty token between the two spaces
    assert [r["tok"] for r in sorted(got.to_pylist(),
                                     key=lambda r: r["pos"])] == \
        ["a", "", "b"]


def test_regex_extract_miss_is_null(ray_session):
    t = pa.table({"id": pa.array([1, 2], pa.int64()),
                  "s": pa.array(['x=42 y=7', 'no numbers here'])})
    got = collect(regex_extract(
        ray.data.from_arrow(t), "s", r"x=(?P<x>[0-9]+) y=(?P<y>[0-9]+)",
        keep=["id"]))
    rows = sorted(got.to_pylist(), key=lambda r: r["id"])
    assert rows == [{"id": 1, "x": "42", "y": "7"},
                    {"id": 2, "x": None, "y": None}]
    with pytest.raises(ValueError):
        regex_extract(ray.data.from_arrow(t), "s", "[0-9]+")


def test_profile_exact(ray_session):
    t = pa.table({
        "a": pa.array([1, 2, 2, None, 3], pa.int64()),
        "b": pa.array(["x", "x", None, None, "y"]),
        "c": pa.array([1.5, np.nan, 2.5, 2.5, -1.0]),
    })
    got = {r["col"]: r for r in collect(profile_columns(
        ray.data.from_arrow(t).repartition(3),
        ["a", "b", "c"])).to_pylist()}
    assert got["a"] == {"col": "a", "n_rows": 5, "n_null": 1,
                        "n_distinct": 3, "min_v": 1.0, "max_v": 3.0}
    assert got["b"]["n_null"] == 2 and got["b"]["n_distinct"] == 2
    assert got["b"]["min_v"] is None and got["b"]["max_v"] is None
    # NaN counts as a distinct value but is ignored for min/max
    # (DuckDB sorts NaN above everything; this op treats it as NULL
    # for range stats — documented divergence, gate columns are NaN-free)
    assert got["c"]["n_null"] == 0 and got["c"]["n_distinct"] == 4
    assert got["c"]["min_v"] == -1.0 and got["c"]["max_v"] == 2.5


def test_profile_paths_agree(ray_session, monkeypatch):
    import ksql_ray.ops.profile as prof

    rng = np.random.default_rng(3)
    t = pa.table({"k": pa.array(rng.integers(0, 50, 2000), pa.int64()),
                  "s": pa.array([f"v{x}" for x in
                                 rng.integers(0, 9, 2000)])})
    fast = collect(profile_columns(
        ray.data.from_arrow(t).repartition(4), ["k", "s"]))
    monkeypatch.setattr(prof, "_SMALL_PARTIAL_BYTES", 0)
    slow = collect(profile_columns(
        ray.data.from_arrow(t).repartition(4), ["k", "s"]))
    key = lambda tbl: sorted(map(str, tbl.to_pylist()))
    assert key(fast) == key(slow)


def test_grouped_corr_brute(ray_session):
    from ksql_ray.ops.profile import grouped_corr

    rng = np.random.default_rng(5)
    n = 900
    x = np.round(rng.normal(10, 3, n), 2)
    y = x * 0.5 + rng.normal(0, 1, n)
    x[rng.random(n) < 0.05] = np.nan
    y[rng.random(n) < 0.05] = np.nan
    k = rng.integers(0, 5, n)
    t = pa.table({"k": pa.array(k, pa.int64()), "x": pa.array(x),
                  "y": pa.array(y)})
    got = {r["k"]: r for r in collect(grouped_corr(
        ray.data.from_arrow(t).repartition(4), ["k"], "x",
        "y")).to_pylist()}
    for g in range(5):
        ok = (k == g) & ~np.isnan(x) & ~np.isnan(y)
        want = np.corrcoef(x[ok], y[ok])[0, 1]
        cov = np.cov(x[ok], y[ok])[0, 1]
        r = got[g]
        assert r["n"] == int(ok.sum())
        assert r["corr"] == pytest.approx(want, rel=1e-9)
        assert r["covar"] == pytest.approx(cov, rel=1e-9)
    # degenerate groups: n < 2 and zero variance -> NULL
    t2 = pa.table({"k": pa.array([0, 1, 1], pa.int64()),
                   "x": pa.array([1.0, 2.0, 2.0]),
                   "y": pa.array([1.0, 3.0, 4.0])})
    got2 = {r["k"]: r for r in collect(grouped_corr(
        ray.data.from_arrow(t2), ["k"], "x", "y")).to_pylist()}
    assert got2[0]["corr"] is None and got2[0]["covar"] is None
    assert got2[1]["corr"] is None          # zero x-variance
    assert got2[1]["covar"] == 0.0


def test_weighted_sample_null_and_clamp(ray_session):
    t = pa.table({"id": pa.array(list(range(200)), pa.int64()),
                  "w": pa.array([None, 0.0] + [1e9] * 98 + [50.0] * 100)})
    got = collect(weighted_sample(ray.data.from_arrow(t), "id", "w",
                                  rate=0.5, scale=100.0))
    ids = {r["id"] for r in got.to_pylist()}
    assert 0 not in ids and 1 not in ids     # NULL and zero weight
    assert all(i in ids for i in range(2, 100))  # p clamps to 1
    kept_50 = sum(1 for i in ids if i >= 100)
    assert 5 <= kept_50 <= 45                # p = 0.25 of 100 rows
    with pytest.raises(ValueError):
        weighted_sample(ray.data.from_arrow(t), "id", "w", 0.5, 0.0)


def test_split_assign_deterministic(ray_session):
    t = pa.table({"k": pa.array([f"u{i}" for i in range(500)] * 2)})
    got = collect(split_assign(ray.data.from_arrow(t).repartition(4),
                               "k"))
    by_key = {}
    for r in got.to_pylist():
        by_key.setdefault(r["k"], set()).add(r["split"])
    # the same key always lands in the same split
    assert all(len(v) == 1 for v in by_key.values())
    frac = sum(1 for v in by_key.values() if v == {"train"}) / 500
    assert 0.7 < frac < 0.9
    with pytest.raises(ValueError):
        split_assign(ray.data.from_arrow(t), "k",
                     splits=[("a", 60), ("b", 60)])


def test_sample_per_key_stable(ray_session):
    t = pa.table({
        "k": pa.array([i % 7 for i in range(300)], pa.int64()),
        "id": pa.array(list(range(300)), pa.int64()),
    })
    a = collect(sample_per_key(ray.data.from_arrow(t).repartition(3),
                               ["k"], "id", 4))
    b = collect(sample_per_key(ray.data.from_arrow(t).repartition(5),
                               ["k"], "id", 4))
    norm = lambda tbl: sorted((r["k"], r["id"]) for r in tbl.to_pylist())
    assert norm(a) == norm(b)                # partition-layout invariant
    counts = {}
    for k, _ in norm(a):
        counts[k] = counts.get(k, 0) + 1
    assert all(c == 4 for c in counts.values())
    assert set(a.column_names) == {"k", "id"}


def test_grouped_hll_accuracy_and_paths(ray_session, monkeypatch):
    from ksql_ray.ops.hll import grouped_hll, grouped_hll_registers

    rng = np.random.default_rng(31)
    n = 20000
    k = rng.integers(0, 8, n)
    v = rng.integers(0, 3000, n)
    t = pa.table({"k": pa.array(k, pa.int64()),
                  "v": pa.array(v, pa.int64())})
    est = {r["k"]: r["est"] for r in collect(grouped_hll(
        ray.data.from_arrow(t).repartition(4), ["k"], "v",
        p=10)).to_pylist()}
    for g in range(8):
        exact = len(set(v[k == g].tolist()))
        assert abs(est[g] - exact) / exact < 0.15, (g, exact, est[g])

    # register state is partition-layout invariant and path-invariant
    fast = collect(grouped_hll_registers(
        ray.data.from_arrow(t).repartition(3), ["k"], "v", p=6))
    import ksql_ray.ops.smallagg as sa
    monkeypatch.setattr(sa, "_SMALL_PARTIAL_BYTES", 0)
    slow = collect(grouped_hll_registers(
        ray.data.from_arrow(t).repartition(7), ["k"], "v", p=6))
    norm = lambda tb: sorted((r["k"], r["register"], r["rho"])
                             for r in tb.to_pylist())
    assert norm(fast) == norm(slow)
    with pytest.raises(ValueError):
        grouped_hll_registers(ray.data.from_arrow(t), ["k"], "v", p=2)


def test_weighted_sample_monotone_in_rate(ray_session):
    """kept(rate1) is a SUBSET of kept(rate2) for rate1 < rate2 — the
    threshold is monotone in rate per row, so raising the rate can only
    add rows (the property resumable sampling pipelines rely on)."""
    rng = np.random.default_rng(47)
    t = pa.table({"id": pa.array(np.arange(3000), pa.int64()),
                  "w": pa.array(np.round(rng.uniform(0, 100, 3000), 2))})

    def kept(rate):
        got = collect(weighted_sample(
            ray.data.from_arrow(t).repartition(4), "id", "w",
            rate=rate, scale=100.0, method="fast"))
        return {r["id"] for r in got.to_pylist()}

    a, b, c = kept(0.05), kept(0.2), kept(0.8)
    assert a <= b <= c
    assert len(a) < len(b) < len(c)


def test_split_assign_seed_reshuffles_but_partitions(ray_session):
    t = pa.table({"k": pa.array([f"u{i}" for i in range(800)])})

    def splits(seed):
        got = collect(split_assign(ray.data.from_arrow(t), "k",
                                   seed=seed))
        return {r["k"]: r["split"] for r in got.to_pylist()}

    s1, s2 = splits(""), splits("v2")
    assert set(s1) == set(s2)                      # total partition
    assert any(s1[k] != s2[k] for k in s1)         # seed reshuffles
    for s in (s1, s2):                             # proportions hold
        frac = sum(1 for v in s.values() if v == "train") / len(s)
        assert 0.7 < frac < 0.9
