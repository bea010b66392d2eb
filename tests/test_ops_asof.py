"""As-of and range-join op tests: randomized equivalence vs pandas
``merge_asof`` / DuckDB inequality joins, plus edge-case pins
(tiebreak determinism, strict inequality, nulls, string keys, empty
sides, mis-sized bucket_width)."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from ksql_ray.ops.asof import asof_join, range_join


def _mk(seed=7, nl=3000, nr=900, nk=30):
    rng = np.random.default_rng(seed)
    left = pd.DataFrame({
        "k": rng.integers(0, nk, nl),
        "t": rng.integers(0, 50_000, nl).astype("int64"),
        "lv": rng.normal(size=nl),
        "rowid": np.arange(nl),
    })
    right = pd.DataFrame({
        "k": rng.integers(0, nk + 5, nr),
        "t": rng.integers(0, 50_000, nr).astype("int64"),
        "rv": rng.normal(size=nr),
        "rid": np.arange(nr),
    }).drop_duplicates(["k", "t"]).reset_index(drop=True)
    return left, right


def _ds(df, parts):
    return ray.data.from_arrow(pa.Table.from_pandas(df)).repartition(parts)


@pytest.mark.parametrize("direction", ["backward", "forward"])
@pytest.mark.parametrize("how,tol", [("left", None), ("inner", None),
                                     ("inner", 4000)])
def test_asof_matches_pandas(ray_session, direction, how, tol):
    left, right = _mk()
    out = asof_join(
        _ds(left, 5), _ds(right, 3), on="t", by=["k"], direction=direction,
        how=how, tolerance=tol, right_cols=["rv", "rid"], num_partitions=8,
    ).to_pandas()
    exp = pd.merge_asof(left.sort_values("t"), right.sort_values("t"),
                        on="t", by="k", direction=direction,
                        suffixes=("", "_r"), tolerance=tol)
    if how == "inner":
        exp = exp[exp.rid.notna()]
    a = out.sort_values("rowid").reset_index(drop=True)
    b = exp.sort_values("rowid").reset_index(drop=True)
    assert len(a) == len(b)
    np.testing.assert_allclose(
        np.nan_to_num(a.rid.to_numpy(float), nan=-1),
        np.nan_to_num(b.rid.to_numpy(float), nan=-1))


def test_asof_tiebreak_and_strict(ray_session):
    left = pd.DataFrame({"k": [1, 1, 2], "t": np.array([10, 10, 10], "int64"),
                         "rowid": [0, 1, 2]})
    right = pd.DataFrame({
        "k": [1, 1, 1, 2], "t": np.array([10, 10, 5, 11], "int64"),
        "rid": np.array([100, 200, 50, 300], "int64")})
    out = asof_join(_ds(left, 1), _ds(right, 1), on="t", by=["k"],
                    tiebreak="rid", right_cols=["rid"], how="left",
                    num_partitions=4).to_pandas().sort_values("rowid")
    # equal-time ties: GREATEST tiebreak wins, deterministically
    assert list(out.rid.fillna(-1)) == [200, 200, -1]
    strict = asof_join(_ds(left, 1), _ds(right, 1), on="t", by=["k"],
                       allow_exact=False, tiebreak="rid", right_cols=["rid"],
                       how="left", num_partitions=4
                       ).to_pandas().sort_values("rowid")
    # strict: the t=10 rights are excluded; t=5 is the latest strictly-before
    assert list(strict.rid.fillna(-1)) == [50, 50, -1]
    fwd = asof_join(_ds(left, 1), _ds(right, 1), on="t", by=["k"],
                    direction="forward", allow_exact=False, tiebreak="rid",
                    right_cols=["rid"], how="left", num_partitions=4
                    ).to_pandas().sort_values("rowid")
    assert list(fwd.rid.fillna(-1)) == [-1, -1, 300]


def test_asof_string_keys_nulls_timestamps(ray_session):
    ts = pd.Timestamp("2024-01-01")
    left = pd.DataFrame({
        "k": ["a", "b", None, "a"],
        "t": [ts, ts + pd.Timedelta("1h"), ts, ts + pd.Timedelta("2h")],
        "rowid": [0, 1, 2, 3]})
    right = pd.DataFrame({
        "k": ["a", "b", "a"],
        "t": [ts - pd.Timedelta("1h"), None, ts + pd.Timedelta("90min")],
        "rid": np.array([1, 2, 3], "int64")})
    out = asof_join(_ds(left, 2), _ds(right, 2), on="t", by=["k"],
                    right_cols=["rid"], how="left", num_partitions=4
                    ).to_pandas().sort_values("rowid")
    # null left key and null right time never match; timestamps compare in us
    assert list(out.rid.fillna(-1)) == [1, -1, -1, 3]


def test_asof_empty_right(ray_session):
    left, right = _mk(nl=100, nr=50)
    out = asof_join(_ds(left, 2), _ds(right.iloc[:0], 1), on="t", by=["k"],
                    right_cols=["rid"], how="left", num_partitions=4
                    ).to_pandas()
    assert len(out) == 100 and out.rid.isna().all()


def test_range_join_matches_duckdb(ray_session, duck):
    left, right = _mk(seed=11)
    right = right.copy()
    rng = np.random.default_rng(3)
    right["t_end"] = right["t"] + rng.integers(0, 6000, len(right))
    out = range_join(_ds(left, 5), _ds(right, 3), on="t", right_start="t",
                     right_end="t_end", by=["k"], bucket_width=3000,
                     how="inner", right_cols=["rid"], num_partitions=8
                     ).to_pandas()
    duck.register("rj_l", left)
    duck.register("rj_r", right)
    exp = duck.execute("""
        SELECT l.rowid, r.rid FROM rj_l l JOIN rj_r r
        ON l.k = r.k AND l.t BETWEEN r.t AND r.t_end""").df()
    # multiset compare: a hash-collision replica bug emits DUPLICATE
    # pairs, which set() comparison would mask
    assert sorted(zip(out.rowid, out.rid)) == sorted(zip(exp.rowid, exp.rid))
    # left-how: every left row appears; match pairs identical
    outl = range_join(_ds(left, 5), _ds(right, 3), on="t", right_start="t",
                      right_end="t_end", by=["k"], bucket_width=3000,
                      how="left", right_cols=["rid"], num_partitions=8
                      ).to_pandas()
    m = outl[outl.rid.notna()]
    assert sorted(zip(m.rowid, m.rid.astype(int))) == sorted(
        zip(exp.rowid, exp.rid))
    assert set(outl.rowid) == set(left.rowid)
    assert len(outl) == len(exp) + (len(left) - exp.rowid.nunique())


def test_range_join_keyless_and_fanout_guard(ray_session):
    left = pd.DataFrame({"t": np.array([5, 15, 25], "int64"), "rowid": [0, 1, 2]})
    right = pd.DataFrame({"s": np.array([0, 20], "int64"),
                          "e": np.array([10, 30], "int64"),
                          "rid": np.array([1, 2], "int64")})
    out = range_join(_ds(left, 1), _ds(right, 1), on="t", right_start="s",
                     right_end="e", bucket_width=8, how="inner",
                     right_cols=["rid"], num_partitions=4).to_pandas()
    assert sorted(zip(out.rowid, out.rid)) == [(0, 1), (2, 2)]
    with pytest.raises(Exception, match="max_fanout|buckets"):
        range_join(_ds(left, 1), _ds(right, 1), on="t", right_start="s",
                   right_end="e", bucket_width=8, max_fanout=1,
                   right_cols=["rid"], num_partitions=4).materialize()
    with pytest.raises(ValueError, match="bucket_width"):
        range_join(_ds(left, 1), _ds(right, 1), on="t", right_start="s",
                   right_end="e", bucket_width=0, right_cols=["rid"])
