"""Adversarial edge cases: null group keys, all-null aggregate inputs,
empty inputs, duplicate aggregate expressions, hopping fan-out,
single-row groups."""

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ksql_ray import (
    Avg, Catalog, CollectList, CollectSet, Count, Engine, F,
    LatestByOffset, Max, Min, Relation, Schema, Select, Sum, TopK,
    Hopping, SECONDS, Tumbling,
)
from ksql_ray.catalog import Ref

from conftest import assert_tables_equal


@pytest.fixture(scope="module")
def edge_cat(tmp_path_factory, ray_session):
    tbl = pa.table({
        "k": pa.array(["a", "a", None, None, "b", "c"], type=pa.string()),
        "v": pa.array([1, None, 3, None, 5, None], type=pa.int64()),
        "d": pa.array([1.0, 2.0, None, None, None, None], type=pa.float64()),
        "ts": pa.array(
            [1_000_000_000_000_000 + i * 1_000_000 for i in range(6)],
            type=pa.timestamp("us"),
        ),
        "ord": pa.array(list(range(6)), type=pa.int64()),
    })
    p = str(tmp_path_factory.mktemp("edge") / "t.parquet")
    pq.write_table(tbl, p)
    cat = Catalog()
    cat.create(Relation("t", Ref.STREAM, tbl.schema, path=p,
                        timestamp_col="ts", order_cols=["ord"]))
    return cat


def test_null_group_keys(edge_cat, duck):
    import duckdb

    eng = Engine(edge_cat, num_partitions=2)
    q = (Select(F("k"), Count(F("v")).As("cv"), Sum(F("v")).As("sv"),
                Min(F("d")).As("mn"), Max(F("d")).As("mx"))
         .From(Schema("t")).GroupBy(F("k")).EmitChanges())
    t = eng.table(q)
    rows = {r["k"]: r for r in t.to_pylist()}
    assert rows[None]["cv"] == 1 and rows[None]["sv"] == 3
    assert rows["a"] == {"k": "a", "cv": 1, "sv": 1, "mn": 1.0, "mx": 2.0}
    assert rows["b"]["cv"] == 1
    # all-null aggregate input -> NULL sum/min/max, count 0
    assert rows["c"] == {"k": "c", "cv": 0, "sv": None, "mn": None, "mx": None}


def test_all_null_latest_and_lists(edge_cat):
    eng = Engine(edge_cat, num_partitions=2)
    q = (Select(F("k"), LatestByOffset(F("v")).As("lv"),
                CollectList(F("v")).As("lst"), CollectSet(F("v")).As("st"),
                TopK(F("v"), 2).As("tk"))
         .From(Schema("t")).GroupBy(F("k")).EmitChanges())
    rows = {r["k"]: r for r in eng.table(q).to_pylist()}
    # latest skips nulls; lists drop nothing except set/topk drop nulls
    assert rows["a"]["lv"] == 1
    assert rows["c"]["lv"] is None
    assert rows["c"]["st"] == [] and rows["c"]["tk"] == []
    assert rows[None]["lv"] == 3


def test_empty_input_aggregate(tmp_path, ray_session):
    tbl = pa.table({
        "k": pa.array([], type=pa.string()),
        "v": pa.array([], type=pa.int64()),
    })
    p = str(tmp_path / "empty.parquet")
    pq.write_table(tbl, p)
    cat = Catalog()
    cat.create(Relation("e", Ref.TABLE, tbl.schema, path=p))
    eng = Engine(cat, num_partitions=2)
    q = Select(F("k"), Count(F("v")).As("c")).From(Schema("e")).GroupBy(F("k"))
    t = eng.table(q)
    assert t.num_rows == 0
    assert set(t.column_names) == {"k", "c"}


def test_duplicate_aggregate_expressions(edge_cat):
    """The same aggregate used twice (projection + HAVING) computes once
    and resolves consistently."""
    eng = Engine(edge_cat, num_partitions=2)
    q = (Select(F("k"), Sum(F("v")).As("s1"), Avg(F("v")).As("av"))
         .From(Schema("t")).GroupBy(F("k"))
         .Having(Sum(F("v")).GreaterEq(1))
         .EmitChanges())
    rows = {r["k"]: r for r in eng.table(q).to_pylist()}
    assert set(rows) == {"a", "b", None}  # c (null sum) filtered by HAVING


def test_hopping_wide_fanout(tmp_path, ray_session, duck):
    """size=10s advance=1s: every row lands in 10 windows."""
    import duckdb

    n = 500
    tbl = pa.table({
        "k": pa.array(["x"] * n),
        "ts": pa.array(
            [1_000_000_000_000_000 + i * 777_000 for i in range(n)],
            type=pa.timestamp("us"),
        ),
        "v": pa.array(list(range(n)), type=pa.int64()),
    })
    p = str(tmp_path / "hop.parquet")
    pq.write_table(tbl, p)
    cat = Catalog()
    cat.create(Relation("h", Ref.STREAM, tbl.schema, path=p,
                        timestamp_col="ts", order_cols=["ts"]))
    eng = Engine(cat, num_partitions=2)
    q = (Select(F("k"), Count(F("v")).As("c"))
         .From(Schema("h")).GroupBy(F("k"))
         .Windowed(Hopping(10, SECONDS, 1, SECONDS)))
    got = eng.table(q)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW h AS SELECT * FROM '{p}'")
    exp = con.execute("""
        WITH exp AS (
          SELECT k, v, unnest(range(
            greatest((epoch_us(ts) - 10000000) // 1000000 + 1, 0),
            epoch_us(ts) // 1000000 + 1)) AS w
          FROM h)
        SELECT make_timestamp(w * 1000000) AS window_start,
               make_timestamp(w * 1000000 + 10000000) AS window_end,
               k, count(v) AS c
        FROM exp GROUP BY 1, 2, 3
    """).arrow()
    con.close()
    assert_tables_equal(got, exp)


def test_single_row_groups(edge_cat):
    eng = Engine(edge_cat, num_partitions=8)  # more partitions than groups
    q = (Select(F("k"), Count(F("ord")).As("c"))
         .From(Schema("t")).GroupBy(F("k")).EmitChanges())
    t = eng.table(q)
    assert t.num_rows == 4  # a, b, c, NULL


def test_json_and_csv_sources(tmp_path, ray_session):
    """VALUE_FORMAT=JSON/CSV sources (ksql/metadata.go WITH analog; the
    reference's wire format is JSON, kinds/fmt.go:7-9)."""
    import json

    rows = [{"k": "a", "v": 1}, {"k": "b", "v": 2}, {"k": "a", "v": 3}]
    jp = str(tmp_path / "d.json")
    with open(jp, "w") as f:
        for r in rows:
            f.write(json.dumps(r) + "\n")
    cp = str(tmp_path / "d.csv")
    with open(cp, "w") as f:
        f.write("k,v\n" + "\n".join(f"{r['k']},{r['v']}" for r in rows))

    schema = pa.schema([("k", pa.string()), ("v", pa.int64())])
    cat = Catalog()
    cat.create(Relation("j", Ref.TABLE, schema, path=jp,
                        properties={"value_format": "JSON"}))
    cat.create(Relation("c", Ref.TABLE, schema, path=cp,
                        properties={"value_format": "CSV"}))
    eng = Engine(cat, num_partitions=2)
    for name in ("j", "c"):
        q = (Select(F("k"), Sum(F("v")).As("s"))
             .From(Schema(name)).GroupBy(F("k")))
        got = {r["k"]: r["s"] for r in eng.table(q).to_pylist()}
        assert got == {"a": 4, "b": 2}


def test_bigint_min_max_exact(tmp_path, ray_session):
    # MIN/MAX over BIGINTs beyond 2^53 must be exact — a float64 sort key
    # cannot distinguish 2^53 and 2^53+1 (ADVICE r1, aggregates._seg_extreme)
    big = 1 << 53
    tbl = pa.table({
        "k": pa.array(["g"] * 4, type=pa.string()),
        "v": pa.array([big + 1, big, -big - 1, -big], type=pa.int64()),
        "ts": pa.array([1_000_000_000_000_000 + i for i in range(4)],
                       type=pa.timestamp("us")),
        "ord": pa.array(list(range(4)), type=pa.int64()),
    })
    p = str(tmp_path / "big.parquet")
    pq.write_table(tbl, p)
    cat = Catalog()
    cat.create(Relation("big", Ref.STREAM, tbl.schema, path=p,
                        timestamp_col="ts", order_cols=["ord"]))
    eng = Engine(cat, num_partitions=2)
    q = (Select(F("k"), Min(F("v")).As("mn"), Max(F("v")).As("mx"),
                TopK(F("v"), 2).As("tk"))
         .From(Schema("big")).GroupBy(F("k")).EmitChanges())
    rows = eng.table(q).to_pylist()
    assert rows == [{"k": "g", "mn": -big - 1, "mx": big + 1,
                     "tk": [big + 1, big]}]


def test_histogram_partial_is_bounded(ray_session):
    # streaming state for HISTOGRAM must be O(buckets) per key, not O(rows):
    # the phase-1 partial is compressed to (value, count) pairs and every
    # re-merge keeps it compressed (ADVICE r1, Histogram.repartial)
    from ksql_ray.aggregates import Histogram
    from ksql_ray.exec.groupby import GroupByPlan

    h = Histogram(F("v"), 3)
    plan = GroupByPlan([F("k")], [h], [], None, "ts",
                       num_partitions=2, include_ts=True)
    n = 10_000
    batch = pa.table({
        "k": pa.array(["a"] * n, type=pa.string()),
        "v": pa.array([f"w{i % 50:02d}" for i in range(n)], type=pa.string()),
        "ts": pa.array([1_000_000_000_000_000 + i for i in range(n)],
                       type=pa.timestamp("us")),
    })
    partial = plan.partial_fn(batch)
    # one partial row for the single key; its value list holds at most
    # `buckets` compressed pairs, never the 10k raw values
    lst = partial.column("__a0_list").to_pylist()[0]
    cnts = partial.column("__a0_hcnt").to_pylist()[0]
    assert len(lst) == 3 and lst == ["w00", "w01", "w02"]
    assert cnts == [200, 200, 200]
    # re-merge keeps it compressed and counts exact
    merged = plan.remerge_fn(pa.concat_tables([partial, partial]))
    assert merged.column("__a0_hcnt").to_pylist()[0] == [400, 400, 400]
    final = plan.merge_fn(pa.concat_tables([partial, partial]))
    hist = final.column("__agg0").to_pylist()[0]
    assert dict(hist) == {"w00": 400, "w01": 400, "w02": 400}
