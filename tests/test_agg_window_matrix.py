"""Systematic aggregate x window matrix vs DuckDB: every one of the 12
aggregates under unwindowed / TUMBLING / HOPPING / SESSION grouping.
Exists because pairwise gaps hide crashes (session + LATEST_BY_OFFSET
shipped broken through round 1 — route_fn missed the masked order
partials; nothing exercised the combination)."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ksql_ray import (
    Avg, Catalog, CollectList, CollectSet, Count, EarliestByOffset, Engine,
    F, Histogram, Hopping, LatestByOffset, Max, Min, MINUTES, Schema, Select,
    Session, Sum, TopK, TopKDistinct,
)
from ksql_ray.aggregates import CountDistinct, Percentile, StdDev, VarSamp
from ksql_ray.catalog import Ref
from ksql_ray.pipelines.driver_queries import _map_to_json

from conftest import assert_tables_equal

W_US = 10 * 60 * 1_000_000   # tumbling size / hopping size
H_US = 5 * 60 * 1_000_000    # hopping advance
GAP_US = 5 * 60 * 1_000_000  # session gap


@pytest.fixture(scope="module")
def mx(tmp_path_factory):
    n = 3000
    rng = np.random.default_rng(11)
    base = 1_700_000_000_000_000
    tbl = pa.table({
        "k": pa.array([f"g{v}" for v in rng.integers(0, 8, n)], type=pa.string()),
        "v": pa.array(rng.integers(0, 50, n), type=pa.int64()),
        "tag": pa.array([f"t{v}" for v in rng.integers(0, 6, n)], type=pa.string()),
        "ts": pa.array(base + np.sort(rng.integers(0, 2 * 3_600_000_000, n)),
                       type=pa.timestamp("us")),
        "ord": pa.array(np.arange(n), type=pa.int64()),
    })
    p = str(tmp_path_factory.mktemp("mx") / "mx.parquet")
    pq.write_table(tbl, p)
    cat = Catalog()
    cat.create(Relation_mx(tbl.schema, p))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW mx AS SELECT * FROM '{p}'")
    return {"cat": cat, "con": con}


def Relation_mx(schema, path):
    from ksql_ray import Relation

    return Relation("mx", Ref.STREAM, schema, path=path,
                    timestamp_col="ts", order_cols=["ts", "ord"])


# agg key -> (builder expr, SQL aggregate over the per-window row set,
#             needs _map_to_json post)
AGGS = {
    "count": (lambda: Count(F("v")).As("a"), "count(v) AS a", False),
    "sum": (lambda: Sum(F("v")).As("a"), "sum(v) AS a", False),
    "avg": (lambda: Avg(F("v")).As("a"), "avg(v) AS a", False),
    "min": (lambda: Min(F("v")).As("a"), "min(v) AS a", False),
    "max": (lambda: Max(F("v")).As("a"), "max(v) AS a", False),
    "collect_list": (lambda: CollectList(F("v")).As("a"),
                     "list(v ORDER BY ts, ord) AS a", False),
    "collect_set": (lambda: CollectSet(F("tag")).As("a"),
                    "list(DISTINCT tag ORDER BY tag) AS a", False),
    "latest": (lambda: LatestByOffset(F("tag")).As("a"),
               "last(tag ORDER BY ts, ord) AS a", False),
    "earliest": (lambda: EarliestByOffset(F("tag")).As("a"),
                 "first(tag ORDER BY ts, ord) AS a", False),
    "topk": (lambda: TopK(F("v"), 3).As("a"),
             "(list(v ORDER BY v DESC))[1:3] AS a", False),
    "topk_distinct": (lambda: TopKDistinct(F("v"), 3).As("a"),
                      "(list(DISTINCT v ORDER BY v DESC))[1:3] AS a", False),
    "histogram": (lambda: Histogram(F("tag"), 100).As("a"), None, True),
    "percentile": (lambda: Percentile(F("v"), 0.75).As("a"),
                   "quantile_disc(v, 0.75) AS a", False),
    "count_distinct": (lambda: CountDistinct(F("tag")).As("a"),
                       "count(DISTINCT tag) AS a", False),
    "var_samp": (lambda: VarSamp(F("v")).As("a"),
                 "var_samp(v) AS a", False),
    "stddev": (lambda: StdDev(F("v")).As("a"),
               "stddev_samp(v) AS a", False),
}

WINDOWS = ["none", "tumbling", "hopping", "session"]


def oracle_sql(window: str, agg_sql: str | None) -> str:
    if window == "none":
        if agg_sql is None:
            return """
            WITH cnt AS (SELECT k, tag, count(*) AS c FROM mx GROUP BY k, tag)
            SELECT k, string_agg(tag || ':' || c, ',' ORDER BY tag) AS a
            FROM cnt GROUP BY k"""
        return f"SELECT k, {agg_sql} FROM mx GROUP BY k"
    if window == "tumbling":
        win = (f"make_timestamp((epoch_us(ts) // {W_US}) * {W_US}) AS window_start, "
               f"make_timestamp((epoch_us(ts) // {W_US}) * {W_US} + {W_US}) AS window_end")
        if agg_sql is None:
            return f"""
            WITH rs AS (SELECT *, (epoch_us(ts) // {W_US}) AS w FROM mx),
            cnt AS (SELECT w, k, tag, count(*) AS c FROM rs GROUP BY w, k, tag)
            SELECT make_timestamp(w * {W_US}) AS window_start,
                   make_timestamp(w * {W_US} + {W_US}) AS window_end,
                   k, string_agg(tag || ':' || c, ',' ORDER BY tag) AS a
            FROM cnt GROUP BY w, k"""
        return f"SELECT {win}, k, {agg_sql} FROM mx GROUP BY 1, 2, 3"
    if window == "hopping":
        exp = (f"SELECT *, unnest(range(greatest((epoch_us(ts) - {W_US}) // {H_US} + 1, 0), "
               f"epoch_us(ts) // {H_US} + 1)) AS w FROM mx")
        if agg_sql is None:
            return f"""
            WITH rs AS ({exp}),
            cnt AS (SELECT w, k, tag, count(*) AS c FROM rs GROUP BY w, k, tag)
            SELECT make_timestamp(w * {H_US}) AS window_start,
                   make_timestamp(w * {H_US} + {W_US}) AS window_end,
                   k, string_agg(tag || ':' || c, ',' ORDER BY tag) AS a
            FROM cnt GROUP BY w, k"""
        return f"""
        WITH exp AS ({exp})
        SELECT make_timestamp(w * {H_US}) AS window_start,
               make_timestamp(w * {H_US} + {W_US}) AS window_end,
               k, {agg_sql}
        FROM exp GROUP BY 1, 2, 3"""
    # session
    sessions = f"""
      SELECT * FROM (
        SELECT *, sum(new_sess) OVER (PARTITION BY k ORDER BY ts, ord
                                      ROWS UNBOUNDED PRECEDING) AS sid
        FROM (SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                     OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {GAP_US}
                     THEN 1 ELSE 0 END AS new_sess
              FROM mx WINDOW w AS (PARTITION BY k ORDER BY ts, ord)))"""
    if agg_sql is None:
        return f"""
        WITH rs AS ({sessions}),
        cnt AS (SELECT k, sid, tag, count(*) AS c FROM rs GROUP BY k, sid, tag),
        h AS (SELECT k, sid, string_agg(tag || ':' || c, ',' ORDER BY tag) AS a
              FROM cnt GROUP BY k, sid),
        b AS (SELECT k, sid, min(ts) AS window_start, max(ts) AS window_end
              FROM rs GROUP BY k, sid)
        SELECT b.window_start, b.window_end, b.k AS k, h.a AS a
        FROM b JOIN h ON b.k = h.k AND b.sid = h.sid"""
    return f"""
    WITH rs AS ({sessions})
    SELECT min(ts) AS window_start, max(ts) AS window_end, k, {agg_sql}
    FROM rs GROUP BY k, sid"""


@pytest.mark.parametrize("window", WINDOWS)
@pytest.mark.parametrize("agg", sorted(AGGS))
def test_agg_window_matrix(mx, ray_session, window, agg):
    make_expr, agg_sql, is_hist = AGGS[agg]
    q = Select(F("k"), make_expr()).From(Schema("mx")).GroupBy(F("k"))
    if window == "tumbling":
        q = q.Windowed(Tumbling_())
    elif window == "hopping":
        q = q.Windowed(Hopping(10, MINUTES, 5, MINUTES))
    elif window == "session":
        q = q.Windowed(Session(5, MINUTES))
    q = q.EmitChanges() if window == "none" else q.EmitFinal()
    eng = Engine(mx["cat"], num_partitions=4)
    got = eng.table(q)
    if is_hist:
        got = _map_to_json(got, "a")
    exp = mx["con"].execute(oracle_sql(window, agg_sql)).arrow()
    tol = 1e-9 if agg == "avg" else 0
    assert_tables_equal(got, exp, float_tol=max(tol, 1e-12))


def Tumbling_():
    from ksql_ray import Tumbling

    return Tumbling(10, MINUTES)


@pytest.mark.parametrize("window", ["tumbling", "hopping", "session"])
@pytest.mark.parametrize("agg", sorted(AGGS))
def test_streaming_matrix_equals_bounded(mx, ray_session, tmp_path, window, agg):
    """Streaming EMIT FINAL over micro-batches + end-of-stream flush must
    equal the bounded windowed result for EVERY aggregate — exercises the
    repartial/remerge machinery (vectorized state for tumbling, interval
    accumulators for session) across epochs."""
    import glob

    import pyarrow.parquet as pq

    from ksql_ray.streaming.driver import StreamingJob

    make_expr, _sql, is_hist = AGGS[agg]

    def build():
        q = Select(F("k"), make_expr()).From(Schema("mx")).GroupBy(F("k"))
        win = (Tumbling_() if window == "tumbling"
               else Hopping(10, MINUTES, 5, MINUTES) if window == "hopping"
               else Session(5, MINUTES))
        q = q.Windowed(win)
        return q.EmitFinal()

    eng = Engine(mx["cat"], num_partitions=4)
    expected = eng.table(build())

    rel = mx["cat"].get("mx")
    tbl = pq.read_table(rel.path)
    tbl = tbl.take(pa.compute.sort_indices(
        tbl, sort_keys=[("ts", "ascending"), ("ord", "ascending")]
    ))
    n = tbl.num_rows
    batches = [tbl.slice(i * n // 6, (i + 1) * n // 6 - i * n // 6) for i in range(6)]
    job = StreamingJob(build(), mx["cat"], str(tmp_path / f"mxs_{window}_{agg}"),
                       num_partitions=3, lateness_us=1 << 60)
    for b in batches:
        job.process_epoch([b])
    job.finish()
    got = job.result()
    if is_hist:
        got = _map_to_json(got, "a")
        expected = _map_to_json(expected, "a")
    assert_tables_equal(got, expected, float_tol=1e-12)
