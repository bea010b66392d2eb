"""Windowed-aggregate conformance (bounded execution) vs DuckDB.

Reference surface: ksql/window.go:66-88 (TUMBLING/HOPPING/SESSION),
select_builder_test.go:639 (windowed stream query shape). The oracle
expresses window assignment arithmetically (tumbling/hopping) and with
lag-based gap detection (session), FIXTURES.md §5.
"""

import pytest

from ksql_ray import (
    Avg, Count, F, Hopping, HOURS, LatestByOffset, MINUTES, Schema, Select,
    Session, Sum, Tumbling,
)

from conftest import assert_tables_equal

HOUR_US = 3_600_000_000


def check(engine, duck, builder, sql, **kw):
    actual = engine.table(builder)
    expected = duck.execute(sql).arrow()
    assert_tables_equal(actual, expected, **kw)


def test_tumbling_count_sum(engine, duck):
    q = (
        Select(F("user_id"), Count(F("event_id")).As("cnt"), Sum(F("value")).As("sv"))
        .From(Schema("events"))
        .GroupBy(F("user_id"))
        .Windowed(Tumbling(1, HOURS))
    )
    check(engine, duck, q, f"""
        SELECT make_timestamp((epoch_us(ts) // {HOUR_US}) * {HOUR_US}) AS window_start,
               make_timestamp((epoch_us(ts) // {HOUR_US}) * {HOUR_US} + {HOUR_US}) AS window_end,
               user_id, count(event_id) AS cnt, sum(value) AS sv
        FROM events GROUP BY 1, 2, 3
    """)


def test_tumbling_latest(engine, duck):
    q = (
        Select(F("user_id"), LatestByOffset(F("event_type")).As("last_type"))
        .From(Schema("events"))
        .GroupBy(F("user_id"))
        .Windowed(Tumbling(1, HOURS))
    )
    check(engine, duck, q, f"""
        SELECT make_timestamp((epoch_us(ts) // {HOUR_US}) * {HOUR_US}) AS window_start,
               make_timestamp((epoch_us(ts) // {HOUR_US}) * {HOUR_US} + {HOUR_US}) AS window_end,
               user_id, last(event_type ORDER BY ts, event_id) AS last_type
        FROM events GROUP BY 1, 2, 3
    """)


def test_hopping_count(engine, duck):
    size, adv = HOUR_US, HOUR_US // 2
    q = (
        Select(F("user_id"), Count(F("event_id")).As("cnt"))
        .From(Schema("events"))
        .GroupBy(F("user_id"))
        .Windowed(Hopping(60, MINUTES, 30, MINUTES))
    )
    check(engine, duck, q, f"""
        WITH exp AS (
          SELECT user_id, event_id,
                 unnest(range(
                   greatest((epoch_us(ts) - {size}) // {adv} + 1, 0),
                   epoch_us(ts) // {adv} + 1)) AS k
          FROM events
        )
        SELECT make_timestamp(k * {adv}) AS window_start,
               make_timestamp(k * {adv} + {size}) AS window_end,
               user_id, count(event_id) AS cnt
        FROM exp GROUP BY 1, 2, 3
    """)


def test_session_window(engine, duck):
    gap_us = 30 * 60 * 1_000_000
    q = (
        Select(F("user_id"), Count(F("event_id")).As("cnt"), Avg(F("value")).As("av"))
        .From(Schema("events"))
        .GroupBy(F("user_id"))
        .Windowed(Session(30, MINUTES))
    )
    check(engine, duck, q, f"""
        WITH flagged AS (
          SELECT user_id, event_id, value, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {gap_us}
                      THEN 1 ELSE 0 END AS new_sess
          FROM events
          WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
        ), sessions AS (
          SELECT *, sum(new_sess) OVER
                 (PARTITION BY user_id ORDER BY ts, event_id
                  ROWS UNBOUNDED PRECEDING) AS sess_id
          FROM flagged
        )
        SELECT min(ts) AS window_start, max(ts) AS window_end,
               user_id, count(event_id) AS cnt, avg(value) AS av
        FROM sessions GROUP BY user_id, sess_id
    """)


def test_session_latest_by_offset(tmp_path, ray_session, duck):
    """Session windows + LATEST/EARLIEST_BY_OFFSET (regression: route_fn
    omitted the per-agg masked order partials that _p1_entries references
    — broken and untested through round 1)."""
    import duckdb
    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ksql_ray import (
        Catalog, Count, EarliestByOffset, Engine, F, LatestByOffset, MINUTES,
        Relation, Schema, Select, Session,
    )
    from ksql_ray.catalog import Ref

    n = 4000
    rng = np.random.default_rng(7)
    ks = rng.integers(0, 25, n)
    base = 1_700_000_000_000_000
    ts = base + np.sort(rng.integers(0, 3_600_000_000, n))
    tbl = pa.table({
        "k": pa.array([f"u{v:02d}" for v in ks], type=pa.string()),
        "v": pa.array(rng.integers(0, 100, n), type=pa.int64()),
        "tag": pa.array([f"t{v}" for v in rng.integers(0, 9, n)], type=pa.string()),
        "ts": pa.array(ts, type=pa.timestamp("us")),
        "ord": pa.array(np.arange(n), type=pa.int64()),
    })
    p = str(tmp_path / "sess_latest.parquet")
    pq.write_table(tbl, p)
    cat = Catalog()
    cat.create(Relation("sl", Ref.STREAM, tbl.schema, path=p,
                        timestamp_col="ts", order_cols=["ts", "ord"]))
    eng = Engine(cat, num_partitions=4)
    q = (Select(F("k"), Count(F("v")).As("cnt"),
                LatestByOffset(F("tag")).As("last_tag"),
                EarliestByOffset(F("tag")).As("first_tag"))
         .From(Schema("sl")).GroupBy(F("k"))
         .Windowed(Session(5, MINUTES)).EmitFinal())
    got = eng.table(q)
    con = duckdb.connect()
    con.execute(f"CREATE VIEW sl AS SELECT * FROM '{p}'")
    gap = 5 * 60 * 1_000_000
    exp = con.execute(f"""
        WITH flagged AS (
          SELECT *, CASE WHEN lag(ts) OVER w IS NULL
                 OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {gap}
                 THEN 1 ELSE 0 END AS new_sess
          FROM sl WINDOW w AS (PARTITION BY k ORDER BY ts, ord)
        ), sessions AS (
          SELECT *, sum(new_sess) OVER (PARTITION BY k ORDER BY ts, ord
                                        ROWS UNBOUNDED PRECEDING) AS sid
          FROM flagged
        ), tagged AS (
          SELECT *,
            first_value(tag) OVER (PARTITION BY k, sid ORDER BY ts, ord
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS ftag,
            last_value(tag) OVER (PARTITION BY k, sid ORDER BY ts, ord
              ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING) AS ltag
          FROM sessions)
        SELECT min(ts) AS window_start, max(ts) AS window_end, k,
               count(v) AS cnt, any_value(ltag) AS last_tag,
               any_value(ftag) AS first_tag
        FROM tagged GROUP BY k, sid
    """).arrow()
    assert_tables_equal(got, exp)
