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
