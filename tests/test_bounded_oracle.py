"""Bounded (pull-query) conformance vs the DuckDB oracle.

Mirrors the reference's golden SELECT corpus (select_builder_test.go:49-520)
as *executed-result* equality over the driver testdata instead of golden
SQL strings (FIXTURES.md §5 'Bounded-query oracle').
"""

import pytest

from ksql_ray import (
    Mod,
    And, Avg, Case, CaseWhen, CollectList, CollectSet, Count, Div, F,
    LatestByOffset, EarliestByOffset, Literal, Max, Min, Mul, Or, Schema,
    Select, Sub, Sum, TopK, TopKDistinct,
)

from conftest import assert_tables_equal


def check(engine, duck, builder, sql, **kw):
    actual = engine.table(builder)
    expected = duck.execute(sql).arrow()
    assert_tables_equal(actual, expected, **kw)


def test_filter_project(engine, duck):
    q = (
        Select(F("l_orderkey"), F("l_linenumber"), F("l_quantity"))
        .From(Schema("lineitem"))
        .Where(F("l_quantity").Greater(45))
    )
    check(engine, duck, q,
          "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity > 45")


def test_where_and_chain(engine, duck):
    q = (
        Select(F("l_orderkey"), F("l_linenumber"))
        .From(Schema("lineitem"))
        .Where(F("l_quantity").Greater(30), F("l_discount").LessEq(0.02))
    )
    check(engine, duck, q,
          "SELECT l_orderkey, l_linenumber FROM lineitem "
          "WHERE l_quantity > 30 AND l_discount <= 0.02")


def test_or_in_null(engine, duck):
    q = (
        Select(F("o_orderkey"), F("o_orderstatus"))
        .From(Schema("orders"))
        .Where(Or(F("o_orderstatus").In("F", "P"), F("o_totalprice").Greater(300000.0)))
    )
    check(engine, duck, q,
          "SELECT o_orderkey, o_orderstatus FROM orders "
          "WHERE o_orderstatus IN ('F','P') OR o_totalprice > 300000.0")


def test_arithmetic_projection(engine, duck):
    q = (
        Select(
            F("l_orderkey"),
            F("l_linenumber"),
            Mul(F("l_extendedprice"), Sub(Literal(1.0), F("l_discount"))).As("revenue"),
            Div(F("l_quantity"), 2.0).As("half_qty"),
        )
        .From(Schema("lineitem"))
        .Where(F("l_quantity").GreaterEq(48))
    )
    check(engine, duck, q,
          "SELECT l_orderkey, l_linenumber, l_extendedprice*(1.0-l_discount) AS revenue, "
          "l_quantity/2.0 AS half_qty FROM lineitem WHERE l_quantity >= 48")


def test_case_projection(engine, duck):
    q = (
        Select(
            F("o_orderkey"),
            Case(
                "bucket",
                CaseWhen(F("o_totalprice").Greater(250000.0), "big"),
                CaseWhen(F("o_totalprice").Greater(100000.0), "mid"),
            ).Else("small"),
        )
        .From(Schema("orders"))
    )
    check(engine, duck, q,
          "SELECT o_orderkey, CASE WHEN o_totalprice > 250000.0 THEN 'big' "
          "WHEN o_totalprice > 100000.0 THEN 'mid' ELSE 'small' END AS bucket FROM orders")


def test_groupby_basic_aggs(engine, duck):
    q = (
        Select(
            F("l_returnflag"), F("l_linestatus"),
            Sum(F("l_quantity")).As("sum_qty"),
            Avg(F("l_extendedprice")).As("avg_price"),
            Min(F("l_discount")).As("min_disc"),
            Max(F("l_discount")).As("max_disc"),
            Count(F("l_orderkey")).As("cnt"),
        )
        .From(Schema("lineitem"))
        .GroupBy(F("l_returnflag"), F("l_linestatus"))
    )
    check(engine, duck, q,
          "SELECT l_returnflag, l_linestatus, sum(l_quantity) AS sum_qty, "
          "avg(l_extendedprice) AS avg_price, min(l_discount) AS min_disc, "
          "max(l_discount) AS max_disc, count(l_orderkey) AS cnt "
          "FROM lineitem GROUP BY l_returnflag, l_linestatus")


def test_groupby_having_orderby(engine, duck):
    q = (
        Select(F("o_custkey"), Count(F("o_orderkey")).As("cnt"),
               Sum(F("o_totalprice")).As("total"))
        .From(Schema("orders"))
        .GroupBy(F("o_custkey"))
        .Having(Count(F("o_orderkey")).Greater(10))
        .OrderBy(F("o_custkey").Asc())
    )
    check(engine, duck, q,
          "SELECT o_custkey, count(o_orderkey) AS cnt, sum(o_totalprice) AS total "
          "FROM orders GROUP BY o_custkey HAVING count(o_orderkey) > 10 ORDER BY o_custkey")


def test_having_on_sum(engine, duck):
    q = (
        Select(F("l_suppkey"), Sum(F("l_quantity")).As("sq"))
        .From(Schema("lineitem"))
        .GroupBy(F("l_suppkey"))
        .Having(Sum(F("l_quantity")).Greater(15000.0), Count(F("l_orderkey")).Greater(400))
    )
    check(engine, duck, q,
          "SELECT l_suppkey, sum(l_quantity) AS sq FROM lineitem GROUP BY l_suppkey "
          "HAVING sum(l_quantity) > 15000.0 AND count(l_orderkey) > 400")


def test_collect_list_ordered(engine, duck):
    q = (
        Select(F("l_orderkey"), CollectList(F("l_quantity")).As("qtys"))
        .From(Schema("lineitem"))
        .Where(F("l_orderkey").LessEq(50))
        .GroupBy(F("l_orderkey"))
    )
    # relation order cols are (l_orderkey, l_linenumber)
    check(engine, duck, q,
          "SELECT l_orderkey, list(l_quantity ORDER BY l_orderkey, l_linenumber) AS qtys "
          "FROM lineitem WHERE l_orderkey <= 50 GROUP BY l_orderkey")


def test_collect_set_sorted(engine, duck):
    q = (
        Select(F("l_returnflag"), CollectSet(F("l_linestatus")).As("statuses"))
        .From(Schema("lineitem"))
        .GroupBy(F("l_returnflag"))
    )
    check(engine, duck, q,
          "SELECT l_returnflag, list(DISTINCT l_linestatus ORDER BY l_linestatus) "
          "AS statuses FROM lineitem GROUP BY l_returnflag")


def test_latest_earliest_by_offset(engine, duck):
    q = (
        Select(F("user_id"),
               LatestByOffset(F("event_type")).As("last_type"),
               EarliestByOffset(F("event_type")).As("first_type"))
        .From(Schema("events", alias=None))
        .GroupBy(F("user_id"))
        .EmitChanges()
    )
    # events order cols: (ts, event_id)
    check(engine, duck, q,
          "SELECT user_id, "
          "last(event_type ORDER BY ts, event_id) AS last_type, "
          "first(event_type ORDER BY ts, event_id) AS first_type "
          "FROM events GROUP BY user_id")


def test_topk(engine, duck):
    q = (
        Select(F("l_returnflag"), TopK(F("l_quantity"), 3).As("top3"))
        .From(Schema("lineitem"))
        .GroupBy(F("l_returnflag"))
    )
    check(engine, duck, q,
          "SELECT l_returnflag, (list(l_quantity ORDER BY l_quantity DESC))[1:3] AS top3 "
          "FROM lineitem GROUP BY l_returnflag")


def test_topk_distinct(engine, duck):
    q = (
        Select(F("l_returnflag"), TopKDistinct(F("l_quantity"), 4).As("top4"))
        .From(Schema("lineitem"))
        .GroupBy(F("l_returnflag"))
    )
    check(engine, duck, q,
          "SELECT l_returnflag, (list(DISTINCT l_quantity ORDER BY l_quantity DESC))[1:4] "
          "AS top4 FROM lineitem GROUP BY l_returnflag")


def test_agg_arithmetic(engine, duck):
    # nested arithmetic over aggregates (select_builder_test.go:675)
    q = (
        Select(F("l_returnflag"),
               Mul(Sum(F("l_extendedprice")), 0.05).As("commission"))
        .From(Schema("lineitem"))
        .GroupBy(F("l_returnflag"))
    )
    check(engine, duck, q,
          "SELECT l_returnflag, sum(l_extendedprice) * 0.05 AS commission "
          "FROM lineitem GROUP BY l_returnflag")


def test_groupby_derived_key(engine, duck):
    q = (
        Select(Mod(F("o_orderkey"), 7).As("k7"), Count(F("o_orderkey")).As("cnt"))
        .From(Schema("orders"))
        .GroupBy(Mod(F("o_orderkey"), 7).As("k7"))
    )
    check(engine, duck, q,
          "SELECT o_orderkey % 7 AS k7, count(o_orderkey) AS cnt "
          "FROM orders GROUP BY o_orderkey % 7")




def test_explain(engine):
    from ksql_ray import Count, Schema, Select, Sum, F

    q = (Select(F("n_name"), Sum(F("o_totalprice")).As("total"))
         .From(Schema("orders"))
         .Join(Schema("customer"), F("orders.o_custkey").Equal(F("customer.c_custkey")))
         .Join(Schema("nation"), F("customer.c_nationkey").Equal(F("nation.n_nationkey")))
         .GroupBy(F("n_name"))
         .OrderBy(F("n_name").Asc()))
    plan = engine.explain(q)
    assert "ReadParquet[orders]" in plan
    assert "BroadcastHashJoin" in plan
    assert "PartialAggregate" in plan and "HashExchange" in plan
    assert "Sort" in plan


def test_select_as_struct(engine):
    from ksql_ray import SelectAsStruct

    q = (SelectAsStruct(F("r_regionkey"), F("r_name"))
         .From(Schema("region")))
    t = engine.table(q)
    assert t.column_names == ["row"]
    rows = sorted(t.column("row").to_pylist(), key=lambda r: r["r_regionkey"])
    assert rows[0]["r_name"] is not None and len(rows) == 5
