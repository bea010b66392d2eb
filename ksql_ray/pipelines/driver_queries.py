"""Driver-facing query registry: every implemented operator from
SURVEY.md §2 as a (Ray pipeline, DuckDB oracle SQL) pair.

The driver calls ``queries()[name](sf_dir)`` and compares row count,
schema and an order-insensitive value hash against ``oracle_sql()[name]``
run by DuckDB over the same parquet tables. Column names match on both
sides by construction. Float aggregates are rounded on BOTH sides so the
hash is robust to summation order.
"""

from __future__ import annotations

from typing import Callable

import pyarrow as pa
import pyarrow.compute as pc

from ..aggregates import (
    Avg, CollectList, CollectSet, Count, EarliestByOffset, Histogram,
    LatestByOffset, Max, Min, Sum, TopK, TopKDistinct,
)
from ..builder import Schema, Select, SelectBuilder
from ..catalog import testdata_catalog
from ..exec.bounded import Engine
from ..expr import And, Case, CaseWhen, Div, F, Literal, Mod, Mul, Or, Sub
from ..windows import HOURS, Hopping, MINUTES, Session, Tumbling

HOUR_US = 3_600_000_000
HALF_US = HOUR_US // 2
GAP_US = 30 * 60 * 1_000_000


def _round_cols(tbl: pa.Table, cols: dict[str, int]) -> pa.Table:
    """DuckDB-equivalent rounding: round(x * 10^d) / 10^d in float64,
    half away from zero — ``pc.round`` lands 1 ulp off DuckDB's ROUND on
    some values (measured: 1e-10..1e-14 diffs on ROUND'd aggregates)."""
    import numpy as np

    for c, nd in cols.items():
        if c in tbl.column_names:
            i = tbl.column_names.index(c)
            col = pc.cast(tbl.column(c), pa.float64()).combine_chunks()
            v = col.to_numpy(zero_copy_only=False)
            scale = 10.0 ** nd
            # trunc, not floor: floor(x*s - 0.5) drops every negative
            # value with fraction < .5 a full quantum below SQL ROUND
            r = np.trunc(v * scale + np.where(v >= 0, 0.5, -0.5)) / scale
            # Preserve the validity mask: to_numpy turns NULL into NaN and a
            # bare pa.array(r) would keep it NaN, corrupting NULL aggregates
            # (e.g. SUM over an all-NULL group) into hash mismatches.
            mask = np.asarray(col.is_null())
            tbl = tbl.set_column(
                i, c, pa.array(r, type=pa.float64(), mask=mask))
    return tbl


def _map_to_json(tbl: pa.Table, col: str) -> pa.Table:
    """map<string,int64> -> canonical 'k1:v1,k2:v2' string (keys presorted
    ascending by construction in Histogram.finalize)."""
    i = tbl.column_names.index(col)
    arr = tbl.column(col)
    if isinstance(arr, pa.ChunkedArray):
        arr = arr.combine_chunks()
    out = []
    for m in arr.to_pylist():
        if m is None:
            out.append(None)
        else:
            items = m.items() if isinstance(m, dict) else m
            out.append(",".join(f"{k}:{v}" for k, v in items))
    return tbl.set_column(i, col, pa.array(out, type=pa.string()))


class Q:
    def __init__(self, builder_fn: Callable[[], SelectBuilder], sql: str | None,
                 post: Callable[[pa.Table], pa.Table] | None = None):
        self.builder_fn = builder_fn
        self.sql = sql
        self.post = post

    def run(self, sf_dir: str) -> pa.Table:
        cat = testdata_catalog(sf_dir)
        eng = Engine(cat)
        t = eng.table(self.builder_fn())
        if self.post:
            t = self.post(t)
        return t


REGISTRY: dict[str, Q] = {}


def q(name: str, sql: str | None = None, post=None):
    def deco(fn):
        REGISTRY[name] = Q(fn, sql, post)
        return fn

    return deco


# --------------------------------------------------------------- §2.1/§2.2
@q("filter_project",
   "SELECT l_orderkey, l_linenumber, l_quantity FROM lineitem WHERE l_quantity > 45")
def _filter_project():
    return (Select(F("l_orderkey"), F("l_linenumber"), F("l_quantity"))
            .From(Schema("lineitem")).Where(F("l_quantity").Greater(45)))


@q("where_and_chain",
   "SELECT l_orderkey, l_linenumber FROM lineitem "
   "WHERE l_quantity > 30 AND l_discount <= 0.02")
def _where_chain():
    return (Select(F("l_orderkey"), F("l_linenumber")).From(Schema("lineitem"))
            .Where(F("l_quantity").Greater(30), F("l_discount").LessEq(0.02)))


@q("where_or_in",
   "SELECT o_orderkey, o_orderstatus FROM orders "
   "WHERE o_orderstatus IN ('F','P') OR o_totalprice > 300000.0")
def _where_or_in():
    return (Select(F("o_orderkey"), F("o_orderstatus")).From(Schema("orders"))
            .Where(Or(F("o_orderstatus").In("F", "P"),
                      F("o_totalprice").Greater(300000.0))))


@q("arithmetic",
   "SELECT l_orderkey, l_linenumber, "
   "ROUND(l_extendedprice*(1.0-l_discount), 4) AS revenue, "
   "l_quantity/2.0 AS half_qty, CAST(l_linenumber % 3 AS INT) AS ln3 "
   "FROM lineitem WHERE l_quantity >= 48")
def _arith():
    return (Select(
        F("l_orderkey"), F("l_linenumber"),
        Mul(F("l_extendedprice"), Sub(Literal(1.0), F("l_discount"))).As("revenue"),
        Div(F("l_quantity"), 2.0).As("half_qty"),
        Mod(F("l_linenumber"), 3).As("ln3"),
    ).From(Schema("lineitem")).Where(F("l_quantity").GreaterEq(48)))


def _arith_post(t: pa.Table) -> pa.Table:
    return _round_cols(t, {"revenue": 4})


REGISTRY["arithmetic"].post = _arith_post


@q("case_when",
   "SELECT o_orderkey, CASE WHEN o_totalprice > 250000.0 THEN 'big' "
   "WHEN o_totalprice > 100000.0 THEN 'mid' ELSE 'small' END AS bucket FROM orders")
def _case():
    return (Select(
        F("o_orderkey"),
        Case("bucket",
             CaseWhen(F("o_totalprice").Greater(250000.0), "big"),
             CaseWhen(F("o_totalprice").Greater(100000.0), "mid")).Else("small"),
    ).From(Schema("orders")))


@q("null_checks",
   "SELECT o_orderkey FROM orders WHERE o_orderstatus IS NOT NULL AND o_custkey IS NOT NULL")
def _nulls():
    return (Select(F("o_orderkey")).From(Schema("orders"))
            .Where(F("o_orderstatus").IsNotNull(), F("o_custkey").IsNotNull()))


@q("where_not_in",
   "SELECT o_orderkey, o_orderpriority FROM orders "
   "WHERE o_orderpriority NOT IN ('1-URGENT', '2-HIGH')")
def _where_not_in():
    return (Select(F("o_orderkey"), F("o_orderpriority")).From(Schema("orders"))
            .Where(F("o_orderpriority").NotIn("1-URGENT", "2-HIGH")))


@q("orderby_multi_desc",
   "SELECT c_custkey, c_mktsegment, c_acctbal FROM customer "
   "ORDER BY c_mktsegment ASC, c_acctbal DESC")
def _orderby_multi():
    return (Select(F("c_custkey"), F("c_mktsegment"), F("c_acctbal"))
            .From(Schema("customer"))
            .OrderBy(F("c_mktsegment").Asc(), F("c_acctbal").Desc()))


@q("min_max_strings",
   "SELECT o_orderstatus, min(o_orderpriority) AS min_pri, "
   "max(o_orderpriority) AS max_pri FROM orders GROUP BY o_orderstatus")
def _min_max_strings():
    return (Select(F("o_orderstatus"),
                   Min(F("o_orderpriority")).As("min_pri"),
                   Max(F("o_orderpriority")).As("max_pri"))
            .From(Schema("orders")).GroupBy(F("o_orderstatus")))


@q("agg_percentile",
   "SELECT l_returnflag, quantile_disc(l_extendedprice, 0.5) AS p50, "
   "quantile_disc(l_extendedprice, 0.9) AS p90, "
   "count(l_orderkey) AS cnt FROM lineitem GROUP BY l_returnflag")
def _agg_percentile():
    from ..aggregates import Percentile

    return (Select(F("l_returnflag"),
                   Percentile(F("l_extendedprice"), 0.5).As("p50"),
                   Percentile(F("l_extendedprice"), 0.9).As("p90"),
                   Count(F("l_orderkey")).As("cnt"))
            .From(Schema("lineitem")).GroupBy(F("l_returnflag")))


@q("agg_count_distinct",
   "SELECT l_linestatus, count(DISTINCT l_returnflag) AS nrf, "
   "count(DISTINCT l_suppkey) AS nsk, count(l_orderkey) AS cnt "
   "FROM lineitem GROUP BY l_linestatus")
def _agg_count_distinct():
    from ..aggregates import CountDistinct

    return (Select(F("l_linestatus"),
                   CountDistinct(F("l_returnflag")).As("nrf"),
                   CountDistinct(F("l_suppkey")).As("nsk"),
                   Count(F("l_orderkey")).As("cnt"))
            .From(Schema("lineitem")).GroupBy(F("l_linestatus")))


@q("agg_stddev",
   "SELECT l_returnflag, ROUND(var_samp(l_extendedprice), 4) AS vs, "
   "ROUND(stddev_samp(l_extendedprice), 4) AS sd, "
   "ROUND(var_samp(l_discount), 6) AS vd, "
   "count(l_orderkey) AS cnt FROM lineitem GROUP BY l_returnflag")
def _agg_stddev():
    from ..aggregates import StdDev, VarSamp

    return (Select(F("l_returnflag"),
                   VarSamp(F("l_extendedprice")).As("vs"),
                   StdDev(F("l_extendedprice")).As("sd"),
                   VarSamp(F("l_discount")).As("vd"),
                   Count(F("l_orderkey")).As("cnt"))
            .From(Schema("lineitem")).GroupBy(F("l_returnflag")))


REGISTRY["agg_stddev"].post = lambda t: _round_cols(
    t, {"vs": 4, "sd": 4, "vd": 6})


# --------------------------------------------------------------- §2.3 aggregates
@q("agg_basic",
   "SELECT l_returnflag, l_linestatus, ROUND(sum(l_quantity), 4) AS sum_qty, "
   "ROUND(avg(l_extendedprice), 4) AS avg_price, min(l_discount) AS min_disc, "
   "max(l_discount) AS max_disc, count(l_orderkey) AS cnt "
   "FROM lineitem GROUP BY l_returnflag, l_linestatus")
def _agg_basic():
    return (Select(
        F("l_returnflag"), F("l_linestatus"),
        Sum(F("l_quantity")).As("sum_qty"),
        Avg(F("l_extendedprice")).As("avg_price"),
        Min(F("l_discount")).As("min_disc"),
        Max(F("l_discount")).As("max_disc"),
        Count(F("l_orderkey")).As("cnt"),
    ).From(Schema("lineitem")).GroupBy(F("l_returnflag"), F("l_linestatus")))


REGISTRY["agg_basic"].post = lambda t: _round_cols(t, {"sum_qty": 4, "avg_price": 4})


@q("agg_having_orderby",
   "SELECT o_custkey, count(o_orderkey) AS cnt, ROUND(sum(o_totalprice), 2) AS total "
   "FROM orders GROUP BY o_custkey HAVING count(o_orderkey) > 10 ORDER BY o_custkey")
def _agg_having():
    return (Select(F("o_custkey"), Count(F("o_orderkey")).As("cnt"),
                   Sum(F("o_totalprice")).As("total"))
            .From(Schema("orders")).GroupBy(F("o_custkey"))
            .Having(Count(F("o_orderkey")).Greater(10))
            .OrderBy(F("o_custkey").Asc()))


REGISTRY["agg_having_orderby"].post = lambda t: _round_cols(t, {"total": 2})


@q("agg_over_arithmetic",
   "SELECT l_returnflag, ROUND(sum(l_extendedprice) * 0.05, 2) AS commission "
   "FROM lineitem GROUP BY l_returnflag")
def _agg_arith():
    return (Select(F("l_returnflag"),
                   Mul(Sum(F("l_extendedprice")), 0.05).As("commission"))
            .From(Schema("lineitem")).GroupBy(F("l_returnflag")))


REGISTRY["agg_over_arithmetic"].post = lambda t: _round_cols(t, {"commission": 2})


@q("collect_list",
   "SELECT l_orderkey, list(l_quantity ORDER BY l_orderkey, l_linenumber) AS qtys "
   "FROM lineitem WHERE l_orderkey <= 100 GROUP BY l_orderkey")
def _collect_list():
    return (Select(F("l_orderkey"), CollectList(F("l_quantity")).As("qtys"))
            .From(Schema("lineitem")).Where(F("l_orderkey").LessEq(100))
            .GroupBy(F("l_orderkey")))


@q("collect_set",
   "SELECT l_returnflag, list(DISTINCT l_linestatus ORDER BY l_linestatus) AS statuses "
   "FROM lineitem GROUP BY l_returnflag")
def _collect_set():
    return (Select(F("l_returnflag"), CollectSet(F("l_linestatus")).As("statuses"))
            .From(Schema("lineitem")).GroupBy(F("l_returnflag")))


@q("latest_earliest_by_offset",
   "SELECT user_id, last(event_type ORDER BY ts, event_id) AS last_type, "
   "first(event_type ORDER BY ts, event_id) AS first_type "
   "FROM events GROUP BY user_id")
def _latest_earliest():
    return (Select(F("user_id"),
                   LatestByOffset(F("event_type")).As("last_type"),
                   EarliestByOffset(F("event_type")).As("first_type"))
            .From(Schema("events")).GroupBy(F("user_id")).EmitChanges())


@q("topk",
   "SELECT l_returnflag, (list(l_quantity ORDER BY l_quantity DESC))[1:3] AS top3 "
   "FROM lineitem GROUP BY l_returnflag")
def _topk():
    return (Select(F("l_returnflag"), TopK(F("l_quantity"), 3).As("top3"))
            .From(Schema("lineitem")).GroupBy(F("l_returnflag")))


@q("topk_distinct",
   "SELECT l_returnflag, (list(DISTINCT l_quantity ORDER BY l_quantity DESC))[1:4] AS top4 "
   "FROM lineitem GROUP BY l_returnflag")
def _topk_distinct():
    return (Select(F("l_returnflag"), TopKDistinct(F("l_quantity"), 4).As("top4"))
            .From(Schema("lineitem")).GroupBy(F("l_returnflag")))


@q("histogram",
   "SELECT user_id, string_agg(event_type || ':' || cnt, ',' ORDER BY event_type) AS hist "
   "FROM (SELECT user_id, event_type, count(*) AS cnt FROM events "
   "      GROUP BY user_id, event_type) GROUP BY user_id",
   post=lambda t: _map_to_json(t, "hist"))
def _histogram():
    return (Select(F("user_id"), Histogram(F("event_type"), 100).As("hist"))
            .From(Schema("events")).GroupBy(F("user_id")).EmitChanges())


@q("case_over_aggregate",
   "SELECT l_returnflag, CASE WHEN sum(l_quantity) > 250000.0 THEN 'heavy' "
   "WHEN sum(l_quantity) > 100000.0 THEN 'medium' ELSE 'light' END AS weight "
   "FROM lineitem GROUP BY l_returnflag")
def _case_over_agg():
    return (Select(
        F("l_returnflag"),
        Case("weight",
             CaseWhen(Sum(F("l_quantity")).Greater(250000.0), "heavy"),
             CaseWhen(Sum(F("l_quantity")).Greater(100000.0), "medium"),
             ).Else("light"),
    ).From(Schema("lineitem")).GroupBy(F("l_returnflag")))


@q("sum_over_expression",
   "SELECT l_returnflag, ROUND(sum(l_extendedprice * (1.0 - l_discount)), 2) "
   "AS revenue FROM lineitem GROUP BY l_returnflag")
def _sum_over_expr():
    return (Select(
        F("l_returnflag"),
        Sum(Mul(F("l_extendedprice"), Sub(Literal(1.0), F("l_discount")))).As("revenue"),
    ).From(Schema("lineitem")).GroupBy(F("l_returnflag")))


REGISTRY["sum_over_expression"].post = lambda t: _round_cols(t, {"revenue": 2})


@q("windowed_having",
   f"SELECT make_timestamp((epoch_us(ts) // {HOUR_US}) * {HOUR_US}) AS window_start, "
   f"make_timestamp((epoch_us(ts) // {HOUR_US}) * {HOUR_US} + {HOUR_US}) AS window_end, "
   "user_id, count(event_id) AS cnt FROM events GROUP BY 1, 2, 3 "
   "HAVING count(event_id) >= 3")
def _windowed_having():
    return (Select(F("user_id"), Count(F("event_id")).As("cnt"))
            .From(Schema("events")).GroupBy(F("user_id"))
            .Windowed(Tumbling(1, HOURS))
            .Having(Count(F("event_id")).GreaterEq(3)))


# --------------------------------------------------------------- §2.5 joins
@q("join_inner",
   "SELECT o_orderkey, c_name, o_totalprice FROM orders "
   "JOIN customer ON o_custkey = c_custkey WHERE o_totalprice > 300000.0")
def _join_inner():
    return (Select(F("o_orderkey"), F("c_name"), F("o_totalprice"))
            .From(Schema("orders"))
            .Join(Schema("customer"), F("orders.o_custkey").Equal(F("customer.c_custkey")))
            .Where(F("o_totalprice").Greater(300000.0)))


@q("join_left",
   "SELECT c_custkey, s_name FROM customer LEFT JOIN supplier ON c_nationkey = s_nationkey")
def _join_left():
    return (Select(F("c_custkey"), F("s_name")).From(Schema("customer"))
            .LeftJoin(Schema("supplier"),
                      F("customer.c_nationkey").Equal(F("supplier.s_nationkey"))))


@q("join_right",
   "SELECT c_custkey, s_name FROM supplier RIGHT JOIN customer ON s_nationkey = c_nationkey")
def _join_right():
    return (Select(F("c_custkey"), F("s_name")).From(Schema("supplier"))
            .RightJoin(Schema("customer"),
                       F("supplier.s_nationkey").Equal(F("customer.c_nationkey"))))


@q("join_outer",
   "SELECT s_suppkey, n_name FROM supplier "
   "FULL OUTER JOIN nation ON s_nationkey = n_nationkey")
def _join_outer():
    return (Select(F("s_suppkey"), F("n_name")).From(Schema("supplier"))
            .OuterJoin(Schema("nation"),
                       F("supplier.s_nationkey").Equal(F("nation.n_nationkey"))))


@q("join_cross",
   "SELECT r_name, n_name FROM region CROSS JOIN nation")
def _join_cross():
    return (Select(F("r_name"), F("n_name")).From(Schema("region"))
            .CrossJoin(Schema("nation")))


@q("join_multi",
   "SELECT l_orderkey, c_name, n_name FROM lineitem "
   "JOIN orders ON l_orderkey = o_orderkey "
   "JOIN customer ON o_custkey = c_custkey "
   "JOIN nation ON c_nationkey = n_nationkey WHERE l_quantity > 49")
def _join_multi():
    return (Select(F("l_orderkey"), F("c_name"), F("n_name"))
            .From(Schema("lineitem"))
            .Join(Schema("orders"), F("lineitem.l_orderkey").Equal(F("orders.o_orderkey")))
            .Join(Schema("customer"), F("orders.o_custkey").Equal(F("customer.c_custkey")))
            .Join(Schema("nation"), F("customer.c_nationkey").Equal(F("nation.n_nationkey")))
            .Where(F("l_quantity").Greater(49)))


@q("join_then_aggregate",
   "SELECT n_name, ROUND(sum(o_totalprice), 2) AS total, count(o_orderkey) AS cnt "
   "FROM orders JOIN customer ON o_custkey = c_custkey "
   "JOIN nation ON c_nationkey = n_nationkey GROUP BY n_name")
def _join_agg():
    return (Select(F("n_name"), Sum(F("o_totalprice")).As("total"),
                   Count(F("o_orderkey")).As("cnt"))
            .From(Schema("orders"))
            .Join(Schema("customer"), F("orders.o_custkey").Equal(F("customer.c_custkey")))
            .Join(Schema("nation"), F("customer.c_nationkey").Equal(F("nation.n_nationkey")))
            .GroupBy(F("n_name")))


REGISTRY["join_then_aggregate"].post = lambda t: _round_cols(t, {"total": 2})


@q("join_compound_on",
   "SELECT o_orderkey, c_name FROM orders "
   "JOIN customer ON o_custkey = c_custkey AND c_acctbal > 0.0")
def _join_compound():
    return (Select(F("o_orderkey"), F("c_name")).From(Schema("orders"))
            .Join(Schema("customer"),
                  And(F("orders.o_custkey").Equal(F("customer.c_custkey")),
                      F("customer.c_acctbal").Greater(0.0))))


# --------------------------------------------------------------- §2.4 windows
@q("window_tumbling",
   f"SELECT make_timestamp((epoch_us(ts) // {HOUR_US}) * {HOUR_US}) AS window_start, "
   f"make_timestamp((epoch_us(ts) // {HOUR_US}) * {HOUR_US} + {HOUR_US}) AS window_end, "
   "user_id, count(event_id) AS cnt, ROUND(sum(value), 4) AS sv "
   "FROM events GROUP BY 1, 2, 3")
def _win_tumbling():
    return (Select(F("user_id"), Count(F("event_id")).As("cnt"),
                   Sum(F("value")).As("sv"))
            .From(Schema("events")).GroupBy(F("user_id"))
            .Windowed(Tumbling(1, HOURS)))


REGISTRY["window_tumbling"].post = lambda t: _round_cols(t, {"sv": 4})


@q("window_tumbling_latest",
   f"SELECT make_timestamp((epoch_us(ts) // {HOUR_US}) * {HOUR_US}) AS window_start, "
   f"make_timestamp((epoch_us(ts) // {HOUR_US}) * {HOUR_US} + {HOUR_US}) AS window_end, "
   "user_id, last(event_type ORDER BY ts, event_id) AS last_type "
   "FROM events GROUP BY 1, 2, 3")
def _win_latest():
    return (Select(F("user_id"), LatestByOffset(F("event_type")).As("last_type"))
            .From(Schema("events")).GroupBy(F("user_id"))
            .Windowed(Tumbling(1, HOURS)))


@q("window_hopping",
   f"""WITH exp AS (
     SELECT user_id, event_id,
            unnest(range(greatest((epoch_us(ts) - {HOUR_US}) // {HALF_US} + 1, 0),
                         epoch_us(ts) // {HALF_US} + 1)) AS k
     FROM events)
   SELECT make_timestamp(k * {HALF_US}) AS window_start,
          make_timestamp(k * {HALF_US} + {HOUR_US}) AS window_end,
          user_id, count(event_id) AS cnt
   FROM exp GROUP BY 1, 2, 3""")
def _win_hopping():
    return (Select(F("user_id"), Count(F("event_id")).As("cnt"))
            .From(Schema("events")).GroupBy(F("user_id"))
            .Windowed(Hopping(60, MINUTES, 30, MINUTES)))


@q("window_session",
   f"""WITH flagged AS (
     SELECT user_id, event_id, value, ts,
            CASE WHEN lag(ts) OVER w IS NULL
                 OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {GAP_US}
                 THEN 1 ELSE 0 END AS new_sess
     FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
   ), sessions AS (
     SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                   ROWS UNBOUNDED PRECEDING) AS sess_id
     FROM flagged)
   SELECT min(ts) AS window_start, max(ts) AS window_end, user_id,
          count(event_id) AS cnt, ROUND(avg(value), 4) AS av
   FROM sessions GROUP BY user_id, sess_id""")
def _win_session():
    return (Select(F("user_id"), Count(F("event_id")).As("cnt"),
                   Avg(F("value")).As("av"))
            .From(Schema("events")).GroupBy(F("user_id"))
            .Windowed(Session(30, MINUTES)))


REGISTRY["window_session"].post = lambda t: _round_cols(t, {"av": 4})


# --------------------------------------------------------------- §2.7 CTE
@q("cte",
   "WITH spend_by_cust AS (SELECT o_custkey, sum(o_totalprice) AS spend "
   "FROM orders GROUP BY o_custkey) "
   "SELECT o_custkey, ROUND(spend, 2) AS spend FROM spend_by_cust "
   "WHERE spend > 1000000.0")
def _cte():
    inner = (Select(F("o_custkey"), Sum(F("o_totalprice")).As("spend"))
             .From(Schema("orders")).GroupBy(F("o_custkey")).As("spend_by_cust"))
    return (Select(F("o_custkey"), F("spend")).From(Schema("spend_by_cust"))
            .Where(F("spend").Greater(1000000.0)).WithCTE(inner))


REGISTRY["cte"].post = lambda t: _round_cols(t, {"spend": 2})


# --------------------------------------------------------------- pipeline ops
# (dedup / similarity / text analysis / multimodal — the 100 TB
# training-data operations; SURVEY-mandated first-class components)



def _read_clean(path: str):
    """read_parquet with the schema's pandas metadata stripped (testdata
    schemas are unhashable otherwise and every read task logs a
    schema-dedup warning)."""
    import pyarrow.parquet as pq
    import ray.data

    s = pq.read_schema(path)
    clean = pa.schema([pa.field(f.name, f.type) for f in s])
    return ray.data.read_parquet(path, schema=clean)

class RawQ:
    """Registry entry backed by a Ray Data pipeline function, not the
    SQL builder."""

    def __init__(self, fn: Callable[[str], pa.Table], sql: str | None = None):
        self.fn = fn
        self.sql = sql
        self.post = None

    def run(self, sf_dir: str) -> pa.Table:
        t = self.fn(sf_dir)
        if self.post:
            t = self.post(t)
        return t


def _collect(ds) -> pa.Table:
    import ray

    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_columns]
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="permissive")


def _op_text_analysis(sf_dir: str) -> pa.Table:
    import ray.data

    from ..ops.text import analyze_documents

    ds = _read_clean(f"{sf_dir}/documents.parquet")
    t = _collect(analyze_documents(ds))
    return t.select(["doc_id", "char_count", "token_count", "fingerprint"])


REGISTRY["op_text_analysis"] = RawQ(
    _op_text_analysis,
    "SELECT doc_id, length(text) AS char_count, "
    "length(regexp_split_to_array(trim(text), '\\s+')) AS token_count, "
    "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint "
    "FROM documents",
)


def _op_lang_quality(sf_dir: str) -> pa.Table:
    import ray.data

    from ..ops.text import analyze_documents

    ds = _read_clean(f"{sf_dir}/documents.parquet")
    t = _collect(analyze_documents(ds))
    return t.select(["doc_id", "lang_pred", "quality"])


def _lang_quality_sql() -> str:
    """The lang-ID heuristic replicated in SQL: per-language marker counts
    over ' '+lower(text)+' ' (greedy non-overlapping, same as Arrow
    count_substring), argmax with first-in-sorted-order tie-break, 'und'
    when no marker hits; quality = the exact ops.text scoring formula."""
    from ..ops.text import _LANG_MARKERS

    def cnt(m: str) -> str:
        e = m.replace("'", "''")
        return f"(length(t) - length(replace(t, '{e}', ''))) / {len(m)}"

    langs = sorted(_LANG_MARKERS)
    score_cols = ", ".join(
        f"({' + '.join(cnt(m) for m in _LANG_MARKERS[lang])}) AS s_{lang}"
        for lang in langs
    )
    case = "CASE WHEN " + " + ".join(f"s_{l}" for l in langs) + " = 0 THEN 'und' "
    for i, l in enumerate(langs):
        conds = " AND ".join(f"s_{l} >= s_{m}" for m in langs[i + 1:]) or "TRUE"
        case += f"WHEN {conds} THEN '{l}' "
    case += "END"
    return rf"""
WITH s AS (SELECT doc_id, ' ' || lower(text) || ' ' AS t FROM documents),
sc AS (SELECT doc_id, {score_cols} FROM s)
SELECT sc.doc_id AS doc_id, {case} AS lang_pred,
  ROUND(0.4 * LEAST(length(d.text) / 500.0, 1.0)
      + 0.4 * (CASE WHEN length(d.text) > 0 THEN length(regexp_replace(d.text, '[^A-Za-z]', '', 'g'))::DOUBLE / length(d.text) ELSE 0 END)
      + 0.2 * (1.0 - LEAST((CASE WHEN length(d.text) > 0 THEN length(regexp_replace(d.text, '[\w\s]', '', 'g'))::DOUBLE / length(d.text) ELSE 1 END) * 4, 1.0)), 6) AS quality
FROM sc JOIN documents d ON d.doc_id = sc.doc_id"""


REGISTRY["op_lang_quality"] = RawQ(_op_lang_quality, _lang_quality_sql())


def _op_exact_dedup(sf_dir: str) -> pa.Table:
    import ray.data

    from ..ops.dedup import exact_dedup_keys

    ds = _read_clean(f"{sf_dir}/documents.parquet")
    return _collect(exact_dedup_keys(ds))


REGISTRY["op_exact_dedup"] = RawQ(
    _op_exact_dedup,
    "SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h, "
    "min(doc_id) AS doc_id, count(*) AS dup_count FROM documents GROUP BY 1",
)


# exact word-3gram Jaccard, brute force over all pairs — the dedup ops'
# ground truth at sf0.01 (the fixture's 25 planted near-dup pairs all
# have jaccard >= 0.9, so banded LSH recall is ~1 and the pruned
# pipeline must equal the exact answer)
# docs with <3 tokens are filtered on BOTH sides: the engine gives them
# one whole-doc xor-gram (order/dup-insensitive — not SQL-expressible),
# so the gate would otherwise mismatch on a definitional corner, not a
# bug (the whole-doc rule itself is pinned by pytest property tests)
_NGRAM_JACCARD_SQL = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t FROM documents
  WHERE len(regexp_split_to_array(trim(lower(text)), '\s+')) >= 3
), grams AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
  FROM toks
), sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
)
SELECT doc_a, doc_b, i::DOUBLE / (sa.n + sb.n - i) AS jaccard
FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
WHERE i::DOUBLE / (sa.n + sb.n - i) >= 0.5"""


def _min3_tokens(ds):
    """Drop docs with <3 tokens (mirrors the oracle's filter — see
    _NGRAM_JACCARD_SQL note)."""
    def f(batch: pa.Table) -> pa.Table:
        t = pc.utf8_trim_whitespace(pc.fill_null(batch.column("text"), ""))
        return batch.filter(pc.greater_equal(
            pc.count_substring_regex(t, r"\S+"), 3))
    return ds.map_batches(f, batch_format="pyarrow", zero_copy_batch=True)


def _op_minhash_dedup(sf_dir: str) -> pa.Table:
    import ray.data

    from ..ops.dedup import minhash_dedup_pairs

    ds = _min3_tokens(_read_clean(f"{sf_dir}/documents.parquet"))
    t = _collect(minhash_dedup_pairs(ds, threshold=0.5, verify="exact"))
    return t.select(["doc_a", "doc_b", "jaccard"])


REGISTRY["op_minhash_dedup"] = RawQ(_op_minhash_dedup, _NGRAM_JACCARD_SQL)


def _op_ngram_jaccard(sf_dir: str) -> pa.Table:
    import ray.data

    from ..ops.dedup import ngram_jaccard_pairs

    ds = _min3_tokens(_read_clean(f"{sf_dir}/documents.parquet"))
    return _collect(ngram_jaccard_pairs(ds, threshold=0.5))


REGISTRY["op_ngram_jaccard"] = RawQ(_op_ngram_jaccard, _NGRAM_JACCARD_SQL)


def _op_dup_clusters(sf_dir: str) -> pa.Table:
    """Transitive duplicate-cluster resolution: near-dup pairs ->
    connected components (alternating large-star/small-star) -> every
    doc labeled with its component's min doc_id + a keep flag."""
    import ray.data

    from ..ops.components import dedup_by_components
    from ..ops.dedup import ngram_jaccard_pairs

    docs = _read_clean(f"{sf_dir}/documents.parquet")
    pairs = ngram_jaccard_pairs(_min3_tokens(docs), threshold=0.5)
    return _collect(dedup_by_components(docs, pairs))


# connected components in SQL: the pair set (same CTE chain as
# _NGRAM_JACCARD_SQL) fed through a recursive min-label propagation —
# reach(node) enumerates every label reachable over undirected edges,
# min() collapses each component to its smallest doc_id; singleton docs
# label themselves via the LEFT JOIN coalesce.
_DUP_CLUSTERS_SQL = r"""
WITH RECURSIVE toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t FROM documents
  WHERE len(regexp_split_to_array(trim(lower(text)), '\s+')) >= 3
), grams AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
  FROM toks
), sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), pairs AS (
  SELECT doc_a, doc_b
  FROM inter JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
  WHERE i::DOUBLE / (sa.n + sb.n - i) >= 0.5
), edges AS (
  SELECT doc_a AS a, doc_b AS b FROM pairs
  UNION ALL SELECT doc_b, doc_a FROM pairs
), reach(node, lbl) AS (
  SELECT a, a FROM edges
  UNION
  SELECT e.a, r.lbl FROM edges e JOIN reach r ON r.node = e.b
), cc AS (SELECT node, min(lbl) AS cluster_id FROM reach GROUP BY node)
SELECT d.doc_id,
       coalesce(cc.cluster_id, d.doc_id) AS cluster_id,
       coalesce(cc.cluster_id, d.doc_id) = d.doc_id AS is_canonical
FROM documents d LEFT JOIN cc ON cc.node = d.doc_id"""


REGISTRY["op_dup_clusters"] = RawQ(_op_dup_clusters, _DUP_CLUSTERS_SQL)


def _op_leakage_split(sf_dir: str) -> pa.Table:
    """Near-dup-aware train/test split: the same transitive cluster
    resolution as op_dup_clusters, then a deterministic md5 hash of the
    CLUSTER label assigns whole clusters to test (frac 0.25) — no
    near-dup pair straddles the split."""
    from ..ops.components import leakage_safe_split
    from ..ops.dedup import ngram_jaccard_pairs

    docs = _read_clean(f"{sf_dir}/documents.parquet")
    pairs = ngram_jaccard_pairs(_min3_tokens(docs), threshold=0.5)
    return _collect(leakage_safe_split(docs, pairs, test_frac=0.25,
                                       method="md5"))


REGISTRY["op_leakage_split"] = RawQ(
    _op_leakage_split,
    # same recursive-CC chain as _DUP_CLUSTERS_SQL; the split rule is
    # the repo-wide md5 sampling contract applied to the cluster label
    _DUP_CLUSTERS_SQL.rsplit("SELECT d.doc_id", 1)[0] + r"""
SELECT d.doc_id,
       coalesce(cc.cluster_id, d.doc_id) AS cluster_id,
       CASE WHEN ('0x' || substr(md5(
                 coalesce(cc.cluster_id, d.doc_id)::VARCHAR), 1, 8)
                 )::UBIGINT < 1073741824
            THEN 'test' ELSE 'train' END AS split
FROM documents d LEFT JOIN cc ON cc.node = d.doc_id""",
)


def _op_dedup_keep_best(sf_dir: str) -> pa.Table:
    """Quality-aware representative selection: same near-dup cluster
    resolution as op_dup_clusters, but each cluster keeps its
    highest-n_chars doc (ties -> smallest doc_id), not its first."""
    from ..ops.components import keep_best_by_components
    from ..ops.dedup import ngram_jaccard_pairs

    docs = _read_clean(f"{sf_dir}/documents.parquet")
    pairs = ngram_jaccard_pairs(_min3_tokens(docs), threshold=0.5)
    t = _collect(keep_best_by_components(docs, pairs,
                                         score_col="n_chars"))
    return t.select(["cluster_id", "doc_id", "n_chars", "n_members"])


# the same recursive-CTE cluster chain as _DUP_CLUSTERS_SQL, with a
# per-cluster argmax tail (ROW_NUMBER over score DESC, id ASC)
_KEEP_BEST_SQL = _DUP_CLUSTERS_SQL[:_DUP_CLUSTERS_SQL.index(
    "SELECT d.doc_id,")] + """,
full_docs AS (
  SELECT d.doc_id, coalesce(cc.cluster_id, d.doc_id) AS cluster_id,
         d.n_chars
  FROM documents d LEFT JOIN cc ON cc.node = d.doc_id
)
SELECT cluster_id, doc_id, n_chars, n_members FROM (
  SELECT cluster_id, doc_id, n_chars,
         ROW_NUMBER() OVER (PARTITION BY cluster_id
           ORDER BY n_chars DESC, doc_id) AS rn,
         COUNT(*) OVER (PARTITION BY cluster_id) AS n_members
  FROM full_docs) WHERE rn = 1"""

REGISTRY["op_dedup_keep_best"] = RawQ(_op_dedup_keep_best,
                                      _KEEP_BEST_SQL)


def _op_contamination(sf_dir: str) -> pa.Table:
    """GPT-3-style benchmark decontamination: docs with doc_id % 10 == 0
    stand in for the held-out benchmark suite; every remaining training
    doc is flagged if it shares any 5-token span with the benchmark."""
    import numpy as np
    import ray.data

    from ..ops.decontam import contamination

    docs = _read_clean(f"{sf_dir}/documents.parquet")

    def mod_filter(want_bench: bool):
        def f(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            is_bench = (ids % 10) == 0
            return batch.filter(pa.array(is_bench if want_bench else ~is_bench))
        return f

    bench = docs.map_batches(mod_filter(True), batch_format="pyarrow",
                             zero_copy_batch=True)
    train = docs.map_batches(mod_filter(False), batch_format="pyarrow",
                             zero_copy_batch=True)
    return _collect(contamination(train, bench, n=5))


_CONTAMINATION_SQL = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t FROM documents
), tg AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(t) - 3),
                               i -> array_to_string(t[i:i+4], ' '))) AS g
  FROM toks WHERE doc_id % 10 != 0 AND len(t) >= 5
), bg AS (
  SELECT DISTINCT unnest(list_transform(range(1, len(t) - 3),
                                        i -> array_to_string(t[i:i+4], ' '))) AS g
  FROM toks WHERE doc_id % 10 = 0 AND len(t) >= 5
), hits AS (
  SELECT doc_id, count(*) AS matched FROM tg JOIN bg USING (g) GROUP BY 1
)
SELECT d.doc_id,
       coalesce(h.matched, 0) AS matched_grams,
       coalesce(h.matched, 0) > 0 AS contaminated
FROM documents d LEFT JOIN hits h USING (doc_id)
WHERE d.doc_id % 10 != 0"""


REGISTRY["op_contamination"] = RawQ(_op_contamination, _CONTAMINATION_SQL)


def _op_kmeans(sf_dir: str) -> pa.Table:
    """Distributed Lloyd k-means over the embeddings table: k=8 seeds
    from the 8 smallest vec_ids, 3 iterations, centroids rounded to 4 dp
    each update (the determinism contract that makes the unrolled-SQL
    oracle bit-equal — see ops/cluster.py)."""
    import ray.data

    from ..ops.cluster import kmeans

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return _collect(kmeans(ds, k=8, iters=3, round_dp=4))


def _lloyd_ctes(k: int = 8, iters: int = 3, dim: int = 64, dp: int = 4) -> str:
    """Unrolled Lloyd iterations as chained CTEs ending in
    ``asg(vec_id, cl)`` — the final cluster assignment. Shared by the
    op_kmeans and op_semdedup oracles."""
    avg_list = ", ".join(f"round(avg(e.embedding[{i}]), {dp})"
                         for i in range(1, dim + 1))
    parts = [f"""WITH e AS (SELECT vec_id, embedding FROM embeddings),
c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cl,
         list_transform(embedding, x -> round(CAST(x AS DOUBLE), {dp})) AS c
  FROM e ORDER BY vec_id LIMIT {k}
)"""]
    for t in range(iters):
        parts.append(f""", d{t} AS (
  SELECT e.vec_id, c.cl,
         list_sum(list_transform(range(1, {dim + 1}),
                  i -> (e.embedding[i] - c.c[i]) * (e.embedding[i] - c.c[i]))) AS dist
  FROM e CROSS JOIN c{t} c
), a{t} AS (
  SELECT vec_id, cl FROM (
    SELECT vec_id, cl,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn
    FROM d{t}) WHERE rn = 1
), u{t + 1} AS (
  SELECT a.cl, [{avg_list}] AS c
  FROM e JOIN a{t} a USING (vec_id) GROUP BY a.cl
), c{t + 1} AS (
  SELECT c{t}.cl, coalesce(u{t + 1}.c, c{t}.c) AS c
  FROM c{t} LEFT JOIN u{t + 1} USING (cl)
)""")
    parts.append(f""", df AS (
  SELECT e.vec_id, c.cl,
         list_sum(list_transform(range(1, {dim + 1}),
                  i -> (e.embedding[i] - c.c[i]) * (e.embedding[i] - c.c[i]))) AS dist
  FROM e CROSS JOIN c{iters} c
), asg AS (
  SELECT vec_id, cl FROM (
    SELECT vec_id, cl,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn
    FROM df) WHERE rn = 1
)""")
    return "".join(parts)


def _kmeans_sql(k: int = 8, iters: int = 3, dim: int = 64, dp: int = 4) -> str:
    return _lloyd_ctes(k, iters, dim, dp) + \
        "\nSELECT vec_id, cl AS cluster FROM asg"


REGISTRY["op_kmeans"] = RawQ(_op_kmeans, _kmeans_sql())


def _op_semdedup(sf_dir: str) -> pa.Table:
    """SemDeDup over the embeddings table: same k-means determinism
    contract as op_kmeans (k=8, 3 iterations, 4-dp centroids), then
    within-cluster cosine >= 0.4 drops the higher id of each pair
    (ops/cluster.py semdedup; cosine formula identical to the
    op_embedding_neardup gate, so 0.4 sits in the same fixture band)."""
    import ray.data

    from ..ops.cluster import semdedup

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return _collect(semdedup(ds, k=8, iters=3, tau=0.4, round_dp=4))


def _semdedup_sql(tau: float = 0.4, k: int = 8, iters: int = 3,
                  dim: int = 64, dp: int = 4) -> str:
    return _lloyd_ctes(k, iters, dim, dp) + f""", m AS (
  SELECT a.vec_id, a.cl,
         list_transform(e.embedding, x -> x::DOUBLE) AS emb
  FROM asg a JOIN e USING (vec_id)
), mm AS (
  SELECT vec_id, cl, emb,
         sqrt(list_sum(list_transform(emb, x -> x*x))) AS nm FROM m
), dup AS (
  SELECT b.vec_id
  FROM mm a JOIN mm b ON a.cl = b.cl AND a.vec_id < b.vec_id
  WHERE list_inner_product(a.emb, b.emb) / (a.nm * b.nm) >= {tau}
  GROUP BY 1
)
SELECT mm.vec_id, mm.cl AS cluster, dup.vec_id IS NULL AS keep
FROM mm LEFT JOIN dup ON mm.vec_id = dup.vec_id"""


REGISTRY["op_semdedup"] = RawQ(_op_semdedup, _semdedup_sql())


def _op_chunk_dedup(sf_dir: str) -> pa.Table:
    """Span-level exact dedup over documents: 8-token chunks, global
    first-occurrence-by-(doc_id, chunk_idx) keep rule, text rebuilt from
    surviving chunks (ops/spans.py chunk_dedup). The fixture's 25
    planted near-dup pairs share long token runs, so their aligned
    chunks duplicate and dup_chunks > 0 exercises the rebuild path."""
    import ray.data

    from ..ops.spans import chunk_dedup

    ds = ray.data.read_parquet(f"{sf_dir}/documents.parquet",
                               columns=["doc_id", "text"])
    return _collect(chunk_dedup(ds, width=8))


def _chunk_dedup_sql(w: int = 8) -> str:
    return rf"""WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t FROM documents
), idx AS (
  SELECT doc_id, t,
         unnest(range(0, CAST(ceil(len(t) / {w}.0) AS BIGINT))) AS chunk_idx
  FROM toks
), chunks AS (
  SELECT doc_id, chunk_idx,
         array_to_string(t[chunk_idx*{w}+1 : chunk_idx*{w}+{w}], ' ') AS chunk
  FROM idx
), ranked AS (
  SELECT doc_id, chunk_idx, chunk,
         row_number() OVER (PARTITION BY chunk
                            ORDER BY doc_id, chunk_idx) = 1 AS keep
  FROM chunks
)
SELECT doc_id,
       count(*) AS n_chunks,
       count(*) FILTER (WHERE NOT keep) AS dup_chunks,
       coalesce(string_agg(chunk, ' ' ORDER BY chunk_idx)
                FILTER (WHERE keep), '') AS clean_text
FROM ranked GROUP BY doc_id"""


REGISTRY["op_chunk_dedup"] = RawQ(_op_chunk_dedup, _chunk_dedup_sql())


def _op_pq_encode(sf_dir: str) -> pa.Table:
    """Product-quantization codes over the embeddings table: m=4
    subspaces of 16 dims, k=4 codes each, 2 Lloyd iterations, 4-dp
    centroids — the same determinism contract as op_kmeans, per
    subspace (ops/pq.py). Output is the oracle-comparable unpacked
    form (c0..c3); pack=True is the m-bytes/vector storage form."""
    import ray.data

    from ..ops.pq import pq_encode, pq_train

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    cents = pq_train(ds, m=4, k=4, iters=2, round_dp=4)
    return _collect(pq_encode(ds, cents, pack=False))


def _pq_sql(m: int = 4, k: int = 4, iters: int = 2, dim: int = 64,
            dp: int = 4) -> str:
    """Per-subspace unrolled Lloyd: the op_kmeans oracle replicated for
    each of the m dimension slices, joined on vec_id at the end."""
    sd = dim // m
    parts = ["WITH e AS (SELECT vec_id, embedding FROM embeddings)"]
    for s in range(m):
        lo = s * sd
        avg_list = ", ".join(f"round(avg(e.embedding[{lo + i}]), {dp})"
                             for i in range(1, sd + 1))
        dist = (f"list_sum(list_transform(range(1, {sd + 1}), "
                f"i -> (e.embedding[{lo} + i] - c.c[i]) * "
                f"(e.embedding[{lo} + i] - c.c[i])))")
        parts.append(f""", s{s}c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cl,
         list_transform(range({lo + 1}, {lo + sd + 1}),
                        i -> round(CAST(embedding[i] AS DOUBLE), {dp})) AS c
  FROM e ORDER BY vec_id LIMIT {k}
)""")
        for t in range(iters):
            parts.append(f""", s{s}d{t} AS (
  SELECT e.vec_id, c.cl, {dist} AS dist FROM e CROSS JOIN s{s}c{t} c
), s{s}a{t} AS (
  SELECT vec_id, cl FROM (
    SELECT vec_id, cl,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn
    FROM s{s}d{t}) WHERE rn = 1
), s{s}u{t + 1} AS (
  SELECT a.cl, [{avg_list}] AS c
  FROM e JOIN s{s}a{t} a USING (vec_id) GROUP BY a.cl
), s{s}c{t + 1} AS (
  SELECT s{s}c{t}.cl, coalesce(s{s}u{t + 1}.c, s{s}c{t}.c) AS c
  FROM s{s}c{t} LEFT JOIN s{s}u{t + 1} USING (cl)
)""")
        parts.append(f""", s{s}df AS (
  SELECT e.vec_id, c.cl, {dist} AS dist FROM e CROSS JOIN s{s}c{iters} c
), s{s}asg AS (
  SELECT vec_id, cl FROM (
    SELECT vec_id, cl,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn
    FROM s{s}df) WHERE rn = 1
)""")
    sel = ", ".join(f"s{s}asg.cl AS c{s}" for s in range(m))
    joins = " ".join(f"JOIN s{s}asg USING (vec_id)" for s in range(m))
    parts.append(f"\nSELECT e.vec_id, {sel} FROM e {joins}")
    return "".join(parts)


REGISTRY["op_pq_encode"] = RawQ(_op_pq_encode, _pq_sql())


def _op_ivfpq_encode(sf_dir: str) -> pa.Table:
    """IVF-PQ index build over the embeddings table: nlist=4 coarse
    Lloyd lists (2 iterations), then m=4/k=4 residual-PQ codebooks (1
    iteration) — same determinism contract as op_kmeans at every level
    (ops/pq.py ivfpq_build). Output is the oracle-comparable unpacked
    form (list, c0..c3); pack=True is the serving form."""
    import ray.data

    from ..ops.pq import ivfpq_build

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    codes_ds, _, _ = ivfpq_build(ds, nlist=4, m=4, k=4, coarse_iters=2,
                                 pq_iters=1, round_dp=4, pack=False)
    return _collect(codes_ds)


def _ivfpq_sql(nlist: int = 4, m: int = 4, k: int = 4,
               coarse_iters: int = 2, pq_iters: int = 1, dim: int = 64,
               dp: int = 4) -> str:
    """Coarse unrolled Lloyd (reusing _lloyd_ctes' asg/c{iters}) +
    residual computation + per-subspace unrolled residual-PQ Lloyd."""
    sd = dim // m
    parts = [_lloyd_ctes(nlist, coarse_iters, dim, dp)]
    parts.append(f""", res AS (
  SELECT e.vec_id, a.cl AS list,
         list_transform(range(1, {dim + 1}),
                        i -> CAST(e.embedding[i] AS DOUBLE) - c.c[i]) AS r
  FROM e JOIN asg a USING (vec_id) JOIN c{coarse_iters} c ON c.cl = a.cl
)""")
    for s in range(m):
        lo = s * sd
        avg_list = ", ".join(f"round(avg(res.r[{lo + i}]), {dp})"
                             for i in range(1, sd + 1))
        dist = (f"list_sum(list_transform(range(1, {sd + 1}), "
                f"i -> (res.r[{lo} + i] - c.c[i]) * "
                f"(res.r[{lo} + i] - c.c[i])))")
        parts.append(f""", r{s}c0 AS (
  SELECT row_number() OVER (ORDER BY vec_id) - 1 AS cl,
         list_transform(range({lo + 1}, {lo + sd + 1}),
                        i -> round(r[i], {dp})) AS c
  FROM res ORDER BY vec_id LIMIT {k}
)""")
        for t in range(pq_iters):
            parts.append(f""", r{s}d{t} AS (
  SELECT res.vec_id, c.cl, {dist} AS dist FROM res CROSS JOIN r{s}c{t} c
), r{s}a{t} AS (
  SELECT vec_id, cl FROM (
    SELECT vec_id, cl,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn
    FROM r{s}d{t}) WHERE rn = 1
), r{s}u{t + 1} AS (
  SELECT a.cl, [{avg_list}] AS c
  FROM res JOIN r{s}a{t} a USING (vec_id) GROUP BY a.cl
), r{s}c{t + 1} AS (
  SELECT r{s}c{t}.cl, coalesce(r{s}u{t + 1}.c, r{s}c{t}.c) AS c
  FROM r{s}c{t} LEFT JOIN r{s}u{t + 1} USING (cl)
)""")
        parts.append(f""", r{s}df AS (
  SELECT res.vec_id, c.cl, {dist} AS dist
  FROM res CROSS JOIN r{s}c{pq_iters} c
), r{s}asg AS (
  SELECT vec_id, cl FROM (
    SELECT vec_id, cl,
           row_number() OVER (PARTITION BY vec_id ORDER BY dist, cl) AS rn
    FROM r{s}df) WHERE rn = 1
)""")
    sel = ", ".join(f"r{s}asg.cl AS c{s}" for s in range(m))
    joins = " ".join(f"JOIN r{s}asg USING (vec_id)" for s in range(m))
    parts.append(f"\nSELECT res.vec_id, res.list, {sel} FROM res {joins}")
    return "".join(parts)


REGISTRY["op_ivfpq_encode"] = RawQ(_op_ivfpq_encode, _ivfpq_sql())


def _op_cluster_sample(sf_dir: str) -> pa.Table:
    """Cluster-stratified diversity sampling: k-means (same contract as
    op_kmeans), keep each cluster's 5 lowest-id vectors — no shuffle at
    all: per-task top-n candidates, tiny driver merge
    (ops/cluster.py cluster_sample)."""
    import ray.data

    from ..ops.cluster import cluster_sample

    ds = ray.data.read_parquet(f"{sf_dir}/embeddings.parquet",
                               columns=["vec_id", "embedding"])
    return _collect(cluster_sample(ds, k=8, iters=3, n_per_cluster=5,
                                   round_dp=4, by="id"))


REGISTRY["op_cluster_sample"] = RawQ(
    _op_cluster_sample,
    _lloyd_ctes(8, 3, 64, 4) + """
SELECT vec_id, cl AS cluster FROM (
  SELECT vec_id, cl,
         row_number() OVER (PARTITION BY cl ORDER BY vec_id) AS rn
  FROM asg) WHERE rn <= 5""")


def _op_pack_shards(sf_dir: str) -> pa.Table:
    """Token-budget shard packing: two-phase distributed prefix sum in
    ascending doc_id order, shard = floor(exclusive_prefix / 1000)."""
    from ..ops.pack import pack_shards

    docs = _read_clean(f"{sf_dir}/documents.parquet")
    return _collect(pack_shards(docs, budget=1000))


_PACK_SHARDS_SQL = r"""
WITH t AS (
  SELECT doc_id,
         length(regexp_split_to_array(trim(text), '\s+')) AS n_tokens
  FROM documents
)
SELECT doc_id, n_tokens,
       CAST(floor((sum(n_tokens) OVER (ORDER BY doc_id
                     ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)
                   - n_tokens) / 1000) AS BIGINT) AS shard_id
FROM t"""


REGISTRY["op_pack_shards"] = RawQ(_op_pack_shards, _PACK_SHARDS_SQL)


def _op_simhash_dedup(sf_dir: str) -> pa.Table:
    import ray.data

    from ..ops.dedup import simhash_pairs

    ds = _read_clean(f"{sf_dir}/documents.parquet")
    # token_hash="md5" is the oracle-checkable form: per-token 64-bit
    # hashes from the first 16 hex chars of md5, replicated bit-for-bit
    # by the SQL below (bucketed pipeline vs brute-force Hamming join)
    return _collect(simhash_pairs(ds, max_hamming=3, token_hash="md5"))


# simhash in SQL: md5-derived 64-bit token hash -> per-bit +/-1 votes
# (each token OCCURRENCE votes) -> sign bits -> brute-force Hamming<=3
# pairs. The engine's 16-bit-chunk pigeonhole bucketing is exact for
# Hamming<=3, so the pruned pipeline must equal this exact answer.
_SIMHASH_SQL = r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
  FROM documents
), th AS (
  SELECT doc_id, ('0x' || substr(md5(tok), 1, 16))::UBIGINT AS h FROM toks
), votes AS (
  SELECT doc_id, b.bit,
         SUM(CASE WHEN (h >> b.bit) & 1 = 1 THEN 1 ELSE -1 END) AS v
  FROM th, (SELECT unnest(range(0, 64)) AS bit) b
  GROUP BY 1, 2
), sim AS (
  SELECT doc_id,
         SUM(CASE WHEN v > 0 THEN (1::UBIGINT << bit) ELSE 0 END)::UBIGINT AS s
  FROM votes GROUP BY 1
)
SELECT a.doc_id AS doc_a, b.doc_id AS doc_b,
       bit_count(xor(a.s, b.s)) AS hamming
FROM sim a JOIN sim b ON a.doc_id < b.doc_id
WHERE bit_count(xor(a.s, b.s)) <= 3"""


REGISTRY["op_simhash_dedup"] = RawQ(_op_simhash_dedup, _SIMHASH_SQL)


def _op_embedding_neardup(sf_dir: str) -> pa.Table:
    import ray.data

    from ..ops.dedup import embedding_neardup_pairs

    # threshold 0.45 is the fixture's near-dup band (max cosine 0.51 —
    # round 1 gated at 0.95 and emitted 0 rows, verifying nothing);
    # 32 tables x 4 planes makes multi-table LSH recall ~1 there, so the
    # pruned pipeline must equal the oracle's exact all-pairs answer
    ds = _read_clean(f"{sf_dir}/embeddings.parquet")
    t = _collect(embedding_neardup_pairs(
        ds, threshold=0.45, n_planes=4, n_tables=32, max_full_pairwise=256
    ))
    return _round_cols(t, {"cosine": 6})


REGISTRY["op_embedding_neardup"] = RawQ(
    _op_embedding_neardup,
    """WITH n AS (SELECT vec_id, list_transform(embedding, x -> x::DOUBLE) AS emb FROM embeddings),
       m AS (SELECT vec_id, emb, sqrt(list_sum(list_transform(emb, x -> x*x))) AS nm FROM n)
       SELECT a.vec_id AS vec_a, b.vec_id AS vec_b,
              ROUND(list_inner_product(a.emb, b.emb) / (a.nm * b.nm), 6) AS cosine
       FROM m a JOIN m b ON a.vec_id < b.vec_id
       WHERE list_inner_product(a.emb, b.emb) / (a.nm * b.nm) >= 0.45""",
)


def _ann_queries(sf_dir: str):
    import numpy as np
    import pyarrow.parquet as pq

    t = pq.read_table(f"{sf_dir}/embeddings.parquet")
    mask = pc.less(t.column("vec_id"), 5)
    sub = t.filter(mask).sort_by("vec_id")
    qids = sub.column("vec_id").to_pylist()
    qm = np.array(sub.column("embedding").to_pylist(), dtype=np.float64)
    return qids, qm


def _op_ann_topk(sf_dir: str) -> pa.Table:
    import ray.data

    from ..ops.ann import brute_force_topk

    qids, qm = _ann_queries(sf_dir)
    ds = _read_clean(f"{sf_dir}/embeddings.parquet")
    return _collect(brute_force_topk(ds, qids, qm, k=10))


REGISTRY["op_ann_topk"] = RawQ(
    _op_ann_topk,
    """WITH qn AS (
         SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5
       )
       SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
              row_number() OVER (
                PARTITION BY q.vec_id
                ORDER BY list_inner_product(q.embedding, e.embedding) /
                         (sqrt(list_sum(list_transform(q.embedding, x -> x*x))) *
                          sqrt(list_sum(list_transform(e.embedding, x -> x*x)))) DESC,
                         e.vec_id) AS rank
       FROM qn q CROSS JOIN embeddings e WHERE e.vec_id != q.vec_id
       QUALIFY rank <= 10""",
)


def _op_ivf_ann(sf_dir: str) -> pa.Table:
    import ray.data

    from ..ops.ann import ivf_topk

    # generous probing (8 tables x 4 planes, Hamming-2 ball) pins recall
    # to 1.0 on the fixture (verified == brute force), so the approximate
    # path is gated against the exact SQL oracle; production configs trade
    # this recall for corpus-fraction scans
    qids, qm = _ann_queries(sf_dir)
    ds = _read_clean(f"{sf_dir}/embeddings.parquet")
    return _collect(ivf_topk(ds, qids, qm, k=10, n_planes=4, n_tables=8, probe_radius=2))


REGISTRY["op_ivf_ann"] = RawQ(_op_ivf_ann, REGISTRY["op_ann_topk"].sql)


# as-of join: every event gets the same user's most recent PRIOR (or
# simultaneous) purchase event — the "attach latest profile/version as
# of t" temporal lookup. Tie-break = greatest event_id, mirrored in the
# oracle's ROW_NUMBER ordering.
_ASOF_SQL = """
WITH p AS (
  SELECT user_id, ts, event_id, value FROM events WHERE event_type = 'purchase'
), m AS (
  SELECT e.event_id,
         p.event_id AS event_id_r, p.value AS pvalue, p.ts AS ts_r,
         ROW_NUMBER() OVER (PARTITION BY e.event_id
                            ORDER BY p.ts DESC, p.event_id DESC) AS rn
  FROM events e JOIN p ON p.user_id = e.user_id AND p.ts <= e.ts
)
SELECT e.event_id, e.user_id, e.ts, e.event_type,
       m.event_id_r, m.pvalue AS value, m.ts_r
FROM events e LEFT JOIN m ON m.event_id = e.event_id AND m.rn = 1"""


def _op_asof_join(sf_dir: str) -> pa.Table:
    from ..ops.asof import asof_join

    ev = _read_clean(f"{sf_dir}/events.parquet").select_columns(
        ["event_id", "user_id", "ts", "event_type"])
    purchases = _read_clean(f"{sf_dir}/events.parquet").filter(
        expr="event_type == 'purchase'").select_columns(
        ["event_id", "user_id", "ts", "value"])
    out = asof_join(ev, purchases, on="ts", by=["user_id"],
                    direction="backward", how="left", tiebreak="event_id",
                    right_cols=["event_id", "value", "ts"],
                    num_partitions=16)
    return _collect(out)


REGISTRY["op_asof_join"] = RawQ(_op_asof_join, _ASOF_SQL)


# range join: every event inside the 2-hour window opened by any
# purchase of the same user (campaign/session/incident-window join)
_RANGE_SQL = """
WITH p AS (
  SELECT user_id, ts AS w_start, ts + INTERVAL 2 HOUR AS w_end,
         event_id AS purchase_id
  FROM events WHERE event_type = 'purchase'
)
SELECT e.event_id, e.user_id, e.ts, p.purchase_id, p.w_start, p.w_end
FROM events e JOIN p
  ON e.user_id = p.user_id AND e.ts BETWEEN p.w_start AND p.w_end"""


def _op_range_join(sf_dir: str) -> pa.Table:
    import pyarrow.compute as pc

    from ..ops.asof import range_join

    ev = _read_clean(f"{sf_dir}/events.parquet").select_columns(
        ["event_id", "user_id", "ts"])

    def windows(batch: pa.Table) -> pa.Table:
        b = batch.filter(pc.equal(batch.column("event_type"), "purchase"))
        return pa.table({
            "user_id": b.column("user_id"),
            "w_start": b.column("ts"),
            "w_end": pc.add(b.column("ts"),
                            pa.scalar(7_200_000_000, pa.duration("us"))),
            "purchase_id": b.column("event_id"),
        })

    win = _read_clean(f"{sf_dir}/events.parquet").map_batches(
        windows, batch_format="pyarrow", zero_copy_batch=True)
    out = range_join(ev, win, on="ts", right_start="w_start",
                     right_end="w_end", by=["user_id"],
                     bucket_width=7_200_000_000, how="inner",
                     right_cols=["purchase_id", "w_start", "w_end"],
                     num_partitions=16)
    return _collect(out)


REGISTRY["op_range_join"] = RawQ(_op_range_join, _RANGE_SQL)


# CEP pattern matching (ops/cep.py): the view -> click -> purchase
# funnel per user, completing within 24 h. Two contiguity modes, each
# with its own exact SQL form: skip-till-next-match == "first matching
# row after" (LATERAL ... ORDER BY ... LIMIT 1), strict == consecutive
# rows (LEAD over the same (ts, event_id) ordering).
_CEP_FUNNEL_SQL = """
WITH e AS (SELECT user_id, ts, event_id, event_type FROM events)
SELECT v.user_id,
       v.ts AS v_ts, v.event_id AS v_event_id,
       c.c_ts, c.c_event_id, p.p_ts, p.p_event_id
FROM (SELECT * FROM e WHERE event_type = 'view') v
CROSS JOIN LATERAL (
  SELECT x.ts AS c_ts, x.event_id AS c_event_id FROM e x
  WHERE x.user_id = v.user_id AND x.event_type = 'click'
    AND (x.ts > v.ts OR (x.ts = v.ts AND x.event_id > v.event_id))
  ORDER BY x.ts, x.event_id LIMIT 1) c
CROSS JOIN LATERAL (
  SELECT y.ts AS p_ts, y.event_id AS p_event_id FROM e y
  WHERE y.user_id = v.user_id AND y.event_type = 'purchase'
    AND (y.ts > c.c_ts OR (y.ts = c.c_ts AND y.event_id > c.c_event_id))
  ORDER BY y.ts, y.event_id LIMIT 1) p
WHERE epoch_us(p.p_ts) - epoch_us(v.ts) <= 86400000000"""

_CEP_STRICT_SQL = """
WITH s AS (
  SELECT user_id, ts, event_id, event_type,
         lead(event_type, 1) OVER w AS et1,
         lead(ts, 1) OVER w AS ts1, lead(event_id, 1) OVER w AS id1,
         lead(event_type, 2) OVER w AS et2,
         lead(ts, 2) OVER w AS ts2, lead(event_id, 2) OVER w AS id2
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id))
SELECT user_id, ts AS v_ts, event_id AS v_event_id,
       ts1 AS c_ts, id1 AS c_event_id, ts2 AS p_ts, id2 AS p_event_id
FROM s WHERE event_type = 'view' AND et1 = 'click' AND et2 = 'purchase'
  AND epoch_us(ts2) - epoch_us(ts) <= 86400000000"""


def _cep(sf_dir: str, contiguity: str) -> pa.Table:
    from ..expr import F
    from ..ops.cep import match_pattern

    ds = _read_clean(f"{sf_dir}/events.parquet")
    out = match_pattern(
        ds, partition_by=["user_id"], order_by="ts",
        steps=[("v", F("event_type").Equal("view")),
               ("c", F("event_type").Equal("click")),
               ("p", F("event_type").Equal("purchase"))],
        contiguity=contiguity, within=86_400_000_000,
        tiebreak="event_id", measures=["event_id"], num_partitions=16)
    return _collect(out)


REGISTRY["op_cep_funnel"] = RawQ(lambda sf: _cep(sf, "skip"), _CEP_FUNNEL_SQL)
REGISTRY["op_cep_strict"] = RawQ(lambda sf: _cep(sf, "strict"), _CEP_STRICT_SQL)


_CEP_ABSENT_SQL = _CEP_FUNNEL_SQL + """
  AND NOT EXISTS (
    SELECT 1 FROM e z
    WHERE z.user_id = v.user_id AND z.event_type = 'error'
      AND (z.ts > v.ts OR (z.ts = v.ts AND z.event_id > v.event_id))
      AND (z.ts < p.p_ts OR (z.ts = p.p_ts AND z.event_id < p.p_event_id)))"""


def _op_cep_absent(sf_dir: str) -> pa.Table:
    """The funnel with a NEGATION: view -> click -> purchase within 24 h
    and NO 'error' event strictly between the view and the purchase
    (MATCH_RECOGNIZE-style absent constraint; ops/cep.py `absent`)."""
    from ..expr import F
    from ..ops.cep import match_pattern

    ds = _read_clean(f"{sf_dir}/events.parquet")
    out = match_pattern(
        ds, partition_by=["user_id"], order_by="ts",
        steps=[("v", F("event_type").Equal("view")),
               ("c", F("event_type").Equal("click")),
               ("p", F("event_type").Equal("purchase"))],
        contiguity="skip", within=86_400_000_000,
        tiebreak="event_id", measures=["event_id"], num_partitions=16,
        absent=[("v", "p", F("event_type").Equal("error"))])
    return _collect(out)


REGISTRY["op_cep_absent"] = RawQ(_op_cep_absent, _CEP_ABSENT_SQL)


def _op_cep_repeat(sf_dir: str) -> pa.Table:
    """Bounded repetition (round 5): view{1,3} -> click over CONSECUTIVE
    per-user rows (strict contiguity, the MATCH_RECOGNIZE model),
    greedy-possessive — the run consumes up to 3 consecutive views and
    the click must be the immediately next row. Oracle: gaps-and-islands
    run lengths (rn - row_number over the view rows) joined to the row
    at rn + LEAST(avail, 3)."""
    from ..expr import F
    from ..ops.cep import match_pattern

    ds = _read_clean(f"{sf_dir}/events.parquet")
    out = match_pattern(
        ds, partition_by=["user_id"], order_by="ts",
        steps=[("v", F("event_type").Equal("view"), (1, 3)),
               ("c", F("event_type").Equal("click"))],
        contiguity="strict", within=86_400_000_000,
        tiebreak="event_id", num_partitions=16)
    return _collect(out)


REGISTRY["op_cep_repeat"] = RawQ(
    _op_cep_repeat,
    """
WITH o AS (
  SELECT user_id, ts, event_id, event_type,
         row_number() OVER (PARTITION BY user_id
                            ORDER BY ts, event_id) AS rn
  FROM events WHERE ts IS NOT NULL),
v AS (
  SELECT user_id, ts, event_id, rn,
         max(rn) OVER (PARTITION BY user_id, grp) - rn + 1 AS avail
  FROM (SELECT *, rn - row_number() OVER (PARTITION BY user_id
                                          ORDER BY rn) AS grp
        FROM o WHERE event_type = 'view'))
SELECT v.user_id, v.ts AS v_ts, LEAST(v.avail, 3)::BIGINT AS v_n,
       c.ts AS c_ts
FROM v JOIN o c
  ON c.user_id = v.user_id AND c.rn = v.rn + LEAST(v.avail, 3)
     AND c.event_type = 'click'
WHERE epoch_us(c.ts) - epoch_us(v.ts) <= 86400000000""",
)


def _streaming_cep(sf_dir: str, contiguity: str, absent=None) -> pa.Table:
    """The same funnel run CONTINUOUSLY (streaming/cep.py): events
    replayed in event-time order as 20 epoch micro-batches; partial
    matches (views awaiting clicks/purchases up to 24 h later) survive
    across epochs in actor state; the end-of-stream flush closes the
    tail. Output must equal the bounded operator's SQL oracle exactly
    (late_drops is asserted 0 — the replay is in order)."""
    import tempfile

    import pyarrow.parquet as pq

    from ..expr import F
    from ..streaming.cep import StreamingCEPJob

    tbl = pq.read_table(f"{sf_dir}/events.parquet").sort_by(
        [("ts", "ascending"), ("event_id", "ascending")])
    outd = tempfile.mkdtemp(prefix="ksql_gate_scep_")
    job = StreamingCEPJob(
        outd, partition_by=["user_id"], order_by="ts",
        steps=[("v", F("event_type").Equal("view")),
               ("c", F("event_type").Equal("click")),
               ("p", F("event_type").Equal("purchase"))],
        contiguity=contiguity, within=86_400_000_000,
        tiebreak="event_id", measures=["event_id"], absent=absent,
        num_partitions=8, in_schema=tbl.schema)
    chunk = max(1, tbl.num_rows // 20)
    for i in range(0, tbl.num_rows, chunk):
        job.process_epoch([tbl.slice(i, chunk)])
    fin = job.finish()
    assert fin["late_drops"] == 0, fin
    return job.result()


REGISTRY["streaming_cep_funnel"] = RawQ(
    lambda sf: _streaming_cep(sf, "skip"), _CEP_FUNNEL_SQL)
REGISTRY["streaming_cep_strict"] = RawQ(
    lambda sf: _streaming_cep(sf, "strict"), _CEP_STRICT_SQL)


def _streaming_cep_absent(sf_dir: str) -> pa.Table:
    """The negated funnel run continuously: view -> click -> purchase
    within 24 h with NO error strictly between view and purchase; the
    negation flag rides the cross-epoch partial state (streaming/cep.py
    `absent`)."""
    from ..expr import F

    return _streaming_cep(
        sf_dir, "skip",
        absent=[("v", "p", F("event_type").Equal("error"))])


REGISTRY["streaming_cep_absent"] = RawQ(_streaming_cep_absent,
                                        _CEP_ABSENT_SQL)


def _streaming_cep_repeat(sf_dir: str) -> pa.Table:
    """The quantified pattern run CONTINUOUSLY (round 5): view{1,3} ->
    click over consecutive per-user rows, replayed as 20 epoch
    micro-batches — open {m,n} runs straddle epoch boundaries in actor
    state (__rep / __last_t) and the end-of-stream flush completes
    runs by exhaustion. Same oracle as op_cep_repeat."""
    import tempfile

    import pyarrow.parquet as pq

    from ..expr import F
    from ..streaming.cep import StreamingCEPJob

    tbl = pq.read_table(f"{sf_dir}/events.parquet").sort_by(
        [("ts", "ascending"), ("event_id", "ascending")])
    outd = tempfile.mkdtemp(prefix="ksql_gate_scepq_")
    job = StreamingCEPJob(
        outd, partition_by=["user_id"], order_by="ts",
        steps=[("v", F("event_type").Equal("view"), (1, 3)),
               ("c", F("event_type").Equal("click"))],
        contiguity="strict", within=86_400_000_000,
        tiebreak="event_id", num_partitions=8, in_schema=tbl.schema)
    chunk = max(1, tbl.num_rows // 20)
    for i in range(0, tbl.num_rows, chunk):
        job.process_epoch([tbl.slice(i, chunk)])
    fin = job.finish()
    assert fin["late_drops"] == 0, fin
    return job.result()


REGISTRY["streaming_cep_repeat"] = RawQ(
    _streaming_cep_repeat, REGISTRY["op_cep_repeat"].sql)


# winnowing rolling-hash fingerprints (ops/fingerprint.py): word-3-gram
# md5 hashes (15 hex digits -> BIGINT, the SQL-expressible oracle form;
# hash="fast" is the vectorized scale path, pinned by pytest), window-4
# rightmost-min selection; a doc with 1..3 grams contributes its single
# all-grams window
_WINNOW_SQL = r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
  FROM documents WHERE trim(coalesce(text, '')) <> ''
), grams AS (
  SELECT doc_id,
         unnest(range(1, len(t) - 1)) - 1 AS pos,
         unnest(list_transform(range(1, len(t) - 1),
           i -> ('0x' || substr(md5(t[i] || ' ' || t[i+1] || ' ' || t[i+2]),
                                1, 15))::BIGINT)) AS h
  FROM toks WHERE len(t) >= 3
), gc AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
wins AS (
  SELECT doc_id, unnest(range(0, greatest(n - 3, 1))) AS j FROM gc
), winmin AS (
  SELECT w.doc_id, w.j, min(g.h) AS hmin
  FROM wins w JOIN grams g ON g.doc_id = w.doc_id AND g.pos BETWEEN w.j AND w.j + 3
  GROUP BY 1, 2
), sel AS (
  SELECT m.doc_id, max(g.pos) AS pos, m.hmin AS h
  FROM winmin m JOIN grams g
    ON g.doc_id = m.doc_id AND g.h = m.hmin AND g.pos BETWEEN m.j AND m.j + 3
  GROUP BY m.doc_id, m.j, m.hmin
)
SELECT DISTINCT doc_id, pos, h FROM sel"""


def _op_winnow(sf_dir: str) -> pa.Table:
    from ..ops.fingerprint import winnow_fingerprints

    ds = _read_clean(f"{sf_dir}/documents.parquet")
    return _collect(winnow_fingerprints(ds, k=3, window=4, hash="md5"))


REGISTRY["op_winnow_fingerprint"] = RawQ(_op_winnow, _WINNOW_SQL)


def _op_media_features(sf_dir: str) -> pa.Table:
    import pyarrow.parquet as pq
    import ray.data

    from ..ops.multimodal import extract_media_features, media_table_from_documents

    # media rows derived deterministically from the documents table
    # (payload = utf-8 text bytes), so the actor-pool decode pipeline's
    # metadata outputs are pure functions of the source parquet and the
    # oracle can recompute them; the feature vector itself stays
    # pytest-verified (sha256 is the declared fake-decode stub)
    media = media_table_from_documents(pq.read_table(f"{sf_dir}/documents.parquet"))
    ds = ray.data.from_arrow(media)
    t = _collect(extract_media_features(ds, decode="fake", batch_size=64))
    return t.drop_columns(["features"]) if "features" in t.column_names else t


REGISTRY["op_media_features"] = RawQ(
    _op_media_features,
    "SELECT doc_id AS media_id, "
    "CASE doc_id % 3 WHEN 0 THEN 'image' WHEN 1 THEN 'audio' ELSE 'video' END AS kind, "
    "octet_length(encode(text)) AS n_bytes, "
    "CAST(64 AS INTEGER) AS resized_w, CAST(64 AS INTEGER) AS resized_h "
    "FROM documents",
)


def _op_media_decode(sf_dir: str) -> pa.Table:
    """REAL image decode (VERDICT r4 item #4): deterministic BMP / P6
    PPM / P5 PGM payloads are synthesized from doc_id (closed-form
    pixels), then the actor-pool decode stage parses the actual bytes
    (header, stride padding, bottom-up rows, BGR order) and emits pixel
    statistics incl. a position-weighted checksum that only a correct
    decode reproduces; the oracle recomputes every statistic from the
    pixel formula with generate_series."""
    import pyarrow.parquet as pq
    import ray.data

    from ..ops.multimodal import (extract_media_features,
                                  media_table_with_images)

    media = media_table_with_images(
        pq.read_table(f"{sf_dir}/documents.parquet", columns=["doc_id"]))
    ds = ray.data.from_arrow(media)
    t = _collect(extract_media_features(ds, decode="strict", batch_size=64))
    t = t.drop_columns(["features", "n_bytes"])
    return _round_cols(t, {"px_mean": 6})


REGISTRY["op_media_decode"] = RawQ(
    _op_media_decode,
    # pixel(r,c,ch) = (doc_id + 31r + 17c + 97ch) % 256 over
    # w = 8 + id%9, h = 8 + 3*id%7, channels = 1 for PGM rows (id%3=2)
    """
SELECT d.doc_id AS media_id,
       CASE d.doc_id % 3 WHEN 0 THEN 'bmp' WHEN 1 THEN 'ppm'
            ELSE 'pgm' END AS kind,
       d.w::INTEGER AS width, d.h::INTEGER AS height,
       d.ch_n::INTEGER AS channels,
       ROUND(AVG(p.px), 6) AS px_mean, MIN(p.px)::INTEGER AS px_min,
       MAX(p.px)::INTEGER AS px_max,
       SUM(p.px * (gr.r * 1000 + gc.c))::BIGINT AS px_wsum
FROM (SELECT doc_id, 8 + doc_id % 9 AS w, 8 + (doc_id * 3) % 7 AS h,
             CASE WHEN doc_id % 3 = 2 THEN 1 ELSE 3 END AS ch_n
      FROM documents) d
CROSS JOIN LATERAL (SELECT unnest(range(0, d.h)) AS r) gr
CROSS JOIN LATERAL (SELECT unnest(range(0, d.w)) AS c) gc
CROSS JOIN LATERAL (SELECT unnest(range(0, d.ch_n)) AS ch) gk
CROSS JOIN LATERAL (SELECT (d.doc_id + 31*gr.r + 17*gc.c + 97*gk.ch)
                           % 256 AS px) p
GROUP BY 1, 2, 3, 4, 5""",
)


def _op_frame_sample(sf_dir: str) -> pa.Table:
    import pyarrow.parquet as pq
    import ray.data

    from ..ops.multimodal import frame_sample_stub, media_table_from_documents

    media = media_table_from_documents(pq.read_table(f"{sf_dir}/documents.parquet"))
    ds = ray.data.from_arrow(media)
    return _collect(ds.map_batches(frame_sample_stub, batch_format="pyarrow"))


REGISTRY["op_frame_sample"] = RawQ(
    _op_frame_sample,
    # media rows derive from documents (media_table_from_documents):
    # kind = doc_id%3 (2 -> video), duration_ms = 1000 + doc_id%59000;
    # one frame per 1000 ms
    "SELECT doc_id AS media_id, "
    "unnest(range(0, greatest(1, (1000 + doc_id % 59000) // 1000))) AS frame_idx, "
    "unnest(range(0, greatest(1, (1000 + doc_id % 59000) // 1000))) * 1000 AS frame_ts_ms "
    "FROM documents WHERE doc_id % 3 = 2",
)


def _op_quality_filter(sf_dir: str) -> pa.Table:
    from ..ops.quality import add_repetition_stats

    ds = _read_clean(f"{sf_dir}/documents.parquet")
    t = _collect(ds.map_batches(add_repetition_stats, batch_format="pyarrow",
                                zero_copy_batch=True))
    return t.select(["doc_id", "dup_word_frac", "top_word_frac",
                     "mean_word_len", "symbol_word_ratio", "dup_line_frac"])


REGISTRY["op_quality_filter"] = RawQ(
    _op_quality_filter,
    # Gopher-style repetition stats (ops/quality.py docstring spells out
    # the contract); an all-whitespace doc splits to one '' token on
    # both sides, so no empties special-case is needed
    r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
  FROM documents
), tc AS (
  SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2
), agg AS (
  SELECT doc_id, sum(c) AS n_tok, count(*) AS n_distinct, max(c) AS top,
         sum(length(tok) * c) AS chars
  FROM tc GROUP BY 1
), lc AS (
  SELECT doc_id, ln, count(*) AS c FROM (
    SELECT doc_id, unnest(string_split(text, chr(10))) AS ln FROM documents
  ) GROUP BY 1, 2
), lagg AS (SELECT doc_id, sum(c) AS n_ln, count(*) AS n_dln FROM lc GROUP BY 1)
SELECT a.doc_id AS doc_id,
  ROUND(1 - a.n_distinct::DOUBLE / a.n_tok, 6) AS dup_word_frac,
  ROUND(a.top::DOUBLE / a.n_tok, 6) AS top_word_frac,
  ROUND(a.chars::DOUBLE / a.n_tok, 6) AS mean_word_len,
  ROUND(((length(d.text) - length(replace(d.text, '#', ''))) +
         (length(d.text) - length(replace(d.text, '...', ''))) / 3)::DOUBLE
        / a.n_tok, 6) AS symbol_word_ratio,
  ROUND(1 - l.n_dln::DOUBLE / l.n_ln, 6) AS dup_line_frac
FROM agg a JOIN documents d USING (doc_id) JOIN lagg l USING (doc_id)""",
)


def _op_pii_scrub(sf_dir: str) -> pa.Table:
    """PII scrub gate. The documents fixture contains no PII, which
    would make the oracle vacuous — so both sides first append a
    deterministic PII suffix derived from doc_id (same expression in
    the SQL), then the engine scrubs it back out."""
    import pyarrow.compute as pc

    from ..ops.scrub import scrub_pii

    def enrich(batch: pa.Table) -> pa.Table:
        ids = pc.cast(batch.column("doc_id"), pa.string())
        suffix = pc.binary_join_element_wise(
            pa.scalar(" contact user"), ids, pa.scalar("@example.com at https://ex.org/"),
            ids, pa.scalar(" or 10.0."), ids, pa.scalar(".7"), "")
        text = pc.binary_join_element_wise(batch.column("text"), suffix, "")
        return batch.set_column(batch.column_names.index("text"), "text", text)

    ds = _read_clean(f"{sf_dir}/documents.parquet")
    t = _collect(ds.map_batches(enrich, batch_format="pyarrow", zero_copy_batch=True)
                   .map_batches(scrub_pii, batch_format="pyarrow", zero_copy_batch=True))
    return t.select(["doc_id", "text_scrubbed", "n_urls", "n_emails", "n_ips"])


def _pii_scrub_sql() -> str:
    from ..ops.scrub import EMAIL_RE, IPV4_RE, URL_RE

    return f"""
WITH d AS (
  SELECT doc_id, text || ' contact user' || CAST(doc_id AS VARCHAR)
    || '@example.com at https://ex.org/' || CAST(doc_id AS VARCHAR)
    || ' or 10.0.' || CAST(doc_id AS VARCHAR) || '.7' AS text
  FROM documents
), u AS (SELECT doc_id, text, regexp_replace(text, '{URL_RE}', '<URL>', 'g') AS t1 FROM d),
e AS (SELECT *, regexp_replace(t1, '{EMAIL_RE}', '<EMAIL>', 'g') AS t2 FROM u)
SELECT doc_id, regexp_replace(t2, '{IPV4_RE}', '<IP>', 'g') AS text_scrubbed,
  length(regexp_split_to_array(text, '{URL_RE}')) - 1 AS n_urls,
  length(regexp_split_to_array(t1, '{EMAIL_RE}')) - 1 AS n_emails,
  length(regexp_split_to_array(t2, '{IPV4_RE}')) - 1 AS n_ips
FROM e"""


REGISTRY["op_pii_scrub"] = RawQ(_op_pii_scrub, _pii_scrub_sql())


def _op_stratified_sample(sf_dir: str) -> pa.Table:
    from ..ops.sample import stratified_sample

    ds = _read_clean(f"{sf_dir}/documents.parquet")
    samp = stratified_sample(
        ds, "doc_id", fractions={"en": 0.5, "de": 1.0, "fr": 0.25},
        strata_col="lang", default_fraction=0.1, method="md5",
    )
    return _collect(samp).select(["doc_id", "lang", "source"])


REGISTRY["op_stratified_sample"] = RawQ(
    _op_stratified_sample,
    # deterministic hash sampling: keep iff
    # uint32(md5(str(doc_id))[:8]) < frac(lang) * 2^32 (ops/sample.py)
    "SELECT doc_id, lang, source FROM documents "
    "WHERE ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT "
    "< (CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 1.0 WHEN 'fr' THEN 0.25 "
    "ELSE 0.1 END) * 4294967296.0",
)


def _op_top_terms(sf_dir: str) -> pa.Table:
    from ..ops.terms import top_terms

    ds = _read_clean(f"{sf_dir}/documents.parquet")
    return _collect(top_terms(ds, k=25))


REGISTRY["op_top_terms"] = RawQ(
    _op_top_terms,
    r"WITH toks AS (SELECT unnest(regexp_split_to_array(trim(lower(text)), "
    r"'\s+')) AS term FROM documents) "
    "SELECT term, count(*) AS cnt FROM toks GROUP BY 1 "
    "ORDER BY cnt DESC, term LIMIT 25",
)


def _op_top_ngrams(sf_dir: str) -> pa.Table:
    from ..ops.terms import top_ngrams

    ds = _read_clean(f"{sf_dir}/documents.parquet")
    return _collect(top_ngrams(ds, n=2, k=25))


REGISTRY["op_top_ngrams"] = RawQ(
    _op_top_ngrams,
    # corpus bigram counts (ops/terms.py top_ngrams): space-joined token
    # pairs inside each document; docs shorter than 2 tokens contribute
    # nothing (generate_series(1, 0) is empty)
    r"""
WITH t AS (
  SELECT regexp_split_to_array(trim(lower(text)), '\s+') AS toks
  FROM documents
), s AS (
  SELECT toks, unnest(generate_series(1, len(toks) - 1)) AS i FROM t)
SELECT array_to_string(toks[i : i + 1], ' ') AS term,
       count(*)::BIGINT AS cnt
FROM s GROUP BY 1 ORDER BY cnt DESC, term LIMIT 25""",
)


def _op_lm_score(sf_dir: str) -> pa.Table:
    from ..ops.lm import score_bigram_lm, train_bigram_lm

    ds = _read_clean(f"{sf_dir}/documents.parquet")
    lm = train_bigram_lm(ds, "text")
    t = _collect(score_bigram_lm(ds, lm, k=0.1))
    return _round_cols(t, {"lm_logprob": 4})


REGISTRY["op_lm_score"] = RawQ(
    _op_lm_score,
    # corpus-trained add-k bigram LM (ops/lm.py docstring spells out the
    # contract); trained on the scored corpus itself so every observed
    # transition has c2 >= 1 — no OOV branch needed on either side
    r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
  FROM documents
), trans AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1,
         unnest(list_transform(range(1, len(t)), i -> t[i + 1])) AS w2
  FROM toks WHERE len(t) >= 2
), bc AS (SELECT w1, w2, count(*) AS c2 FROM trans GROUP BY 1, 2),
cc AS (SELECT w1, count(*) AS c1 FROM trans GROUP BY 1),
v AS (SELECT count(DISTINCT tok) AS vs
      FROM (SELECT unnest(t) AS tok FROM toks)),
sc AS (
  SELECT tr.doc_id, count(*) AS n_trans,
         sum(ln((bc.c2 + 0.1) / (cc.c1 + 0.1 * v.vs))) AS lp
  FROM trans tr JOIN bc ON tr.w1 = bc.w1 AND tr.w2 = bc.w2
       JOIN cc ON tr.w1 = cc.w1 CROSS JOIN v
  GROUP BY 1)
SELECT d.doc_id, coalesce(sc.n_trans, 0) AS n_trans,
       ROUND(coalesce(sc.lp, 0.0), 4) AS lm_logprob
FROM documents d LEFT JOIN sc ON d.doc_id = sc.doc_id""",
)


def _op_bm25_topk(sf_dir: str) -> pa.Table:
    from ..ops.bm25 import bm25_topk

    ds = _read_clean(f"{sf_dir}/documents.parquet")
    t = _collect(bm25_topk(ds, "hash join vector window", k=15))
    return _round_cols(t, {"score": 4})


REGISTRY["op_bm25_topk"] = RawQ(
    _op_bm25_topk,
    # Okapi BM25 (k1=1.2, b=0.75, non-negative idf) — ops/bm25.py
    # docstring spells out the contract; ties break by doc_id asc and
    # the LIMIT is applied on the unrounded score on both sides
    r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
         AS term
  FROM documents
), dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
stats AS (SELECT count(*) AS n, avg(dl)::DOUBLE AS avgdl FROM dl),
q(term) AS (VALUES ('hash'), ('join'), ('vector'), ('window')),
df AS (SELECT t.term, count(DISTINCT t.doc_id) AS df
       FROM toks t JOIN q USING (term) GROUP BY 1),
tf AS (SELECT t.doc_id, t.term, count(*) AS tf
       FROM toks t JOIN q USING (term) GROUP BY 1, 2),
sc AS (
  SELECT tf.doc_id,
         sum(ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
             * tf.tf * 2.2
             / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)))
         AS score
  FROM tf JOIN df USING (term) JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY 1)
SELECT doc_id, round(score, 4) AS score FROM sc
ORDER BY sc.score DESC, doc_id LIMIT 15""",
)


def _op_prep_pipeline(sf_dir: str) -> pa.Table:
    """The composed prep chain (pipelines/prep.py) end-to-end over
    documents plus planted messy duplicates (every 9th doc re-appears
    uppercased with extra whitespace — normalization must fold it onto
    the original and dedup must then drop it)."""
    import ray.data

    from .prep import prep_pipeline

    docs = _read_clean(f"{sf_dir}/documents.parquet").select_columns(
        ["doc_id", "text"])

    def plant(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        cp = batch.filter(pc.equal(
            pc.subtract(ids, pc.multiply(pc.divide(ids, 9), 9)), 0))
        cp = pa.table({
            "doc_id": pc.add(cp.column("doc_id"), 1_000_000),
            "text": pc.binary_join_element_wise(
                # type= matters: an EMPTY untyped list literal becomes
                # a null-typed array and binary_join_element_wise has
                # no (null, string, string) kernel — zero-row planted
                # batches happen at high parallelism (small blocks).
                pa.array(["  "] * cp.num_rows, type=pa.string()),
                pc.utf8_upper(pc.cast(cp.column("text"), pa.string())),
                pa.array(["   "] * cp.num_rows, type=pa.string()), ""),
        })
        return pa.concat_tables(
            [pa.table({"doc_id": batch.column("doc_id"),
                       "text": pc.cast(batch.column("text"),
                                       pa.string())}), cp])

    corpus = docs.map_batches(plant, batch_format="pyarrow",
                              zero_copy_batch=True)
    return _collect(prep_pipeline(corpus, n_shards=8, form="none"))


REGISTRY["op_prep_pipeline"] = RawQ(
    _op_prep_pipeline,
    # the full chain in SQL: normalize -> Gopher quality thresholds ->
    # first-id-per-md5 dedup -> hash shard + shuffled position
    r"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         '  ' || upper(text) || '   ' AS text
  FROM documents WHERE doc_id % 9 = 0
), norm AS (
  SELECT doc_id,
         trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS text
  FROM corpus
), toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)),
                                              '\s+')) AS tok
  FROM norm
), tc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
agg AS (
  SELECT doc_id, sum(c) AS n_tok, count(*) AS n_distinct,
         max(c) AS top, sum(length(tok) * c) AS chars
  FROM tc GROUP BY 1
), lc AS (
  SELECT doc_id, ln, count(*) AS c FROM (
    SELECT doc_id, unnest(string_split(text, chr(10))) AS ln FROM norm
  ) GROUP BY 1, 2
), lagg AS (SELECT doc_id, sum(c) AS n_ln, count(*) AS n_dln
            FROM lc GROUP BY 1),
kept AS (
  SELECT n.doc_id, n.text FROM norm n
  JOIN agg a USING (doc_id) JOIN lagg l USING (doc_id)
  WHERE ROUND(1 - a.n_distinct::DOUBLE / a.n_tok, 6) <= 0.30
    AND ROUND(a.top::DOUBLE / a.n_tok, 6) <= 0.20
    AND ROUND(1 - l.n_dln::DOUBLE / l.n_ln, 6) <= 0.30
    AND ROUND(((length(n.text) - length(replace(n.text, '#', ''))) +
               (length(n.text) - length(replace(n.text, '...', ''))) / 3
              )::DOUBLE / a.n_tok, 6) <= 0.10
    AND ROUND(a.chars::DOUBLE / a.n_tok, 6) BETWEEN 2.0 AND 12.0
), uniq AS (
  SELECT doc_id, text FROM (
    SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text)
                                 ORDER BY doc_id) AS rn
    FROM kept) WHERE rn = 1
), sh AS (
  SELECT doc_id, text,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT AS h
  FROM uniq)
SELECT doc_id, text, (h % 8)::BIGINT AS shard,
       ROW_NUMBER() OVER (PARTITION BY h % 8 ORDER BY h, doc_id) - 1
         AS pos
FROM sh""",
)


def _streaming_prep(sf_dir: str) -> pa.Table:
    """The prep chain ON INGEST: documents + messy planted dups (every
    9th doc re-appears uppercased with extra whitespace), replayed in
    doc_id order as 8 micro-batch files through StreamingDedupJob with
    ``pre_transform=prep_batch`` — normalize → Gopher quality filter →
    first-occurrence md5 dedup in ONE ingest pass. Arrival order ==
    doc_id order, so first-occurrence == the oracle's min-id rule."""
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from ..streaming.dedup import StreamingDedupJob
    from .prep import prep_batch

    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    docs = docs.set_column(
        docs.schema.get_field_index("text"), "text",
        pc.cast(docs.column("text"), pa.string()))
    ids = docs.column("doc_id")
    m9 = pc.subtract(ids, pc.multiply(pc.divide(ids, 9), 9))
    cp = docs.filter(pc.equal(m9, 0))
    planted = pa.table({
        "doc_id": pc.add(cp.column("doc_id"), 1_000_000),
        "text": pc.binary_join_element_wise(
            pa.array(["  "] * cp.num_rows, type=pa.string()),
            pc.utf8_upper(cp.column("text")),
            pa.array(["   "] * cp.num_rows, type=pa.string()), ""),
    })
    corpus = pa.concat_tables([docs, planted])
    corpus = corpus.take(pc.sort_indices(
        corpus, sort_keys=[("doc_id", "ascending")]))
    n = corpus.num_rows
    fdir = tempfile.mkdtemp(prefix="ksql_ray_sprep_in_")
    out = tempfile.mkdtemp(prefix="ksql_ray_sprep_out_")
    try:
        files = []
        for i in range(8):
            s = corpus.slice(i * n // 8, (i + 1) * n // 8 - i * n // 8)
            p = os.path.join(fdir, f"b{i:02d}.parquet")
            pq.write_table(s, p)
            files.append(p)
        job = StreamingDedupJob(out, method="md5", num_partitions=4,
                                columns=["doc_id", "text"],
                                pre_transform=prep_batch)
        job.run(files, files_per_epoch=2)
        job.finish()
        t = job.result().select(["doc_id", "text"])
        return t.take(pc.sort_indices(t, sort_keys=[("doc_id",
                                                     "ascending")]))
    finally:
        shutil.rmtree(fdir, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


REGISTRY["streaming_prep"] = RawQ(
    _streaming_prep,
    # the op_prep_pipeline chain through dedup (no shard step):
    # normalize -> Gopher thresholds -> first-id-per-md5
    r"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id,
         '  ' || upper(text) || '   ' AS text
  FROM documents WHERE doc_id % 9 = 0
), norm AS (
  SELECT doc_id,
         trim(regexp_replace(lower(text), '\s+', ' ', 'g')) AS text
  FROM corpus
), toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)),
                                              '\s+')) AS tok
  FROM norm
), tc AS (SELECT doc_id, tok, count(*) AS c FROM toks GROUP BY 1, 2),
agg AS (
  SELECT doc_id, sum(c) AS n_tok, count(*) AS n_distinct,
         max(c) AS top, sum(length(tok) * c) AS chars
  FROM tc GROUP BY 1
), lc AS (
  SELECT doc_id, ln, count(*) AS c FROM (
    SELECT doc_id, unnest(string_split(text, chr(10))) AS ln FROM norm
  ) GROUP BY 1, 2
), lagg AS (SELECT doc_id, sum(c) AS n_ln, count(*) AS n_dln
            FROM lc GROUP BY 1),
kept AS (
  SELECT n.doc_id, n.text FROM norm n
  JOIN agg a USING (doc_id) JOIN lagg l USING (doc_id)
  WHERE ROUND(1 - a.n_distinct::DOUBLE / a.n_tok, 6) <= 0.30
    AND ROUND(a.top::DOUBLE / a.n_tok, 6) <= 0.20
    AND ROUND(1 - l.n_dln::DOUBLE / l.n_ln, 6) <= 0.30
    AND ROUND(((length(n.text) - length(replace(n.text, '#', ''))) +
               (length(n.text) - length(replace(n.text, '...', ''))) / 3
              )::DOUBLE / a.n_tok, 6) <= 0.10
    AND ROUND(a.chars::DOUBLE / a.n_tok, 6) BETWEEN 2.0 AND 12.0
)
SELECT doc_id, text FROM (
  SELECT *, ROW_NUMBER() OVER (PARTITION BY md5(text)
                               ORDER BY doc_id) AS rn
  FROM kept) WHERE rn = 1
ORDER BY doc_id""",
)


def _op_bm25_multi(sf_dir: str) -> pa.Table:
    from ..ops.bm25 import bm25_topk_multi

    ds = _read_clean(f"{sf_dir}/documents.parquet")
    t = _collect(bm25_topk_multi(
        ds, {"q1": "hash join", "q2": "vector window scan"}, k=10))
    return _round_cols(t, {"score": 4})


REGISTRY["op_bm25_multi"] = RawQ(
    _op_bm25_multi,
    # batch retrieval: one corpus scan scores every query
    # (ops/bm25.py bm25_topk_multi); rank per qid on the unrounded score
    r"""
WITH toks AS (
  SELECT doc_id, unnest(regexp_split_to_array(trim(lower(text)), '\s+'))
         AS term
  FROM documents
), dl AS (SELECT doc_id, count(*) AS dl FROM toks GROUP BY 1),
stats AS (SELECT count(*) AS n, avg(dl)::DOUBLE AS avgdl FROM dl),
q(qid, term) AS (VALUES ('q1', 'hash'), ('q1', 'join'),
                        ('q2', 'vector'), ('q2', 'window'),
                        ('q2', 'scan')),
qt AS (SELECT DISTINCT term FROM q),
df AS (SELECT t.term, count(DISTINCT t.doc_id) AS df
       FROM toks t JOIN qt USING (term) GROUP BY 1),
tf AS (SELECT t.doc_id, t.term, count(*) AS tf
       FROM toks t JOIN qt USING (term) GROUP BY 1, 2),
sc AS (
  SELECT q.qid, tf.doc_id,
         sum(ln(1 + (s.n - df.df + 0.5) / (df.df + 0.5))
             * tf.tf * 2.2
             / (tf.tf + 1.2 * (1 - 0.75 + 0.75 * dl.dl / s.avgdl)))
         AS score
  FROM q JOIN tf USING (term) JOIN df USING (term)
       JOIN dl USING (doc_id) CROSS JOIN stats s
  GROUP BY 1, 2
), r AS (
  SELECT qid, doc_id, score,
         ROW_NUMBER() OVER (PARTITION BY qid
                            ORDER BY score DESC, doc_id) AS rn
  FROM sc)
SELECT qid, doc_id, round(score, 4) AS score FROM r WHERE rn <= 10""",
)


def _op_dsir_select(sf_dir: str) -> pa.Table:
    from ..ops.dsir import dsir_select

    ds = _read_clean(f"{sf_dir}/documents.parquet")

    def is_target(batch: pa.Table):
        return pc.greater_equal(batch.column("n_chars"),
                                300).to_numpy(zero_copy_only=False)

    # fused one-pass form (target = predicate over the scored corpus);
    # pytest pins it equal to the two-corpus two-pass form
    t = _collect(dsir_select(ds, n=50, buckets=1024,
                             target_mask=is_target))
    return _round_cols(t, {"dsir_logw": 4})


REGISTRY["op_dsir_select"] = RawQ(
    _op_dsir_select,
    # DSIR importance resampling (ops/dsir.py docstring spells out the
    # contract): hashed-bigram buckets via md5, target = n_chars >= 300,
    # add-0.5 smoothing, deterministic top-n (score desc, doc_id asc);
    # the LIMIT is applied on the unrounded score on both sides
    r"""
WITH toks AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
  FROM documents
), trans AS (
  SELECT doc_id,
         unnest(list_transform(range(1, len(t)), i -> t[i])) AS w1,
         unnest(list_transform(range(1, len(t)), i -> t[i + 1])) AS w2
  FROM toks WHERE len(t) >= 2
), tb AS (
  SELECT doc_id,
         ('0x' || substr(md5(w1 || ' ' || w2), 1, 8))::UBIGINT % 1024 AS b
  FROM trans
), tgt AS (
  SELECT b, count(*) AS c FROM tb JOIN documents USING (doc_id)
  WHERE n_chars >= 300 GROUP BY 1
), raw AS (SELECT b, count(*) AS c FROM tb GROUP BY 1),
tot AS (SELECT (SELECT coalesce(sum(c), 0) FROM tgt) AS tt,
               (SELECT coalesce(sum(c), 0) FROM raw) AS rt),
lw AS (
  SELECT r.b,
         ln((coalesce(t.c, 0) + 0.5) / (tot.tt + 0.5 * 1024))
         - ln((r.c + 0.5) / (tot.rt + 0.5 * 1024)) AS w
  FROM raw r LEFT JOIN tgt t USING (b) CROSS JOIN tot
), sc AS (
  SELECT tb.doc_id, count(*) AS n_grams, sum(lw.w) AS s
  FROM tb JOIN lw USING (b) GROUP BY 1)
SELECT d.doc_id, coalesce(sc.n_grams, 0) AS n_grams,
       round(coalesce(sc.s, 0.0), 4) AS dsir_logw
FROM documents d LEFT JOIN sc USING (doc_id)
ORDER BY coalesce(sc.s, 0.0) DESC, d.doc_id LIMIT 50""",
)


# --------------------------------------------------------------- streaming
# The streaming engine itself under the driver's oracle gate: the events
# table replayed as ts-ordered micro-batches through StreamingJob; with no
# late data and an end-of-stream flush, EMIT FINAL output must equal the
# bounded SQL result (the north_rule conformance invariant).


def _stream_events(sf_dir: str, builder_fn, out_tag: str) -> pa.Table:
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from ..streaming.driver import StreamingJob

    cat = testdata_catalog(sf_dir)
    tbl = pq.read_table(f"{sf_dir}/events.parquet")
    tbl = tbl.take(pc.sort_indices(tbl, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]))
    n = tbl.num_rows
    batches = [tbl.slice(i * n // 8, (i + 1) * n // 8 - i * n // 8) for i in range(8)]
    out = tempfile.mkdtemp(prefix=f"ksql_ray_stream_{out_tag}_")
    fdir = tempfile.mkdtemp(prefix=f"ksql_ray_stream_{out_tag}_in_")
    try:
        # replay from parquet FILES so the pruned-read path (the one a
        # real deployment uses) is what every streaming gate exercises
        files = []
        for i, b in enumerate(batches):
            p = os.path.join(fdir, f"b{i:02d}.parquet")
            pq.write_table(b, p)
            files.append(p)
        job = StreamingJob(builder_fn(), cat, out, num_partitions=4,
                           lateness_us=1 << 60)
        job.run(files, files_per_epoch=1)
        job.finish()
        return job.result()
    finally:
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(fdir, ignore_errors=True)


def _streaming_tumbling(sf_dir: str) -> pa.Table:
    def b():
        return (Select(F("user_id"), Count(F("event_id")).As("cnt"),
                       Sum(F("value")).As("sv"))
                .From(Schema("events")).GroupBy(F("user_id"))
                .Windowed(Tumbling(1, HOURS)).EmitFinal())

    return _round_cols(_stream_events(sf_dir, b, "tumb"), {"sv": 4})


REGISTRY["streaming_window_tumbling"] = RawQ(
    _streaming_tumbling,
    f"SELECT make_timestamp((epoch_us(ts) // {HOUR_US}) * {HOUR_US}) AS window_start, "
    f"make_timestamp((epoch_us(ts) // {HOUR_US}) * {HOUR_US} + {HOUR_US}) AS window_end, "
    "user_id, count(event_id) AS cnt, ROUND(sum(value), 4) AS sv "
    "FROM events GROUP BY 1, 2, 3",
)


def _streaming_percentile(sf_dir: str) -> pa.Table:
    """The 13th aggregate under the streaming engine: tumbling-window
    p50/p90 of value per user via EMIT FINAL (the accumulator path),
    vs the bounded quantile_disc oracle."""
    from ..aggregates import Percentile

    def b():
        return (Select(F("user_id"),
                       Percentile(F("value"), 0.5).As("p50"),
                       Percentile(F("value"), 0.9).As("p90"))
                .From(Schema("events")).GroupBy(F("user_id"))
                .Windowed(Tumbling(1, HOURS)).EmitFinal())

    return _round_cols(_stream_events(sf_dir, b, "pctl"),
                       {"p50": 4, "p90": 4})


REGISTRY["streaming_percentile"] = RawQ(
    _streaming_percentile,
    f"SELECT make_timestamp((epoch_us(ts) // {HOUR_US}) * {HOUR_US}) "
    "AS window_start, "
    f"make_timestamp((epoch_us(ts) // {HOUR_US}) * {HOUR_US} + "
    f"{HOUR_US}) AS window_end, "
    "user_id, ROUND(quantile_disc(value, 0.5), 4) AS p50, "
    "ROUND(quantile_disc(value, 0.9), 4) AS p90 "
    "FROM events GROUP BY 1, 2, 3",
)


def _streaming_stddev(sf_dir: str) -> pa.Table:
    """VAR_SAMP/STDDEV_SAMP under the streaming engine: tumbling
    EMIT FINAL via the algebraic (sum, sumsq, count) accumulator.

    Gate form note: the 2-decimal event values make per-(window, user)
    variances exact rationals with denominator n(n-1)·10^4, which TIE
    at any fixed-decimal ROUND (measured: DuckDB and the engine land
    on opposite sides of the .00005 boundary) — so the gate carries
    the variance as the exact integer var·n(n-1)·10^4 instead, and the
    irrational stddev rounded at 4 (ties measure-zero)."""
    import numpy as np

    from ..aggregates import Count as CountAgg
    from ..aggregates import StdDev, VarSamp

    def b():
        return (Select(F("user_id"),
                       VarSamp(F("value")).As("vv"),
                       StdDev(F("value")).As("sv"),
                       CountAgg(F("value")).As("cnt"))
                .From(Schema("events")).GroupBy(F("user_id"))
                .Windowed(Tumbling(1, HOURS)).EmitFinal())

    t = _stream_events(sf_dir, b, "stdd")
    vv = t.column("vv").to_numpy(zero_copy_only=False)
    n = t.column("cnt").to_numpy(zero_copy_only=False).astype(np.float64)
    scaled = vv * (n * (n - 1.0)) * 10000.0
    idx = t.column_names.index("vv")
    t = t.set_column(idx, "vv_scaled", pa.array(
        np.where(np.isnan(scaled), np.nan, np.rint(scaled)),
        type=pa.float64(), from_pandas=True))
    return _round_cols(t, {"sv": 4})


REGISTRY["streaming_stddev"] = RawQ(
    _streaming_stddev,
    f"SELECT make_timestamp((epoch_us(ts) // {HOUR_US}) * {HOUR_US}) "
    "AS window_start, "
    f"make_timestamp((epoch_us(ts) // {HOUR_US}) * {HOUR_US} + "
    f"{HOUR_US}) AS window_end, "
    "user_id, ROUND(var_samp(value) * (count(value) * "
    "(count(value) - 1.0)) * 10000.0, 0) AS vv_scaled, "
    "ROUND(stddev_samp(value), 4) AS sv, "
    "count(value)::BIGINT AS cnt "
    "FROM events GROUP BY 1, 2, 3",
)


def _streaming_hopping(sf_dir: str) -> pa.Table:
    def b():
        return (Select(F("user_id"), Count(F("event_id")).As("cnt"))
                .From(Schema("events")).GroupBy(F("user_id"))
                .Windowed(Hopping(60, MINUTES, 30, MINUTES)).EmitFinal())

    return _stream_events(sf_dir, b, "hop")


REGISTRY["streaming_window_hopping"] = RawQ(
    _streaming_hopping,
    f"""WITH exp AS (
      SELECT user_id, event_id,
             unnest(range(greatest((epoch_us(ts) - {HOUR_US}) // {HALF_US} + 1, 0),
                          epoch_us(ts) // {HALF_US} + 1)) AS k
      FROM events)
    SELECT make_timestamp(k * {HALF_US}) AS window_start,
           make_timestamp(k * {HALF_US} + {HOUR_US}) AS window_end,
           user_id, count(event_id) AS cnt
    FROM exp GROUP BY 1, 2, 3""",
)


def _streaming_session(sf_dir: str) -> pa.Table:
    def b():
        return (Select(F("user_id"), Count(F("event_id")).As("cnt"))
                .From(Schema("events")).GroupBy(F("user_id"))
                .Windowed(Session(30, MINUTES)).EmitFinal())

    return _stream_events(sf_dir, b, "sess")


REGISTRY["streaming_window_session"] = RawQ(
    _streaming_session,
    f"""WITH flagged AS (
      SELECT user_id, event_id, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {GAP_US}
                  THEN 1 ELSE 0 END AS new_sess
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM flagged)
    SELECT min(ts) AS window_start, max(ts) AS window_end, user_id,
           count(event_id) AS cnt
    FROM sessions GROUP BY user_id, sess_id""",
)


# ---------------------------------------------------------- stream-stream join
# StreamJoinJob (symmetric hash join with WITHIN bound) under the oracle:
# events self-joined on user_id within a 10-minute window, replayed as
# ts-ordered micro-batches (mirror of ksql/join.go:28-34 +
# select_builder_test.go:108,173 verbs; rows-equal vs DuckDB).


def _streaming_stream_join(sf_dir: str) -> pa.Table:
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from ..streaming.join import StreamJoinJob

    cat = testdata_catalog(sf_dir)
    tbl = pq.read_table(f"{sf_dir}/events.parquet")
    tbl = tbl.take(pc.sort_indices(
        tbl, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
    ))
    n = tbl.num_rows
    batches = [tbl.slice(i * n // 8, (i + 1) * n // 8 - i * n // 8) for i in range(8)]
    b = (Select(F("user_id"), F("event_id").As("left_id"),
                F("e2.event_id").As("right_id"))
         .From(Schema("events"))
         .Join(Schema("events", alias="e2"),
               F("events.user_id").Equal(F("e2.user_id"))))
    out = tempfile.mkdtemp(prefix="ksql_ray_sjoin_")
    try:
        job = StreamJoinJob(b, cat, out, within_us=600_000_000,
                            num_partitions=4, lateness_us=1 << 60)
        for bt in batches:
            job.process_epoch([bt], [bt])
        job.finish()
        return job.result()
    finally:
        shutil.rmtree(out, ignore_errors=True)


REGISTRY["streaming_stream_join"] = RawQ(
    _streaming_stream_join,
    "SELECT a.user_id AS user_id, a.event_id AS left_id, b.event_id AS right_id "
    "FROM events a JOIN events b ON a.user_id = b.user_id "
    "WHERE abs(epoch_us(a.ts) - epoch_us(b.ts)) <= 600000000",
)


# ------------------------------------------ streaming RIGHT/OUTER join gates
# Reference verbs RightJoin/OuterJoin (ksql/select_builder.go:353-374) in
# the PUSH-query path: events replayed as micro-batches against the
# customer table, never-matched build rows null-padded exactly once at
# end-of-stream (matched-bitmap state).


def _stream_project_join(sf_dir: str, how: str) -> pa.Table:
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from ..streaming.driver import StreamingProjectJob

    cat = testdata_catalog(sf_dir)
    tbl = pq.read_table(f"{sf_dir}/events.parquet")
    tbl = tbl.take(pc.sort_indices(
        tbl, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]
    ))
    n = tbl.num_rows
    batches = [tbl.slice(i * n // 8, (i + 1) * n // 8 - i * n // 8) for i in range(8)]
    b = Select(F("event_id"), F("user_id"), F("c_name")).From(Schema("events"))
    cond = F("events.user_id").Equal(F("customer.c_custkey"))
    b = b.RightJoin(Schema("customer"), cond) if how == "right" else \
        b.OuterJoin(Schema("customer"), cond)
    out = tempfile.mkdtemp(prefix=f"ksql_ray_spj_{how}_")
    try:
        job = StreamingProjectJob(b, cat, out)
        for bt in batches:
            job.process_epoch([bt])
        job.finish()
        return job.result()
    finally:
        shutil.rmtree(out, ignore_errors=True)


REGISTRY["streaming_join_right"] = RawQ(
    lambda sf: _stream_project_join(sf, "right"),
    "SELECT e.event_id AS event_id, c.c_custkey AS user_id, c.c_name AS c_name "
    "FROM events e RIGHT JOIN customer c ON e.user_id = c.c_custkey",
)

REGISTRY["streaming_join_outer"] = RawQ(
    lambda sf: _stream_project_join(sf, "outer"),
    "SELECT e.event_id AS event_id, "
    "coalesce(e.user_id, c.c_custkey) AS user_id, c.c_name AS c_name "
    "FROM events e FULL OUTER JOIN customer c ON e.user_id = c.c_custkey",
)


# ------------------------------------------------------------------- DDL/DML
# CREATE + INSERT VALUES (missing column -> NULL) + INSERT AS SELECT +
# CTAS, read back through a pull query — the reference's largest test
# corpora (create_builder_test.go:48-136, insert_builder_test.go:68-176)
# under the DuckDB oracle instead of pytest-only.


def _ddl_insert_ctas(sf_dir: str) -> pa.Table:
    import shutil
    import tempfile

    from ..catalog import Ref
    from ..ddl import Create, Insert, Metadata

    cat = testdata_catalog(sf_dir)
    eng = Engine(cat)
    base = tempfile.mkdtemp(prefix="ksql_ray_ddl_")
    try:
        Create(Ref.STREAM, "hi_events").SchemaFields(
            ("event_id", pa.int64()), ("user_id", pa.int64()),
            ("value", pa.float64()),
        ).With(Metadata(topic=f"{base}/hi_events")).execute(cat)
        Insert(Ref.STREAM, "hi_events").Rows(
            {"event_id": -1, "user_id": 9001, "value": 123.5},
            {"event_id": -2, "user_id": 9002},  # missing column -> NULL
        ).execute(cat)
        Insert(Ref.STREAM, "hi_events").AsSelect(
            Select(F("event_id"), F("user_id"), F("value"))
            .From(Schema("events")).Where(F("value").Greater(150.0))
        ).execute(cat, eng)
        Create(Ref.TABLE, "user_value").AsSelect(
            Select(F("user_id"), Count(F("event_id")).As("cnt"),
                   Sum(F("value")).As("sv"))
            .From(Schema("hi_events")).GroupBy(F("user_id")).EmitChanges()
        ).With(Metadata(topic=f"{base}/user_value")).execute(cat, eng)
        t = eng.table(
            Select(F("user_id"), F("cnt"), F("sv")).From(Schema("user_value"))
        )
        # DuckDB-equivalent rounding (NULL-preserving; see _round_cols).
        return _round_cols(t, {"sv": 4})
    finally:
        shutil.rmtree(base, ignore_errors=True)


REGISTRY["ddl_insert_ctas"] = RawQ(
    _ddl_insert_ctas,
    "WITH hi AS ("
    "  SELECT event_id, user_id, value FROM events WHERE value > 150.0"
    "  UNION ALL SELECT -1, 9001, 123.5"
    "  UNION ALL SELECT -2, 9002, NULL"
    ") SELECT user_id, count(event_id) AS cnt, ROUND(sum(value), 4) AS sv "
    "FROM hi GROUP BY 1",
)


def _ddl_migrations(sf_dir: str) -> pa.Table:
    """Migration chain + List/Describe under the oracle gate: apply an
    ``-- +seeker Up/Down`` chain (AutoMigrate), revert the newest (Down),
    then read the system table, LIST and DESCRIBE back as one flat
    (kind, name, value) relation. Mirrors migrator.go:43-187 semantics;
    deterministic, so the oracle is a constant VALUES table."""
    import os
    import shutil
    import tempfile

    from ..catalog import Catalog
    from ..ddl import Describe, List
    from ..migrations import Migrator

    tmp = tempfile.mkdtemp(prefix="ksql_ray_mig_gate_")
    try:
        mdir = os.path.join(tmp, "migrations")
        os.makedirs(mdir)
        files = {
            "1001_init_users.sql": (
                "-- +seeker Up\n"
                "CREATE STREAM users (id INT, name VARCHAR, joined TIMESTAMP)"
                " WITH (PARTITIONS = 4);\n"
                "-- +seeker Down\nDROP STREAM users;\n"
            ),
            "1002_orders.sql": (
                "-- +seeker Up\n"
                "CREATE TABLE orders (order_id BIGINT PRIMARY KEY, amount DOUBLE);\n"
                "-- +seeker Down\nDROP TABLE orders;\n"
            ),
            "1003_scores.sql": (
                "-- +seeker Up\nCREATE TABLE scores (sid INT, val DOUBLE);\n"
                "-- +seeker Down\nDROP TABLE scores;\n"
            ),
        }
        for fn, text in files.items():
            with open(os.path.join(mdir, fn), "w") as f:
                f.write(text)
        cat = Catalog()
        mig = Migrator(cat, os.path.join(tmp, "state"))
        applied = mig.auto_migrate(mdir)
        assert applied == [1001, 1002, 1003]
        mig.down(os.path.join(mdir, "1003_scores.sql"))  # revert newest
        rows: list[tuple[str, str, str]] = []
        for r in mig.applied():
            rows.append(("applied", str(r["version"]), r["name"]))
        for rel in List(cat):
            rows.append(("relation", rel["name"], rel["kind"]))
        d = Describe(cat, "users")
        for fld in d["fields"]:
            rows.append(("column", f"users.{fld['name']}", fld["type"]))
        rows.append(("pk", "orders", Describe(cat, "orders")["primary_key"]))
        rows.append(("partitions", "users", str(d["partitions"])))
        rows.sort()
        return pa.table({
            "kind": pa.array([r[0] for r in rows]),
            "name": pa.array([r[1] for r in rows]),
            "value": pa.array([r[2] for r in rows]),
        })
    finally:
        shutil.rmtree(tmp, ignore_errors=True)


def _streaming_recovery(sf_dir: str) -> pa.Table:
    """Kill-and-resume under the oracle gate (north_rule's checkpoint
    clause): half the epochs run with actor-state snapshots, the job
    "dies", a fresh job resumes from the checkpoint manifest and replays
    the full stream (epochs <= the cursor are skipped; the two-phase sink
    skips replayed writes), and the committed EMIT FINAL output must
    still equal the bounded SQL aggregate."""
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from ..streaming.driver import StreamingJob

    def b():
        return (Select(F("user_id"), Count(F("event_id")).As("cnt"),
                       Sum(F("value")).As("sv"))
                .From(Schema("events")).GroupBy(F("user_id"))
                .Windowed(Tumbling(1, HOURS)).EmitFinal())

    cat = testdata_catalog(sf_dir)
    tbl = pq.read_table(f"{sf_dir}/events.parquet")
    tbl = tbl.take(pc.sort_indices(
        tbl, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]))
    n = tbl.num_rows
    batches = [tbl.slice(i * n // 8, (i + 1) * n // 8 - i * n // 8) for i in range(8)]
    base = tempfile.mkdtemp(prefix="ksql_ray_stream_recov_")
    out, ck = f"{base}/out", f"{base}/ck"
    try:
        job = StreamingJob(b(), cat, out, num_partitions=4,
                           lateness_us=1 << 60,
                           checkpoint_dir=ck, checkpoint_every=2)
        for batch in batches[:4]:
            job.process_epoch([batch])
        # crash here: no finish(); resume from the checkpoint manifest
        job2 = StreamingJob(b(), cat, out, num_partitions=4,
                            lateness_us=1 << 60,
                            checkpoint_dir=ck, checkpoint_every=2,
                            resume=True)
        for batch in batches:  # full replay; committed epochs skip
            job2.process_epoch([batch])
        job2.finish()
        return _round_cols(job2.result(), {"sv": 4})
    finally:
        shutil.rmtree(base, ignore_errors=True)


REGISTRY["streaming_recovery"] = RawQ(
    _streaming_recovery,
    f"SELECT make_timestamp((epoch_us(ts) // {HOUR_US}) * {HOUR_US}) AS window_start, "
    f"make_timestamp((epoch_us(ts) // {HOUR_US}) * {HOUR_US} + {HOUR_US}) AS window_end, "
    "user_id, count(event_id) AS cnt, ROUND(sum(value), 4) AS sv "
    "FROM events GROUP BY 1, 2, 3",
)


def _streaming_rescale(sf_dir: str) -> pa.Table:
    """Cluster rescale under the oracle gate (north_rule's two-cluster-
    size clause): half the epochs run at 4 partitions with checkpoints,
    the checkpoint is RESHARDED to 8 partitions
    (StreamingJob.reshard_from — keyed state re-bucketed by the same
    routing hash), a fresh 8-partition job resumes and replays the full
    stream, and the committed EMIT FINAL output must still equal the
    bounded SQL aggregate."""
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from ..streaming.driver import StreamingJob

    def b():
        return (Select(F("user_id"), Count(F("event_id")).As("cnt"),
                       Sum(F("value")).As("sv"))
                .From(Schema("events")).GroupBy(F("user_id"))
                .Windowed(Tumbling(1, HOURS)).EmitFinal())

    cat = testdata_catalog(sf_dir)
    tbl = pq.read_table(f"{sf_dir}/events.parquet")
    tbl = tbl.take(pc.sort_indices(
        tbl, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]))
    n = tbl.num_rows
    batches = [tbl.slice(i * n // 8, (i + 1) * n // 8 - i * n // 8)
               for i in range(8)]
    base = tempfile.mkdtemp(prefix="ksql_ray_stream_rescale_")
    out, ck4, ck8 = f"{base}/out", f"{base}/ck4", f"{base}/ck8"
    try:
        job = StreamingJob(b(), cat, out, num_partitions=4,
                           lateness_us=1 << 60,
                           checkpoint_dir=ck4, checkpoint_every=1)
        for batch in batches[:4]:
            job.process_epoch([batch])
        # "cluster grows" here: reshard 4 -> 8 and resume at 8
        job2 = StreamingJob(b(), cat, out, num_partitions=8,
                            lateness_us=1 << 60,
                            checkpoint_dir=ck8, checkpoint_every=2)
        info = job2.reshard_from(ck4)
        assert info["old_partitions"] == 4 and info["new_partitions"] == 8
        for batch in batches:  # full replay; committed epochs skip
            job2.process_epoch([batch])
        job2.finish()
        return _round_cols(job2.result(), {"sv": 4})
    finally:
        shutil.rmtree(base, ignore_errors=True)


REGISTRY["streaming_rescale"] = RawQ(
    _streaming_rescale,
    f"SELECT make_timestamp((epoch_us(ts) // {HOUR_US}) * {HOUR_US}) AS window_start, "
    f"make_timestamp((epoch_us(ts) // {HOUR_US}) * {HOUR_US} + {HOUR_US}) AS window_end, "
    "user_id, count(event_id) AS cnt, ROUND(sum(value), 4) AS sv "
    "FROM events GROUP BY 1, 2, 3",
)


def _join_cross_large(sf_dir: str) -> pa.Table:
    """Large x large CROSS via the block-nested-loop opt-in: force the
    BNL path with broadcast_max_bytes=0 (no side may broadcast) and
    reduce the product immediately (orders x region -> count/sum per
    region) so only the aggregate leaves the workers."""
    cat = testdata_catalog(sf_dir)
    eng = Engine(cat, broadcast_max_bytes=0, allow_large_cross=True)
    t = eng.table(
        Select(F("r_name"), Count(F("o_orderkey")).As("cnt"),
               Sum(F("o_totalprice")).As("tp"))
        .From(Schema("orders")).CrossJoin(Schema("region"))
        .GroupBy(F("r_name"))
    )
    return _round_cols(t, {"tp": 4})


REGISTRY["join_cross_large"] = RawQ(
    _join_cross_large,
    "SELECT r_name, count(o_orderkey) AS cnt, ROUND(sum(o_totalprice), 4) AS tp "
    "FROM orders CROSS JOIN region GROUP BY 1",
)


def _streaming_emit_changes(sf_dir: str) -> pa.Table:
    """EMIT CHANGES conformance under the hard signal: an unwindowed
    aggregation replayed as 8 micro-batch epochs emits a changelog; the
    LAST emitted row per key (reconstructed from the sink's
    per-(partition, epoch) files) must equal the bounded SQL aggregate
    (ksqlDB table-changelog semantics, ksql/select_builder.go:131-137)."""
    import os as _os
    import re
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from ..streaming.driver import StreamingJob

    cat = testdata_catalog(sf_dir)
    tbl = pq.read_table(f"{sf_dir}/events.parquet")
    tbl = tbl.take(pc.sort_indices(
        tbl, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]))
    n = tbl.num_rows
    batches = [tbl.slice(i * n // 8, (i + 1) * n // 8 - i * n // 8)
               for i in range(8)]
    out = tempfile.mkdtemp(prefix="ksql_ray_stream_changes_")
    fdir = tempfile.mkdtemp(prefix="ksql_ray_stream_changes_in_")
    try:
        # replay from actual parquet FILES (not in-memory tables) so the
        # pruned-read path is under the gate too — an unwindowed job once
        # pruned the ts column out of the file read and only the file
        # path could catch it
        files = []
        for i, b in enumerate(batches):
            p = _os.path.join(fdir, f"b{i:02d}.parquet")
            pq.write_table(b, p)
            files.append(p)
        q = (Select(F("user_id"), Count(F("event_id")).As("cnt"),
                    Sum(F("value")).As("sv"))
             .From(Schema("events")).GroupBy(F("user_id"))
             .EmitChanges())
        job = StreamingJob(q, cat, out, num_partitions=4,
                           lateness_us=1 << 60)
        job.run(files, files_per_epoch=1)
        job.finish()
        parts = []
        for f in sorted(_os.listdir(out)):
            m = re.match(r"part-\d+-epoch-(\d+)\.parquet$", f)
            if not m:
                continue
            t = pq.read_table(_os.path.join(out, f))
            parts.append(t.append_column(
                "__epoch", pa.array([int(m.group(1))] * t.num_rows,
                                    type=pa.int64())))
        log = pa.concat_tables(parts, promote_options="permissive")
        log = log.take(pc.sort_indices(log, sort_keys=[
            ("user_id", "ascending"), ("__epoch", "ascending")]))
        uid = log.column("user_id").to_numpy(zero_copy_only=False)
        import numpy as np
        last = np.ones(len(uid), dtype=bool)
        last[:-1] = uid[:-1] != uid[1:]
        return _round_cols(
            log.filter(pa.array(last)).drop_columns(["__epoch"]), {"sv": 4})
    finally:
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(fdir, ignore_errors=True)


REGISTRY["streaming_emit_changes"] = RawQ(
    _streaming_emit_changes,
    "SELECT user_id, count(event_id) AS cnt, ROUND(sum(value), 4) AS sv "
    "FROM events GROUP BY 1",
)


def _streaming_emit_changes_windowed(sf_dir: str) -> pa.Table:
    """Windowed EMIT CHANGES: the changelog's last row per
    (key, window_start) must equal the bounded per-window aggregate."""
    import os as _os
    import re
    import shutil
    import tempfile

    import numpy as np
    import pyarrow.parquet as pq

    from ..streaming.driver import StreamingJob

    cat = testdata_catalog(sf_dir)
    tbl = pq.read_table(f"{sf_dir}/events.parquet")
    tbl = tbl.take(pc.sort_indices(
        tbl, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]))
    n = tbl.num_rows
    batches = [tbl.slice(i * n // 8, (i + 1) * n // 8 - i * n // 8)
               for i in range(8)]
    out = tempfile.mkdtemp(prefix="ksql_ray_stream_changes_w_")
    try:
        q = (Select(F("user_id"), Count(F("event_id")).As("cnt"))
             .From(Schema("events")).GroupBy(F("user_id"))
             .Windowed(Tumbling(1, HOURS))
             .EmitChanges())
        job = StreamingJob(q, cat, out, num_partitions=4,
                           lateness_us=1 << 60)
        for b in batches:
            job.process_epoch([b])
        job.finish()
        parts = []
        for f in sorted(_os.listdir(out)):
            m = re.match(r"part-\d+-epoch-(\d+)\.parquet$", f)
            if not m:
                continue
            t = pq.read_table(_os.path.join(out, f))
            parts.append(t.append_column(
                "__epoch", pa.array([int(m.group(1))] * t.num_rows,
                                    type=pa.int64())))
        log = pa.concat_tables(parts, promote_options="permissive")
        log = log.take(pc.sort_indices(log, sort_keys=[
            ("user_id", "ascending"), ("window_start", "ascending"),
            ("__epoch", "ascending")]))
        uid = log.column("user_id").to_numpy(zero_copy_only=False)
        ws = pc.cast(log.column("window_start"),
                     pa.int64()).to_numpy(zero_copy_only=False)
        last = np.ones(len(uid), dtype=bool)
        last[:-1] = (uid[:-1] != uid[1:]) | (ws[:-1] != ws[1:])
        return log.filter(pa.array(last)).drop_columns(["__epoch"])
    finally:
        shutil.rmtree(out, ignore_errors=True)


REGISTRY["streaming_emit_changes_windowed"] = RawQ(
    _streaming_emit_changes_windowed,
    f"SELECT make_timestamp((epoch_us(ts) // {HOUR_US}) * {HOUR_US}) AS window_start, "
    f"make_timestamp((epoch_us(ts) // {HOUR_US}) * {HOUR_US} + {HOUR_US}) AS window_end, "
    "user_id, count(event_id) AS cnt FROM events GROUP BY 1, 2, 3",
)


def _streaming_project_text(sf_dir: str) -> pa.Table:
    """Stateless push-query filter/project replayed as micro-batches:
    the input_hint's per-row invariant — per-turn TEXT equality under a
    stable row key — gated over the `events` stream's `props` payload
    column (each emitted row's text must be byte-equal to the source
    row's, keyed by event_id)."""
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from ..streaming.driver import StreamingProjectJob

    cat = testdata_catalog(sf_dir)
    tbl = pq.read_table(f"{sf_dir}/events.parquet")
    tbl = tbl.take(pc.sort_indices(
        tbl, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]))
    n = tbl.num_rows
    batches = [tbl.slice(i * n // 8, (i + 1) * n // 8 - i * n // 8)
               for i in range(8)]
    out = tempfile.mkdtemp(prefix="ksql_ray_stream_projtext_")
    try:
        q = (Select(F("event_id"), F("user_id"), F("props"))
             .From(Schema("events"))
             .Where(F("event_type").Equal("click"))
             .EmitChanges())
        job = StreamingProjectJob(q, cat, out)
        for b in batches:
            job.process_epoch([b])
        job.finish()
        return job.result()
    finally:
        shutil.rmtree(out, ignore_errors=True)


REGISTRY["streaming_project_text"] = RawQ(
    _streaming_project_text,
    "SELECT event_id, user_id, props FROM events WHERE event_type = 'click'",
)


def _streaming_dedup(sf_dir: str) -> pa.Table:
    """Dedup-on-ingest: the documents table + a replayed copy of every
    7th doc (planted exact dups, arriving AFTER the originals) streamed
    as 8 micro-batch files; first occurrence per normalized-text md5
    survives. Oracle = the same corpus via ROW_NUMBER."""
    import os
    import shutil
    import tempfile

    import pyarrow.compute as pc
    import pyarrow.parquet as pq

    from ..streaming.dedup import StreamingDedupJob

    docs = pq.read_table(f"{sf_dir}/documents.parquet")
    ids = docs.column("doc_id")
    dups = docs.filter(pc.equal(
        pc.subtract(ids, pc.multiply(pc.divide(ids, 7), 7)), 0))
    dups = dups.set_column(dups.schema.get_field_index("doc_id"), "doc_id",
                           pc.add(dups.column("doc_id"), 1_000_000))
    corpus = pa.concat_tables([docs, dups])
    n = corpus.num_rows
    fdir = tempfile.mkdtemp(prefix="ksql_ray_sdedup_in_")
    out = tempfile.mkdtemp(prefix="ksql_ray_sdedup_out_")
    try:
        files = []
        for i in range(8):
            s = corpus.slice(i * n // 8, (i + 1) * n // 8 - i * n // 8)
            p = os.path.join(fdir, f"b{i:02d}.parquet")
            pq.write_table(s, p)
            files.append(p)
        job = StreamingDedupJob(out, method="md5", num_partitions=4)
        job.run(files, files_per_epoch=2)
        job.finish()
        return job.result()
    finally:
        shutil.rmtree(fdir, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


_HLL_SQL = r"""
WITH h AS (
  SELECT ('0x' || substr(md5(coalesce(user_id::VARCHAR, '')), 1, 16))::UBIGINT
         AS h
  FROM events
), rw AS (
  SELECT (h >> 56)::BIGINT AS register,
         h & ((1::UBIGINT << 56) - 1) AS w
  FROM h
), rr AS (
  SELECT register,
         CASE WHEN w = 0 THEN 57
              ELSE strpos(lpad(bin(w), 56, '0'), '1') END AS rho
  FROM rw)
SELECT register, max(rho)::BIGINT AS rho FROM rr GROUP BY 1 ORDER BY 1"""


def _op_hll_distinct(sf_dir: str) -> pa.Table:
    from ..ops.hll import hll_registers

    ds = _read_clean(f"{sf_dir}/events.parquet")
    return _collect(hll_registers(ds, "user_id", p=8))


REGISTRY["op_hll_distinct"] = RawQ(
    _op_hll_distinct,
    # full register-STATE check, not just the scalar estimate — the md5
    # hash makes register id and leading-zero count SQL-expressible
    # (ops/hll.py docstring spells out the contract)
    _HLL_SQL,
)


def _streaming_hll(sf_dir: str) -> pa.Table:
    """Distinct-count on ingest: the events table replayed as 8
    micro-batch files through StreamingHLLJob; the merged register
    state must equal the bounded op's (merge = max is order- and
    replay-insensitive)."""
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from ..streaming.cardinality import StreamingHLLJob

    tbl = pq.read_table(f"{sf_dir}/events.parquet")
    tbl = tbl.take(pc.sort_indices(
        tbl, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]))
    n = tbl.num_rows
    fdir = tempfile.mkdtemp(prefix="ksql_ray_shll_in_")
    try:
        files = []
        for i in range(8):
            s = tbl.slice(i * n // 8, (i + 1) * n // 8 - i * n // 8)
            p = os.path.join(fdir, f"b{i:02d}.parquet")
            pq.write_table(s, p)
            files.append(p)
        job = StreamingHLLJob(key_col="user_id", p=8, hash="md5",
                              columns=["user_id"], num_partitions=4)
        job.run(files, files_per_epoch=2)
        m = job.finish()
        assert m["rows_in"] == n, m
        return job.registers()
    finally:
        shutil.rmtree(fdir, ignore_errors=True)


REGISTRY["streaming_hll"] = RawQ(_streaming_hll, _HLL_SQL)


_GROUPED_HLL_SQL = r"""
WITH h AS (
  SELECT user_id,
         ('0x' || substr(md5(coalesce(event_id::VARCHAR, '')), 1, 16))::UBIGINT
         AS h
  FROM events
), rw AS (
  SELECT user_id, (h >> 56)::BIGINT AS register,
         h & ((1::UBIGINT << 56) - 1) AS w
  FROM h
), rr AS (
  SELECT user_id, register,
         CASE WHEN w = 0 THEN 57
              ELSE strpos(lpad(bin(w), 56, '0'), '1') END AS rho
  FROM rw)
SELECT user_id, register, max(rho)::BIGINT AS rho FROM rr GROUP BY 1, 2"""


def _streaming_grouped_hll(sf_dir: str) -> pa.Table:
    """PER-KEY distinct-count on ingest (distinct event_ids per user):
    events replayed as 8 micro-batch files through
    StreamingGroupedHLLJob; the merged per-key register state must
    equal the bounded grouped op's (max-merge is order- and
    replay-insensitive) and the same per-key md5 SQL oracle."""
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from ..streaming.cardinality import StreamingGroupedHLLJob

    tbl = pq.read_table(f"{sf_dir}/events.parquet")
    tbl = tbl.take(pc.sort_indices(
        tbl, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]))
    n = tbl.num_rows
    fdir = tempfile.mkdtemp(prefix="ksql_ray_sghll_in_")
    try:
        files = []
        for i in range(8):
            s = tbl.slice(i * n // 8, (i + 1) * n // 8 - i * n // 8)
            p = os.path.join(fdir, f"b{i:02d}.parquet")
            pq.write_table(s, p)
            files.append(p)
        job = StreamingGroupedHLLJob(
            key_col="user_id", val_col="event_id", p=8, hash="md5",
            columns=["user_id", "event_id"], num_partitions=4)
        job.run(files, files_per_epoch=2)
        m = job.finish()
        assert m["rows_in"] == n, m
        return job.registers()
    finally:
        shutil.rmtree(fdir, ignore_errors=True)


REGISTRY["streaming_grouped_hll"] = RawQ(
    _streaming_grouped_hll,
    _GROUPED_HLL_SQL,
)


def _op_normalize_text(sf_dir: str) -> pa.Table:
    """Unicode canonicalization over documents with a doc-derived
    accent suffix (the fixture is ASCII; the suffix makes NFC, case
    folding and whitespace collapse all non-vacuous — combining-mark
    'A'+U+0301 must compose then lowercase to the precomposed
    'a'+acute)."""
    from ..ops.text import normalize_documents

    ds = _read_clean(f"{sf_dir}/documents.parquet").select_columns(
        ["doc_id", "text"])

    def plant(batch: pa.Table) -> pa.Table:
        suffix = pc.binary_join_element_wise(
            pa.array(["  X"] * batch.num_rows, type=pa.string()),
            # decomposed A+acute; typed so a zero-row batch stays a
            # string array (untyped empty literal -> null-typed crash)
            pa.array(["A\u0301"] * batch.num_rows, type=pa.string()),
            pc.cast(batch.column("doc_id"), pa.string()), "  ")
        return pa.table({
            "doc_id": batch.column("doc_id"),
            "text": pc.binary_join_element_wise(
                pc.cast(batch.column("text"), pa.string()), suffix, " "),
        })

    planted = ds.map_batches(plant, batch_format="pyarrow",
                             zero_copy_batch=True)
    return _collect(normalize_documents(planted))


REGISTRY["op_normalize_text"] = RawQ(
    _op_normalize_text,
    # ops/text.py normalize_documents: NFC -> lower -> collapse \s+ ->
    # trim, plus the changed flag and normalized length
    r"""
WITH planted AS (
  SELECT doc_id,
         text || ' ' || '  X' || '  ' || 'A' || chr(769) || '  ' ||
         doc_id::VARCHAR AS text
  FROM documents
), n AS (
  SELECT doc_id, text,
         trim(regexp_replace(lower(nfc_normalize(text)), '\s+', ' ',
                             'g')) AS norm_text
  FROM planted)
SELECT doc_id, norm_text, length(norm_text)::BIGINT AS norm_chars,
       norm_text != text AS changed
FROM n""",
)


def _op_pca_covariance(sf_dir: str) -> pa.Table:
    from ..ops.pca import embedding_covariance

    ds = _read_clean(f"{sf_dir}/embeddings.parquet")
    return _round_cols(embedding_covariance(ds, dim=64), {"cov": 4})


REGISTRY["op_pca_covariance"] = RawQ(
    _op_pca_covariance,
    # the PCA moments pass's oracle-checkable artifact (ops/pca.py):
    # population covariance of the 64-d embedding column, one row per
    # (i, j) cell; eigendecomposition/projection are pinned by pytest
    r"""
WITH ij AS (
  SELECT i.range AS i, j.range AS j FROM range(64) i, range(64) j
), s AS (
  SELECT ij.i, ij.j,
         sum(e.embedding[ij.i + 1]::DOUBLE * e.embedding[ij.j + 1]::DOUBLE)
           / count(*)
         - avg(e.embedding[ij.i + 1]::DOUBLE)
           * avg(e.embedding[ij.j + 1]::DOUBLE) AS cov
  FROM embeddings e, ij GROUP BY 1, 2)
SELECT i, j, ROUND(cov, 4) AS cov FROM s""",
)


def _op_top_per_key(sf_dir: str) -> pa.Table:
    from ..ops.rows import top_n_per_key

    ds = _read_clean(f"{sf_dir}/events.parquet").select_columns(
        ["user_id", "event_id", "value"])
    t = _collect(top_n_per_key(ds, ["user_id"], "value", n=3,
                               descending=True, tiebreak="event_id"))
    return t.select(["user_id", "event_id", "value", "rank"])


REGISTRY["op_top_per_key"] = RawQ(
    _op_top_per_key,
    "SELECT user_id, event_id, value, rn - 1 AS rank FROM ("
    "  SELECT user_id, event_id, value,"
    "         ROW_NUMBER() OVER (PARTITION BY user_id"
    "                            ORDER BY value DESC, event_id) AS rn"
    "  FROM events) WHERE rn <= 3",
)


def _op_with_lag(sf_dir: str) -> pa.Table:
    from ..ops.rows import with_lag

    ds = _read_clean(f"{sf_dir}/events.parquet").select_columns(
        ["user_id", "event_id", "ts", "value"])
    t = _collect(with_lag(ds, ["user_id"], "ts", ["value", "ts"],
                          tiebreak="event_id"))
    t = t.select(["user_id", "event_id", "value_prev", "ts_prev"])
    return _round_cols(t, {"value_prev": 4})


REGISTRY["op_with_lag"] = RawQ(
    _op_with_lag,
    "SELECT user_id, event_id,"
    "  ROUND(LAG(value) OVER w, 4) AS value_prev,"
    "  LAG(ts) OVER w AS ts_prev "
    "FROM events "
    "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)",
)


def _op_sessionize(sf_dir: str) -> pa.Table:
    from ..ops.rows import sessionize

    ds = _read_clean(f"{sf_dir}/events.parquet").select_columns(
        ["user_id", "event_id", "ts"])
    t = _collect(sessionize(ds, ["user_id"], "ts",
                            gap_us=30 * 60 * 1_000_000,
                            tiebreak="event_id"))
    return t.select(["user_id", "event_id", "session_id"])


REGISTRY["op_sessionize"] = RawQ(
    _op_sessionize,
    # gaps-and-islands: a >30min gap to the previous same-key row opens
    # a new session; session_id = per-key 0-based ordinal
    "SELECT user_id, event_id,"
    "  SUM(CASE WHEN prev_ts IS NULL"
    "            OR ts - prev_ts > INTERVAL 30 MINUTE"
    "       THEN 1 ELSE 0 END)"
    "    OVER (PARTITION BY user_id ORDER BY ts, event_id)::BIGINT - 1"
    "    AS session_id "
    "FROM (SELECT user_id, event_id, ts,"
    "             lag(ts) OVER (PARTITION BY user_id"
    "                           ORDER BY ts, event_id) AS prev_ts"
    "      FROM events)",
)


def _op_moving_agg(sf_dir: str) -> pa.Table:
    from ..ops.rows import moving_agg

    ds = _read_clean(f"{sf_dir}/events.parquet").select_columns(
        ["user_id", "event_id", "ts", "value"])
    t = _collect(moving_agg(ds, ["user_id"], "ts", "value",
                            window_rows=7, tiebreak="event_id"))
    t = t.select(["user_id", "event_id",
                  "value_rsum", "value_ravg", "value_rcnt"])
    return _round_cols(t, {"value_rsum": 4, "value_ravg": 4})


REGISTRY["op_moving_agg"] = RawQ(
    _op_moving_agg,
    # rolling per-key row window (ops/rows.py moving_agg). window_rows=7
    # deliberately: 2-decimal inputs averaged over 1..7 rows can never
    # land exactly on a 4th-decimal rounding tie (100N/d is half-integer
    # only for even d >= 8), so both sides round identically despite
    # ulp-different sums — an even window flips ~24% of rows on ties
    "SELECT user_id, event_id,"
    "  ROUND(SUM(value) OVER w, 4) AS value_rsum,"
    "  ROUND(AVG(value) OVER w, 4) AS value_ravg,"
    "  COUNT(value) OVER w AS value_rcnt "
    "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id"
    "  ROWS BETWEEN 6 PRECEDING AND CURRENT ROW)",
)


def _op_with_lead(sf_dir: str) -> pa.Table:
    from ..ops.rows import with_lead

    ds = _read_clean(f"{sf_dir}/events.parquet").select_columns(
        ["user_id", "event_id", "ts", "value", "event_type"])
    t = _collect(with_lead(ds, ["user_id"], "ts",
                           ["value", "event_type"],
                           tiebreak="event_id"))
    t = t.select(["user_id", "event_id", "value_next",
                  "event_type_next"])
    return _round_cols(t, {"value_next": 4})


REGISTRY["op_with_lead"] = RawQ(
    _op_with_lead,
    # next-event attributes per user (ops/rows.py with_lead) — the
    # prompt→response pairing primitive for turn streams
    "SELECT user_id, event_id,"
    "  ROUND(LEAD(value) OVER w, 4) AS value_next,"
    "  LEAD(event_type) OVER w AS event_type_next "
    "FROM events "
    "WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)",
)


def _op_rank_per_key(sf_dir: str) -> pa.Table:
    from ..ops.rows import rank_per_key

    ds = _read_clean(f"{sf_dir}/events.parquet").select_columns(
        ["user_id", "event_id", "event_type"])
    t = _collect(rank_per_key(ds, ["user_id"], "event_type",
                              tiebreak="event_id"))
    return t.select(["user_id", "event_id", "row_number", "rank",
                     "dense_rank"])


REGISTRY["op_rank_per_key"] = RawQ(
    _op_rank_per_key,
    # SQL rank family per key (ops/rows.py rank_per_key). event_type's
    # small alphabet guarantees real ties, so RANK/DENSE_RANK diverge
    # from ROW_NUMBER; the event_id tiebreak makes row_number total
    "SELECT user_id, event_id,"
    "  ROW_NUMBER() OVER (PARTITION BY user_id"
    "    ORDER BY event_type, event_id) AS row_number,"
    "  RANK() OVER (PARTITION BY user_id"
    "    ORDER BY event_type) AS rank,"
    "  DENSE_RANK() OVER (PARTITION BY user_id"
    "    ORDER BY event_type) AS dense_rank "
    "FROM events",
)


def _op_rank_dist(sf_dir: str) -> pa.Table:
    from ..ops.rows import rank_dist_per_key

    ds = _read_clean(f"{sf_dir}/events.parquet").select_columns(
        ["user_id", "event_id", "event_type"])
    t = _collect(rank_dist_per_key(ds, ["user_id"], "event_type",
                                   n_tiles=4, tiebreak="event_id"))
    return t.select(["user_id", "event_id", "percent_rank",
                     "cume_dist", "tile"])


REGISTRY["op_rank_dist"] = RawQ(
    _op_rank_dist,
    # SQL distribution-window family (ops/rows.py rank_dist_per_key):
    # PERCENT_RANK/CUME_DIST over the tie-producing event_type order,
    # NTILE(4) over the event_id-totalized order. The rationals
    # (rank-1)/(cnt-1) divide the same integers on both sides — exact
    "SELECT user_id, event_id,"
    "  percent_rank() OVER wt AS percent_rank,"
    "  cume_dist() OVER wt AS cume_dist,"
    "  ntile(4) OVER wn AS tile "
    "FROM events WINDOW"
    "  wt AS (PARTITION BY user_id ORDER BY event_type),"
    "  wn AS (PARTITION BY user_id ORDER BY event_type, event_id)",
)


def _op_first_last(sf_dir: str) -> pa.Table:
    from ..ops.rows import first_last_per_key

    ds = _read_clean(f"{sf_dir}/events.parquet").select_columns(
        ["user_id", "event_id", "ts", "value", "event_type"])
    t = _collect(first_last_per_key(ds, ["user_id"], "ts",
                                    ["value", "event_type"], nth=3,
                                    tiebreak="event_id"))
    return t.select(["user_id", "event_id", "value_first", "value_last",
                     "value_nth", "event_type_first", "event_type_last",
                     "event_type_nth"])


REGISTRY["op_first_last"] = RawQ(
    _op_first_last,
    # FIRST/LAST/NTH_VALUE per key over the full partition frame
    # (ops/rows.py first_last_per_key): every turn against its
    # conversation's opening/closing/3rd event. Values are copies of
    # inputs — exact, no rounding needed
    "SELECT user_id, event_id,"
    "  first_value(value) OVER w AS value_first,"
    "  last_value(value) OVER w AS value_last,"
    "  nth_value(value, 3) OVER w AS value_nth,"
    "  first_value(event_type) OVER w AS event_type_first,"
    "  last_value(event_type) OVER w AS event_type_last,"
    "  nth_value(event_type, 3) OVER w AS event_type_nth "
    "FROM events WINDOW w AS (PARTITION BY user_id"
    "  ORDER BY ts, event_id"
    "  ROWS BETWEEN UNBOUNDED PRECEDING AND UNBOUNDED FOLLOWING)",
)


def _op_time_range_agg(sf_dir: str) -> pa.Table:
    from ..ops.rows import time_range_agg

    ds = _read_clean(f"{sf_dir}/events.parquet").select_columns(
        ["user_id", "event_id", "ts", "value"])
    t = _collect(time_range_agg(ds, ["user_id"], "ts", "value",
                                range_us=3_600_000_000))
    t = t.select(["user_id", "event_id", "value_tsum", "value_tcnt"])
    return _round_cols(t, {"value_tsum": 4})


REGISTRY["op_time_range_agg"] = RawQ(
    _op_time_range_agg,
    # event-time RANGE frame (ops/rows.py time_range_agg): trailing
    # 1-hour window per user; RANGE includes all current-ts peers so
    # no tiebreak exists on either side. Sum of 2-dp inputs has zeros
    # past the 2nd decimal -> 4-dp ROUND can't tie; avg's round-ties
    # are not excludable (cnt varies), so it is pytest-pinned instead
    # (same rule as op_cumulative_agg)
    "SELECT user_id, event_id,"
    "  ROUND(SUM(value) OVER w, 4) AS value_tsum,"
    "  COUNT(value) OVER w AS value_tcnt "
    "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts"
    "  RANGE BETWEEN INTERVAL 3600 SECONDS PRECEDING AND CURRENT ROW)",
)


def _op_time_range_distinct(sf_dir: str) -> pa.Table:
    from ..ops.rows import time_range_distinct

    ds = _read_clean(f"{sf_dir}/events.parquet").select_columns(
        ["user_id", "event_id", "ts", "event_type"])
    t = _collect(time_range_distinct(ds, ["user_id"], "ts",
                                     "event_type",
                                     range_us=24 * 3_600_000_000))
    return t.select(["user_id", "event_id", "event_type_tdistinct"])


REGISTRY["op_time_range_distinct"] = RawQ(
    _op_time_range_distinct,
    # sliding event-time DISTINCT count (ops/rows.py
    # time_range_distinct): trailing 24 h per user. Exact — duplicates
    # per frame counted via the prev-occurrence difference array, so
    # the gate is a plain windowed DISTINCT aggregate
    "SELECT user_id, event_id,"
    "  COUNT(DISTINCT event_type) OVER (PARTITION BY user_id"
    "    ORDER BY ts RANGE BETWEEN INTERVAL 24 HOURS PRECEDING"
    "    AND CURRENT ROW) AS event_type_tdistinct "
    "FROM events",
)


def _op_interval_merge(sf_dir: str) -> pa.Table:
    import numpy as np

    from ..ops.intervals import merge_intervals

    ds = _read_clean(f"{sf_dir}/events.parquet").select_columns(
        ["user_id", "event_id", "ts", "value"])

    # derive an end timestamp: value (2-dp, >= 0) x 1800 s. 2-dp x
    # 1800 is an exact integer +/- ~1e-11 float noise, never at a
    # rounding tie, so np.rint == SQL ROUND here
    def add_end(b: pa.Table) -> pa.Table:
        tsv = b.column("ts").cast(pa.int64()).to_numpy()
        dur = np.rint(b.column("value").to_numpy(zero_copy_only=False)
                      * 1800.0).astype(np.int64)
        end = pa.array(tsv + dur * 1_000_000,
                       type=pa.int64()).cast(pa.timestamp("us"))
        return b.append_column("ts_end", end)

    iv = ds.map_batches(add_end, batch_format="pyarrow")
    t = _collect(merge_intervals(iv, ["user_id"], "ts", "ts_end"))
    return t.select(["user_id", "span_start", "span_end", "n_rows"])


REGISTRY["op_interval_merge"] = RawQ(
    _op_interval_merge,
    # interval coalescing (ops/intervals.py merge_intervals): SQL
    # gaps-and-islands over the same derived [ts, ts + value*1800 s]
    # intervals; islands open where start > running MAX(end)
    "WITH iv AS ("
    "  SELECT user_id, event_id, ts AS s,"
    "    ts + INTERVAL 1 SECOND * CAST(ROUND(value * 1800) AS BIGINT)"
    "      AS e"
    "  FROM events"
    "), o AS ("
    "  SELECT user_id, event_id, s, e,"
    "    MAX(e) OVER (PARTITION BY user_id ORDER BY s, e, event_id"
    "      ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING) AS pm"
    "  FROM iv"
    "), isl AS ("
    "  SELECT user_id, s, e,"
    "    SUM(CASE WHEN pm IS NULL OR s > pm THEN 1 ELSE 0 END)"
    "      OVER (PARTITION BY user_id ORDER BY s, e, event_id) AS grp"
    "  FROM o"
    ") SELECT user_id, MIN(s) AS span_start, MAX(e) AS span_end,"
    "    COUNT(*) AS n_rows "
    "FROM isl GROUP BY user_id, grp",
)


def _op_gap_fill(sf_dir: str) -> pa.Table:
    from ..ops.intervals import gap_fill

    ds = _read_clean(f"{sf_dir}/events.parquet").select_columns(
        ["user_id", "event_id", "ts", "value", "event_type"])
    t = _collect(gap_fill(ds, ["user_id"], "ts",
                          ["value", "event_type"],
                          step_us=6 * 3_600_000_000,
                          tiebreak="event_id"))
    return t.select(["user_id", "ts", "value", "event_type"])


REGISTRY["op_gap_fill"] = RawQ(
    _op_gap_fill,
    # time-grid forward-fill resample (ops/intervals.py gap_fill):
    # 6-hour grid from each user's MIN(ts) to MAX(ts), value columns
    # from the last event at-or-before the grid point (ties by
    # greatest event_id)
    "WITH b AS (SELECT user_id, MIN(ts) lo, MAX(ts) hi FROM events"
    "  GROUP BY user_id),"
    " g AS (SELECT user_id,"
    "   UNNEST(generate_series(lo, hi, INTERVAL 6 HOURS)) AS ts"
    "   FROM b)"
    " SELECT g.user_id, g.ts,"
    "  (SELECT e.value FROM events e WHERE e.user_id = g.user_id"
    "     AND e.ts <= g.ts ORDER BY e.ts DESC, e.event_id DESC"
    "     LIMIT 1) AS value,"
    "  (SELECT e.event_type FROM events e WHERE e.user_id = g.user_id"
    "     AND e.ts <= g.ts ORDER BY e.ts DESC, e.event_id DESC"
    "     LIMIT 1) AS event_type "
    "FROM g",
)


def _op_fuzzy_pairs(sf_dir: str) -> pa.Table:
    from ..ops.fuzzy import fuzzy_pairs

    ds = _read_clean(f"{sf_dir}/documents.parquet").select_columns(
        ["doc_id", "text"])

    # plant typo variants: first token of each doc, mutated by doc_id
    # residue (append 'q' / drop last char / overwrite first with 'z')
    # — identical derivation in the SQL below
    def derive(b: pa.Table) -> pa.Table:
        tok = pc.struct_field(pc.extract_regex(
            pc.utf8_trim_whitespace(pc.utf8_lower(
                pc.cast(b.column("text"), pa.string()))),
            r"^(?P<t>\S+)"), "t")
        r = pc.cast(pc.subtract(
            b.column("doc_id"),
            pc.multiply(pc.divide(b.column("doc_id"), 4),
                        pa.scalar(4, pa.int64()))), pa.int64())
        drop_last = pc.utf8_reverse(pc.utf8_slice_codeunits(
            pc.utf8_reverse(tok), 1, 2 ** 30))
        s = pc.if_else(
            pc.equal(r, 0), pc.binary_join_element_wise(tok, "q", ""),
            pc.if_else(
                pc.equal(r, 1), drop_last,
                pc.if_else(
                    pc.equal(r, 2), pc.binary_join_element_wise(
                        "z", pc.utf8_slice_codeunits(tok, 1, 2 ** 30),
                        ""),
                    tok)))
        return pa.table({"s": s})

    t = _collect(fuzzy_pairs(ds.map_batches(derive,
                                            batch_format="pyarrow"),
                             "s", min_len=2, max_len=12,
                             max_full_pairwise=4096))
    return t.select(["tok_a", "tok_b"])


REGISTRY["op_fuzzy_pairs"] = RawQ(
    _op_fuzzy_pairs,
    # SymSpell deletion-neighborhood fuzzy pairs (ops/fuzzy.py):
    # candidate generation is exact-complete for Levenshtein <= 1 and
    # every candidate is verified, so the oracle is the brute
    # all-pairs levenshtein over the same planted distinct values
    # (cap raised past the fixture's bucket sizes; capped jumbo
    # buckets are an opt-in recall trade counted to op-stats)
    "WITH base AS ("
    "  SELECT doc_id, regexp_extract(trim(lower(text)), '^(\\S+)', 1)"
    "    AS tok FROM documents"
    "), m AS ("
    "  SELECT CASE"
    "    WHEN doc_id % 4 = 0 THEN tok || 'q'"
    "    WHEN doc_id % 4 = 1 THEN substr(tok, 1, length(tok) - 1)"
    "    WHEN doc_id % 4 = 2 THEN 'z' || substr(tok, 2)"
    "    ELSE tok END AS s"
    "  FROM base"
    "), d AS (SELECT DISTINCT s FROM m"
    "   WHERE length(s) BETWEEN 2 AND 12) "
    "SELECT a.s AS tok_a, b.s AS tok_b "
    "FROM d a JOIN d b ON a.s < b.s"
    "  AND abs(length(a.s) - length(b.s)) <= 1 "
    "WHERE levenshtein(a.s, b.s) <= 1",
)


def _op_char_entropy(sf_dir: str) -> pa.Table:
    from ..ops.quality import add_char_entropy

    ds = _read_clean(f"{sf_dir}/documents.parquet").select_columns(
        ["doc_id", "text"])
    out = ds.map_batches(add_char_entropy, batch_format="pyarrow",
                         zero_copy_batch=True)
    return _collect(out).select(["doc_id", "char_entropy"])


REGISTRY["op_char_entropy"] = RawQ(
    _op_char_entropy,
    # per-doc codepoint Shannon entropy (ops/quality.py
    # add_char_entropy): summands are irrational logs, so 6-dp ROUND
    # is tie-safe; ABS on both sides normalizes the -0.0 a one-char
    # doc produces
    "WITH chars AS (SELECT doc_id, unnest(regexp_split_to_array("
    "    text, '')) AS ch FROM documents"
    "  WHERE text IS NOT NULL AND text <> ''), "
    "cc AS (SELECT doc_id, ch, count(*)::DOUBLE AS c "
    "  FROM chars GROUP BY 1, 2), "
    "tot AS (SELECT doc_id, sum(c) AS n FROM cc GROUP BY 1), "
    "h AS (SELECT cc.doc_id, -SUM((c / n) * log2(c / n)) AS ent "
    "  FROM cc JOIN tot USING (doc_id) GROUP BY 1) "
    "SELECT d.doc_id, ROUND(ABS(COALESCE(h.ent, 0.0)), 6)"
    "  AS char_entropy "
    "FROM documents d LEFT JOIN h USING (doc_id) "
    "WHERE d.text IS NOT NULL",
)


def _op_tfidf(sf_dir: str) -> pa.Table:
    from ..ops.terms import tfidf_top_terms

    ds = _read_clean(f"{sf_dir}/documents.parquet").select_columns(
        ["doc_id", "text"])
    t = _collect(tfidf_top_terms(ds, "doc_id", "text", k=5))
    return _round_cols(t, {"tfidf": 6})


REGISTRY["op_tfidf"] = RawQ(
    _op_tfidf,
    # per-doc top-5 terms by tf·ln(N/df) (ops/terms.py
    # tfidf_top_terms): same tokenization contract as top_terms; N =
    # docs with >= 1 token; np.log and DuckDB ln agree bit-for-bit on
    # this host, so the DESC-tfidf rank order matches exactly
    "WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array("
    "    trim(lower(text)), '\\s+')) AS term FROM documents), "
    "tf AS (SELECT doc_id, term, count(*)::BIGINT AS tf "
    "  FROM toks GROUP BY 1, 2), "
    "df AS (SELECT term, count(DISTINCT doc_id)::DOUBLE AS df "
    "  FROM toks GROUP BY 1), "
    "n AS (SELECT count(DISTINCT doc_id)::DOUBLE AS n FROM toks), "
    "scored AS (SELECT tf.doc_id, tf.term,"
    "    tf.tf * ln((SELECT n FROM n) / df.df) AS tfidf,"
    "    ROW_NUMBER() OVER (PARTITION BY tf.doc_id"
    "      ORDER BY tf.tf * ln((SELECT n FROM n) / df.df) DESC,"
    "      tf.term) - 1 AS rank"
    "  FROM tf JOIN df USING (term)) "
    "SELECT doc_id, term, ROUND(tfidf, 6) AS tfidf, rank "
    "FROM scored WHERE rank < 5",
)


def _op_standardize(sf_dir: str) -> pa.Table:
    from ..ops.rows import standardize_per_key

    ds = _read_clean(f"{sf_dir}/events.parquet").select_columns(
        ["user_id", "event_id", "value"])
    t = _collect(standardize_per_key(ds, ["user_id"], "value"))
    t = t.select(["user_id", "event_id", "value_z", "value_minmax"])
    return _round_cols(t, {"value_z": 6, "value_minmax": 6})


REGISTRY["op_standardize"] = RawQ(
    _op_standardize,
    # per-key feature scaling (ops/rows.py standardize_per_key). The
    # z denominator is a square root (irrational -> 6-dp ROUND is
    # tie-safe, perf lesson 20); min/max are summation-free so minmax
    # is exact. NULLIF gives SQL's NULL on constant/single-row keys
    "SELECT user_id, event_id,"
    "  ROUND((value - AVG(value) OVER k)"
    "    / NULLIF(STDDEV_SAMP(value) OVER k, 0), 6) AS value_z,"
    "  ROUND((value - MIN(value) OVER k)"
    "    / NULLIF(MAX(value) OVER k - MIN(value) OVER k, 0), 6)"
    "    AS value_minmax "
    "FROM events WINDOW k AS (PARTITION BY user_id)",
)


def _op_transition_counts(sf_dir: str) -> pa.Table:
    from ..ops.rows import transition_counts

    ds = _read_clean(f"{sf_dir}/events.parquet").select_columns(
        ["user_id", "event_id", "ts", "event_type"])
    return _collect(transition_counts(ds, ["user_id"], "ts",
                                      "event_type",
                                      tiebreak="event_id"))


REGISTRY["op_transition_counts"] = RawQ(
    _op_transition_counts,
    # corpus transition matrix (ops/rows.py transition_counts): counts
    # of adjacent same-key label pairs — the role-transition profile of
    # a turn stream; shuffle payload bounded by |alphabet|^2 partials
    "WITH x AS (SELECT event_type AS from_label,"
    "  LEAD(event_type) OVER (PARTITION BY user_id"
    "    ORDER BY ts, event_id) AS to_label FROM events) "
    "SELECT from_label, to_label, count(*)::BIGINT AS cnt "
    "FROM x WHERE to_label IS NOT NULL GROUP BY 1, 2",
)


def _op_cumulative_agg(sf_dir: str) -> pa.Table:
    from ..ops.rows import moving_agg

    ds = _read_clean(f"{sf_dir}/events.parquet").select_columns(
        ["user_id", "event_id", "ts", "value"])
    t = _collect(moving_agg(ds, ["user_id"], "ts", "value",
                            window_rows=None, tiebreak="event_id"))
    t = t.select(["user_id", "event_id", "value_rsum", "value_rcnt"])
    return _round_cols(t, {"value_rsum": 4})


REGISTRY["op_cumulative_agg"] = RawQ(
    _op_cumulative_agg,
    # cumulative per-key running sum/count (moving_agg window_rows=None
    # = ROWS UNBOUNDED PRECEDING). Gate checks sum+count only: 2-decimal
    # inputs make the 4th-decimal sum round tie-free, but AVG divides by
    # an arbitrary count so its ties are not excludable (ravg is pinned
    # by test_moving_agg_cumulative instead)
    "SELECT user_id, event_id,"
    "  ROUND(SUM(value) OVER w, 4) AS value_rsum,"
    "  COUNT(value) OVER w AS value_rcnt "
    "FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id"
    "  ROWS BETWEEN UNBOUNDED PRECEDING AND CURRENT ROW)",
)


def _op_intersect(sf_dir: str) -> pa.Table:
    from ..ops.sets import intersect_distinct

    ev = _read_clean(f"{sf_dir}/events.parquet")
    left = ev.filter(expr="event_type == 'click' and value > 150.0")
    right = _read_clean(f"{sf_dir}/events.parquet").filter(
        expr="event_type == 'purchase' and value > 150.0")
    return _collect(intersect_distinct(left, right, ["user_id"]))


REGISTRY["op_intersect"] = RawQ(
    _op_intersect,
    # distributed INTERSECT (ops/sets.py): users with a big click AND a
    # big purchase (value filter keeps the result a PROPER subset — every
    # user has every event type unfiltered); tagged union, one key
    # shuffle, reduceat segment scan
    "SELECT DISTINCT user_id FROM events"
    " WHERE event_type = 'click' AND value > 150.0 "
    "INTERSECT "
    "SELECT DISTINCT user_id FROM events"
    " WHERE event_type = 'purchase' AND value > 150.0",
)


def _op_union(sf_dir: str) -> pa.Table:
    from ..ops.sets import union_distinct

    left = _read_clean(f"{sf_dir}/events.parquet").filter(
        expr="event_type == 'click' and value > 180.0")
    right = _read_clean(f"{sf_dir}/events.parquet").filter(
        expr="event_type == 'purchase' and value > 180.0")
    return _collect(union_distinct(left, right,
                                   ["user_id", "event_type"]))


REGISTRY["op_union"] = RawQ(
    _op_union,
    # distributed UNION DISTINCT (ops/sets.py union_distinct): same
    # tagged-union + one-key-shuffle shape as INTERSECT/EXCEPT; the
    # two-column key makes the distinct non-trivial on both sides
    "SELECT user_id, event_type FROM events"
    " WHERE event_type = 'click' AND value > 180.0 "
    "UNION "
    "SELECT user_id, event_type FROM events"
    " WHERE event_type = 'purchase' AND value > 180.0",
)


def _op_except(sf_dir: str) -> pa.Table:
    from ..ops.sets import except_distinct

    left = _read_clean(f"{sf_dir}/events.parquet").filter(
        expr="event_type == 'view' and value > 150.0")
    right = _read_clean(f"{sf_dir}/events.parquet").filter(
        expr="event_type == 'error' and value > 150.0")
    return _collect(except_distinct(left, right, ["user_id"]))


REGISTRY["op_except"] = RawQ(
    _op_except,
    # distributed EXCEPT: users with a big view but no big error
    "SELECT DISTINCT user_id FROM events"
    " WHERE event_type = 'view' AND value > 150.0 "
    "EXCEPT "
    "SELECT DISTINCT user_id FROM events"
    " WHERE event_type = 'error' AND value > 150.0",
)


def _op_semi_join(sf_dir: str) -> pa.Table:
    from ..ops.sets import semi_join_filter

    ev = _read_clean(f"{sf_dir}/events.parquet").select_columns(
        ["event_id", "user_id", "event_type"])
    big = _read_clean(f"{sf_dir}/orders.parquet").filter(
        expr="o_totalprice > 400000.0")
    return _collect(semi_join_filter(ev, big, "user_id", "o_custkey"))


REGISTRY["op_semi_join"] = RawQ(
    _op_semi_join,
    # broadcast semi-join (ops/sets.py): events whose user placed a
    # >400k order — distinct right keys reduced then broadcast once,
    # one is_in kernel per batch
    "SELECT event_id, user_id, event_type FROM events "
    "WHERE user_id IN (SELECT o_custkey FROM orders"
    "                  WHERE o_totalprice > 400000.0)",
)


def _op_anti_join(sf_dir: str) -> pa.Table:
    from ..ops.sets import semi_join_filter

    ev = _read_clean(f"{sf_dir}/events.parquet").select_columns(
        ["event_id", "user_id", "event_type"])
    big = _read_clean(f"{sf_dir}/orders.parquet").filter(
        expr="o_totalprice > 400000.0")
    return _collect(semi_join_filter(ev, big, "user_id", "o_custkey",
                                     anti=True))


REGISTRY["op_anti_join"] = RawQ(
    _op_anti_join,
    # broadcast anti-join: NOT-EXISTS semantics (null probes kept)
    "SELECT event_id, user_id, event_type FROM events e "
    "WHERE NOT EXISTS (SELECT 1 FROM orders o"
    "  WHERE o.o_custkey = e.user_id AND o.o_totalprice > 400000.0)",
)


def _op_histogram_bins(sf_dir: str) -> pa.Table:
    from ..ops.hist import numeric_histogram

    ds = _read_clean(f"{sf_dir}/events.parquet").select_columns(
        ["value"])
    t = _collect(numeric_histogram(ds, "value", bins=16))
    return _round_cols(t.select(["bin", "lo", "hi", "cnt"]),
                       {"lo": 4, "hi": 4})


REGISTRY["op_histogram_bins"] = RawQ(
    _op_histogram_bins,
    # equal-width bins (ops/hist.py): bin = LEAST(FLOOR((v-lo)/w), n-1)
    # is IEEE-identical on both sides (same two divisions + floor); the
    # lo/hi bin bounds round to 4dp for the hash
    "WITH m AS (SELECT min(value) AS mn, max(value) AS mx FROM events"
    "           WHERE value IS NOT NULL), "
    "b AS (SELECT LEAST(FLOOR((value - mn) / ((mx - mn) / 16)),"
    "             15)::BIGINT AS bin, count(*)::BIGINT AS cnt "
    "      FROM events, m WHERE value IS NOT NULL GROUP BY 1) "
    "SELECT bin,"
    "  ROUND(mn + bin * ((mx - mn) / 16), 4) AS lo,"
    "  ROUND(CASE WHEN bin = 15 THEN mx"
    "        ELSE mn + (bin + 1) * ((mx - mn) / 16) END, 4) AS hi,"
    "  cnt "
    "FROM b, m",
)


def _op_rollup(sf_dir: str) -> pa.Table:
    from ..ops.cube import rollup_agg

    ds = _read_clean(f"{sf_dir}/events.parquet").select_columns(
        ["event_type", "user_id", "value"])
    t = _collect(rollup_agg(ds, ["event_type", "user_id"], "value"))
    return _round_cols(t, {"sum_v": 4})


REGISTRY["op_rollup"] = RawQ(
    _op_rollup,
    # GROUP BY ROLLUP (ops/cube.py): every key-prefix level in one
    # scan; coarser levels re-aggregate the previous level's output
    "SELECT event_type, user_id,"
    "  ROUND(SUM(value), 4) AS sum_v,"
    "  COUNT(value) AS cnt_v "
    "FROM events GROUP BY ROLLUP(event_type, user_id)",
)


def _op_pivot(sf_dir: str) -> pa.Table:
    from ..ops.cube import pivot_agg

    ds = _read_clean(f"{sf_dir}/events.parquet").select_columns(
        ["user_id", "event_type", "value"])
    t = _collect(pivot_agg(ds, "user_id", "event_type",
                           ["click", "purchase", "error"], "value"))
    return _round_cols(t, {"click_sum": 4, "purchase_sum": 4,
                           "error_sum": 4})


REGISTRY["op_pivot"] = RawQ(
    _op_pivot,
    # crosstab (ops/cube.py pivot_agg): per-user wide sums, one column
    # per projected event type; SUM(CASE WHEN) NULL semantics via the
    # parallel count matrix. Keys with rows ONLY outside the projected
    # labels would be absent on the engine side, so the oracle filters
    # to the projected labels too (documented drop rule)
    "SELECT user_id,"
    "  ROUND(SUM(CASE WHEN event_type = 'click' THEN value END), 4)"
    "    AS click_sum,"
    "  COUNT(CASE WHEN event_type = 'click' THEN value END)"
    "    AS click_cnt,"
    "  ROUND(SUM(CASE WHEN event_type = 'purchase' THEN value END), 4)"
    "    AS purchase_sum,"
    "  COUNT(CASE WHEN event_type = 'purchase' THEN value END)"
    "    AS purchase_cnt,"
    "  ROUND(SUM(CASE WHEN event_type = 'error' THEN value END), 4)"
    "    AS error_sum,"
    "  COUNT(CASE WHEN event_type = 'error' THEN value END)"
    "    AS error_cnt "
    "FROM events"
    " WHERE event_type IN ('click', 'purchase', 'error')"
    " GROUP BY user_id",
)


def _op_bucketize(sf_dir: str) -> pa.Table:
    from ..ops.quantiles import quantile_bucketize

    ds = _read_clean(f"{sf_dir}/events.parquet").select_columns(
        ["event_id", "value"])
    # capacity above the fixture volume -> exact quantile_disc
    # boundaries (same oracle-gated configuration as op_quantiles)
    t = _collect(quantile_bucketize(ds, "value", qs=[0.25, 0.5, 0.75],
                                    capacity=1 << 18,
                                    require_exact=True))
    return t.select(["event_id", "bucket"])


REGISTRY["op_bucketize"] = RawQ(
    _op_bucketize,
    # quantile bucketize (ops/quantiles.py): bucket = #boundaries <=
    # value; require_exact pins rank error 0 at this capacity, making
    # the boundaries exactly quantile_disc
    "WITH q AS (SELECT quantile_disc(value, [0.25, 0.5, 0.75]) AS qs"
    "           FROM events) "
    "SELECT event_id,"
    "  CASE WHEN value IS NULL THEN NULL"
    "       ELSE len(list_filter(qs, x -> x <= value)) END::BIGINT"
    "    AS bucket "
    "FROM events, q",
)


def _op_assemble_convs(sf_dir: str) -> pa.Table:
    from ..ops.transcripts import assemble_conversations

    ds = _read_clean(f"{sf_dir}/events.parquet").select_columns(
        ["user_id", "ts", "event_id", "event_type", "props"])
    t = _collect(assemble_conversations(
        ds, ["user_id"], ["ts", "event_id"], text_col="props",
        role_col="event_type", sep="\n"))
    return t.select(["user_id", "doc", "n_turns", "n_chars"])


REGISTRY["op_assemble_convs"] = RawQ(
    _op_assemble_convs,
    # transcript assembly (ops/transcripts.py): each key's rows joined in
    # event order as 'role: text' lines — the turns->training-document op
    "SELECT user_id,"
    "  string_agg(coalesce(event_type, '') || ': ' || coalesce(props, ''),"
    "             chr(10) ORDER BY ts, event_id) AS doc,"
    "  count(*)::BIGINT AS n_turns,"
    "  length(string_agg(coalesce(event_type, '') || ': '"
    "                    || coalesce(props, ''),"
    "                    chr(10) ORDER BY ts, event_id))::BIGINT AS n_chars "
    "FROM events GROUP BY user_id",
)


def _op_chunk_split(sf_dir: str) -> pa.Table:
    from ..ops.transcripts import chunk_split

    ds = _read_clean(f"{sf_dir}/documents.parquet")
    return _collect(chunk_split(ds, width=32, stride=24))


REGISTRY["op_chunk_split"] = RawQ(
    _op_chunk_split,
    # context-window chunking (ops/transcripts.py chunk_split): chunks of
    # 32 whitespace tokens starting every 24 (overlapping); empty text
    # splits to [''] so every doc yields >= 1 chunk
    r"""
WITH t AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS toks
  FROM documents
), s AS (
  SELECT doc_id, toks,
         unnest(generate_series(0, len(toks) - 1, 24)) AS st FROM t)
SELECT doc_id, (st // 24)::BIGINT AS chunk_idx,
       least(32, len(toks) - st)::BIGINT AS n_tokens,
       array_to_string(toks[st + 1 : st + 32], ' ') AS chunk
FROM s""",
)


def _op_shuffle_shard(sf_dir: str) -> pa.Table:
    from ..ops.shard import shuffle_shard

    ds = _read_clean(f"{sf_dir}/documents.parquet").select_columns(
        ["doc_id"])
    t = _collect(shuffle_shard(ds, "doc_id", n_shards=16, method="md5"))
    return t.select(["doc_id", "shard", "pos"])


REGISTRY["op_shuffle_shard"] = RawQ(
    _op_shuffle_shard,
    # deterministic training-export shuffle (ops/shard.py docstring):
    # shard = md5-uint32(key) % 16, within-shard order = (hash, key)
    r"""
WITH h AS (
  SELECT doc_id,
         ('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT AS h
  FROM documents)
SELECT doc_id, (h % 16)::BIGINT AS shard,
       ROW_NUMBER() OVER (PARTITION BY h % 16 ORDER BY h, doc_id) - 1
         AS pos
FROM h""",
)


def _op_window_dedup(sf_dir: str) -> pa.Table:
    """Sliding-window substring dedup over the documents corpus plus a
    planted 3-token-shifted copy of every 11th doc — repeats at
    arbitrary (non-chunk) alignment, which is exactly what chunk_dedup
    cannot catch."""
    import ray.data

    from ..ops.spans import window_dedup

    docs = _read_clean(f"{sf_dir}/documents.parquet").select_columns(
        ["doc_id", "text"])

    def plant(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        cp = batch.filter(pc.equal(
            pc.subtract(ids, pc.multiply(pc.divide(ids, 11), 11)), 0))
        cp = pa.table({
            "doc_id": pc.add(cp.column("doc_id"), 1_000_000),
            "text": pc.binary_join_element_wise(
                # typed: zero-row planted batches (high-parallelism
                # small blocks) must not become null-typed literals
                pa.array(["pad padd paddd"] * cp.num_rows,
                         type=pa.string()),
                pc.cast(cp.column("text"), pa.string()), " "),
        })
        return pa.concat_tables(
            [pa.table({"doc_id": batch.column("doc_id"),
                       "text": pc.cast(batch.column("text"),
                                       pa.string())}), cp])

    corpus = docs.map_batches(plant, batch_format="pyarrow",
                              zero_copy_batch=True)
    return _collect(window_dedup(corpus, width=8))


REGISTRY["op_window_dedup"] = RawQ(
    _op_window_dedup,
    # every overlapping 8-token window; duplicate = same window text at
    # an earlier (doc_id, pos); covered tokens removed, text rebuilt
    # from survivors (ops/spans.py window_dedup docstring)
    r"""
WITH corpus AS (
  SELECT doc_id, text FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, 'pad padd paddd' || ' ' || text
         AS text
  FROM documents WHERE doc_id % 11 = 0
), toks AS (
  SELECT doc_id, regexp_split_to_array(trim(text), '\s+') AS t
  FROM corpus
), w AS (
  SELECT doc_id, i, array_to_string(t[i:i+7], ' ') AS win
  FROM toks, LATERAL (SELECT unnest(range(1, len(t) - 8 + 2)) AS i)
  WHERE len(t) >= 8
), dup AS (
  SELECT doc_id, i FROM (
    SELECT doc_id, i,
           ROW_NUMBER() OVER (PARTITION BY win ORDER BY doc_id, i) AS rn
    FROM w) WHERE rn > 1
), rem AS (
  SELECT DISTINCT doc_id, j
  FROM dup, LATERAL (SELECT unnest(range(i, i + 8)) AS j)
), pos AS (
  SELECT doc_id, unnest(t) AS tok, generate_subscripts(t, 1) AS j
  FROM toks
), kept AS (
  SELECT p.doc_id, string_agg(p.tok, ' ' ORDER BY p.j) AS clean_text,
         count(*) AS n_kept
  FROM pos p ANTI JOIN rem r ON p.doc_id = r.doc_id AND p.j = r.j
  GROUP BY 1)
SELECT tk.doc_id, len(tk.t) AS n_tokens,
       len(tk.t) - coalesce(k.n_kept, 0) AS removed_tokens,
       coalesce(k.clean_text, '') AS clean_text
FROM toks tk LEFT JOIN kept k USING (doc_id)""",
)


_QUANTILE_QS = [0.05, 0.25, 0.5, 0.75, 0.95, 0.99]
# DuckDB requires a CONSTANT quantile parameter: one branch per q
_QUANTILE_SQL = " UNION ALL ".join(
    f"SELECT {q}::DOUBLE AS q, quantile_disc(value, {q}) AS value "
    "FROM events"
    for q in _QUANTILE_QS) + " ORDER BY q"


def _op_quantiles(sf_dir: str) -> pa.Table:
    from ..ops.quantiles import dataset_quantiles

    ds = _read_clean(f"{sf_dir}/events.parquet")
    # capacity above the fixture volume -> zero collapses -> EXACT
    # (the sketch's oracle-gated configuration; the bound is asserted)
    t, err = dataset_quantiles(ds, "value", _QUANTILE_QS,
                               capacity=1 << 18)
    assert err == 0, err
    return t


REGISTRY["op_quantiles"] = RawQ(_op_quantiles, _QUANTILE_SQL)


def _streaming_quantiles(sf_dir: str) -> pa.Table:
    """Quantiles on ingest: the events table replayed as 8 micro-batch
    files through StreamingQuantilesJob at exact capacity; the merged
    sketch must reproduce SQL quantile_disc."""
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from ..streaming.quantiles import StreamingQuantilesJob

    tbl = pq.read_table(f"{sf_dir}/events.parquet")
    tbl = tbl.take(pc.sort_indices(
        tbl, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]))
    n = tbl.num_rows
    fdir = tempfile.mkdtemp(prefix="ksql_ray_squant_in_")
    try:
        files = []
        for i in range(8):
            s = tbl.slice(i * n // 8, (i + 1) * n // 8 - i * n // 8)
            p = os.path.join(fdir, f"b{i:02d}.parquet")
            pq.write_table(s, p)
            files.append(p)
        job = StreamingQuantilesJob(col="value", capacity=1 << 18,
                                    columns=["value"], num_partitions=4)
        job.run(files, files_per_epoch=2)
        m = job.finish()
        assert m["max_rank_error"] == 0 and m["rows_in"] == n, m
        return job.quantiles(_QUANTILE_QS)
    finally:
        shutil.rmtree(fdir, ignore_errors=True)


REGISTRY["streaming_quantiles"] = RawQ(_streaming_quantiles,
                                       _QUANTILE_SQL)


def _streaming_asof(sf_dir: str) -> pa.Table:
    """Streaming as-of enrichment: events replayed as the left stream,
    every 5th event (projected to a reference-update shape) as the
    right stream; each event binds its user's latest update at or
    before its own event time. Huge lateness + end-of-stream flush =>
    zero drops, output equals the bounded ROW_NUMBER oracle."""
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from ..streaming.asof import StreamingAsofJob

    tbl = pq.read_table(f"{sf_dir}/events.parquet")
    tbl = tbl.take(pc.sort_indices(
        tbl, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]))
    ids = tbl.column("event_id")
    upd = tbl.filter(pc.equal(
        pc.subtract(ids, pc.multiply(pc.divide(ids, 5), 5)), 0))
    upd = pa.table({
        "user_id": upd.column("user_id"), "ts": upd.column("ts"),
        "event_id": upd.column("event_id"),
        "ref_value": upd.column("value"),
    })
    n, nu = tbl.num_rows, upd.num_rows
    ldir = tempfile.mkdtemp(prefix="ksql_ray_sasof_l_")
    rdir = tempfile.mkdtemp(prefix="ksql_ray_sasof_r_")
    out = tempfile.mkdtemp(prefix="ksql_ray_sasof_out_")
    try:
        lf, rf = [], []
        for i in range(8):
            p = os.path.join(ldir, f"l{i:02d}.parquet")
            pq.write_table(tbl.slice(i * n // 8,
                                     (i + 1) * n // 8 - i * n // 8), p)
            lf.append(p)
            p = os.path.join(rdir, f"r{i:02d}.parquet")
            pq.write_table(upd.slice(i * nu // 8,
                                     (i + 1) * nu // 8 - i * nu // 8), p)
            rf.append(p)
        job = StreamingAsofJob(
            out, on="ts", by=["user_id"],
            right_cols={"ref_value": "ref_value"},
            left_columns=["event_id", "user_id", "ts", "value"],
            right_columns=["user_id", "ts", "event_id", "ref_value"],
            tiebreak="event_id", lateness_us=1 << 60, num_partitions=4)
        job.run(lf, rf, files_per_epoch=2)
        m = job.finish()
        assert m["late_left"] == 0 and m["late_right"] == 0, m
        t = job.result().select(
            ["event_id", "user_id", "ts", "value", "ref_value"])
        return _round_cols(t, {"value": 4, "ref_value": 4})
    finally:
        for d in (ldir, rdir, out):
            shutil.rmtree(d, ignore_errors=True)


REGISTRY["streaming_asof"] = RawQ(
    _streaming_asof,
    r"""
WITH up AS (
  SELECT user_id, ts, event_id, value AS ref_value FROM events
  WHERE event_id % 5 = 0
), j AS (
  SELECT e.event_id, e.user_id, e.ts, e.value, u.ref_value,
         ROW_NUMBER() OVER (
           PARTITION BY e.event_id
           ORDER BY u.ts DESC, u.event_id DESC) AS rn
  FROM events e LEFT JOIN up u
    ON u.user_id = e.user_id AND u.ts <= e.ts)
SELECT event_id, user_id, ROUND(value, 4) AS value, ts,
       ROUND(ref_value, 4) AS ref_value
FROM j WHERE rn = 1""",
)


def _streaming_topk(sf_dir: str) -> pa.Table:
    """Heavy hitters on ingest: the events table replayed as 8
    micro-batch files; Misra-Gries summaries per key partition with
    capacity >> distinct keys, so every count is EXACT
    (max_undercount 0 asserted) and the snapshot equals the bounded
    GROUP BY. Key = event_type:user_id."""
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from ..streaming.topk import StreamingTopKJob

    tbl = pq.read_table(f"{sf_dir}/events.parquet")
    tbl = tbl.take(pc.sort_indices(
        tbl, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]))
    n = tbl.num_rows
    fdir = tempfile.mkdtemp(prefix="ksql_ray_stopk_in_")
    try:
        files = []
        for i in range(8):
            s = tbl.slice(i * n // 8, (i + 1) * n // 8 - i * n // 8)
            p = os.path.join(fdir, f"b{i:02d}.parquet")
            pq.write_table(s, p)
            files.append(p)
        job = StreamingTopKJob(key_cols=["event_type", "user_id"],
                               columns=["event_type", "user_id"],
                               capacity=1 << 15, num_partitions=4)
        job.run(files, files_per_epoch=2)
        m = job.finish()
        assert m["max_undercount"] == 0, m
        return job.topk(25)
    finally:
        shutil.rmtree(fdir, ignore_errors=True)


REGISTRY["streaming_topk"] = RawQ(
    _streaming_topk,
    "SELECT event_type || ':' || user_id::VARCHAR AS key, "
    "count(*) AS cnt FROM events "
    "GROUP BY 1 ORDER BY cnt DESC, key LIMIT 25",
)


REGISTRY["streaming_dedup"] = RawQ(
    _streaming_dedup,
    r"""WITH corpus AS (
  SELECT * FROM documents
  UNION ALL
  SELECT doc_id + 1000000 AS doc_id, text, lang, source, n_chars
  FROM documents WHERE doc_id % 7 = 0
)
SELECT doc_id, text, lang, source, n_chars FROM (
  SELECT *, ROW_NUMBER() OVER (
    PARTITION BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
    ORDER BY doc_id) AS rn
  FROM corpus) WHERE rn = 1""",
)


def _streaming_neardup(sf_dir: str) -> pa.Table:
    """NEAR-dup-on-ingest (streaming/neardup.py): documents (>= 3
    tokens, mirroring the _NGRAM_JACCARD_SQL gram rule) streamed as 8
    micro-batch files in doc_id order; the greedy first occurrence of
    every near-dup cluster survives. The fixture's planted pairs have
    J >= 0.9 with J <= 0.3 background, so the engine's est rule (shared
    LSH band + >= 70% minhash-lane agreement) and the oracle's exact
    Jaccard >= 0.5 both land exactly on the planted pairs; the pairs
    are disjoint (no chains), so greedy == "no earlier similar doc"
    (general chain semantics are pinned by test_streaming_neardup.py)."""
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from ..streaming.neardup import StreamingNearDupJob

    docs = pq.read_table(f"{sf_dir}/documents.parquet")
    t = pc.utf8_trim_whitespace(pc.fill_null(docs.column("text"), ""))
    docs = docs.filter(
        pc.greater_equal(pc.count_substring_regex(t, r"\S+"), 3))
    docs = docs.sort_by("doc_id")
    n = docs.num_rows
    fdir = tempfile.mkdtemp(prefix="ksql_ray_sndup_in_")
    out = tempfile.mkdtemp(prefix="ksql_ray_sndup_out_")
    try:
        files = []
        for i in range(8):
            s = docs.slice(i * n // 8, (i + 1) * n // 8 - i * n // 8)
            p = os.path.join(fdir, f"b{i:02d}.parquet")
            pq.write_table(s, p)
            files.append(p)
        job = StreamingNearDupJob(out, tau=0.7, num_partitions=4)
        job.run(files, files_per_epoch=2)
        job.finish()
        return job.result()
    finally:
        shutil.rmtree(fdir, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


REGISTRY["streaming_neardup"] = RawQ(
    _streaming_neardup,
    r"""WITH toks AS (
  SELECT doc_id, text, lang, source, n_chars,
         regexp_split_to_array(trim(lower(text)), '\s+') AS t
  FROM documents
  WHERE len(regexp_split_to_array(trim(lower(text)), '\s+')) >= 3
), grams AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
  FROM toks
), sizes AS (SELECT doc_id, count(*) AS n FROM grams GROUP BY 1),
inter AS (
  SELECT a.doc_id AS doc_a, b.doc_id AS doc_b, count(*) AS i
  FROM grams a JOIN grams b ON a.g = b.g AND a.doc_id < b.doc_id
  GROUP BY 1, 2
), dropped AS (
  SELECT DISTINCT doc_b AS doc_id
  FROM inter
  JOIN sizes sa ON sa.doc_id = doc_a JOIN sizes sb ON sb.doc_id = doc_b
  WHERE i::DOUBLE / (sa.n + sb.n - i) >= 0.5
)
SELECT doc_id, text, lang, source, n_chars FROM toks
WHERE doc_id NOT IN (SELECT doc_id FROM dropped)""",
)


def _streaming_embdedup(sf_dir: str) -> pa.Table:
    """Semantic dedup on ingest (streaming/neardup.py
    StreamingEmbeddingDedupJob): the embeddings table streamed as 8
    micro-batch files in vec_id order; the greedy first occurrence of
    every cosine>=0.45 cluster survives. Probing mirrors the bounded
    op_embedding_neardup gate (4 planes x 32 tables -> recall ~1 at the
    fixture's 0.45-0.51 near-dup band); the fixture's 14 planted pairs
    are DISJOINT, so greedy == "no earlier similar vector" and the
    oracle is plain SQL (chain semantics are pinned by
    test_streaming_embdedup.py)."""
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from ..streaming.neardup import StreamingEmbeddingDedupJob

    vecs = pq.read_table(f"{sf_dir}/embeddings.parquet").sort_by("vec_id")
    dim = len(vecs.column("embedding")[0])
    n = vecs.num_rows
    fdir = tempfile.mkdtemp(prefix="ksql_ray_sed_in_")
    out = tempfile.mkdtemp(prefix="ksql_ray_sed_out_")
    try:
        files = []
        for i in range(8):
            s = vecs.slice(i * n // 8, (i + 1) * n // 8 - i * n // 8)
            p = os.path.join(fdir, f"b{i:02d}.parquet")
            pq.write_table(s, p)
            files.append(p)
        job = StreamingEmbeddingDedupJob(out, dim=dim, threshold=0.45,
                                         n_planes=4, n_tables=32,
                                         num_partitions=4)
        job.run(files, files_per_epoch=2)
        job.finish()
        return job.result()
    finally:
        shutil.rmtree(fdir, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


REGISTRY["streaming_embdedup"] = RawQ(
    _streaming_embdedup,
    """WITH n AS (SELECT vec_id, embedding, label,
                  list_transform(embedding, x -> x::DOUBLE) AS emb
           FROM embeddings),
       m AS (SELECT vec_id, embedding, label, emb,
                    sqrt(list_sum(list_transform(emb, x -> x*x))) AS nm
             FROM n),
       dropped AS (
         SELECT DISTINCT b.vec_id
         FROM m a JOIN m b ON a.vec_id < b.vec_id
         WHERE list_inner_product(a.emb, b.emb) / (a.nm * b.nm) >= 0.45
       )
       SELECT vec_id, embedding, label FROM m
       WHERE vec_id NOT IN (SELECT vec_id FROM dropped)""",
)


REGISTRY["ddl_migrations"] = RawQ(
    _ddl_migrations,
    "SELECT * FROM (VALUES "
    "('applied', '1001', 'init_users'), "
    "('applied', '1002', 'orders'), "
    "('column', 'users.id', 'int32'), "
    "('column', 'users.joined', 'timestamp[us]'), "
    "('column', 'users.name', 'string'), "
    "('partitions', 'users', '4'), "
    "('pk', 'orders', 'order_id'), "
    "('relation', 'QUERYABLE_orders', 'TABLE'), "
    "('relation', 'orders', 'TABLE'), "
    "('relation', 'users', 'STREAM')"
    ") AS t(kind, name, value)",
)


def _op_unnest(sf_dir: str) -> pa.Table:
    from ..ops.explode import split_tokens

    ds = _read_clean(f"{sf_dir}/documents.parquet").select_columns(
        ["doc_id", "text"])
    return _collect(split_tokens(ds, "text", ["doc_id"]))


REGISTRY["op_unnest"] = RawQ(
    _op_unnest,
    # SQL UNNEST with ordinality: DuckDB zips parallel unnests
    "SELECT doc_id, unnest(str_split(text, ' ')) AS tok, "
    "unnest(generate_series(1, len(str_split(text, ' ')))) AS pos "
    "FROM documents",
)


def _op_regex_extract(sf_dir: str) -> pa.Table:
    from ..ops.extract import regex_extract

    ds = _read_clean(f"{sf_dir}/events.parquet").select_columns(
        ["event_id", "props"])
    out = regex_extract(ds, "props", '"k":\\s*(?P<kv>[0-9]+)',
                        keep=["event_id"])
    return _collect(out)


REGISTRY["op_regex_extract"] = RawQ(
    _op_regex_extract,
    # both engines run RE2; DuckDB returns '' on miss, hence NULLIF
    "SELECT event_id, "
    "NULLIF(regexp_extract(props, '\"k\":\\s*([0-9]+)', 1), '') AS kv "
    "FROM events",
)


def _op_profile(sf_dir: str) -> pa.Table:
    from ..ops.profile import profile_columns

    ds = _read_clean(f"{sf_dir}/events.parquet")
    return _collect(profile_columns(ds, ["user_id", "event_type",
                                         "value"]))


REGISTRY["op_profile"] = RawQ(
    _op_profile,
    " UNION ALL ".join(
        f"SELECT '{c}' AS col, COUNT(*)::BIGINT AS n_rows, "
        f"(COUNT(*)-COUNT({c}))::BIGINT AS n_null, "
        f"COUNT(DISTINCT {c})::BIGINT AS n_distinct, "
        + (f"CAST(MIN({c}) AS DOUBLE) AS min_v, "
           f"CAST(MAX({c}) AS DOUBLE) AS max_v"
           if c != "event_type" else
           "CAST(NULL AS DOUBLE) AS min_v, CAST(NULL AS DOUBLE) AS max_v")
        + " FROM events"
        for c in ["user_id", "event_type", "value"]),
)


def _op_weighted_sample(sf_dir: str) -> pa.Table:
    from ..ops.sample import weighted_sample

    ds = _read_clean(f"{sf_dir}/events.parquet").select_columns(
        ["event_id", "user_id", "value"])
    return _collect(weighted_sample(ds, "event_id", "value",
                                    rate=0.2, scale=100.0))


REGISTRY["op_weighted_sample"] = RawQ(
    _op_weighted_sample,
    # Bernoulli p = value/100 * 0.2; threshold uses only IEEE
    # correctly-rounded ops (*, /) in this exact association, so the
    # kept set is bit-reproducible across numpy and DuckDB
    "SELECT event_id, user_id, value FROM events "
    "WHERE CAST(('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))"
    "::UBIGINT AS DOUBLE) < ((value * 0.2) * 4294967296.0) / 100.0",
)


def _op_split_assign(sf_dir: str) -> pa.Table:
    from ..ops.sample import split_assign

    ds = _read_clean(f"{sf_dir}/events.parquet").select_columns(
        ["event_id", "user_id"])
    return _collect(split_assign(ds, "user_id"))


_SPLIT_HASH = ("('0x' || substr(md5(CAST(user_id AS VARCHAR)), 1, 8))"
               "::UBIGINT % 100")
REGISTRY["op_split_assign"] = RawQ(
    _op_split_assign,
    "SELECT event_id, user_id, "
    f"CASE WHEN {_SPLIT_HASH} < 80 THEN 'train' "
    f"WHEN {_SPLIT_HASH} < 90 THEN 'val' ELSE 'test' END AS split "
    "FROM events",
)


def _op_sample_per_key(sf_dir: str) -> pa.Table:
    from ..ops.sample import sample_per_key

    ds = _read_clean(f"{sf_dir}/events.parquet").select_columns(
        ["event_id", "user_id", "event_type"])
    return _collect(sample_per_key(ds, ["user_id"], "event_id", n=3))


REGISTRY["op_sample_per_key"] = RawQ(
    _op_sample_per_key,
    "SELECT event_id, user_id, event_type FROM events "
    "QUALIFY ROW_NUMBER() OVER (PARTITION BY user_id ORDER BY "
    "('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))::UBIGINT, "
    "event_id) <= 3",
)


def _op_cube(sf_dir: str) -> pa.Table:
    from ..ops.cube import cube_agg

    ds = _read_clean(f"{sf_dir}/events.parquet").select_columns(
        ["event_type", "user_id", "value"])
    t = _collect(cube_agg(ds, ["event_type", "user_id"], "value"))
    return _round_cols(t, {"sum_v": 4})


REGISTRY["op_cube"] = RawQ(
    _op_cube,
    "SELECT event_type, user_id, ROUND(SUM(value), 4) AS sum_v, "
    "COUNT(value)::BIGINT AS cnt_v FROM events "
    "GROUP BY CUBE (event_type, user_id)",
)


def _op_melt(sf_dir: str) -> pa.Table:
    from ..ops.explode import melt

    ds = _read_clean(f"{sf_dir}/lineitem.parquet").select_columns(
        ["l_orderkey", "l_linenumber", "l_quantity", "l_discount",
         "l_tax"])
    return _collect(melt(ds, ["l_orderkey", "l_linenumber"],
                         ["l_quantity", "l_discount", "l_tax"]))


REGISTRY["op_melt"] = RawQ(
    _op_melt,
    "SELECT l_orderkey, l_linenumber, name, value FROM "
    "(SELECT l_orderkey, l_linenumber, l_quantity, l_discount, l_tax "
    "FROM lineitem) UNPIVOT INCLUDE NULLS "
    "(value FOR name IN (l_quantity, l_discount, l_tax))",
)


def _op_corr(sf_dir: str) -> pa.Table:
    import numpy as np

    from ..ops.profile import grouped_corr

    ds = _read_clean(f"{sf_dir}/events.parquet").select_columns(
        ["event_type", "user_id", "value"])
    t = _collect(grouped_corr(ds, ["event_type"], "value", "user_id"))
    # 2-decimal x against integer y: covar*n*(n-1)*100 is an exact
    # integer (fixed-decimal ROUND of the rational covar can tie);
    # corr carries a sqrt, irrational, safe at 6 decimals
    n = t.column("n").to_numpy(zero_copy_only=False).astype(np.float64)
    cv = t.column("covar").to_numpy(zero_copy_only=False)
    scaled = np.rint(cv * (n * (n - 1.0)) * 100.0)
    t = t.set_column(t.column_names.index("covar"), "covar_scaled",
                     pa.array(scaled, type=pa.float64(),
                              from_pandas=True))
    return _round_cols(t, {"corr": 6})


REGISTRY["op_corr"] = RawQ(
    _op_corr,
    "SELECT event_type, ROUND(corr(value, user_id), 6) AS corr, "
    "ROUND(covar_samp(value, user_id) * (count(*) * (count(*) - 1.0)) "
    "* 100.0, 0) AS covar_scaled, count(*)::BIGINT AS n FROM events "
    "GROUP BY event_type",
)


def _op_grouped_quantiles(sf_dir: str) -> pa.Table:
    from ..ops.quantiles import grouped_quantiles

    ds = _read_clean(f"{sf_dir}/events.parquet").select_columns(
        ["user_id", "value"])
    return _collect(grouped_quantiles(ds, ["user_id"], "value",
                                      qs=[0.25, 0.5, 0.9]))


REGISTRY["op_grouped_quantiles"] = RawQ(
    _op_grouped_quantiles,
    # DuckDB zips parallel unnests: one row per (key, q)
    "SELECT user_id, unnest([0.25, 0.5, 0.9]) AS q, "
    "unnest([quantile_disc(value, 0.25), quantile_disc(value, 0.5), "
    "quantile_disc(value, 0.9)]) AS value FROM events GROUP BY user_id",
)


def _op_grouped_hll(sf_dir: str) -> pa.Table:
    from ..ops.hll import grouped_hll_registers

    ds = _read_clean(f"{sf_dir}/events.parquet").select_columns(
        ["user_id", "event_id"])
    return _collect(grouped_hll_registers(ds, ["user_id"], "event_id",
                                          p=8))


REGISTRY["op_grouped_hll"] = RawQ(
    _op_grouped_hll,
    # per-key register STATE (distinct event_ids per user): same md5
    # register/rho construction as _HLL_SQL, grouped by user
    _GROUPED_HLL_SQL,
)


def _op_top_values_per_key(sf_dir: str) -> pa.Table:
    from ..ops.rows import top_values_per_key

    ds = _read_clean(f"{sf_dir}/events.parquet").select_columns(
        ["user_id", "event_type"])
    return _collect(top_values_per_key(ds, ["user_id"], "event_type",
                                       k=2))


REGISTRY["op_top_values_per_key"] = RawQ(
    _op_top_values_per_key,
    "SELECT user_id, event_type, cnt, "
    "(ROW_NUMBER() OVER (PARTITION BY user_id "
    "ORDER BY cnt DESC, event_type) - 1)::BIGINT AS rank FROM "
    "(SELECT user_id, event_type, count(*)::BIGINT AS cnt FROM events "
    "GROUP BY 1, 2) QUALIFY rank < 2",
)


def _op_pagerank(sf_dir: str) -> pa.Table:
    from ..ops.graph import pagerank

    ds = _read_clean(f"{sf_dir}/lineitem.parquet").select_columns(
        ["l_suppkey", "l_partkey"])

    def edges(b: pa.Table) -> pa.Table:
        return pa.table({
            "s": pc.binary_join_element_wise(
                "s", pc.cast(b.column("l_suppkey"), pa.string()), ""),
            "d": pc.binary_join_element_wise(
                "p", pc.cast(b.column("l_partkey"), pa.string()), ""),
        })

    e = ds.map_batches(edges, batch_format="pyarrow",
                       zero_copy_batch=True)
    t = _collect(pagerank(e, "s", "d", damping=0.85, iters=3))
    return _round_cols(t, {"rank": 9})


_PR_STEP = """
  SELECT nodes.n, (1 - 0.85) / (SELECT nn FROM cnt)
         + 0.85 * coalesce(agg.sc, 0) AS r
  FROM nodes LEFT JOIN (
    SELECT e.d AS n, SUM({prev}.r / deg.c) AS sc
    FROM e JOIN {prev} ON {prev}.n = e.s JOIN deg ON deg.s = e.s
    GROUP BY e.d) agg ON agg.n = nodes.n"""
REGISTRY["op_pagerank"] = RawQ(
    _op_pagerank,
    # 3 unrolled iterations of the multi-edge recurrence; supplier and
    # part keys prefixed into one string namespace (bipartite graph)
    "WITH e AS (SELECT 's' || l_suppkey AS s, 'p' || l_partkey AS d "
    "FROM lineitem), "
    "nodes AS (SELECT DISTINCT s AS n FROM e "
    "UNION SELECT DISTINCT d FROM e), "
    "cnt AS (SELECT count(*)::DOUBLE AS nn FROM nodes), "
    "deg AS (SELECT s, count(*)::DOUBLE AS c FROM e GROUP BY s), "
    "r0 AS (SELECT n, 1.0 / (SELECT nn FROM cnt) AS r FROM nodes), "
    f"r1 AS ({_PR_STEP.format(prev='r0')}), "
    f"r2 AS ({_PR_STEP.format(prev='r1')}), "
    f"r3 AS ({_PR_STEP.format(prev='r2')}) "
    "SELECT n AS node, ROUND(r, 9) AS rank FROM r3",
)


def _op_bottom_k_sample(sf_dir: str) -> pa.Table:
    from ..ops.sample import bottom_k_sample

    ds = _read_clean(f"{sf_dir}/documents.parquet")
    t = _collect(bottom_k_sample(ds, "doc_id", 37))
    return t.select(["doc_id", "lang", "source"])


REGISTRY["op_bottom_k_sample"] = RawQ(
    _op_bottom_k_sample,
    # exact-size uniform sample = global bottom-k by md5 hash
    # (ops/sample.py bottom_k_sample; Cohen & Kaplan bottom-k sketch)
    "SELECT doc_id, lang, source FROM documents "
    "ORDER BY ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT, "
    "doc_id LIMIT 37",
)


def _op_mixture_sample(sf_dir: str) -> pa.Table:
    from ..ops.sample import mixture_sample

    ds = _read_clean(f"{sf_dir}/documents.parquet")
    t = _collect(mixture_sample(
        ds, "doc_id", "source",
        {"src0": 0.5, "src1": 0.3, "src2": 0.1, "src3": 0.1}, 60))
    return t.select(["doc_id", "source"])


_MIX_CASE = ("CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.3 "
             "WHEN 'src2' THEN 0.1 WHEN 'src3' THEN 0.1 END")
REGISTRY["op_mixture_sample"] = RawQ(
    _op_mixture_sample,
    # domain-mixture sampling (ops/sample.py mixture_sample): keep rate
    # per domain = LEAST(1, n_target*w_norm/count) with the engine's
    # exact IEEE association (n_target * (w/tot_w)) / count
    "WITH cnt AS (SELECT source, COUNT(*)::DOUBLE AS c FROM documents "
    "GROUP BY source) "
    "SELECT doc_id, source FROM documents JOIN cnt USING (source) "
    f"WHERE ({_MIX_CASE}) IS NOT NULL "
    "AND ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT "
    f"< LEAST(1.0, (60.0 * (({_MIX_CASE}) / 1.0)) / c) * 4294967296.0",
)


def _c4_plant(batch: pa.Table) -> pa.Table:
    """Deterministically rebuild each doc as a multi-line C4 test page
    (the sf documents are single-line with no punctuation, so the raw
    C4 rules would be trivial). Mirrored verbatim in the oracle SQL.
    All literals typed (BASELINE.md lesson: untyped [] * 0 plants)."""
    import numpy as np

    ids = pc.cast(batch.column("doc_id"), pa.string())
    if isinstance(ids, pa.ChunkedArray):
        ids = ids.combine_chunks()
    idv = batch.column("doc_id").to_numpy(zero_copy_only=False)
    ids_np = ids.to_numpy(zero_copy_only=False).astype(object)
    head = pc.utf8_slice_codeunits(batch.column("text"), 0, 30)
    head_np = (head.combine_chunks() if isinstance(head, pa.ChunkedArray)
               else head).to_numpy(zero_copy_only=False).astype(object)
    nl = "\n"
    base = ("Sentence one about doc " + ids_np + " is long enough." + nl
            + "too short." + nl
            + "This line mentions javascript libraries and is dropped."
            + nl
            + "Line four of document " + ids_np + " also survives fine!"
            + nl + head_np + nl
            + "Closing line of document " + ids_np + " stays too.")
    base = base + np.where(
        idv % 5 == 0,
        nl + "A bonus line for doc " + ids_np + " survives as well?", "")
    base = base + np.where(idv % 7 == 0, nl + "padding lorem ipsum text",
                           "")
    base = base + np.where(idv % 11 == 0, nl + "stray { brace", "")
    i = batch.column_names.index("text")
    return batch.set_column(i, "text", pa.array(base, type=pa.string()))


def _op_c4_clean(sf_dir: str) -> pa.Table:
    from ..ops.c4 import c4_clean

    ds = _read_clean(f"{sf_dir}/documents.parquet")
    planted = ds.map_batches(_c4_plant, batch_format="pyarrow",
                             zero_copy_batch=True)
    t = _collect(c4_clean(planted, min_words=5, min_lines=3))
    return t.select(["doc_id", "text", "n_lines", "n_kept"])


_C4_TRIM = "' ' || chr(9) || chr(13)"
REGISTRY["op_c4_clean"] = RawQ(
    _op_c4_clean,
    # C4 page cleanup (Raffel et al. 2020 §2.2; ops/c4.py): the same
    # planted page, line predicates and reassembly in SQL
    "WITH d AS (SELECT doc_id, "
    "'Sentence one about doc ' || CAST(doc_id AS VARCHAR) || "
    "' is long enough.' || chr(10) || 'too short.' || chr(10) || "
    "'This line mentions javascript libraries and is dropped.' || "
    "chr(10) || 'Line four of document ' || CAST(doc_id AS VARCHAR) || "
    "' also survives fine!' || chr(10) || substr(text, 1, 30) || "
    "chr(10) || 'Closing line of document ' || "
    "CAST(doc_id AS VARCHAR) || ' stays too.' || "
    "CASE WHEN doc_id % 5 = 0 THEN chr(10) || 'A bonus line for doc ' "
    "|| CAST(doc_id AS VARCHAR) || ' survives as well?' ELSE '' END || "
    "CASE WHEN doc_id % 7 = 0 THEN chr(10) || "
    "'padding lorem ipsum text' ELSE '' END || "
    "CASE WHEN doc_id % 11 = 0 THEN chr(10) || 'stray { brace' "
    "ELSE '' END AS text FROM documents), "
    "ok AS (SELECT doc_id, text FROM d WHERE NOT "
    "contains(lower(text), 'lorem ipsum') AND NOT contains(text, '{')), "
    "l AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line, "
    "generate_subscripts(string_split(text, chr(10)), 1) AS pos "
    "FROM ok), "
    f"k AS (SELECT doc_id, line, pos, length(regexp_split_to_array("
    f"trim(line, {_C4_TRIM}), '\\s+')) AS wc FROM l), "
    "kept AS (SELECT * FROM k WHERE wc >= 5 AND "
    f"regexp_matches(trim(line, {_C4_TRIM}), '[.!?\"]$') "
    "AND NOT contains(lower(line), 'javascript')), "
    "agg AS (SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) "
    "AS text, count(*) AS n_kept FROM kept GROUP BY doc_id), "
    "tot AS (SELECT doc_id, count(*) AS n_lines FROM l GROUP BY doc_id) "
    "SELECT agg.doc_id, agg.text, tot.n_lines, agg.n_kept "
    "FROM agg JOIN tot USING (doc_id) WHERE n_kept >= 3",
)


def _op_bloom_semi(sf_dir: str) -> pa.Table:
    from ..ops.bloom import bloom_semi_join

    ev = _read_clean(f"{sf_dir}/events.parquet").select_columns(
        ["event_id", "user_id", "event_type"])
    big = _read_clean(f"{sf_dir}/orders.parquet").select_columns(
        ["o_custkey", "o_totalprice"]).filter(
        expr="o_totalprice > 350000.0")
    return _collect(bloom_semi_join(ev, big, "user_id", "o_custkey"))


REGISTRY["op_bloom_semi"] = RawQ(
    _op_bloom_semi,
    # bloom-prefiltered semi-join (ops/bloom.py): exact mode — bloom
    # bitmap built over the right key column in one pass (fan-in-8 OR
    # tree), broadcast once, left rows prefiltered per batch, then one
    # hash-partition shuffle verifies survivors with co-partitioned
    # is_in. Result is exact SQL IN regardless of the bloom FPR.
    "SELECT event_id, user_id, event_type FROM events "
    "WHERE user_id IN (SELECT o_custkey FROM orders"
    "                  WHERE o_totalprice > 350000.0)",
)


def _op_bloom_anti(sf_dir: str) -> pa.Table:
    from ..ops.bloom import bloom_semi_join

    ev = _read_clean(f"{sf_dir}/events.parquet").select_columns(
        ["event_id", "user_id", "event_type"])
    big = _read_clean(f"{sf_dir}/orders.parquet").select_columns(
        ["o_custkey", "o_totalprice"]).filter(
        expr="o_totalprice > 350000.0")
    return _collect(bloom_semi_join(ev, big, "user_id", "o_custkey",
                                    anti=True))


REGISTRY["op_bloom_anti"] = RawQ(
    _op_bloom_anti,
    # bloom anti (NOT EXISTS): bloom-NEGATIVE rows bypass the verify
    # shuffle as definite keepers (a bloom never false-negatives);
    # only bloom-positives are exact-verified, then unioned back
    "SELECT event_id, user_id, event_type FROM events e "
    "WHERE NOT EXISTS (SELECT 1 FROM orders o"
    "  WHERE o.o_custkey = e.user_id AND o.o_totalprice > 350000.0)",
)


def _op_snapshot_diff(sf_dir: str) -> pa.Table:
    """CDC between two planted snapshots of documents: old = doc_id %
    7 != 0, new = doc_id % 5 != 0 with text upper-cased when doc_id %
    3 == 0 (both plants pure deterministic column transforms, mirrored
    in the SQL)."""
    import numpy as np

    from ..ops.diff import snapshot_diff

    def mod_ne(m):
        def f(b: pa.Table) -> pa.Table:
            ids = b.column("doc_id").to_numpy(zero_copy_only=False)
            return b.filter(pa.array(ids % m != 0))

        return f

    def texted(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        t = pc.if_else(pa.array(ids % 3 == 0),
                       pc.utf8_upper(b.column("text")), b.column("text"))
        return b.set_column(b.column_names.index("text"), "text", t)

    old = _read_clean(f"{sf_dir}/documents.parquet").select_columns(
        ["doc_id", "text"]).map_batches(
        mod_ne(7), batch_format="pyarrow", zero_copy_batch=True)
    new = _read_clean(f"{sf_dir}/documents.parquet").select_columns(
        ["doc_id", "text"]).map_batches(
        mod_ne(5), batch_format="pyarrow", zero_copy_batch=True
    ).map_batches(texted, batch_format="pyarrow", zero_copy_batch=True)
    return _collect(snapshot_diff(old, new, "doc_id", ["text"]))


REGISTRY["op_snapshot_diff"] = RawQ(
    _op_snapshot_diff,
    # corpus snapshot diff (ops/diff.py): added/removed/changed between
    # two crawl versions — fingerprint projections (25 B/row), one key
    # shuffle, sorted-segment status resolve; FULL OUTER JOIN oracle
    "WITH o AS (SELECT doc_id, text FROM documents WHERE doc_id % 7 != 0), "
    "n AS (SELECT doc_id, CASE WHEN doc_id % 3 = 0 THEN upper(text)"
    "       ELSE text END AS text FROM documents WHERE doc_id % 5 != 0) "
    "SELECT COALESCE(o.doc_id, n.doc_id) AS doc_id, "
    "  CASE WHEN o.doc_id IS NULL THEN 'added' "
    "       WHEN n.doc_id IS NULL THEN 'removed' "
    "       ELSE 'changed' END AS status "
    "FROM o FULL OUTER JOIN n ON o.doc_id = n.doc_id "
    "WHERE o.doc_id IS NULL OR n.doc_id IS NULL OR o.text <> n.text",
)


def _streaming_transitions(sf_dir: str) -> pa.Table:
    """Per-key label transition counts on ingest (streaming/rows.py):
    events replayed as 8 micro-batch files in (ts, event_id) order;
    each user's event_type -> event_type Markov edges counted with
    per-key carry state across epochs. event_id is monotone under the
    ts sort, so it doubles as the per-key order column; with in-order
    replay late_rows == 0 and the stream answer equals the bounded
    LAG() + GROUP BY bit-for-bit."""
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from ..streaming.rows import StreamingTransitionsJob

    tbl = pq.read_table(f"{sf_dir}/events.parquet",
                        columns=["event_id", "ts", "user_id",
                                 "event_type"])
    tbl = tbl.take(pc.sort_indices(
        tbl, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]))
    n = tbl.num_rows
    fdir = tempfile.mkdtemp(prefix="ksql_ray_strans_in_")
    try:
        files = []
        for i in range(8):
            s = tbl.slice(i * n // 8, (i + 1) * n // 8 - i * n // 8)
            p = os.path.join(fdir, f"b{i:02d}.parquet")
            pq.write_table(s, p)
            files.append(p)
        job = StreamingTransitionsJob(
            key_cols=["user_id"], ord_col="event_id",
            label_col="event_type",
            columns=["user_id", "event_id", "event_type"],
            num_partitions=4)
        job.run(files, files_per_epoch=2)
        m = job.finish()
        assert m["late_rows"] == 0, m
        return job.transitions()
    finally:
        shutil.rmtree(fdir, ignore_errors=True)


REGISTRY["streaming_transitions"] = RawQ(
    _streaming_transitions,
    r"""
SELECT from_label, to_label, COUNT(*) AS cnt FROM (
  SELECT LAG(event_type) OVER (
           PARTITION BY user_id ORDER BY event_id) AS from_label,
         event_type AS to_label
  FROM events)
WHERE from_label IS NOT NULL AND to_label IS NOT NULL
GROUP BY 1, 2 ORDER BY 1, 2""",
)


def _streaming_anomaly(sf_dir: str) -> pa.Table:
    """Running z-score outlier detection on ingest (streaming/rows.py):
    events replayed as 8 micro-batch files; each row scored against its
    user's running (n, sum, sumsq) prefix state BEFORE the row —
    emitted when the user had >= 5 prior values and |z| > 1.5. Equals
    the bounded AVG/STDDEV_SAMP OVER (ROWS BETWEEN UNBOUNDED PRECEDING
    AND 1 PRECEDING) window frame."""
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from ..streaming.rows import StreamingAnomalyJob

    tbl = pq.read_table(f"{sf_dir}/events.parquet",
                        columns=["event_id", "ts", "user_id", "value"])
    tbl = tbl.take(pc.sort_indices(
        tbl, sort_keys=[("ts", "ascending"), ("event_id", "ascending")]))
    n = tbl.num_rows
    fdir = tempfile.mkdtemp(prefix="ksql_ray_sanom_in_")
    try:
        files = []
        for i in range(8):
            s = tbl.slice(i * n // 8, (i + 1) * n // 8 - i * n // 8)
            p = os.path.join(fdir, f"b{i:02d}.parquet")
            pq.write_table(s, p)
            files.append(p)
        job = StreamingAnomalyJob(
            key_cols=["user_id"], ord_col="event_id", val_col="value",
            columns=["user_id", "event_id", "value"],
            min_n=5, threshold=1.5, num_partitions=4)
        job.run(files, files_per_epoch=2)
        m = job.finish()
        assert m["late_rows"] == 0, m
        t = job.result().select(
            ["user_id", "event_id", "n_before", "zscore"])
        t = t.take(pc.sort_indices(t, sort_keys=[
            ("user_id", "ascending"), ("event_id", "ascending")]))
        return _round_cols(t, {"zscore": 4})
    finally:
        shutil.rmtree(fdir, ignore_errors=True)


REGISTRY["streaming_anomaly"] = RawQ(
    _streaming_anomaly,
    r"""
SELECT user_id, event_id, n_before, ROUND(zscore, 4) AS zscore FROM (
  SELECT user_id, event_id,
         COUNT(value) OVER w AS n_before,
         CASE WHEN STDDEV_SAMP(value) OVER w > 0
              THEN (value - AVG(value) OVER w)
                   / STDDEV_SAMP(value) OVER w END AS zscore
  FROM events
  WINDOW w AS (PARTITION BY user_id ORDER BY event_id
               ROWS BETWEEN UNBOUNDED PRECEDING AND 1 PRECEDING))
WHERE n_before >= 5 AND zscore IS NOT NULL AND ABS(zscore) > 1.5
ORDER BY user_id, event_id""",
)


def _op_similarity_join(sf_dir: str) -> pa.Table:
    """Cross-table MinHash-LSH similarity join: right side = every 7th
    document re-keyed (+1M), so exact matches (and any near-dups of
    them) must link back; verified pairs carry exact n-gram Jaccard."""
    from ..ops.dedup import similarity_join

    left = _min3_tokens(_read_clean(f"{sf_dir}/documents.parquet"))

    def plant(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        m7 = pc.subtract(ids, pc.multiply(pc.divide(ids, 7), 7))
        sel = batch.filter(pc.equal(m7, 0))
        i = sel.column_names.index("doc_id")
        return sel.set_column(i, "doc_id",
                              pc.add(sel.column("doc_id"), 1_000_000))

    right = _min3_tokens(
        _read_clean(f"{sf_dir}/documents.parquet").map_batches(
            plant, batch_format="pyarrow", zero_copy_batch=True))
    t = _collect(similarity_join(left, right, threshold=0.5))
    return t.select(["left_id", "right_id", "jaccard"])


REGISTRY["op_similarity_join"] = RawQ(
    _op_similarity_join,
    # exact n-gram Jaccard join replicated in SQL over the same two
    # derived tables (same shingle semantics as _NGRAM_JACCARD_SQL)
    r"""
WITH rdocs AS (
  SELECT doc_id + 1000000 AS doc_id, text FROM documents
  WHERE doc_id % 7 = 0
), lt AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
  FROM documents
  WHERE len(regexp_split_to_array(trim(lower(text)), '\s+')) >= 3
), rt AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
  FROM rdocs
  WHERE len(regexp_split_to_array(trim(lower(text)), '\s+')) >= 3
), lg AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
  FROM lt
), rg AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
  FROM rt
), ls AS (SELECT doc_id, count(*) AS n FROM lg GROUP BY 1),
rs AS (SELECT doc_id, count(*) AS n FROM rg GROUP BY 1),
inter AS (
  SELECT lg.doc_id AS left_id, rg.doc_id AS right_id, count(*) AS i
  FROM lg JOIN rg ON lg.g = rg.g
  GROUP BY 1, 2
)
SELECT left_id, right_id, i::DOUBLE / (ls.n + rs.n - i) AS jaccard
FROM inter
JOIN ls ON ls.doc_id = left_id
JOIN rs ON rs.doc_id = right_id
WHERE i::DOUBLE / (ls.n + rs.n - i) >= 0.5""",
)


def _streaming_decontam_filter(sf_dir: str) -> pa.Table:
    """Decontamination FILTER on ingest: same stream/reference as
    streaming_simjoin, but in clean_dir mode — the committed output is
    the stream MINUS every doc that matched the reference (clean rows
    keep their full schema; this gate checks the surviving doc ids)."""
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from ..streaming.simjoin import StreamingSimJoinJob

    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    toks = pc.count_substring_regex(
        pc.utf8_trim_whitespace(pc.fill_null(docs.column("text"), "")),
        r"\S+")
    docs = docs.filter(pc.greater_equal(toks, 3))
    ids = docs.column("doc_id")
    m7 = pc.subtract(ids, pc.multiply(pc.divide(ids, 7), 7))
    ref = docs.filter(pc.equal(m7, 0))
    ref = ref.set_column(ref.schema.get_field_index("doc_id"), "doc_id",
                         pc.add(ref.column("doc_id"), 1_000_000))
    n = docs.num_rows
    fdir = tempfile.mkdtemp(prefix="ksql_ray_sdcf_in_")
    out = tempfile.mkdtemp(prefix="ksql_ray_sdcf_out_")
    clean = tempfile.mkdtemp(prefix="ksql_ray_sdcf_clean_")
    try:
        rp = os.path.join(fdir, "ref.parquet")
        pq.write_table(ref, rp)
        files = []
        for i in range(8):
            s = docs.slice(i * n // 8, (i + 1) * n // 8 - i * n // 8)
            p = os.path.join(fdir, f"b{i:02d}.parquet")
            pq.write_table(s, p)
            files.append(p)
        job = StreamingSimJoinJob(out, rp, threshold=0.5,
                                  num_partitions=4, clean_dir=clean)
        job.run(files, files_per_epoch=2)
        m = job.finish()
        assert m["rows_in"] == n, m
        return job.clean_result().select(["doc_id"])
    finally:
        shutil.rmtree(fdir, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)
        shutil.rmtree(clean, ignore_errors=True)


REGISTRY["streaming_decontam_filter"] = RawQ(
    _streaming_decontam_filter,
    # stream docs minus every doc with a cross-table Jaccard >= 0.5
    # match (same CTE chain as streaming_simjoin)
    r"""
WITH rdocs AS (
  SELECT doc_id + 1000000 AS doc_id, text FROM documents
  WHERE doc_id % 7 = 0
), lt AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
  FROM documents
  WHERE len(regexp_split_to_array(trim(lower(text)), '\s+')) >= 3
), rt AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
  FROM rdocs
  WHERE len(regexp_split_to_array(trim(lower(text)), '\s+')) >= 3
), lg AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
  FROM lt
), rg AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
  FROM rt
), ls AS (SELECT doc_id, count(*) AS n FROM lg GROUP BY 1),
rs AS (SELECT doc_id, count(*) AS n FROM rg GROUP BY 1),
inter AS (
  SELECT lg.doc_id AS stream_id, rg.doc_id AS ref_id, count(*) AS i
  FROM lg JOIN rg ON lg.g = rg.g
  GROUP BY 1, 2
), matched AS (
  SELECT DISTINCT stream_id
  FROM inter
  JOIN ls ON ls.doc_id = stream_id
  JOIN rs ON rs.doc_id = ref_id
  WHERE i::DOUBLE / (ls.n + rs.n - i) >= 0.5
)
SELECT l.doc_id FROM lt l
WHERE l.doc_id NOT IN (SELECT stream_id FROM matched)
ORDER BY l.doc_id""",
)


def _op_strip_markup(sf_dir: str) -> pa.Table:
    """Markup-strip cleanup: every 5th document gets an appended
    markup payload (fenced code, html tag, URL, inline code — the
    plant is a plain string concat, so the oracle reproduces it in
    SQL), then ops/c4.strip_markup removes all of it."""
    from ..ops.c4 import strip_markup

    _PLANT = (" <b>bold</b> fenced ```drop\nthis``` see "
              "https://example.com/x?q=1 and `code` end")

    def plant(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        m5 = pc.equal(pc.subtract(ids, pc.multiply(
            pc.divide(ids, 5), 5)), 0)
        t = pc.fill_null(batch.column("text"), "")
        planted = pc.if_else(
            m5, pc.binary_join_element_wise(
                t, pa.scalar(_PLANT, pa.string()), ""), t)
        i = batch.column_names.index("text")
        return batch.set_column(i, "text", planted).select(
            ["doc_id", "text"])

    ds = _read_clean(f"{sf_dir}/documents.parquet").map_batches(
        plant, batch_format="pyarrow", zero_copy_batch=True)
    t = _collect(strip_markup(ds))
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id",
                                                 "ascending")]))


REGISTRY["op_strip_markup"] = RawQ(
    _op_strip_markup,
    # the same five RE2 rules + explicit-set trim; DuckDB's
    # regexp_replace runs the same RE2 engine as pyarrow's kernel
    r"""
WITH planted AS (
  SELECT doc_id,
         CASE WHEN doc_id % 5 = 0
              THEN coalesce(text, '') || ' <b>bold</b> fenced ```drop' ||
                   chr(10) || 'this``` see https://example.com/x?q=1 ' ||
                   'and `code` end'
              ELSE coalesce(text, '') END AS text
  FROM documents)
SELECT doc_id,
       trim(regexp_replace(regexp_replace(regexp_replace(
            regexp_replace(regexp_replace(text,
            '```[\s\S]*?```', ' ', 'g'),
            '`[^`]*`', ' ', 'g'),
            '<[^>]+>', ' ', 'g'),
            'https?://[^\s]+', ' ', 'g'),
            '[ \t]+', ' ', 'g'), ' ' || chr(9) || chr(13)) AS text
FROM planted ORDER BY doc_id""",
)


def _streaming_simjoin(sf_dir: str) -> pa.Table:
    """Similarity join against a static reference ON INGEST: documents
    replayed as 8 micro-batch files probed against a fixed reference
    (every 7th doc re-keyed +1M); matches = exact n-gram Jaccard >= 0.5
    through the idempotent sink. Must equal the bounded
    op_similarity_join / its SQL oracle bit-for-bit."""
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from ..streaming.simjoin import StreamingSimJoinJob

    docs = pq.read_table(f"{sf_dir}/documents.parquet",
                         columns=["doc_id", "text"])
    toks = pc.count_substring_regex(
        pc.utf8_trim_whitespace(pc.fill_null(docs.column("text"), "")),
        r"\S+")
    docs = docs.filter(pc.greater_equal(toks, 3))
    ids = docs.column("doc_id")
    m7 = pc.subtract(ids, pc.multiply(pc.divide(ids, 7), 7))
    ref = docs.filter(pc.equal(m7, 0))
    ref = ref.set_column(ref.schema.get_field_index("doc_id"), "doc_id",
                         pc.add(ref.column("doc_id"), 1_000_000))
    n = docs.num_rows
    fdir = tempfile.mkdtemp(prefix="ksql_ray_ssj_in_")
    out = tempfile.mkdtemp(prefix="ksql_ray_ssj_out_")
    try:
        rp = os.path.join(fdir, "ref.parquet")
        pq.write_table(ref, rp)
        files = []
        for i in range(8):
            s = docs.slice(i * n // 8, (i + 1) * n // 8 - i * n // 8)
            p = os.path.join(fdir, f"b{i:02d}.parquet")
            pq.write_table(s, p)
            files.append(p)
        job = StreamingSimJoinJob(out, rp, threshold=0.5,
                                  num_partitions=4)
        job.run(files, files_per_epoch=2)
        m = job.finish()
        assert m["rows_in"] == n and m["capped"] == 0, m
        return job.result()
    finally:
        shutil.rmtree(fdir, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


REGISTRY["streaming_simjoin"] = RawQ(
    _streaming_simjoin,
    # same cross-table exact-Jaccard SQL as op_similarity_join, with
    # the streaming job's output column names
    r"""
WITH rdocs AS (
  SELECT doc_id + 1000000 AS doc_id, text FROM documents
  WHERE doc_id % 7 = 0
), lt AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
  FROM documents
  WHERE len(regexp_split_to_array(trim(lower(text)), '\s+')) >= 3
), rt AS (
  SELECT doc_id, regexp_split_to_array(trim(lower(text)), '\s+') AS t
  FROM rdocs
  WHERE len(regexp_split_to_array(trim(lower(text)), '\s+')) >= 3
), lg AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
  FROM lt
), rg AS (
  SELECT DISTINCT doc_id,
         unnest(list_transform(range(1, len(t) - 1),
                               i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
  FROM rt
), ls AS (SELECT doc_id, count(*) AS n FROM lg GROUP BY 1),
rs AS (SELECT doc_id, count(*) AS n FROM rg GROUP BY 1),
inter AS (
  SELECT lg.doc_id AS stream_id, rg.doc_id AS ref_id, count(*) AS i
  FROM lg JOIN rg ON lg.g = rg.g
  GROUP BY 1, 2
)
SELECT stream_id, ref_id, i::DOUBLE / (ls.n + rs.n - i) AS jaccard
FROM inter
JOIN ls ON ls.doc_id = stream_id
JOIN rs ON rs.doc_id = ref_id
WHERE i::DOUBLE / (ls.n + rs.n - i) >= 0.5""",
)


def _op_ngram_repetition(sf_dir: str) -> pa.Table:
    from ..ops.quality import add_ngram_repetition

    ds = _read_clean(f"{sf_dir}/documents.parquet")

    def fn(batch: pa.Table) -> pa.Table:
        batch = batch.select(["doc_id", "text"])
        out = add_ngram_repetition(batch, top_ns=(2,), dup_ns=(5,))
        # mirror the oracle's total_chars > 0 guard: docs with no
        # word characters are excluded
        nchars = pc.utf8_length(pc.replace_substring_regex(
            pc.fill_null(batch.column("text"), ""), r"\s", ""))
        return out.filter(pc.greater(nchars, 0)).select(
            ["doc_id", "top_2gram_char_frac", "dup_5gram_char_frac"])

    t = _collect(ds.map_batches(fn, batch_format="pyarrow",
                                zero_copy_batch=True))
    return t.take(pc.sort_indices(t, sort_keys=[("doc_id",
                                                 "ascending")]))


REGISTRY["op_ngram_repetition"] = RawQ(
    _op_ngram_repetition,
    # Gopher top-/dup-n-gram char fractions replicated in SQL: word
    # positions via zipped unnest, 2-grams via a pos+1 self-join (most
    # frequent, ties to the larger char total), duplicated 5-grams via
    # a 5-way join + window count, coverage union via BETWEEN join +
    # DISTINCT (chars counted once)
    r"""
WITH toks0 AS (
  SELECT doc_id,
         unnest(string_split_regex(lower(text), '\s+')) AS w,
         generate_subscripts(
             string_split_regex(lower(text), '\s+'), 1) AS pos
  FROM documents
), toks AS (
  SELECT doc_id, w,
         ROW_NUMBER() OVER (PARTITION BY doc_id ORDER BY pos) AS ord
  FROM toks0 WHERE w <> ''
), tot AS (
  SELECT doc_id, SUM(length(w))::DOUBLE AS total_chars
  FROM toks GROUP BY 1
), g2 AS (
  SELECT a.doc_id, a.w || ' ' || b.w AS gram,
         length(a.w) + length(b.w) AS gl, COUNT(*) AS cnt
  FROM toks a JOIN toks b
    ON b.doc_id = a.doc_id AND b.ord = a.ord + 1
  GROUP BY 1, 2, 3
), top2 AS (
  SELECT doc_id, cnt * gl AS chars,
         ROW_NUMBER() OVER (PARTITION BY doc_id
                            ORDER BY cnt DESC, gl DESC) AS rn
  FROM g2
), g5 AS (
  SELECT a.doc_id, a.ord AS s,
         a.w || ' ' || b.w || ' ' || c.w || ' ' || d.w || ' ' || e.w
         AS gram
  FROM toks a
  JOIN toks b ON b.doc_id = a.doc_id AND b.ord = a.ord + 1
  JOIN toks c ON c.doc_id = a.doc_id AND c.ord = a.ord + 2
  JOIN toks d ON d.doc_id = a.doc_id AND d.ord = a.ord + 3
  JOIN toks e ON e.doc_id = a.doc_id AND e.ord = a.ord + 4
), dup5 AS (
  SELECT doc_id, s FROM (
    SELECT doc_id, s,
           COUNT(*) OVER (PARTITION BY doc_id, gram) AS c
    FROM g5) WHERE c > 1
), cov AS (
  SELECT DISTINCT t.doc_id, t.ord, length(t.w) AS wl
  FROM toks t JOIN dup5 d
    ON t.doc_id = d.doc_id AND t.ord BETWEEN d.s AND d.s + 4
), covs AS (
  SELECT doc_id, SUM(wl)::DOUBLE AS cchars FROM cov GROUP BY 1
)
SELECT t.doc_id,
       ROUND(coalesce(p.chars, 0) / t.total_chars, 6)
           AS top_2gram_char_frac,
       ROUND(coalesce(c.cchars, 0) / t.total_chars, 6)
           AS dup_5gram_char_frac
FROM tot t
LEFT JOIN (SELECT doc_id, chars FROM top2 WHERE rn = 1) p
       USING (doc_id)
LEFT JOIN covs c USING (doc_id)
WHERE t.total_chars > 0
ORDER BY t.doc_id""",
)


def _streaming_grouped_quantiles(sf_dir: str) -> pa.Table:
    """Per-key EXACT quantiles on ingest: events replayed as 8
    micro-batch files through StreamingGroupedQuantilesJob (per-key
    value-histogram state, hash-partitioned by key, CMS-style epoch
    fence since count merge is addition). Equals the bounded SQL
    quantile_disc GROUP BY bit-for-bit."""
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from ..streaming.quantiles import StreamingGroupedQuantilesJob

    tbl = pq.read_table(f"{sf_dir}/events.parquet",
                        columns=["user_id", "value"])
    n = tbl.num_rows
    fdir = tempfile.mkdtemp(prefix="ksql_ray_sgq_in_")
    try:
        files = []
        for i in range(8):
            s = tbl.slice(i * n // 8, (i + 1) * n // 8 - i * n // 8)
            p = os.path.join(fdir, f"b{i:02d}.parquet")
            pq.write_table(s, p)
            files.append(p)
        job = StreamingGroupedQuantilesJob(
            key_cols=["user_id"], col="value",
            columns=["user_id", "value"], num_partitions=4)
        job.run(files, files_per_epoch=2)
        m = job.finish()
        assert m["rows_in"] == n and m["replayed"] == 0, m
        return job.quantiles([0.5, 0.9])
    finally:
        shutil.rmtree(fdir, ignore_errors=True)


REGISTRY["streaming_grouped_quantiles"] = RawQ(
    _streaming_grouped_quantiles,
    r"""
SELECT user_id, 0.5 AS q, quantile_disc(value, 0.5) AS value
FROM events WHERE value IS NOT NULL GROUP BY user_id
UNION ALL
SELECT user_id, 0.9 AS q, quantile_disc(value, 0.9) AS value
FROM events WHERE value IS NOT NULL GROUP BY user_id
ORDER BY user_id, q""",
)


_CMS_SQL = r"""
WITH k AS (
  SELECT coalesce(user_id::VARCHAR, '') AS key FROM events
), g AS (
  SELECT d,
         ('0x' || substr(md5(key || '|' || d), 1, 16))::UBIGINT % 256
         AS bucket
  FROM k CROSS JOIN (SELECT unnest(range(4)) AS d))
SELECT d::BIGINT AS d, bucket::BIGINT AS bucket, COUNT(*)::BIGINT AS cnt
FROM g GROUP BY 1, 2 ORDER BY 1, 2"""


def _op_cms_counters(sf_dir: str) -> pa.Table:
    from ..ops.cms import cms_counters

    ds = _read_clean(f"{sf_dir}/events.parquet")
    return _collect(cms_counters(ds, "user_id", depth=4, width=256,
                                 hash="md5"))


REGISTRY["op_cms_counters"] = RawQ(
    _op_cms_counters,
    # full COUNTER-STATE check, not just point estimates — the md5
    # hash makes every (d, bucket) cell SQL-expressible (ops/cms.py
    # docstring spells out the contract)
    _CMS_SQL,
)


def _streaming_cms(sf_dir: str) -> pa.Table:
    """Frequency sketch on ingest: the events table replayed as 8
    micro-batch files through StreamingCMSJob. Counter merge is
    addition — NOT replay-insensitive — so the state actors carry an
    epoch fence; with exactly-once application the streamed counter
    state equals the bounded op's bit-for-bit."""
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from ..streaming.cms import StreamingCMSJob

    tbl = pq.read_table(f"{sf_dir}/events.parquet", columns=["user_id"])
    n = tbl.num_rows
    fdir = tempfile.mkdtemp(prefix="ksql_ray_scms_in_")
    try:
        files = []
        for i in range(8):
            s = tbl.slice(i * n // 8, (i + 1) * n // 8 - i * n // 8)
            p = os.path.join(fdir, f"b{i:02d}.parquet")
            pq.write_table(s, p)
            files.append(p)
        job = StreamingCMSJob(key_col="user_id", depth=4, width=256,
                              hash="md5", num_partitions=4)
        job.run(files, files_per_epoch=2)
        m = job.finish()
        assert m["rows_in"] == n and m["replayed"] == 0, m
        return job.counters()
    finally:
        shutil.rmtree(fdir, ignore_errors=True)


REGISTRY["streaming_cms"] = RawQ(_streaming_cms, _CMS_SQL)


def _op_bpe_token_count(sf_dir: str) -> pa.Table:
    """Per-doc BPE token counts with ZERO merges — every word costs
    len(word)+1 symbols (chars + </w>), the SQL-checkable base-case of
    the subword tokenizer (the learned-merge path is pinned by
    tests/test_ops_bpe.py and the op_bpe_vocab gate)."""
    from ..ops.bpe import bpe_token_counts

    ds = _read_clean(f"{sf_dir}/documents.parquet")
    t = _collect(bpe_token_counts(ds, []))
    return t.select(["doc_id", "bpe_token_count"])


REGISTRY["op_bpe_token_count"] = RawQ(
    _op_bpe_token_count,
    "SELECT doc_id, SUM(CASE WHEN t = '' THEN 0 ELSE LENGTH(t) + 1 END)"
    "::BIGINT AS bpe_token_count FROM (SELECT doc_id, "
    "unnest(regexp_split_to_array(trim(lower(text)), '\\s+')) AS t "
    "FROM documents) GROUP BY doc_id",
)


def _op_bpe_vocab(sf_dir: str) -> pa.Table:
    """Learned BPE merge table (rank, left, right, token) on the
    documents corpus — deterministic (exact integer counts, lexicographic
    tie-break) but not SQL-expressible (sequential merge loop), so this
    gate is rows-only at the driver. VALUE correctness is pinned by an
    in-repo INDEPENDENT oracle: tests/test_bpe_value_oracle.py re-derives
    the full 64-merge table with a from-scratch naive Sennrich loop
    (brute-force pair recount per merge, zero shared code) on this exact
    corpus and parameters; determinism across partitionings is pinned by
    tests/test_ops_bpe.py."""
    from ..ops.bpe import learn_bpe, merges_table

    ds = _read_clean(f"{sf_dir}/documents.parquet")
    return merges_table(learn_bpe(ds, num_merges=64,
                                  max_word_vocab=8192))


REGISTRY["op_bpe_vocab"] = RawQ(_op_bpe_vocab)


def _lines_plant(batch: pa.Table) -> pa.Table:
    """Multi-line page fixture (sf documents are single-line): a
    repeated first line (intra-doc dup), a shared boilerplate line on
    doc_id % 2 == 0, a mid-frequency line shared by doc_id % 200
    cohorts, and a unique tail."""
    ids = pc.cast(batch.column("doc_id"), pa.string())
    n = batch.num_rows

    def lit(s: str) -> pa.Array:
        return pa.array([s] * n, type=pa.string())

    head = pc.binary_join_element_wise(lit("first line of doc "), ids,
                                       lit(""))
    cohort = pc.cast(pc.subtract(
        batch.column("doc_id"),
        pc.multiply(pc.divide(batch.column("doc_id"), 200),
                    pa.scalar(200, pa.int64()))), pa.string())
    mid = pc.binary_join_element_wise(lit("shared cohort line "),
                                      cohort, lit(""))
    even = pc.equal(pc.bit_wise_and(batch.column("doc_id"),
                                    pa.scalar(1, pa.int64())),
                    pa.scalar(0, pa.int64()))
    boiler = pc.if_else(even, lit("subscribe to our newsletter"),
                        lit("no banner here"))
    tail = pc.binary_join_element_wise(
        lit("unique tail "), ids, lit(" "),
        pc.utf8_slice_codeunits(batch.column("text"), 0, 24), lit(""))
    text = pc.binary_join_element_wise(
        head, head, boiler, mid, tail, lit("\n"))
    i = batch.column_names.index("text")
    return batch.set_column(i, "text", text).select(["doc_id", "text"])


_LINES_PLANT_SQL = (
    "SELECT doc_id, 'first line of doc ' || CAST(doc_id AS VARCHAR) || "
    "chr(10) || 'first line of doc ' || CAST(doc_id AS VARCHAR) || "
    "chr(10) || CASE WHEN doc_id % 2 = 0 THEN "
    "'subscribe to our newsletter' ELSE 'no banner here' END || "
    "chr(10) || 'shared cohort line ' || CAST(doc_id % 200 AS VARCHAR) "
    "|| chr(10) || 'unique tail ' || CAST(doc_id AS VARCHAR) || ' ' || "
    "substr(text, 1, 24) AS text FROM documents"
)


def _op_distinct_ngrams(sf_dir: str) -> pa.Table:
    """Corpus distinct-n diversity (Li et al. 2016) for n in {1, 2}:
    exact distinct / total gram counts via one gram-disjoint exchange
    per n."""
    from ..ops.diversity import distinct_ngram_ratios

    ds = _read_clean(f"{sf_dir}/documents.parquet")
    return distinct_ngram_ratios(ds, ns=(1, 2))


REGISTRY["op_distinct_ngrams"] = RawQ(
    _op_distinct_ngrams,
    r"WITH toks AS (SELECT doc_id, unnest(regexp_split_to_array("
    r"trim(lower(text)), '\s+')) AS t, generate_subscripts("
    r"regexp_split_to_array(trim(lower(text)), '\s+'), 1) AS pos "
    "FROM documents), "
    "bi AS (SELECT a.t || ' ' || b.t AS g FROM toks a JOIN toks b "
    "ON a.doc_id = b.doc_id AND b.pos = a.pos + 1), "
    "u AS (SELECT 1 AS n, COUNT(DISTINCT t)::BIGINT AS distinct_grams, "
    "COUNT(*)::BIGINT AS total_grams, "
    "ROUND(COUNT(DISTINCT t)::DOUBLE / COUNT(*), 6) AS distinct_ratio "
    "FROM toks), "
    "b2 AS (SELECT 2 AS n, COUNT(DISTINCT g)::BIGINT, COUNT(*)::BIGINT, "
    "ROUND(COUNT(DISTINCT g)::DOUBLE / COUNT(*), 6) FROM bi) "
    "SELECT * FROM u UNION ALL SELECT * FROM b2",
)


def _op_dedup_lines(sf_dir: str) -> pa.Table:
    """Intra-document line dedup (keep first occurrence) over planted
    multi-line pages."""
    from ..ops.lines import dedup_lines

    ds = _read_clean(f"{sf_dir}/documents.parquet")
    planted = ds.map_batches(_lines_plant, batch_format="pyarrow",
                             zero_copy_batch=True)
    return _collect(dedup_lines(planted)).select(["doc_id", "text"])


REGISTRY["op_dedup_lines"] = RawQ(
    _op_dedup_lines,
    f"WITH d AS ({_LINES_PLANT_SQL}), "
    "l AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line, "
    "generate_subscripts(string_split(text, chr(10)), 1) AS pos FROM d), "
    "f AS (SELECT doc_id, line, min(pos) AS pos FROM l "
    "GROUP BY doc_id, line) "
    "SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text "
    "FROM f GROUP BY doc_id",
)


def _op_strip_boilerplate(sf_dir: str) -> pa.Table:
    """Corpus-frequency boilerplate removal (lines in >= 5 distinct
    docs) over the same planted pages: the banner lines and (at
    sf >= 0.01) the cohort lines cross the threshold; the duplicated
    first line is per-doc unique (2 occurrences but 1 distinct doc) so
    BOTH copies survive — pinning distinct-doc (not occurrence)
    counting; unique tails always survive."""
    from ..ops.lines import strip_frequent_lines

    ds = _read_clean(f"{sf_dir}/documents.parquet")
    planted = ds.map_batches(_lines_plant, batch_format="pyarrow",
                             zero_copy_batch=True)
    return _collect(strip_frequent_lines(planted, min_docs=5)).select(
        ["doc_id", "text"])


REGISTRY["op_strip_boilerplate"] = RawQ(
    _op_strip_boilerplate,
    f"WITH d AS ({_LINES_PLANT_SQL}), "
    "l AS (SELECT doc_id, unnest(string_split(text, chr(10))) AS line, "
    "generate_subscripts(string_split(text, chr(10)), 1) AS pos FROM d), "
    "freq AS (SELECT line FROM (SELECT line, COUNT(DISTINCT doc_id) "
    "AS c FROM l GROUP BY line) WHERE c >= 5), "
    "k AS (SELECT doc_id, line, pos FROM l "
    "WHERE line NOT IN (SELECT line FROM freq)) "
    "SELECT d.doc_id, COALESCE(a.text, '') AS text FROM d LEFT JOIN "
    "(SELECT doc_id, string_agg(line, chr(10) ORDER BY pos) AS text "
    "FROM k GROUP BY doc_id) a ON d.doc_id = a.doc_id",
)


def _streaming_sample(sf_dir: str) -> pa.Table:
    """Uniform distinct-key sample on ingest: documents replayed as 8
    micro-batch files through StreamingSampleJob (bottom-k by md5 key
    hash); the merged sample is a pure function of the distinct-key
    set, so it must equal the bounded ORDER BY hash LIMIT k cut."""
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from ..streaming.sample import StreamingSampleJob

    tbl = pq.read_table(f"{sf_dir}/documents.parquet",
                        columns=["doc_id"])
    n = tbl.num_rows
    fdir = tempfile.mkdtemp(prefix="ksql_ray_ssamp_in_")
    try:
        files = []
        for i in range(8):
            s = tbl.slice(i * n // 8, (i + 1) * n // 8 - i * n // 8)
            p = os.path.join(fdir, f"b{i:02d}.parquet")
            pq.write_table(s, p)
            files.append(p)
        job = StreamingSampleJob(key_col="doc_id", k=40, method="md5",
                                 num_partitions=4)
        job.run(files, files_per_epoch=2)
        m = job.finish()
        assert m["rows_in"] == n and m["sample_rows"] == 40, m
        return job.sample()
    finally:
        shutil.rmtree(fdir, ignore_errors=True)


REGISTRY["streaming_sample"] = RawQ(
    _streaming_sample,
    # bottom-k by the repo-wide md5 sampling contract
    # (ops/sample.add_sample_hash): int64 of the first 8 md5 hex chars
    # of str(key); ties (none at 32 bits / 5k keys) break by key asc
    "SELECT key, h FROM ("
    "  SELECT DISTINCT doc_id::VARCHAR AS key,"
    "         (('0x' || substr(md5(doc_id::VARCHAR), 1, 8))::UBIGINT)"
    "           ::BIGINT AS h"
    "  FROM documents) "
    "ORDER BY h, key LIMIT 40",
)


def _op_nb_scores(sf_dir: str) -> pa.Table:
    from ..ops.nbayes import score_nb, train_nb

    ds = _read_clean(f"{sf_dir}/documents.parquet")
    model = train_nb(ds, "text", "lang", alpha=0.5)
    t = _collect(score_nb(ds, model))
    return _round_cols(t, {"score": 4})


# add-alpha multinomial NB (ops/nbayes.py docstring spells out the
# contract); trained on the scored corpus itself, so the vocabulary is
# closed and no OOV branch is exercised on either side
_NB_SQL_BODY = r"""
WITH toks AS (
  SELECT doc_id, lang,
         unnest(regexp_split_to_array(trim(lower(text)), '\s+')) AS tok
  FROM documents
), v AS (SELECT count(DISTINCT tok) AS vs FROM toks),
cls AS (SELECT lang AS label, count(*) AS nd,
               sum(len(regexp_split_to_array(trim(lower(text)), '\s+'))) AS nt
        FROM documents GROUP BY 1),
pri AS (SELECT label, ln(nd / (SELECT sum(nd) FROM cls)) AS lpri, nt
        FROM cls),
tc AS (SELECT lang AS label, tok, count(*) AS c FROM toks GROUP BY 1, 2),
sc AS (
  SELECT t.doc_id, p.label,
         sum(ln((coalesce(tc.c, 0) + 0.5) / (p.nt + 0.5 * v.vs)))
           + any_value(p.lpri) AS score
  FROM toks t CROSS JOIN pri p CROSS JOIN v
  LEFT JOIN tc ON tc.label = p.label AND tc.tok = t.tok
  GROUP BY 1, 2)
"""

REGISTRY["op_nb_scores"] = RawQ(
    _op_nb_scores,
    _NB_SQL_BODY
    + "SELECT doc_id, label, ROUND(score, 4) AS score FROM sc",
)


def _op_nb_classify(sf_dir: str) -> pa.Table:
    from ..ops.nbayes import classify_nb, train_nb

    ds = _read_clean(f"{sf_dir}/documents.parquet")
    model = train_nb(ds, "text", "lang", alpha=0.5)
    t = _collect(classify_nb(ds, model))
    return _round_cols(t, {"score": 4})


REGISTRY["op_nb_classify"] = RawQ(
    _op_nb_classify,
    # argmax with ties by ascending label; class priors differ (doc
    # counts per lang are distinct at every sf), so the winning margin
    # is far above the ~1e-11 engine-vs-SQL summation noise
    _NB_SQL_BODY
    + "SELECT doc_id, pred, ROUND(score, 4) AS score FROM ("
    "  SELECT doc_id, label AS pred, score, ROW_NUMBER() OVER ("
    "    PARTITION BY doc_id ORDER BY score DESC, label) AS rn FROM sc) "
    "WHERE rn = 1",
)


def _op_conv_stats(sf_dir: str) -> pa.Table:
    from ..ops.transcripts import conversation_stats

    ds = _read_clean(f"{sf_dir}/events.parquet")
    t = _collect(conversation_stats(
        ds, ["user_id"], ts_col="ts", text_col="props",
        role_col="event_type", roles=("click", "error"), tool_col=None))
    t = t.select(["user_id", "n_turns", "n_click", "n_error",
                  "total_chars", "first_ts", "last_ts", "duration_s",
                  "avg_chars"])
    return _round_cols(t, {"duration_s": 4, "avg_chars": 4})


REGISTRY["op_conv_stats"] = RawQ(
    _op_conv_stats,
    # conversation triage metrics (ops/transcripts.py conversation_stats):
    # pure-combiner grouped projection — counts, role mix, text volume,
    # time span — one row per conversation key
    "SELECT user_id, count(*)::BIGINT AS n_turns,"
    "  count(*) FILTER (event_type = 'click')::BIGINT AS n_click,"
    "  count(*) FILTER (event_type = 'error')::BIGINT AS n_error,"
    "  sum(length(coalesce(props, '')))::BIGINT AS total_chars,"
    "  min(ts) AS first_ts, max(ts) AS last_ts,"
    "  ROUND(epoch_us(max(ts) - min(ts)) / 1000000.0, 4) AS duration_s,"
    "  ROUND(sum(length(coalesce(props, ''))) / count(*)::DOUBLE, 4)"
    "    AS avg_chars "
    "FROM events GROUP BY user_id",
)


def _op_zipf_stats(sf_dir: str) -> pa.Table:
    from ..ops.terms import corpus_zipf_stats

    ds = _read_clean(f"{sf_dir}/documents.parquet")
    return _round_cols(_collect(corpus_zipf_stats(ds, k=10)),
                       {"top_mass": 6})


REGISTRY["op_zipf_stats"] = RawQ(
    _op_zipf_stats,
    # corpus vocabulary shape (ops/terms.py corpus_zipf_stats): distinct
    # terms, token total, hapax tail, top-10 head mass — one row
    r"""
WITH toks AS (SELECT unnest(regexp_split_to_array(trim(lower(text)),
                                                  '\s+')) AS term
              FROM documents),
c AS (SELECT term, count(*) AS cnt FROM toks GROUP BY term),
t AS (SELECT count(*)::BIGINT AS vocab_size, sum(cnt)::BIGINT AS total_tokens,
             count(*) FILTER (cnt = 1)::BIGINT AS hapax_cnt FROM c),
top AS (SELECT sum(cnt)::DOUBLE AS mass
        FROM (SELECT cnt FROM c ORDER BY cnt DESC, term LIMIT 10))
SELECT vocab_size, total_tokens, hapax_cnt,
       ROUND(mass / total_tokens, 6) AS top_mass FROM t, top""",
)


def _op_mad_outliers(sf_dir: str) -> pa.Table:
    from ..ops.profile import mad_outliers

    ds = _read_clean(f"{sf_dir}/events.parquet")
    t = _collect(mad_outliers(ds, "event_type", "value", c=1.5))
    t = t.select(["event_id", "event_type", "med", "mad", "is_outlier"])
    return _round_cols(t, {"med": 4, "mad": 4})


REGISTRY["op_mad_outliers"] = RawQ(
    _op_mad_outliers,
    # robust per-key outlier flags (ops/profile.py mad_outliers):
    # |x - median| > c*MAD; the engine's interpolated median uses
    # DuckDB's own quantile_cont formula so med/mad are bit-exact
    "WITH med AS (SELECT event_type, median(value) AS med"
    "             FROM events GROUP BY 1),"
    "dev AS (SELECT e.event_type, median(abs(e.value - m.med)) AS mad"
    "        FROM events e JOIN med m USING (event_type) GROUP BY 1) "
    "SELECT e.event_id, e.event_type, ROUND(m.med, 4) AS med,"
    "  ROUND(d.mad, 4) AS mad,"
    "  (abs(e.value - m.med) > 1.5 * d.mad) AS is_outlier "
    "FROM events e JOIN med m USING (event_type)"
    " JOIN dev d USING (event_type)",
)


def _streaming_session_export(sf_dir: str) -> pa.Table:
    """Session-close conversation export — the transcript flagship made
    continuous: when the watermark closes a session window, its turns
    are emitted as ONE assembled 'role: text' training document in
    stable (ts, event_id) order. Pure composition: Session window +
    ordered CollectList (streaming/accumulators.py _CollectListAcc
    sorts merged partials by the catalog's offset-order tuple), doc
    join vectorized post-emit. This is the north star's per-turn
    text-equality invariant exercised inside a streaming window."""
    def b():
        return (Select(F("user_id"),
                       CollectList(F("event_type")).As("roles"),
                       CollectList(F("props")).As("texts"),
                       Count(F("event_id")).As("n_turns"))
                .From(Schema("events")).GroupBy(F("user_id"))
                .Windowed(Session(30, MINUTES)).EmitFinal())

    t = _stream_events(sf_dir, b, "sexp")

    def join_docs(tbl: pa.Table) -> pa.Table:
        roles = tbl.column("roles")
        texts = tbl.column("texts")
        if isinstance(roles, pa.ChunkedArray):
            roles = roles.combine_chunks()
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        lines = pc.binary_join_element_wise(
            pc.cast(roles.values, pa.string()),
            pc.cast(texts.values, pa.string()), ": ")
        docs = pc.binary_join(
            pa.ListArray.from_arrays(texts.offsets, lines), chr(10))
        out = tbl.drop_columns(["roles", "texts"])
        return out.append_column("doc", docs)

    return join_docs(t)


REGISTRY["streaming_session_export"] = RawQ(
    _streaming_session_export,
    f"""WITH flagged AS (
      SELECT user_id, event_id, event_type, props, ts,
             CASE WHEN lag(ts) OVER w IS NULL
                  OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {GAP_US}
                  THEN 1 ELSE 0 END AS new_sess
      FROM events WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
    ), sessions AS (
      SELECT *, sum(new_sess) OVER (PARTITION BY user_id ORDER BY ts, event_id
                                    ROWS UNBOUNDED PRECEDING) AS sess_id
      FROM flagged)
    SELECT min(ts) AS window_start, max(ts) AS window_end, user_id,
           count(event_id) AS n_turns,
           string_agg(event_type || ': ' || props, chr(10)
                      ORDER BY ts, event_id) AS doc
    FROM sessions GROUP BY user_id, sess_id""",
)


def _op_source_overlap(sf_dir: str) -> pa.Table:
    """Cross-source duplication matrix over documents plus planted
    duplicates: every 7th doc mirrored into a synthetic 'mirror' source
    (cross-source overlap) and every 13th doc copied within its own
    source (diagonal intra-source dups) — the fixture corpus itself has
    no exact duplicates, so the plant is what the op must find."""
    from ..ops.dedup import source_overlap

    docs = _read_clean(f"{sf_dir}/documents.parquet").select_columns(
        ["doc_id", "text", "source"])

    def plant(batch: pa.Table) -> pa.Table:
        ids = batch.column("doc_id")
        text = pc.cast(batch.column("text"), pa.string())
        src = pc.cast(batch.column("source"), pa.string())
        base = pa.table({"text": text, "source": src})
        m7 = pc.equal(pc.subtract(ids, pc.multiply(
            pc.divide(ids, 7), 7)), 0)
        cp7 = pa.table({
            "text": text.filter(m7),
            # typed literal: zero-row planted batches must not become
            # null-typed (round-3 verdict harness lesson)
            "source": pa.array(
                ["mirror"] * pc.sum(pc.cast(m7, pa.int64())).as_py(),
                type=pa.string())})
        m13 = pc.equal(pc.subtract(ids, pc.multiply(
            pc.divide(ids, 13), 13)), 0)
        cp13 = pa.table({"text": text.filter(m13),
                         "source": src.filter(m13)})
        return pa.concat_tables([base, cp7, cp13])

    corpus = docs.map_batches(plant, batch_format="pyarrow",
                              zero_copy_batch=True)
    return _collect(source_overlap(corpus))


REGISTRY["op_source_overlap"] = RawQ(
    _op_source_overlap,
    # provenance diagnostic (ops/dedup.py source_overlap): per source
    # pair, # of duplicate-content groups shared (diagonal = intra-
    # source dups); plant mirrors every 7th doc cross-source and
    # copies every 13th within-source
    """
WITH corpus AS (
  SELECT text, source FROM documents
  UNION ALL SELECT text, 'mirror' FROM documents WHERE doc_id % 7 = 0
  UNION ALL SELECT text, source FROM documents WHERE doc_id % 13 = 0
), f AS (SELECT md5(text) AS h, source, count(*) AS c
         FROM corpus GROUP BY 1, 2),
pairs AS (
  SELECT a.source AS source_a, b.source AS source_b
  FROM f a JOIN f b ON a.h = b.h AND a.source < b.source
  UNION ALL SELECT source, source FROM f WHERE c >= 2)
SELECT source_a, source_b, count(*)::BIGINT AS n_groups
FROM pairs GROUP BY 1, 2""",
)


def _op_hard_negatives(sf_dir: str) -> pa.Table:
    from ..ops.ann import mine_hard_negatives

    ds = _read_clean(f"{sf_dir}/embeddings.parquet")
    return _collect(mine_hard_negatives(ds, k=5))


REGISTRY["op_hard_negatives"] = RawQ(
    _op_hard_negatives,
    # contrastive hard-negative mining (ops/ann.py mine_hard_negatives):
    # per anchor, the 5 nearest-by-cosine vectors with a DIFFERENT label
    """SELECT a.vec_id AS anchor_id, e.vec_id AS neg_id,
       row_number() OVER (
         PARTITION BY a.vec_id
         ORDER BY list_inner_product(a.embedding, e.embedding) /
                  (sqrt(list_sum(list_transform(a.embedding, x -> x*x))) *
                   sqrt(list_sum(list_transform(e.embedding, x -> x*x))))
                  DESC, e.vec_id) AS rank
FROM embeddings a JOIN embeddings e
  ON e.vec_id != a.vec_id AND e.label != a.label
QUALIFY rank <= 5""",
)


_THROTTLE_US = 6 * HOUR_US


def _op_throttle(sf_dir: str) -> pa.Table:
    from ..ops.rows import throttle

    ds = _read_clean(f"{sf_dir}/events.parquet")
    t = _collect(throttle(ds, ["user_id"], "ts", _THROTTLE_US,
                          tiebreak="event_id"))
    return t.select(["user_id", "event_id", "ts", "event_type"])


REGISTRY["op_throttle"] = RawQ(
    _op_throttle,
    # chained per-key debounce (ops/rows.py throttle mode='chain'):
    # emit first row, then repeatedly the first row >= prev emission +
    # 6h — stateful chain, hence the recursive-CTE oracle
    f"""
WITH RECURSIVE ev AS (
  SELECT user_id, epoch_us(ts) AS tus, event_id, ts, event_type
  FROM events WHERE ts IS NOT NULL),
chain AS (
  SELECT user_id, tus, event_id, ts, event_type FROM (
    SELECT *, row_number() OVER (PARTITION BY user_id
                                 ORDER BY tus, event_id) AS rn
    FROM ev) WHERE rn = 1
  UNION ALL
  SELECT e.user_id, e.tus, e.event_id, e.ts, e.event_type
  FROM chain c JOIN ev e
    ON e.user_id = c.user_id AND e.tus >= c.tus + {_THROTTLE_US}
  WHERE NOT EXISTS (
    SELECT 1 FROM ev e2 WHERE e2.user_id = c.user_id
      AND e2.tus >= c.tus + {_THROTTLE_US}
      AND (e2.tus < e.tus
           OR (e2.tus = e.tus AND e2.event_id < e.event_id))))
SELECT user_id, event_id, ts, event_type FROM chain""",
)


def _op_throttle_bucket(sf_dir: str) -> pa.Table:
    from ..ops.rows import throttle

    ds = _read_clean(f"{sf_dir}/events.parquet")
    t = _collect(throttle(ds, ["user_id"], "ts", _THROTTLE_US,
                          tiebreak="event_id", mode="bucket"))
    return t.select(["user_id", "event_id", "ts", "event_type"])


REGISTRY["op_throttle_bucket"] = RawQ(
    _op_throttle_bucket,
    # grid-cell rate limit (mode='bucket'): first row per (key,
    # floor(ts/6h)) — the stateless coarse variant
    f"""
SELECT user_id, event_id, ts, event_type FROM (
  SELECT *, row_number() OVER (
    PARTITION BY user_id, epoch_us(ts) // {_THROTTLE_US}
    ORDER BY epoch_us(ts), event_id) AS rn
  FROM events WHERE ts IS NOT NULL) WHERE rn = 1""",
)


def _streaming_throttle(sf_dir: str) -> pa.Table:
    """Debounce-on-ingest: events replayed ts-ordered as 8 micro-batch
    files through StreamingThrottleJob (per-key last-emission state,
    md5 key fingerprints); with ts-ordered arrival the emitted set
    equals the bounded chain-throttle recursive-CTE oracle."""
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from ..streaming.throttle import StreamingThrottleJob

    tbl = pq.read_table(f"{sf_dir}/events.parquet")
    tbl = tbl.take(pc.sort_indices(tbl, sort_keys=[
        ("ts", "ascending"), ("event_id", "ascending")]))
    n = tbl.num_rows
    fdir = tempfile.mkdtemp(prefix="ksql_ray_sthr_in_")
    out = tempfile.mkdtemp(prefix="ksql_ray_sthr_out_")
    try:
        files = []
        for i in range(8):
            s = tbl.slice(i * n // 8, (i + 1) * n // 8 - i * n // 8)
            p = os.path.join(fdir, f"b{i:02d}.parquet")
            pq.write_table(s, p)
            files.append(p)
        job = StreamingThrottleJob(
            out, key_cols=["user_id"], ts_col="ts",
            interval_us=_THROTTLE_US, method="md5", num_partitions=4)
        job.run(files, files_per_epoch=2)
        t = job.result()
        return t.select(["user_id", "event_id", "ts", "event_type"])
    finally:
        shutil.rmtree(fdir, ignore_errors=True)
        shutil.rmtree(out, ignore_errors=True)


REGISTRY["streaming_throttle"] = RawQ(
    _streaming_throttle, REGISTRY["op_throttle"].sql)


def _op_readability(sf_dir: str) -> pa.Table:
    from ..ops.quality import add_readability

    ds = _read_clean(f"{sf_dir}/documents.parquet").select_columns(
        ["doc_id", "text"])
    t = _collect(ds.map_batches(add_readability, batch_format="pyarrow",
                                zero_copy_batch=True))
    return t.select(["doc_id", "flesch"])


REGISTRY["op_readability"] = RawQ(
    _op_readability,
    # Flesch reading ease (ops/quality.py add_readability): vowel-run
    # syllables (floor 1/word), [.!?]+ sentence runs, 4dp both sides
    r"""
WITH t AS (SELECT doc_id, trim(lower(text)) AS lt FROM documents),
w AS (SELECT doc_id, lt, regexp_split_to_array(lt, '\s+') AS toks FROM t),
syl AS (
  SELECT doc_id, len(toks)::DOUBLE AS words,
    greatest(len(regexp_extract_all(lt, '[.!?]+')), 1)::DOUBLE
      AS sentences,
    (len(regexp_extract_all(lt, '[aeiouy]+'))
     + len(list_filter(toks, x -> NOT regexp_matches(x, '[aeiouy]'))))
      ::DOUBLE AS syllables
  FROM w)
SELECT doc_id, ROUND(206.835 - 1.015 * (words / sentences)
                     - 84.6 * (syllables / words), 4) AS flesch
FROM syl""",
)


def _op_grouping_sets(sf_dir: str) -> pa.Table:
    from ..ops.cube import grouping_sets_agg

    ds = _read_clean(f"{sf_dir}/events.parquet").select_columns(
        ["event_type", "user_id", "value"])
    t = _collect(grouping_sets_agg(
        ds, ["event_type", "user_id"],
        [("event_type", "user_id"), ("event_type",), ()], "value"))
    return _round_cols(t, {"sum_v": 4})


REGISTRY["op_grouping_sets"] = RawQ(
    _op_grouping_sets,
    # arbitrary grouping-set family (ops/cube.py grouping_sets_agg):
    # the non-CUBE subset list SQL GROUPING SETS expresses directly
    "SELECT event_type, user_id, ROUND(SUM(value), 4) AS sum_v, "
    "COUNT(value)::BIGINT AS cnt_v FROM events "
    "GROUP BY GROUPING SETS ((event_type, user_id), (event_type), ())",
)


def _op_validate(sf_dir: str) -> pa.Table:
    """Data-contract validation over events plus planted violations:
    every 13th row re-emitted with NULL props / shifted-back ts /
    out-of-range value / out-of-set+regex-breaking event_type (new
    event_id so the lag order stays tie-free), every 17th row
    re-emitted with its props duplicated (uniqueness)."""
    from ..ops.validate import validate_rules

    ds = _read_clean(f"{sf_dir}/events.parquet")

    def plant(batch: pa.Table) -> pa.Table:
        ids = batch.column("event_id")

        def mod(n):
            return pc.equal(pc.subtract(
                ids, pc.multiply(pc.divide(ids, n), n)), 0)

        a = batch.filter(mod(13))
        na = a.num_rows
        a = pa.table({
            "event_id": pc.add(a.column("event_id"), 1_000_000),
            "ts": pc.subtract(
                a.column("ts"),
                pa.scalar(7_200_000_000, pa.duration("us"))),
            "user_id": a.column("user_id"),
            "event_type": pa.array(["MIXED!"] * na, type=pa.string()),
            "value": pc.add(a.column("value"), 1000.0),
            "props": pa.nulls(na, pa.string()),
        })
        b = batch.filter(mod(17))
        b = pa.table({
            "event_id": pc.add(b.column("event_id"), 2_000_000),
            "ts": b.column("ts"),
            "user_id": b.column("user_id"),
            "event_type": pc.cast(b.column("event_type"), pa.string()),
            "value": b.column("value"),
            "props": pc.cast(b.column("props"), pa.string()),
        })
        base = pa.table({c: (pc.cast(batch.column(c), pa.string())
                             if c in ("event_type", "props")
                             else batch.column(c))
                         for c in ["event_id", "ts", "user_id",
                                   "event_type", "value", "props"]})
        return pa.concat_tables([base, a, b])

    corpus = ds.map_batches(plant, batch_format="pyarrow",
                            zero_copy_batch=True)
    return _collect(validate_rules(corpus, [
        ("not_null", "props"),
        ("unique", "props"),
        ("in_set", "event_type",
         ["click", "view", "purchase", "signup", "error"]),
        ("range", "value", 0.0, 100.0),
        ("regex", "event_type", "[a-z]+"),
        ("increasing_by", "ts", "user_id", "event_id"),
    ]))


REGISTRY["op_validate"] = RawQ(
    _op_validate,
    # declarative contract checks (ops/validate.py): violation counts
    # per rule over the planted corpus; one counter pass + one value
    # exchange (unique) + one (key, order) exchange (monotone ts)
    """
WITH corpus AS (
  SELECT event_id, ts, user_id, event_type, value, props FROM events
  UNION ALL
  SELECT event_id + 1000000, ts - INTERVAL 2 HOUR, user_id, 'MIXED!',
         value + 1000.0, NULL
  FROM events WHERE event_id % 13 = 0
  UNION ALL
  SELECT event_id + 2000000, ts, user_id, event_type, value, props
  FROM events WHERE event_id % 17 = 0)
SELECT 'not_null(props)' AS rule,
       count(*) FILTER (props IS NULL)::BIGINT AS violations
FROM corpus
UNION ALL SELECT 'unique(props)',
  (count(props) - count(DISTINCT props))::BIGINT FROM corpus
UNION ALL SELECT 'in_set(event_type)',
  count(*) FILTER (event_type IS NOT NULL AND event_type NOT IN
    ('click', 'view', 'purchase', 'signup', 'error'))::BIGINT
  FROM corpus
UNION ALL SELECT 'range(value)',
  count(*) FILTER (value < 0.0 OR value > 100.0)::BIGINT FROM corpus
UNION ALL SELECT 'regex(event_type)',
  count(*) FILTER (event_type IS NOT NULL AND NOT
    regexp_matches(event_type, '^(?:[a-z]+)$'))::BIGINT FROM corpus
UNION ALL SELECT 'increasing_by(ts)', count(*)::BIGINT FROM (
  SELECT ts, lag(ts) OVER (PARTITION BY user_id ORDER BY event_id)
         AS p FROM corpus) WHERE ts < p""",
)


def _source_json_format(sf_dir: str) -> pa.Table:
    """VALUE_FORMAT=JSON ingestion under the oracle: the events table
    exported as JSONL, registered as a JSON-format relation
    (exec/bounded.py WITH-analog dispatch -> ray.data.read_json), and
    aggregated — results must equal the same SQL over the original
    parquet."""
    import json
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from ..catalog import Catalog, Ref, Relation

    tbl = pq.read_table(f"{sf_dir}/events.parquet",
                        columns=["user_id", "event_type", "value"])
    d = tempfile.mkdtemp(prefix="ksql_ray_jsonl_")
    try:
        path = os.path.join(d, "events.jsonl")
        with open(path, "w") as f:
            for r in tbl.to_pylist():
                f.write(json.dumps(r) + "\n")
        cat = Catalog()
        cat.create(Relation(
            "events_j", Ref.TABLE,
            pa.schema([("user_id", pa.int64()),
                       ("event_type", pa.string()),
                       ("value", pa.float64())]),
            path=path, properties={"value_format": "JSON"}))
        eng = Engine(cat)
        t = eng.table(
            Select(F("user_id"), F("event_type"),
                   Count(F("value")).As("c"),
                   Sum(F("value")).As("sv"))
            .From(Schema("events_j"))
            .GroupBy(F("user_id"), F("event_type")))
        return _round_cols(t, {"sv": 4})
    finally:
        shutil.rmtree(d, ignore_errors=True)


REGISTRY["source_json_format"] = RawQ(
    _source_json_format,
    "SELECT user_id, event_type, count(value) AS c,"
    " ROUND(sum(value), 4) AS sv "
    "FROM events GROUP BY user_id, event_type",
)


def _source_arrow_format(sf_dir: str) -> pa.Table:
    """VALUE_FORMAT=ARROW ingestion (round 5): the events table
    exported as 4 Arrow IPC files, registered as an ARROW-format
    relation (exec/bounded.py dispatch -> distributed per-file IPC
    decode over read_binary_files), and aggregated — results must
    equal the same SQL over the original parquet."""
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from ..catalog import Catalog, Ref, Relation

    tbl = pq.read_table(f"{sf_dir}/events.parquet",
                        columns=["user_id", "event_type", "value"])
    tbl = tbl.replace_schema_metadata(None)
    d = tempfile.mkdtemp(prefix="ksql_ray_ipc_")
    try:
        n = tbl.num_rows
        for i in range(4):
            s = tbl.slice(i * n // 4, (i + 1) * n // 4 - i * n // 4)
            with pa.ipc.new_file(os.path.join(d, f"e{i}.arrow"),
                                 s.schema) as w:
                w.write_table(s)
        cat = Catalog()
        cat.create(Relation(
            "events_a", Ref.TABLE,
            pa.schema([("user_id", pa.int64()),
                       ("event_type", pa.string()),
                       ("value", pa.float64())]),
            path=d, properties={"value_format": "ARROW"}))
        eng = Engine(cat)
        t = eng.table(
            Select(F("user_id"), F("event_type"),
                   Count(F("value")).As("c"),
                   Sum(F("value")).As("sv"))
            .From(Schema("events_a"))
            .GroupBy(F("user_id"), F("event_type")))
        return _round_cols(t, {"sv": 4})
    finally:
        shutil.rmtree(d, ignore_errors=True)


REGISTRY["source_arrow_format"] = RawQ(
    _source_arrow_format,
    "SELECT user_id, event_type, count(value) AS c,"
    " ROUND(sum(value), 4) AS sv "
    "FROM events GROUP BY user_id, event_type",
)


def _op_auto_quality(sf_dir: str) -> pa.Table:
    from ..ops.quality import auto_quality_filter

    ds = _read_clean(f"{sf_dir}/events.parquet").select_columns(
        ["event_id", "user_id", "value"])
    out, _ = auto_quality_filter(
        ds, keep={"value": 0.3, "user_id": 0.4},
        lower_better=("user_id",))
    t = _collect(out)
    return _round_cols(t, {"value": 4})


REGISTRY["op_auto_quality"] = RawQ(
    _op_auto_quality,
    # percentile-calibrated filtering (ops/quality.py
    # auto_quality_filter): thresholds are the corpus's own
    # quantile_disc cuts — top 30% by value AND bottom 40% by user_id
    "WITH thr AS (SELECT quantile_disc(value, 0.7) AS tv,"
    "                    quantile_disc(user_id, 0.4) AS tu FROM events)"
    " SELECT event_id, user_id, ROUND(value, 4) AS value"
    " FROM events, thr WHERE value >= tv AND user_id <= tu",
)


def _source_csv_format(sf_dir: str) -> pa.Table:
    """VALUE_FORMAT=CSV ingestion under the oracle (the WITH-analog
    dispatch -> ray.data.read_csv), same aggregate/oracle as the JSON
    source gate."""
    import csv
    import os
    import shutil
    import tempfile

    import pyarrow.parquet as pq

    from ..catalog import Catalog, Ref, Relation

    tbl = pq.read_table(f"{sf_dir}/events.parquet",
                        columns=["user_id", "event_type", "value"])
    d = tempfile.mkdtemp(prefix="ksql_ray_csv_")
    try:
        path = os.path.join(d, "events.csv")
        with open(path, "w", newline="") as f:
            w = csv.writer(f)
            w.writerow(["user_id", "event_type", "value"])
            for r in tbl.to_pylist():
                w.writerow([r["user_id"], r["event_type"], r["value"]])
        cat = Catalog()
        cat.create(Relation(
            "events_c", Ref.TABLE,
            pa.schema([("user_id", pa.int64()),
                       ("event_type", pa.string()),
                       ("value", pa.float64())]),
            path=path, properties={"value_format": "CSV"}))
        eng = Engine(cat)
        t = eng.table(
            Select(F("user_id"), F("event_type"),
                   Count(F("value")).As("c"),
                   Sum(F("value")).As("sv"))
            .From(Schema("events_c"))
            .GroupBy(F("user_id"), F("event_type")))
        return _round_cols(t, {"sv": 4})
    finally:
        shutil.rmtree(d, ignore_errors=True)


REGISTRY["source_csv_format"] = RawQ(
    _source_csv_format, REGISTRY["source_json_format"].sql)


def _op_session_stats(sf_dir: str) -> pa.Table:
    from ..ops.rows import session_stats

    ds = _read_clean(f"{sf_dir}/events.parquet")
    t = _collect(session_stats(ds, ["user_id"], "ts", GAP_US,
                               tiebreak="event_id"))
    return _round_cols(t, {"avg_events": 6, "bounce_rate": 6,
                           "avg_duration_s": 6})


REGISTRY["op_session_stats"] = RawQ(
    _op_session_stats,
    # corpus session analytics (ops/rows.py session_stats): session
    # rule == sessionize (gap > 30min); four counters per partition,
    # one merge
    f"""WITH flagged AS (
  SELECT user_id, event_id, ts,
         CASE WHEN lag(ts) OVER w IS NULL
              OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {GAP_US}
              THEN 1 ELSE 0 END AS new_sess
  FROM events WHERE ts IS NOT NULL
  WINDOW w AS (PARTITION BY user_id ORDER BY ts, event_id)
), sessions AS (
  SELECT *, sum(new_sess) OVER (PARTITION BY user_id
              ORDER BY ts, event_id ROWS UNBOUNDED PRECEDING) AS sess_id
  FROM flagged
), per AS (
  SELECT user_id, sess_id, count(*) AS n,
         epoch_us(max(ts) - min(ts)) AS dur
  FROM sessions GROUP BY 1, 2)
SELECT count(*)::BIGINT AS n_sessions, sum(n)::BIGINT AS n_events,
  ROUND(sum(n) / count(*)::DOUBLE, 6) AS avg_events,
  ROUND(count(*) FILTER (n = 1) / count(*)::DOUBLE, 6) AS bounce_rate,
  ROUND(sum(dur) / count(*)::DOUBLE / 1000000.0, 6) AS avg_duration_s
FROM per""",
)


def _op_sq8_encode(sf_dir: str) -> pa.Table:
    """SQ8 scalar quantization (ops/pq.py sq8_*): per-dim affine uint8
    grid; the packed d-byte codes are unpacked to (vec_id, dim, code)
    rows for the oracle compare."""
    import numpy as np

    from ..ops.pq import sq8_encode, sq8_train

    ds = _read_clean(f"{sf_dir}/embeddings.parquet")
    lo, hi = sq8_train(ds)
    codes = _collect(sq8_encode(ds, lo, hi))
    d = len(lo)
    col = codes.column("code").combine_chunks()
    raw = np.frombuffer(col.buffers()[1], dtype=np.uint8,
                        count=codes.num_rows * d,
                        offset=col.offset * d).reshape(codes.num_rows, d)
    ids = codes.column("vec_id").to_numpy(zero_copy_only=False)
    return pa.table({
        "vec_id": pa.array(np.repeat(ids, d), type=pa.int64()),
        "dim": pa.array(np.tile(np.arange(1, d + 1, dtype=np.int64),
                                codes.num_rows)),
        "code": pa.array(raw.reshape(-1).astype(np.int64)),
    })


REGISTRY["op_sq8_encode"] = RawQ(
    _op_sq8_encode,
    # per-dim bounds + floor(x*255/span + 0.5) affine grid, ::DOUBLE
    # casts match the engine's float64 arithmetic bit-for-bit
    """
WITH s AS (
  SELECT vec_id, generate_subscripts(embedding, 1) AS i,
         unnest(embedding) AS x
  FROM embeddings),
b AS (SELECT i, min(x) AS lo, max(x) AS hi FROM s GROUP BY i)
SELECT s.vec_id, s.i::BIGINT AS dim,
  CASE WHEN b.hi = b.lo THEN 0
       ELSE least(255.0, greatest(0.0,
            floor((s.x::DOUBLE - b.lo::DOUBLE) * 255.0
                  / (b.hi::DOUBLE - b.lo::DOUBLE) + 0.5)))
  END::BIGINT AS code
FROM s JOIN b USING (i)""",
)


def _op_weighted_bottomk(sf_dir: str) -> pa.Table:
    from ..ops.sample import weighted_bottom_k

    ds = _read_clean(f"{sf_dir}/events.parquet").select_columns(
        ["event_id", "user_id", "value"])
    t = _collect(weighted_bottom_k(ds, "event_id", "value", k=200))
    return _round_cols(t, {"value": 4})


REGISTRY["op_weighted_bottomk"] = RawQ(
    _op_weighted_bottomk,
    # Efraimidis-Spirakis priority sample (ops/sample.py
    # weighted_bottom_k): u from the md5 key hash, keep top-200 by
    # u^(1/w); value-weighted, non-positive weights excluded
    "SELECT event_id, user_id, ROUND(value, 4) AS value FROM ("
    "  SELECT event_id, user_id, value,"
    "    pow((('0x' || substr(md5(CAST(event_id AS VARCHAR)), 1, 8))"
    "         ::UBIGINT + 0.5) / 4294967296.0, 1.0 / value) AS pr"
    "  FROM events WHERE value > 0)"
    " ORDER BY pr DESC, event_id LIMIT 200",
)


def _op_funnel_rates(sf_dir: str) -> pa.Table:
    from ..expr import F
    from ..ops.cep import funnel_rates

    ds = _read_clean(f"{sf_dir}/events.parquet")
    t = funnel_rates(
        ds, partition_by=["user_id"], order_by="ts",
        steps=[("v", F("event_type").Equal("view")),
               ("c", F("event_type").Equal("click")),
               ("p", F("event_type").Equal("purchase"))],
        within=24 * HOUR_US, tiebreak="event_id")
    return _round_cols(t, {"rate_from_first": 6, "rate_from_prev": 6})


REGISTRY["op_funnel_rates"] = RawQ(
    _op_funnel_rates,
    # funnel conversion table (ops/cep.py funnel_rates): distinct keys
    # reaching each prefix (EXISTS chains; within measured to the
    # prefix end), rates vs first and previous step
    f"""
WITH e AS (SELECT user_id, ts, event_id, event_type FROM events),
s1 AS (SELECT count(DISTINCT user_id) AS n FROM e
       WHERE event_type = 'view'),
s2 AS (SELECT count(DISTINCT v.user_id) AS n
       FROM (SELECT * FROM e WHERE event_type = 'view') v
       WHERE EXISTS (SELECT 1 FROM e c
         WHERE c.user_id = v.user_id AND c.event_type = 'click'
           AND (c.ts > v.ts OR (c.ts = v.ts AND c.event_id > v.event_id))
           AND epoch_us(c.ts) - epoch_us(v.ts) <= {24 * HOUR_US})),
s3 AS (SELECT count(DISTINCT m.user_id) AS n FROM (
       SELECT v.user_id
       FROM (SELECT * FROM e WHERE event_type = 'view') v
       CROSS JOIN LATERAL (
         SELECT x.ts AS c_ts, x.event_id AS c_event_id FROM e x
         WHERE x.user_id = v.user_id AND x.event_type = 'click'
           AND (x.ts > v.ts OR (x.ts = v.ts AND x.event_id > v.event_id))
         ORDER BY x.ts, x.event_id LIMIT 1) c
       CROSS JOIN LATERAL (
         SELECT y.ts AS p_ts FROM e y
         WHERE y.user_id = v.user_id AND y.event_type = 'purchase'
           AND (y.ts > c.c_ts OR (y.ts = c.c_ts
                                  AND y.event_id > c.c_event_id))
         ORDER BY y.ts, y.event_id LIMIT 1) p
       WHERE epoch_us(p.p_ts) - epoch_us(v.ts) <= {24 * HOUR_US}) m)
SELECT * FROM (
  SELECT 'v' AS step, 1::BIGINT AS step_idx, s1.n::BIGINT AS n_keys,
    1.0 AS rate_from_first, NULL::DOUBLE AS rate_from_prev FROM s1
  UNION ALL
  SELECT 'c', 2, s2.n::BIGINT,
    ROUND(s2.n / s1.n::DOUBLE, 6), ROUND(s2.n / s1.n::DOUBLE, 6)
  FROM s1, s2
  UNION ALL
  SELECT 'p', 3, s3.n::BIGINT,
    ROUND(s3.n / s1.n::DOUBLE, 6), ROUND(s3.n / s2.n::DOUBLE, 6)
  FROM s1, s2, s3)""",
)


# ---------------------------------------------------------------------------
# Driver-window rotation (round 5): the graft driver records oracle
# results for only the FIRST ~50 registry entries per round. Rounds 1-3
# recorded 61 distinct gates; reorder so round 4's window covers gates
# that have never had a driver-recorded row — the two harness-fixed
# gates and every streaming job first, then the ADVICE-touched ops,
# then the rest of the round-3 op surface. Definitions above are
# untouched; this only rebuilds dict order (python dicts iterate in
# insertion order, and queries()/oracle_sql() preserve it).
_R5_WINDOW = [
    # --- round 5: the 83 gates with no driver-recorded CORRECTNESS row
    # across r01-r04 go first (VERDICT r4 "What's missing" #1).
    # Streaming jobs lead, then wire formats, then the r4 op surface.
    "streaming_throttle", "streaming_sample", "streaming_session_export",
    "streaming_rescale", "streaming_simjoin", "streaming_cms",
    "streaming_decontam_filter", "streaming_transitions",
    "streaming_anomaly", "streaming_grouped_quantiles", "streaming_prep",
    "source_csv_format", "source_json_format",
    # ops flagged weak / upgraded this round — want fresh driver rows
    "op_funnel_rates", "op_bpe_vocab", "op_bpe_token_count",
    # r4 heavy op surface
    "op_similarity_join", "op_bloom_semi", "op_bloom_anti",
    "op_cms_counters", "op_nb_scores", "op_nb_classify", "op_validate",
    "op_throttle", "op_throttle_bucket", "op_session_stats",
    "op_sq8_encode", "op_weighted_bottomk", "op_auto_quality",
    "op_readability", "op_grouping_sets", "op_mad_outliers",
    "op_source_overlap", "op_hard_negatives", "op_conv_stats",
    "op_zipf_stats", "op_distinct_ngrams", "op_dedup_lines",
    "op_strip_boilerplate", "op_strip_markup", "op_c4_clean",
    "op_ngram_repetition", "op_snapshot_diff", "op_leakage_split",
    "op_dedup_keep_best", "op_dsir_select", "op_normalize_text",
    "op_pca_covariance", "op_pagerank", "op_tfidf",
    # r3s6 relational/window surface (past the ~50-row driver window if
    # unchanged, but keep them ahead of already-recorded gates)
    "op_char_entropy", "op_standardize", "op_cumulative_agg",
    "op_intersect", "op_union", "op_except", "op_semi_join",
    "op_anti_join", "op_bucketize", "op_top_per_key", "op_sessionize",
    "op_with_lead", "op_with_lag", "op_rank_dist", "op_first_last",
    "op_time_range_agg", "op_time_range_distinct", "op_interval_merge",
    "op_gap_fill", "op_fuzzy_pairs", "op_assemble_convs",
    "op_chunk_split", "op_shuffle_shard", "op_quantiles", "op_unnest",
    "op_melt", "op_regex_extract", "op_profile", "op_weighted_sample",
    "op_split_assign", "op_sample_per_key", "op_bottom_k_sample",
    "op_mixture_sample",
]


# gates with a driver-recorded row in CORRECTNESS_r01-r04 — sorted
# AFTER the still-unrecorded ones so a wider driver window always
# lands on fresh gates first
_DRIVER_RECORDED = {
    "agg_basic", "agg_count_distinct", "agg_having_orderby",
    "agg_over_arithmetic", "agg_percentile", "agg_stddev", "arithmetic",
    "case_over_aggregate", "case_when", "collect_list", "collect_set",
    "cte", "ddl_insert_ctas", "ddl_migrations", "filter_project",
    "histogram", "join_compound_on", "join_cross", "join_cross_large",
    "join_inner", "join_left", "join_multi", "join_outer", "join_right",
    "join_then_aggregate", "latest_earliest_by_offset",
    "min_max_strings", "null_checks", "op_ann_topk", "op_asof_join",
    "op_bm25_multi", "op_bm25_topk", "op_cep_absent", "op_cep_funnel",
    "op_cep_strict", "op_chunk_dedup", "op_cluster_sample",
    "op_contamination", "op_corr", "op_cube", "op_dup_clusters",
    "op_embedding_neardup", "op_exact_dedup", "op_frame_sample",
    "op_grouped_hll", "op_grouped_quantiles", "op_histogram_bins",
    "op_hll_distinct", "op_ivf_ann", "op_ivfpq_encode", "op_kmeans",
    "op_lang_quality", "op_lm_score", "op_media_features",
    "op_minhash_dedup", "op_moving_agg", "op_ngram_jaccard",
    "op_pack_shards", "op_pii_scrub", "op_pivot", "op_pq_encode",
    "op_prep_pipeline", "op_quality_filter", "op_range_join",
    "op_rank_per_key", "op_rollup", "op_semdedup", "op_simhash_dedup",
    "op_stratified_sample", "op_text_analysis", "op_top_ngrams",
    "op_top_terms", "op_top_values_per_key", "op_transition_counts",
    "op_window_dedup", "op_winnow_fingerprint", "orderby_multi_desc",
    "streaming_asof", "streaming_cep_absent", "streaming_cep_funnel",
    "streaming_cep_strict", "streaming_dedup", "streaming_embdedup",
    "streaming_emit_changes", "streaming_emit_changes_windowed",
    "streaming_grouped_hll", "streaming_hll", "streaming_join_outer",
    "streaming_join_right", "streaming_neardup", "streaming_percentile",
    "streaming_project_text", "streaming_quantiles",
    "streaming_recovery", "streaming_stddev", "streaming_stream_join",
    "streaming_topk", "streaming_window_hopping",
    "streaming_window_session", "streaming_window_tumbling",
    "sum_over_expression", "topk", "topk_distinct", "where_and_chain",
    "where_not_in", "where_or_in", "window_hopping", "window_session",
    "window_tumbling", "window_tumbling_latest", "windowed_having",
}


def _rotated(reg: dict) -> dict:
    head = [n for n in _R5_WINDOW if n in reg]
    assert len(head) == len(_R5_WINDOW), (
        sorted(set(_R5_WINDOW) - set(reg)))
    rest = sorted((n for n in reg if n not in set(_R5_WINDOW)),
                  key=lambda n: (n in _DRIVER_RECORDED,
                                 list(reg).index(n)))
    return {n: reg[n] for n in head + rest}


REGISTRY = _rotated(REGISTRY)


def queries() -> dict[str, Callable[[str], pa.Table]]:
    return {name: (lambda sf_dir, _q=qq: _q.run(sf_dir)) for name, qq in REGISTRY.items()}


def oracle_sql() -> dict[str, str]:
    return {name: qq.sql for name, qq in REGISTRY.items() if qq.sql}
