"""Driver contract for the graft builder (Ray Data target).

The driver's verify calls ``entry()`` as a smoke check (Ray is already
initialised, local mode), runs each ``queries()[name](sf_dir)`` at
sf=0.01 and compares it against the matching ``oracle_sql()[name]`` via
DuckDB (row-count + schema + order-insensitive value-hash ->
CORRECTNESS_r{N}.json).

Ray is initialised by the driver BEFORE this module is imported: nothing
here (or in ksql_ray) calls ``ray.init()`` / ``ray.shutdown()``.
"""

from __future__ import annotations

from collections.abc import Callable
from typing import Any


def entry() -> Any:
    """Flagship pipeline on /root/testdata/sf0.001: tumbling-window
    aggregate over the `events` stream joined against the `customer`
    table (the windowed-aggregate + stream-table-join shape of
    BASELINE.json's metric), executed as a lazy Ray Data pipeline."""
    from ksql_ray import (
        Avg, Count, Engine, F, HOURS, LatestByOffset, Schema, Select, Sum,
        Tumbling, testdata_catalog,
    )

    cat = testdata_catalog("/root/testdata/sf0.001")
    eng = Engine(cat)
    q = (
        Select(
            F("user_id"),
            F("c_mktsegment"),
            Count(F("event_id")).As("events"),
            Sum(F("value")).As("total_value"),
            Avg(F("value")).As("avg_value"),
            LatestByOffset(F("event_type")).As("last_type"),
        )
        .From(Schema("events"))
        .Join(Schema("customer"), F("events.user_id").Equal(F("customer.c_custkey")))
        .GroupBy(F("user_id"), F("c_mktsegment"))
        .Windowed(Tumbling(1, HOURS))
        .EmitChanges()
    )
    return eng.table(q)


def queries() -> dict[str, Callable[[str], Any]]:
    """One entry per implemented operator/pipeline from SURVEY.md §2."""
    from ksql_ray.pipelines.driver_queries import queries as _queries

    return _queries()


def oracle_sql() -> dict[str, str]:
    """DuckDB-runnable oracles for every SQL-expressible queries() entry."""
    from ksql_ray.pipelines.driver_queries import oracle_sql as _oracle

    return _oracle()
