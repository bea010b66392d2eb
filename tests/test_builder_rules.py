"""Plan-validation rule tests (SURVEY.md §2.8).

One positive + negative case per rule of the reference's selectRuleSet
(ksql/select_builder.go:126-187), same shapes as the negative goldens at
select_builder_test.go:528,630,647.
"""

import pyarrow as pa
import pytest

from ksql_ray import (
    Catalog, Count, F, PlanError, Relation, STREAM, Schema, Select, Sum,
    TABLE, Tumbling, SECONDS,
)
from ksql_ray.catalog import Ref


@pytest.fixture(scope="module")
def cat():
    c = Catalog()
    c.create(
        Relation(
            "s1", Ref.STREAM,
            pa.schema([("k", pa.string()), ("v", pa.int64()), ("ts", pa.timestamp("us"))]),
            timestamp_col="ts", order_cols=["ts"],
        )
    )
    c.create(
        Relation(
            "t1", Ref.TABLE,
            pa.schema([("k", pa.string()), ("v", pa.int64())]),
            primary_key="k",
        )
    )
    return c


def test_rule1_groupby_stream_requires_window_or_emit(cat):
    q = Select(F("k"), Count(F("v")).As("c")).From(Schema("s1")).GroupBy(F("k"))
    with pytest.raises(PlanError, match="WINDOW or EMIT CHANGES"):
        q.validate(cat)
    # window fixes it
    q2 = (
        Select(F("k"), Count(F("v")).As("c"))
        .From(Schema("s1")).GroupBy(F("k"))
        .Windowed(Tumbling(10, SECONDS))
    )
    q2.validate(cat)
    # EMIT CHANGES fixes it
    q3 = (
        Select(F("k"), Count(F("v")).As("c"))
        .From(Schema("s1")).GroupBy(F("k")).EmitChanges()
    )
    q3.validate(cat)


def test_rule2_having_requires_groupby(cat):
    q = Select(F("k")).From(Schema("t1")).Having(Count(F("v")).Greater(1))
    with pytest.raises(PlanError, match="HAVING requires GROUP BY"):
        q.validate(cat)


def test_rule3_aggregate_requires_groupby(cat):
    q = Select(Sum(F("v")).As("s")).From(Schema("t1"))
    with pytest.raises(PlanError, match="GROUP BY"):
        q.validate(cat)


def test_rule4_window_not_on_table(cat):
    q = (
        Select(F("k"), Count(F("v")).As("c"))
        .From(Schema("t1")).GroupBy(F("k"))
        .Windowed(Tumbling(10, SECONDS))
    )
    with pytest.raises(PlanError, match="TABLE"):
        q.validate(cat)


def test_rule5_emit_final_only_tables(cat):
    q = Select(F("k")).From(Schema("s1")).EmitFinal()
    with pytest.raises(PlanError, match="EMIT FINAL"):
        q.validate(cat)
    # windowed stream aggregation (materializes a table) is allowed
    q2 = (
        Select(F("k"), Count(F("v")).As("c"))
        .From(Schema("s1")).GroupBy(F("k"))
        .Windowed(Tumbling(10, SECONDS)).EmitFinal()
    )
    q2.validate(cat)


def test_rule6_emit_final_xor_changes(cat):
    with pytest.raises(PlanError, match="mutually exclusive"):
        Select(F("k")).From(Schema("t1")).EmitFinal().EmitChanges()
    with pytest.raises(PlanError, match="mutually exclusive"):
        Select(F("k")).From(Schema("s1")).EmitChanges().EmitFinal()


def test_rule9_derived_requires_alias(cat):
    q = Select(F("v").Add(1)).From(Schema("t1"))
    with pytest.raises(PlanError, match="alias"):
        q.validate(cat)


def test_rule10_empty_projection():
    with pytest.raises(PlanError, match="empty projection"):
        Select()


def test_rule10_missing_from(cat):
    with pytest.raises(PlanError, match="FROM"):
        Select(F("k")).validate(cat)


def test_topic_not_selectable(cat):
    cat.create(Relation("top1", Ref.TOPIC, pa.schema([("x", pa.int64())])), if_not_exists=True)
    with pytest.raises(PlanError, match="TOPIC"):
        Select(F("x")).From(Schema("top1")).validate(cat)


def test_returns_schema(cat):
    q = (
        Select(F("k"), Sum(F("v")).As("total"), F("v").Add(1).As("v1"))
        .From(Schema("s1")).GroupBy(F("k")).Windowed(Tumbling(10, SECONDS))
    )
    sch = q.returns(cat)
    assert sch.names == ["window_start", "window_end", "k", "total", "v1"]
    assert sch.field("total").type == pa.int64()
    assert sch.field("v1").type == pa.int64()
    assert sch.field("window_start").type == pa.timestamp("us")


def test_cte_single_only(cat):
    inner = Select(F("k"), F("v")).From(Schema("t1")).As("c1")
    outer = Select(F("k")).From(Schema("c1")).WithCTE(inner)
    with pytest.raises(PlanError, match="one CTE"):
        outer.WithCTE(Select(F("k")).From(Schema("t1")).As("c2"))


def test_cte_requires_alias(cat):
    inner = Select(F("k")).From(Schema("t1"))
    with pytest.raises(PlanError, match="alias"):
        Select(F("k")).From(Schema("x")).WithCTE(inner)


def test_join_requires_conditions(cat):
    with pytest.raises(PlanError, match="ON conditions"):
        Select(F("k")).From(Schema("s1")).Join(Schema("t1"))


def test_windowed_requires_event_time():
    c = Catalog()
    c.create(Relation("nots", Ref.STREAM, pa.schema([("k", pa.string()), ("v", pa.int64())])))
    q = (
        Select(F("k"), Count(F("v")).As("c"))
        .From(Schema("nots")).GroupBy(F("k")).Windowed(Tumbling(5, SECONDS))
    )
    with pytest.raises(PlanError, match="event-time"):
        q.validate(c)


def test_relation_report(cat):
    q = (
        Select(F("k"), Sum(F("v")).As("total"))
        .From(Schema("s1")).GroupBy(F("k")).EmitChanges()
    )
    rep = q.relation_report(cat)
    assert rep == {"s1": {"k": "string", "v": "int64"}}
