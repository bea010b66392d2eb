"""Type-system coverage: every Ktype (kinds/ktype.go:13-34) through the
catalog, expressions and engine, with nulls in every column (the
`typed_kinds` fixture of FIXTURES.md §4; null-propagation shapes from
ksql/conditionals_test.go:36-41,84-89)."""

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ksql_ray import (
    And, Catalog, CollectList, Count, Engine, F, Relation, Schema, Select,
)
from ksql_ray.catalog import Ref
from ksql_ray.errors import TypeError_
from ksql_ray.kinds import Ktype, from_arrow, is_ordered, to_arrow


def test_ktype_arrow_roundtrip():
    for kt in Ktype:
        at = to_arrow(kt)
        back = from_arrow(at)
        assert back == kt, f"{kt} -> {at} -> {back}"


def test_map_keys_must_be_string():
    with pytest.raises(TypeError_):
        from_arrow(pa.map_(pa.int64(), pa.string()))


def test_nested_struct_unsupported():
    # struct fields are explicitly unsupported (kinds/ktype.go:118-120)
    with pytest.raises(TypeError_):
        from_arrow(pa.struct([("a", pa.int64())]))


def test_is_ordered():
    assert is_ordered(pa.int32()) and is_ordered(pa.string()) and is_ordered(pa.timestamp("us"))
    assert not is_ordered(pa.bool_()) and not is_ordered(pa.list_(pa.int64()))


@pytest.fixture(scope="module")
def typed_kinds(tmp_path_factory):
    """The typed_kinds STREAM: every primitive + ARRAY/MAP lifting, with
    nulls in every column."""
    tbl = pa.table({
        "b": pa.array([True, None, False, True], type=pa.bool_()),
        "i": pa.array([1, 2, None, 4], type=pa.int32()),
        "l": pa.array([10, None, 30, 40], type=pa.int64()),
        "d": pa.array([1.5, 2.5, 3.5, None], type=pa.float64()),
        "s": pa.array(["x", None, "z", "w"], type=pa.string()),
        "by": pa.array([b"a", b"b", None, b"d"], type=pa.binary()),
        "arr_s": pa.array([["a", "b"], None, ["c"], []], type=pa.list_(pa.string())),
        "arr_i": pa.array([[1], [2, 3], None, []], type=pa.list_(pa.int32())),
        "m_s": pa.array([{"k": "v"}, None, {}, {"a": "b"}],
                        type=pa.map_(pa.string(), pa.string())),
        "m_i": pa.array([{"k": 1}, {}, None, {"z": 9}],
                        type=pa.map_(pa.string(), pa.int64())),
    })
    path = str(tmp_path_factory.mktemp("kinds") / "typed_kinds.parquet")
    pq.write_table(tbl, path)
    cat = Catalog()
    cat.create(Relation("typed_kinds", Ref.TABLE, tbl.schema, path=path,
                        order_cols=["i"]))
    return cat


def test_typed_kinds_through_engine(typed_kinds, ray_session):
    eng = Engine(typed_kinds, num_partitions=2)
    q = (Select(F("b"), F("i"), F("l"), F("d"), F("s"), F("by"),
                F("arr_s"), F("arr_i"), F("m_s"), F("m_i"))
         .From(Schema("typed_kinds"))
         .Where(F("i").IsNotNull()))
    t = eng.table(q)
    assert t.num_rows == 3
    assert t.schema.field("m_i").type == pa.map_(pa.string(), pa.int64())
    assert t.schema.field("arr_s").type == pa.list_(pa.string())


def test_null_propagation_in_predicates(typed_kinds, ray_session):
    eng = Engine(typed_kinds, num_partitions=2)
    # b IS TRUE AND i > 0: null b / null i never pass (Kleene + fill false)
    q = (Select(F("i")).From(Schema("typed_kinds"))
         .Where(And(F("b").IsTrue(), F("i").Greater(0))))
    t = eng.table(q)
    # rows: (True,1) passes, (None,2) fails IS TRUE, (False,None) fails,
    # (True,4) passes
    assert sorted(t.column("i").to_pylist()) == [1, 4]


def test_aggregate_over_nullable(typed_kinds, ray_session):
    eng = Engine(typed_kinds, num_partitions=2)
    q = (Select(F("b"), Count(F("i")).As("ci"))
         .From(Schema("typed_kinds")).GroupBy(F("b")))
    t = eng.table(q)
    rows = {r["b"]: r["ci"] for r in t.to_pylist()}
    # b=True rows: i=1 and i=4 -> 2 non-null; b=None row: i=2 -> 1; b=False: i=None -> 0
    assert rows == {True: 2, False: 0, None: 1}
