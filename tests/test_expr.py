"""Expression-compiler unit tests.

Ports the *intent* of the reference's golden-string tests
(ksql/conditionals_test.go:19-120, case_test.go:22-107,
arithmetic_test.go, expression_list_test.go) to value-level assertions
over Arrow batches: instead of asserting the rendered SQL, we assert the
compiled pyarrow.compute result.
"""

import pyarrow as pa
import pytest

from ksql_ray import (
    And, Case, CaseWhen, Div, F, Literal, Mod, Mul, Not, Or, PlanError, Sub,
)
from ksql_ray.errors import TypeError_


BATCH = pa.table(
    {
        "i": pa.array([1, 2, None, 4], type=pa.int64()),
        "d": pa.array([1.5, -2.0, 3.25, None], type=pa.float64()),
        "s": pa.array(["a", "b", None, "d"]),
        "b": pa.array([True, False, None, True]),
    }
)


def test_comparisons():
    assert F("i").Equal(2).eval(BATCH).to_pylist() == [False, True, None, False]
    assert F("i").NotEqual(2).eval(BATCH).to_pylist() == [True, False, None, True]
    assert F("i").Greater(1).eval(BATCH).to_pylist() == [False, True, None, True]
    assert F("i").GreaterEq(2).eval(BATCH).to_pylist() == [False, True, None, True]
    assert F("i").Less(2).eval(BATCH).to_pylist() == [True, False, None, False]
    assert F("i").LessEq(1).eval(BATCH).to_pylist() == [True, False, None, False]


def test_equal_nil_is_null():
    # `= nil` renders IS NULL in the reference (ksql/conditionals.go:184-192)
    assert F("i").Equal(None).eval(BATCH).to_pylist() == [False, False, True, False]
    assert F("i").NotEqual(None).eval(BATCH).to_pylist() == [True, True, False, True]


def test_null_tests():
    assert F("s").IsNull().eval(BATCH).to_pylist() == [False, False, True, False]
    assert F("s").IsNotNull().eval(BATCH).to_pylist() == [True, True, False, True]


def test_bool_tests():
    assert F("b").IsTrue().eval(BATCH).to_pylist() == [True, False, False, True]
    assert F("b").IsFalse().eval(BATCH).to_pylist() == [False, True, False, False]


def test_in_notin():
    assert F("s").In("a", "d").eval(BATCH).to_pylist() == [True, False, False, True]
    # three-valued logic: NULL NOT IN (...) is NULL, never TRUE — the row
    # must be filtered by WHERE (SQL/ksqlDB semantics)
    assert F("s").NotIn("a", "d").eval(BATCH).to_pylist() == [False, True, None, False]
    with pytest.raises(TypeError_):
        F("s").In()


def test_and_or_kleene():
    e = And(F("b"), F("i").Greater(0))
    assert e.eval(BATCH).to_pylist() == [True, False, None, True]
    e2 = Or(F("b"), F("i").Equal(2))
    assert e2.eval(BATCH).to_pylist() == [True, True, None, True]
    assert Not(F("b")).eval(BATCH).to_pylist() == [False, True, None, False]


def test_nested_expression_lists():
    # nestable AND/OR (ksql/expression_list.go:72-117)
    e = Or(And(F("b"), F("i").Greater(0)), F("s").Equal("b"))
    assert e.eval(BATCH).to_pylist() == [True, True, None, True]


def test_arithmetic():
    assert F("i").Add(1).eval(BATCH).to_pylist() == [2, 3, None, 5]
    assert Sub(F("i"), 1).eval(BATCH).to_pylist() == [0, 1, None, 3]
    assert Mul(F("i"), 3).eval(BATCH).to_pylist() == [3, 6, None, 12]
    assert Div(F("i"), 2).eval(BATCH).to_pylist() == [0.5, 1.0, None, 2.0]
    assert Mod(F("i"), 2).eval(BATCH).to_pylist() == [1, 0, None, 0]


def test_nested_arithmetic():
    # ((i + 1) * 2) like select_builder_test.go:675's nested arithmetic
    e = Mul(F("i").Add(1), 2)
    assert e.eval(BATCH).to_pylist() == [4, 6, None, 10]


def test_arithmetic_requires_alias():
    with pytest.raises(PlanError):
        F("i").Add(1).output_name()
    assert F("i").Add(1).As("x").output_name() == "x"


def test_case():
    c = (
        Case(
            "tier",
            CaseWhen(F("i").GreaterEq(4), "high"),
            CaseWhen(F("i").GreaterEq(2), "mid"),
        ).Else("low")
    )
    assert c.eval(BATCH).to_pylist() == ["low", "mid", "low", "high"]
    assert c.output_name() == "tier"


def test_case_default_else_null():
    c = Case("x", CaseWhen(F("i").Equal(1), 10))
    assert c.eval(BATCH).to_pylist() == [10, None, None, None]


def test_case_requires_alias():
    with pytest.raises(PlanError):
        Case("", CaseWhen(F("i").Equal(1), 1))


def test_literal_types():
    assert Literal(42).dtype == pa.int64()
    assert Literal(1.5).dtype == pa.float64()
    assert Literal("x").dtype == pa.string()
    assert Literal(True).dtype == pa.bool_()
    assert Literal(None).dtype == pa.null()
    assert Literal([1, 2]).dtype == pa.list_(pa.int64())


def test_ordered_comparison_type_check():
    schema = BATCH.schema
    with pytest.raises(TypeError_):
        F("b").Greater(True).out_type(schema)


def test_field_alias_and_qualifier():
    f = F("t1.col").As("c")
    assert f.qualifier == "t1" and f.name == "col"
    assert f.output_name() == "c"
    assert F("col").output_name() == "col"
