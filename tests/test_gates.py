"""ksql_ray.gates: the one-command driver-style correctness sweep.
The full sweep is exercised out-of-band (GATES_r04.json); here we pin
the compare/canonicalization semantics it relies on."""

from decimal import Decimal

import pyarrow as pa

from ksql_ray.gates import compare


def test_compare_equal_and_hash():
    t = pa.table({"k": ["a", "b"], "v": [1.5, 2.5]})
    rec = compare(t, t)
    assert rec["rows_match"] and rec["schema_match"] and rec["hash_match"]
    assert rec["engine_hash"] == rec["oracle_hash"]


def test_compare_decimal_vs_float_hash_equal():
    # DuckDB DECIMAL columns come back as object-dtype Decimal('0.90');
    # the engine produces float64 0.9 — same value, same hash
    a = pa.table({"q": pa.array([0.9, 0.5]), "n": [1, 2]})
    e = pa.table({"q": pa.array([Decimal("0.90"), Decimal("0.50")]),
                  "n": [1, 2]})
    rec = compare(a, e)
    assert rec["hash_match"], rec


def test_compare_row_order_insensitive():
    a = pa.table({"k": ["b", "a"], "v": [2, 1]})
    e = pa.table({"k": ["a", "b"], "v": [1, 2]})
    assert compare(a, e)["hash_match"]


def test_compare_detects_value_and_shape_mismatches():
    a = pa.table({"k": ["a"], "v": [1]})
    assert not compare(a, pa.table({"k": ["a"], "v": [2]}))["hash_match"]
    r = compare(a, pa.table({"k": ["a", "b"], "v": [1, 2]}))
    assert not r["rows_match"] and not r["hash_match"]
    r = compare(a, pa.table({"k": ["a"], "w": [1]}))
    assert not r["schema_match"] and not r["hash_match"]


def test_compare_null_and_list_columns():
    a = pa.table({"k": [None, "a"], "xs": [[1, 2], [3]]})
    e = pa.table({"k": pa.array(["a", None]), "xs": [[3], [1, 2]]})
    # sort uses only the scalar column; list values compare as objects
    rec = compare(a, e)
    assert rec["hash_match"], rec


def test_float_tolerance_vs_hash():
    # sub-tolerance difference: values_match passes, and the 9-sig-digit
    # canonical rendering also collapses it -> hash still matches
    a = pa.table({"v": [1.0000000001]})
    e = pa.table({"v": [1.0]})
    assert compare(a, e)["hash_match"]
    # a visible difference fails both
    assert not compare(pa.table({"v": [1.01]}), e)["hash_match"]
