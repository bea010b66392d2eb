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


def test_compare_list_only_output_order_insensitive():
    # VERDICT r4 #2: no scalar column -> rows sort by canonical
    # rendering, so block arrival order cannot flip the hash
    a = pa.table({"lst": pa.array([[3, 1], [2], [1, 1, 1]],
                                  type=pa.list_(pa.int64()))})
    b = pa.table({"lst": pa.array([[1, 1, 1], [3, 1], [2]],
                                  type=pa.list_(pa.int64()))})
    rec = compare(a, b)
    assert rec["hash_match"] is True and rec["err"] is None
    c = pa.table({"lst": pa.array([[1, 1, 1], [3, 2], [2]],
                                  type=pa.list_(pa.int64()))})
    assert compare(a, c)["hash_match"] is False


def test_gates_changed_since_selects_by_module():
    from ksql_ray.gates import gates_changed_since

    assert gates_changed_since("HEAD", changed=[]) == []
    # a change to ops/bpe.py selects exactly the gates whose pipeline
    # source references the bpe module
    sel = gates_changed_since("HEAD", changed=["ksql_ray/ops/bpe.py"])
    assert "op_bpe_vocab" in sel and "op_bpe_token_count" in sel
    assert "op_funnel_rates" not in sel
    # gate-definition files changed -> conservative full sweep
    full = gates_changed_since(
        "HEAD", changed=["ksql_ray/pipelines/driver_queries.py"])
    assert len(full) > 150
