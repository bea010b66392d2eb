"""Property-based conformance: randomized predicate/aggregate queries must
match DuckDB exactly (hypothesis over the expression/aggregate space —
broader than the reference's fixed golden corpus)."""

import duckdb
import pytest
from hypothesis import given, settings, strategies as st, HealthCheck

from ksql_ray import (
    And, Avg, Count, Engine, F, Max, Min, Or, Schema, Select, Sum,
)
from ksql_ray.catalog import testdata_catalog as _testdata_catalog

from conftest import SF_DIR, assert_tables_equal

NUM_COLS = ["l_quantity", "l_extendedprice", "l_discount"]
OPS = [
    ("Greater", ">"), ("Less", "<"), ("GreaterEq", ">="),
    ("LessEq", "<="), ("Equal", "="), ("NotEqual", "!="),
]
VALS = {
    "l_quantity": [1.0, 10.0, 25.0, 49.0],
    "l_extendedprice": [2000.0, 50000.0, 90000.0],
    "l_discount": [0.0, 0.03, 0.07],
}

cond_strategy = st.tuples(
    st.sampled_from(NUM_COLS),
    st.sampled_from(OPS),
    st.integers(0, 3),
)


def _mk_cond(spec):
    col, (method, sqlop), vi = spec
    v = VALS[col][vi % len(VALS[col])]
    return getattr(F(col), method)(v), f"{col} {sqlop} {v}"


AGGS = [
    (lambda: Sum(F("l_quantity")).As("a0"), "ROUND(sum(l_quantity), 4) AS a0", ("a0", 4)),
    (lambda: Count(F("l_orderkey")).As("a1"), "count(l_orderkey) AS a1", None),
    (lambda: Min(F("l_extendedprice")).As("a2"), "min(l_extendedprice) AS a2", None),
    (lambda: Max(F("l_discount")).As("a3"), "max(l_discount) AS a3", None),
    (lambda: Avg(F("l_quantity")).As("a4"), "ROUND(avg(l_quantity), 6) AS a4", ("a4", 6)),
]


@pytest.fixture(scope="module")
def duck_prop():
    con = duckdb.connect()
    con.execute(f"CREATE VIEW lineitem AS SELECT * FROM '{SF_DIR}/lineitem.parquet'")
    yield con
    con.close()


@pytest.fixture(scope="module")
def prop_engine(ray_session):
    return Engine(_testdata_catalog(SF_DIR), num_partitions=4)


@settings(max_examples=12, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(conds=st.lists(cond_strategy, min_size=1, max_size=3),
       combiner=st.sampled_from(["and", "or"]))
def test_random_filters(prop_engine, duck_prop, conds, combiner):
    built = [_mk_cond(c) for c in conds]
    exprs = [b[0] for b in built]
    sqls = [b[1] for b in built]
    if combiner == "and":
        q = (Select(F("l_orderkey"), F("l_linenumber"))
             .From(Schema("lineitem")).Where(*exprs))
        where = " AND ".join(sqls)
    else:
        q = (Select(F("l_orderkey"), F("l_linenumber"))
             .From(Schema("lineitem")).Where(Or(*exprs)))
        where = " OR ".join(sqls)
    actual = prop_engine.table(q)
    expected = duck_prop.execute(
        f"SELECT l_orderkey, l_linenumber FROM lineitem WHERE {where}"
    ).arrow()
    assert_tables_equal(actual, expected)


@settings(max_examples=10, deadline=None,
          suppress_health_check=[HealthCheck.function_scoped_fixture])
@given(agg_idx=st.lists(st.integers(0, len(AGGS) - 1), min_size=1, max_size=3,
                        unique=True),
       cond=cond_strategy)
def test_random_aggregates(prop_engine, duck_prop, agg_idx, cond):
    import pyarrow as pa
    import pyarrow.compute as pc

    expr, sql_cond = _mk_cond(cond)
    fields = [F("l_returnflag")]
    sql_aggs = []
    rounds = {}
    for i in agg_idx:
        mk, sql, rnd = AGGS[i]
        fields.append(mk())
        sql_aggs.append(sql)
        if rnd:
            rounds[rnd[0]] = rnd[1]
    q = (Select(*fields).From(Schema("lineitem"))
         .Where(expr).GroupBy(F("l_returnflag")))
    actual = prop_engine.table(q)
    for c, nd in rounds.items():
        i = actual.column_names.index(c)
        actual = actual.set_column(
            i, c, pc.round(pc.cast(actual.column(c), pa.float64()), ndigits=nd)
        )
    expected = duck_prop.execute(
        f"SELECT l_returnflag, {', '.join(sql_aggs)} FROM lineitem "
        f"WHERE {sql_cond} GROUP BY l_returnflag"
    ).arrow()
    assert_tables_equal(actual, expected, float_tol=1e-6)


from hypothesis import given, settings, strategies as st


@settings(max_examples=40, deadline=None)
@given(st.lists(
    st.tuples(
        st.lists(st.integers(min_value=0, max_value=60), min_size=0, max_size=30),
        st.lists(st.integers(min_value=0, max_value=60), min_size=0, max_size=30),
    ),
    min_size=1, max_size=12,
))
def test_packed_sort_jaccard_matches_sets(pairs):
    """The packed-key np.sort intersection kernel must equal Python set
    Jaccard for arbitrary shingle multisets (store rows are sorted-unique,
    which the test reproduces)."""
    import numpy as np
    import pyarrow as pa

    from ksql_ray.ops.dedup import _exact_jaccard_of_pairs
    from ksql_ray.ops.vectors import pack_u64_var

    rows_flat, counts, expect = [], [], []
    for a_vals, b_vals in pairs:
        sa, sb = set(a_vals), set(b_vals)
        u = len(sa | sb)
        expect.append(len(sa & sb) / u if u else 0.0)
        for s in (sa, sb):
            vals = np.array(sorted(s), dtype=np.uint64)
            rows_flat.append(vals)
            counts.append(len(vals))
    flat = np.concatenate(rows_flat) if rows_flat else np.empty(0, dtype=np.uint64)
    n_pairs = len(pairs)
    tbl = pa.table({
        "doc_a": pa.array(np.repeat(np.arange(n_pairs) * 2, 2)),
        "doc_b": pa.array(np.repeat(np.arange(n_pairs) * 2 + 1, 2)),
        "key": pa.array(np.arange(2 * n_pairs)),
        "shingles": pack_u64_var(flat, np.array(counts)),
    })
    a, b, jac = _exact_jaccard_of_pairs(tbl)
    assert len(jac) == n_pairs
    assert np.allclose(jac, expect, rtol=0, atol=0)
