"""Emulates the driver's correctness gate: run every ``queries()`` entry
and its ``oracle_sql()`` side by side, compare rows/schema/values."""

import duckdb
import pytest

from conftest import SF_DIR, TABLES, assert_tables_equal


def _con(sf_dir):
    con = duckdb.connect()
    for t in TABLES:
        con.execute(f"CREATE VIEW {t} AS SELECT * FROM '{sf_dir}/{t}.parquet'")
    return con


def _registry():
    from ksql_ray.pipelines.driver_queries import REGISTRY

    return REGISTRY


@pytest.mark.parametrize("name", list(_registry().keys()))
def test_query_vs_oracle(name, ray_session):
    reg = _registry()
    qq = reg[name]
    actual = qq.run(SF_DIR)
    if qq.sql is None:
        assert actual.num_rows >= 0
        return
    con = _con(SF_DIR)
    expected = con.execute(qq.sql).arrow()
    con.close()
    assert_tables_equal(actual, expected, float_tol=1e-6)


def test_entry_smoke(ray_session):
    import __ray_entry__ as e

    res = e.entry()
    import pandas as pd
    import pyarrow as pa
    import ray.data

    if isinstance(res, ray.data.Dataset):
        n = res.count()
    elif isinstance(res, (pd.DataFrame, pa.Table)):
        n = len(res)
    else:
        raise AssertionError(f"unexpected entry() result {type(res)}")
    assert n >= 0


def test_contract_shapes():
    import __ray_entry__ as e

    qs = e.queries()
    sqls = e.oracle_sql()
    assert qs, "queries() must not be empty"
    for k in sqls:
        assert k in qs, f"oracle_sql key {k} missing from queries()"
