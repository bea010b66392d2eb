import duckdb
import pytest
import ray

SF_DIR = "/root/testdata/sf0.001"
SF01_DIR = "/root/testdata/sf0.01"

TABLES = [
    "region", "nation", "customer", "supplier", "part", "orders",
    "lineitem", "events", "documents", "embeddings",
]


@pytest.fixture(scope="session", autouse=True)
def ray_session():
    ray.init(
        address="local",
        num_cpus=4,
        include_dashboard=False,
        ignore_reinit_error=True,
        logging_level="ERROR",
    )
    ctx = ray.data.DataContext.get_current()
    ctx.enable_progress_bars = False
    yield
    ray.shutdown()


@pytest.fixture(scope="session")
def duck():
    con = duckdb.connect()
    for t in TABLES:
        con.execute(
            f"CREATE VIEW {t} AS SELECT * FROM '{SF_DIR}/{t}.parquet'"
        )
    yield con
    con.close()


@pytest.fixture(scope="session")
def catalog():
    from ksql_ray import testdata_catalog

    return testdata_catalog(SF_DIR)


@pytest.fixture(scope="session")
def engine(catalog):
    from ksql_ray import Engine

    return Engine(catalog, num_partitions=8)


def assert_tables_equal(actual, expected, sort_by=None, float_tol=1e-9):
    """Order-insensitive table equality (column-name aligned), mirroring the
    driver's compare: sort columns by name, sort rows, compare values."""
    import pandas as pd
    import pyarrow as pa

    if isinstance(actual, pa.Table):
        actual = actual.to_pandas()
    if isinstance(expected, pa.Table):
        expected = expected.to_pandas()
    assert sorted(actual.columns) == sorted(expected.columns), (
        f"columns differ: {sorted(actual.columns)} vs {sorted(expected.columns)}"
    )
    cols = sorted(actual.columns)
    a = actual[cols].reset_index(drop=True)
    e = expected[cols].reset_index(drop=True)
    assert len(a) == len(e), f"row counts differ: {len(a)} vs {len(e)}"
    import numpy as np

    def _scalar(v):
        return not isinstance(v, (list, dict, tuple, np.ndarray))

    def _all_scalar(s):
        # plain python all(): Series.map(...).all() keeps the input
        # dtype on EMPTY series, and .all() on datetime64 is a pandas
        # FutureWarning headed for an error
        return all(_scalar(v) for v in s)

    sort_cols = sort_by or [c for c in cols
                            if _all_scalar(a[c]) and _all_scalar(e[c])]
    a = a.sort_values(sort_cols, ignore_index=True)
    e = e.sort_values(sort_cols, ignore_index=True)
    for c in cols:
        av, ev = a[c], e[c]
        if av.dtype.kind == "f" or ev.dtype.kind == "f":
            pd.testing.assert_series_equal(
                av.astype(float), ev.astype(float), rtol=1e-9, atol=float_tol,
                check_names=False,
            )
        else:
            try:
                pd.testing.assert_series_equal(av, ev, check_names=False, check_dtype=False)
            except AssertionError:
                # list-valued columns: compare as python objects
                assert list(map(_norm, av)) == list(map(_norm, ev)), f"column {c} differs"


def _norm(v):
    if isinstance(v, (list, tuple)):
        return [_norm(x) for x in v]
    if hasattr(v, "tolist"):
        return _norm(v.tolist())
    return v


def collect(ds):
    """Materialize a Dataset into one Arrow table, dropping schema-less
    empty blocks (mirrors Engine.table)."""
    import pyarrow as pa
    import ray

    tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_columns]
    if not tables:
        return pa.table({})
    return pa.concat_tables(tables, promote_options="permissive")
