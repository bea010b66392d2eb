"""Join conformance matrix vs DuckDB: INNER/LEFT/RIGHT/OUTER x
(equi-only | compound ON with residual) x (broadcast | shuffle /
co-partitioned) x (single | multi key). Same rationale as the aggregate
matrix: pairwise tests miss combinations."""

import duckdb
import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ksql_ray import And, Engine, F, Relation, Schema, Select
from ksql_ray import Catalog
from ksql_ray.catalog import Ref

from conftest import assert_tables_equal


@pytest.fixture(scope="module")
def jm(tmp_path_factory):
    base = tmp_path_factory.mktemp("jm")
    rng = np.random.default_rng(5)
    nl, nr = 2500, 400
    left = pa.table({
        "lk1": pa.array(rng.integers(0, 60, nl), type=pa.int64()),
        "lk2": pa.array(rng.integers(0, 4, nl), type=pa.int64()),
        "lval": pa.array(rng.integers(0, 1000, nl), type=pa.int64()),
        "lid": pa.array(np.arange(nl), type=pa.int64()),
    })
    right = pa.table({
        "rk1": pa.array(rng.integers(0, 80, nr), type=pa.int64()),  # some keys unmatched
        "rk2": pa.array(rng.integers(0, 4, nr), type=pa.int64()),
        "rval": pa.array(rng.integers(0, 1000, nr), type=pa.int64()),
        "rid": pa.array(np.arange(nr), type=pa.int64()),
    })
    lp, rp = str(base / "l.parquet"), str(base / "r.parquet")
    pq.write_table(left, lp)
    pq.write_table(right, rp)
    cat = Catalog()
    cat.create(Relation("l", Ref.TABLE, left.schema, path=lp))
    cat.create(Relation("r", Ref.TABLE, right.schema, path=rp))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW l AS SELECT * FROM '{lp}'")
    con.execute(f"CREATE VIEW r AS SELECT * FROM '{rp}'")
    return {"cat": cat, "con": con}


HOWS = ["inner", "left", "right", "outer"]
SQL_HOW = {"inner": "JOIN", "left": "LEFT JOIN",
           "right": "RIGHT JOIN", "outer": "FULL OUTER JOIN"}


def _build(how, residual, multikey):
    b = Select(F("lid"), F("rid"), F("lval"), F("rval")).From(Schema("l"))
    conds = [F("l.lk1").Equal(F("r.rk1"))]
    if multikey:
        conds.append(F("l.lk2").Equal(F("r.rk2")))
    if residual:
        conds.append(F("r.rval").Greater(500))
    cond = And(*conds) if len(conds) > 1 else conds[0]
    join = {"inner": b.Join, "left": b.LeftJoin,
            "right": b.RightJoin, "outer": b.OuterJoin}[how]
    return join(Schema("r"), cond)


def _sql(how, residual, multikey):
    on = "l.lk1 = r.rk1"
    if multikey:
        on += " AND l.lk2 = r.rk2"
    if residual:
        on += " AND r.rval > 500"
    return (f"SELECT lid, rid, lval, rval FROM l {SQL_HOW[how]} r ON {on}")


@pytest.mark.parametrize("path", ["broadcast", "shuffle"])
@pytest.mark.parametrize("multikey", [False, True])
@pytest.mark.parametrize("residual", [False, True])
@pytest.mark.parametrize("how", HOWS)
def test_join_matrix(jm, ray_session, how, residual, multikey, path):
    if path == "broadcast" and how in ("right", "outer"):
        # per-batch broadcast RIGHT/OUTER would re-emit build pads per
        # batch; the engine always routes them through the shuffle path
        pytest.skip("right/outer always run the shuffle/co-partition path")
    bmax = (1 << 62) if path == "broadcast" else 0
    eng = Engine(jm["cat"], num_partitions=4, broadcast_max_bytes=bmax)
    got = eng.table(_build(how, residual, multikey))
    exp = jm["con"].execute(_sql(how, residual, multikey)).arrow()
    assert_tables_equal(got, exp)


def test_copartition_join_string_keys(jm, ray_session, tmp_path_factory):
    """Residual outer join over STRING keys (exercises the side-tagged
    union's key-type coercion and string hashing)."""
    import pyarrow.parquet as pq

    base = tmp_path_factory.mktemp("jstr")
    rng = np.random.default_rng(9)
    left = pa.table({
        "lk": pa.array([f"k{v:02d}" for v in rng.integers(0, 30, 800)], type=pa.string()),
        "lval": pa.array(rng.integers(0, 100, 800), type=pa.int64()),
        "lid": pa.array(np.arange(800), type=pa.int64()),
    })
    right = pa.table({
        "rk": pa.array([f"k{v:02d}" for v in rng.integers(0, 40, 120)], type=pa.string()),
        "rval": pa.array(rng.integers(0, 100, 120), type=pa.int64()),
        "rid": pa.array(np.arange(120), type=pa.int64()),
    })
    lp, rp = str(base / "l.parquet"), str(base / "r.parquet")
    pq.write_table(left, lp)
    pq.write_table(right, rp)
    from ksql_ray import Catalog, Relation
    cat = Catalog()
    cat.create(Relation("ls", Ref.TABLE, left.schema, path=lp))
    cat.create(Relation("rs", Ref.TABLE, right.schema, path=rp))
    eng = Engine(cat, num_partitions=4, broadcast_max_bytes=0)
    q = (Select(F("lid"), F("rid"))
         .From(Schema("ls"))
         .OuterJoin(Schema("rs"), And(F("ls.lk").Equal(F("rs.rk")),
                                      F("rs.rval").Greater(50))))
    got = eng.table(q)
    import duckdb
    con = duckdb.connect()
    con.execute(f"CREATE VIEW ls AS SELECT * FROM '{lp}'")
    con.execute(f"CREATE VIEW rs AS SELECT * FROM '{rp}'")
    exp = con.execute(
        "SELECT lid, rid FROM ls FULL OUTER JOIN rs "
        "ON ls.lk = rs.rk AND rs.rval > 50").arrow()
    assert_tables_equal(got, exp)
