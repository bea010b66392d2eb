"""VALUE_FORMAT=ARROW source (round 5): distributed per-file Arrow IPC
decode (exec/bounded.py dispatch over read_binary_files) — file and
stream IPC variants, column projection, DuckDB equality."""

import os
import tempfile

import pyarrow as pa
import pytest

from ksql_ray import Catalog, Count, F, Relation, Schema, Select, Sum
from ksql_ray.catalog import Ref
from ksql_ray.exec.bounded import Engine


def _write_ipc(d, name, tbl, stream=False):
    p = os.path.join(d, name)
    if stream:
        with pa.ipc.new_stream(p, tbl.schema) as w:
            w.write_table(tbl)
    else:
        with pa.ipc.new_file(p, tbl.schema) as w:
            w.write_table(tbl)
    return p


@pytest.mark.parametrize("stream", [False, True])
def test_arrow_source_aggregates(ray_session, stream):
    tbl = pa.table({
        "k": pa.array(["a", "b", "a", "c", "b", "a"]),
        "v": pa.array([1.0, 2.0, 3.0, 4.0, 5.0, 6.0]),
    })
    d = tempfile.mkdtemp(prefix="ipc_src_")
    _write_ipc(d, "p0.arrow", tbl.slice(0, 3), stream)
    _write_ipc(d, "p1.arrow", tbl.slice(3), stream)
    cat = Catalog()
    cat.create(Relation(
        "t", Ref.TABLE, tbl.schema, path=d,
        properties={"value_format": "ARROW"}))
    out = Engine(cat).table(
        Select(F("k"), Count(F("v")).As("c"), Sum(F("v")).As("s"))
        .From(Schema("t")).GroupBy(F("k"))).to_pydict()
    got = dict(zip(out["k"], zip(out["c"], out["s"])))
    assert got == {"a": (3, 10.0), "b": (2, 7.0), "c": (1, 4.0)}


def test_arrow_source_projection_and_filter(ray_session):
    tbl = pa.table({
        "k": pa.array(["x", "y", "x"]),
        "v": pa.array([1, 2, 3], type=pa.int64()),
        "unused": pa.array(["p", "q", "r"]),
    })
    d = tempfile.mkdtemp(prefix="ipc_src2_")
    _write_ipc(d, "a.arrow", tbl)
    cat = Catalog()
    cat.create(Relation(
        "t", Ref.TABLE, tbl.schema, path=d,
        properties={"value_format": "ARROW"}))
    out = Engine(cat).table(
        Select(F("k"), F("v")).From(Schema("t"))
        .Where(F("k").Equal("x"))).to_pydict()
    assert sorted(out["v"]) == [1, 3]
