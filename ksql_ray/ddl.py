"""DDL / DML builders: CREATE, INSERT, DROP, LIST, DESCRIBE.

Reference surface:
* CREATE STREAM/TABLE with explicit fields or struct reflection, WITH
  metadata, PRIMARY KEY — ksql/create_builder.go:76-207; rules 7/8 at
  create_builder.go:46-66 (+ the windowed-CTAS restriction, README.md:705).
* INSERT VALUES with explicit column ordering and NULL for missing
  columns — ksql/insert_builder.go:40-160; InsertStruct :83-105;
  INSERT ... AS SELECT :77-81.
* DROP — ksql/drop_builder.go:21-49; LIST — list_builder.go:19-43;
  DESCRIBE — describe_builder.go:24-57.

Execution is Ray-Data/Arrow-native: a relation is a Parquet dataset
directory; INSERT appends an immutable fragment (append-only STREAM
semantics, §1.1); CTAS/CSAS runs the inner query as a Dataset pipeline
and registers the result as a new relation.
"""

from __future__ import annotations

import dataclasses
import datetime as _dt
import os
import time
import typing
from dataclasses import dataclass, field as dc_field

import pyarrow as pa
import pyarrow.parquet as pq

from .builder import SelectBuilder
from .catalog import Catalog, Ref, Relation
from .errors import CatalogError, PlanError, SchemaError
from .kinds import Ktype, to_arrow


@dataclass
class Metadata:
    """WITH (...) relation properties (ksql/metadata.go:10-56)."""

    topic: str | None = None  # KAFKA_TOPIC analog: storage path override
    partitions: int = 1
    replicas: int = 1
    value_format: str = "PARQUET"
    timestamp_col: str | None = None  # WITH (TIMESTAMP=...)
    timestamp_format: str | None = None
    order_cols: list[str] = dc_field(default_factory=list)


_PY_TO_ARROW = {
    bool: pa.bool_(),
    int: pa.int64(),
    float: pa.float64(),
    str: pa.string(),
    bytes: pa.binary(),
    _dt.datetime: pa.timestamp("us"),
}


def _py_type_to_arrow(t) -> pa.DataType:
    if t in _PY_TO_ARROW:
        return _PY_TO_ARROW[t]
    origin = typing.get_origin(t)
    if origin in (list, typing.List):
        (inner,) = typing.get_args(t)
        return pa.list_(_py_type_to_arrow(inner))
    if origin in (dict, typing.Dict):
        k, v = typing.get_args(t)
        if k is not str:
            raise SchemaError("MAP keys must be str (kinds/ktype.go:62-66)")
        return pa.map_(pa.string(), _py_type_to_arrow(v))
    if origin is typing.Union:  # Optional[...]
        args = [a for a in typing.get_args(t) if a is not type(None)]
        if len(args) == 1:
            return _py_type_to_arrow(args[0])
    raise SchemaError(f"unsupported python type {t!r} for relation schema")


def schema_from_struct(cls) -> tuple[pa.Schema, str | None]:
    """Dataclass -> (Arrow schema, primary key); the ``ksql:"NAME,
    primary"`` struct-tag analog uses dataclass field metadata
    (internal/schema/schema.go:44-99)."""
    if not dataclasses.is_dataclass(cls):
        raise SchemaError("SchemaFromStruct requires a dataclass")
    fields, primary = [], None
    for f in dataclasses.fields(cls):
        name = f.metadata.get("ksql", f.name)
        if f.metadata.get("primary"):
            if primary is not None:
                raise SchemaError(
                    "at most one primary key per struct "
                    "(internal/schema/schema.go:78-84)"
                )
            primary = name
        fields.append(pa.field(name, _py_type_to_arrow(f.type if not isinstance(f.type, str) else typing.get_type_hints(cls)[f.name])))
    return pa.schema(fields), primary


class CreateBuilder:
    """CREATE STREAM/TABLE (ksql/create_builder.go:76-131)."""

    def __init__(self, ref: Ref, name: str):
        if ref not in (Ref.STREAM, Ref.TABLE):
            raise PlanError("can only CREATE STREAM or TABLE")
        self.ref = ref
        self.name = name
        self.schema: pa.Schema | None = None
        self.primary_key: str | None = None
        self.select: SelectBuilder | None = None
        self.meta = Metadata()

    def SchemaFields(self, *fields: tuple) -> "CreateBuilder":
        """fields: (name, Ktype | pa.DataType[, "primary"])"""
        out = []
        for f in fields:
            name, t = f[0], f[1]
            if isinstance(t, Ktype):
                t = to_arrow(t)
            if len(f) > 2 and f[2] == "primary":
                if self.ref is not Ref.TABLE:
                    raise PlanError(
                        "PRIMARY KEY is a TABLE concept (ksql/create_builder.go:176-178)"
                    )
                if self.primary_key is not None:
                    raise SchemaError("at most one primary key")
                self.primary_key = name
            out.append(pa.field(name, t))
        self.schema = pa.schema(out)
        return self

    def SchemaFromStruct(self, cls) -> "CreateBuilder":
        self.schema, self.primary_key = schema_from_struct(cls)
        if self.primary_key and self.ref is not Ref.TABLE:
            raise PlanError("PRIMARY KEY is a TABLE concept")
        return self

    def AsSelect(self, sb: SelectBuilder) -> "CreateBuilder":
        self.select = sb
        return self

    def With(self, meta: Metadata) -> "CreateBuilder":
        self.meta = meta
        return self

    # rules 7/8 + windowed-CTAS (SURVEY.md §2.8)
    def validate(self, catalog: Catalog) -> None:
        if self.select is None:
            if self.schema is None:
                raise PlanError("CREATE requires SchemaFields/SchemaFromStruct or AsSelect")
            return
        sb = self.select
        sb.validate(catalog)
        src_kind = sb.source_kind(catalog)
        if self.ref is Ref.TABLE and src_kind is Ref.STREAM and not sb.has_aggregates():
            raise PlanError(
                "cannot CREATE TABLE from a non-aggregated STREAM "
                "(ksql/create_builder.go:46-56)"
            )
        if self.ref is Ref.STREAM and src_kind is Ref.TABLE:
            raise PlanError(
                "cannot CREATE STREAM from a TABLE (ksql/create_builder.go:58-66)"
            )
        if self.ref is Ref.TABLE and sb.window is not None:
            raise PlanError(
                "CTAS of a windowed query cannot be a TABLE (README.md:705)"
            )

    def execute(self, catalog: Catalog, engine=None, base_dir: str = "/tmp/ksql_ray_relations") -> Relation:
        self.validate(catalog)
        path = self.meta.topic or os.path.join(base_dir, self.name)
        if self.select is not None:
            if engine is None:
                from .exec.bounded import Engine

                engine = Engine(catalog)
            schema = self.select.returns(catalog)
            os.makedirs(path, exist_ok=True)
            ds = engine.dataset(self.select)
            ds.write_parquet(path)
        else:
            schema = self.schema
            os.makedirs(path, exist_ok=True)
        rel = Relation(
            name=self.name,
            kind=self.ref,
            schema=schema,
            path=path,
            primary_key=self.primary_key,
            timestamp_col=self.meta.timestamp_col,
            order_cols=list(self.meta.order_cols),
            partitions=self.meta.partitions,
            properties={"value_format": self.meta.value_format},
        )
        created = catalog.create(rel)
        if self.ref is Ref.TABLE and self.select is None:
            # the ORM auto-creates a QUERYABLE_<name> materialization so pull
            # queries have a queryable view (tables/specification.go:323,
            # consts/consts.go:17-19); ours shares the same dataset path
            catalog.create(
                Relation(
                    name=f"QUERYABLE_{self.name}",
                    kind=Ref.TABLE,
                    schema=schema,
                    path=path,
                    primary_key=self.primary_key,
                    properties={"shadow_of": self.name},
                ),
                if_not_exists=True,
            )
        return created


def Create(ref: Ref, name: str) -> CreateBuilder:
    return CreateBuilder(ref, name)


class InsertBuilder:
    """INSERT INTO (ksql/insert_builder.go). STREAMs only: inserting into
    TABLEs is unsupported (README.md:358)."""

    def __init__(self, ref: Ref, name: str):
        if ref is not Ref.STREAM:
            raise PlanError("INSERT targets STREAMs only (README.md:358)")
        self.name = name
        self.rows: list[dict] = []
        self.select: SelectBuilder | None = None

    def Rows(self, *rows: dict) -> "InsertBuilder":
        """Explicit column dicts; missing columns become NULL
        (ksql/insert_builder.go:112-160)."""
        self.rows.extend(rows)
        return self

    def Struct(self, obj) -> "InsertBuilder":
        """INSERT from a tagged dataclass (ksql/insert_builder.go:83-105)."""
        if not dataclasses.is_dataclass(obj):
            raise SchemaError("InsertStruct requires a dataclass instance")
        row = {}
        for f in dataclasses.fields(obj):
            row[f.metadata.get("ksql", f.name)] = getattr(obj, f.name)
        self.rows.append(row)
        return self

    def AsSelect(self, sb: SelectBuilder) -> "InsertBuilder":
        self.select = sb
        return self

    def execute(self, catalog: Catalog, engine=None) -> str:
        rel = catalog.get(self.name)
        if rel.kind is not Ref.STREAM:
            raise PlanError("INSERT targets STREAMs only (README.md:358)")
        if rel.path is None or os.path.isfile(rel.path):
            raise CatalogError(
                f"relation {self.name} is not an appendable dataset directory"
            )
        os.makedirs(rel.path, exist_ok=True)
        frag = os.path.join(
            rel.path, f"insert-{time.time_ns()}-{os.getpid()}.parquet"
        )
        if self.select is not None:
            if engine is None:
                from .exec.bounded import Engine

                engine = Engine(catalog)
            out_schema = self.select.returns(catalog)
            for f in out_schema:
                if f.name not in rel.schema.names:
                    raise SchemaError(
                        f"SELECT output column {f.name} not in target schema"
                    )
            tbl = engine.table(self.select)
            tbl = _conform(tbl, rel.schema)
            _two_phase_write(tbl, frag)
            return frag
        if not self.rows:
            raise PlanError("INSERT requires Rows/Struct/AsSelect")
        cols: dict[str, list] = {f.name: [] for f in rel.schema}
        for row in self.rows:
            for f in rel.schema:
                cols[f.name].append(row.get(f.name))
            unknown = set(row) - set(rel.schema.names)
            if unknown:
                raise SchemaError(f"unknown INSERT columns {sorted(unknown)}")
        tbl = pa.table(
            {f.name: pa.array(cols[f.name], type=f.type) for f in rel.schema}
        )
        _two_phase_write(tbl, frag)
        return frag


def _conform(tbl: pa.Table, schema: pa.Schema) -> pa.Table:
    import pyarrow.compute as pc

    cols = []
    for f in schema:
        if f.name in tbl.column_names:
            c = tbl.column(f.name)
            if c.type != f.type:
                c = pc.cast(c, f.type)
            cols.append(c)
        else:
            cols.append(pa.nulls(tbl.num_rows, type=f.type))
    return pa.Table.from_arrays([c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c for c in cols], schema=schema)


def _two_phase_write(tbl: pa.Table, final: str) -> None:
    tmp = final + ".tmp"
    pq.write_table(tbl, tmp)
    with open(tmp, "rb") as f:
        os.fsync(f.fileno())
    os.replace(tmp, final)


def Insert(ref: Ref, name: str) -> InsertBuilder:
    return InsertBuilder(ref, name)


def Drop(catalog: Catalog, ref: Ref, name: str, delete_data: bool = False) -> None:
    """DROP STREAM/TABLE/TOPIC (ksql/drop_builder.go:21-49). Dropping a
    TABLE also drops its QUERYABLE_ shadow — the ORM's two-step drop
    (tables/specification.go:127-206)."""
    rel = catalog.get(name)
    if rel.kind is not ref:
        raise CatalogError(f"{name} is a {rel.kind.value}, not a {ref.value}")
    if delete_data and rel.path and os.path.isdir(rel.path):
        import shutil

        shutil.rmtree(rel.path, ignore_errors=True)
    catalog.drop(name)
    if ref is Ref.TABLE:
        catalog.drop(f"QUERYABLE_{name}", if_exists=True)


def List(catalog: Catalog, ref: Ref | None = None) -> list[dict]:
    return catalog.list(ref)


def Describe(catalog: Catalog, name: str) -> dict:
    return catalog.describe(name)
