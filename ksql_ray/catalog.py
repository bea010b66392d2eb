"""Relation catalog: STREAM/TABLE/TOPIC registry with Arrow schemas.

Replaces the reference's in-memory catalog + schema reflection
(static/relation_storage.go:18-84, config/linter.go:32-96,
internal/schema/inspector.go:8-37) with an explicit `pyarrow.Schema`
registry. CREATE/DROP/LIST/DESCRIBE map to ksql/create_builder.go,
drop_builder.go:21-49, list_builder.go:19-43, describe_builder.go:24-57.

Each relation carries the properties the reference passes via
``WITH (...)`` metadata (ksql/metadata.go:10-56): source path (KAFKA_TOPIC
analog), partition count, the designated event-time column (TIMESTAMP=...),
plus our order columns (the offset-rank substitute, see aggregates.py).
"""

from __future__ import annotations

import enum
import glob
import os
from dataclasses import dataclass, field

import pyarrow as pa
import pyarrow.parquet as pq

from .errors import CatalogError, PlanError


class Ref(enum.Enum):
    """Relation kinds (ksql/reference.go:8-13)."""

    STREAM = "STREAM"
    TABLE = "TABLE"
    TOPIC = "TOPIC"


STREAM, TABLE, TOPIC = Ref.STREAM, Ref.TABLE, Ref.TOPIC


@dataclass
class Relation:
    name: str
    kind: Ref
    schema: pa.Schema
    path: str | None = None  # parquet file/dir backing this relation
    primary_key: str | None = None  # TABLE key (create_builder.go:176-178)
    timestamp_col: str | None = None  # WITH (TIMESTAMP=...) analog
    order_cols: list[str] = field(default_factory=list)  # offset rank
    partitions: int = 1
    properties: dict = field(default_factory=dict)

    def describe(self) -> dict:
        """DESCRIBE output (dao/describe.go:46-80 analog)."""
        return {
            "name": self.name,
            "kind": self.kind.value,
            "fields": [
                {"name": f.name, "type": str(f.type)} for f in self.schema
            ],
            "primary_key": self.primary_key,
            "timestamp_col": self.timestamp_col,
            "order_cols": list(self.order_cols),
            "partitions": self.partitions,
            "path": self.path,
            "properties": dict(self.properties),
        }


class Catalog:
    """Name -> Relation registry (static.RelationStorage analog)."""

    def __init__(self) -> None:
        self._rel: dict[str, Relation] = {}

    # --- DDL ---------------------------------------------------------------
    def create(self, rel: Relation, if_not_exists: bool = False) -> Relation:
        key = rel.name.lower()
        if key in self._rel:
            if if_not_exists:
                return self._rel[key]
            raise CatalogError(f"relation {rel.name} already exists")
        if rel.kind is Ref.TABLE and rel.primary_key:
            if rel.primary_key not in rel.schema.names:
                raise CatalogError(
                    f"primary key {rel.primary_key} not in schema "
                    "(internal/schema/schema.go:78-84)"
                )
        self._rel[key] = rel
        return rel

    def drop(self, name: str, if_exists: bool = False) -> None:
        key = name.lower()
        if key not in self._rel:
            if if_exists:
                return
            raise CatalogError(f"unknown relation {name}")
        del self._rel[key]

    def get(self, name: str) -> Relation:
        try:
            return self._rel[name.lower()]
        except KeyError:
            raise CatalogError(f"unknown relation {name}") from None

    def has(self, name: str) -> bool:
        return name.lower() in self._rel

    def list(self, kind: Ref | None = None) -> list[dict]:
        """LIST STREAMS/TABLES/TOPICS (ksql/list_builder.go:19-43)."""
        out = []
        for r in self._rel.values():
            if kind is None or r.kind is kind:
                out.append({"name": r.name, "kind": r.kind.value, "path": r.path})
        return sorted(out, key=lambda d: d["name"])

    def describe(self, name: str) -> dict:
        return self.get(name).describe()

    # --- bootstrap from a directory of parquet tables ----------------------
    @classmethod
    def from_dir(
        cls,
        directory: str,
        kinds: dict[str, Ref] | None = None,
        order_cols: dict[str, list[str]] | None = None,
        timestamp_cols: dict[str, str] | None = None,
        primary_keys: dict[str, str] | None = None,
    ) -> "Catalog":
        """Register every ``*.parquet`` in *directory* (the linter-bootstrap
        analog, config/linter.go:32-96: LIST + DESCRIBE everything once)."""
        cat = cls()
        kinds = kinds or {}
        order_cols = order_cols or {}
        timestamp_cols = timestamp_cols or {}
        primary_keys = primary_keys or {}
        for p in sorted(glob.glob(os.path.join(directory, "*.parquet"))):
            name = os.path.splitext(os.path.basename(p))[0]
            schema = pq.read_schema(p)
            schema = pa.schema([pa.field(f.name, f.type) for f in schema])
            cat.create(
                Relation(
                    name=name,
                    kind=kinds.get(name, Ref.TABLE),
                    schema=schema,
                    path=p,
                    primary_key=primary_keys.get(name),
                    timestamp_col=timestamp_cols.get(name),
                    order_cols=order_cols.get(name, []),
                )
            )
        return cat


# defaults for the driver-generated testdata tables (TESTDATA.md)
TESTDATA_ORDER_COLS = {
    "events": ["ts", "event_id"],
    "lineitem": ["l_orderkey", "l_linenumber"],
    "orders": ["o_orderkey"],
    "documents": ["doc_id"],
    "embeddings": ["vec_id"],
    "customer": ["c_custkey"],
    "supplier": ["s_suppkey"],
    "part": ["p_partkey"],
    "nation": ["n_nationkey"],
    "region": ["r_regionkey"],
}
TESTDATA_TS_COLS = {"events": "ts", "orders": "o_orderdate", "lineitem": "l_shipdate"}


def testdata_catalog(sf_dir: str) -> Catalog:
    """Catalog over the driver-generated tables; all registered as TABLEs
    (bounded snapshots) except `events`, which is a STREAM with event-time
    `ts` per SURVEY.md §1.3."""
    cat = Catalog.from_dir(
        sf_dir,
        kinds={"events": Ref.STREAM},
        order_cols=TESTDATA_ORDER_COLS,
        timestamp_cols=TESTDATA_TS_COLS,
    )
    return cat
