"""ksql_ray — a Ray-Data-native streaming SQL / CEP engine.

Brand-new engine re-implementing the query surface of ksqlDB as encoded by
the gulfstream-h/ksql reference client (see SURVEY.md), executed as
ray.data.Dataset pipelines over zero-copy Arrow batches.
"""

from .aggregates import (
    Avg,
    CollectList,
    CollectSet,
    Count,
    CountDistinct,
    EarliestByOffset,
    Histogram,
    LatestByOffset,
    Max,
    Min,
    Percentile,
    StdDev,
    Sum,
    TopK,
    TopKDistinct,
    VarSamp,
)
from .builder import Schema, Select, SelectAsStruct, SelectBuilder
from .catalog import Catalog, Ref, Relation, STREAM, TABLE, TOPIC, testdata_catalog
from .errors import CatalogError, KsqlRayError, PlanError, SchemaError
from .exec.bounded import Engine
from .expr import (
    Add,
    And,
    Case,
    CaseWhen,
    Div,
    F,
    Field,
    Literal,
    Mod,
    Mul,
    Not,
    Or,
    Sub,
)
from .ddl import Create, Describe, Drop, Insert, List, Metadata
from .migrations import Migrator
from .windows import (
    DAYS,
    HOURS,
    Hopping,
    MILLISECONDS,
    MINUTES,
    SECONDS,
    Session,
    Tumbling,
)

__all__ = [
    "Avg", "CollectList", "CollectSet", "Count", "CountDistinct",
    "EarliestByOffset",
    "Histogram", "LatestByOffset", "Max", "Min", "Percentile",
    "StdDev", "Sum", "TopK", "VarSamp",
    "TopKDistinct", "Schema", "Select", "SelectAsStruct", "SelectBuilder", "Catalog", "Ref",
    "Relation", "STREAM", "TABLE", "TOPIC", "testdata_catalog",
    "CatalogError", "KsqlRayError", "PlanError", "SchemaError", "Engine",
    "Add", "And", "Case", "CaseWhen", "Div", "F", "Field", "Literal",
    "Mod", "Mul", "Not", "Or", "Sub", "DAYS", "HOURS", "Hopping",
    "MILLISECONDS", "MINUTES", "SECONDS", "Session", "Tumbling",
    "Create", "Describe", "Drop", "Insert", "List", "Metadata", "Migrator",
]
