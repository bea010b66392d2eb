"""The engine type system: Ktype enum <-> Arrow types.

Re-expresses the reference's fixed 18-type system (6 primitives and their
ARRAY/MAP liftings; /root/reference/kinds/ktype.go:13-34,146-187) on top of
pyarrow. MAP keys are string-only, exactly as in the reference
(kinds/ktype.go:62-66). No decimal, no nested struct (kinds/ktype.go:118-120).
We additionally admit timestamp[us] because the designated event-time column
(WITH (TIMESTAMP='col'), ksql/metadata.go:40-45) arrives as a real Arrow
timestamp in Parquet.
"""

from __future__ import annotations

import enum

import pyarrow as pa

from .errors import TypeError_


class Ktype(enum.Enum):
    BOOL = "BOOLEAN"
    INT = "INT"
    BIGINT = "BIGINT"
    DOUBLE = "DOUBLE"
    STRING = "VARCHAR"
    BYTES = "BYTES"
    TIMESTAMP = "TIMESTAMP"  # event-time extension (not in reference enum)
    ARR_BOOL = "ARRAY<BOOLEAN>"
    ARR_INT = "ARRAY<INT>"
    ARR_BIGINT = "ARRAY<BIGINT>"
    ARR_DOUBLE = "ARRAY<DOUBLE>"
    ARR_STRING = "ARRAY<VARCHAR>"
    ARR_BYTES = "ARRAY<BYTES>"
    MAP_BOOL = "MAP<VARCHAR, BOOLEAN>"
    MAP_INT = "MAP<VARCHAR, INT>"
    MAP_BIGINT = "MAP<VARCHAR, BIGINT>"
    MAP_DOUBLE = "MAP<VARCHAR, DOUBLE>"
    MAP_STRING = "MAP<VARCHAR, VARCHAR>"
    MAP_BYTES = "MAP<VARCHAR, BYTES>"


_PRIM_TO_ARROW: dict[Ktype, pa.DataType] = {
    Ktype.BOOL: pa.bool_(),
    Ktype.INT: pa.int32(),
    Ktype.BIGINT: pa.int64(),
    Ktype.DOUBLE: pa.float64(),
    Ktype.STRING: pa.string(),
    Ktype.BYTES: pa.binary(),
    Ktype.TIMESTAMP: pa.timestamp("us"),
}

_ARR_BASE = {
    Ktype.ARR_BOOL: Ktype.BOOL,
    Ktype.ARR_INT: Ktype.INT,
    Ktype.ARR_BIGINT: Ktype.BIGINT,
    Ktype.ARR_DOUBLE: Ktype.DOUBLE,
    Ktype.ARR_STRING: Ktype.STRING,
    Ktype.ARR_BYTES: Ktype.BYTES,
}

_MAP_BASE = {
    Ktype.MAP_BOOL: Ktype.BOOL,
    Ktype.MAP_INT: Ktype.INT,
    Ktype.MAP_BIGINT: Ktype.BIGINT,
    Ktype.MAP_DOUBLE: Ktype.DOUBLE,
    Ktype.MAP_STRING: Ktype.STRING,
    Ktype.MAP_BYTES: Ktype.BYTES,
}


def to_arrow(kt: Ktype) -> pa.DataType:
    """Ktype -> Arrow type (analog of kinds/ktype.go:146-187 rendering)."""
    if kt in _PRIM_TO_ARROW:
        return _PRIM_TO_ARROW[kt]
    if kt in _ARR_BASE:
        return pa.list_(_PRIM_TO_ARROW[_ARR_BASE[kt]])
    if kt in _MAP_BASE:
        return pa.map_(pa.string(), _PRIM_TO_ARROW[_MAP_BASE[kt]])
    raise TypeError_(f"unmapped ktype {kt}")


def from_arrow(dt: pa.DataType) -> Ktype:
    """Arrow type -> Ktype (analog of kinds.CastResponseTypes,
    kinds/ktype.go:191-233). Widening: any integer <= 32 bits -> INT,
    64-bit -> BIGINT; large_string -> STRING."""
    if pa.types.is_boolean(dt):
        return Ktype.BOOL
    if pa.types.is_integer(dt):
        return Ktype.BIGINT if dt.bit_width == 64 else Ktype.INT
    if pa.types.is_floating(dt):
        return Ktype.DOUBLE
    if pa.types.is_string(dt) or pa.types.is_large_string(dt):
        return Ktype.STRING
    if pa.types.is_binary(dt) or pa.types.is_large_binary(dt):
        return Ktype.BYTES
    if pa.types.is_timestamp(dt):
        return Ktype.TIMESTAMP
    if pa.types.is_list(dt) or pa.types.is_large_list(dt):
        inner = from_arrow(dt.value_type)
        for arr, base in _ARR_BASE.items():
            if base == inner:
                return arr
        raise TypeError_(f"unsupported list element type {dt.value_type}")
    if pa.types.is_map(dt):
        if not pa.types.is_string(dt.key_type):
            raise TypeError_("MAP keys must be VARCHAR (kinds/ktype.go:62-66)")
        inner = from_arrow(dt.item_type)
        for m, base in _MAP_BASE.items():
            if base == inner:
                return m
        raise TypeError_(f"unsupported map value type {dt.item_type}")
    raise TypeError_(f"unsupported arrow type {dt}")


def is_ordered(dt: pa.DataType) -> bool:
    """Types valid as operands of ordered comparisons (> < >= <=);
    reference: ksql/conditionals.go:150-152, internal/util/types.go:134-148."""
    return (
        pa.types.is_integer(dt)
        or pa.types.is_floating(dt)
        or pa.types.is_string(dt)
        or pa.types.is_large_string(dt)
        or pa.types.is_timestamp(dt)
    )
