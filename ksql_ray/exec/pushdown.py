"""WHERE-clause pushdown into the Parquet scanner.

Translates the sargable subset of the engine's expression tree into a
``pyarrow.dataset`` filter expression so row groups whose statistics
exclude the predicate are SKIPPED AT THE READ — at 100 TB this is the
difference between scanning a month and scanning a day of a
time-partitioned corpus. The reference delegates scans to ksqlDB and
has no pushdown surface.

Safety contract: the translation is CONSERVATIVE — it may select a
SUPERSET of the true WHERE rows (untranslatable AND-conjuncts are
dropped), never a subset, and the engine's fused in-memory filter
still runs afterwards, so results are bit-identical with or without
pushdown (pytest pins this). ``exact`` tracks whether a sub-expression
translated losslessly: OR and NOT require exact children (dropping a
conjunct inside OR/NOT would widen the wrong way), AND does not.

Translated forms: Field <cmp> Literal (both orders), IS [NOT] NULL,
``= NULL``→IS NULL (the reference's rule), IN (non-negated; NOT IN's
three-valued semantics stay in-memory), AND/OR lists, NOT. Everything
else (arithmetic, CASE, aggregates, CTE columns) stays in-memory.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from ..expr import (BoolList, Comparison, Expr, Field, InList, Literal,
                    Not, NullTest)

__all__ = ["to_scanner_filter"]

_FLIP = {"greater": "less", "less": "greater",
         "greater_equal": "less_equal", "less_equal": "greater_equal",
         "equal": "equal", "not_equal": "not_equal"}


def _field(f: Field, names: set[str]):
    return pc.field(f.name) if f.name in names else None


def _literal(lit: Literal):
    try:
        return pa.scalar(lit.value, lit.dtype)
    except (pa.ArrowInvalid, pa.ArrowTypeError, pa.ArrowNotImplementedError):
        return None


def _cmp(op: str, fld, val):
    if op == "equal":
        return fld == val
    if op == "not_equal":
        return fld != val
    if op == "greater":
        return fld > val
    if op == "greater_equal":
        return fld >= val
    if op == "less":
        return fld < val
    if op == "less_equal":
        return fld <= val
    return None


def _translate(e: Expr, names: set[str]):
    """-> (pyarrow dataset expression | None, exact: bool)."""
    if isinstance(e, Comparison):
        left, right, op = e.left, e.right, e.op
        if isinstance(left, Literal) and isinstance(right, Field):
            left, right, op = right, left, _FLIP.get(op)
            if op is None:
                return None, False
        if not (isinstance(left, Field) and isinstance(right, Literal)):
            return None, False
        fld = _field(left, names)
        if fld is None:
            return None, False
        if right.value is None:
            # `= NULL` -> IS NULL; `!= NULL` -> IS NOT NULL (builder rule)
            if op == "equal":
                return fld.is_null(), True
            if op == "not_equal":
                return ~fld.is_null(), True
            return None, False
        val = _literal(right)
        if val is None:
            return None, False
        out = _cmp(op, fld, val)
        return (out, True) if out is not None else (None, False)
    if isinstance(e, NullTest):
        if not isinstance(e.inner, Field):
            return None, False
        fld = _field(e.inner, names)
        if fld is None:
            return None, False
        return (~fld.is_null() if e.negate else fld.is_null()), True
    if isinstance(e, InList):
        if e.negate or not isinstance(e.inner, Field):
            # NOT IN is three-valued; keep it in-memory
            return None, False
        fld = _field(e.inner, names)
        if fld is None:
            return None, False
        try:
            return fld.isin(e.values), True
        except (pa.ArrowInvalid, pa.ArrowTypeError):
            return None, False
    if isinstance(e, BoolList):
        parts = [_translate(c, names) for c in e.exprs]
        if e.op == "and":
            got = [p for p, _x in parts if p is not None]
            if not got:
                return None, False
            out = got[0]
            for p in got[1:]:
                out = out & p
            return out, all(p is not None and x for p, x in parts)
        # OR: a dropped branch would narrow the superset -> need all exact
        if any(p is None or not x for p, x in parts):
            return None, False
        out = parts[0][0]
        for p, _x in parts[1:]:
            out = out | p
        return out, True
    if isinstance(e, Not):
        inner, exact = _translate(e.inner, names)
        if inner is None or not exact:
            return None, False
        return ~inner, True
    return None, False


def to_scanner_filter(conds, schema_names) -> tuple[object, int]:
    """Conjunction of the translatable WHERE conjuncts as a
    ``pyarrow.dataset`` expression (None if nothing translates), plus
    how many of the conjuncts were pushed (for EXPLAIN)."""
    names = set(schema_names)
    out = None
    pushed = 0
    for c in conds:
        expr, _exact = _translate(c, names)
        if expr is None:
            continue
        pushed += 1
        out = expr if out is None else out & expr
    return out, pushed
