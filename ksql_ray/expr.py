"""Expression AST -> vectorized pyarrow.compute evaluation.

Re-implements the reference builder's expression surface (SURVEY.md §2.2):
fields with schema qualifiers and aliases (ksql/field.go:62-107,188-208),
comparisons (ksql/conditionals.go:89-201), IS NULL / IS TRUE tests
(ksql/field.go:144-161, conditionals.go:115-122), IN lists
(ksql/field.go:149-156), AND/OR expression lists
(ksql/expression_list.go:31-45,72-117), arithmetic with nesting
(ksql/arithmetic.go:27-54,100-162) and CASE WHEN with mandatory alias
(ksql/case.go:39-57,72-132).

Instead of rendering SQL strings, every node compiles to a zero-copy
`pyarrow.compute` kernel invocation over an Arrow record batch (a
`pa.Table` block inside `map_batches`). Null semantics are Kleene
(ksqlDB/SQL three-valued logic): `and_kleene` / `or_kleene`, and
`= NULL` literal comparisons become IS NULL exactly as the reference
does (ksql/conditionals.go:184-192).
"""

from __future__ import annotations

import datetime as _dt
from typing import Any, Iterable, Sequence

import pyarrow as pa
import pyarrow.compute as pc

from .errors import PlanError, SchemaError, TypeError_
from .kinds import is_ordered

Batch = pa.Table


def _as_array(x, length: int):
    """Broadcast scalars to the batch length when a kernel needs arrays."""
    if isinstance(x, (pa.Array, pa.ChunkedArray)):
        return x
    return pa.nulls(length).cast(x.type) if x is None else pa.array([x.as_py()] * length, type=x.type)


class Expr:
    """Base expression node. Evaluate with ``eval(batch)`` (vectorized),
    type-check with ``out_type(schema)``."""

    _alias: str | None = None

    # ---- builder surface -------------------------------------------------
    def As(self, alias: str) -> "Expr":
        """Attach an output alias (ksql/field.go:188-208)."""
        self._alias = alias
        return self

    @property
    def alias(self) -> str | None:
        return self._alias

    # comparisons (ksql/field.go:110-141)
    def Equal(self, other) -> "Comparison":
        return Comparison("equal", self, wrap(other))

    def NotEqual(self, other) -> "Comparison":
        return Comparison("not_equal", self, wrap(other))

    def Greater(self, other) -> "Comparison":
        return Comparison("greater", self, wrap(other))

    def Less(self, other) -> "Comparison":
        return Comparison("less", self, wrap(other))

    def GreaterEq(self, other) -> "Comparison":
        return Comparison("greater_equal", self, wrap(other))

    def LessEq(self, other) -> "Comparison":
        return Comparison("less_equal", self, wrap(other))

    def IsNull(self) -> "NullTest":
        return NullTest(self, negate=False)

    def IsNotNull(self) -> "NullTest":
        return NullTest(self, negate=True)

    def IsTrue(self) -> "BoolTest":
        return BoolTest(self, value=True)

    def IsFalse(self) -> "BoolTest":
        return BoolTest(self, value=False)

    def In(self, *vals) -> "InList":
        return InList(self, list(vals), negate=False)

    def NotIn(self, *vals) -> "InList":
        return InList(self, list(vals), negate=True)

    # arithmetic (ksql/arithmetic.go:27-54)
    def Add(self, other) -> "Arithmetic":
        return Arithmetic("add", self, wrap(other))

    def Sub(self, other) -> "Arithmetic":
        return Arithmetic("sub", self, wrap(other))

    def Mul(self, other) -> "Arithmetic":
        return Arithmetic("mul", self, wrap(other))

    def Div(self, other) -> "Arithmetic":
        return Arithmetic("div", self, wrap(other))

    def Mod(self, other) -> "Arithmetic":
        return Arithmetic("mod", self, wrap(other))

    # ordering (ksql/order_by.go, field.go:178-185)
    def Asc(self) -> "Order":
        return Order(self, ascending=True)

    def Desc(self) -> "Order":
        return Order(self, ascending=False)

    # ---- planner surface -------------------------------------------------
    def output_name(self) -> str:
        """Column name in the result schema (Returns() semantics,
        ksql/select_builder.go:663-704). Derived expressions require an
        alias (rule 9, select_builder.go:777-782)."""
        if self._alias:
            return self._alias
        if self.is_derived():
            raise PlanError(
                f"derived expression {self!r} requires an alias "
                "(ksql/select_builder.go:777-782)"
            )
        return self._natural_name()

    def _natural_name(self) -> str:
        raise PlanError(f"expression {self!r} has no natural name; alias required")

    def is_derived(self) -> bool:
        return True

    def is_aggregate(self) -> bool:
        return False

    def columns(self) -> set[str]:
        """Referenced input column names (bare, qualifier stripped)."""
        raise NotImplementedError

    def eval(self, batch: Batch):
        raise NotImplementedError

    def out_type(self, schema: pa.Schema) -> pa.DataType:
        raise NotImplementedError

    def key(self) -> str:
        """Stable identity for grouping/dedup of expressions."""
        return repr(self)


def wrap(v) -> Expr:
    return v if isinstance(v, Expr) else Literal(v)


# --------------------------------------------------------------------------
class Field(Expr):
    """Column reference, optionally ``"schema.col"``-qualified
    (ksql/field.go:62-107)."""

    def __init__(self, name: str):
        if "." in name:
            self.qualifier, self.name = name.rsplit(".", 1)
        else:
            self.qualifier, self.name = None, name

    def _resolve(self, names: Iterable[str]) -> str:
        names = list(names)
        if self.qualifier and f"{self.qualifier}.{self.name}" in names:
            return f"{self.qualifier}.{self.name}"
        if self.name in names:
            return self.name
        raise SchemaError(f"unknown column {self.qualified()} among {sorted(names)}")

    def qualified(self) -> str:
        return f"{self.qualifier}.{self.name}" if self.qualifier else self.name

    def _natural_name(self) -> str:
        return self.name

    def is_derived(self) -> bool:
        return False

    def columns(self) -> set[str]:
        return {self.name}

    def eval(self, batch: Batch):
        return batch.column(self._resolve(batch.column_names))

    def out_type(self, schema: pa.Schema) -> pa.DataType:
        return schema.field(self._resolve(schema.names)).type

    def __repr__(self):
        return f"F({self.qualified()})"


def F(name: str) -> Field:
    """Shorthand constructor, mirrors the reference's ``ksql.F``."""
    return Field(name)


# --------------------------------------------------------------------------
class Literal(Expr):
    """Typed literal (internal/util/types.go:42-119 analog: the Arrow type
    system replaces string serialization)."""

    def __init__(self, value: Any, dtype: pa.DataType | None = None):
        self.value = value
        if dtype is None:
            dtype = self._infer(value)
        self.dtype = dtype

    @staticmethod
    def _infer(v) -> pa.DataType:
        if v is None:
            return pa.null()
        if isinstance(v, bool):
            return pa.bool_()
        if isinstance(v, int):
            return pa.int64()
        if isinstance(v, float):
            return pa.float64()
        if isinstance(v, str):
            return pa.string()
        if isinstance(v, bytes):
            return pa.binary()
        if isinstance(v, _dt.datetime):
            return pa.timestamp("us")
        if isinstance(v, (list, tuple)):
            if not v:
                raise TypeError_("cannot infer type of empty list literal")
            return pa.list_(Literal._infer(v[0]))
        if isinstance(v, dict):
            if not v:
                raise TypeError_("cannot infer type of empty map literal")
            vv = next(iter(v.values()))
            return pa.map_(pa.string(), Literal._infer(vv))
        raise TypeError_(f"unsupported literal {v!r} (internal/util/types.go:42-119)")

    def is_derived(self) -> bool:
        return True

    def columns(self) -> set[str]:
        return set()

    def eval(self, batch: Batch):
        return pa.scalar(self.value, type=self.dtype)

    def out_type(self, schema: pa.Schema) -> pa.DataType:
        return self.dtype

    def __repr__(self):
        return f"Lit({self.value!r})"


# --------------------------------------------------------------------------
class Comparison(Expr):
    """Binary comparison; ``= NULL`` -> IS NULL like the reference
    (ksql/conditionals.go:184-192); ordered ops type-checked
    (conditionals.go:150-152)."""

    _ORDERED = {"greater", "less", "greater_equal", "less_equal"}

    def __init__(self, op: str, left: Expr, right: Expr):
        self.op, self.left, self.right = op, left, right

    def columns(self) -> set[str]:
        return self.left.columns() | self.right.columns()

    def is_aggregate(self) -> bool:
        return self.left.is_aggregate() or self.right.is_aggregate()

    def eval(self, batch: Batch):
        if isinstance(self.right, Literal) and self.right.value is None:
            inner = self.left.eval(batch)
            return pc.is_null(inner) if self.op == "equal" else pc.is_valid(inner)
        l, r = self.left.eval(batch), self.right.eval(batch)
        return getattr(pc, self.op)(l, r)

    def out_type(self, schema: pa.Schema) -> pa.DataType:
        if self.op in self._ORDERED:
            lt = self.left.out_type(schema)
            if not is_ordered(lt):
                raise TypeError_(
                    f"ordered comparison on unordered type {lt} "
                    "(ksql/conditionals.go:150-152)"
                )
        return pa.bool_()

    def __repr__(self):
        return f"({self.left!r} {self.op} {self.right!r})"


class NullTest(Expr):
    def __init__(self, inner: Expr, negate: bool):
        self.inner, self.negate = inner, negate

    def columns(self) -> set[str]:
        return self.inner.columns()

    def eval(self, batch: Batch):
        v = self.inner.eval(batch)
        return pc.is_valid(v) if self.negate else pc.is_null(v)

    def out_type(self, schema: pa.Schema) -> pa.DataType:
        self.inner.out_type(schema)
        return pa.bool_()

    def __repr__(self):
        return f"({self.inner!r} IS {'NOT ' if self.negate else ''}NULL)"


class BoolTest(Expr):
    """IS TRUE / IS FALSE (ksql/conditionals.go:115-122). Null -> false."""

    def __init__(self, inner: Expr, value: bool):
        self.inner, self.value = inner, value

    def columns(self) -> set[str]:
        return self.inner.columns()

    def eval(self, batch: Batch):
        v = self.inner.eval(batch)
        eq = pc.equal(v, pa.scalar(self.value))
        return pc.fill_null(eq, False)

    def out_type(self, schema: pa.Schema) -> pa.DataType:
        if not pa.types.is_boolean(self.inner.out_type(schema)):
            raise TypeError_("IS TRUE/FALSE requires BOOL operand")
        return pa.bool_()

    def __repr__(self):
        return f"({self.inner!r} IS {self.value})"


class InList(Expr):
    """IN / NOT IN over a literal list (ksql/field.go:149-156)."""

    def __init__(self, inner: Expr, values: Sequence[Any], negate: bool):
        if not values:
            raise TypeError_("IN list must be non-empty (internal/util/types.go:10-40)")
        self.inner, self.values, self.negate = inner, list(values), negate

    def columns(self) -> set[str]:
        return self.inner.columns()

    def eval(self, batch: Batch):
        v = self.inner.eval(batch)
        m = pc.is_in(v, value_set=pa.array(self.values))
        if not self.negate:
            return m
        # three-valued logic: NULL NOT IN (...) is NULL (row filtered),
        # not TRUE — pc.is_in maps null inputs to false, so a plain
        # invert would leak null rows through WHERE.
        return pc.if_else(pc.is_valid(v), pc.invert(m), pa.scalar(None, pa.bool_()))

    def out_type(self, schema: pa.Schema) -> pa.DataType:
        self.inner.out_type(schema)
        return pa.bool_()

    def __repr__(self):
        return f"({self.inner!r} {'NOT ' if self.negate else ''}IN {self.values})"


class BoolList(Expr):
    """AND(...) / OR(...) nestable expression lists
    (ksql/expression_list.go:31-45,72-117), Kleene semantics."""

    def __init__(self, op: str, exprs: Sequence[Expr]):
        if not exprs:
            raise PlanError("empty expression list")
        self.op, self.exprs = op, [wrap(e) for e in exprs]

    def columns(self) -> set[str]:
        out: set[str] = set()
        for e in self.exprs:
            out |= e.columns()
        return out

    def is_aggregate(self) -> bool:
        return any(e.is_aggregate() for e in self.exprs)

    def eval(self, batch: Batch):
        kernel = pc.and_kleene if self.op == "and" else pc.or_kleene
        acc = self.exprs[0].eval(batch)
        for e in self.exprs[1:]:
            acc = kernel(acc, e.eval(batch))
        return acc

    def out_type(self, schema: pa.Schema) -> pa.DataType:
        for e in self.exprs:
            e.out_type(schema)
        return pa.bool_()

    def __repr__(self):
        return f"{self.op.upper()}({', '.join(map(repr, self.exprs))})"


def And(*exprs: Expr) -> BoolList:
    return BoolList("and", exprs)


def Or(*exprs: Expr) -> BoolList:
    return BoolList("or", exprs)


class Not(Expr):
    def __init__(self, inner: Expr):
        self.inner = wrap(inner)

    def columns(self) -> set[str]:
        return self.inner.columns()

    def eval(self, batch: Batch):
        return pc.invert(self.inner.eval(batch))

    def out_type(self, schema: pa.Schema) -> pa.DataType:
        return pa.bool_()

    def __repr__(self):
        return f"NOT({self.inner!r})"


# --------------------------------------------------------------------------
_NUMERIC_RANK = {"int32": 0, "int64": 1, "float64": 2}


class Arithmetic(Expr):
    """(l op r) with nesting (ksql/arithmetic.go:100-162). Division follows
    SQL/DuckDB semantics: ``/`` always yields DOUBLE (int division is not in
    the reference's surface; doubles keep oracle parity)."""

    _KERNELS = {"add": pc.add, "sub": pc.subtract, "mul": pc.multiply}

    def __init__(self, op: str, left: Expr, right: Expr):
        self.op, self.left, self.right = op, left, right

    def columns(self) -> set[str]:
        return self.left.columns() | self.right.columns()

    def is_aggregate(self) -> bool:
        return self.left.is_aggregate() or self.right.is_aggregate()

    def eval(self, batch: Batch):
        l, r = self.left.eval(batch), self.right.eval(batch)
        if self.op in self._KERNELS:
            return self._KERNELS[self.op](l, r)
        if self.op == "div":
            return pc.divide(pc.cast(l, pa.float64()), pc.cast(r, pa.float64()))
        if self.op == "mod":
            lt = l.type if hasattr(l, "type") else pa.int64()
            if pa.types.is_integer(lt):
                q = pc.divide(l, r)  # integer division for int inputs
                return pc.subtract(l, pc.multiply(q, r))
            q = pc.floor(pc.divide(pc.cast(l, pa.float64()), pc.cast(r, pa.float64())))
            return pc.subtract(l, pc.multiply(q, r))
        raise PlanError(f"unknown arithmetic op {self.op}")

    def out_type(self, schema: pa.Schema) -> pa.DataType:
        lt, rt = self.left.out_type(schema), self.right.out_type(schema)
        for t in (lt, rt):
            if not (pa.types.is_integer(t) or pa.types.is_floating(t) or pa.types.is_null(t)):
                raise TypeError_(f"arithmetic on non-numeric type {t}")
        if self.op == "div":
            return pa.float64()
        # widen like Arrow's kernels do
        rank = max(_NUMERIC_RANK.get(str(lt), 1), _NUMERIC_RANK.get(str(rt), 1))
        return {0: pa.int32(), 1: pa.int64(), 2: pa.float64()}[rank]

    def __repr__(self):
        return f"({self.left!r} {self.op} {self.right!r})"


def Add(l, r) -> Arithmetic:
    return Arithmetic("add", wrap(l), wrap(r))


def Sub(l, r) -> Arithmetic:
    return Arithmetic("sub", wrap(l), wrap(r))


def Mul(l, r) -> Arithmetic:
    return Arithmetic("mul", wrap(l), wrap(r))


def Div(l, r) -> Arithmetic:
    return Arithmetic("div", wrap(l), wrap(r))


def Mod(l, r) -> Arithmetic:
    return Arithmetic("mod", wrap(l), wrap(r))


# --------------------------------------------------------------------------
class CaseWhen:
    """One WHEN cond THEN value arm (ksql/case.go:39-57)."""

    def __init__(self, cond: Expr, then: Any):
        self.cond, self.then = cond, wrap(then)


class Case(Expr):
    """CASE WHEN ... THEN ... ELSE ... END AS alias; alias mandatory
    (ksql/case.go:81-83); default ELSE NULL (case.go:72-132).
    Compiled to a chain of ``pc.if_else``."""

    def __init__(self, alias: str, *whens: CaseWhen):
        if not alias:
            raise PlanError("CASE requires an alias (ksql/case.go:81-83)")
        if not whens:
            raise PlanError("CASE requires at least one WHEN arm")
        self._alias = alias
        self.whens = list(whens)
        self.else_: Expr = Literal(None)

    def Else(self, v) -> "Case":
        self.else_ = wrap(v)
        return self

    def columns(self) -> set[str]:
        out: set[str] = set()
        for w in self.whens:
            out |= w.cond.columns() | w.then.columns()
        return out | self.else_.columns()

    def is_aggregate(self) -> bool:
        return any(
            w.cond.is_aggregate() or w.then.is_aggregate() for w in self.whens
        ) or self.else_.is_aggregate()

    def _branch_type(self, schema: pa.Schema) -> pa.DataType:
        types = [w.then.out_type(schema) for w in self.whens]
        t_else = self.else_.out_type(schema)
        if not pa.types.is_null(t_else):
            types.append(t_else)
        types = [t for t in types if not pa.types.is_null(t)]
        if not types:
            return pa.null()
        out = types[0]
        for t in types[1:]:
            if t != out:
                if {str(t), str(out)} <= set(_NUMERIC_RANK):
                    r = max(_NUMERIC_RANK[str(t)], _NUMERIC_RANK[str(out)])
                    out = {0: pa.int32(), 1: pa.int64(), 2: pa.float64()}[r]
                else:
                    raise TypeError_(f"CASE branch type mismatch: {out} vs {t}")
        return out

    def eval(self, batch: Batch):
        n = batch.num_rows
        thens = [w.then.eval(batch) for w in self.whens]
        target = next(
            (t.type for t in thens if not pa.types.is_null(t.type)), pa.null()
        )
        acc = self.else_.eval(batch)
        if pa.types.is_null(acc.type):
            acc = pa.nulls(n, type=target)
        for w, then in zip(reversed(self.whens), reversed(thens)):
            cond = pc.fill_null(w.cond.eval(batch), False)
            if pa.types.is_null(then.type):
                then = pa.nulls(n, type=target)
            acc = pc.if_else(cond, then, acc)
        return acc

    def out_type(self, schema: pa.Schema) -> pa.DataType:
        for w in self.whens:
            ct = w.cond.out_type(schema)
            if not pa.types.is_boolean(ct):
                raise TypeError_("CASE WHEN condition must be BOOL")
        return self._branch_type(schema)

    def __repr__(self):
        return f"CASE[{self._alias}]({len(self.whens)} whens)"


# --------------------------------------------------------------------------
class Order:
    """ORDER BY key with direction (ksql/order_by.go:50-63)."""

    def __init__(self, expr: Expr, ascending: bool):
        self.expr, self.ascending = expr, ascending

    def __repr__(self):
        return f"{self.expr!r} {'ASC' if self.ascending else 'DESC'}"
