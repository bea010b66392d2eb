"""SELECT logical-plan builder with ksqlDB plan-time validation.

Re-expresses the reference's fluent builder (ksql/select_builder.go:14-39
interface; 217-228 Select; 242-245 EmitChanges; 231-234 EmitFinal;
329-396 join verbs; 399-413 From; 432-448 GroupBy; 451-464 Where;
467-472 WithCTE) and enforces the 10 plan rules of SURVEY.md §2.8
(selectRuleSet, ksql/select_builder.go:126-187) before any Ray task
launches. ``returns()`` computes the output Arrow schema exactly the way
the reference's ``Returns()`` does (select_builder.go:663-704): aliased
fields keep their alias, derived fields require one.
"""

from __future__ import annotations

from dataclasses import dataclass, field as dc_field
from typing import Sequence

import pyarrow as pa

from .aggregates import AggExpr
from .catalog import Catalog, Ref, Relation
from .errors import PlanError, SchemaError
from .expr import Expr, Field, Order, wrap
from .windows import Session, Window


@dataclass
class Schema_:
    """FROM/JOIN source reference with kind + alias (ksql/from.go:24-31)."""

    name: str
    ref: Ref | None = None
    alias: str | None = None

    def As(self, alias: str) -> "Schema_":
        self.alias = alias
        return self


def Schema(name: str, ref: Ref | None = None, alias: str | None = None) -> Schema_:
    return Schema_(name, ref, alias)


@dataclass
class JoinClause:
    how: str  # inner | left | right | outer | cross
    source: Schema_
    conds: tuple[Expr, ...] = ()


class SelectBuilder:
    """Accumulates a logical SELECT plan; ``validate()`` applies the rule
    set; execution happens in exec/bounded.py / streaming/driver.py."""

    def __init__(self, *fields: Expr | str):
        if not fields:
            raise PlanError("empty projection (ksql/select_builder.go:517-529)")
        self.fields: list[Expr] = [
            Field(f) if isinstance(f, str) else wrap(f) for f in fields
        ]
        self.source: Schema_ | None = None
        self.joins: list[JoinClause] = []
        self.wheres: list[Expr] = []
        self.groupby: list[Expr] = []
        self.window: Window | None = None
        self.havings: list[Expr] = []
        self.orderbys: list[Order] = []
        self.emit: str | None = None  # None (pull) | "changes" | "final"
        self.cte: tuple[str, "SelectBuilder"] | None = None
        self._cte_alias: str | None = None
        self.as_struct = False  # SelectAsStruct: fold output into one struct col

    # --- fluent verbs ------------------------------------------------------
    def From(self, source: Schema_ | str) -> "SelectBuilder":
        self.source = Schema_(source) if isinstance(source, str) else source
        return self

    def Join(self, source: Schema_ | str, *conds: Expr) -> "SelectBuilder":
        return self._join("inner", source, conds)

    def LeftJoin(self, source: Schema_ | str, *conds: Expr) -> "SelectBuilder":
        return self._join("left", source, conds)

    def RightJoin(self, source: Schema_ | str, *conds: Expr) -> "SelectBuilder":
        return self._join("right", source, conds)

    def OuterJoin(self, source: Schema_ | str, *conds: Expr) -> "SelectBuilder":
        return self._join("outer", source, conds)

    def CrossJoin(self, source: Schema_ | str) -> "SelectBuilder":
        return self._join("cross", source, ())

    def _join(self, how: str, source, conds) -> "SelectBuilder":
        src = Schema_(source) if isinstance(source, str) else source
        if how != "cross" and not conds:
            raise PlanError(f"{how} join requires ON conditions (ksql/join.go:61-103)")
        self.joins.append(JoinClause(how, src, tuple(conds)))
        return self

    def Where(self, *conds: Expr) -> "SelectBuilder":
        self.wheres.extend(conds)  # ANDed (ksql/where.go:34-62)
        return self

    def GroupBy(self, *fields: Expr | str) -> "SelectBuilder":
        self.groupby.extend(Field(f) if isinstance(f, str) else wrap(f) for f in fields)
        return self

    def Windowed(self, window: Window) -> "SelectBuilder":
        self.window = window
        return self

    def Having(self, *conds: Expr) -> "SelectBuilder":
        self.havings.extend(conds)  # ANDed (ksql/having.go:29-75)
        return self

    def OrderBy(self, *orders: Order | Expr) -> "SelectBuilder":
        for o in orders:
            self.orderbys.append(o if isinstance(o, Order) else Order(wrap(o), True))
        return self

    def EmitChanges(self) -> "SelectBuilder":
        self.emit = "changes" if self.emit != "final" else self._emit_conflict()
        return self

    def EmitFinal(self) -> "SelectBuilder":
        if self.emit == "changes":
            self._emit_conflict()
        self.emit = "final"
        return self

    @staticmethod
    def _emit_conflict():
        raise PlanError(
            "EMIT FINAL and EMIT CHANGES are mutually exclusive "
            "(ksql/select_builder.go:171-177)"
        )

    def WithCTE(self, inner: "SelectBuilder") -> "SelectBuilder":
        """Single CTE, ksqlDB-style (select_builder.go:467-472; one only per
        README.md:680). The inner builder must carry an alias via As()."""
        if self.cte is not None:
            raise PlanError("only one CTE is supported (README.md:680)")
        if not inner._cte_alias:
            raise PlanError("CTE requires an alias: inner.As(name)")
        self.cte = (inner._cte_alias, inner)
        return self

    def As(self, alias: str) -> "SelectBuilder":
        self._cte_alias = alias
        return self

    # --- analysis ----------------------------------------------------------
    def _agg_exprs(self) -> list[AggExpr]:
        out: list[AggExpr] = []
        seen: set[str] = set()

        def walk(e):
            if isinstance(e, AggExpr):
                if e.key() not in seen:
                    seen.add(e.key())
                    out.append(e)
                return
            for child in _children(e):
                walk(child)

        for e in self.fields:
            walk(e)
        for e in self.havings:
            walk(e)
        return out

    def has_aggregates(self) -> bool:
        return bool(self._agg_exprs())

    def _source_relation(self, catalog: Catalog) -> Relation:
        assert self.source is not None
        if self.cte and self.source.name == self.cte[0]:
            inner_schema = self.cte[1].returns(catalog)
            return Relation(self.cte[0], Ref.STREAM, inner_schema)
        return catalog.get(self.source.name)

    def source_kind(self, catalog: Catalog) -> Ref:
        rel = self._source_relation(catalog)
        return self.source.ref or rel.kind

    # --- the rule set (SURVEY.md §2.8) -------------------------------------
    def validate(self, catalog: Catalog) -> None:
        if self.source is None:
            raise PlanError("missing FROM source (ksql/select_builder.go:559-561)")
        rel = self._source_relation(catalog)
        kind = self.source.ref or rel.kind
        if kind is Ref.TOPIC:
            raise PlanError("cannot SELECT from a TOPIC (ksql/select_builder.go:559-561)")
        has_agg = self.has_aggregates()

        # rule 1: GROUP BY on a stream requires WINDOW or EMIT CHANGES
        if self.groupby and kind is Ref.STREAM and self.window is None and self.emit != "changes":
            raise PlanError(
                "GROUP BY on a STREAM requires a WINDOW or EMIT CHANGES "
                "(ksql/select_builder.go:131-137)"
            )
        # rule 2: HAVING requires GROUP BY
        if self.havings and not self.groupby:
            raise PlanError("HAVING requires GROUP BY (ksql/select_builder.go:140-145)")
        # rule 3: aggregates require GROUP BY
        if has_agg and not self.groupby:
            raise PlanError(
                "aggregate functions require GROUP BY (ksql/select_builder.go:147-153)"
            )
        # rule 4: WINDOW not allowed on TABLE source
        if self.window is not None and kind is Ref.TABLE:
            raise PlanError("WINDOW is not allowed on a TABLE (ksql/select_builder.go:156-161)")
        # rule 5: EMIT FINAL only on tables (windowed aggregations materialize
        # as tables; ksql/select_builder.go:163-169)
        if self.emit == "final" and kind is not Ref.TABLE and self.window is None:
            raise PlanError("EMIT FINAL is only valid on TABLEs (ksql/select_builder.go:163-169)")
        # rule 9: derived projection fields need aliases — output_name raises
        for e in self.fields:
            e.output_name()
        # join conditions sanity
        for j in self.joins:
            if j.source.ref is Ref.TOPIC:
                raise PlanError("cannot JOIN a TOPIC")
        # windowed session + hopping require an event-time column
        if self.window is not None and not rel.timestamp_col:
            raise PlanError(
                f"windowed query requires a designated event-time column on "
                f"{rel.name} (WITH TIMESTAMP, ksql/metadata.go:40-45)"
            )
        # plan-time type check: every referenced column must exist and every
        # expression must type-check BEFORE any task launches (the linter
        # behavior of §2.9 — reference ReflectionReportRemote,
        # internal/schema/report/reflection.go:11-72)
        schema = self.input_schema(catalog)
        win_cols = {"window_start", "window_end"} if self.window is not None else set()
        out_names: set[str] = set()
        for e in self.fields:
            out_names.add(e.output_name())
        for e in list(self.fields) + list(self.wheres) + list(self.groupby):
            if isinstance(e, Field) and e.name in win_cols:
                continue
            e.out_type(schema)
        for j in self.joins:
            for c in j.conds:
                c.out_type(schema)
        for o in self.orderbys:
            e = o.expr
            if isinstance(e, Field) and (e.name in out_names or e.name in win_cols):
                continue
            e.out_type(schema)

    # --- output schema (Returns(), select_builder.go:663-704) ---------------
    def input_schema(self, catalog: Catalog) -> pa.Schema:
        """Combined schema across FROM + JOIN sources, join columns merged
        (alias-qualified duplicates resolved like virtualSchemas,
        select_builder.go:62-98)."""
        rel = self._source_relation(catalog)
        fields = list(rel.schema)
        names = set(rel.schema.names)
        for j in self.joins:
            jrel = catalog.get(j.source.name)
            for f in jrel.schema:
                if f.name in names:
                    alias = j.source.alias or j.source.name
                    qname = f"{alias}.{f.name}"
                    if qname not in names:
                        fields.append(pa.field(qname, f.type))
                        names.add(qname)
                else:
                    fields.append(f)
                    names.add(f.name)
        return pa.schema(fields)

    def relation_report(self, catalog: Catalog) -> dict[str, dict[str, str]]:
        """All referenced fields per relation, aliases resolved — the
        RelationReport() analog (ksql/select_builder.go:708-740): maps
        relation -> {column -> arrow type} for every column this query
        touches, letting callers lint a query against the catalog before
        execution (SURVEY.md §2.9)."""
        self.validate(catalog)
        rels: list[tuple[str, Relation]] = []
        src = self._source_relation(catalog)
        rels.append((self.source.alias or self.source.name, src))
        for j in self.joins:
            rels.append((j.source.alias or j.source.name, catalog.get(j.source.name)))
        exprs: list[Expr] = list(self.fields) + list(self.wheres) + list(self.groupby) + list(self.havings)
        exprs += [o.expr for o in self.orderbys]
        for j in self.joins:
            exprs += list(j.conds)
        used: set[str] = set()
        for e in exprs:
            used |= e.columns()
        report: dict[str, dict[str, str]] = {}
        for alias, rel in rels:
            cols = {n: str(rel.schema.field(n).type) for n in rel.schema.names if n in used}
            if cols:
                report[alias] = cols
        return report

    def returns(self, catalog: Catalog) -> pa.Schema:
        self.validate(catalog)
        schema = self.input_schema(catalog)
        out = []
        if self.window is not None:
            out.append(pa.field("window_start", pa.timestamp("us")))
            if not isinstance(self.window, Session):
                out.append(pa.field("window_end", pa.timestamp("us")))
            else:
                out.append(pa.field("window_end", pa.timestamp("us")))
        for e in self.fields:
            out.append(pa.field(e.output_name(), e.out_type(schema)))
        return pa.schema(out)


def _children(e: Expr):
    from .expr import Arithmetic, BoolList, BoolTest, Case, Comparison, InList, Not, NullTest

    if isinstance(e, Comparison) or isinstance(e, Arithmetic):
        return [e.left, e.right]
    if isinstance(e, (NullTest, BoolTest, InList, Not)):
        return [e.inner]
    if isinstance(e, BoolList):
        return list(e.exprs)
    if isinstance(e, Case):
        return [w.cond for w in e.whens] + [w.then for w in e.whens] + [e.else_]
    return []


def Select(*fields: Expr | str) -> SelectBuilder:
    """Entry point, mirrors ksql.Select (ksql/select_builder.go:217-228)."""
    return SelectBuilder(*fields)


def SelectAsStruct(*fields: Expr | str) -> SelectBuilder:
    """SELECT returning one struct column per row — the
    ``SelectAsStruct`` verb (ksql/select_builder.go:217-228). The engine
    marks the plan; executors fold the projection into a single
    ``row: struct<...>`` column."""
    b = SelectBuilder(*fields)
    b.as_struct = True
    return b
