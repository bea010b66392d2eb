"""Join execution: broadcast hash join + shuffle hash join.

Reference surface: ksql/join.go:28-34 (INNER/LEFT/RIGHT/OUTER/CROSS),
61-103 (ON-condition rendering incl. compound AND/OR), builder verbs
ksql/select_builder.go:329-396. The reference only *renders* joins;
execution here is Ray-Data-first (SURVEY.md §2.5):

* **Broadcast join** — when the build side is small (a ksql TABLE lookup,
  e.g. ``conv_meta`` keyed by ``conv_id``): the build table is put into the
  object store ONCE (``ray.put``) and every ``map_batches`` task performs a
  zero-copy ``pa.Table.join`` per batch. Used for INNER/LEFT/CROSS where
  per-batch semantics are correct.
* **Shuffle join** — both sides large, or RIGHT/FULL OUTER (which need
  global knowledge of unmatched build rows): Ray Data's native hash
  shuffle join (``Dataset.join``), hash-partitioned on the key.

Compound ON conditions: equi pairs become hash keys; residual conditions
are applied post-join. For LEFT/OUTER joins the residual re-nulls rows
whose only matches failed the residual (SQL ON semantics), implemented
vectorized via row-id anti-membership.
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray

from ..builder import JoinClause
from ..errors import PlanError
from ..expr import BoolList, Comparison, Expr, Field

BROADCAST_MAX_BYTES = 256 * 1024 * 1024  # build side must fit in worker heap


def _flatten_and(conds: Sequence[Expr]) -> list[Expr]:
    out: list[Expr] = []
    for c in conds:
        if isinstance(c, BoolList) and c.op == "and":
            out.extend(_flatten_and(c.exprs))
        else:
            out.append(c)
    return out


def extract_equi_keys(
    conds: Sequence[Expr],
    left_names: set[str],
    right_names: set[str],
    right_alias: str,
):
    """Split ON conditions into (left_keys, right_keys, residual)."""
    lk: list[str] = []
    rk: list[str] = []
    residual: list[Expr] = []
    for c in _flatten_and(conds):
        if (
            isinstance(c, Comparison)
            and c.op == "equal"
            and isinstance(c.left, Field)
            and isinstance(c.right, Field)
        ):
            a, b = c.left, c.right
            a_right = a.qualifier == right_alias or (
                a.qualifier is None and a.name in right_names and a.name not in left_names
            )
            b_right = b.qualifier == right_alias or (
                b.qualifier is None and b.name in right_names and b.name not in left_names
            )
            if a_right and not b_right:
                rk.append(a.name)
                lk.append(b.name)
                continue
            if b_right and not a_right:
                rk.append(b.name)
                lk.append(a.name)
                continue
        residual.append(c)
    if not lk and conds:
        raise PlanError(
            "join requires at least one equi condition between the two sides "
            "(ksql/join.go:61-103)"
        )
    return lk, rk, residual


def plan_right_renames(
    left_names: Sequence[str], right_schema: pa.Schema, right_keys: Sequence[str],
    left_keys: Sequence[str], right_alias: str,
) -> dict[str, str]:
    """Qualify colliding build-side columns as ``alias.col`` — the
    virtualSchemas disambiguation (ksql/select_builder.go:62-98). Key
    columns that are merged (same name on both sides) are skipped."""
    merged_keys = {r for l, r in zip(left_keys, right_keys) if l == r}
    renames = {}
    for f in right_schema:
        if f.name in left_names and f.name not in merged_keys:
            renames[f.name] = f"{right_alias}.{f.name}"
    return renames


class BroadcastJoiner:
    """Callable-class map_batches stage: fetch the build table once per
    actor (__init__), join every batch vectorized (__call__). SURVEY.md
    'Stateful stages are actor pools'."""

    def __init__(
        self,
        build_ref,
        how: str,
        left_keys: list[str],
        right_keys: list[str],
        residual: list[Expr],
    ):
        self.build: pa.Table = ray.get(build_ref) if not isinstance(build_ref, pa.Table) else build_ref
        self.how = how
        self.left_keys = left_keys
        self.right_keys = right_keys
        self.residual = residual

    def __call__(self, batch: pa.Table) -> pa.Table:
        return join_batch(
            batch, self.build, self.how, self.left_keys, self.right_keys, self.residual
        )


def join_batch(
    left: pa.Table,
    right: pa.Table,
    how: str,
    left_keys: list[str],
    right_keys: list[str],
    residual: list[Expr],
) -> pa.Table:
    """Vectorized per-batch join (build side broadcast)."""
    if how == "cross":
        lk = left.append_column("__x", pa.array(np.zeros(left.num_rows, dtype=np.int8)))
        rk = right.append_column("__x", pa.array(np.zeros(right.num_rows, dtype=np.int8)))
        out = lk.join(rk, keys=["__x"], join_type="inner")
        return out.drop_columns(["__x"])

    jt = {"inner": "inner", "left": "left outer"}[how]
    need_residual_fix = bool(residual) and how == "left"
    if need_residual_fix or bool(residual):
        left = left.append_column(
            "__lrow", pa.array(np.arange(left.num_rows), type=pa.int64())
        )
    out = left.join(
        right, keys=left_keys, right_keys=right_keys, join_type=jt, use_threads=False
    )
    if residual:
        mask = None
        for c in residual:
            m = c.eval(out)
            mask = m if mask is None else pc.and_kleene(mask, m)
        if how == "left":
            # ON-residual: keep unmatched-left null rows, and re-null rows
            # whose matches all failed the residual
            rmask = pc.fill_null(mask, False)
            # rows with no match at all have nulls in right key column
            matched = out.filter(rmask)
            all_lrows = left.column("__lrow")
            surviving = matched.column("__lrow")
            lost = pc.is_in(all_lrows, value_set=pc.unique(
                surviving.combine_chunks() if isinstance(surviving, pa.ChunkedArray) else surviving
            ))
            unmatched_left = left.filter(pc.invert(lost))
            pad = _null_pad(unmatched_left, matched.schema)
            out = pa.concat_tables([matched, pad], promote_options="permissive")
        else:
            out = out.filter(pc.fill_null(mask, False))
    if "__lrow" in out.column_names:
        out = out.drop_columns(["__lrow"])
    return out


def _null_pad(left_part: pa.Table, target_schema: pa.Schema) -> pa.Table:
    cols = []
    for f in target_schema:
        if f.name in left_part.column_names:
            col = left_part.column(f.name)
            if col.type != f.type:
                col = pc.cast(col, f.type)
            cols.append(col)
        else:
            cols.append(pa.nulls(left_part.num_rows, type=f.type))
    return pa.Table.from_arrays(cols, schema=target_schema)


def shuffle_join(
    left_ds,
    right_ds,
    how: str,
    left_keys: list[str],
    right_keys: list[str],
    num_partitions: int,
):
    """Large-large path: Ray Data native hash shuffle join."""
    jt = {
        "inner": "inner",
        "left": "left_outer",
        "right": "right_outer",
        "outer": "full_outer",
    }[how]
    return left_ds.join(
        right_ds,
        join_type=jt,
        num_partitions=num_partitions,
        on=tuple(left_keys),
        right_on=tuple(right_keys),
    )
