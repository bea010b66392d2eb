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
    """Vectorized table-level join with full ON semantics (equi keys +
    residual conditions) for INNER/LEFT/RIGHT/OUTER/CROSS.

    Residual + outer joins use local row ids: inner-join on the equi
    keys, filter by the residual, then null-pad each side's rows with no
    SURVIVING match (compound-ON rendering, reference ksql/join.go:61-103
    + join_test.go:81-100). Correct whenever both sides' rows for a key
    are fully present — a broadcast build side, or one co-partition of a
    hash-partitioned pair (never a per-batch RIGHT/OUTER broadcast, which
    would re-emit build-side pads per batch)."""
    if how == "cross":
        lk = left.append_column("__x", pa.array(np.zeros(left.num_rows, dtype=np.int8)))
        rk = right.append_column("__x", pa.array(np.zeros(right.num_rows, dtype=np.int8)))
        out = lk.join(rk, keys=["__x"], join_type="inner")
        return out.drop_columns(["__x"])

    if not residual:
        jt = {
            "inner": "inner", "left": "left outer",
            "right": "right outer", "outer": "full outer",
        }[how]
        return left.join(
            right, keys=left_keys, right_keys=right_keys, join_type=jt,
            use_threads=False,
        )

    l2 = left.append_column("__lrow", pa.array(np.arange(left.num_rows), type=pa.int64()))
    r2 = right.append_column("__rrow", pa.array(np.arange(right.num_rows), type=pa.int64()))
    out = l2.join(
        r2, keys=left_keys, right_keys=right_keys, join_type="inner",
        use_threads=False,
    )
    mask = None
    for c in residual:
        m = c.eval(out)
        mask = m if mask is None else pc.and_kleene(mask, m)
    surv = out.filter(pc.fill_null(mask, False))
    pieces = [surv]
    target_schema = surv.schema

    def _lost(all_tbl: pa.Table, id_col: str, surviving) -> pa.Table:
        if isinstance(surviving, pa.ChunkedArray):
            surviving = surviving.combine_chunks()
        hit = pc.is_in(all_tbl.column(id_col), value_set=pc.unique(surviving))
        return all_tbl.filter(pc.invert(hit))

    if how in ("left", "outer"):
        pieces.append(_null_pad(
            _lost(l2, "__lrow", surv.column("__lrow")), target_schema
        ))
    if how in ("right", "outer"):
        r_lost = _lost(r2, "__rrow", surv.column("__rrow"))
        pad = _null_pad(r_lost, target_schema)
        # the inner join keeps only the left key column (coalesced name);
        # right pads carry their key value in it, matching the shuffle
        # join's USING-style coalescing
        for lkc, rkc in zip(left_keys, right_keys):
            if lkc != rkc and lkc in pad.column_names and rkc in r_lost.column_names:
                i = pad.column_names.index(lkc)
                pad = pad.set_column(
                    i, lkc,
                    pc.cast(r_lost.column(rkc), pad.schema.field(lkc).type),
                )
        pieces.append(pad)
    out = pa.concat_tables([p for p in pieces if p.num_rows], promote_options="permissive") \
        if any(p.num_rows for p in pieces) else surv
    return out.drop_columns([c for c in ("__lrow", "__rrow") if c in out.column_names])


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


def copartition_join(
    left_ds,
    right_ds,
    how: str,
    left_keys: list[str],
    right_keys: list[str],
    residual: list[Expr],
    num_partitions: int,
    left_schema: pa.Schema,
    right_schema: pa.Schema,
):
    """Residual (compound-ON) LEFT/RIGHT/OUTER joins at scale: both sides
    are hash-partitioned by join key (side-tagged union through one
    sort shuffle), then each co-partition is joined at the TABLE level by
    ``join_batch`` — every row of a key is fully present in its
    partition, so null-padding rows with no surviving match is exact.
    The per-batch broadcast path cannot do this for RIGHT/OUTER (it
    would re-emit build-side pads per batch)."""
    from .groupby import hash_partition_ids

    right_only = [f for f in right_schema if f.name not in left_schema.names]
    all_fields = list(left_schema) + right_only
    key_types = {lk: left_schema.field(lk).type for lk in left_keys}

    def make_tag(side: int, keys: list[str], schema: pa.Schema):
        def tag(batch: pa.Table) -> pa.Table:
            from ..streaming.driver import limit_worker_threads

            limit_worker_threads()
            n = batch.num_rows
            cols = {}
            for f in all_fields:
                if f.name in batch.column_names:
                    c = batch.column(f.name)
                    if c.type != f.type:
                        c = pc.cast(c, f.type)
                    cols[f.name] = c
                else:
                    cols[f.name] = pa.nulls(n, type=f.type)
            tbl = pa.table(cols)
            # hash over the side's OWN key values, cast to the left key
            # types so equal values hash identically on both sides
            ktbl = pa.table({
                lk: pc.cast(batch.column(k), key_types[lk])
                for lk, k in zip(left_keys, keys)
            })
            part = hash_partition_ids(ktbl, left_keys, num_partitions)
            tbl = tbl.append_column("__side", pa.array(np.full(n, side, dtype=np.int8)))
            return tbl.append_column("__part", pa.array(part, type=pa.int64()))

        return tag

    tagged = left_ds.map_batches(
        make_tag(0, left_keys, left_schema), batch_format="pyarrow", zero_copy_batch=True
    ).union(right_ds.map_batches(
        make_tag(1, right_keys, right_schema), batch_format="pyarrow", zero_copy_batch=True
    ))

    lnames = list(left_schema.names)
    rnames = [f.name for f in right_schema]

    def fix(group: pa.Table) -> pa.Table:
        from ..streaming.driver import limit_worker_threads

        limit_worker_threads()
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        side = group.column("__side").to_numpy(zero_copy_only=False)
        lpart = group.filter(pa.array(side == 0)).select(lnames)
        rpart = group.filter(pa.array(side == 1)).select(rnames)
        out = join_batch(lpart, rpart, how, left_keys, right_keys, residual)
        order = list(dict.fromkeys(lnames + rnames))
        return out.select([c for c in order if c in out.column_names])

    from .exchange import exchange_map_groups, use_direct_exchange

    if use_direct_exchange():
        return exchange_map_groups(tagged, num_partitions, fix)
    return tagged.groupby("__part").map_groups(fix, batch_format="pyarrow")


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
