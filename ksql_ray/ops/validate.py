"""Declarative data-contract validation: violation counts per rule.

The expectation-check pass (Great-Expectations-style) a 100 TB ingest
runs before accepting a feed: NOT NULL, uniqueness, value domains,
numeric ranges, regex shape, monotone event time per key. The
reference client has no validation surface beyond plan-time schema
rules (ksql/select_builder.go:126-187 — query-shape checks, not data
checks).

Scale shape: ONE streaming pass; every rule folds to a per-batch
COUNTER partial (a handful of int64s per batch regardless of rows),
merged by ``smallagg.grouped_sum`` — except ``unique``, whose partial
is the batch's distinct (rule, value) pairs (bounded by per-batch
distinct values) counted exactly through one value exchange, and
``increasing_by``, which shuffles only (key, ts) pairs to check
cross-batch orderedness per key. Nothing materializes rows.

Rules (each a tuple, mirrored verbatim by the gate oracle):

* ``("not_null", col)`` — violations = NULL rows
* ``("unique", col)`` — violations = rows beyond the first per value
  (SQL ``count(*) - count(DISTINCT col)``; NULLs ignored)
* ``("in_set", col, values)`` — non-NULL rows outside the set
* ``("range", col, lo, hi)`` — non-NULL rows outside [lo, hi]; float
  NaN counts as OUT of range (DuckDB's total order puts NaN above all
  numbers, so the oracle's ``value > hi`` flags NaN rows — ADVICE r4)
* ``("regex", col, pattern)`` — non-NULL rows NOT fully matching
* ``("increasing_by", ts_col, key_col, order_col)`` — per key, order
  rows by ``order_col`` (a total order, e.g. the event id / offset)
  and count adjacent pairs whose ts DECREASES (0 on time-ordered
  feeds) — SQL ``lag(ts) OVER (PARTITION BY key ORDER BY order)``
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .dedup import _partition_by, _pin

__all__ = ["validate_rules"]

_COUNTER_KINDS = {"not_null", "in_set", "range", "regex"}


def _rule_name(rule: tuple) -> str:
    kind, col = rule[0], rule[1]
    return f"{kind}({col})"


def _counter_partial(batch: pa.Table, rules: list[tuple]) -> pa.Table:
    names, bad = [], []
    for rule in rules:
        kind, col = rule[0], rule[1]
        if kind not in _COUNTER_KINDS:
            continue
        c = batch.column(col)
        if kind == "not_null":
            v = c.null_count
        elif kind == "in_set":
            ok = pc.is_in(c, value_set=pa.array(list(rule[2])))
            v = pc.sum(pc.cast(pc.and_kleene(
                pc.is_valid(c), pc.invert(pc.fill_null(ok, False))),
                pa.int64())).as_py() or 0
        elif kind == "range":
            lo, hi = rule[2], rule[3]
            out = pc.or_kleene(pc.less(c, lo), pc.greater(c, hi))
            if pa.types.is_floating(c.type):
                # NaN: pc.less/greater say False, but DuckDB's total
                # order ranks NaN above every number — match it
                out = pc.or_kleene(out, pc.is_nan(c))
            v = pc.sum(pc.cast(pc.fill_null(out, False),
                               pa.int64())).as_py() or 0
        else:  # regex — full match
            m = pc.match_substring_regex(
                pc.cast(c, pa.string()), f"^(?:{rule[2]})$")
            v = pc.sum(pc.cast(pc.and_kleene(
                pc.is_valid(c), pc.invert(pc.fill_null(m, False))),
                pa.int64())).as_py() or 0
        names.append(_rule_name(rule))
        bad.append(int(v))
    return pa.table({"rule": pa.array(names, type=pa.string()),
                     "violations": pa.array(bad, type=pa.int64())})


def validate_rules(ds: ray.data.Dataset,
                   rules: list[tuple],
                   num_partitions: int = 32) -> ray.data.Dataset:
    """-> (rule, violations) one row per rule (insertion-order
    independent; rule label = ``kind(col)``)."""
    from .smallagg import grouped_sum

    if not rules:
        raise ValueError("rules must be non-empty")
    kinds = {r[0] for r in rules}
    bad = kinds - _COUNTER_KINDS - {"unique", "increasing_by"}
    if bad:
        raise ValueError(f"unknown rule kinds: {sorted(bad)}")
    labels = [_rule_name(r) for r in rules]
    dups = sorted({x for x in labels if labels.count(x) > 1})
    if dups:
        # two same-kind rules on one column would silently SUM their
        # violation counts into one row (ADVICE r4) — refuse instead
        raise ValueError(
            f"duplicate rule labels {dups}: at most one rule of each "
            "kind per column")

    outs: list[ray.data.Dataset] = []
    counter_rules = [r for r in rules if r[0] in _COUNTER_KINDS]
    if counter_rules:
        parts = ds.map_batches(
            _pin(lambda b: _counter_partial(b, counter_rules)),
            batch_format="pyarrow", zero_copy_batch=True)
        outs.append(grouped_sum(parts, ["rule"], ["violations"]))

    for rule in rules:
        if rule[0] == "unique":
            col = rule[1]
            name = _rule_name(rule)

            def dpart(b: pa.Table, col=col) -> pa.Table:
                u = pc.unique(b.column(col)).drop_null()
                n_valid = b.num_rows - b.column(col).null_count
                # per-batch: rows beyond the first per value; the
                # cross-batch correction counts values seen in >1
                # batch via the value exchange below
                return pa.table({
                    "val": pc.cast(u, pa.string()),
                    "cnt": pa.array(
                        np.zeros(len(u), np.int64) + 1, pa.int64()),
                    "extra": pa.array(
                        [int(n_valid - len(u))] + [0] * (len(u) - 1)
                        if len(u) else [], pa.int64()),
                })

            parts = ds.map_batches(_pin(dpart), batch_format="pyarrow",
                                   zero_copy_batch=True)

            def merge(group: pa.Table, name=name) -> pa.Table:
                if "__part" in group.column_names or \
                        "val" not in group.column_names:
                    if "__part" in group.column_names:
                        group = group.drop_columns(["__part"])
                if group.num_rows == 0 or \
                        "val" not in group.column_names:
                    return pa.table({
                        "rule": pa.array([], type=pa.string()),
                        "violations": pa.array([], type=pa.int64())})
                df = group.to_pandas()
                # duplicates across batches: each value's batch-count
                # minus 1; plus the intra-batch extras
                per_val = df.groupby("val")["cnt"].sum() - 1
                v = int(per_val.sum() + df["extra"].sum())
                return pa.table({
                    "rule": pa.array([name], type=pa.string()),
                    "violations": pa.array([v], type=pa.int64())})

            merged = _partition_by(parts, ["val"], num_partitions)\
                .map_groups(_pin(merge), batch_format="pyarrow")
            outs.append(grouped_sum(merged, ["rule"], ["violations"]))
        elif rule[0] == "increasing_by":
            ts_col, key_col, order_col = rule[1], rule[2], rule[3]
            name = _rule_name(rule)

            def tpart(b: pa.Table, ts_col=ts_col, key_col=key_col,
                      order_col=order_col) -> pa.Table:
                return pa.table({
                    "k": pc.cast(b.column(key_col), pa.string()),
                    "t": pc.cast(b.column(ts_col), pa.int64()),
                    "o": pc.cast(b.column(order_col), pa.int64()),
                })

            parts = ds.map_batches(_pin(tpart), batch_format="pyarrow",
                                   zero_copy_batch=True)

            def check(group: pa.Table, name=name) -> pa.Table:
                if "__part" in group.column_names:
                    group = group.drop_columns(["__part"])
                if group.num_rows == 0 or \
                        "k" not in group.column_names:
                    return pa.table({
                        "rule": pa.array([], type=pa.string()),
                        "violations": pa.array([], type=pa.int64())})
                tbl = group.take(pc.sort_indices(group, sort_keys=[
                    ("k", "ascending"), ("o", "ascending")]))
                k = tbl.column("k").to_numpy(zero_copy_only=False)
                t = tbl.column("t").to_numpy(zero_copy_only=False)
                same = k[1:] == k[:-1]
                v = int((same & (np.diff(t) < 0)).sum())
                return pa.table({
                    "rule": pa.array([name], type=pa.string()),
                    "violations": pa.array([v], type=pa.int64())})

            merged = _partition_by(parts, ["k"], num_partitions)\
                .map_groups(_pin(check), batch_format="pyarrow")
            outs.append(grouped_sum(merged, ["rule"], ["violations"]))

    # zero seed per rule: an all-NULL unique column (or an empty
    # input) contributes no partial rows, but SQL still reports the
    # rule with 0 violations; the final grouped_sum folds seeds and
    # partials into exactly one row per rule
    zeros = ray.data.from_arrow(pa.table({
        "rule": pa.array([_rule_name(r) for r in rules],
                         type=pa.string()),
        "violations": pa.array([0] * len(rules), type=pa.int64())}))
    out = zeros
    for o in outs:
        out = out.union(o)
    from .smallagg import grouped_sum as _gs

    return _gs(out, ["rule"], ["violations"])
