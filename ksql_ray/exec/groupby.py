"""Distributed two-phase grouped aggregation over Ray Data.

Design (SURVEY.md §2.3 "RD mapping" and §7.3): the reference delegates
GROUP BY execution to ksqlDB; here it becomes

  phase 1 — ``ds.map_batches(partial_fn, batch_format="pyarrow")``:
      one vectorized ``pa.TableGroupBy`` per Arrow batch emits *one row per
      (group key, batch)* carrying algebraic partials. This is the combiner
      that keeps the all-to-all exchange proportional to key cardinality,
      not row count (critical at 100 TB).
  phase 2 — ``partials.groupby("__part").map_groups(merge_fn)``:
      partials are hash-partitioned by group key (vectorized
      ``pd.util.hash_array``); each partition is sorted by key so groups
      are contiguous segments, then merged with deterministic numpy
      segment reductions (aggregates.MergeCtx) — never a grouped Acero
      kernel (emission order is not guaranteed) and never a Python loop
      per group.

Windows (SURVEY.md §2.4): tumbling adds a computed ``window_start`` key;
hopping flat-maps each row into its covering windows before phase 1;
session windows co-locate raw rows per key partition and split on gaps
vectorized (they cannot be pre-aggregated per batch because sessions merge
across batches).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc

from ..aggregates import AggExpr, CollectList, EarliestByOffset, LatestByOffset
from ..errors import PlanError
from ..expr import Expr
from ..windows import Hopping, Session, Tumbling, Window

DEFAULT_NUM_PARTITIONS = 64


def hash_partition_ids(tbl: pa.Table, cols: Sequence[str], num_partitions: int) -> np.ndarray:
    """Deterministic vectorized hash of key columns -> partition ids."""
    acc = np.zeros(tbl.num_rows, dtype=np.uint64)
    for c in cols:
        col = tbl.column(c)
        arr = col.to_numpy(zero_copy_only=False)
        h = pd.util.hash_array(arr, hash_key="ksql_ray_0000001")
        acc = acc * np.uint64(31) + h
    return (acc % np.uint64(num_partitions)).astype(np.int64)


def _segment_starts(tbl: pa.Table, key_cols: Sequence[str]) -> np.ndarray:
    """Row indices where a new group starts in a key-sorted table
    (null-safe adjacent compare, vectorized)."""
    n = tbl.num_rows
    if n == 0:
        return np.array([], dtype=np.int64)
    change = np.zeros(n - 1, dtype=bool)
    for k in key_cols:
        col = tbl.column(k)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        a, b = col.slice(1), col.slice(0, n - 1)
        ne = pc.fill_null(pc.not_equal(a, b), False).to_numpy(zero_copy_only=False)
        va = pc.is_valid(a).to_numpy(zero_copy_only=False)
        vb = pc.is_valid(b).to_numpy(zero_copy_only=False)
        change |= ne.astype(bool) | (va != vb)
    return np.concatenate(([0], np.nonzero(change)[0] + 1)).astype(np.int64)


def _ts_us(batch: pa.Table, ts_col: str) -> np.ndarray:
    ts = batch.column(ts_col)
    return pc.cast(ts, pa.int64()).to_numpy(zero_copy_only=False)


class GroupByPlan:
    """Compiled grouped-aggregation stage."""

    def __init__(
        self,
        key_exprs: Sequence[Expr],
        aggs: Sequence[AggExpr],
        order_cols: Sequence[str],
        window: Window | None = None,
        ts_col: str | None = None,
        num_partitions: int = DEFAULT_NUM_PARTITIONS,
        include_ts: bool = False,
        salt_by_window: bool = False,
    ):
        self.key_exprs = list(key_exprs)
        self.aggs = list(aggs)
        self.window = window
        self.ts_col = ts_col
        self.num_partitions = num_partitions
        self.include_ts = include_ts  # streaming: carry per-key max ts + row count
        # hot-key salting (north_rule): include the window id in the routing
        # hash so a hot conversation's windows spread across state actors;
        # each partition's watermark stays monotone over ITS routed rows,
        # and a (key, window) still lives on exactly one actor
        self.salt_by_window = salt_by_window

        self.needs_order = any(a.needs_order for a in self.aggs)
        self.order_cols = list(order_cols) if self.needs_order else []
        self.key_names = [f"__k{j}" for j in range(len(self.key_exprs))]
        self.agg_names = [f"__a{i}" for i in range(len(self.aggs))]
        self.ord_names = [f"__o{j}" for j in range(len(self.order_cols))]
        if self.needs_order and not self.order_cols:
            raise PlanError(
                "order-sensitive aggregate (COLLECT_LIST / LATEST_BY_OFFSET / "
                "EARLIEST_BY_OFFSET) requires relation order columns "
                "(catalog Relation.order_cols; offset analog of "
                "ksql/aggregate_fn.go:143-156)"
            )
        if self.window is not None and not self.ts_col:
            raise PlanError("windowed aggregation requires a timestamp column")
        self.win_keys = (
            ["__ws"] if isinstance(self.window, (Tumbling, Hopping)) else []
        )
        self.all_keys = self.key_names + self.win_keys

    # ------------------------------------------------------------------ p1
    def _pick_aggs(self) -> list[tuple[int, str]]:
        """(agg index, pick) for LATEST/EARLIEST aggs — each carries its
        OWN masked order partials (the offset of ITS picked non-null
        value, not the batch max), `__oa{i}_{j}`."""
        out = []
        for i, a in enumerate(self.aggs):
            if isinstance(a, EarliestByOffset):
                out.append((i, "first"))
            elif isinstance(a, LatestByOffset):
                out.append((i, "last"))
        return out

    def _has_collect_list(self) -> bool:
        return any(isinstance(a, CollectList) for a in self.aggs)

    def _p1_entries(self) -> list[tuple]:
        from ..aggregates import FIRSTLAST_OPTS

        entries: list[tuple] = []
        for a, name in zip(self.aggs, self.agg_names):
            entries.extend(a.p1_kernels(name))
        for i, pick in self._pick_aggs():
            entries.extend(
                (f"__oa{i}_{j}", pick, FIRSTLAST_OPTS)
                for j in range(len(self.ord_names))
            )
        if self._has_collect_list():
            entries.extend((o, "list") for o in self.ord_names)
        seen: set[tuple[str, str]] = set()
        uniq: list[tuple] = []
        for e in entries:
            k = (e[0], e[1])
            if k not in seen:
                seen.add(k)
                uniq.append(e)
        return uniq

    def partial_fn(self, batch: pa.Table) -> pa.Table:
        """Phase-1 combiner (runs inside map_batches, zero-copy Arrow)."""
        cols: dict[str, pa.ChunkedArray | pa.Array] = {}
        n = batch.num_rows
        for name, e in zip(self.key_names, self.key_exprs):
            v = e.eval(batch)
            if isinstance(v, pa.Scalar):
                v = pa.array([v.as_py()] * n, type=v.type)
            cols[name] = v
        take_idx = None
        ws = None
        if isinstance(self.window, (Tumbling, Hopping)):
            ts = _ts_us(batch, self.ts_col)
            row_idx, ws = self.window.assign_ids(ts)
            if isinstance(self.window, Hopping):
                take_idx = pa.array(row_idx)
        for name, e in zip(self.agg_names, self.aggs):
            v = e.arg.eval(batch)
            if isinstance(v, pa.Scalar):
                v = pa.array([v.as_py()] * n, type=v.type)
            cols[name] = v
        for name, oc in zip(self.ord_names, self.order_cols):
            cols[name] = batch.column(oc)
        for i, _pick in self._pick_aggs():
            valid = pc.is_valid(cols[self.agg_names[i]])
            for j, oname in enumerate(self.ord_names):
                oc = cols[oname]
                cols[f"__oa{i}_{j}"] = pc.if_else(
                    valid, oc, pa.nulls(n, type=oc.type if hasattr(oc, "type") else batch.column(self.order_cols[j]).type)
                )
        if self.include_ts:
            cols["__ts"] = pc.cast(batch.column(self.ts_col), pa.int64())
        tmp = pa.table(cols)
        if take_idx is not None:
            tmp = tmp.take(take_idx)
        if ws is not None:
            tmp = tmp.append_column("__ws", pa.array(ws, type=pa.int64()))
        if self.needs_order:
            sort_idx = pc.sort_indices(
                tmp, sort_keys=[(o, "ascending") for o in self.ord_names]
            )
            tmp = tmp.take(sort_idx)
        entries = self._p1_entries()
        if self.include_ts:
            entries = entries + [("__ts", "max"), ("__ts", "count")]
        partial = pa.TableGroupBy(tmp, self.all_keys, use_threads=False).aggregate(entries)
        partial = self._apply_p1_post(partial)
        # streaming (include_ts): partition by the group key ONLY (coherent
        # per-key watermark) unless salting is on; bounded: include the
        # window for balance.
        part_cols = (
            self.key_names
            if (self.include_ts and self.key_names and not self.salt_by_window)
            else self.all_keys
        )
        part = hash_partition_ids(partial, part_cols, self.num_partitions)
        return partial.append_column("__part", pa.array(part, type=pa.int64()))

    def _apply_p1_post(self, partial: pa.Table) -> pa.Table:
        """Per-aggregate partial post-processing (e.g. Histogram compresses
        its raw value list into a bounded (value, count) sketch)."""
        for a, name in zip(self.aggs, self.agg_names):
            partial = a.p1_post(partial, name)
        return partial

    # ------------------------------------------------------------------ p2
    def merge_fn(self, part_tbl: pa.Table) -> pa.Table:
        """Phase-2 merge for one hash partition of partials.

        Every pass sorts the partition by the group keys first (plus, for
        LATEST/EARLIEST passes, the order-rank partials), making group
        segments contiguous and identically key-ordered across passes.
        All merges are deterministic vectorized segment reductions."""
        from ..aggregates import MergeCtx

        if "__part" in part_tbl.column_names:
            part_tbl = part_tbl.drop_columns(["__part"])
        out_cols: dict[int, pa.Array | pa.ChunkedArray] = {}
        keys_out: pa.Table | None = None
        for pass_key, sort_extra, idxs in self._merge_passes():
            sort_keys = [(k, "ascending") for k in self.all_keys]
            sort_keys += [(c, "ascending") for c in sort_extra]
            tbl = part_tbl.take(pc.sort_indices(part_tbl, sort_keys=sort_keys))
            seg_starts = _segment_starts(tbl, self.all_keys)
            ctx = MergeCtx(tbl, seg_starts)
            if keys_out is None:
                keys_out = tbl.select(self.all_keys).take(pa.array(seg_starts))
            for i in idxs:
                out_cols[i] = self.aggs[i].finalize(ctx, self.agg_names[i], self.ord_names)

        assert keys_out is not None
        result = keys_out
        for i in range(len(self.aggs)):
            col = out_cols[i]
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            result = result.append_column(f"__agg{i}", col)
        return result

    def remerge_fn(self, part_tbl: pa.Table) -> pa.Table:
        """Merge a partial table into a SMALLER partial table (one row per
        key) with the SAME schema — the streaming state transition: state
        (old partials) + incoming (new partials) -> new state. Fully
        vectorized; semantics match merge_fn followed by nothing (every
        aggregate's repartial is associative)."""
        from ..aggregates import MergeCtx

        if "__part" in part_tbl.column_names:
            part_tbl = part_tbl.drop_columns(["__part"])
        out_cols: dict[str, pa.Array | pa.ChunkedArray] = {}
        keys_out: pa.Table | None = None
        first_pass = True
        for pass_key, sort_extra, idxs in self._merge_passes():
            sort_keys = [(k, "ascending") for k in self.all_keys]
            sort_keys += [(c, "ascending") for c in sort_extra]
            tbl = part_tbl.take(pc.sort_indices(part_tbl, sort_keys=sort_keys))
            seg_starts = _segment_starts(tbl, self.all_keys)
            ctx = MergeCtx(tbl, seg_starts)
            if keys_out is None:
                keys_out = tbl.select(self.all_keys).take(pa.array(seg_starts))
            if first_pass:
                first_pass = False
                if self.include_ts and "__ts_max" in tbl.column_names:
                    out_cols["__ts_max"] = ctx.seg_max("__ts_max")
                    out_cols["__ts_count"] = ctx.seg_sum("__ts_count", pa.int64())
                if self._has_collect_list():
                    for o in self.ord_names:
                        out_cols[f"{o}_list"] = ctx.seg_concat_list(f"{o}_list")
            for i in idxs:
                out_cols.update(
                    self.aggs[i].repartial(ctx, self.agg_names[i], self.ord_names)
                )

        assert keys_out is not None
        result = keys_out
        for name, col in out_cols.items():
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            result = result.append_column(name, col)
        return result

    def _merge_passes(self):
        """One pass per LATEST/EARLIEST agg (each sorted by ITS masked
        order partials) + one shared pass for everything else. All passes
        sort by the group keys first, so segment key-order matches."""
        pick_map = dict((i, p) for i, p in self._pick_aggs())
        shared = [i for i in range(len(self.aggs)) if i not in pick_map]
        passes = []
        if shared or not pick_map:
            passes.append(("", [], shared))
        for i, pick in sorted(pick_map.items()):
            extra = [f"__oa{i}_{j}_{pick}" for j in range(len(self.ord_names))]
            passes.append((f"{pick}:{i}", extra, [i]))
        return passes


class SessionGroupByPlan(GroupByPlan):
    """Session windows: raw rows are co-partitioned by key hash, each
    partition is sorted by (keys, ts) and split on gaps vectorized
    (cumulative sum over gap flags), then aggregated in one pass
    (SURVEY.md §2.4 Session)."""

    def __init__(self, key_exprs, aggs, order_cols, window: Session, ts_col, num_partitions=DEFAULT_NUM_PARTITIONS):
        super().__init__(key_exprs, aggs, order_cols, None, ts_col, num_partitions)
        self.session = window

    def route_fn(self, batch: pa.Table) -> pa.Table:
        """Phase 0: evaluate keys/args, attach partition id (raw rows)."""
        n = batch.num_rows
        cols: dict[str, pa.Array | pa.ChunkedArray] = {}
        for name, e in zip(self.key_names, self.key_exprs):
            v = e.eval(batch)
            if isinstance(v, pa.Scalar):
                v = pa.array([v.as_py()] * n, type=v.type)
            cols[name] = v
        for name, e in zip(self.agg_names, self.aggs):
            v = e.arg.eval(batch)
            if isinstance(v, pa.Scalar):
                v = pa.array([v.as_py()] * n, type=v.type)
            cols[name] = v
        for name, oc in zip(self.ord_names, self.order_cols):
            cols[name] = batch.column(oc)
        # LATEST/EARLIEST need their per-agg masked order partials here
        # too (same as partial_fn) — _p1_entries aggregates them
        for i, _pick in self._pick_aggs():
            valid = pc.is_valid(cols[self.agg_names[i]])
            for j, oname in enumerate(self.ord_names):
                oc = cols[oname]
                oc_type = oc.type if hasattr(oc, "type") else batch.column(self.order_cols[j]).type
                cols[f"__oa{i}_{j}"] = pc.if_else(valid, oc, pa.nulls(n, type=oc_type))
        cols["__ts"] = pc.cast(batch.column(self.ts_col), pa.int64())
        tmp = pa.table(cols)
        part = hash_partition_ids(tmp, self.key_names, self.num_partitions)
        return tmp.append_column("__part", pa.array(part, type=pa.int64()))

    def sessionize_partial_fn(self, batch: pa.Table) -> pa.Table:
        """Streaming phase 1: sessionize WITHIN the micro-batch (vectorized)
        and emit one partial row per (key, within-batch session) with
        interval bounds — the partition state actor merges intervals across
        batches (session merge is associative)."""
        tbl = self.route_fn(batch).drop_columns(["__part"])
        si = pc.sort_indices(
            tbl,
            sort_keys=[(k, "ascending") for k in self.key_names]
            + [("__ts", "ascending")]
            + [(o, "ascending") for o in self.ord_names],
        )
        tbl = tbl.take(si)
        ts = tbl.column("__ts").to_numpy(zero_copy_only=False)
        n = len(ts)
        newsess = np.ones(n, dtype=bool)
        if n > 1:
            gap_ok = (ts[1:] - ts[:-1]) > self.session.gap_us
            keychange = np.zeros(n - 1, dtype=bool)
            for k in self.key_names:
                kv = tbl.column(k).to_numpy(zero_copy_only=False)
                keychange |= kv[1:] != kv[:-1]
            newsess[1:] = gap_ok | keychange
        sess_id = np.cumsum(newsess) - 1
        tbl = tbl.append_column("__sess", pa.array(sess_id, type=pa.int64()))
        keys = self.key_names + ["__sess"]
        entries = list(self._p1_entries())
        entries += [("__ts", "min"), ("__ts", "max"), ("__ts", "count")]
        partial = pa.TableGroupBy(tbl, keys, use_threads=False).aggregate(entries)
        partial = self._apply_p1_post(partial)
        part = hash_partition_ids(partial, self.key_names, self.num_partitions)
        return partial.drop_columns(["__sess"]).append_column(
            "__part", pa.array(part, type=pa.int64())
        )

    def session_partial_merge_fn(self, tbl: pa.Table) -> pa.Table:
        """Phase 2 over ``sessionize_partial_fn`` output (the bounded
        path): merge within-batch session PARTIALS across batches —
        an interval merge on (__ts_min, __ts_max) with a grouped running
        max — then repartial-merge the aggregate partials per merged
        session. Partition memory is bounded by distinct (key,
        within-batch-session) partials, never raw rows."""
        import pandas as pd

        if "__part" in tbl.column_names:
            tbl = tbl.drop_columns(["__part"])
        si = pc.sort_indices(
            tbl,
            sort_keys=[(k, "ascending") for k in self.key_names]
            + [("__ts_min", "ascending"), ("__ts_max", "ascending")],
        )
        tbl = tbl.take(si)
        n = tbl.num_rows
        starts = _segment_starts(tbl, self.key_names)
        is_start = np.zeros(n, dtype=bool)
        is_start[starts] = True
        seg_ids = np.cumsum(is_start) - 1
        tmin = pc.cast(tbl.column("__ts_min"), pa.int64()).to_numpy(zero_copy_only=False)
        tmax = pc.cast(tbl.column("__ts_max"), pa.int64()).to_numpy(zero_copy_only=False)
        # per-key running max of interval ends (cython grouped cummax)
        cmax = pd.Series(tmax).groupby(seg_ids).cummax().to_numpy()
        prev = np.concatenate(([0], cmax[:-1]))
        new_sess = is_start | ((tmin - prev) > self.session.gap_us)
        sess_id = np.cumsum(new_sess) - 1
        tbl = tbl.append_column("__sess", pa.array(sess_id, type=pa.int64()))
        keys = self.key_names + ["__sess"]
        inner = GroupByPlan(
            [], self.aggs, self.order_cols, None, None, self.num_partitions
        )
        inner.key_names = keys
        inner.all_keys = keys
        inner.ord_names = self.ord_names
        merged = inner.merge_fn(tbl)
        bounds = pa.TableGroupBy(
            tbl.select(keys + ["__ts_min", "__ts_max"]), keys, use_threads=False
        ).aggregate([("__ts_min", "min"), ("__ts_max", "max")])
        bounds = bounds.take(
            pc.sort_indices(bounds, sort_keys=[(k, "ascending") for k in keys])
        )
        merged = merged.append_column(
            "window_start", pc.cast(bounds.column("__ts_min_min"), pa.timestamp("us"))
        )
        merged = merged.append_column(
            "window_end", pc.cast(bounds.column("__ts_max_max"), pa.timestamp("us"))
        )
        return merged.drop_columns(["__sess"])

    def session_merge_fn(self, tbl: pa.Table) -> pa.Table:
        if "__part" in tbl.column_names:
            tbl = tbl.drop_columns(["__part"])
        si = pc.sort_indices(
            tbl,
            sort_keys=[(k, "ascending") for k in self.key_names]
            + [("__ts", "ascending")]
            + [(o, "ascending") for o in self.ord_names],
        )
        tbl = tbl.take(si)
        ts = tbl.column("__ts").to_numpy(zero_copy_only=False)
        n = len(ts)
        newsess = np.ones(n, dtype=bool)
        if n > 1:
            gap_ok = (ts[1:] - ts[:-1]) > self.session.gap_us
            keychange = np.zeros(n - 1, dtype=bool)
            for k in self.key_names:
                kv = tbl.column(k).to_numpy(zero_copy_only=False)
                keychange |= kv[1:] != kv[:-1]
            newsess[1:] = gap_ok | keychange
        sess_id = np.cumsum(newsess) - 1
        tbl = tbl.append_column("__sess", pa.array(sess_id, type=pa.int64()))
        keys = self.key_names + ["__sess"]
        entries = list(self._p1_entries())
        entries += [("__ts", "min"), ("__ts", "max")]
        partial = pa.TableGroupBy(tbl, keys, use_threads=False).aggregate(entries)
        partial = self._apply_p1_post(partial)
        # feed partials (one per session already) through the standard merge
        inner = GroupByPlan(
            [],  # keys handled manually below
            self.aggs,
            self.order_cols,
            None,
            None,
            self.num_partitions,
        )
        inner.key_names = keys
        inner.all_keys = keys
        inner.ord_names = self.ord_names
        merged = inner.merge_fn(partial.append_column("__part", pa.array(np.zeros(partial.num_rows), type=pa.int64())))
        # recover window bounds; ksqlDB session window = [first ts, last ts]
        si2 = pc.sort_indices(partial, sort_keys=[(k, "ascending") for k in keys])
        partial_sorted = partial.take(si2)
        merged = merged.append_column(
            "window_start", pc.cast(partial_sorted.column("__ts_min"), pa.timestamp("us"))
        )
        merged = merged.append_column(
            "window_end", pc.cast(partial_sorted.column("__ts_max"), pa.timestamp("us"))
        )
        return merged.drop_columns(["__sess"])
