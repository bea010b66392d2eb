"""The 12 ksql aggregate functions as distributed two-phase aggregates.

Reference surface: ksql/aggregate_fn.go:9-34 (COUNT, SUM, AVG, MIN, MAX,
COLLECT_LIST, COLLECT_SET, LATEST_BY_OFFSET, EARLIEST_BY_OFFSET, TOPK,
TOPK_DISTINCT, HISTOGRAM), parameter validation at aggregate_fn.go:179-181
(k > 0) and 237-275 (bucket cap), mandatory aliases at
select_builder.go:768-794.

Execution model (ours, Ray-Data-first — nothing like this exists in the
reference, which delegates aggregation to ksqlDB):

* **Phase 1 (combiner)** runs inside ``map_batches`` on every Arrow batch:
  one ``pa.TableGroupBy`` computes vectorized *partials* per group key —
  one output row per key per batch — so the all-to-all exchange moves
  per-batch partials, not raw rows.
* **Phase 2 (merge)** runs once per hash partition
  (``groupby("__part").map_groups``): a second ``pa.TableGroupBy`` merges
  partials with agg-specific kernels, then a vectorized ``finalize``
  turns merged partials into the final column. Per-group Python loops are
  avoided via flattened-array + segment-id numpy operations.

Offset semantics: the reference's LATEST/EARLIEST_BY_OFFSET use Kafka
arrival offset; our relations declare explicit *order columns* (e.g.
``(ts, turn_idx)`` for transcripts per BASELINE.json input_hint) and the
offset rank is the lexicographic order over them.
"""

from __future__ import annotations

from typing import Callable, Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .errors import PlanError, TypeError_
from .expr import Expr, wrap

# ---------------------------------------------------------------------------
# segment helpers: operate on a flattened values array + per-group offsets
# (the layout produced by pc.list_flatten over a merged list-of-lists).


def _segment_ids(offsets: np.ndarray) -> np.ndarray:
    counts = np.diff(offsets)
    return np.repeat(np.arange(len(counts)), counts)


class MergeCtx:
    """Phase-2 merge context: the partition's partial table sorted by group
    keys, with contiguous per-group row segments. ``flat(col)`` flattens a
    list-typed partial column into (values, per-group offsets) — the layout
    every list finalizer consumes — without any grouped 'list' kernel
    (pyarrow's hash_list lacks list-of-list support)."""

    def __init__(self, sorted_tbl: pa.Table, seg_starts: np.ndarray):
        self.tbl = sorted_tbl
        self.seg_starts = seg_starts  # row index of each group's first partial
        self.n_groups = len(seg_starts)
        self._bounds = np.concatenate((seg_starts, [sorted_tbl.num_rows]))

    def flat(self, col_name: str) -> tuple[pa.Array, np.ndarray]:
        col = self.tbl.column(col_name)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        counts = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        counts = np.nan_to_num(counts.astype(np.float64), nan=0.0).astype(np.int64)
        row_off = np.concatenate(([0], np.cumsum(counts)))
        values = pc.list_flatten(col)  # skips null rows, aligned with zero counts
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        group_offsets = row_off[self._bounds]
        return values, group_offsets


def _np(values: pa.Array) -> np.ndarray:
    return values.to_numpy(zero_copy_only=False)


def _rebuild_list(values: pa.Array, counts: np.ndarray) -> pa.Array:
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
    return pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), values)


def _sort_within_segments(
    seg: np.ndarray, keys: Sequence[np.ndarray], descending: bool = False
) -> np.ndarray:
    """Indices that sort rows by segment, then by keys (vectorized lexsort)."""
    ks = list(keys)
    if descending:
        ks = [_negate_for_sort(k) for k in ks]
    return np.lexsort(tuple(reversed(ks)) + (seg,))


def _negate_for_sort(k: np.ndarray) -> np.ndarray:
    if k.dtype.kind in "iuf":
        return -k.astype(np.float64) if k.dtype.kind == "u" else -k
    # strings/objects: rank-encode then negate
    uniq, inv = np.unique(k, return_inverse=True)
    return -inv


# ---------------------------------------------------------------------------


class AggExpr(Expr):
    """Base aggregate expression (derived field; alias mandatory —
    ksql/aggregate_fn.go:73-75)."""

    fn_name = "?"
    needs_order = False  # requires relation order columns (offset rank)
    list_partial = False  # phase-2 merge via MergeCtx segments, not TableGroupBy

    def __init__(self, arg):
        self.arg = wrap(arg)

    def is_aggregate(self) -> bool:
        return True

    def is_derived(self) -> bool:
        return True

    def columns(self) -> set[str]:
        return self.arg.columns()

    def auto_name(self) -> str:
        import hashlib

        return "__aggv_" + hashlib.md5(self.key().encode()).hexdigest()[:10]

    def eval(self, batch: pa.Table):
        # post-aggregation: resolve the already-computed aggregate column
        # (HAVING / ORDER BY over aggregate aliases, ksql/having.go:29-75)
        auto = self.auto_name()
        if auto in batch.column_names:
            return batch.column(auto)
        return batch.column(self.output_name())

    def key(self) -> str:
        return f"{self.fn_name}({self.arg!r})"

    def __repr__(self):
        return f"{self.fn_name.upper()}({self.arg!r})"

    # --- two-phase protocol -------------------------------------------------
    def p1_kernels(self, a: str) -> list[tuple[str, str]]:
        """(source column, pa grouped kernel) pairs for the per-batch partial.
        Source ``a`` is this aggregate's private copy of its evaluated arg."""
        raise NotImplementedError

    def p2_kernels(self, a: str) -> list[tuple[str, str]]:
        """(partial column, pa grouped kernel) pairs for the merge groupby.
        Partial columns are named ``{src}_{kernel}`` by pyarrow."""
        raise NotImplementedError

    def finalize(self, merged: pa.Table, a: str) -> pa.Array | pa.ChunkedArray:
        """Merged partials -> final value column (one row per group)."""
        raise NotImplementedError


class Count(AggExpr):
    """COUNT(col): non-null count (ksql/aggregate_fn.go:87-92)."""

    fn_name = "count"

    def out_type(self, schema):
        self.arg.out_type(schema)
        return pa.int64()

    def p1_kernels(self, a):
        return [(a, "count")]

    def p2_kernels(self, a):
        return [(f"{a}_count", "sum")]

    def finalize(self, merged, a):
        return pc.cast(merged.column(f"{a}_count_sum"), pa.int64())


class Sum(AggExpr):
    """SUM (ksql/aggregate_fn.go:95-100)."""

    fn_name = "sum"

    def out_type(self, schema):
        t = self.arg.out_type(schema)
        if pa.types.is_floating(t):
            return pa.float64()
        if pa.types.is_integer(t):
            return pa.int64()
        raise TypeError_(f"SUM over non-numeric type {t}")

    def p1_kernels(self, a):
        return [(a, "sum")]

    def p2_kernels(self, a):
        return [(f"{a}_sum", "sum")]

    def finalize(self, merged, a):
        return merged.column(f"{a}_sum_sum")


class Avg(AggExpr):
    """AVG = algebraic (sum, count) pair (ksql/aggregate_fn.go:103-108)."""

    fn_name = "avg"

    def out_type(self, schema):
        t = self.arg.out_type(schema)
        if not (pa.types.is_floating(t) or pa.types.is_integer(t)):
            raise TypeError_(f"AVG over non-numeric type {t}")
        return pa.float64()

    def p1_kernels(self, a):
        return [(a, "sum"), (a, "count")]

    def p2_kernels(self, a):
        return [(f"{a}_sum", "sum"), (f"{a}_count", "sum")]

    def finalize(self, merged, a):
        s = pc.cast(merged.column(f"{a}_sum_sum"), pa.float64())
        c = pc.cast(merged.column(f"{a}_count_sum"), pa.float64())
        return pc.divide(s, c)


class Min(AggExpr):
    fn_name = "min"

    def out_type(self, schema):
        return self.arg.out_type(schema)

    def p1_kernels(self, a):
        return [(a, "min")]

    def p2_kernels(self, a):
        return [(f"{a}_min", "min")]

    def finalize(self, merged, a):
        return merged.column(f"{a}_min_min")


class Max(AggExpr):
    fn_name = "max"

    def out_type(self, schema):
        return self.arg.out_type(schema)

    def p1_kernels(self, a):
        return [(a, "max")]

    def p2_kernels(self, a):
        return [(f"{a}_max", "max")]

    def finalize(self, merged, a):
        return merged.column(f"{a}_max_max")


class CollectList(AggExpr):
    """COLLECT_LIST: all values per group in offset order
    (ksql/aggregate_fn.go:127-132). Partials carry the order-rank columns so
    the merge can re-interleave lists from different batches correctly."""

    fn_name = "collect_list"
    needs_order = True
    list_partial = True

    def out_type(self, schema):
        return pa.list_(self.arg.out_type(schema))

    def p1_kernels(self, a):
        # batch pre-sorted by order columns; shared __o{j} list partials
        # are added by the executor
        return [(a, "list")]

    def p2_kernels(self, a):
        return []

    def finalize_ctx(self, ctx: MergeCtx, a: str, ordcols: list[str]):
        values, offsets = ctx.flat(f"{a}_list")
        seg = _segment_ids(offsets)
        keys = []
        for o in ordcols:
            ov, _ = ctx.flat(f"{o}_list")
            keys.append(_np(ov))
        idx = _sort_within_segments(seg, keys)
        values = values.take(pa.array(idx))
        counts = np.diff(offsets)
        return _rebuild_list(values, counts)


class CollectSet(AggExpr):
    """COLLECT_SET: distinct values per group (ksql/aggregate_fn.go:135-140).
    Emitted in ascending value order for determinism (the reference's arrival
    order is not reproducible across a parallel merge)."""

    fn_name = "collect_set"
    list_partial = True

    def out_type(self, schema):
        return pa.list_(self.arg.out_type(schema))

    def p1_kernels(self, a):
        return [(a, "distinct")]

    def p2_kernels(self, a):
        return []

    def finalize_ctx(self, ctx: MergeCtx, a: str, ordcols=None):
        values, offsets = ctx.flat(f"{a}_distinct")
        seg = _segment_ids(offsets)
        mask = pc.is_valid(values).to_numpy(zero_copy_only=False)
        v_np = _np(values)
        # drop nulls, then distinct within segment via (value, seg) sort
        seg, v_keep = seg[mask], v_np[mask]
        keep_idx = np.nonzero(mask)[0]
        order = np.lexsort((v_keep, seg))
        seg_s, v_s, idx_s = seg[order], v_keep[order], keep_idx[order]
        first = np.ones(len(seg_s), dtype=bool)
        if len(seg_s) > 1:
            first[1:] = (seg_s[1:] != seg_s[:-1]) | (v_s[1:] != v_s[:-1])
        final_idx = idx_s[first]
        final_seg = seg_s[first]
        counts = np.bincount(final_seg, minlength=len(offsets) - 1)
        return _rebuild_list(values.take(pa.array(final_idx)), counts)


class LatestByOffset(AggExpr):
    """LATEST_BY_OFFSET: value at max offset rank
    (ksql/aggregate_fn.go:143-148)."""

    fn_name = "latest_by_offset"
    needs_order = True
    _pick = "last"

    def out_type(self, schema):
        return self.arg.out_type(schema)

    def p1_kernels(self, a):
        # batch pre-sorted by order columns
        return [(a, self._pick)]

    def p1_order_kernels(self, a, ordcols):
        return [(o, self._pick) for o in ordcols]

    def p2_kernels(self, a):
        # partition pre-sorted by (keys, partial order columns)
        return [(f"{a}_{self._pick}", self._pick)]

    def p2_sort_cols(self, a: str, ordcols: list[str]) -> list[str]:
        return [f"{o}_{self._pick}" for o in ordcols]

    def finalize(self, merged, a):
        return merged.column(f"{a}_{self._pick}_{self._pick}")


class EarliestByOffset(LatestByOffset):
    """EARLIEST_BY_OFFSET (ksql/aggregate_fn.go:151-156)."""

    fn_name = "earliest_by_offset"
    _pick = "first"


class TopK(AggExpr):
    """TOPK(col, k): list of k largest values, descending
    (ksql/aggregate_fn.go:159-196; k > 0 validated at 179-181)."""

    fn_name = "topk"
    distinct = False
    list_partial = True

    def __init__(self, arg, k: int):
        super().__init__(arg)
        if not isinstance(k, int) or k <= 0:
            raise PlanError("TOPK requires k > 0 (ksql/aggregate_fn.go:179-181)")
        self.k = k

    def key(self):
        return f"{self.fn_name}({self.arg!r},{self.k})"

    def out_type(self, schema):
        t = self.arg.out_type(schema)
        return pa.list_(t)

    def p1_kernels(self, a):
        return [(a, "distinct" if self.distinct else "list")]

    def p2_kernels(self, a):
        return []

    def finalize_ctx(self, ctx: MergeCtx, a: str, ordcols=None):
        src = "distinct" if self.distinct else "list"
        values, offsets = ctx.flat(f"{a}_{src}")
        seg = _segment_ids(offsets)
        mask = pc.is_valid(values).to_numpy(zero_copy_only=False)
        seg_k = seg[mask]
        v_k = _np(values)[mask]
        keep_idx = np.nonzero(mask)[0]
        order = _sort_within_segments(seg_k, [v_k], descending=True)
        seg_s, v_s, idx_s = seg_k[order], v_k[order], keep_idx[order]
        if self.distinct:
            uniq = np.ones(len(seg_s), dtype=bool)
            if len(seg_s) > 1:
                uniq[1:] = (seg_s[1:] != seg_s[:-1]) | (v_s[1:] != v_s[:-1])
            seg_s, idx_s = seg_s[uniq], idx_s[uniq]
        # position within segment < k
        n_groups = len(offsets) - 1
        counts_all = np.bincount(seg_s, minlength=n_groups)
        starts = np.concatenate(([0], np.cumsum(counts_all)))[:-1]
        pos = np.arange(len(seg_s)) - starts[seg_s]
        topmask = pos < self.k
        final_idx, final_seg = idx_s[topmask], seg_s[topmask]
        counts = np.bincount(final_seg, minlength=n_groups)
        return _rebuild_list(values.take(pa.array(final_idx)), counts)


class TopKDistinct(TopK):
    """TOPK_DISTINCT (ksql/aggregate_fn.go:198-235)."""

    fn_name = "topk_distinct"
    distinct = True


class Histogram(AggExpr):
    """HISTOGRAM(col, buckets): value -> count map, capped bucket count
    (ksql/aggregate_fn.go:237-275). Output is MAP<VARCHAR, BIGINT> with keys
    in ascending order (deterministic)."""

    fn_name = "histogram"
    list_partial = True

    def __init__(self, arg, buckets: int):
        super().__init__(arg)
        if not isinstance(buckets, int) or buckets <= 0:
            raise PlanError("HISTOGRAM requires buckets > 0")
        self.buckets = buckets

    def key(self):
        return f"{self.fn_name}({self.arg!r},{self.buckets})"

    def out_type(self, schema):
        self.arg.out_type(schema)
        return pa.map_(pa.string(), pa.int64())

    def p1_kernels(self, a):
        return [(a, "list")]

    def p2_kernels(self, a):
        return []

    def finalize_ctx(self, ctx: MergeCtx, a: str, ordcols=None):
        values, offsets = ctx.flat(f"{a}_list")
        seg = _segment_ids(offsets)
        mask = pc.is_valid(values).to_numpy(zero_copy_only=False)
        seg_k = seg[mask]
        v_str = _np(pc.cast(values, pa.string()))[mask]
        order = np.lexsort((v_str, seg_k))
        seg_s, v_s = seg_k[order], v_str[order]
        n = len(seg_s)
        n_groups = len(offsets) - 1
        if n == 0:
            mo = np.zeros(n_groups + 1, dtype=np.int32)
            return pa.MapArray.from_arrays(
                pa.array(mo, type=pa.int32()),
                pa.array([], type=pa.string()),
                pa.array([], type=pa.int64()),
            )
        newpair = np.ones(n, dtype=bool)
        newpair[1:] = (seg_s[1:] != seg_s[:-1]) | (v_s[1:] != v_s[:-1])
        starts = np.nonzero(newpair)[0]
        bounds = np.concatenate((starts, [n]))
        cnts = np.diff(bounds)
        pair_seg = seg_s[starts]
        pair_val = v_s[starts]
        # cap buckets per group (keep first `buckets` distinct values)
        grp_counts = np.bincount(pair_seg, minlength=n_groups)
        grp_starts = np.concatenate(([0], np.cumsum(grp_counts)))[:-1]
        pos = np.arange(len(pair_seg)) - grp_starts[pair_seg]
        keep = pos < self.buckets
        pair_seg, pair_val, cnts = pair_seg[keep], pair_val[keep], cnts[keep]
        kept_counts = np.bincount(pair_seg, minlength=n_groups)
        map_offsets = np.concatenate(([0], np.cumsum(kept_counts))).astype(np.int32)
        return pa.MapArray.from_arrays(
            pa.array(map_offsets, type=pa.int32()),
            pa.array(pair_val, type=pa.string()),
            pa.array(cnts, type=pa.int64()),
        )


ALL_AGGREGATES: dict[str, type[AggExpr]] = {
    c.fn_name: c
    for c in (
        Count, Sum, Avg, Min, Max, CollectList, CollectSet,
        LatestByOffset, EarliestByOffset, TopK, TopKDistinct, Histogram,
    )
}
