"""The 12 ksql aggregate functions as distributed two-phase aggregates.

Reference surface: ksql/aggregate_fn.go:9-34 (COUNT, SUM, AVG, MIN, MAX,
COLLECT_LIST, COLLECT_SET, LATEST_BY_OFFSET, EARLIEST_BY_OFFSET, TOPK,
TOPK_DISTINCT, HISTOGRAM), parameter validation at aggregate_fn.go:179-181
(k > 0) and 237-275 (bucket cap), mandatory aliases at
select_builder.go:768-794.

Execution model (ours, Ray-Data-first — nothing like this exists in the
reference, which delegates aggregation to ksqlDB):

* **Phase 1 (combiner)** runs inside ``map_batches`` on every Arrow batch:
  one single-threaded ``pa.TableGroupBy`` computes vectorized *partials*
  per group key — one output row per key per batch — so the all-to-all
  exchange moves per-batch partials, not raw rows.
* **Phase 2 (merge)** runs once per hash partition
  (``groupby("__part").map_groups``): the partition's partials are sorted
  by group key, making group segments contiguous, and every aggregate
  merges with deterministic vectorized segment operations
  (``np.add.reduceat`` et al. — NEVER a grouped kernel, whose emission
  order Acero does not guarantee, and never a per-group Python loop).

Offset semantics: the reference's LATEST/EARLIEST_BY_OFFSET use Kafka
arrival offset; our relations declare explicit *order columns* (e.g.
``(ts, turn_idx)`` for transcripts per BASELINE.json input_hint) and the
offset rank is the lexicographic order over them. Nulls are skipped
(ksqlDB latestByOffset default).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from .errors import PlanError, TypeError_
from .expr import Expr, wrap

FIRSTLAST_OPTS = pc.ScalarAggregateOptions(skip_nulls=True, min_count=0)

# ---------------------------------------------------------------------------
# MergeCtx: the phase-2 partition view. Partials are sorted by group key
# (and, per merge pass, by order-rank partials), so each group is one
# contiguous row segment.


class MergeCtx:
    def __init__(self, sorted_tbl: pa.Table, seg_starts: np.ndarray):
        self.tbl = sorted_tbl
        self.seg_starts = seg_starts.astype(np.int64)
        self.n_groups = len(seg_starts)
        self._bounds = np.concatenate((self.seg_starts, [sorted_tbl.num_rows]))

    # --- scalar partial access --------------------------------------------
    def col(self, name: str) -> pa.Array:
        c = self.tbl.column(name)
        return c.combine_chunks() if isinstance(c, pa.ChunkedArray) else c

    def scalar(self, name: str) -> tuple[np.ndarray, np.ndarray]:
        """(values, validity) as numpy; timestamps viewed as int64."""
        c = self.col(name)
        valid = pc.is_valid(c).to_numpy(zero_copy_only=False)
        if pa.types.is_timestamp(c.type):
            c = pc.cast(c, pa.int64())
        v = c.to_numpy(zero_copy_only=False)
        return v, valid

    # --- list partial access ----------------------------------------------
    def flat(self, col_name: str) -> tuple[pa.Array, np.ndarray]:
        """Flatten a list-typed partial column into (values, per-group
        offsets in the flattened domain)."""
        col = self.col(col_name)
        counts = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        counts = np.nan_to_num(counts.astype(np.float64), nan=0.0).astype(np.int64)
        row_off = np.concatenate(([0], np.cumsum(counts)))
        values = pc.list_flatten(col)  # skips null rows, aligned with 0 counts
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        group_offsets = row_off[self._bounds]
        return values, group_offsets

    # --- deterministic segment reductions ---------------------------------
    def seg_sum(self, name: str, out_type: pa.DataType) -> pa.Array:
        v, valid = self.scalar(name)
        if v.dtype == object:
            v = v.astype(np.float64)
        filled = np.where(valid, v, 0)
        s = np.add.reduceat(filled, self.seg_starts)
        nvalid = np.add.reduceat(valid.astype(np.int64), self.seg_starts)
        mask = nvalid > 0
        return pa.array(s, type=out_type, mask=~mask)

    def _seg_extreme(self, name: str, is_min: bool) -> pa.Array:
        """Per-segment min/max: sort rows by (segment, direction-adjusted
        value key, invalids last), take each segment's first row — exact
        values recovered by position take. Integer/timestamp keys use an
        order-preserving uint64 bias-shift, NEVER a float64 cast (which
        silently reorders BIGINTs beyond 2^53)."""
        src = self.col(name)
        valid = pc.is_valid(src).to_numpy(zero_copy_only=False)
        seg_ids = np.repeat(np.arange(self.n_groups), np.diff(self._bounds))
        t = src.type
        if (
            pa.types.is_integer(t)
            or pa.types.is_timestamp(t)
            or pa.types.is_date(t)
            or pa.types.is_boolean(t)
        ):
            c = src if pa.types.is_integer(t) else pc.cast(src, pa.int64())
            v = pc.fill_null(c, 0).to_numpy(zero_copy_only=False)
            key = _uint_orderkey(v)
            if not is_min:
                key = ~key
            order = np.lexsort((key, ~valid, seg_ids))
        elif pa.types.is_floating(t):
            v = src.to_numpy(zero_copy_only=False).astype(np.float64)
            key = np.where(valid, v if is_min else -v, np.inf)
            key = np.where(np.isnan(key), np.inf, key)
            order = np.lexsort((key, seg_ids))
        else:  # strings/objects: rank-encode the valid values
            v = src.to_numpy(zero_copy_only=False)
            uniq, inv = np.unique(v[valid].astype(str), return_inverse=True)
            key = np.full(len(v), np.inf)
            key[valid] = inv if is_min else -inv
            order = np.lexsort((key, seg_ids))
        order = order.astype(np.int64)
        sel = order[self._bounds[:-1]]
        out = src.take(pa.array(sel))
        nvalid = np.add.reduceat(valid.astype(np.int64), self.seg_starts) if len(valid) else np.array([], dtype=np.int64)
        if (nvalid == 0).any():
            m = nvalid == 0
            return pa.array(
                [None if m[i] else out[i].as_py() for i in range(self.n_groups)],
                type=src.type,
            )
        return out

    def seg_min(self, name: str) -> pa.Array:
        return self._seg_extreme(name, True)

    def seg_max(self, name: str) -> pa.Array:
        return self._seg_extreme(name, False)

    def seg_pick_pos(self, name: str, last: bool) -> tuple[np.ndarray, np.ndarray]:
        """(row position of the first/last non-null value per segment,
        missing mask). Positions let callers take OTHER columns at the
        picked row (needed to carry the offset rank through re-partials)."""
        _, valid = self.scalar(name)
        n = len(valid)
        idx = np.arange(n, dtype=np.int64)
        if last:
            pos = np.maximum.reduceat(np.where(valid, idx, -1), self.seg_starts) if n else np.array([], dtype=np.int64)
            missing = pos < 0
        else:
            pos = np.minimum.reduceat(np.where(valid, idx, n), self.seg_starts) if n else np.array([], dtype=np.int64)
            missing = pos >= n
        return np.where(missing, 0, pos), missing

    def _take_masked(self, name: str, pos: np.ndarray, missing: np.ndarray) -> pa.Array:
        src = self.col(name)
        out = src.take(pa.array(pos))
        if missing.any():
            return pa.array(
                [None if missing[i] else out[i].as_py() for i in range(self.n_groups)],
                type=src.type,
            )
        return out

    def seg_first_valid(self, name: str) -> pa.Array:
        pos, missing = self.seg_pick_pos(name, last=False)
        return self._take_masked(name, pos, missing)

    def seg_last_valid(self, name: str) -> pa.Array:
        pos, missing = self.seg_pick_pos(name, last=True)
        return self._take_masked(name, pos, missing)

    def seg_concat_list(self, name: str) -> pa.Array:
        """Concatenate list partials per segment (order = current row
        order within the segment)."""
        values, offsets = self.flat(name)
        counts = np.diff(offsets)
        from_arr = _rebuild_list(values, counts)
        return from_arr


def _segment_ids(offsets: np.ndarray) -> np.ndarray:
    counts = np.diff(offsets)
    return np.repeat(np.arange(len(counts)), counts)


def _np(values: pa.Array) -> np.ndarray:
    return values.to_numpy(zero_copy_only=False)


def _np_valid(values: pa.Array) -> np.ndarray:
    """to_numpy preserving native integer dtype: nulls are filled with 0
    (callers mask them out) instead of letting numpy promote the whole
    column to NaN-filled float64, which corrupts BIGINTs beyond 2^53."""
    t = values.type
    if pa.types.is_integer(t):
        return pc.fill_null(values, 0).to_numpy(zero_copy_only=False)
    if pa.types.is_timestamp(t) or pa.types.is_date(t):
        return pc.fill_null(pc.cast(values, pa.int64()), 0).to_numpy(
            zero_copy_only=False
        )
    return values.to_numpy(zero_copy_only=False)


def _rebuild_list(values: pa.Array, counts: np.ndarray) -> pa.Array:
    offsets = np.concatenate(([0], np.cumsum(counts))).astype(np.int32)
    return pa.ListArray.from_arrays(pa.array(offsets, type=pa.int32()), values)


def _sort_within_segments(
    seg: np.ndarray, keys: Sequence[np.ndarray], descending: bool = False
) -> np.ndarray:
    ks = list(keys)
    if descending:
        ks = [_negate_for_sort(k) for k in ks]
    return np.lexsort(tuple(reversed(ks)) + (seg,))


def _uint_orderkey(v: np.ndarray) -> np.ndarray:
    """Order-preserving uint64 key for integer/datetime arrays — exact for
    the full int64 range (no float64 roundtrip)."""
    if v.dtype.kind == "u":
        return v.astype(np.uint64)
    if v.dtype.kind == "M":
        v = v.astype(np.int64)
    return v.astype(np.int64).astype(np.uint64) ^ np.uint64(1 << 63)


def _negate_for_sort(k: np.ndarray) -> np.ndarray:
    if k.dtype.kind in "iuM":
        return ~_uint_orderkey(k)  # complement reverses unsigned order
    if k.dtype.kind == "f":
        return -k
    uniq, inv = np.unique(k, return_inverse=True)
    return -inv


# ---------------------------------------------------------------------------


class AggExpr(Expr):
    """Base aggregate expression (derived field; alias mandatory —
    ksql/aggregate_fn.go:73-75)."""

    fn_name = "?"
    needs_order = False  # requires relation order columns (offset rank)
    merge_pass = ""  # "", "first", or "last": phase-2 pre-sort requirement

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
    def p1_kernels(self, a: str) -> list[tuple]:
        """(source column, pa grouped kernel[, options]) entries for the
        per-batch partial. ``a`` is this aggregate's private arg copy."""
        raise NotImplementedError

    def p1_post(self, tbl: pa.Table, a: str) -> pa.Table:
        """Optional vectorized post-processing of the phase-1 partial table
        (e.g. compressing a raw value list into a bounded sketch). Must be
        idempotent w.r.t. schema: repartial() emits the same columns."""
        return tbl

    def finalize(self, ctx: MergeCtx, a: str, ordcols: list[str]):
        """Merged partials (per-segment) -> final column, one row/group."""
        raise NotImplementedError


class Count(AggExpr):
    """COUNT(col): non-null count (ksql/aggregate_fn.go:87-92)."""

    fn_name = "count"

    def out_type(self, schema):
        self.arg.out_type(schema)
        return pa.int64()

    def p1_kernels(self, a):
        return [(a, "count")]

    def finalize(self, ctx, a, ordcols):
        return ctx.seg_sum(f"{a}_count", pa.int64())

    def repartial(self, ctx, a, ordcols):
        return {f"{a}_count": ctx.seg_sum(f"{a}_count", pa.int64())}


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

    def finalize(self, ctx, a, ordcols):
        t = ctx.col(f"{a}_sum").type
        out = pa.float64() if pa.types.is_floating(t) else pa.int64()
        return ctx.seg_sum(f"{a}_sum", out)

    def repartial(self, ctx, a, ordcols):
        return {f"{a}_sum": self.finalize(ctx, a, ordcols)}


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

    def finalize(self, ctx, a, ordcols):
        s = ctx.seg_sum(f"{a}_sum", pa.float64())
        c = ctx.seg_sum(f"{a}_count", pa.float64())
        return pc.divide(s, c)

    def repartial(self, ctx, a, ordcols):
        t = ctx.col(f"{a}_sum").type
        out = pa.float64() if pa.types.is_floating(t) else pa.int64()
        return {
            f"{a}_sum": ctx.seg_sum(f"{a}_sum", out),
            f"{a}_count": ctx.seg_sum(f"{a}_count", pa.int64()),
        }


class Min(AggExpr):
    fn_name = "min"

    def out_type(self, schema):
        return self.arg.out_type(schema)

    def p1_kernels(self, a):
        return [(a, "min")]

    def finalize(self, ctx, a, ordcols):
        return ctx.seg_min(f"{a}_min")

    def repartial(self, ctx, a, ordcols):
        return {f"{a}_min": ctx.seg_min(f"{a}_min")}


class Max(AggExpr):
    fn_name = "max"

    def out_type(self, schema):
        return self.arg.out_type(schema)

    def p1_kernels(self, a):
        return [(a, "max")]

    def finalize(self, ctx, a, ordcols):
        return ctx.seg_max(f"{a}_max")

    def repartial(self, ctx, a, ordcols):
        return {f"{a}_max": ctx.seg_max(f"{a}_max")}


class CollectList(AggExpr):
    """COLLECT_LIST: all values per group in offset order
    (ksql/aggregate_fn.go:127-132). Partials carry the order-rank columns
    so the merge re-interleaves lists from different batches correctly."""

    fn_name = "collect_list"
    needs_order = True

    def out_type(self, schema):
        return pa.list_(self.arg.out_type(schema))

    def p1_kernels(self, a):
        # batch pre-sorted by order columns; shared __o{j} list partials
        # are added by the executor
        return [(a, "list")]

    def finalize(self, ctx, a, ordcols):
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

    def repartial(self, ctx, a, ordcols):
        # value lists concat per segment; the shared __o{j}_list order
        # partials are concatenated by the plan-level remerge (identical
        # segment offsets keep elements aligned)
        return {f"{a}_list": ctx.seg_concat_list(f"{a}_list")}


class CollectSet(AggExpr):
    """COLLECT_SET: distinct values per group (ksql/aggregate_fn.go:135-140).
    Emitted in ascending value order for determinism (the reference's arrival
    order is not reproducible across a parallel merge)."""

    fn_name = "collect_set"

    def out_type(self, schema):
        return pa.list_(self.arg.out_type(schema))

    def p1_kernels(self, a):
        return [(a, "distinct")]

    def finalize(self, ctx, a, ordcols):
        values, offsets = ctx.flat(f"{a}_distinct")
        seg = _segment_ids(offsets)
        mask = pc.is_valid(values).to_numpy(zero_copy_only=False)
        v_np = _np_valid(values)
        seg_k, v_keep = seg[mask], v_np[mask]
        keep_idx = np.nonzero(mask)[0]
        order = np.lexsort((v_keep, seg_k))
        seg_s, v_s, idx_s = seg_k[order], v_keep[order], keep_idx[order]
        first = np.ones(len(seg_s), dtype=bool)
        if len(seg_s) > 1:
            first[1:] = (seg_s[1:] != seg_s[:-1]) | (v_s[1:] != v_s[:-1])
        final_idx = idx_s[first]
        final_seg = seg_s[first]
        counts = np.bincount(final_seg, minlength=self.n_groups_of(offsets))
        return _rebuild_list(values.take(pa.array(final_idx)), counts)

    def repartial(self, ctx, a, ordcols):
        # sorted distinct list is itself a valid "distinct" partial
        return {f"{a}_distinct": self.finalize(ctx, a, ordcols)}

    @staticmethod
    def n_groups_of(offsets) -> int:
        return len(offsets) - 1


class LatestByOffset(AggExpr):
    """LATEST_BY_OFFSET: value at max offset rank
    (ksql/aggregate_fn.go:143-148). Nulls skipped (ksqlDB default)."""

    fn_name = "latest_by_offset"
    needs_order = True
    merge_pass = "last"
    _pick = "last"

    def out_type(self, schema):
        return self.arg.out_type(schema)

    def p1_kernels(self, a):
        # batch pre-sorted by order columns
        return [(a, self._pick, FIRSTLAST_OPTS)]

    def finalize(self, ctx, a, ordcols):
        # partition pre-sorted by (keys, own masked ord partials)
        return ctx.seg_last_valid(f"{a}_{self._pick}")

    def repartial(self, ctx, a, ordcols):
        i = int(a[3:])
        pos, missing = ctx.seg_pick_pos(
            f"{a}_{self._pick}", last=(self._pick == "last")
        )
        out = {
            f"{a}_{self._pick}": ctx._take_masked(f"{a}_{self._pick}", pos, missing)
        }
        for j in range(len(ordcols)):
            col = f"__oa{i}_{j}_{self._pick}"
            out[col] = ctx._take_masked(col, pos, missing)
        return out


class EarliestByOffset(LatestByOffset):
    """EARLIEST_BY_OFFSET (ksql/aggregate_fn.go:151-156)."""

    fn_name = "earliest_by_offset"
    merge_pass = "first"
    _pick = "first"

    def finalize(self, ctx, a, ordcols):
        return ctx.seg_first_valid(f"{a}_{self._pick}")


class TopK(AggExpr):
    """TOPK(col, k): list of k largest values, descending
    (ksql/aggregate_fn.go:159-196; k > 0 validated at 179-181)."""

    fn_name = "topk"
    distinct = False

    def __init__(self, arg, k: int):
        super().__init__(arg)
        if not isinstance(k, int) or k <= 0:
            raise PlanError("TOPK requires k > 0 (ksql/aggregate_fn.go:179-181)")
        self.k = k

    def key(self):
        return f"{self.fn_name}({self.arg!r},{self.k})"

    def out_type(self, schema):
        return pa.list_(self.arg.out_type(schema))

    def p1_kernels(self, a):
        return [(a, "distinct" if self.distinct else "list")]

    def finalize(self, ctx, a, ordcols):
        src = "distinct" if self.distinct else "list"
        values, offsets = ctx.flat(f"{a}_{src}")
        seg = _segment_ids(offsets)
        mask = pc.is_valid(values).to_numpy(zero_copy_only=False)
        seg_k = seg[mask]
        v_k = _np_valid(values)[mask]
        keep_idx = np.nonzero(mask)[0]
        order = _sort_within_segments(seg_k, [v_k], descending=True)
        seg_s, v_s, idx_s = seg_k[order], v_k[order], keep_idx[order]
        if self.distinct:
            uniq = np.ones(len(seg_s), dtype=bool)
            if len(seg_s) > 1:
                uniq[1:] = (seg_s[1:] != seg_s[:-1]) | (v_s[1:] != v_s[:-1])
            seg_s, idx_s = seg_s[uniq], idx_s[uniq]
        n_groups = len(offsets) - 1
        counts_all = np.bincount(seg_s, minlength=n_groups)
        starts = np.concatenate(([0], np.cumsum(counts_all)))[:-1]
        pos = np.arange(len(seg_s)) - starts[seg_s]
        topmask = pos < self.k
        final_idx, final_seg = idx_s[topmask], seg_s[topmask]
        counts = np.bincount(final_seg, minlength=n_groups)
        return _rebuild_list(values.take(pa.array(final_idx)), counts)

    def repartial(self, ctx, a, ordcols):
        # trimmed desc top-k list is itself a valid partial
        src = "distinct" if self.distinct else "list"
        return {f"{a}_{src}": self.finalize(ctx, a, ordcols)}


class TopKDistinct(TopK):
    """TOPK_DISTINCT (ksql/aggregate_fn.go:198-235)."""

    fn_name = "topk_distinct"
    distinct = True


def _hist_compress(
    v_str: np.ndarray, w: np.ndarray, seg: np.ndarray, n_groups: int, buckets: int
) -> tuple[pa.ListArray, pa.ListArray]:
    """Merge (value, weight) pairs per segment into ascending distinct
    values with summed counts, capped at ``buckets`` per segment. Keeping
    each partial's ``buckets`` smallest distinct values is a correct
    semilattice: a value dropped from a partial is dominated by >= buckets
    smaller distinct values there, so it cannot enter the merged top-
    buckets either. Returns aligned (values list<string>, counts
    list<int64>) arrays, one list row per segment."""
    n = len(seg)
    if n == 0:
        zero = pa.array(np.zeros(n_groups + 1, dtype=np.int32), type=pa.int32())
        return (
            pa.ListArray.from_arrays(zero, pa.array([], type=pa.string())),
            pa.ListArray.from_arrays(zero, pa.array([], type=pa.int64())),
        )
    order = np.lexsort((v_str, seg))
    seg_s, v_s, w_s = seg[order], v_str[order], w[order]
    newpair = np.ones(n, dtype=bool)
    newpair[1:] = (seg_s[1:] != seg_s[:-1]) | (v_s[1:] != v_s[:-1])
    starts = np.nonzero(newpair)[0]
    bounds = np.concatenate((starts, [n]))
    csum = np.concatenate(([0], np.cumsum(w_s)))
    cnts = csum[bounds[1:]] - csum[bounds[:-1]]
    pair_seg, pair_val = seg_s[starts], v_s[starts]
    grp_counts = np.bincount(pair_seg, minlength=n_groups)
    grp_starts = np.concatenate(([0], np.cumsum(grp_counts)))[:-1]
    pos = np.arange(len(pair_seg)) - grp_starts[pair_seg]
    keep = pos < buckets
    pair_seg, pair_val, cnts = pair_seg[keep], pair_val[keep], cnts[keep]
    kept = np.bincount(pair_seg, minlength=n_groups)
    off = pa.array(
        np.concatenate(([0], np.cumsum(kept))).astype(np.int32), type=pa.int32()
    )
    return (
        pa.ListArray.from_arrays(off, pa.array(pair_val, type=pa.string())),
        pa.ListArray.from_arrays(off, pa.array(cnts, type=pa.int64())),
    )


class Histogram(AggExpr):
    """HISTOGRAM(col, buckets): value -> count map, capped bucket count
    (ksql/aggregate_fn.go:237-275). Output is MAP<VARCHAR, BIGINT> with
    keys in ascending order (deterministic).

    Partial format (bounded state): ``{a}_list`` list<string> of ascending
    distinct values capped at ``buckets`` + aligned ``{a}_hcnt`` list<int64>
    counts — compressed at phase 1 (p1_post) and kept compressed through
    every re-merge, so streaming state per (key, window) is O(buckets),
    never O(rows)."""

    fn_name = "histogram"

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

    def p1_post(self, tbl, a):
        name = f"{a}_list"
        col = tbl.column(name)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        counts = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        counts = np.nan_to_num(counts.astype(np.float64), nan=0.0).astype(np.int64)
        values = pc.list_flatten(col)
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        seg = np.repeat(np.arange(tbl.num_rows), counts)
        mask = pc.is_valid(values).to_numpy(zero_copy_only=False)
        v_str = _np(pc.cast(values, pa.string()))[mask]
        seg = seg[mask]
        w = np.ones(len(seg), dtype=np.int64)
        vals_arr, cnts_arr = _hist_compress(v_str, w, seg, tbl.num_rows, self.buckets)
        idx = tbl.column_names.index(name)
        tbl = tbl.set_column(idx, name, vals_arr)
        return tbl.append_column(f"{a}_hcnt", cnts_arr)

    def _merged(self, ctx, a):
        values, offsets = ctx.flat(f"{a}_list")
        wvals, _ = ctx.flat(f"{a}_hcnt")
        seg = _segment_ids(offsets)
        v_str = _np(values)
        w = _np(wvals).astype(np.int64)
        return _hist_compress(v_str, w, seg, len(offsets) - 1, self.buckets)

    def finalize(self, ctx, a, ordcols):
        vals_arr, cnts_arr = self._merged(ctx, a)
        return pa.MapArray.from_arrays(
            vals_arr.offsets, vals_arr.values, cnts_arr.values
        )

    def repartial(self, ctx, a, ordcols):
        vals_arr, cnts_arr = self._merged(ctx, a)
        return {f"{a}_list": vals_arr, f"{a}_hcnt": cnts_arr}


class VarSamp(AggExpr):
    """VAR_SAMP(col): sample variance per group — algebraic over the
    (sum, sum-of-squares, count) triple, so partials are three floats
    per (key, batch) regardless of row count and every re-merge is a
    segment sum. Extends the reference's aggregate set
    (ksql/aggregate_fn.go:9-34 has no variance). NULLs skipped; NULL
    for groups with fewer than two non-null values (SQL semantics).
    The final ``(ss - s²/n) / (n-1)`` is clamped at 0 against negative
    float residue."""

    fn_name = "var_samp"

    def out_type(self, schema):
        t = self.arg.out_type(schema)
        if not (pa.types.is_floating(t) or pa.types.is_integer(t)):
            raise TypeError_(f"VAR_SAMP over non-numeric type {t}")
        return pa.float64()

    def p1_kernels(self, a):
        return [(a, "sum"), (a, "count"), (a, "list")]

    def p1_post(self, tbl, a):
        # fold the raw value list into one sum-of-squares per group;
        # the list never leaves the phase-1 task
        name = f"{a}_list"
        col = tbl.column(name)
        if isinstance(col, pa.ChunkedArray):
            col = col.combine_chunks()
        counts = pc.list_value_length(col).to_numpy(zero_copy_only=False)
        counts = np.nan_to_num(counts.astype(np.float64)).astype(np.int64)
        values = pc.list_flatten(col)
        if isinstance(values, pa.ChunkedArray):
            values = values.combine_chunks()
        seg = np.repeat(np.arange(tbl.num_rows), counts)
        mask = pc.is_valid(values).to_numpy(zero_copy_only=False)
        v = _np_valid(pc.cast(values, pa.float64()))[mask]
        ss = np.zeros(tbl.num_rows, dtype=np.float64)
        np.add.at(ss, seg[mask], v * v)
        idx = tbl.column_names.index(name)
        return tbl.set_column(idx, f"{a}_sumsq",
                              pa.array(ss, type=pa.float64()))

    def _moments(self, ctx, a):
        s = _np(ctx.seg_sum(f"{a}_sum", pa.float64()))
        n = _np(ctx.seg_sum(f"{a}_count", pa.float64()))
        ss = _np(ctx.seg_sum(f"{a}_sumsq", pa.float64()))
        return s, n, ss

    def _var(self, ctx, a) -> tuple[np.ndarray, np.ndarray]:
        s, n, ss = self._moments(ctx, a)
        small = n < 2
        with np.errstate(invalid="ignore", divide="ignore"):
            var = np.maximum(ss - (s * s) / n, 0.0) / (n - 1.0)
        return var, small

    def finalize(self, ctx, a, ordcols):
        var, small = self._var(ctx, a)
        return pa.array(var, type=pa.float64(), mask=small)

    def repartial(self, ctx, a, ordcols):
        s, n, ss = self._moments(ctx, a)
        return {
            f"{a}_sum": pa.array(s, type=pa.float64()),
            f"{a}_count": pa.array(n.astype(np.int64), type=pa.int64()),
            f"{a}_sumsq": pa.array(ss, type=pa.float64()),
        }


class StdDev(VarSamp):
    """STDDEV_SAMP(col) = sqrt(VAR_SAMP)."""

    fn_name = "stddev_samp"

    def finalize(self, ctx, a, ordcols):
        var, small = self._var(ctx, a)
        return pa.array(np.sqrt(var), type=pa.float64(), mask=small)


class CountDistinct(AggExpr):
    """COUNT(DISTINCT col): exact per-group distinct count (NULLs
    ignored, SQL semantics). Extends the reference's aggregate set
    (ksql/aggregate_fn.go:9-34 — ksqlDB has COUNT_DISTINCT; the Go
    builder encodes it only through COLLECT_SET). Partials are the
    grouped ``distinct`` kernel's per-batch value lists (bounded by
    per-batch distinct values — the shuffle never carries duplicates);
    the merge counts unique (segment, value) pairs with one lexsort.
    For bounded-memory approximate cardinality over streams use
    ops/hll.py instead."""

    fn_name = "count_distinct"

    def out_type(self, schema):
        self.arg.out_type(schema)
        return pa.int64()

    def p1_kernels(self, a):
        return [(a, "distinct")]

    def finalize(self, ctx, a, ordcols):
        values, offsets = ctx.flat(f"{a}_distinct")
        n_groups = len(offsets) - 1
        seg = _segment_ids(offsets)
        mask = pc.is_valid(values).to_numpy(zero_copy_only=False)
        if not mask.any():
            return pa.array(np.zeros(n_groups, np.int64))
        v_np = _np_valid(values)
        seg_k, v_k = seg[mask], v_np[mask]
        order = np.lexsort((v_k, seg_k))
        seg_s, v_s = seg_k[order], v_k[order]
        first = np.ones(len(seg_s), dtype=bool)
        if len(seg_s) > 1:
            first[1:] = (seg_s[1:] != seg_s[:-1]) | (v_s[1:] != v_s[:-1])
        cnt = np.bincount(seg_s[first], minlength=n_groups)
        return pa.array(cnt.astype(np.int64))

    def repartial(self, ctx, a, ordcols):
        # a sorted distinct list is itself a valid "distinct" partial
        # (identical merge shape to CollectSet)
        cs = CollectSet(self.arg)
        return {f"{a}_distinct": cs.finalize(ctx, a, ordcols)}


class Percentile(AggExpr):
    """PERCENTILE(col, q): the q-th discrete percentile per group — the
    smallest group value whose rank is >= max(1, ceil(q*m)) over the m
    non-null values (= SQL ``quantile_disc``; NULLs skipped; NULL for
    all-NULL groups). EXACT: partials collect the group's values (the
    COLLECT_LIST shape, value-ordered — no offset rank needed), the
    merge is one lexsort + per-segment pick. Extends the reference's
    aggregate set (ksql/aggregate_fn.go:9-34 has no percentile); for
    bounded-memory approximate quantiles over streams use
    ops/quantiles.QuantileSketch instead."""

    fn_name = "percentile"

    def __init__(self, arg, q: float):
        super().__init__(arg)
        if not isinstance(q, (int, float)) or not 0.0 <= q <= 1.0:
            raise PlanError("PERCENTILE requires 0 <= q <= 1")
        self.q = float(q)

    def key(self):
        return f"{self.fn_name}({self.arg!r},{self.q})"

    def out_type(self, schema):
        t = self.arg.out_type(schema)
        if not (pa.types.is_integer(t) or pa.types.is_floating(t)
                or pa.types.is_temporal(t)):
            raise TypeError_(f"PERCENTILE over non-orderable type {t}")
        return t

    def p1_kernels(self, a):
        return [(a, "list")]

    def finalize(self, ctx, a, ordcols):
        values, offsets = ctx.flat(f"{a}_list")
        n_groups = len(offsets) - 1
        seg = _segment_ids(offsets)
        mask = pc.is_valid(values).to_numpy(zero_copy_only=False)
        if not mask.any():
            return pa.nulls(n_groups, values.type)
        v_np = _np_valid(values)
        seg_k, v_k = seg[mask], v_np[mask]
        idx_k = np.nonzero(mask)[0]
        order = np.lexsort((v_k, seg_k))
        seg_s, idx_s = seg_k[order], idx_k[order]
        m = np.bincount(seg_s, minlength=n_groups)
        starts = np.concatenate(([0], np.cumsum(m)[:-1]))
        target = np.maximum(1, np.ceil(self.q * m - 1e-9).astype(np.int64))
        pos = starts + target - 1
        missing = m == 0
        pos[missing] = 0
        out = values.take(pa.array(idx_s[pos], type=pa.int64()))
        if missing.any():
            out = pc.if_else(pa.array(~missing), out,
                             pa.scalar(None, values.type))
        return out

    def repartial(self, ctx, a, ordcols):
        return {f"{a}_list": ctx.seg_concat_list(f"{a}_list")}


ALL_AGGREGATES: dict[str, type[AggExpr]] = {
    c.fn_name: c
    for c in (
        Count, Sum, Avg, Min, Max, CollectList, CollectSet,
        LatestByOffset, EarliestByOffset, TopK, TopKDistinct, Histogram,
        Percentile, CountDistinct,
    )
}
