"""Streaming per-key accumulators for the 16 aggregates.

These consume the *partial rows* produced by the vectorized phase-1
combiner (exec/groupby.GroupByPlan.partial_fn) — one row per (key, batch)
— so the per-row Python update cost is bounded by distinct keys per
micro-batch, never by raw row count. Accumulator semantics mirror
aggregates.py finalizers exactly (same emitted values as the bounded
path for the same input, the conformance requirement of north_rule).
"""

from __future__ import annotations

from collections import Counter
from typing import Any

from ..aggregates import (
    AggExpr, Avg, CollectList, CollectSet, Count, EarliestByOffset,
    CountDistinct, Histogram, LatestByOffset, Max, Min, Percentile,
    StdDev, Sum, TopK, TopKDistinct, VarSamp,
)


class StreamingAcc:
    """One accumulator instance per (group key, window)."""

    def update(self, row: dict, a: str, ords: list[str]) -> None:
        raise NotImplementedError

    def merge(self, other: "StreamingAcc") -> None:
        """Merge another accumulator of the same type (session merges)."""
        raise NotImplementedError

    def result(self) -> Any:
        raise NotImplementedError


class _CountAcc(StreamingAcc):
    def __init__(self):
        self.n = 0

    def update(self, row, a, ords):
        self.n += row[f"{a}_count"] or 0

    def merge(self, o):
        self.n += o.n

    def result(self):
        return self.n


class _SumAcc(StreamingAcc):
    def __init__(self):
        self.s = None

    def update(self, row, a, ords):
        v = row[f"{a}_sum"]
        if v is not None:
            self.s = v if self.s is None else self.s + v

    def merge(self, o):
        if o.s is not None:
            self.s = o.s if self.s is None else self.s + o.s

    def result(self):
        return self.s


class _AvgAcc(StreamingAcc):
    def __init__(self):
        self.s = 0.0
        self.c = 0

    def update(self, row, a, ords):
        v, c = row[f"{a}_sum"], row[f"{a}_count"]
        if v is not None:
            self.s += v
        self.c += c or 0

    def merge(self, o):
        self.s += o.s
        self.c += o.c

    def result(self):
        return self.s / self.c if self.c else None


class _MinAcc(StreamingAcc):
    is_min = True

    def __init__(self):
        self.v = None

    def update(self, row, a, ords):
        key = f"{a}_min" if self.is_min else f"{a}_max"
        v = row[key]
        if v is None:
            return
        if self.v is None or (v < self.v if self.is_min else v > self.v):
            self.v = v

    def merge(self, o):
        if o.v is None:
            return
        if self.v is None or (o.v < self.v if self.is_min else o.v > self.v):
            self.v = o.v

    def result(self):
        return self.v


class _MaxAcc(_MinAcc):
    is_min = False


class _CollectListAcc(StreamingAcc):
    def __init__(self):
        self.items: list[tuple] = []  # (ord_tuple, value)

    def update(self, row, a, ords):
        vals = row[f"{a}_list"] or []
        ordlists = [row[f"{o}_list"] or [] for o in ords]
        for j, v in enumerate(vals):
            self.items.append((tuple(ol[j] for ol in ordlists), v))

    def merge(self, o):
        self.items.extend(o.items)

    def result(self):
        return [v for _, v in sorted(self.items, key=lambda t: t[0])]


class _CollectSetAcc(StreamingAcc):
    def __init__(self):
        self.vals: set = set()

    def update(self, row, a, ords):
        for v in row[f"{a}_distinct"] or []:
            if v is not None:
                self.vals.add(v)

    def merge(self, o):
        self.vals |= o.vals

    def result(self):
        return sorted(self.vals)


class _LatestAcc(StreamingAcc):
    latest = True

    def __init__(self):
        self.ord: tuple | None = None
        self.v = None

    def update(self, row, a, ords):
        pick = "last" if self.latest else "first"
        v = row[f"{a}_{pick}"]
        if v is None:
            return
        # per-agg masked order partials: __oa{i}_{j}_{pick} where i is this
        # agg's index (agg partial columns are named __a{i}_*)
        i = int(a[3:])
        o = tuple(row[f"__oa{i}_{j}_{pick}"] for j in range(len(ords)))
        if self.ord is None or (o > self.ord if self.latest else o < self.ord):
            self.ord, self.v = o, v

    def merge(self, other):
        if other.ord is None:
            return
        if self.ord is None or (
            other.ord > self.ord if self.latest else other.ord < self.ord
        ):
            self.ord, self.v = other.ord, other.v

    def result(self):
        return self.v


class _EarliestAcc(_LatestAcc):
    latest = False


class _TopKAcc(StreamingAcc):
    def __init__(self, k: int, distinct: bool):
        self.k = k
        self.distinct = distinct
        self.vals: list = []

    def _src(self, a):
        return f"{a}_distinct" if self.distinct else f"{a}_list"

    def update(self, row, a, ords):
        incoming = [v for v in (row[self._src(a)] or []) if v is not None]
        self._absorb(incoming)

    def _absorb(self, incoming):
        merged = self.vals + incoming
        if self.distinct:
            merged = list(set(merged))
        merged.sort(reverse=True)
        self.vals = merged[: self.k]

    def merge(self, o):
        self._absorb(o.vals)

    def result(self):
        return list(self.vals)


class _HistogramAcc(StreamingAcc):
    """Weighted-count merge of the compressed histogram partials
    ({a}_list distinct values + {a}_hcnt counts). Pruning to the
    ``buckets`` smallest keys matches the bounded path's cap and keeps
    state O(buckets) — correct because every incoming partial is itself
    capped to its smallest ``buckets`` distinct values (semilattice)."""

    def __init__(self, buckets: int):
        self.buckets = buckets
        self.counts: Counter = Counter()

    def _prune(self):
        if len(self.counts) > self.buckets:
            keep = sorted(self.counts)[: self.buckets]
            self.counts = Counter({k: self.counts[k] for k in keep})

    def update(self, row, a, ords):
        vals = row.get(f"{a}_list") or []
        cnts = row.get(f"{a}_hcnt")
        for i, v in enumerate(vals):
            if v is None:
                continue
            self.counts[str(v)] += cnts[i] if cnts is not None else 1
        self._prune()

    def merge(self, o):
        self.counts.update(o.counts)
        self._prune()

    def result(self):
        return dict(sorted(self.counts.items()))


class _PercentileAcc(StreamingAcc):
    def __init__(self, q: float):
        self.q = q
        self.vals: list = []

    def update(self, row, a, ords):
        self.vals.extend(v for v in (row[f"{a}_list"] or [])
                         if v is not None)

    def merge(self, o):
        self.vals.extend(o.vals)

    def result(self):
        if not self.vals:
            return None
        import math

        s = sorted(self.vals)
        target = max(1, math.ceil(self.q * len(s) - 1e-9))
        return s[target - 1]


class _VarAcc(StreamingAcc):
    """VAR_SAMP / STDDEV_SAMP: algebraic (sum, sumsq, count) triple,
    mirrors aggregates.VarSamp._var exactly."""

    def __init__(self, sqrt: bool):
        self.s = 0.0
        self.ss = 0.0
        self.n = 0
        self.sqrt = sqrt

    def update(self, row, a, ords):
        self.s += row[f"{a}_sum"] or 0.0
        self.ss += row[f"{a}_sumsq"] or 0.0
        self.n += row[f"{a}_count"] or 0

    def merge(self, o):
        self.s += o.s
        self.ss += o.ss
        self.n += o.n

    def result(self):
        if self.n < 2:
            return None
        var = max(self.ss - (self.s * self.s) / self.n, 0.0) / (self.n - 1)
        return var ** 0.5 if self.sqrt else var


class _CountDistinctAcc(StreamingAcc):
    def __init__(self):
        self.vals: set = set()

    def update(self, row, a, ords):
        for v in row[f"{a}_distinct"] or []:
            if v is not None:
                self.vals.add(v)

    def merge(self, o):
        self.vals |= o.vals

    def result(self):
        return len(self.vals)


def make_acc(agg: AggExpr) -> StreamingAcc:
    if isinstance(agg, Count):
        return _CountAcc()
    if isinstance(agg, Avg):
        return _AvgAcc()
    if isinstance(agg, Sum):
        return _SumAcc()
    if isinstance(agg, Min):
        return _MinAcc()
    if isinstance(agg, Max):
        return _MaxAcc()
    if isinstance(agg, CollectList):
        return _CollectListAcc()
    if isinstance(agg, CollectSet):
        return _CollectSetAcc()
    if isinstance(agg, EarliestByOffset):
        return _EarliestAcc()
    if isinstance(agg, LatestByOffset):
        return _LatestAcc()
    if isinstance(agg, TopKDistinct):
        return _TopKAcc(agg.k, True)
    if isinstance(agg, TopK):
        return _TopKAcc(agg.k, False)
    if isinstance(agg, Histogram):
        return _HistogramAcc(agg.buckets)
    if isinstance(agg, Percentile):
        return _PercentileAcc(agg.q)
    if isinstance(agg, CountDistinct):
        return _CountDistinctAcc()
    if isinstance(agg, StdDev):
        return _VarAcc(sqrt=True)
    if isinstance(agg, VarSamp):
        return _VarAcc(sqrt=False)
    raise TypeError(f"no streaming accumulator for {agg!r}")
