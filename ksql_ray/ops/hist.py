"""Equal-width numeric histogram over a Dataset column.

The engine's HISTOGRAM aggregate (aggregates.py) buckets by VALUE
(ksqlDB semantics: a map of value→count, bucket-capped); training-data
triage needs the other classic: fixed-width BINS over a numeric range
(score distributions, length distributions) computed in one streaming
pass. ksqlDB has neither width_bucket nor histogram bins (absence
verified across /root/reference/ksql/*.go).

Scale shape: an optional min/max aggregate pass (skipped when bounds
are given), then per-batch dense ``np.bincount`` partials — each batch
ships exactly ``bins`` rows regardless of row count — merged by one
tiny ``groupby(bin).sum``. Never a per-value shuffle.

Bin rule (mirrored by the gate oracle): ``bin = min(floor((v - lo) /
w), bins - 1)`` with ``w = (hi - lo) / bins`` — IEEE-double identical
to SQL ``LEAST(FLOOR((v - lo) / ((hi - lo) / bins)), bins - 1)``
because both sides perform the same two divisions and floor. NULLs are
skipped; values outside user-supplied bounds clamp into the edge bins.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

__all__ = ["numeric_histogram"]


def numeric_histogram(ds: ray.data.Dataset, col: str, bins: int = 16,
                      lo: float | None = None,
                      hi: float | None = None) -> ray.data.Dataset:
    """(bin, lo, hi, cnt) rows for the non-empty equal-width bins of
    ``col`` (bin bounds attached for readability; ``hi`` of the last
    bin is the data max). Bounds default to the column min/max (one
    extra aggregate pass)."""
    if bins < 1:
        raise ValueError("bins must be >= 1")
    if lo is None or hi is None:
        from ray.data.aggregate import Max, Min

        mm = ds.aggregate(Min(col), Max(col))
        mn, mx = mm[f"min({col})"], mm[f"max({col})"]
        if (lo is None and mn is None) or (hi is None and mx is None):
            # empty / all-NULL column: no rows to bin -> empty result
            # (not a float(None) TypeError)
            return ray.data.from_arrow(pa.table({
                "bin": pa.array([], pa.int64()),
                "lo": pa.array([], pa.float64()),
                "hi": pa.array([], pa.float64()),
                "cnt": pa.array([], pa.int64())}))
        lo = float(mn) if lo is None else lo
        hi = float(mx) if hi is None else hi
    if not hi > lo:             # constant column: everything in bin 0
        bins = 1
    w = (hi - lo) / bins

    def partial(batch: pa.Table) -> pa.Table:
        from ..streaming.driver import limit_worker_threads

        limit_worker_threads()
        v = pc.drop_null(batch.column(col)).to_numpy(
            zero_copy_only=False).astype(np.float64, copy=False)
        if len(v) and w > 0:
            idx = np.floor((v - lo) / w)
            np.clip(idx, 0, bins - 1, out=idx)
            cnt = np.bincount(idx.astype(np.int64), minlength=bins)
        else:
            cnt = np.zeros(bins, dtype=np.int64)
            if len(v):
                cnt[0] = len(v)
        return pa.table({
            "bin": pa.array(np.arange(bins, dtype=np.int64)),
            "cnt": pa.array(cnt, type=pa.int64()),
        })

    from .smallagg import grouped_sum

    # partials are exactly `bins` rows per batch -> always a small merge
    agg = grouped_sum(
        ds.map_batches(partial, batch_format="pyarrow",
                       zero_copy_batch=True), ["bin"], ["cnt"])

    def finish(batch: pa.Table) -> pa.Table:
        b = batch.column("bin").to_numpy(zero_copy_only=False)
        batch = batch.append_column("lo", pa.array(lo + b * w))
        batch = batch.append_column(
            "hi", pa.array(np.where(b == bins - 1, hi, lo + (b + 1) * w)))
        return batch.filter(
            pc.greater(batch.column("cnt"), 0)).select(
            ["bin", "lo", "hi", "cnt"])

    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)
