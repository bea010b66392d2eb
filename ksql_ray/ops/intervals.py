"""Interval coalescing and time-grid gap-fill.

Two time-series classics the reference cannot express (ksqlDB has no
interval algebra or resampling surface; absence verified across
/root/reference/ksql/*.go) that event/usage pipelines need constantly:
flatten overlapping per-key intervals into covered spans (machine
uptime, GPU occupancy, speaker overlap) and resample irregular events
onto a regular per-key time grid with forward-fill (feature snapshots,
billing ticks, training-curriculum schedules).

Shape (both ops): ONE hash shuffle on the key columns
(ops/dedup._partition_by), then one vectorized per-partition pass —
sort, segment scan, prefix/`reduceat` reductions. No per-row Python,
no second shuffle, nothing driver-side; output volume is bounded by
the number of merged spans / grid points, never the input row count
squared.

Semantics (mirrored verbatim by the gate oracles):

* ``merge_intervals``: SQL gaps-and-islands — a new island opens when
  an interval's start exceeds the running MAX(end) of its key's
  earlier intervals (plus ``gap_us`` tolerance); each island reports
  MIN(start), MAX(end), COUNT(*).
* ``gap_fill``: per key, the grid ``MIN(ts) + i*step_us`` for
  ``i in [0, (MAX(ts)-MIN(ts))/step_us]`` (DuckDB
  ``generate_series(lo, hi, step)``), each grid point carrying the
  value columns of the LAST event at-or-before it, ties broken by the
  greatest ``tiebreak`` (``ORDER BY ts DESC, tiebreak DESC LIMIT 1``).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .dedup import _partition_by, _pin
from .rows import _key_arrays, _segment_starts, _ts_int64

__all__ = ["merge_intervals", "gap_fill"]


def merge_intervals(ds: ray.data.Dataset, key_cols: list[str],
                    start_col: str, end_col: str, gap_us: int = 0,
                    num_partitions: int = 32) -> ray.data.Dataset:
    """Coalesce overlapping/adjacent per-key intervals into covered
    spans: one output row per maximal island with ``span_start``
    (min start), ``span_end`` (max end) and ``n_rows`` (intervals
    merged). Two intervals belong to one island when the later one's
    start is <= the earlier ones' running max end + ``gap_us``.
    NULL or inverted (end < start) intervals are rejected.

    Vectorized: sort by (key, start, end), per-key running MAX(end)
    via a cython grouped cummax, island ids by one cumsum, island
    aggregates by ``np.maximum.reduceat`` over island starts."""
    if gap_us < 0:
        raise ValueError("gap_us must be >= 0")
    sort_spec = ([(k, "ascending") for k in key_cols]
                 + [(start_col, "ascending"), (end_col, "ascending")])

    def coalesce(group: pa.Table) -> pa.Table:
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        keys = group.select(key_cols)
        s_type = group.schema.field(start_col).type
        e_type = group.schema.field(end_col).type

        def out(key_tbl, s_vals, e_vals, n_vals):
            cols = {k: key_tbl.column(k) for k in key_cols}
            cols["span_start"] = pa.array(
                s_vals, type=pa.int64()).cast(s_type)
            cols["span_end"] = pa.array(
                e_vals, type=pa.int64()).cast(e_type)
            cols["n_rows"] = pa.array(n_vals, type=pa.int64())
            return pa.table(cols)

        if group.num_rows == 0:
            return out(keys, [], [], [])
        tbl = group.take(pc.sort_indices(group, sort_keys=sort_spec))
        n = tbl.num_rows
        s = _ts_int64(tbl, start_col, "merge_intervals")
        e = _ts_int64(tbl, end_col, "merge_intervals")
        if (e < s).any():
            raise ValueError("merge_intervals: end < start")
        seg = _segment_starts(_key_arrays(tbl, key_cols), n)
        run_max = pd.Series(e).groupby(seg).cummax().to_numpy()
        new = np.empty(n, dtype=bool)
        new[0] = True
        new[1:] = (seg[1:] == np.arange(1, n)) | (s[1:] >
                                                  run_max[:-1] + gap_us)
        st = np.flatnonzero(new)
        span_end = np.maximum.reduceat(e, st)
        n_rows = np.diff(np.r_[st, n])
        return out(tbl.select(key_cols).take(pa.array(st)),
                   s[st], span_end, n_rows)

    return _partition_by(ds, key_cols, num_partitions).map_groups(
        _pin(coalesce), batch_format="pyarrow")


def gap_fill(ds: ray.data.Dataset, key_cols: list[str], ts_col: str,
             value_cols: list[str], step_us: int,
             tiebreak: str | None = None,
             num_partitions: int = 32) -> ray.data.Dataset:
    """Resample each key onto the regular grid ``MIN(ts) + i*step_us``
    (inclusive of MAX(ts) when it lands on the grid), forward-filling
    every ``value_cols`` column from the last event at-or-before the
    grid point (ties on equal ts broken by greatest ``tiebreak``).
    Output: key cols + ``ts`` (grid, original timestamp type) +
    the filled value columns. NULL timestamps are rejected.

    Vectorized: per-key grids materialize with one ``np.repeat`` +
    cumsum (no per-key loop); the fill index is ONE global
    ``np.searchsorted`` over segment-banded timestamps (same band
    trick as rows.time_range_agg, with the same per-segment fallback).
    Output volume is sum over keys of span/step — the caller picks
    ``step_us``; input row count never amplifies it."""
    if step_us <= 0:
        raise ValueError("step_us must be > 0")
    sort_spec = ([(k, "ascending") for k in key_cols]
                 + [(ts_col, "ascending")]
                 + ([(tiebreak, "ascending")] if tiebreak else []))

    def fill(group: pa.Table) -> pa.Table:
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        ts_type = group.schema.field(ts_col).type

        def out(key_tbl, g_vals, val_tbl):
            cols = {k: key_tbl.column(k) for k in key_cols}
            cols[ts_col] = pa.array(
                g_vals, type=pa.int64()).cast(ts_type)
            for c in value_cols:
                cols[c] = val_tbl.column(c)
            return pa.table(cols)

        if group.num_rows == 0:
            return out(group.select(key_cols), [],
                       group.select(value_cols))
        tbl = group.take(pc.sort_indices(group, sort_keys=sort_spec))
        n = tbl.num_rows
        tsv = _ts_int64(tbl, ts_col, "gap_fill")
        seg = _segment_starts(_key_arrays(tbl, key_cols), n)
        starts = np.unique(seg)                 # segment start rows
        ends = np.r_[starts[1:], n]
        lo = tsv[starts]
        counts = (tsv[ends - 1] - lo) // step_us + 1
        total = int(counts.sum())
        cum = np.r_[0, np.cumsum(counts)]
        # grid point ordinal within its segment, then the grid itself
        k_ord = np.arange(total) - np.repeat(cum[:-1], counts)
        grid = np.repeat(lo, counts) + k_ord * step_us
        # fill index: last row with ts <= grid point, same segment
        pos = np.searchsorted(starts, seg)
        rel = tsv - tsv.min()
        span = int(rel.max())
        k_band = span + 1
        if len(starts) * k_band < 2 ** 62:      # banded fast path
            band = pos * k_band + rel
            gband = (np.repeat(np.arange(len(starts)), counts) * k_band
                     + grid - tsv.min())
            idx = np.searchsorted(band, gband, side="right") - 1
        else:                                   # per-segment fallback
            idx = np.empty(total, dtype=np.int64)
            for i, (s, e) in enumerate(zip(starts, ends)):
                sl = slice(cum[i], cum[i + 1])
                idx[sl] = s + np.searchsorted(
                    tsv[s:e], grid[sl], side="right") - 1
        take = pa.array(idx)
        return out(tbl.select(key_cols).take(take), grid,
                   tbl.select(value_cols).take(take))

    return _partition_by(ds, key_cols, num_partitions).map_groups(
        _pin(fill), batch_format="pyarrow")
