"""Per-key row operators: top-n-per-key and sessionization.

Two row-window classics the reference cannot express (ksqlDB has no
non-aggregate OVER clause; absence verified across
/root/reference/ksql/*.go) that every transcript/event pipeline needs:
keep the n best rows per key (best turns per conversation, largest
purchases per user) and assign gap-based session ids (the batch
counterpart of the engine's streaming SESSION windows — windows.py
aggregates per session, this LABELS the rows).

Shape: ONE hash shuffle on the key columns (ops/dedup._partition_by —
whole partitions per group call, never one call per distinct key),
then one vectorized per-partition sort + segment pass. No per-row
Python, no second shuffle.

Semantics (mirrored verbatim by the gate oracles):

* ``top_n_per_key``: rank rows per key by (order_col desc|asc,
  tiebreak asc) and keep rank < n — SQL
  ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY ...) <= n``.
* ``sessionize``: order rows per key by (ts, tiebreak); a row opens a
  new session iff its gap to the previous row exceeds ``gap_us``;
  ``session_id`` is the per-key 0-based session ordinal — SQL
  gaps-and-islands (SUM of new-session flags over the same order).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .dedup import _partition_by, _pin

__all__ = ["top_n_per_key", "sessionize", "with_lag", "moving_agg"]


def _segment_starts(sort_keys: list[np.ndarray], n: int) -> np.ndarray:
    """Start index of each equal-key segment, broadcast to every row
    (input arrays must already be sorted by the keys)."""
    seg = np.zeros(n, dtype=np.int64)
    if n == 0:
        return seg
    change = np.zeros(n, dtype=bool)
    for k in sort_keys:
        change[1:] |= k[1:] != k[:-1]
    idx = np.flatnonzero(change)
    seg[idx] = idx
    np.maximum.accumulate(seg, out=seg)
    return seg


def _key_arrays(tbl: pa.Table, key_cols: list[str]) -> list[np.ndarray]:
    return [tbl.column(k).to_numpy(zero_copy_only=False)
            for k in key_cols]


def top_n_per_key(ds: ray.data.Dataset, key_cols: list[str],
                  order_col: str, n: int, descending: bool = True,
                  tiebreak: str | None = None,
                  num_partitions: int = 32) -> ray.data.Dataset:
    """Rows whose rank within their key group is < n, with the 0-based
    ``rank`` attached."""
    if n < 1:
        raise ValueError("n must be >= 1")
    direction = "descending" if descending else "ascending"
    sort_spec = [(k, "ascending") for k in key_cols]
    sort_spec.append((order_col, direction))
    if tiebreak:
        sort_spec.append((tiebreak, "ascending"))

    def pick(group: pa.Table) -> pa.Table:
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        if group.num_rows == 0:
            return group.append_column("rank",
                                       pa.array([], type=pa.int64()))
        tbl = group.take(pc.sort_indices(group, sort_keys=sort_spec))
        seg = _segment_starts(_key_arrays(tbl, key_cols), tbl.num_rows)
        rank = np.arange(tbl.num_rows, dtype=np.int64) - seg
        tbl = tbl.append_column("rank", pa.array(rank, type=pa.int64()))
        return tbl.filter(pa.array(rank < n))

    return _partition_by(ds, key_cols, num_partitions).map_groups(
        _pin(pick), batch_format="pyarrow")


def with_lag(ds: ray.data.Dataset, key_cols: list[str],
             order_col: str, lag_cols: list[str],
             tiebreak: str | None = None, suffix: str = "_prev",
             num_partitions: int = 32) -> ray.data.Dataset:
    """Rows with each ``lag_cols`` column's PREVIOUS same-key value
    attached as ``<col><suffix>`` (null on the key's first row) — SQL
    ``LAG(col) OVER (PARTITION BY key ORDER BY order_col[, tiebreak])``.
    The building block for inter-event deltas (turn gaps, value
    changes) the reference cannot express."""
    sort_spec = ([(k, "ascending") for k in key_cols]
                 + [(order_col, "ascending")]
                 + ([(tiebreak, "ascending")] if tiebreak else []))

    def label(group: pa.Table) -> pa.Table:
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        if group.num_rows == 0:
            for c in lag_cols:
                group = group.append_column(
                    c + suffix, pa.nulls(0, group.schema.field(c).type))
            return group
        tbl = group.take(pc.sort_indices(group, sort_keys=sort_spec))
        n = tbl.num_rows
        first = np.zeros(n, dtype=bool)
        first[0] = True
        for k in _key_arrays(tbl, key_cols):
            first[1:] |= k[1:] != k[:-1]
        # previous-row index, masked on each key's first row
        prev = np.arange(-1, n - 1, dtype=np.int64)
        take = pa.array(prev, mask=first)
        for c in lag_cols:
            tbl = tbl.append_column(c + suffix, tbl.column(c).take(take))
        return tbl

    return _partition_by(ds, key_cols, num_partitions).map_groups(
        _pin(label), batch_format="pyarrow")


def moving_agg(ds: ray.data.Dataset, key_cols: list[str],
               order_col: str, value_col: str, window_rows: int,
               tiebreak: str | None = None,
               num_partitions: int = 32) -> ray.data.Dataset:
    """Rows with the per-key ROLLING sum/avg/count of ``value_col`` over
    the last ``window_rows`` rows (current row inclusive) attached as
    ``<col>_rsum/_ravg/_rcnt`` — SQL ``SUM/AVG/COUNT(col) OVER
    (PARTITION BY key ORDER BY order_col[, tiebreak] ROWS BETWEEN w-1
    PRECEDING AND CURRENT ROW)``. NULLs are skipped (rcnt counts
    non-null; rsum/ravg are NULL when the window holds none), matching
    SQL aggregate semantics.

    Vectorized as two cumulative sums per sorted partition (values with
    NULL→0, plus a non-null indicator); the window start is clamped to
    the key's segment start so windows never cross keys."""
    if window_rows < 1:
        raise ValueError("window_rows must be >= 1")
    sort_spec = ([(k, "ascending") for k in key_cols]
                 + [(order_col, "ascending")]
                 + ([(tiebreak, "ascending")] if tiebreak else []))

    def roll(group: pa.Table) -> pa.Table:
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        if group.num_rows == 0:
            group = group.append_column(
                value_col + "_rsum", pa.array([], type=pa.float64()))
            group = group.append_column(
                value_col + "_ravg", pa.array([], type=pa.float64()))
            return group.append_column(
                value_col + "_rcnt", pa.array([], type=pa.int64()))
        tbl = group.take(pc.sort_indices(group, sort_keys=sort_spec))
        n = tbl.num_rows
        col = tbl.column(value_col)
        valid = ~pc.is_null(col).to_numpy(zero_copy_only=False)
        v = pc.fill_null(pc.cast(col, pa.float64()), 0.0).to_numpy(
            zero_copy_only=False)
        seg = _segment_starts(_key_arrays(tbl, key_cols), n)
        start = np.maximum(np.arange(n, dtype=np.int64) - window_rows + 1,
                           seg)
        # prefix sums with a leading 0 so window = csum[i+1] - csum[start]
        csum = np.zeros(n + 1)
        np.cumsum(v, out=csum[1:])
        ccnt = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(valid, out=ccnt[1:])
        idx = np.arange(1, n + 1)
        rcnt = ccnt[idx] - ccnt[start]
        rsum = csum[idx] - csum[start]
        empty = rcnt == 0
        rsum_a = pa.array(rsum, mask=empty)
        ravg = np.divide(rsum, rcnt, out=np.zeros(n), where=~empty)
        tbl = tbl.append_column(value_col + "_rsum", rsum_a)
        tbl = tbl.append_column(value_col + "_ravg",
                                pa.array(ravg, mask=empty))
        return tbl.append_column(value_col + "_rcnt",
                                 pa.array(rcnt, type=pa.int64()))

    return _partition_by(ds, key_cols, num_partitions).map_groups(
        _pin(roll), batch_format="pyarrow")


def sessionize(ds: ray.data.Dataset, key_cols: list[str], ts_col: str,
               gap_us: int, tiebreak: str | None = None,
               num_partitions: int = 32) -> ray.data.Dataset:
    """Rows with a per-key 0-based ``session_id`` attached (a new
    session opens when the event-time gap to the previous row of the
    same key exceeds ``gap_us``)."""
    if gap_us <= 0:
        raise ValueError("gap_us must be > 0")
    sort_spec = ([(k, "ascending") for k in key_cols]
                 + [(ts_col, "ascending")]
                 + ([(tiebreak, "ascending")] if tiebreak else []))

    def label(group: pa.Table) -> pa.Table:
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        if group.num_rows == 0:
            return group.append_column("session_id",
                                       pa.array([], type=pa.int64()))
        tbl = group.take(pc.sort_indices(group, sort_keys=sort_spec))
        nrows = tbl.num_rows
        ts = tbl.column(ts_col)
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(ts, pa.int64())
        tsv = ts.to_numpy(zero_copy_only=False)
        new = np.ones(nrows, dtype=bool)   # first row of each key
        same_key = np.ones(nrows - 1, dtype=bool) if nrows > 1 else \
            np.empty(0, bool)
        for k in _key_arrays(tbl, key_cols):
            same_key &= k[1:] == k[:-1]
        new[1:] = ~same_key | (tsv[1:] - tsv[:-1] > gap_us)
        # per-key session ordinal: cumsum of new-session flags minus the
        # cumsum value at the key's first row
        csum = np.cumsum(new)
        seg = _segment_starts(_key_arrays(tbl, key_cols), nrows)
        sid = csum - csum[seg]
        return tbl.append_column("session_id",
                                 pa.array(sid, type=pa.int64()))

    return _partition_by(ds, key_cols, num_partitions).map_groups(
        _pin(label), batch_format="pyarrow")
