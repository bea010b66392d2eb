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

__all__ = ["top_n_per_key", "sessionize", "with_lag", "with_lead",
           "moving_agg", "time_range_agg", "time_range_distinct",
           "rank_per_key", "rank_dist_per_key", "first_last_per_key",
           "standardize_per_key", "transition_counts",
           "top_values_per_key", "throttle", "session_stats"]


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


def with_lead(ds: ray.data.Dataset, key_cols: list[str],
              order_col: str, lead_cols: list[str],
              tiebreak: str | None = None, suffix: str = "_next",
              num_partitions: int = 32) -> ray.data.Dataset:
    """Rows with each ``lead_cols`` column's NEXT same-key value attached
    as ``<col><suffix>`` (null on the key's last row) — SQL
    ``LEAD(col) OVER (PARTITION BY key ORDER BY order_col[, tiebreak])``.
    The mirror of :func:`with_lag`; the building block for
    prompt→response pair extraction from turn streams (pair each user
    turn with the assistant turn that answers it) and next-event
    prediction features."""
    sort_spec = ([(k, "ascending") for k in key_cols]
                 + [(order_col, "ascending")]
                 + ([(tiebreak, "ascending")] if tiebreak else []))

    def label(group: pa.Table) -> pa.Table:
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        if group.num_rows == 0:
            for c in lead_cols:
                group = group.append_column(
                    c + suffix, pa.nulls(0, group.schema.field(c).type))
            return group
        tbl = group.take(pc.sort_indices(group, sort_keys=sort_spec))
        n = tbl.num_rows
        last = np.zeros(n, dtype=bool)
        last[-1] = True
        for k in _key_arrays(tbl, key_cols):
            last[:-1] |= k[1:] != k[:-1]
        # next-row index, masked on each key's last row
        nxt = np.arange(1, n + 1, dtype=np.int64)
        nxt[-1] = 0  # masked anyway; keep the index in range
        take = pa.array(nxt, mask=last)
        for c in lead_cols:
            tbl = tbl.append_column(c + suffix, tbl.column(c).take(take))
        return tbl

    return _partition_by(ds, key_cols, num_partitions).map_groups(
        _pin(label), batch_format="pyarrow")


def rank_per_key(ds: ray.data.Dataset, key_cols: list[str],
                 order_col: str, descending: bool = False,
                 tiebreak: str | None = None,
                 num_partitions: int = 32) -> ray.data.Dataset:
    """Rows with the SQL rank family attached per key over
    ``order_col``: ``row_number`` (1-based, tiebreak-ordered so it is
    deterministic when ``tiebreak`` completes a total order), ``rank``
    (ties share the first row number, gaps after), and ``dense_rank``
    (ties share, no gaps) — ``ROW_NUMBER()/RANK()/DENSE_RANK() OVER
    (PARTITION BY key ORDER BY order_col [DESC])``. Ties are equal
    ``order_col`` values; NULL order values are peers of each other
    (one shared rank, SQL semantics); the tiebreak only sequences
    row_number.

    Same shape as the other row ops: ONE key shuffle, one vectorized
    per-partition sort + segment pass."""
    direction = "descending" if descending else "ascending"
    sort_spec = ([(k, "ascending") for k in key_cols]
                 + [(order_col, direction)]
                 + ([(tiebreak, "ascending")] if tiebreak else []))

    def label(group: pa.Table) -> pa.Table:
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        if group.num_rows == 0:
            for c in ("row_number", "rank", "dense_rank"):
                group = group.append_column(
                    c, pa.array([], type=pa.int64()))
            return group
        tbl = group.take(pc.sort_indices(group, sort_keys=sort_spec))
        n = tbl.num_rows
        keys = _key_arrays(tbl, key_cols)
        seg = _segment_starts(keys, n)
        rn = np.arange(n, dtype=np.int64) - seg + 1
        # tie runs: equal key AND equal order value. NULL order values
        # are PEERS (share a rank, SQL semantics) — a raw numpy != on a
        # float/datetime column would make every NaN/NaT its own run.
        order_a = tbl.column(order_col)
        order = order_a.to_numpy(zero_copy_only=False)
        onull = pc.is_null(order_a).to_numpy(zero_copy_only=False)
        change = np.zeros(n, dtype=bool)
        for k in keys:
            change[1:] |= k[1:] != k[:-1]
        change[1:] |= ((order[1:] != order[:-1])
                       & ~(onull[1:] & onull[:-1]))
        run = np.zeros(n, dtype=np.int64)
        idx = np.flatnonzero(change)
        run[idx] = idx
        np.maximum.accumulate(run, out=run)
        rank = run - seg + 1
        # dense rank: per-key ordinal of the tie run (sessionize logic)
        new = np.zeros(n, dtype=bool)
        new[np.unique(run)] = True
        csum = np.cumsum(new)
        dense = csum - csum[seg] + 1
        tbl = tbl.append_column("row_number", pa.array(rn))
        tbl = tbl.append_column("rank", pa.array(rank))
        return tbl.append_column("dense_rank", pa.array(dense))

    return _partition_by(ds, key_cols, num_partitions).map_groups(
        _pin(label), batch_format="pyarrow")


def _segment_ends(seg: np.ndarray, n: int) -> np.ndarray:
    """Exclusive end index of each row's segment (input: per-row start
    indexes from :func:`_segment_starts`)."""
    starts = np.unique(seg)
    ends = np.r_[starts[1:], n]
    return ends[np.searchsorted(starts, seg)]


def rank_dist_per_key(ds: ray.data.Dataset, key_cols: list[str],
                      order_col: str, n_tiles: int = 4,
                      descending: bool = False,
                      tiebreak: str | None = None,
                      num_partitions: int = 32) -> ray.data.Dataset:
    """Rows with the SQL distribution-window family attached per key
    over ``order_col``: ``percent_rank`` ((rank-1)/(cnt-1); 0.0 for a
    single-row key), ``cume_dist`` (fraction of key rows at or before
    the current peer group), and 1-based ``tile`` — ``PERCENT_RANK()/
    CUME_DIST()/NTILE(n) OVER (PARTITION BY key ORDER BY order_col
    [DESC][, tiebreak])``. NTILE follows SQL exactly: the first
    ``cnt % n`` tiles hold one extra row; its row numbering uses the
    tiebreak (pass one for a total order, as SQL needs for
    deterministic NTILE). Tie peers share percent_rank/cume_dist; NULL
    order values are peers of each other (SQL semantics).

    Same shape as the other row ops: ONE key shuffle, one vectorized
    per-partition sort + segment pass."""
    if n_tiles < 1:
        raise ValueError("n_tiles must be >= 1")
    direction = "descending" if descending else "ascending"
    sort_spec = ([(k, "ascending") for k in key_cols]
                 + [(order_col, direction)]
                 + ([(tiebreak, "ascending")] if tiebreak else []))

    def label(group: pa.Table) -> pa.Table:
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        if group.num_rows == 0:
            group = group.append_column(
                "percent_rank", pa.array([], type=pa.float64()))
            group = group.append_column(
                "cume_dist", pa.array([], type=pa.float64()))
            return group.append_column(
                "tile", pa.array([], type=pa.int64()))
        tbl = group.take(pc.sort_indices(group, sort_keys=sort_spec))
        n = tbl.num_rows
        keys = _key_arrays(tbl, key_cols)
        seg = _segment_starts(keys, n)
        end = _segment_ends(seg, n)
        cnt = end - seg
        # tie runs (same NULL-peer rule as rank_per_key)
        order_a = tbl.column(order_col)
        order = order_a.to_numpy(zero_copy_only=False)
        onull = pc.is_null(order_a).to_numpy(zero_copy_only=False)
        change = np.zeros(n, dtype=bool)
        for k in keys:
            change[1:] |= k[1:] != k[:-1]
        change[1:] |= ((order[1:] != order[:-1])
                       & ~(onull[1:] & onull[:-1]))
        run = np.zeros(n, dtype=np.int64)
        idx = np.flatnonzero(change)
        run[idx] = idx
        np.maximum.accumulate(run, out=run)
        rank = run - seg + 1
        prk = np.where(cnt > 1, (rank - 1) / np.maximum(cnt - 1, 1), 0.0)
        cume = (_segment_ends(run, n) - seg) / cnt
        # SQL NTILE over the 0-based (tiebreak-total) row number: the
        # first cnt % t tiles get floor(cnt/t)+1 rows, the rest get
        # floor(cnt/t)
        rn0 = np.arange(n, dtype=np.int64) - seg
        small = cnt // n_tiles
        extra = cnt % n_tiles
        boundary = extra * (small + 1)
        tile = np.where(
            rn0 < boundary, rn0 // (small + 1),
            extra + (rn0 - boundary) // np.maximum(small, 1)) + 1
        tbl = tbl.append_column("percent_rank", pa.array(prk))
        tbl = tbl.append_column("cume_dist", pa.array(cume))
        return tbl.append_column("tile",
                                 pa.array(tile, type=pa.int64()))

    return _partition_by(ds, key_cols, num_partitions).map_groups(
        _pin(label), batch_format="pyarrow")


def first_last_per_key(ds: ray.data.Dataset, key_cols: list[str],
                       order_col: str, value_cols: list[str],
                       nth: int | None = None,
                       descending: bool = False,
                       tiebreak: str | None = None,
                       num_partitions: int = 32) -> ray.data.Dataset:
    """Rows with each ``value_cols`` column's first / last (and, when
    ``nth`` is given, nth) same-key value in ``order_col`` order
    attached as ``<col>_first`` / ``<col>_last`` / ``<col>_nth`` — SQL
    ``FIRST_VALUE/LAST_VALUE/NTH_VALUE(col, n) OVER (PARTITION BY key
    ORDER BY order_col[, tiebreak] ROWS BETWEEN UNBOUNDED PRECEDING
    AND UNBOUNDED FOLLOWING)`` with RESPECT NULLS. ``<col>_nth`` is
    NULL for keys with fewer than ``nth`` rows. Pass a tiebreak for a
    total order (as SQL needs for deterministic results).

    Baseline-vs-current feature extraction for turn streams (each
    turn against the conversation's opening/closing turn); one key
    shuffle, one vectorized sort + segment pass."""
    if nth is not None and nth < 1:
        raise ValueError("nth must be >= 1")
    direction = "descending" if descending else "ascending"
    sort_spec = ([(k, "ascending") for k in key_cols]
                 + [(order_col, direction)]
                 + ([(tiebreak, "ascending")] if tiebreak else []))

    def label(group: pa.Table) -> pa.Table:
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        if group.num_rows == 0:
            for c in value_cols:
                t = group.schema.field(c).type
                group = group.append_column(c + "_first", pa.nulls(0, t))
                group = group.append_column(c + "_last", pa.nulls(0, t))
                if nth is not None:
                    group = group.append_column(c + "_nth",
                                                pa.nulls(0, t))
            return group
        tbl = group.take(pc.sort_indices(group, sort_keys=sort_spec))
        n = tbl.num_rows
        seg = _segment_starts(_key_arrays(tbl, key_cols), n)
        end = _segment_ends(seg, n)
        first_i = pa.array(seg)
        last_i = pa.array(end - 1)
        if nth is not None:
            pos = seg + (nth - 1)
            nth_i = pa.array(np.minimum(pos, n - 1), mask=pos >= end)
        for c in value_cols:
            col = tbl.column(c)
            tbl = tbl.append_column(c + "_first", col.take(first_i))
            tbl = tbl.append_column(c + "_last", col.take(last_i))
            if nth is not None:
                tbl = tbl.append_column(c + "_nth", col.take(nth_i))
        return tbl

    return _partition_by(ds, key_cols, num_partitions).map_groups(
        _pin(label), batch_format="pyarrow")


def standardize_per_key(ds: ray.data.Dataset, key_cols: list[str],
                        value_col: str,
                        num_partitions: int = 32) -> ray.data.Dataset:
    """Rows with the per-key z-score and min-max normalization of
    ``value_col`` attached as ``<col>_z`` and ``<col>_minmax`` — SQL
    ``(v - AVG(v) OVER k) / STDDEV_SAMP(v) OVER k`` and
    ``(v - MIN(v) OVER k) / (MAX(v) OVER k - MIN(v) OVER k)``. Both are
    NULL when undefined (single-row / constant key, NULL value), SQL
    division-by-zero-NULLIF semantics. Per-key feature scaling for
    quality-score calibration across heterogeneous sources.

    Oracle-parity notes: min/max are exact (no summation); the z-score
    denominator is a square root, so its irrationality makes fixed-
    decimal ROUND safe on both sides (BASELINE.md perf lesson 20).
    Shape: ONE key shuffle, one segment pass — mean/var via the same
    sorted-segment ``np.add.reduceat`` reductions as the aggregates."""

    def label(group: pa.Table) -> pa.Table:
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        if group.num_rows == 0:
            group = group.append_column(
                value_col + "_z", pa.array([], type=pa.float64()))
            return group.append_column(
                value_col + "_minmax", pa.array([], type=pa.float64()))
        # sort by (key, value) so each segment's float summation order
        # is a function of the key's value MULTISET, not of block
        # layout / parallelism — reruns at any num_cpus produce
        # bit-identical means/variances
        tbl = group.take(pc.sort_indices(
            group, sort_keys=[(k, "ascending") for k in key_cols]
            + [(value_col, "ascending")]))
        n = tbl.num_rows
        seg = _segment_starts(_key_arrays(tbl, key_cols), n)
        starts = np.unique(seg)
        pos = np.searchsorted(starts, seg)       # segment ordinal per row
        v = pc.cast(tbl.column(value_col), pa.float64()).to_numpy(
            zero_copy_only=False)
        ok = ~np.isnan(v)
        v0 = np.where(ok, v, 0.0)
        cnt = np.add.reduceat(ok.astype(np.int64), starts)
        s1 = np.add.reduceat(v0, starts)
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = s1 / cnt
            # two-pass variance (stable): sum of squared deviations
            dev = np.where(ok, v - mean[pos], 0.0)
            m2 = np.add.reduceat(dev * dev, starts)
            sd = np.sqrt(m2 / np.maximum(cnt - 1, 1))
            vmin = np.minimum.reduceat(np.where(ok, v, np.inf), starts)
            vmax = np.maximum.reduceat(np.where(ok, v, -np.inf), starts)
            z = (v - mean[pos]) / sd[pos]
            mm = (v - vmin[pos]) / (vmax[pos] - vmin[pos])
        zbad = ~ok | (cnt[pos] < 2) | (sd[pos] == 0) | ~np.isfinite(z)
        mbad = ~ok | (vmax[pos] <= vmin[pos]) | ~np.isfinite(mm)
        tbl = tbl.append_column(
            value_col + "_z", pa.array(np.where(zbad, 0.0, z), mask=zbad))
        return tbl.append_column(
            value_col + "_minmax",
            pa.array(np.where(mbad, 0.0, mm), mask=mbad))

    return _partition_by(ds, key_cols, num_partitions).map_groups(
        _pin(label), batch_format="pyarrow")


def transition_counts(ds: ray.data.Dataset, key_cols: list[str],
                      order_col: str, label_col: str,
                      tiebreak: str | None = None,
                      num_partitions: int = 32) -> ray.data.Dataset:
    """Corpus-wide count of adjacent same-key label transitions
    ``(from_label, to_label, cnt)`` — the role-transition matrix of a
    turn stream (user→assistant, assistant→tool, ...) — SQL
    ``LEAD(label) OVER (PARTITION BY key ORDER BY ...)`` then
    ``GROUP BY label, next``. NULL labels never form transitions (a
    pair is dropped when either endpoint is NULL, matching the
    oracle's LEAD-is-not-null filter). ONE key shuffle for the
    pairing; the final groupby moves only per-partition (from, to,
    cnt) partials (bounded by the label alphabet squared, not the row
    count)."""
    sort_spec = ([(k, "ascending") for k in key_cols]
                 + [(order_col, "ascending")]
                 + ([(tiebreak, "ascending")] if tiebreak else []))

    def pairs(group: pa.Table) -> pa.Table:
        import pandas as pd
        empty = pa.table({
            "from_label": pa.array([], type=pa.string()),
            "to_label": pa.array([], type=pa.string()),
            "cnt": pa.array([], type=pa.int64())})
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        n = group.num_rows
        if n < 2:
            return empty
        tbl = group.take(pc.sort_indices(group, sort_keys=sort_spec))
        adj = np.ones(n - 1, dtype=bool)
        for k in _key_arrays(tbl, key_cols):
            adj &= k[1:] == k[:-1]
        lab = tbl.column(label_col).to_numpy(zero_copy_only=False)
        frm, to = lab[:-1][adj], lab[1:][adj]
        # NULL labels do not form transitions (matches the SQL oracle,
        # where LEAD()'s NULL rows are filtered out) — and a -1
        # factorize sentinel would make `packed` negative and crash
        # np.bincount.
        ok = ~(pd.isna(frm) | pd.isna(to))
        frm, to = frm[ok], to[ok]
        if not len(frm):
            return empty
        # factorize over the combined alphabet, pack (from, to) codes
        # into one int, bincount — no per-pair Python objects
        m = len(frm)
        codes, uniq = pd.factorize(np.concatenate([frm, to]))
        packed = codes[:m].astype(np.int64) * len(uniq) + codes[m:]
        cnt = np.bincount(packed)
        nz = np.flatnonzero(cnt)
        ua = np.asarray(uniq, dtype=object)
        return pa.table({
            "from_label": pa.array(ua[nz // len(uniq)], type=pa.string()),
            "to_label": pa.array(ua[nz % len(uniq)], type=pa.string()),
            "cnt": pa.array(cnt[nz], type=pa.int64())})

    parts = _partition_by(ds, key_cols, num_partitions).map_groups(
        _pin(pairs), batch_format="pyarrow")
    from .smallagg import grouped_sum

    # partials are bounded by the label alphabet squared -> small merge
    return grouped_sum(parts, ["from_label", "to_label"], ["cnt"])


def moving_agg(ds: ray.data.Dataset, key_cols: list[str],
               order_col: str, value_col: str,
               window_rows: int | None,
               tiebreak: str | None = None,
               num_partitions: int = 32) -> ray.data.Dataset:
    """Rows with the per-key ROLLING sum/avg/count of ``value_col`` over
    the last ``window_rows`` rows (current row inclusive; ``None`` =
    cumulative / ROWS UNBOUNDED PRECEDING) attached as
    ``<col>_rsum/_ravg/_rcnt`` — SQL ``SUM/AVG/COUNT(col) OVER
    (PARTITION BY key ORDER BY order_col[, tiebreak] ROWS BETWEEN w-1
    PRECEDING AND CURRENT ROW)``. NULLs are skipped (rcnt counts
    non-null; rsum/ravg are NULL when the window holds none), matching
    SQL aggregate semantics.

    Vectorized as two cumulative sums per sorted partition (values with
    NULL→0, plus a non-null indicator); the window start is clamped to
    the key's segment start so windows never cross keys."""
    if window_rows is not None and window_rows < 1:
        raise ValueError("window_rows must be >= 1 (or None)")
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
        if window_rows is None:      # cumulative: UNBOUNDED PRECEDING
            start = seg
        else:
            start = np.maximum(
                np.arange(n, dtype=np.int64) - window_rows + 1, seg)
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


def _ts_int64(tbl: pa.Table, ts_col: str, op_name: str) -> np.ndarray:
    """The sorted partition's timestamps as int64 (timestamps cast to
    their epoch representation); NULLs rejected — RANGE frames over
    NULL order keys are not supported."""
    ts = tbl.column(ts_col)
    if pc.any(pc.is_null(ts)).as_py():
        raise ValueError(f"{op_name}: NULL timestamps")
    if pa.types.is_timestamp(ts.type):
        ts = pc.cast(ts, pa.int64())
    return ts.to_numpy(zero_copy_only=False).astype(np.int64)


def _range_frames(tsv: np.ndarray, seg: np.ndarray,
                  range_us: int) -> tuple[np.ndarray, np.ndarray]:
    """Per-row trailing RANGE frame ``[lo, hi)`` (row-index bounds) for
    the event-time window ``[ts - range_us, ts]``, over a partition
    sorted by (key, ts) with ``seg`` = each row's key-segment start.

    Each segment's timestamps are offset into a disjoint band (segment
    ordinal × (span + range + 1)) so ONE global ``np.searchsorted``
    finds every row's frame at once; falls back to a per-SEGMENT
    (never per-row) searchsorted loop if the band arithmetic would
    overflow int64. Both bounds are globally nondecreasing (each
    frame lies inside its own segment)."""
    n = len(tsv)
    starts = np.unique(seg)
    pos = np.searchsorted(starts, seg)      # segment ordinal
    rel = tsv - tsv.min()
    span = int(rel.max())
    k_band = span + range_us + 1
    if len(starts) * k_band < 2 ** 62:      # banded fast path
        band = pos * k_band + rel
        lo = np.searchsorted(band, band - range_us, side="left")
        hi = np.searchsorted(band, band, side="right")
    else:                                   # per-segment fallback
        ends = np.r_[starts[1:], n]
        lo = np.empty(n, dtype=np.int64)
        hi = np.empty(n, dtype=np.int64)
        for s, e in zip(starts, ends):
            sl = tsv[s:e]
            lo[s:e] = s + np.searchsorted(sl, sl - range_us, "left")
            hi[s:e] = s + np.searchsorted(sl, sl, "right")
    return lo, hi


def time_range_agg(ds: ray.data.Dataset, key_cols: list[str],
                   ts_col: str, value_col: str, range_us: int,
                   num_partitions: int = 32) -> ray.data.Dataset:
    """Rows with the per-key rolling sum/avg/count of ``value_col``
    over the trailing EVENT-TIME window ``[ts - range_us, ts]``
    attached as ``<col>_tsum/_tavg/_tcnt`` — SQL ``SUM/AVG/COUNT(col)
    OVER (PARTITION BY key ORDER BY ts RANGE BETWEEN range_us
    PRECEDING AND CURRENT ROW)``. RANGE semantics: the frame includes
    ALL peers of the current timestamp (also rows sorted after the
    current one), so no tiebreak is needed or accepted. NULL values
    are skipped (SQL aggregate semantics); NULL timestamps are
    rejected (RANGE frames over NULL order keys are not supported).

    Vectorized: one sorted-partition pass; each key segment's
    timestamps are offset into a disjoint band (segment ordinal ×
    (span + range + 1)) so ONE global ``np.searchsorted`` finds every
    row's frame start/end at once, then two prefix sums answer all
    windows (same shape as :func:`moving_agg`). Falls back to a
    per-SEGMENT (never per-row) searchsorted loop if the band
    arithmetic would overflow int64."""
    if range_us < 0:
        raise ValueError("range_us must be >= 0")
    sort_spec = ([(k, "ascending") for k in key_cols]
                 + [(ts_col, "ascending")])

    def roll(group: pa.Table) -> pa.Table:
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        if group.num_rows == 0:
            group = group.append_column(
                value_col + "_tsum", pa.array([], type=pa.float64()))
            group = group.append_column(
                value_col + "_tavg", pa.array([], type=pa.float64()))
            return group.append_column(
                value_col + "_tcnt", pa.array([], type=pa.int64()))
        tbl = group.take(pc.sort_indices(group, sort_keys=sort_spec))
        n = tbl.num_rows
        tsv = _ts_int64(tbl, ts_col, "time_range_agg")
        seg = _segment_starts(_key_arrays(tbl, key_cols), n)
        lo, hi = _range_frames(tsv, seg, range_us)
        col = tbl.column(value_col)
        valid = ~pc.is_null(col).to_numpy(zero_copy_only=False)
        v = pc.fill_null(pc.cast(col, pa.float64()), 0.0).to_numpy(
            zero_copy_only=False)
        csum = np.zeros(n + 1)
        np.cumsum(v, out=csum[1:])
        ccnt = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(valid, out=ccnt[1:])
        tcnt = ccnt[hi] - ccnt[lo]
        tsum = csum[hi] - csum[lo]
        none = tcnt == 0
        tavg = np.divide(tsum, tcnt, out=np.zeros(n), where=~none)
        tbl = tbl.append_column(value_col + "_tsum",
                                pa.array(tsum, mask=none))
        tbl = tbl.append_column(value_col + "_tavg",
                                pa.array(tavg, mask=none))
        return tbl.append_column(value_col + "_tcnt",
                                 pa.array(tcnt, type=pa.int64()))

    return _partition_by(ds, key_cols, num_partitions).map_groups(
        _pin(roll), batch_format="pyarrow")


def time_range_distinct(ds: ray.data.Dataset, key_cols: list[str],
                        ts_col: str, value_col: str, range_us: int,
                        num_partitions: int = 32) -> ray.data.Dataset:
    """Rows with the per-key DISTINCT count of ``value_col`` over the
    trailing EVENT-TIME window ``[ts - range_us, ts]`` attached as
    ``<col>_tdistinct`` — SQL ``COUNT(DISTINCT col) OVER (PARTITION BY
    key ORDER BY ts RANGE BETWEEN range_us PRECEDING AND CURRENT
    ROW)``. NULL values are not counted (SQL DISTINCT-aggregate
    semantics); NULL timestamps are rejected as in
    :func:`time_range_agg`.

    Sliding DISTINCT is not a prefix-sum like sum/count, but it IS
    vectorizable exactly: a row j is a DUPLICATE inside frame i iff
    its previous same-(key, value) occurrence p_j is also in the frame
    (``lo_i <= p_j``, and ``j < hi_i``). Because frames are trailing
    and the partition is sorted by (key, ts), both frame bounds are
    globally nondecreasing, so each pair (p_j, j) contributes to a
    CONTIGUOUS run of frames — found with two ``np.searchsorted`` and
    accumulated with one difference array. distinct = in-frame
    non-null count − duplicate count. One key shuffle, O(n log n)
    numpy per partition, no per-row Python."""
    if range_us < 0:
        raise ValueError("range_us must be >= 0")
    import pandas as pd

    sort_spec = ([(k, "ascending") for k in key_cols]
                 + [(ts_col, "ascending")])
    out_col = value_col + "_tdistinct"

    def roll(group: pa.Table) -> pa.Table:
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        if group.num_rows == 0:
            return group.append_column(
                out_col, pa.array([], type=pa.int64()))
        tbl = group.take(pc.sort_indices(group, sort_keys=sort_spec))
        n = tbl.num_rows
        tsv = _ts_int64(tbl, ts_col, "time_range_distinct")
        seg = _segment_starts(_key_arrays(tbl, key_cols), n)
        lo, hi = _range_frames(tsv, seg, range_us)
        col = tbl.column(value_col)
        valid = ~pc.is_null(col).to_numpy(zero_copy_only=False)
        ccnt = np.zeros(n + 1, dtype=np.int64)
        np.cumsum(valid, out=ccnt[1:])
        cnt = ccnt[hi] - ccnt[lo]
        # previous same-(segment, value) occurrence per non-null row
        vi = np.flatnonzero(valid)
        dup = np.zeros(n, dtype=np.int64)
        if len(vi):
            segc, _ = pd.factorize(seg[vi])
            vals = col.take(pa.array(vi)).to_numpy(zero_copy_only=False)
            vc, uniq = pd.factorize(vals)
            codes = segc.astype(np.int64) * len(uniq) + vc
            order = np.argsort(codes, kind="stable")
            oc = codes[order]
            same = oc[1:] == oc[:-1]
            j = vi[order[1:][same]]          # row with a prev occurrence
            p = vi[order[:-1][same]]         # that previous occurrence
            if len(j):
                # pair (p, j) duplicates frame i iff lo_i <= p < j < hi_i:
                # frames with hi > j form a suffix [b, n), frames with
                # lo <= p a prefix [0, a) — contribution is [b, a)
                a = np.searchsorted(lo, p, side="right")
                b = np.searchsorted(hi, j, side="right")
                keep = b < a
                diff = np.zeros(n + 1, dtype=np.int64)
                np.add.at(diff, b[keep], 1)
                np.add.at(diff, a[keep], -1)
                np.cumsum(diff[:n], out=dup)
        return tbl.append_column(
            out_col, pa.array(cnt - dup, type=pa.int64()))

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


def top_values_per_key(ds: ray.data.Dataset, key_cols: list[str],
                       col: str, k: int,
                       num_partitions: int = 32) -> ray.data.Dataset:
    """EXACT per-key heavy hitters: the k most frequent ``col`` values
    per key with their counts and 0-based rank — SQL
    ``ROW_NUMBER() OVER (PARTITION BY key ORDER BY cnt DESC, value)``
    over ``GROUP BY key, value`` counts. Same compact shape as
    grouped_quantiles: each batch collapses to its distinct
    (key, value, count) rows, the merge is one compact ``grouped_sum``
    (one task when small), and only the merged histogram — bounded by
    key x value-domain cardinality — ever reaches the final per-key
    pick. NULL values are skipped. For unbounded value domains use the
    Misra-Gries streaming top-k (streaming/topk.py) with its counted
    undercount bound instead."""
    if k < 1:
        raise ValueError("k must be >= 1")

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        cols = {c: batch.column(c).to_numpy(zero_copy_only=False)
                for c in key_cols + [col]}
        df = pd.DataFrame(cols)
        df = df[df[col].notna()]
        g = df.groupby(key_cols + [col], dropna=False,
                       sort=False).size().rename("cnt").reset_index()
        out = {c: pa.Array.from_pandas(
            g[c], type=batch.schema.field(c).type)
            for c in key_cols + [col]}
        out["cnt"] = pa.array(g["cnt"].to_numpy(np.int64),
                              type=pa.int64())
        return pa.table(out)

    from .smallagg import grouped_sum

    merged = grouped_sum(
        ds.map_batches(_pin(partial), batch_format="pyarrow",
                       zero_copy_batch=True),
        key_cols + [col], ["cnt"])
    return top_n_per_key(merged, key_cols, "cnt", k, descending=True,
                         tiebreak=col, num_partitions=num_partitions)


def _chain_emitted(t: np.ndarray, starts: np.ndarray,
                   interval_us: int) -> np.ndarray:
    """Chained debounce over per-segment ts-sorted values: emitted mask
    for "first row, then repeatedly the first row >= previous emission
    + interval". Pure numpy (property-tested directly): each round
    emits one row per active segment and advances it with a BATCHED
    lower-bound bisection across all active segments at once."""
    n = len(t)
    ends = np.r_[starts[1:], n]
    emitted = np.zeros(n, dtype=bool)
    cur = starts.copy()
    active = cur < ends
    while active.any():
        cur_a = cur[active]
        emitted[cur_a] = True
        deadline = t[cur_a] + interval_us
        lo = cur_a + 1
        hi = ends[active]
        while True:
            unresolved = lo < hi
            if not unresolved.any():
                break
            mid = (lo + hi) // 2
            below = np.zeros(len(lo), dtype=bool)
            below[unresolved] = t[mid[unresolved]] < \
                deadline[unresolved]
            lo = np.where(unresolved & below, mid + 1, lo)
            hi = np.where(unresolved & ~below, mid, hi)
        cur[active] = lo
        active = cur < ends
    return emitted


def throttle(ds: ray.data.Dataset, key_cols: list[str], ts_col: str,
             interval_us: int, tiebreak: str | None = None,
             mode: str = "chain",
             num_partitions: int = 32) -> ray.data.Dataset:
    """Per-key event rate limiting — keep at most one row per key per
    ``interval_us`` and drop the rest (telemetry debounce, alert
    suppression, per-device ingest throttling). Two semantics, both in
    event time with (ts, tiebreak) ordering:

    * ``mode="chain"`` (debounce): emit the key's first row, then
      repeatedly the FIRST row at/after the previous emission +
      interval — the Kafka-Streams-suppress / sensor-debounce rule.
      The next emission depends on the previous one, so no plain SQL
      window expresses it; the gate oracle is a recursive CTE.
    * ``mode="bucket"``: emit the first row per (key,
      floor(ts / interval)) grid cell — stateless, coarser (two kept
      rows may be < interval apart across a cell boundary).

    Returns the kept rows with all input columns. Rows with NULL
    event time are dropped (never emitted — the SQL chain's
    ``e.ts >= prev + T`` three-valued comparison never selects them;
    an unfiltered NaN would instead break the bisection's lower-bound
    invariant and emit them).

    Scale shape: ONE hash shuffle on the key, then a per-partition
    sort + segment pass. Chain selection is a per-round batched binary
    search (lo/hi bisection over every active key SIMULTANEOUSLY —
    numpy vector ops only, ~log2(segment) passes per round); rounds =
    max emissions for any key in the partition, which rate limiting
    bounds by time-span / interval. No per-row or per-key Python."""
    if mode not in ("chain", "bucket"):
        raise ValueError("mode must be 'chain' or 'bucket'")
    if interval_us <= 0:
        raise ValueError("interval_us must be > 0")
    sort_spec = [(k, "ascending") for k in key_cols] + \
        [(ts_col, "ascending")] + \
        ([(tiebreak, "ascending")] if tiebreak else [])

    def pick(group: pa.Table) -> pa.Table:
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        if group.num_rows == 0:
            return group
        group = group.filter(pc.is_valid(group.column(ts_col)))
        if group.num_rows == 0:
            return group
        tbl = group.take(pc.sort_indices(group, sort_keys=sort_spec))
        n = tbl.num_rows
        t = pc.cast(tbl.column(ts_col), pa.int64()).to_numpy(
            zero_copy_only=False)
        seg = _segment_starts(_key_arrays(tbl, key_cols), n)
        if mode == "bucket":
            bucket = t // interval_us
            first = np.ones(n, dtype=bool)
            first[1:] = (seg[1:] != seg[:-1]) | (bucket[1:] != bucket[:-1])
            return tbl.filter(pa.array(first))
        return tbl.filter(pa.array(
            _chain_emitted(t, np.unique(seg), interval_us)))

    return _partition_by(ds, key_cols, num_partitions).map_groups(
        _pin(pick), batch_format="pyarrow")


def session_stats(ds: ray.data.Dataset, key_cols: list[str],
                  ts_col: str, gap_us: int,
                  tiebreak: str | None = None,
                  num_partitions: int = 32) -> ray.data.Dataset:
    """Corpus-level session analytics in ONE pass — the engagement
    summary (`sessionize` labels rows; this aggregates them without
    materializing the labels): one row with ``n_sessions``,
    ``n_events``, ``avg_events`` (mean session length in events),
    ``bounce_rate`` (fraction of single-event sessions) and
    ``avg_duration_s`` (mean event-time span per session). Session
    rule identical to :func:`sessionize` (gap > ``gap_us`` opens a new
    session).
    Rows with NULL event time are ignored (SQL aggregates over ts
    would propagate NULLs into span arithmetic; dropping them keeps
    counts and durations well-defined).

    Scale shape: ONE key exchange; each partition reduces its
    key-complete groups to FOUR counters (sessions, events, bounces,
    duration-sum), merged in one `grouped_sum` task; the finalize
    ratios are computed on the merged totals."""
    from .smallagg import grouped_sum

    if gap_us <= 0:
        raise ValueError("gap_us must be > 0")
    sort_spec = ([(k, "ascending") for k in key_cols]
                 + [(ts_col, "ascending")]
                 + ([(tiebreak, "ascending")] if tiebreak else []))

    def partial(group: pa.Table) -> pa.Table:
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        empty = pa.table({"one": pa.array([], type=pa.int64()),
                          "n_sessions": pa.array([], type=pa.int64()),
                          "n_events": pa.array([], type=pa.int64()),
                          "n_bounce": pa.array([], type=pa.int64()),
                          "dur_us": pa.array([], type=pa.int64())})
        if group.num_rows == 0 or ts_col not in group.column_names:
            return empty
        group = group.filter(pc.is_valid(group.column(ts_col)))
        if group.num_rows == 0:
            return empty
        tbl = group.take(pc.sort_indices(group, sort_keys=sort_spec))
        nrows = tbl.num_rows
        ts = tbl.column(ts_col)
        if pa.types.is_timestamp(ts.type):
            ts = pc.cast(ts, pa.int64())
        tsv = ts.to_numpy(zero_copy_only=False)
        new = np.ones(nrows, dtype=bool)
        if nrows > 1:
            same_key = np.ones(nrows - 1, dtype=bool)
            for k in _key_arrays(tbl, key_cols):
                same_key &= k[1:] == k[:-1]
            new[1:] = ~same_key | (tsv[1:] - tsv[:-1] > gap_us)
        starts = np.flatnonzero(new)
        ends = np.r_[starts[1:], nrows]
        lens = ends - starts
        dur = tsv[ends - 1] - tsv[starts]
        return pa.table({
            "one": pa.array([1], type=pa.int64()),
            "n_sessions": pa.array([len(starts)], type=pa.int64()),
            "n_events": pa.array([nrows], type=pa.int64()),
            "n_bounce": pa.array([int((lens == 1).sum())],
                                 type=pa.int64()),
            "dur_us": pa.array([int(dur.sum())], type=pa.int64())})

    parts = _partition_by(ds, key_cols, num_partitions).map_groups(
        _pin(partial), batch_format="pyarrow")
    merged = grouped_sum(parts, ["one"],
                         ["n_sessions", "n_events", "n_bounce",
                          "dur_us"])

    import ray as _ray

    @_ray.remote
    def finish(*blocks: pa.Table) -> pa.Table:
        bs = [b for b in blocks
              if b.num_rows and "n_sessions" in b.column_names]
        if not bs:
            return pa.table({
                "n_sessions": pa.array([0], type=pa.int64()),
                "n_events": pa.array([0], type=pa.int64()),
                "avg_events": pa.array([None], type=pa.float64()),
                "bounce_rate": pa.array([None], type=pa.float64()),
                "avg_duration_s": pa.array([None], type=pa.float64())})
        b = pa.concat_tables(bs, promote_options="default")
        ns = float(b.column("n_sessions").to_numpy().sum())
        ne = float(b.column("n_events").to_numpy().sum())
        nb = float(b.column("n_bounce").to_numpy().sum())
        du = float(b.column("dur_us").to_numpy().sum())
        return pa.table({
            "n_sessions": pa.array([int(ns)], type=pa.int64()),
            "n_events": pa.array([int(ne)], type=pa.int64()),
            "avg_events": pa.array([ne / ns], type=pa.float64()),
            "bounce_rate": pa.array([nb / ns], type=pa.float64()),
            "avg_duration_s": pa.array([du / ns / 1e6],
                                       type=pa.float64())})

    refs = merged.materialize().to_arrow_refs()
    return ray.data.from_arrow_refs([finish.remote(*refs)])
