"""Corpus snapshot diff (change-data-capture between two crawl
versions): which documents were ADDED, REMOVED, or CHANGED between an
old and a new snapshot of the same keyed table.

The incremental-recrawl staple: "this month's crawl vs last month's —
reprocess only what moved". Neither ksqlDB nor the Go reference client
(ksql/*.go, query strings only) has it; SQL spells it as a FULL OUTER
JOIN on the key with a row-comparison residual.

Scale shape: the compared columns NEVER cross the wire — each side
maps to (key, fp_lo, fp_hi, side) rows (two independent 64-bit
``pd.util.hash_array`` lanes over the compare columns, ~25 B/row
regardless of document size), the two projections union and take ONE
hash-partition shuffle on the key, and each partition resolves
statuses with a sorted-segment scan (no per-key Python). "changed"
means fingerprint inequality — identical to value inequality up to a
2^-128 collision, the same contract as the engine's exact dedup.

Requires ``key`` to be unique within each snapshot (a primary key —
enforced per partition, raising on violation rather than guessing).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .dedup import _partition_by, _pin

__all__ = ["snapshot_diff"]

_HK = ("ksql_ray_snapdf0", "ksql_ray_snapdf1")
_MIX = np.uint64(0x9E3779B97F4A7C15)


def _fp_lanes(batch: pa.Table, cols: list[str]) -> tuple[np.ndarray, np.ndarray]:
    """Two combined 64-bit lanes over the compare columns. NULL and
    the type's zero value must hash differently (SQL's ``o.c <> n.c``
    treats NULL-vs-value as a change under the diff's IS NULL arms),
    so each column contributes its validity bit into the mix."""
    lanes = []
    for hk in _HK:
        acc = np.zeros(batch.num_rows, dtype=np.uint64)
        for c in cols:
            col = batch.column(c)
            if isinstance(col, pa.ChunkedArray):
                col = col.combine_chunks()
            v = pd.util.hash_array(
                col.to_numpy(zero_copy_only=False), hash_key=hk
            ).astype(np.uint64)
            valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
            acc = acc * _MIX + np.where(valid, v, np.uint64(0x5BF03635))
        lanes.append(acc)
    return lanes[0], lanes[1]


def snapshot_diff(old: ray.data.Dataset, new: ray.data.Dataset,
                  key: str, compare_cols: list[str], *,
                  include_unchanged: bool = False,
                  num_partitions: int = 32) -> ray.data.Dataset:
    """-> (key, status) with status in {'added','removed','changed'}
    (+'unchanged' when ``include_unchanged``). ``added`` = key only in
    ``new``, ``removed`` = only in ``old``, ``changed`` = in both with
    any compare column differing."""

    def prep(side: int):
        @_pin
        def f(batch: pa.Table) -> pa.Table:
            lo, hi = _fp_lanes(batch, compare_cols)
            return pa.table({
                key: batch.column(key),
                "__fp_lo": pa.array(lo.view(np.int64)),
                "__fp_hi": pa.array(hi.view(np.int64)),
                "__side": pa.array(
                    np.full(batch.num_rows, side, dtype=np.int8)),
            })

        return f

    cols = [key] + compare_cols
    o = old.select_columns(cols).map_batches(
        prep(0), batch_format="pyarrow", zero_copy_batch=True)
    n = new.select_columns(cols).map_batches(
        prep(1), batch_format="pyarrow", zero_copy_batch=True)

    @_pin
    def resolve(part: pa.Table) -> pa.Table:
        part = part.take(pc.sort_indices(
            part, sort_keys=[(key, "ascending"), ("__side", "ascending")]))
        from ..exec.groupby import _segment_starts

        starts = _segment_starts(part, [key])
        if not len(starts):
            return pa.table({key: part.column(key).slice(0, 0),
                             "status": pa.array([], type=pa.string())})
        sizes = np.diff(np.concatenate((starts, [part.num_rows])))
        if sizes.max(initial=0) > 2:
            bad = part.column(key)[int(starts[np.argmax(sizes)])]
            raise ValueError(
                f"snapshot_diff: key {bad} repeats within one snapshot "
                "(key must be unique per side)")
        side = part.column("__side").to_numpy(zero_copy_only=False)
        lo = part.column("__fp_lo").to_numpy(zero_copy_only=False)
        hi = part.column("__fp_hi").to_numpy(zero_copy_only=False)
        one = sizes == 1
        # size-2 segments: row at starts is old (side asc), starts+1 new
        both = ~one
        # a size-2 segment must be one old + one new row (sides sorted
        # ascending); (0,0)/(1,1) would be a dup key within one side
        if both.any():
            s2c = starts[both]
            if not ((side[s2c] == 0) & (side[s2c + 1] == 1)).all():
                raise ValueError(
                    "snapshot_diff: duplicate key within one side")
        status = np.empty(len(starts), dtype=object)
        status[one & (side[starts] == 0)] = "removed"
        status[one & (side[starts] == 1)] = "added"
        if both.any():
            s2 = starts[both]
            same = (lo[s2] == lo[s2 + 1]) & (hi[s2] == hi[s2 + 1])
            status[both] = np.where(same, "unchanged", "changed")
        keys = part.column(key).take(pa.array(starts))
        out = pa.table({key: keys,
                        "status": pa.array(status, type=pa.string())})
        if include_unchanged:
            return out
        return out.filter(pc.not_equal(out.column("status"), "unchanged"))

    return _partition_by(o.union(n), [key],
                         num_partitions=num_partitions).map_groups(
        resolve, batch_format="pyarrow").map_batches(
        lambda t: t.drop_columns(["__part"]) if "__part" in t.column_names
        else t, batch_format="pyarrow", zero_copy_batch=True)
