"""Token-budget shard packing: assign docs to contiguous training shards.

The last step of a training-data pipeline: stream the cleaned corpus
out as shards of ~``budget`` tokens each, in a deterministic document
order, so downstream loaders get stable, evenly-sized inputs. A doc's
shard is ``floor(exclusive_prefix_tokens / budget)`` in ascending-id
order — the standard fixed-budget chunking (documents can straddle a
boundary; the budget is a target, not a hard cap). The reference ksql
builder has no ordering-dependent assignment operator (absence verified
across /root/reference/ksql/*.go); this is part of the engine's
training-data extension set.

Scale shape — a textbook two-phase distributed prefix sum, ONE shuffle:

1. token counts are a stateless vectorized ``map_batches`` column add;
2. rows route to R contiguous id ranges (boundaries from a per-batch
   sorted sample, merged driver-side — a few KB; balance affects only
   skew, never correctness, since range totals are exact);
3. phase A: per-range token totals via the same routing inside
   ``map_batches`` partials + a tiny R-row reduce on the driver, whose
   exclusive running sum is broadcast;
4. phase B: ONE hash shuffle groups each range's rows, a vectorized
   in-range sort + cumsum adds the broadcast range offset.

Nothing corpus-sized ever sits on the driver; the only all-to-all is
the phase-B range grouping. Requires unique ids (the same contract as
the dedup ops — equal ids have no defined order)."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import ray
import ray.data

from .dedup import _pin
from .text import add_token_count

__all__ = ["pack_shards"]


def _range_boundaries(proj: ray.data.Dataset, id_col: str,
                      num_ranges: int) -> np.ndarray:
    """R-1 split points from per-batch evenly-spaced sorted id samples.
    Only balance depends on sample quality; totals per range are exact."""

    @_pin
    def sample(batch: pa.Table) -> pa.Table:
        ids = np.sort(batch.column(id_col).to_numpy(zero_copy_only=False)
                      .astype(np.int64))
        step = max(1, len(ids) // 32)
        return pa.table({"s": ids[::step]})

    parts = [t.column("s").to_numpy(zero_copy_only=False)
             for t in ray.get(proj.map_batches(
                 sample, batch_format="pyarrow",
                 zero_copy_batch=True).to_arrow_refs()) if t.num_columns]
    pool = np.sort(np.concatenate(parts)) if parts else np.empty(0, np.int64)
    if len(pool) == 0 or num_ranges <= 1:
        return np.empty(0, dtype=np.int64)
    idx = (np.arange(1, num_ranges) * len(pool)) // num_ranges
    return np.unique(pool[idx])


def pack_shards(docs: ray.data.Dataset, budget: int,
                id_col: str = "doc_id", text_col: str = "text",
                num_ranges: int = 16) -> ray.data.Dataset:
    """-> (id_col, n_tokens, shard_id): ``shard_id = floor(prefix / budget)``
    where ``prefix`` is the sum of ``n_tokens`` over all docs with a
    smaller id (exclusive prefix in ascending-id order)."""
    if budget <= 0:
        raise ValueError("pack_shards: budget must be positive")

    @_pin
    def counts(batch: pa.Table) -> pa.Table:
        b = add_token_count(batch.select([id_col, text_col]), text_col,
                            out="n_tokens")
        return b.select([id_col, "n_tokens"])

    proj = docs.map_batches(counts, batch_format="pyarrow",
                            zero_copy_batch=True).materialize()
    bounds = _range_boundaries(proj, id_col, num_ranges)

    @_pin
    def range_partials(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        n = batch.column("n_tokens").to_numpy(zero_copy_only=False)
        r = np.searchsorted(bounds, ids, side="right")
        tot = np.bincount(r, weights=n, minlength=len(bounds) + 1)
        return pa.table({"r": np.arange(len(tot), dtype=np.int64),
                         "tot": tot.astype(np.int64)})

    # phase A: exact per-range totals -> exclusive running offsets (R-row
    # driver reduce; R is O(cluster size), never O(corpus))
    totals = np.zeros(len(bounds) + 1, dtype=np.int64)
    for t in ray.get(proj.map_batches(
            range_partials, batch_format="pyarrow",
            zero_copy_batch=True).to_arrow_refs()):
        if t.num_rows:
            totals[t.column("r").to_numpy(zero_copy_only=False)] += \
                t.column("tot").to_numpy(zero_copy_only=False)
    offsets = np.concatenate(([0], np.cumsum(totals)[:-1]))

    # phase B: one shuffle on the range id, vectorized in-range cumsum
    @_pin
    def tag_range(batch: pa.Table) -> pa.Table:
        ids = batch.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        return batch.append_column(
            "__r", pa.array(np.searchsorted(bounds, ids, side="right"),
                            type=pa.int64()))

    @_pin
    def local_pack(group: pa.Table) -> pa.Table:
        # an exchange partition may hold SEVERAL ranges (hash of __r
        # mod P): sort by (__r, id) and cumsum per __r segment
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        rv = group.column("__r").to_numpy(zero_copy_only=False)
        ids = group.column(id_col).to_numpy(zero_copy_only=False).astype(np.int64)
        n = group.column("n_tokens").to_numpy(zero_copy_only=False).astype(np.int64)
        order = np.lexsort((ids, rv))
        rs, ns = rv[order], n[order]
        run = np.concatenate(([0], np.cumsum(ns)[:-1]))
        seg = np.zeros(len(rs), dtype=np.int64)
        newseg = np.flatnonzero(np.diff(rs)) + 1
        seg[newseg] = newseg
        np.maximum.accumulate(seg, out=seg)
        excl = offsets[rs] + (run - run[seg])
        shard = excl // budget
        return pa.table({id_col: ids[order], "n_tokens": ns,
                         "shard_id": shard.astype(np.int64)})

    from .dedup import _partition_by

    return _partition_by(
        proj.map_batches(tag_range, batch_format="pyarrow",
                         zero_copy_batch=True),
        ["__r"]).map_groups(local_pack, batch_format="pyarrow")
