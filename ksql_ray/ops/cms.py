"""Count–Min sketch frequency estimation (Cormode & Muthukrishnan 2005).

"How often does each key appear?" over a 10^12-turn corpus cannot
afford an exact per-key counter table when the key space is unbounded
(URLs, n-grams, tool names × arguments). A CMS answers point frequency
queries in ``depth × width`` int64 cells with one-sided error:
``true ≤ est ≤ true + 2·N/width`` with probability ``1 − 2^-depth``
(N = stream length). Counters are MERGEABLE by elementwise addition —
per-batch partials, per-partition actor state and cross-partition
union are all the same ``+`` — which is the right shape for a
``map_batches`` partial + tiny ``groupby().sum()`` and for streaming
ingest (``streaming/cardinality.StreamingCMSJob``).

The reference's only frequency surface is exact ``COUNT`` /
``HISTOGRAM`` over grouped keys (aggregates.go); this is the
bounded-memory counterpart for key spaces too large to group.

Hash contract (same stance as ops/hll.py):

- ``hash="md5"`` — oracle form: for row key k and depth row d,
  bucket = uint64(first 16 hex of md5(str(k) + "|" + str(d))) % width.
  DuckDB-expressible VERBATIM, so the gate checks the full COUNTER
  STATE (every nonzero (d, bucket, cnt) cell), not just point
  estimates. md5 runs once per DISTINCT key per batch (one
  ``pd.factorize`` pass), then per-depth.
- ``hash="fast"`` — scale path: ``pd.util.hash_array`` of the key
  array re-seeded per depth by mixing in a 64-bit odd constant.

NULL keys count as the empty string (matching ops/hll.py's
``coalesce(key::VARCHAR, '')`` stance) so no row is silently dropped.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

__all__ = ["cms_counters", "cms_estimate", "buckets_from_keys"]

# distinct odd 64-bit mixers per depth for hash="fast"
_FAST_SEEDS = np.array([0x9E3779B97F4A7C15, 0xC2B2AE3D27D4EB4F,
                        0x165667B19E3779F9, 0xD6E8FEB86659FD93,
                        0xA5A5A5A5A5A5A5A5 | 1, 0x27D4EB2F165667C5,
                        0x94D049BB133111EB, 0xBF58476D1CE4E5B9],
                       dtype=np.uint64)


def buckets_from_keys(keys: np.ndarray, depth: int, width: int,
                      hash: str) -> np.ndarray:
    """-> (depth, len(keys)) int64 bucket ids, one row per hash row."""
    import pandas as pd

    if hash == "md5":
        codes, uniq = pd.factorize(keys)
        out = np.empty((depth, len(keys)), dtype=np.int64)
        for d in range(depth):
            hu = np.fromiter(
                (int(hashlib.md5(f"{k}|{d}".encode()).hexdigest()[:16],
                     16) % width for k in uniq),
                dtype=np.int64, count=len(uniq))
            out[d] = hu[codes]
        return out
    if hash == "fast":
        if depth > len(_FAST_SEEDS):
            raise ValueError(f"depth > {len(_FAST_SEEDS)} unsupported "
                             "for hash='fast'")
        h = pd.util.hash_array(keys).astype(np.uint64)
        out = np.empty((depth, len(keys)), dtype=np.int64)
        for d in range(depth):
            m = h * _FAST_SEEDS[d]
            m ^= m >> np.uint64(31)
            out[d] = (m % np.uint64(width)).astype(np.int64)
        return out
    raise ValueError("hash must be 'md5' or 'fast'")


def _key_strings(batch: pa.Table, key_col: str) -> np.ndarray:
    col = pc.fill_null(pc.cast(batch.column(key_col), pa.string()), "")
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    return arr.to_numpy(zero_copy_only=False)


def counters_from_keys(keys: np.ndarray, depth: int, width: int,
                       hash: str) -> np.ndarray:
    """Dense (depth, width) int64 counter array for one key batch."""
    cnt = np.zeros((depth, width), dtype=np.int64)
    if len(keys) == 0:
        return cnt
    b = buckets_from_keys(keys, depth, width, hash)
    rows = np.repeat(np.arange(depth), len(keys))
    np.add.at(cnt, (rows, b.ravel()), 1)
    return cnt


def cms_counters(ds: ray.data.Dataset, key_col: str, depth: int = 4,
                 width: int = 256,
                 hash: str = "md5") -> ray.data.Dataset:
    """Nonzero CMS cells of the column: (d, bucket, cnt) rows.

    One stateless ``map_batches`` emits ≤ depth×width rows per batch;
    a tiny ``groupby((d, bucket)).sum(cnt)`` merges — nothing
    corpus-sized moves (counts travel, not keys).
    """
    if depth < 1 or width < 2:
        raise ValueError("need depth >= 1 and width >= 2")

    def partial(batch: pa.Table) -> pa.Table:
        keys = _key_strings(batch, key_col)
        cnt = counters_from_keys(keys, depth, width, hash)
        d, b = np.nonzero(cnt)
        return pa.table({"d": pa.array(d, type=pa.int64()),
                         "bucket": pa.array(b, type=pa.int64()),
                         "cnt": pa.array(cnt[d, b], type=pa.int64())})

    from .smallagg import grouped_sum

    return grouped_sum(ds.map_batches(partial, batch_format="pyarrow",
                                      zero_copy_batch=True),
                       ["d", "bucket"], ["cnt"])


def cms_estimate(counters: pa.Table, keys, depth: int, width: int,
                 hash: str = "md5") -> pa.Table:
    """Point-query the sketch: (key, est) with est = min over depth
    rows of the key's counter. ``counters`` is the (d, bucket, cnt)
    table from :func:`cms_counters` (absent cells are 0)."""
    dense = np.zeros((depth, width), dtype=np.int64)
    d = counters.column("d").to_numpy(zero_copy_only=False)
    b = counters.column("bucket").to_numpy(zero_copy_only=False)
    c = counters.column("cnt").to_numpy(zero_copy_only=False)
    # scatter-ADD: the streaming job's counters() may carry the same
    # (d, bucket) cell once per partition (different keys colliding
    # into one bucket across partitions); plain assignment would keep
    # only the last partition's count
    np.add.at(dense, (d, b), c)
    karr = np.asarray([str(k) if k is not None else "" for k in keys],
                      dtype=object)
    if len(karr) == 0:
        return pa.table({"key": pa.array([], pa.string()),
                         "est": pa.array([], pa.int64())})
    buckets = buckets_from_keys(karr, depth, width, hash)
    est = dense[np.arange(depth)[:, None], buckets].min(axis=0)
    return pa.table({"key": pa.array(karr, type=pa.string()),
                     "est": pa.array(est, type=pa.int64())})
