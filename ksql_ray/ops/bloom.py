"""Bloom-prefiltered distributed semi / anti join.

``ops/sets.py::semi_join_filter`` broadcasts the DISTINCT right key
set — right regime when that set fits worker memory. This module covers
the next regime up: the right key set is too large to broadcast as
exact Arrow keys, but a Bloom BITMAP over it (``bits_per_key`` ≈ 10 →
~1 byte/key vs 8-16+ bytes/key exact) still broadcasts fine, e.g.
10^9 distinct keys ≈ 1.25 GB bitmap vs 10+ GB exact. The bloom pass
answers "definitely absent" exactly, so:

* semi: bloom-negative left rows are dropped for free; only the
  (small) bloom-positive survivor set enters the exact partitioned
  semi-join shuffle — shuffle volume drops by the selectivity factor.
* anti (NOT EXISTS): bloom-NEGATIVE rows are definite keepers and
  bypass the shuffle entirely; only bloom-positives are verified.

Scale shape:

* build: one pass over the right key column; each batch scatters its
  k probe bits into a local bitmap partial (``np.bitwise_or.at`` —
  no Python row loop) and emits the PACKED bitmap (m/8 bytes) once
  per batch; partials are OR-merged in a fan-in-8 tree of Ray tasks,
  so no single task holds more than 8 bitmaps and the driver never
  sees the right data.
* probe: the merged bitmap ships to the object store ONCE
  (``ray.put``); each probe actor materializes it in ``__init__``
  (once per actor, never per batch) and tests k bits per key with
  vectorized gather/shift — Kirsch-Mitzenmacher double hashing
  ``g_i = h1 + i*h2 (mod m)`` over two independent 64-bit
  ``pd.util.hash_array`` lanes, so k probes cost two hashes.
* exact verify (``exact=True``, default): survivors + the per-batch-
  distinct right key projection take ONE hash-partition shuffle on
  the key; each partition filters its left rows with a single
  ``pc.is_in`` against its co-partitioned right keys. The false-
  positive rate only sizes the verify shuffle, never the result.

SQL semantics match semi_join_filter: NULL probes never match (semi
drops them, anti keeps them — NOT EXISTS, not 3-valued NOT IN).

No reference counterpart (the Go client, ksql/*.go, builds query
strings only); this is corpus-curation infrastructure ("drop documents
whose URL appeared in any earlier crawl" at key counts where exact
broadcast is impossible).
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .dedup import _partition_by, _pin

__all__ = ["build_bloom", "bloom_semi_join", "bloom_fpr"]

# pd.util.hash_array requires 16-byte keys; two independent lanes
_HK1 = "ksql_ray_bloom00"
_HK2 = "ksql_ray_bloom01"
_TREE_FAN_IN = 8


def _two_hashes(col) -> tuple[np.ndarray, np.ndarray]:
    """Two independent uint64 hash lanes over an Arrow column (cython
    hash_array — vectorized). h2 is forced odd so the double-hash probe
    sequence never degenerates to a single position.

    Values are canonicalized BEFORE hashing so build and probe sides
    agree: nulls are filled with the type's zero (null probes are
    masked out by the caller anyway, but a null-bearing int64 column
    otherwise converts to float64 numpy — NaN lanes — and 7.0 hashes
    differently than 7), and integer widths are widened to int64."""
    if isinstance(col, pa.ChunkedArray):
        col = col.combine_chunks()
    t = col.type
    if pa.types.is_integer(t) and not pa.types.is_int64(t):
        col, t = pc.cast(col, pa.int64()), pa.int64()
    elif pa.types.is_floating(t) and not pa.types.is_float64(t):
        col, t = pc.cast(col, pa.float64()), pa.float64()
    elif pa.types.is_large_string(t):
        col, t = pc.cast(col, pa.string()), pa.string()
    if col.null_count:
        fill = "" if pa.types.is_string(t) else pa.scalar(0, type=t)
        col = pc.fill_null(col, fill)
    arr = col.to_numpy(zero_copy_only=False)
    h1 = pd.util.hash_array(arr, hash_key=_HK1).astype(np.uint64)
    h2 = pd.util.hash_array(arr, hash_key=_HK2).astype(np.uint64)
    h2 |= np.uint64(1)
    return h1, h2


def _probe_positions(h1, h2, num_hashes: int, num_bits: int):
    """(k, n) matrix of bit positions for each key."""
    m = np.uint64(num_bits)
    i = np.arange(num_hashes, dtype=np.uint64)[:, None]
    return (h1[None, :] + i * h2[None, :]) % m


def bloom_fpr(num_keys: int, num_bits: int, num_hashes: int) -> float:
    """Expected false-positive rate (standard Bloom estimate)."""
    return float((1.0 - np.exp(-num_hashes * num_keys / num_bits)) ** num_hashes)


@ray.remote
def _or_merge(*parts: bytes) -> bytes:
    acc = np.frombuffer(parts[0], dtype=np.uint64).copy()
    for p in parts[1:]:
        acc |= np.frombuffer(p, dtype=np.uint64)
    return acc.tobytes()


def build_bloom(right: ray.data.Dataset, right_on: str, *,
                num_bits: int, num_hashes: int = 5) -> "ray.ObjectRef":
    """One pass over ``right[right_on]`` -> ObjectRef of the packed
    (uint64 little-endian) bitmap in the object store, merged by a
    fan-in tree so no task holds more than _TREE_FAN_IN partials."""
    num_bits = int(num_bits)
    if num_bits % 64:
        num_bits += 64 - num_bits % 64  # whole words
    words = num_bits // 64

    @_pin
    def partial(batch: pa.Table) -> pa.Table:
        col = pc.drop_null(batch.column(right_on))
        bm = np.zeros(words, dtype=np.uint64)
        if len(col):
            h1, h2 = _two_hashes(col)
            pos = _probe_positions(h1, h2, num_hashes, num_bits).ravel()
            np.bitwise_or.at(bm, (pos >> np.uint64(6)).astype(np.int64),
                             np.uint64(1) << (pos & np.uint64(63)))
        return pa.table({"bm": pa.array([bm.tobytes()], type=pa.large_binary())})

    parts_ds = right.select_columns([right_on]).map_batches(
        partial, batch_format="pyarrow", zero_copy_batch=True)

    # fan-in tree over the partial bitmaps (each m/8 bytes)
    @ray.remote
    def extract(tbl: pa.Table) -> bytes:
        return tbl.column("bm")[0].as_py() if tbl.num_rows else b""

    refs = [extract.remote(r) for r in parts_ds.to_arrow_refs()]
    empty = np.zeros(words, dtype=np.uint64).tobytes()

    @ray.remote
    def seed(*bs: bytes) -> bytes:
        acc = np.zeros(words, dtype=np.uint64)
        for b in bs:
            if b:
                acc |= np.frombuffer(b, dtype=np.uint64)
        return acc.tobytes()

    if not refs:
        return ray.put(empty)
    # level 0 handles possibly-empty leaves, upper levels are pure ORs
    level = [seed.remote(*refs[i:i + _TREE_FAN_IN])
             for i in range(0, len(refs), _TREE_FAN_IN)]
    while len(level) > 1:
        level = [_or_merge.remote(*level[i:i + _TREE_FAN_IN])
                 for i in range(0, len(level), _TREE_FAN_IN)]
    return level[0]


# worker-process-local bitmap cache: one plasma fetch per worker (the
# task-pool probe's equivalent of an actor's __init__ materialization)
_PROBE_CACHE: dict = {}


class _BloomProbe:
    """Probe kernel: bitmap materialized once (per worker via
    _PROBE_CACHE; np.frombuffer is a view, never a copy)."""

    def __init__(self, bm_ref, col: str, num_bits: int, num_hashes: int,
                 keep_positive: bool, keep_null: bool):
        bm = ray.get(bm_ref) if isinstance(bm_ref, ray.ObjectRef) else bm_ref
        self._bm = np.frombuffer(bm, dtype=np.uint64)
        self._col = col
        self._m = num_bits
        self._k = num_hashes
        self._keep_pos = keep_positive
        self._keep_null = keep_null
        from ..streaming.driver import limit_worker_threads

        limit_worker_threads()

    def __call__(self, batch: pa.Table) -> pa.Table:
        col = batch.column(self._col)
        valid = pc.is_valid(col).to_numpy(zero_copy_only=False)
        h1, h2 = _two_hashes(col)
        pos = _probe_positions(h1, h2, self._k, self._m)
        hit = np.ones(batch.num_rows, dtype=bool)
        for i in range(self._k):
            p = pos[i]
            hit &= ((self._bm[(p >> np.uint64(6)).astype(np.int64)]
                     >> (p & np.uint64(63))) & np.uint64(1)).astype(bool)
        hit &= valid  # NULL never matches
        keep = hit if self._keep_pos else ~hit
        if self._keep_null:
            keep = keep | ~valid
        else:
            keep = keep & valid
        return batch.filter(pa.array(keep))


def _exact_partitioned_semi(left: ray.data.Dataset,
                            right: ray.data.Dataset,
                            left_on: str, right_on: str, anti: bool,
                            num_partitions: int) -> ray.data.Dataset:
    """Exact semi/anti via ONE hash-partition shuffle: left rows and
    the per-batch-distinct right key projection are tagged, unioned
    (right keys ride as null-padded left-schema rows — null columns
    are validity-bitmap-only payload), co-partitioned by key, and each
    partition filters its side-0 rows with a single is_in kernel."""
    schema = left.schema().base_schema
    names = schema.names

    @_pin
    def tag_left(batch: pa.Table) -> pa.Table:
        return batch.append_column(
            "__side", pa.array(np.zeros(batch.num_rows, dtype=np.int8)))

    @_pin
    def right_keys(batch: pa.Table) -> pa.Table:
        u = pc.drop_null(pc.unique(batch.column(right_on)))
        u = pc.cast(u, schema.field(left_on).type)
        cols = {}
        for n in names:
            cols[n] = u if n == left_on else pa.nulls(
                len(u), type=schema.field(n).type)
        cols["__side"] = pa.array(np.ones(len(u), dtype=np.int8))
        return pa.table(cols)

    lt = left.map_batches(tag_left, batch_format="pyarrow",
                          zero_copy_batch=True)
    rt = right.select_columns([right_on]).map_batches(
        right_keys, batch_format="pyarrow", zero_copy_batch=True)

    @_pin
    def resolve(part: pa.Table) -> pa.Table:
        side = part.column("__side").to_numpy(zero_copy_only=False)
        keys = pc.unique(pc.drop_null(
            part.filter(pa.array(side == 1)).column(left_on)))
        rows = part.filter(pa.array(side == 0)).drop_columns(["__side"])
        m = pc.fill_null(pc.is_in(rows.column(left_on), value_set=keys),
                         False)
        return rows.filter(pc.invert(m) if anti else m)

    return _partition_by(lt.union(rt), [left_on],
                         num_partitions=num_partitions).map_groups(
        resolve, batch_format="pyarrow").map_batches(
        lambda t: t.drop_columns(["__part"]) if "__part" in t.column_names else t,
        batch_format="pyarrow", zero_copy_batch=True)


def bloom_semi_join(left: ray.data.Dataset, right: ray.data.Dataset,
                    left_on: str, right_on: str, *, anti: bool = False,
                    exact: bool = True, expected_keys: int | None = None,
                    bits_per_key: int = 10, num_hashes: int = 5,
                    num_partitions: int = 32,
                    concurrency=(1, 8)) -> ray.data.Dataset:
    """Semi (``WHERE k IN (SELECT ...)``) / anti (``NOT EXISTS``) join
    with a Bloom prefilter. ``exact=True`` (default) gives exact SQL
    results — the bloom only shrinks the verify shuffle; with
    ``exact=False`` the result may keep false-positive rows at the
    documented ``bloom_fpr`` rate (semi) / drop them (anti) — the
    one-pass approximate mode for pipelines that tolerate it.

    ``expected_keys`` sizes the bitmap (default: a driver-free guess of
    right's row count via ``right.count()`` would materialize; callers
    at scale should pass their known key cardinality)."""
    if expected_keys is None:
        expected_keys = right.count()  # metadata-only for parquet reads
    num_bits = max(64, int(expected_keys) * bits_per_key)
    num_bits += (-num_bits) % 64
    bm_ref = build_bloom(right, right_on, num_bits=num_bits,
                         num_hashes=num_hashes)

    def probe(src: ray.data.Dataset, keep_positive: bool,
              keep_null: bool) -> ray.data.Dataset:
        # stateless TASKS, not an actor pool: the bitmap is fetched
        # from plasma lazily per worker process (cached — one fetch
        # per worker, zero extra copies per batch) so the probe rides
        # the default task pool with no pool spin-up (measured ~1.5 s
        # saved per call) and no concurrency ceiling
        def probe_batch(batch: pa.Table) -> pa.Table:
            key = bm_ref.hex()
            bm = _PROBE_CACHE.get(key)
            if bm is None:
                _PROBE_CACHE.clear()  # one live bitmap per worker
                bm = _PROBE_CACHE[key] = ray.get(bm_ref)
            st = _BloomProbe(bm, left_on, num_bits, num_hashes,
                             keep_positive, keep_null)
            return st(batch)

        return src.map_batches(probe_batch, batch_format="pyarrow",
                               zero_copy_batch=True)

    if not anti:
        survivors = probe(left, keep_positive=True, keep_null=False)
        if not exact:
            return survivors
        return _exact_partitioned_semi(survivors, right, left_on,
                                       right_on, False, num_partitions)
    # anti: bloom-negative rows (and NULL probes) are definite keepers
    definite = probe(left, keep_positive=False, keep_null=True)
    if not exact:
        return definite
    maybe = probe(left, keep_positive=True, keep_null=False)
    verified = _exact_partitioned_semi(maybe, right, left_on, right_on,
                                       True, num_partitions)
    return definite.union(verified)
