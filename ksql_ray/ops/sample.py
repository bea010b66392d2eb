"""Deterministic (hash-based) sampling for training-data pipelines.

Reservoir/random sampling is not reproducible across retries and
resumes; web-scale pipelines instead sample by **key hash** — a pure
function of the row, stable under re-execution, repartitioning and
failure replay, and shardable (each task samples its own batch with no
coordination). Supports uniform and per-stratum fractions (e.g. keep
30% of 'en' docs, 100% of low-resource languages).

Two hash methods:

- ``method="md5"`` — oracle form; row r is kept iff
  ``uint32(first 8 hex digits of md5(str(key) || seed)) < frac * 2^32``.
  DuckDB-expressible verbatim (``('0x' || substr(md5(...), 1, 8))::UBIGINT``),
  see ``op_stratified_sample`` in pipelines/driver_queries.py. Per-row
  md5 costs a Python loop — fine for gates, not the 10^10-doc path.
- ``method="fast"`` — scale path; vectorized ``pd.util.hash_array``
  over the stringified keys (cython, no row loop). Same statistical
  contract, different hash — NOT oracle-comparable.

The sampling decision is made inside ``map_batches`` (streaming,
per-batch, no shuffle); nothing is materialized.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

__all__ = ["add_sample_hash", "stratified_sample"]

_2_32 = float(1 << 32)


def add_sample_hash(batch: pa.Table, key_col: str, out: str = "sample_hash",
                    method: str = "md5", seed: str = "") -> pa.Table:
    """Append a uint32-range int64 hash of ``str(key) + seed``."""
    keys = pc.cast(batch.column(key_col), pa.string())
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    if method == "md5":
        h = np.fromiter(
            (int(hashlib.md5((k + seed).encode()).hexdigest()[:8], 16)
             for k in keys.to_pylist()),
            dtype=np.int64, count=len(keys),
        )
    elif method == "fast":
        import pandas as pd

        vals = keys.to_numpy(zero_copy_only=False)
        if seed:
            vals = np.char.add(vals.astype(str), seed)
        h = (pd.util.hash_array(vals).astype(np.uint64) >> np.uint64(32)).astype(np.int64)
    else:
        raise ValueError("method must be 'md5' or 'fast'")
    return batch.append_column(out, pa.array(h, type=pa.int64()))


def stratified_sample(
    ds: ray.data.Dataset,
    key_col: str,
    fractions: float | dict[str, float] = 0.1,
    strata_col: str | None = None,
    default_fraction: float = 0.0,
    method: str = "md5",
    seed: str = "",
) -> ray.data.Dataset:
    """Keep each row iff hash(key) < fraction(stratum) * 2^32.

    ``fractions``: a float (uniform sample) or a dict mapping
    ``strata_col`` values to per-stratum fractions (values not in the
    dict get ``default_fraction``)."""
    if isinstance(fractions, dict) and strata_col is None:
        raise ValueError("per-stratum fractions require strata_col")

    def fn(batch: pa.Table) -> pa.Table:
        b = add_sample_hash(batch, key_col, "__sh", method=method, seed=seed)
        h = b.column("__sh").to_numpy(zero_copy_only=False).astype(np.float64)
        if isinstance(fractions, dict):
            strata = batch.column(strata_col).to_pylist()
            thr = np.fromiter(
                (fractions.get(s, default_fraction) for s in strata),
                dtype=np.float64, count=len(strata),
            ) * _2_32
        else:
            thr = float(fractions) * _2_32
        return batch.filter(pa.array(h < thr))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
