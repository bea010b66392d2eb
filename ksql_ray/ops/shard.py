"""Deterministic global shuffle + sharding for training-data export.

The last step of every training-data pipeline: break corpus order
(crawl/source locality poisons SGD) and write N shards a trainer can
stream. ``random_shuffle`` is not reproducible across retries and
resumes; web-scale pipelines shuffle BY KEY HASH instead — shard and
within-shard position are pure functions of the row key and seed, so a
re-run (or a resumed partial run) produces byte-identical shards, and
any subset of shards can be (re)built independently. Same stance as
ops/sample.py; the reference has no shuffle/export surface (absence
verified across /root/reference/ksql/*.go).

Contract: shard(r) = uint32(first 8 hex of md5(str(key) || seed)) %
n_shards; within a shard rows are ordered by (full hash, key) — the
hash randomizes order, the key breaks hash ties deterministically.
``method="md5"`` is the oracle form (DuckDB-expressible verbatim, see
op_shuffle_shard); ``method="fast"`` swaps in the vectorized
``pd.util.hash_array`` (same contract, different hash — the scale
path).

Shape: ONE hash shuffle (partition by shard id), one per-shard sort.
``shuffle_shard`` returns the rows with (shard, pos) attached;
``write_shards`` additionally writes one Parquet file per shard
(``shard-%05d.parquet``) — idempotent by filename, so a failed export
resumes by skipping shards that already exist."""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .dedup import _partition_by, _pin
from .sample import add_sample_hash

__all__ = ["shuffle_shard", "write_shards"]


def _sharded_groups(ds: ray.data.Dataset, key_col: str, n_shards: int,
                    method: str, seed: str):
    def add_shard(batch: pa.Table) -> pa.Table:
        b = add_sample_hash(batch, key_col, "__h", method=method,
                            seed=seed)
        h = b.column("__h").to_numpy(zero_copy_only=False)
        return b.append_column(
            "shard", pa.array(h % n_shards, type=pa.int64()))

    with_shard = ds.map_batches(_pin(add_shard), batch_format="pyarrow",
                                zero_copy_batch=True)
    return _partition_by(with_shard, ["shard"], n_shards)


def _order_group(group: pa.Table, key_col: str) -> pa.Table:
    """A partition may hold SEVERAL shard ids (hash of shard % P):
    sort by (shard, hash, key) and number positions per shard segment."""
    if group.num_rows == 0:
        return group
    if "__part" in group.column_names:
        group = group.drop_columns(["__part"])
    group = group.take(pc.sort_indices(group, sort_keys=[
        ("shard", "ascending"), ("__h", "ascending"),
        (key_col, "ascending")]))
    shards = group.column("shard").to_numpy(zero_copy_only=False)
    idx = np.arange(group.num_rows, dtype=np.int64)
    seg_start = np.zeros(group.num_rows, dtype=np.int64)
    new = np.flatnonzero(np.diff(shards)) + 1
    seg_start[new] = new
    np.maximum.accumulate(seg_start, out=seg_start)
    group = group.append_column(
        "pos", pa.array(idx - seg_start, type=pa.int64()))
    return group.drop_columns(["__h"])


def shuffle_shard(ds: ray.data.Dataset, key_col: str, n_shards: int = 64,
                  method: str = "md5",
                  seed: str = "") -> ray.data.Dataset:
    """Rows with (shard, pos) attached: shard = hash(key) % n_shards,
    pos = the row's rank inside its shard under the shuffled order."""
    if n_shards < 1:
        raise ValueError("n_shards must be >= 1")
    return _sharded_groups(ds, key_col, n_shards, method, seed).map_groups(
        _pin(lambda g: _order_group(g, key_col)), batch_format="pyarrow")


def write_shards(ds: ray.data.Dataset, out_dir: str, key_col: str,
                 n_shards: int = 64, method: str = "fast",
                 seed: str = "", fmt: str = "parquet") -> dict:
    """Write one file per shard under ``out_dir`` in shuffled order.
    Idempotent by filename: shards already present are skipped (resume
    after a partial failure re-derives the SAME content, so skipping is
    safe). ``fmt="parquet"`` (default) or ``"jsonl"`` — most trainers
    stream JSONL; the line order and shard assignment are identical
    across formats (same (shard, hash, key) contract). Returns
    {written, skipped, rows}."""
    import os

    import pyarrow.parquet as pq

    if fmt not in ("parquet", "jsonl"):
        raise ValueError("fmt must be 'parquet' or 'jsonl'")
    os.makedirs(out_dir, exist_ok=True)
    ext = "parquet" if fmt == "parquet" else "jsonl"

    def write_group(group: pa.Table) -> pa.Table:
        out = _order_group(group, key_col)
        if out.num_rows == 0:
            return pa.table({"shard": pa.array([], pa.int64()),
                             "rows": pa.array([], pa.int64()),
                             "written": pa.array([], pa.bool_())})
        shards = out.column("shard").to_numpy(zero_copy_only=False)
        rows = []
        for shard in np.unique(shards):       # a few shards per partition
            sub = out.filter(pa.array(shards == shard))
            final = os.path.join(out_dir,
                                 f"shard-{int(shard):05d}.{ext}")
            written = False
            if not os.path.exists(final):
                tmp = final + f".tmp-{os.getpid()}"
                body = sub.drop_columns(["pos"])
                if fmt == "parquet":
                    pq.write_table(body, tmp)
                else:
                    # vectorized row-JSON via pandas' C serializer
                    body.to_pandas().to_json(tmp, orient="records",
                                             lines=True,
                                             date_format="iso")
                os.replace(tmp, final)
                written = True
            rows.append((int(shard), sub.num_rows, written))
        return pa.table({
            "shard": pa.array([r[0] for r in rows], pa.int64()),
            "rows": pa.array([r[1] for r in rows], pa.int64()),
            "written": pa.array([r[2] for r in rows], pa.bool_()),
        })

    stats = _sharded_groups(ds, key_col, n_shards, method, seed).map_groups(
        _pin(write_group), batch_format="pyarrow").take_all()
    return {"written": sum(1 for s in stats if s["written"]),
            "skipped": sum(1 for s in stats if not s["written"]),
            "rows": sum(s["rows"] for s in stats)}
