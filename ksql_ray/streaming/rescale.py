"""Checkpoint re-sharding for the full-state-snapshot streaming jobs
(top-k / HLL / grouped HLL / quantiles / grouped quantiles / CMS) —
the N -> 4N cluster-rescale path, completing the family started by
``StreamingJob.reshard_from`` (windowed aggregates) and the
dedup/near-dup increment reshards.

These jobs checkpoint their WHOLE state per epoch (latest snapshot
wins), and their states are mergeable summaries, so rescale is either

* **re-bucketing** (keyed / sharded states: top-k counters by key
  hash, grouped HLL / grouped quantiles by key hash, ungrouped HLL by
  register id — rows re-route by the same function the prep tasks
  use; a given row lived in exactly one old partition, so concat per
  new partition is the exact merge), or
* **redistribution** (partition-agnostic additive states: CMS
  counters sum cell-wise; MRL quantile summaries concatenate —
  same-level buffers merge weight-exactly, rank error only grows at
  the next compaction — with n summed and err maxed). Routing for
  NEW rows only load-balances these jobs; any assignment of old state
  to new partitions gives the same final merged answer.

Usage: construct the new job with the NEW partition count and a fresh
``checkpoint_dir``, then ``job.reshard_from(old_ckpt_dir)`` — it
writes the re-bucketed snapshots + manifest, restores the actors, and
sets the resume cursor (replayed epochs are skipped as with
``resume=True``). Reshard an in-flight checkpoint, not a finished
job's (see StreamingJob.reshard_from's double-flush note).
"""

from __future__ import annotations

import glob
import json
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

__all__ = ["reshard_snapshots", "hash_str_route", "mod_route"]


def hash_str_route(col_name: str):
    """Route rows by pd.util.hash_array over the column cast to string
    — the exact function the sketch preps use on their key column."""

    def route(t: pa.Table, new_p: int) -> np.ndarray:
        keys = pc.cast(t.column(col_name), pa.string()).to_numpy(
            zero_copy_only=False)
        return (pd.util.hash_array(keys).astype(np.uint64)
                % np.uint64(new_p)).astype(np.int64)

    return route


def mod_route(col_name: str):
    """Route rows by an integer column mod new_p (HLL register ids)."""

    def route(t: pa.Table, new_p: int) -> np.ndarray:
        v = t.column(col_name).to_numpy(zero_copy_only=False)
        return (v % new_p).astype(np.int64)

    return route


def _latest_per_part(old_dir: str, prefix: str, epoch: int):
    best: dict[int, str] = {}
    for p in sorted(glob.glob(os.path.join(
            old_dir, f"{prefix}-*-epoch-*.parquet"))):
        e = int(p.rsplit("-epoch-", 1)[1].split(".")[0])
        if e > epoch:
            continue
        # prefix may itself contain dashes ("trans-counts"): the part
        # id is the 4-digit field right after it
        part = int(os.path.basename(p)[len(prefix) + 1:].split("-")[0])
        if part not in best or e > int(best[part].rsplit(
                "-epoch-", 1)[1].split(".")[0]):
            best[part] = p
    return [pq.read_table(best[p]) for p in sorted(best)]


def _reshard_one(job, old_dir: str, epoch: int, prefix: str,
                 route, combine) -> tuple[int, int]:
    olds = _latest_per_part(old_dir, prefix, epoch)
    new_p = job.P
    buckets: list[list[pa.Table]] = [[] for _ in range(new_p)]
    if route is None:
        for i, t in enumerate(olds):
            buckets[i % new_p].append(t)
    else:
        for t in olds:
            if not t.num_rows:
                continue
            ids = route(t, new_p)
            order = np.argsort(ids, kind="stable")
            s = t.take(pa.array(order))
            b = np.searchsorted(ids[order], np.arange(new_p + 1))
            for q in range(new_p):
                if b[q + 1] > b[q]:
                    buckets[q].append(s.slice(b[q], b[q + 1] - b[q]))
    empty = (olds[0].schema.empty_table() if olds
             else pa.table({}))
    rows = 0
    for q in range(new_p):
        t = (combine(buckets[q]) if combine is not None
             else (pa.concat_tables(buckets[q],
                                    promote_options="default")
                   if buckets[q] else empty))
        rows += t.num_rows
        final = os.path.join(
            job.checkpoint_dir,
            f"{prefix}-{q:04d}-epoch-{epoch:06d}.parquet")
        tmp = final + ".tmp"
        pq.write_table(t, tmp)
        os.replace(tmp, final)
    return len(olds), rows


def reshard_snapshots(job, old_dir: str, prefix: str | None = None, *,
                      route=None, combine=None,
                      specs: "list[tuple] | None" = None) -> dict:
    """Generic rescale for latest-snapshot jobs. ``route(t, new_p)``
    re-buckets rows (None = assign whole old snapshots to new
    partition ``old_index % new_p``); ``combine(tables) -> table``
    merges the tables landing on one new partition (default concat).
    Jobs with several snapshot kinds per actor pass
    ``specs=[(prefix, route, combine), ...]`` instead. Writes
    snapshots + manifest into ``job.checkpoint_dir``, restores
    ``job.actors`` and sets the resume cursor."""
    if not job.checkpoint_dir:
        raise ValueError("reshard_from requires checkpoint_dir on the "
                         "new job")
    with open(os.path.join(old_dir, "checkpoint.json")) as f:
        doc = json.load(f)
    epoch = doc["epoch"]
    if specs is None:
        specs = [(prefix, route, combine)]
    os.makedirs(job.checkpoint_dir, exist_ok=True)
    old_n = rows = 0
    for pref, rt, cb in specs:
        n, r = _reshard_one(job, old_dir, epoch, pref, rt, cb)
        old_n = max(old_n, n)
        rows += r
    cursor = os.path.join(job.checkpoint_dir, "checkpoint.json")
    tmp = cursor + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"epoch": epoch, "num_partitions": job.P}, f)
    os.replace(tmp, cursor)
    job._resume_cursor = epoch
    job._restored = sum(ray.get(
        [a.restore.remote(job.checkpoint_dir, epoch)
         for a in job.actors]))
    return {"epoch": epoch, "old_partitions": old_n,
            "new_partitions": job.P, "rows": rows}


def transitions_counts_combine(tables: list[pa.Table]) -> pa.Table:
    """(from_label, to_label, cnt) rows sum (transition counts are
    additive and partition-agnostic)."""
    ts = [t for t in tables if t.num_rows]
    if not ts:
        return pa.table({"from_label": pa.array([], pa.string()),
                         "to_label": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64())})
    df = pa.concat_tables(ts, promote_options="default").to_pandas()
    g = df.groupby(["from_label", "to_label"], as_index=False,
                   sort=False)["cnt"].sum()
    return pa.table({
        "from_label": pa.array(g["from_label"], type=pa.string()),
        "to_label": pa.array(g["to_label"], type=pa.string()),
        "cnt": pa.array(g["cnt"], type=pa.int64())})


# ---------------------------------------------------------------- combines
def topk_combine(tables: list[pa.Table]) -> pa.Table:
    """Concat (key, cnt) rows; the per-partition undercount bound
    becomes the MAX over contributing old partitions."""
    if not tables:
        return pa.table({"key": pa.array([], pa.string()),
                         "cnt": pa.array([], pa.int64()),
                         "undercount": pa.array([], pa.int64())})
    t = pa.concat_tables(tables, promote_options="default")
    if t.num_rows == 0:
        return t
    uc = int(pc.max(t.column("undercount")).as_py() or 0)
    return t.set_column(t.column_names.index("undercount"),
                        "undercount",
                        pa.array([uc] * t.num_rows, type=pa.int64()))


def quantile_combine(tables: list[pa.Table]) -> pa.Table:
    """Concat MRL summaries: same-level buffers merge weight-exactly;
    n sums, err maxes, rows_in sums (all stored as per-row constant
    columns the restore reads from row 0)."""
    ts = [t for t in tables if t.num_rows]
    if not ts:
        return pa.table({
            "level": pa.array([], pa.int64()),
            "value": pa.array([], pa.float64()),
            "n": pa.array([], pa.int64()),
            "err": pa.array([], pa.int64()),
            "rows_in": pa.array([], pa.int64())})
    n = sum(int(t.column("n")[0].as_py()) for t in ts)
    err = max(int(t.column("err")[0].as_py()) for t in ts)
    rows_in = sum(int(t.column("rows_in")[0].as_py()) for t in ts)
    t = pa.concat_tables(ts, promote_options="default")
    m = t.num_rows
    t = t.set_column(t.column_names.index("n"), "n",
                     pa.array([n] * m, type=pa.int64()))
    t = t.set_column(t.column_names.index("err"), "err",
                     pa.array([err] * m, type=pa.int64()))
    return t.set_column(t.column_names.index("rows_in"), "rows_in",
                        pa.array([rows_in] * m, type=pa.int64()))


def cms_combine(tables: list[pa.Table]) -> pa.Table:
    """Counter cells sum (CMS merge is addition)."""
    ts = [t for t in tables if t.num_rows]
    if not ts:
        return pa.table({"d": pa.array([], pa.int64()),
                         "bucket": pa.array([], pa.int64()),
                         "cnt": pa.array([], pa.int64())})
    df = pa.concat_tables(ts, promote_options="default").to_pandas()
    g = df.groupby(["d", "bucket"], as_index=False)["cnt"].sum()
    return pa.table({"d": pa.array(g["d"], type=pa.int64()),
                     "bucket": pa.array(g["bucket"], type=pa.int64()),
                     "cnt": pa.array(g["cnt"], type=pa.int64())})


def _ser_ipc(tbl: pa.Table) -> bytes:
    import io

    buf = io.BytesIO()
    with pa.ipc.new_stream(buf, tbl.schema) as w:
        w.write_table(tbl)
    return buf.getvalue()


def _de_ipc(b: bytes) -> pa.Table:
    with pa.ipc.open_stream(b) as r:
        return r.read_all()


def _route_table(t: pa.Table, key_cols, new_p: int):
    """Slice a state table into new_p buckets by the prep's routing
    hash (exec.groupby.hash_partition_ids)."""
    from ..exec.groupby import hash_partition_ids

    if t.num_rows == 0:
        return [t] * new_p
    ids = hash_partition_ids(t, key_cols, new_p)
    order = np.argsort(ids, kind="stable")
    s = t.take(pa.array(order))
    b = np.searchsorted(ids[order], np.arange(new_p + 1))
    return [s.slice(b[q], b[q + 1] - b[q]) for q in range(new_p)]


def _pkl_reshard(job, old_dir: str, prefix: str, table_fields: dict,
                 min_fields: list, sum_fields: list,
                 restore_actors: bool = True) -> dict:
    """Shared rescale for jobs whose checkpoint is a pickled dict of
    IPC-serialized state tables + scalars: ``table_fields`` maps field
    name -> key columns to re-route by; ``min_fields`` fold
    conservatively (watermarks / flush cursors — every old partition
    folds the same epoch maxima, so these are equal in practice);
    ``sum_fields`` are job-total counters (ride partition 0)."""
    import pickle

    if not job.checkpoint_dir:
        raise ValueError("reshard_from requires checkpoint_dir on the "
                         "new job")
    with open(os.path.join(old_dir, "checkpoint.json")) as f:
        doc = json.load(f)
    epoch = doc["epoch"]
    best: dict[int, str] = {}
    for p in glob.glob(os.path.join(
            old_dir, f"{prefix}-*-epoch-*.parquet")) + glob.glob(
            os.path.join(old_dir, f"{prefix}-*-epoch-*.pkl")):
        e = int(p.rsplit("-epoch-", 1)[1].split(".")[0])
        if e > epoch:
            continue
        part = int(os.path.basename(p)[len(prefix) + 1:].split("-")[0])
        if part not in best or e > int(best[part].rsplit(
                "-epoch-", 1)[1].split(".")[0]):
            best[part] = p
    docs = []
    for p in sorted(best):
        with open(best[p], "rb") as f:
            docs.append(pickle.loads(f.read()))
    if not docs:
        raise ValueError(f"no {prefix} snapshots <= epoch {epoch} in "
                         f"{old_dir}")
    new_p = job.P
    buckets = {name: [[] for _ in range(new_p)]
               for name in table_fields}
    schemas = {name: _de_ipc(docs[0][name]).schema
               for name in table_fields}
    for d in docs:
        for name, key_cols in table_fields.items():
            t = _de_ipc(d[name])
            for q, s in enumerate(_route_table(t, key_cols, new_p)):
                if s.num_rows:
                    buckets[name][q].append(s)
    mins = {f: min(d[f] for d in docs) for f in min_fields}
    sums = {f: sum(d.get(f, 0) for d in docs) for f in sum_fields}
    os.makedirs(job.checkpoint_dir, exist_ok=True)
    for q in range(new_p):
        out = dict(mins)
        for f in sum_fields:
            out[f] = sums[f] if q == 0 else 0
        for name in table_fields:
            ts = buckets[name][q]
            t = (pa.concat_tables(ts, promote_options="permissive")
                 if ts else schemas[name].empty_table())
            out[name] = _ser_ipc(t)
        final = os.path.join(
            job.checkpoint_dir,
            f"{prefix}-{q:04d}-epoch-{epoch:06d}.pkl")
        tmp = final + ".tmp"
        with open(tmp, "wb") as f:
            f.write(pickle.dumps(out))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, final)
    cursor = os.path.join(job.checkpoint_dir, "checkpoint.json")
    tmp = cursor + ".tmp"
    with open(tmp, "w") as f:
        json.dump({"epoch": epoch, "num_partitions": new_p}, f)
    os.replace(tmp, cursor)
    job._resume_cursor = epoch
    if restore_actors:
        ray.get([a.restore.remote(job.checkpoint_dir, epoch)
                 for a in job.actors])
    return {"epoch": epoch, "old_partitions": len(docs),
            "new_partitions": new_p}
