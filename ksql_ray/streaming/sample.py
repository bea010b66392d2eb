"""Streaming uniform sample: a fixed-size uniform sample of the
DISTINCT keys seen so far on an unbounded micro-batch stream, in O(k)
state per partition.

The classic "give me 10k random conversations out of the 10^12-turn
stream" primitive, done deterministically: bottom-k over a uniform key
hash (a k-minimum-values sketch keeping the keys). Every key maps to a
fixed hash, so the sample is a pure FUNCTION of the distinct-key set —
order- and replay-INSENSITIVE (duplicate rows and replayed epochs
collapse on the same (hash, key) pair; checkpoint/resume exists only to
skip re-reading files), and any two partial samples merge by union +
re-cut. That also makes it exactly SQL-checkable:
``ORDER BY hash, key LIMIT k`` over DISTINCT keys (the md5 hash
contract is shared with ops/sample.add_sample_hash — DuckDB spells it
``('0x' || substr(md5(key || seed), 1, 8))::UBIGINT``).

Shape (mirrors StreamingHLLJob): stateless prep tasks reduce each file
to its local bottom-k (hash, key) pairs — ≤ k rows per file leave the
prep — routed point-to-point by ``hash % P`` to P ``SampleStateActor``s;
each actor keeps the bottom-k of its hash residue class (k rows, so
P·k total state; the global cut needs k from every residue in the
worst case). ``sample()`` unions the P slices and takes the global
bottom-k in one tiny driver step. Checkpoints are one ≤k-row parquet
per partition; ``reshard_from`` re-routes rows by the same
``hash % new_P`` rule, so an N-node checkpoint resumes exactly on 4N.
"""

from __future__ import annotations

import glob
import json
import os
from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from ..ops.sample import add_sample_hash
from .driver import limit_worker_threads

__all__ = ["StreamingSampleJob"]


def _bottom_k(t: pa.Table, k: int) -> pa.Table:
    """Deterministic bottom-k by (h, key): argpartition then a full
    sort of the ≤k survivors (never a full sort of the input)."""
    if t.num_rows <= k:
        return t.sort_by([("h", "ascending"), ("key", "ascending")])
    h = t.column("h").to_numpy(zero_copy_only=False)
    # over-select to k survivors after ties: partition on h alone is
    # enough because the final cut re-sorts by (h, key)
    idx = np.argpartition(h, k - 1)[:k]
    cut = h[idx].max()
    keep = np.flatnonzero(h <= cut)
    return t.take(pa.array(keep)).sort_by(
        [("h", "ascending"), ("key", "ascending")]).slice(0, k)


@ray.remote
def _sample_prep(inputs, columns, key_col: str, k: int, method: str,
                 seed: str, num_partitions: int):
    """Read -> distinct keys -> local bottom-k -> route by h % P."""
    limit_worker_threads()
    parts: list[pa.Table] = []
    rows = 0
    for x in inputs:
        batch = x if isinstance(x, pa.Table) else pq.read_table(
            x, columns=columns)
        rows += batch.num_rows
        keys = pc.cast(batch.column(key_col), pa.string())
        keys = pc.unique(keys.combine_chunks()
                         if isinstance(keys, pa.ChunkedArray) else keys)
        keys = keys.filter(pc.is_valid(keys))
        t = add_sample_hash(pa.table({"key": keys}), "key",
                            out="h", method=method, seed=seed)
        parts.append(_bottom_k(t, k))
    t = (pa.concat_tables(parts) if parts
         else pa.table({"key": pa.array([], pa.string()),
                        "h": pa.array([], pa.int64())}))
    t = _bottom_k(t, k)
    h = t.column("h").to_numpy(zero_copy_only=False)
    slices = []
    for p in range(num_partitions):
        s = t.filter(pa.array(h % num_partitions == p))
        if p == 0:
            s = s.replace_schema_metadata({b"rows_in": str(rows).encode()})
        slices.append(s)
    return slices[0] if num_partitions == 1 else tuple(slices)


@ray.remote
class SampleStateActor:
    """Bottom-k of one hash residue class."""

    def __init__(self, part_id: int, k: int):
        limit_worker_threads()
        self.part_id = part_id
        self.k = k
        self.state = pa.table({"key": pa.array([], pa.string()),
                               "h": pa.array([], pa.int64())})

    def process(self, epoch: int, *parts) -> dict:
        rows = 0
        tabs = [self.state]
        for t in parts:
            if t is None:
                continue
            md = t.schema.metadata or {}
            rows += int(md.get(b"rows_in", b"0"))
            if t.num_rows:
                tabs.append(t.replace_schema_metadata(None))
        merged = pa.concat_tables(tabs, promote_options="permissive")
        # union semantics: replayed epochs re-send the same (h, key)
        # pairs; group-by collapses them before the cut
        if merged.num_rows:
            merged = merged.group_by(["h", "key"]).aggregate([])
        self.state = _bottom_k(merged.select(["key", "h"]), self.k)
        return {"rows_in": rows, "state_rows": int(self.state.num_rows)}

    def summary(self) -> pa.Table:
        return self.state

    def checkpoint(self, epoch: int, ckpt_dir: str) -> None:
        os.makedirs(ckpt_dir, exist_ok=True)
        final = os.path.join(
            ckpt_dir,
            f"sample-{self.part_id:04d}-epoch-{epoch:06d}.parquet")
        if not os.path.exists(final):
            tmp = final + ".tmp"
            pq.write_table(self.state, tmp)
            os.replace(tmp, final)

    def restore(self, ckpt_dir: str, upto_epoch: int) -> int:
        best = None
        for f in sorted(glob.glob(os.path.join(
                ckpt_dir, f"sample-{self.part_id:04d}-epoch-*.parquet"))):
            e = int(f.rsplit("-epoch-", 1)[1].split(".")[0])
            if e <= upto_epoch:
                best = f
        if best is not None:
            self.state = pq.read_table(best)
        return int(self.state.num_rows)


class StreamingSampleJob:
    """Continuous uniform distinct-key sample over a Parquet stream."""

    def reshard_from(self, old_dir: str) -> dict:
        """Rescale a sample checkpoint: rows re-route by the same
        ``hash % P`` rule the prep tasks use (exact — the per-partition
        bottom-k states are unions of disjoint residue classes)."""
        from .rescale import mod_route, reshard_snapshots

        return reshard_snapshots(self, old_dir, "sample",
                                 route=mod_route("h"))

    def __init__(self, *, key_col: str, k: int = 1000,
                 method: str = "md5", seed: str = "",
                 columns: Sequence[str] | None = None,
                 num_partitions: int = 4,
                 checkpoint_dir: str | None = None,
                 checkpoint_every: int = 0, resume: bool = False):
        if k < 1:
            raise ValueError("k must be >= 1")
        if method not in ("md5", "fast"):
            raise ValueError("method must be 'md5' or 'fast'")
        self.key_col = key_col
        self.k = k
        self.method = method
        self.seed = seed
        self.columns = list(columns) if columns else None
        if self.columns and key_col not in self.columns:
            self.columns.append(key_col)
        self.P = num_partitions
        self.actors = [SampleStateActor.remote(i, k)
                       for i in range(num_partitions)]
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every = checkpoint_every
        self.epoch = -1
        self._resume_cursor = -1
        self.metrics: list[dict] = []
        cursor = (os.path.join(checkpoint_dir, "checkpoint.json")
                  if checkpoint_dir else None)
        if resume and cursor and os.path.exists(cursor):
            with open(cursor) as f:
                doc = json.load(f)
            self._resume_cursor = doc["epoch"]
            ray.get([a.restore.remote(checkpoint_dir, doc["epoch"])
                     for a in self.actors])

    def _submit_epoch(self, files_or_tables: Sequence):
        self.epoch += 1
        if self.epoch <= self._resume_cursor:
            return (self.epoch, None, None)
        preps = [_sample_prep.options(num_returns=self.P).remote(
            [f], self.columns, self.key_col, self.k, self.method,
            self.seed, self.P) for f in files_or_tables]
        parts = ([[r] for r in preps] if self.P == 1
                 else [list(r) for r in preps])
        acks = [self.actors[q].process.remote(
            self.epoch, *[parts[i][q] for i in range(len(preps))])
            for q in range(self.P)]
        ckpt = None
        if (self.checkpoint_dir and self.checkpoint_every
                and (self.epoch + 1) % self.checkpoint_every == 0):
            ckpt = [a.checkpoint.remote(self.epoch, self.checkpoint_dir)
                    for a in self.actors]
        return (self.epoch, acks, ckpt)

    def _drain_epoch(self, pending) -> dict:
        epoch, acks, ckpt = pending
        if acks is None:
            m = {"epoch": epoch, "rows_in": 0, "skipped": True}
            self.metrics.append(m)
            return m
        stats = ray.get(acks)
        m = {"epoch": epoch,
             "rows_in": sum(s["rows_in"] for s in stats),
             "state_rows": sum(s["state_rows"] for s in stats)}
        self.metrics.append(m)
        if ckpt is not None:
            ray.get(ckpt)
            cursor = os.path.join(self.checkpoint_dir, "checkpoint.json")
            tmp = cursor + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"epoch": epoch}, f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, cursor)
        return m

    def process_epoch(self, files_or_tables: Sequence) -> dict:
        return self._drain_epoch(self._submit_epoch(files_or_tables))

    def run(self, files: Sequence[str], files_per_epoch: int = 4,
            max_inflight: int = 2) -> None:
        from collections import deque

        pending: deque = deque()
        batch: list = []

        def flush(limit: int) -> None:
            while len(pending) > limit:
                self._drain_epoch(pending.popleft())

        for f in files:
            batch.append(f)
            if len(batch) >= files_per_epoch:
                pending.append(self._submit_epoch(batch))
                batch = []
                flush(max_inflight - 1)
        if batch:
            pending.append(self._submit_epoch(batch))
        flush(0)

    def sample(self) -> pa.Table:
        """The current global sample: (key, h) rows, bottom-k by
        (h, key) over everything seen so far."""
        tabs = ray.get([a.summary.remote() for a in self.actors])
        return _bottom_k(
            pa.concat_tables(tabs, promote_options="permissive"), self.k)

    def finish(self) -> dict:
        s = self.sample()
        return {"epochs": self.epoch + 1,
                "rows_in": sum(m["rows_in"] for m in self.metrics),
                "sample_rows": int(s.num_rows)}
