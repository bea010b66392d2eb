"""Streaming heavy hitters: continuous top-k keys over a micro-batch
stream with bounded state (Misra-Gries summaries).

The reference's ``TOPK``/``TOPK_DISTINCT`` aggregates (aggregates.go)
rank VALUES within a group; a training-data ingest pipeline also needs
the classic frequent-items question — "which keys dominate the stream
right now" (hot conversations, dominant tools, boilerplate URLs) —
with state that does NOT grow with the key universe. Misra-Gries
summaries are mergeable (Agarwal et al. 2012, "Mergeable Summaries",
PODS) which makes them exactly the right shape for per-partition actor
state.

Shape (mirrors ``StreamingDedupJob``'s physical plan, SURVEY.md §4):

* stateless prep tasks pre-aggregate each micro-batch file to
  (key, cnt) partials — one cython ``value_counts`` per file, so the
  shuffle carries one row per DISTINCT key per file, not one per
  event — and hash-partition by key (``num_returns=P`` point-to-point
  routing);
* P ``TopKStateActor``s each hold the Misra-Gries summary of THEIR key
  partition (every key's total count lives in exactly one partition, so
  per-partition summaries union into the global answer with no
  cross-partition merge error). A merge is one vectorized
  ``Series.add`` + (when over capacity) one partition-select of the
  (capacity+1)-th largest count, subtracted from all (the standard MG
  batch decrement) — per-epoch cost O(batch + capacity), state is
  ≤ capacity keys per partition forever.
* **No silent caps**: every decrement is counted. Each partition
  reports ``max_undercount`` (the cumulative subtracted mass — the MG
  bound: any reported count is exact +0/−max_undercount, and any key
  with true count > max_undercount is guaranteed present). When
  ``capacity`` ≥ distinct keys per partition nothing is ever
  decremented and the counts are EXACT (``max_undercount == 0``) —
  the oracle-gated configuration.
* checkpoints write the FULL summary (bounded: ≤ capacity rows per
  partition — unlike the dedup seen-set there is nothing incremental
  to gain) two-phase per (partition, epoch); ``resume`` restores the
  latest snapshot ≤ the cursor epoch.

Query surface: ``topk(k)`` — union the per-partition summaries and
take the global top-k (cnt desc, key asc — deterministic ties).
"""

from __future__ import annotations

import json
import os
from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from .driver import limit_worker_threads

__all__ = ["StreamingTopKJob"]


def _key_strings(batch: pa.Table, key_cols: list[str]) -> pa.Array:
    """Composite key as 'v1:v2:...' (nulls render as '', matching SQL
    coalesce(col::VARCHAR, ''))."""
    parts = [pc.fill_null(pc.cast(batch.column(c), pa.string()), "")
             for c in key_cols]
    if len(parts) == 1:
        out = parts[0]
    else:
        out = pc.binary_join_element_wise(*parts, ":")
    return out.combine_chunks() if isinstance(out, pa.ChunkedArray) else out


@ray.remote
def _topk_prep(inputs, columns, key_cols, num_partitions: int):
    """Read -> per-file (key, cnt) partial counts -> hash-partition;
    returns P per-partition slices (invoked with ``num_returns=P``)."""
    import pandas as pd

    limit_worker_threads()
    keys_np = []
    for x in inputs:
        batch = x if isinstance(x, pa.Table) else pq.read_table(
            x, columns=columns)
        keys_np.append(_key_strings(batch, key_cols).to_numpy(
            zero_copy_only=False))
    flat = np.concatenate(keys_np) if keys_np else np.empty(0, object)
    vc = pd.Series(flat).value_counts()
    k = vc.index.to_numpy()
    c = vc.to_numpy().astype(np.int64)
    part = (pd.util.hash_array(k) % np.uint64(num_partitions)).astype(
        np.int64)
    slices = []
    for p in range(num_partitions):
        m = part == p
        slices.append(pa.table({
            "key": pa.array(k[m], type=pa.string()),
            "cnt": pa.array(c[m], type=pa.int64()),
        }))
    return slices[0] if num_partitions == 1 else tuple(slices)


@ray.remote
class TopKStateActor:
    """One key-hash partition of the Misra-Gries summary."""

    def __init__(self, part_id: int, capacity: int):
        limit_worker_threads()
        import pandas as pd

        self.part_id = part_id
        self.capacity = capacity
        self.state = pd.Series(dtype=np.int64)
        self.undercount = 0          # cumulative MG decrement mass
        self.rows_in = 0

    def process(self, epoch: int, *parts) -> dict:
        import pandas as pd

        tbls = [p for p in parts if p is not None and p.num_rows]
        if tbls:
            t = tbls[0] if len(tbls) == 1 else pa.concat_tables(tbls)
            inc = pd.Series(
                t.column("cnt").to_numpy(zero_copy_only=False),
                index=t.column("key").to_numpy(zero_copy_only=False))
            inc = inc.groupby(level=0).sum()   # same key from many files
            self.rows_in += int(inc.sum())
            self.state = self.state.add(inc, fill_value=0).astype(np.int64)
            if len(self.state) > self.capacity:
                v = np.partition(self.state.to_numpy(),
                                 len(self.state) - self.capacity - 1)
                d = int(v[len(self.state) - self.capacity - 1])
                self.state = self.state[self.state > d] - d
                self.undercount += d
        return {"rows_in": int(sum(tb.column("cnt").to_numpy(
                    zero_copy_only=False).sum() for tb in tbls)) if tbls
                else 0,
                "tracked": int(len(self.state)),
                "max_undercount": int(self.undercount)}

    def summary(self) -> pa.Table:
        # an empty Series has a default int64 index: force object dtype
        keys = self.state.index.to_numpy(dtype=object)
        return pa.table({
            "key": pa.array(keys, type=pa.string()),
            "cnt": pa.array(self.state.to_numpy(), type=pa.int64()),
        })

    def checkpoint(self, epoch: int, ckpt_dir: str) -> None:
        os.makedirs(ckpt_dir, exist_ok=True)
        final = os.path.join(
            ckpt_dir, f"topk-{self.part_id:04d}-epoch-{epoch:06d}.parquet")
        if not os.path.exists(final):
            t = self.summary().append_column(
                "undercount", pa.array(
                    [self.undercount] * len(self.state), pa.int64()))
            tmp = final + ".tmp"
            pq.write_table(t, tmp)
            os.replace(tmp, final)

    def restore(self, ckpt_dir: str, upto_epoch: int) -> int:
        import glob

        import pandas as pd

        best = None
        for p in sorted(glob.glob(os.path.join(
                ckpt_dir, f"topk-{self.part_id:04d}-epoch-*.parquet"))):
            e = int(p.rsplit("-epoch-", 1)[1].split(".")[0])
            if e <= upto_epoch:
                best = p
        self.state = pd.Series(dtype=np.int64)
        self.undercount = 0
        if best is None:
            return 0
        t = pq.read_table(best)
        self.state = pd.Series(
            t.column("cnt").to_numpy(zero_copy_only=False),
            index=t.column("key").to_numpy(zero_copy_only=False))
        if t.num_rows:
            self.undercount = int(t.column("undercount")[0].as_py())
        return int(len(self.state))


class StreamingTopKJob:
    """Continuous heavy-hitter tracking over a micro-batch Parquet
    stream. Epoch pipelining and resume mirror ``StreamingDedupJob``."""

    def reshard_from(self, old_dir: str) -> dict:
        """Rescale a top-k checkpoint to this job's partition count
        (see streaming/rescale.py): counters re-route by the same key
        hash the prep uses; the undercount bound maxes over
        contributing old partitions."""
        from .rescale import (hash_str_route, reshard_snapshots,
                              topk_combine)

        return reshard_snapshots(self, old_dir, "topk",
                                 route=hash_str_route("key"),
                                 combine=topk_combine)

    def __init__(self, *, key_cols: Sequence[str],
                 columns: Sequence[str] | None = None,
                 capacity: int = 4096, num_partitions: int = 8,
                 checkpoint_dir: str | None = None,
                 checkpoint_every: int = 0, resume: bool = False):
        self.key_cols = list(key_cols)
        self.columns = list(columns) if columns else None
        if self.columns:
            for c in self.key_cols:
                if c not in self.columns:
                    self.columns.append(c)
        if capacity < 1:
            raise ValueError("capacity must be >= 1")
        self.P = num_partitions
        self.actors = [TopKStateActor.remote(p, capacity)
                       for p in range(num_partitions)]
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
            self._restored = sum(ray.get(
                [a.restore.remote(checkpoint_dir, doc["epoch"])
                 for a in self.actors]))

    def _submit_epoch(self, files_or_tables: Sequence):
        self.epoch += 1
        if self.epoch <= self._resume_cursor:
            return (self.epoch, None, None)
        preps = [_topk_prep.options(num_returns=self.P).remote(
            [f], self.columns, self.key_cols, self.P)
            for f in files_or_tables]
        parts = ([[r] for r in preps] if self.P == 1
                 else [list(r) for r in preps])
        acks = [self.actors[p].process.remote(
            self.epoch, *[parts[i][p] for i in range(len(preps))])
            for p in range(self.P)]
        ckpt = None
        if (self.checkpoint_dir and self.checkpoint_every
                and (self.epoch + 1) % self.checkpoint_every == 0):
            ckpt = [a.checkpoint.remote(self.epoch, self.checkpoint_dir)
                    for a in self.actors]
        return (self.epoch, acks, ckpt)

    def _drain_epoch(self, pending) -> dict:
        epoch, acks, ckpt = pending
        if acks is None:
            m = {"epoch": epoch, "rows_in": 0, "tracked": None,
                 "max_undercount": None, "skipped": True}
            self.metrics.append(m)
            return m
        stats = ray.get(acks)
        m = {"epoch": epoch,
             "rows_in": sum(s["rows_in"] for s in stats),
             "tracked": sum(s["tracked"] for s in stats),
             "max_undercount": max(s["max_undercount"] for s in stats)}
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

    def topk(self, k: int) -> pa.Table:
        """Global top-k snapshot (cnt desc, key asc)."""
        tabs = ray.get([a.summary.remote() for a in self.actors])
        t = pa.concat_tables([x for x in tabs if x.num_rows])
        if t.num_rows == 0:
            return pa.table({"key": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        idx = pc.sort_indices(t, sort_keys=[("cnt", "descending"),
                                            ("key", "ascending")])
        return t.take(idx[:k])

    def finish(self) -> dict:
        last = next((m for m in reversed(self.metrics)
                     if m.get("tracked") is not None), None)
        return {"epochs": self.epoch + 1,
                "rows_in": sum(m["rows_in"] for m in self.metrics),
                "tracked": last["tracked"] if last else getattr(
                    self, "_restored", 0),
                "max_undercount": (last["max_undercount"]
                                   if last else 0)}
