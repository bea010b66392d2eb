"""Streaming Count–Min sketch: continuous per-key frequency estimation
over a micro-batch stream with constant state.

The streaming counterpart of ``ops/cms.py`` — "how often has this URL /
tool / n-gram appeared so far" over an unbounded stream in
``depth × width`` int64 cells per partition instead of an ever-growing
counter table. Unlike HLL registers (max-merge, replay-insensitive),
CMS counters merge by ADDITION, so a replayed epoch would double-count:
the state actors carry a strictly-monotone epoch fence — ``process``
with ``epoch <= last applied`` is a no-op — and checkpoints store the
fence with the cells, making resume exactly-once.

Shape (mirrors ``StreamingHLLJob``): stateless prep tasks reduce each
file to its nonzero (d, bucket, cnt) partial — ≤ depth×width rows per
file — and route bucket ranges point-to-point to P ``CMSStateActor``s
(``bucket % P``); each actor holds a dense (depth, width) slice
(cells outside its bucket range stay zero) and folds partials with
``np.add.at``. ``estimate(keys)`` unions the slices and point-queries
min-over-depth (ops/cms.cms_estimate).
"""

from __future__ import annotations

import json
import os
from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..ops.cms import _key_strings, cms_estimate, counters_from_keys
from .driver import limit_worker_threads

__all__ = ["StreamingCMSJob"]


@ray.remote
def _cms_prep(inputs, columns, key_col: str, depth: int, width: int,
              hash: str, num_partitions: int):
    """Read -> per-file dense counters -> nonzero cells routed by
    bucket % P (invoked with ``num_returns=P``)."""
    limit_worker_threads()
    cnt = np.zeros((depth, width), dtype=np.int64)
    n_rows = 0
    for x in inputs:
        batch = x if isinstance(x, pa.Table) else pq.read_table(
            x, columns=columns)
        n_rows += batch.num_rows
        keys = _key_strings(batch, key_col)
        if len(keys):
            cnt += counters_from_keys(keys, depth, width, hash)
    d_all, b_all = np.nonzero(cnt)
    slices = []
    for part in range(num_partitions):
        m = b_all % num_partitions == part
        d, b = d_all[m], b_all[m]
        rows_col = np.zeros(len(d), dtype=np.int64)
        if part == 0 and len(d):
            rows_col[0] = n_rows
        slices.append(pa.table({
            "d": pa.array(d, type=pa.int64()),
            "bucket": pa.array(b, type=pa.int64()),
            "cnt": pa.array(cnt[d, b], type=pa.int64()),
            "rows": pa.array(rows_col, type=pa.int64()),
        }))
    # rows_in metric rides partition 0's slice; when it has no cells
    # the count is carried by a 1-row sentinel with d == -1
    if slices[0].num_rows == 0 and n_rows:
        slices[0] = pa.table({"d": pa.array([-1], pa.int64()),
                              "bucket": pa.array([0], pa.int64()),
                              "cnt": pa.array([0], pa.int64()),
                              "rows": pa.array([n_rows], pa.int64())})
    return slices[0] if num_partitions == 1 else tuple(slices)


@ray.remote
class CMSStateActor:
    """One bucket-range slice of the CMS counter state."""

    def __init__(self, part_id: int, depth: int, width: int):
        limit_worker_threads()
        self.part_id = part_id
        self.depth = depth
        self.width = width
        self.cnt = np.zeros((depth, width), dtype=np.int64)
        self.last_epoch = -1

    def process(self, epoch: int, *parts) -> dict:
        rows = 0
        if epoch <= self.last_epoch:
            # replayed epoch: addition is not replay-insensitive, so
            # the fence makes re-delivery a counted no-op
            return {"rows_in": 0, "replayed": 1,
                    "nonzero": int(np.count_nonzero(self.cnt))}
        for t in parts:
            if t is None or t.num_rows == 0:
                continue
            d = t.column("d").to_numpy(zero_copy_only=False)
            b = t.column("bucket").to_numpy(zero_copy_only=False)
            c = t.column("cnt").to_numpy(zero_copy_only=False)
            rows += int(t.column("rows").to_numpy(
                zero_copy_only=False).sum())
            real = d >= 0
            np.add.at(self.cnt, (d[real], b[real]), c[real])
        self.last_epoch = epoch
        return {"rows_in": rows, "replayed": 0,
                "nonzero": int(np.count_nonzero(self.cnt))}

    def summary(self) -> pa.Table:
        d, b = np.nonzero(self.cnt)
        return pa.table({"d": pa.array(d, type=pa.int64()),
                         "bucket": pa.array(b, type=pa.int64()),
                         "cnt": pa.array(self.cnt[d, b],
                                         type=pa.int64())})

    def checkpoint(self, epoch: int, ckpt_dir: str) -> None:
        os.makedirs(ckpt_dir, exist_ok=True)
        final = os.path.join(
            ckpt_dir, f"cms-{self.part_id:04d}-epoch-{epoch:06d}.parquet")
        if not os.path.exists(final):
            tmp = final + ".tmp"
            pq.write_table(self.summary(), tmp)
            os.replace(tmp, final)

    def restore(self, ckpt_dir: str, upto_epoch: int) -> int:
        import glob

        best, best_e = None, -1
        for f in sorted(glob.glob(os.path.join(
                ckpt_dir, f"cms-{self.part_id:04d}-epoch-*.parquet"))):
            e = int(f.rsplit("-epoch-", 1)[1].split(".")[0])
            if e <= upto_epoch:
                best, best_e = f, e
        self.cnt = np.zeros((self.depth, self.width), dtype=np.int64)
        self.last_epoch = best_e
        if best is None:
            return 0
        t = pq.read_table(best)
        d = t.column("d").to_numpy(zero_copy_only=False)
        b = t.column("bucket").to_numpy(zero_copy_only=False)
        self.cnt[d, b] = t.column("cnt").to_numpy(zero_copy_only=False)
        return int(t.num_rows)


class StreamingCMSJob:
    """Continuous frequency sketch over a micro-batch Parquet stream."""

    def reshard_from(self, old_dir: str) -> dict:
        """Rescale a CMS checkpoint: counters are additive and the
        final estimate sums every partition, so old counter tables
        redistribute round-robin and cell-sum."""
        from .rescale import cms_combine, reshard_snapshots

        return reshard_snapshots(self, old_dir, "cms",
                                 combine=cms_combine)

    def __init__(self, *, key_col: str, depth: int = 4, width: int = 256,
                 columns: Sequence[str] | None = None,
                 hash: str = "fast", num_partitions: int = 4,
                 checkpoint_dir: str | None = None,
                 checkpoint_every: int = 0, resume: bool = False):
        if depth < 1 or width < 2:
            raise ValueError("need depth >= 1 and width >= 2")
        self.key_col = key_col
        self.depth = depth
        self.width = width
        self.hash = hash
        self.columns = list(columns) if columns else None
        if self.columns and key_col not in self.columns:
            self.columns.append(key_col)
        self.P = num_partitions
        self.actors = [CMSStateActor.remote(i, depth, width)
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
        preps = [_cms_prep.options(num_returns=self.P).remote(
            [f], self.columns, self.key_col, self.depth, self.width,
            self.hash, self.P) for f in files_or_tables]
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
             "replayed": sum(s["replayed"] for s in stats),
             "nonzero": sum(s["nonzero"] for s in stats)}
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

    def counters(self) -> pa.Table:
        """Union of the per-partition nonzero cells, (d, bucket) asc."""
        import pyarrow.compute as pc

        tabs = ray.get([a.summary.remote() for a in self.actors])
        t = pa.concat_tables([x for x in tabs if x.num_rows])
        if t.num_rows == 0:
            return pa.table({"d": pa.array([], pa.int64()),
                             "bucket": pa.array([], pa.int64()),
                             "cnt": pa.array([], pa.int64())})
        return t.take(pc.sort_indices(
            t, sort_keys=[("d", "ascending"), ("bucket", "ascending")]))

    def estimate(self, keys) -> pa.Table:
        return cms_estimate(self.counters(), keys, self.depth,
                            self.width, self.hash)

    def finish(self) -> dict:
        return {"epochs": self.epoch + 1,
                "rows_in": sum(m.get("rows_in", 0) for m in self.metrics),
                "replayed": sum(m.get("replayed", 0)
                                for m in self.metrics),
                "nonzero": int(self.counters().num_rows)}
