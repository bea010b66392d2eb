"""Streaming quantiles: continuous percentile tracking over a
micro-batch stream with bounded state (deterministic merge-and-prune
sketches, ops/quantiles.py).

p50/p99 of turn latency or document length over an unbounded stream,
in O(capacity · log(n/capacity)) floats per partition. Quantile
summaries merge associatively, so the physical plan is simpler than
the keyed jobs: prep tasks reduce each file to its partial sketch
(≤ ~capacity rows), files round-robin across P ``QuantileStateActor``s
(no key shuffle — sketches are value-agnostic), and ``quantiles()``
merges the P actor sketches in one remote task. The accumulated
worst-case rank-error bound is carried through every merge and
reported, never silent; with ``capacity`` above the stream volume the
answers are EXACT (the oracle-gated configuration).
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

from ..ops.quantiles import QuantileSketch
from .driver import limit_worker_threads

__all__ = ["StreamingQuantilesJob", "StreamingGroupedQuantilesJob"]


@ray.remote
def _quantile_prep(inputs, columns, col: str, capacity: int) -> pa.Table:
    """Read -> one partial sketch per prep task."""
    limit_worker_threads()
    sk = QuantileSketch(capacity)
    rows = 0
    for x in inputs:
        batch = x if isinstance(x, pa.Table) else pq.read_table(
            x, columns=columns)
        rows += batch.num_rows
        v = pc.cast(batch.column(col), pa.float64()).combine_chunks()
        npv = v.to_numpy(zero_copy_only=False)
        sk.insert(npv[~np.isnan(npv)])
    t = sk.to_table()
    rows_col = ([rows] + [0] * (t.num_rows - 1)) if t.num_rows else []
    t = t.append_column("rows_in", pa.array(rows_col, type=pa.int64()))
    # an all-NaN/empty file leaves the sketch empty: carry the row count
    # in schema metadata so the metric stays exact
    return t.replace_schema_metadata({b"rows_in": str(rows).encode()}
                                     if t.num_rows == 0 else None)


@ray.remote
class QuantileStateActor:
    def __init__(self, part_id: int, capacity: int):
        limit_worker_threads()
        self.part_id = part_id
        self.capacity = capacity
        self.sketch = QuantileSketch(capacity)
        self.rows_in = 0

    def process(self, epoch: int, *parts) -> dict:
        for t in parts:
            if t is None:
                continue
            if t.num_rows == 0:
                md = t.schema.metadata or {}
                self.rows_in += int(md.get(b"rows_in", b"0"))
                continue
            self.rows_in += int(t.column("rows_in").to_numpy(
                zero_copy_only=False).sum())
            self.sketch.merge(QuantileSketch.from_table(
                t.drop_columns(["rows_in"]), self.capacity))
        return {"rows_in": self.rows_in, "n": self.sketch.n,
                "max_rank_error": self.sketch.max_rank_error}

    def summary(self) -> pa.Table:
        return self.sketch.to_table()

    def checkpoint(self, epoch: int, ckpt_dir: str) -> None:
        os.makedirs(ckpt_dir, exist_ok=True)
        final = os.path.join(
            ckpt_dir, f"qs-{self.part_id:04d}-epoch-{epoch:06d}.parquet")
        if not os.path.exists(final):
            tmp = final + ".tmp"
            pq.write_table(self.summary().append_column(
                "rows_in", pa.array(
                    [self.rows_in] * self.sketch.to_table().num_rows,
                    pa.int64())), tmp)
            os.replace(tmp, final)

    def restore(self, ckpt_dir: str, upto_epoch: int) -> int:
        import glob

        best = None
        for f in sorted(glob.glob(os.path.join(
                ckpt_dir, f"qs-{self.part_id:04d}-epoch-*.parquet"))):
            e = int(f.rsplit("-epoch-", 1)[1].split(".")[0])
            if e <= upto_epoch:
                best = f
        self.sketch = QuantileSketch(self.capacity)
        self.rows_in = 0
        if best is None:
            return 0
        t = pq.read_table(best)
        if t.num_rows:
            self.rows_in = int(t.column("rows_in")[0].as_py())
            self.sketch = QuantileSketch.from_table(
                t.drop_columns(["rows_in"]), self.capacity)
        return self.sketch.n


class StreamingQuantilesJob:
    """Continuous quantile tracking over a micro-batch Parquet stream.
    Epoch pipelining and resume mirror ``StreamingTopKJob``."""

    def reshard_from(self, old_dir: str) -> dict:
        """Rescale a quantile-sketch checkpoint: summaries are
        partition-agnostic (the final answer merges every partition),
        so old summaries redistribute round-robin; same-level buffers
        merge weight-exactly with n summed and err maxed."""
        from .rescale import quantile_combine, reshard_snapshots

        return reshard_snapshots(self, old_dir, "qs",
                                 combine=quantile_combine)

    def __init__(self, *, col: str, capacity: int = 4096,
                 columns: Sequence[str] | None = None,
                 num_partitions: int = 4,
                 checkpoint_dir: str | None = None,
                 checkpoint_every: int = 0, resume: bool = False):
        self.col = col
        self.capacity = capacity
        self.columns = list(columns) if columns else None
        if self.columns and col not in self.columns:
            self.columns.append(col)
        self.P = num_partitions
        self.actors = [QuantileStateActor.remote(i, capacity)
                       for i in range(num_partitions)]
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every = checkpoint_every
        self.epoch = -1
        self._file_seq = 0
        self._resume_cursor = -1
        self.metrics: list[dict] = []
        cursor = (os.path.join(checkpoint_dir, "checkpoint.json")
                  if checkpoint_dir else None)
        if resume and cursor and os.path.exists(cursor):
            with open(cursor) as f:
                doc = json.load(f)
            self._resume_cursor = doc["epoch"]
            self._file_seq = doc["file_seq"]
            ray.get([a.restore.remote(checkpoint_dir, doc["epoch"])
                     for a in self.actors])

    def _submit_epoch(self, files_or_tables: Sequence):
        self.epoch += 1
        if self.epoch <= self._resume_cursor:
            return (self.epoch, None, None)
        # sketches carry no key: files round-robin across actors
        by_actor: dict[int, list] = {}
        for f in files_or_tables:
            by_actor.setdefault(self._file_seq % self.P, []).append(f)
            self._file_seq += 1
        acks = []
        for p, files in by_actor.items():
            preps = [_quantile_prep.remote(
                [f], self.columns, self.col, self.capacity)
                for f in files]
            acks.append(self.actors[p].process.remote(self.epoch, *preps))
        ckpt = None
        if (self.checkpoint_dir and self.checkpoint_every
                and (self.epoch + 1) % self.checkpoint_every == 0):
            ckpt = [a.checkpoint.remote(self.epoch, self.checkpoint_dir)
                    for a in self.actors]
        return (self.epoch, acks, ckpt)

    def _drain_epoch(self, pending) -> dict:
        epoch, acks, ckpt = pending
        if acks is None:
            m = {"epoch": epoch, "skipped": True}
            self.metrics.append(m)
            return m
        stats = ray.get(acks)
        m = {"epoch": epoch,
             "n": sum(s["n"] for s in stats),
             "max_rank_error": sum(s["max_rank_error"] for s in stats)}
        self.metrics.append(m)
        if ckpt is not None:
            ray.get(ckpt)
            cursor = os.path.join(self.checkpoint_dir, "checkpoint.json")
            tmp = cursor + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"epoch": epoch, "file_seq": self._file_seq}, f)
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

    def _merged(self) -> QuantileSketch:
        merged = QuantileSketch(self.capacity)
        for t in ray.get([a.summary.remote() for a in self.actors]):
            if t.num_rows:
                merged.merge(QuantileSketch.from_table(t, self.capacity))
        return merged

    def quantiles(self, qs: list[float]) -> pa.Table:
        sk = self._merged()
        return pa.table({
            "q": pa.array(qs, type=pa.float64()),
            "value": pa.array([sk.quantile(q) for q in qs],
                              type=pa.float64()),
        })

    def finish(self) -> dict:
        sk = self._merged()
        rows = ray.get([a.process.remote(-1) for a in self.actors])
        return {"epochs": self.epoch + 1,
                "rows_in": sum(r["rows_in"] for r in rows),
                "n": sk.n, "max_rank_error": sk.max_rank_error}


# --------------------------------------------------------------------
# per-key grouped quantiles on ingest
# --------------------------------------------------------------------

@ray.remote
def _gq_prep(inputs, columns, key_cols, col: str, num_partitions: int):
    """Read -> per-file (key..., __val, __cnt) histogram partials ->
    route by hash(key) % P (invoked with ``num_returns=P``)."""
    import pandas as pd

    from ..ops.quantiles import grouped_hist_partial

    limit_worker_threads()
    tabs = []
    n_rows = 0
    for x in inputs:
        batch = x if isinstance(x, pa.Table) else pq.read_table(
            x, columns=columns)
        n_rows += batch.num_rows
        tabs.append(grouped_hist_partial(batch, list(key_cols), col))
    t = pa.concat_tables(tabs, promote_options="default")
    key0 = pc.cast(t.column(key_cols[0]), pa.string()).to_numpy(
        zero_copy_only=False)
    part = (pd.util.hash_array(key0).astype(np.uint64)
            % np.uint64(num_partitions)).astype(np.int64)
    slices = []
    for q in range(num_partitions):
        s = t.filter(pa.array(part == q))
        rows_col = np.zeros(s.num_rows, dtype=np.int64)
        if q == 0 and s.num_rows:
            rows_col[0] = n_rows
        slices.append(s.append_column(
            "rows", pa.array(rows_col, type=pa.int64())))
    if slices[0].num_rows == 0 and n_rows:
        sent = {k: pa.nulls(1, t.schema.field(k).type)
                for k in key_cols}
        sent["__val"] = pa.array([0.0], pa.float64())
        sent["__cnt"] = pa.array([0], pa.int64())   # cnt 0 == sentinel
        sent["rows"] = pa.array([n_rows], pa.int64())
        slices[0] = pa.table(sent)
    return slices[0] if num_partitions == 1 else tuple(slices)


@ray.remote
class GroupedQuantileStateActor:
    """One key-hash slice of the per-key value histogram. Counts merge
    by ADDITION — not replay-insensitive — so the actor carries the
    same strictly-monotone epoch fence as the CMS job."""

    def __init__(self, part_id: int, key_cols):
        limit_worker_threads()
        self.part_id = part_id
        self.key_cols = list(key_cols)
        self.state: pa.Table | None = None
        self.last_epoch = -1

    def process(self, epoch: int, *parts) -> dict:
        import pandas as pd

        if epoch <= self.last_epoch:
            return {"rows_in": 0, "replayed": 1, "state_records":
                    0 if self.state is None else self.state.num_rows}
        rows = 0
        tabs = [] if self.state is None else [self.state]
        for t in parts:
            if t is None or t.num_rows == 0:
                continue
            rows += int(t.column("rows").to_numpy(
                zero_copy_only=False).sum())
            real = pc.greater(t.column("__cnt"), 0)
            tabs.append(t.drop_columns(["rows"]).filter(real))
        if tabs:
            allt = pa.concat_tables(tabs, promote_options="default")
            df = allt.to_pandas().groupby(
                self.key_cols + ["__val"], sort=False,
                dropna=False)["__cnt"].sum().reset_index()
            cols = {k: pa.Array.from_pandas(
                df[k], type=allt.schema.field(k).type)
                for k in self.key_cols}
            cols["__val"] = pa.array(df["__val"].to_numpy(np.float64),
                                     type=pa.float64())
            cols["__cnt"] = pa.array(df["__cnt"].to_numpy(np.int64),
                                     type=pa.int64())
            self.state = pa.table(cols)
        self.last_epoch = epoch
        return {"rows_in": rows, "replayed": 0, "state_records":
                0 if self.state is None else self.state.num_rows}

    def quantiles(self, qs) -> pa.Table:
        from ..ops.quantiles import _gq_finalize

        if self.state is None or self.state.num_rows == 0:
            return pa.table({})
        key_types = {k: self.state.schema.field(k).type
                     for k in self.key_cols}
        return _gq_finalize(self.state.to_pandas(), self.key_cols,
                            list(qs), key_types)

    def summary(self) -> pa.Table | None:
        return self.state

    def checkpoint(self, epoch: int, ckpt_dir: str) -> None:
        os.makedirs(ckpt_dir, exist_ok=True)
        final = os.path.join(
            ckpt_dir, f"gq-{self.part_id:04d}-epoch-{epoch:06d}.parquet")
        if not os.path.exists(final):
            tmp = final + ".tmp"
            t = self.state if self.state is not None else pa.table(
                {"__val": pa.array([], pa.float64()),
                 "__cnt": pa.array([], pa.int64())})
            pq.write_table(t, tmp)
            os.replace(tmp, final)

    def restore(self, ckpt_dir: str, upto_epoch: int) -> int:
        import glob

        best, best_e = None, -1
        for f in sorted(glob.glob(os.path.join(
                ckpt_dir, f"gq-{self.part_id:04d}-epoch-*.parquet"))):
            e = int(f.rsplit("-epoch-", 1)[1].split(".")[0])
            if e <= upto_epoch:
                best, best_e = f, e
        self.state = None
        self.last_epoch = best_e
        if best is None:
            return 0
        t = pq.read_table(best)
        self.state = t if t.num_rows else None
        return int(t.num_rows)


class StreamingGroupedQuantilesJob:
    """Continuous PER-KEY exact quantiles over a micro-batch stream —
    "p95 turn length per role so far" — the streaming counterpart of
    ops/quantiles.grouped_quantiles: per-key (value, count) HISTOGRAM
    state hash-partitioned by key, so state is bounded by key × value-
    domain cardinality, never rows (the right shape for the bounded
    domains pipelines bucket on: scores, lengths, ratings). Exact —
    equals SQL ``quantile_disc(col, q) GROUP BY key`` at every epoch
    boundary; count merge is addition, so the state actors carry the
    CMS-style epoch fence and checkpoint/resume is exactly-once."""

    def reshard_from(self, old_dir: str) -> dict:
        """Rescale a grouped-quantiles checkpoint: (key, value, count)
        histogram rows re-route by the same first-key hash the prep
        uses."""
        from .rescale import hash_str_route, reshard_snapshots

        return reshard_snapshots(
            self, old_dir, "gq",
            route=hash_str_route(self.key_cols[0]))

    def __init__(self, *, key_cols, col: str,
                 columns: Sequence[str] | None = None,
                 num_partitions: int = 4,
                 checkpoint_dir: str | None = None,
                 checkpoint_every: int = 0, resume: bool = False):
        self.key_cols = list(key_cols)
        self.col = col
        self.columns = list(columns) if columns else None
        if self.columns:
            for c in [*self.key_cols, col]:
                if c not in self.columns:
                    self.columns.append(c)
        self.P = num_partitions
        self.actors = [GroupedQuantileStateActor.remote(i, self.key_cols)
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
        preps = [_gq_prep.options(num_returns=self.P).remote(
            [f], self.columns, self.key_cols, self.col, self.P)
            for f in files_or_tables]
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
             "state_records": sum(s["state_records"] for s in stats)}
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

    def quantiles(self, qs: Sequence[float]) -> pa.Table:
        """One row per (key, q): exact quantile_disc over everything
        ingested so far. Key partitions are disjoint, so per-actor
        finalize + concat is the whole merge."""
        tabs = ray.get([a.quantiles.remote(list(qs))
                        for a in self.actors])
        tabs = [t for t in tabs if t.num_rows]
        if not tabs:
            return pa.table({})
        t = pa.concat_tables(tabs, promote_options="default")
        return t.take(pc.sort_indices(t, sort_keys=[
            (k, "ascending") for k in self.key_cols] + [
            ("q", "ascending")]))

    def finish(self) -> dict:
        return {"epochs": self.epoch + 1,
                "rows_in": sum(m.get("rows_in", 0)
                               for m in self.metrics),
                "replayed": sum(m.get("replayed", 0)
                                for m in self.metrics),
                "state_records": (self.metrics[-1].get("state_records")
                                  if self.metrics else 0)}
