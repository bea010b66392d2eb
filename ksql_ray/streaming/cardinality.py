"""Streaming cardinality: continuous distinct-count over a micro-batch
stream with constant state (HyperLogLog registers).

The streaming counterpart of ``ops/hll.py`` — "how many distinct
conversations / users / URLs so far" over an unbounded stream, in
``m`` bytes per partition instead of an ever-growing seen-set. HLL
registers merge by elementwise max, so per-file partials, per-epoch
actor updates and cross-partition union are all the same operation —
order- and replay-INSENSITIVE (a replayed epoch cannot corrupt the
state, unlike counting sketches; checkpoint/resume exists only to skip
re-reading files).

Shape (mirrors ``StreamingTopKJob``): stateless prep tasks reduce each
file to its nonzero (register, rho) partial — ≤ m rows per file — and
route register ranges point-to-point to P ``HLLStateActor``s
(``register % P``); each actor holds its slice of the register array
(m/P bytes) and folds partials with ``np.maximum``. ``estimate()``
unions the slices and applies the standard raw estimator with the
small-range correction (ops/hll.hll_estimate).
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

from ..ops.hll import hll_estimate, registers_from_keys
from .driver import limit_worker_threads

__all__ = ["StreamingHLLJob", "StreamingGroupedHLLJob"]


@ray.remote
def _hll_prep(inputs, columns, key_col: str, p: int, hash: str,
              num_partitions: int):
    """Read -> per-file nonzero (register, rho) maxima -> route by
    register % P (invoked with ``num_returns=P``)."""
    limit_worker_threads()
    best = np.zeros(1 << p, dtype=np.int64)
    n_rows = 0
    for x in inputs:
        batch = x if isinstance(x, pa.Table) else pq.read_table(
            x, columns=columns)
        n_rows += batch.num_rows
        col = pc.fill_null(pc.cast(batch.column(key_col), pa.string()), "")
        arr = (col.combine_chunks()
               if isinstance(col, pa.ChunkedArray) else col)
        keys = arr.to_numpy(zero_copy_only=False)
        if len(keys):
            reg, rho = registers_from_keys(keys, p, hash)
            np.maximum.at(best, reg, rho)
    slices = []
    for part in range(num_partitions):
        nz = np.flatnonzero(best)
        nz = nz[nz % num_partitions == part]
        rows_col = np.zeros(len(nz), dtype=np.int64)
        if part == 0 and len(nz):
            rows_col[0] = n_rows
        slices.append(pa.table({
            "register": pa.array(nz, type=pa.int64()),
            "rho": pa.array(best[nz], type=pa.int64()),
            "rows": pa.array(rows_col, type=pa.int64()),
        }))
    # rows_in metric rides partition 0's slice; if it is empty the count
    # is carried in a 1-row sentinel with register -1
    if slices[0].num_rows == 0 and n_rows:
        slices[0] = pa.table({"register": pa.array([-1], pa.int64()),
                              "rho": pa.array([0], pa.int64()),
                              "rows": pa.array([n_rows], pa.int64())})
    return slices[0] if num_partitions == 1 else tuple(slices)


@ray.remote
class HLLStateActor:
    """One register-range slice of the HLL state."""

    def __init__(self, part_id: int, p: int):
        limit_worker_threads()
        self.part_id = part_id
        self.p = p
        self.best = np.zeros(1 << p, dtype=np.int64)

    def process(self, epoch: int, *parts) -> dict:
        rows = 0
        for t in parts:
            if t is None or t.num_rows == 0:
                continue
            reg = t.column("register").to_numpy(zero_copy_only=False)
            rho = t.column("rho").to_numpy(zero_copy_only=False)
            rows += int(t.column("rows").to_numpy(
                zero_copy_only=False).sum())
            real = reg >= 0
            np.maximum.at(self.best, reg[real], rho[real])
        return {"rows_in": rows,
                "nonzero": int(np.count_nonzero(self.best))}

    def summary(self) -> pa.Table:
        nz = np.flatnonzero(self.best)
        return pa.table({"register": pa.array(nz, type=pa.int64()),
                         "rho": pa.array(self.best[nz],
                                         type=pa.int64())})

    def checkpoint(self, epoch: int, ckpt_dir: str) -> None:
        os.makedirs(ckpt_dir, exist_ok=True)
        final = os.path.join(
            ckpt_dir, f"hll-{self.part_id:04d}-epoch-{epoch:06d}.parquet")
        if not os.path.exists(final):
            tmp = final + ".tmp"
            pq.write_table(self.summary(), tmp)
            os.replace(tmp, final)

    def restore(self, ckpt_dir: str, upto_epoch: int) -> int:
        import glob

        best = None
        for f in sorted(glob.glob(os.path.join(
                ckpt_dir, f"hll-{self.part_id:04d}-epoch-*.parquet"))):
            e = int(f.rsplit("-epoch-", 1)[1].split(".")[0])
            if e <= upto_epoch:
                best = f
        self.best = np.zeros(1 << self.p, dtype=np.int64)
        if best is None:
            return 0
        t = pq.read_table(best)
        reg = t.column("register").to_numpy(zero_copy_only=False)
        rho = t.column("rho").to_numpy(zero_copy_only=False)
        self.best[reg] = rho
        return int(len(reg))


class StreamingHLLJob:
    """Continuous distinct-count over a micro-batch Parquet stream."""

    def reshard_from(self, old_dir: str) -> dict:
        """Rescale an HLL checkpoint: registers re-route by
        register id mod the new partition count (exact — register
        shards are disjoint)."""
        from .rescale import mod_route, reshard_snapshots

        return reshard_snapshots(self, old_dir, "hll",
                                 route=mod_route("register"))

    def __init__(self, *, key_col: str, p: int = 8,
                 columns: Sequence[str] | None = None,
                 hash: str = "fast", num_partitions: int = 4,
                 checkpoint_dir: str | None = None,
                 checkpoint_every: int = 0, resume: bool = False):
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.key_col = key_col
        self.p = p
        self.hash = hash
        self.columns = list(columns) if columns else None
        if self.columns and key_col not in self.columns:
            self.columns.append(key_col)
        self.P = num_partitions
        self.actors = [HLLStateActor.remote(i, p)
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
        preps = [_hll_prep.options(num_returns=self.P).remote(
            [f], self.columns, self.key_col, self.p, self.hash, self.P)
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

    def registers(self) -> pa.Table:
        """Union of the per-partition nonzero registers, register asc."""
        tabs = ray.get([a.summary.remote() for a in self.actors])
        t = pa.concat_tables([x for x in tabs if x.num_rows])
        if t.num_rows == 0:
            return pa.table({"register": pa.array([], pa.int64()),
                             "rho": pa.array([], pa.int64())})
        return t.take(pc.sort_indices(
            t, sort_keys=[("register", "ascending")]))

    def estimate(self) -> float:
        return hll_estimate(self.registers(), self.p)

    def finish(self) -> dict:
        return {"epochs": self.epoch + 1,
                "rows_in": sum(m["rows_in"] for m in self.metrics),
                "estimate": self.estimate()}


@ray.remote
def _ghll_prep(inputs, columns, key_col: str, val_col: str, p: int,
               hash: str, num_partitions: int):
    """Read -> per-file per-key nonzero (key, register, rho) maxima ->
    route by hash(key) % P (invoked with ``num_returns=P``)."""
    limit_worker_threads()
    import pandas as pd

    from ..ops.hll import grouped_partial

    parts_tabs = []
    n_rows = 0
    for x in inputs:
        batch = x if isinstance(x, pa.Table) else pq.read_table(
            x, columns=columns)
        n_rows += batch.num_rows
        parts_tabs.append(grouped_partial(batch, [key_col], val_col,
                                          p, hash))
    t = pa.concat_tables(parts_tabs, promote_options="default")
    keys = pc.cast(t.column(key_col), pa.string()).to_numpy(
        zero_copy_only=False)
    part = (pd.util.hash_array(keys).astype(np.uint64)
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
        empty = slices[0]
        sent = {key_col: pa.nulls(1, empty.schema.field(key_col).type),
                "register": pa.array([-1], pa.int64()),
                "rho": pa.array([0], pa.int64()),
                "rows": pa.array([n_rows], pa.int64())}
        slices[0] = pa.table(sent)
    return slices[0] if num_partitions == 1 else tuple(slices)


@ray.remote
class GroupedHLLStateActor:
    """One key-hash slice of the per-key register state: a compact
    (key, register, rho) table max-merged per epoch with one pandas
    hash groupby — state is O(keys x nonzero registers), never rows."""

    def __init__(self, part_id: int, key_col: str, p: int):
        limit_worker_threads()
        self.part_id = part_id
        self.key_col = key_col
        self.p = p
        self.state: pa.Table | None = None

    def process(self, epoch: int, *parts) -> dict:
        import pandas as pd

        rows = 0
        tabs = [] if self.state is None else [self.state]
        for t in parts:
            if t is None or t.num_rows == 0:
                continue
            rows += int(t.column("rows").to_numpy(
                zero_copy_only=False).sum())
            real = pc.greater_equal(t.column("register"), 0)
            tabs.append(t.drop_columns(["rows"]).filter(real))
        if tabs:
            allt = pa.concat_tables(tabs, promote_options="default")
            df = allt.to_pandas().groupby(
                [self.key_col, "register"], sort=False,
                dropna=False)["rho"].max().reset_index()
            self.state = pa.table({
                self.key_col: pa.Array.from_pandas(
                    df[self.key_col],
                    type=allt.schema.field(self.key_col).type),
                "register": pa.array(df["register"].to_numpy(np.int64)),
                "rho": pa.array(df["rho"].to_numpy(np.int64)),
            })
        return {"rows_in": rows,
                "state_records": 0 if self.state is None
                else self.state.num_rows}

    def summary(self) -> pa.Table:
        if self.state is None:
            return pa.table({self.key_col: pa.array([], pa.string()),
                             "register": pa.array([], pa.int64()),
                             "rho": pa.array([], pa.int64())})
        return self.state

    def checkpoint(self, epoch: int, ckpt_dir: str) -> None:
        os.makedirs(ckpt_dir, exist_ok=True)
        final = os.path.join(
            ckpt_dir,
            f"ghll-{self.part_id:04d}-epoch-{epoch:06d}.parquet")
        if not os.path.exists(final):
            tmp = final + ".tmp"
            pq.write_table(self.summary(), tmp)
            os.replace(tmp, final)

    def restore(self, ckpt_dir: str, upto_epoch: int) -> int:
        import glob

        best = None
        for f in sorted(glob.glob(os.path.join(
                ckpt_dir,
                f"ghll-{self.part_id:04d}-epoch-*.parquet"))):
            e = int(f.rsplit("-epoch-", 1)[1].split(".")[0])
            if e <= upto_epoch:
                best = f
        self.state = None
        if best is None:
            return 0
        t = pq.read_table(best)
        self.state = t if t.num_rows else None
        return int(t.num_rows)


class StreamingGroupedHLLJob:
    """Continuous PER-KEY distinct-count over a micro-batch stream:
    "distinct values of ``val_col`` per ``key_col`` so far", at
    <= 2^p small ints of state per key (the streaming counterpart of
    ops/hll.grouped_hll). Register max-merge is order- and
    replay-insensitive, so replayed epochs cannot corrupt state;
    checkpoint/resume mirrors StreamingHLLJob."""

    def reshard_from(self, old_dir: str) -> dict:
        """Rescale a grouped-HLL checkpoint: (key, register, rho) rows
        re-route by the same key hash the prep uses."""
        from .rescale import hash_str_route, reshard_snapshots

        return reshard_snapshots(self, old_dir, "ghll",
                                 route=hash_str_route(self.key_col))

    def __init__(self, *, key_col: str, val_col: str, p: int = 8,
                 columns: Sequence[str] | None = None,
                 hash: str = "fast", num_partitions: int = 4,
                 checkpoint_dir: str | None = None,
                 checkpoint_every: int = 0, resume: bool = False):
        if not 4 <= p <= 18:
            raise ValueError("p must be in [4, 18]")
        self.key_col = key_col
        self.val_col = val_col
        self.p = p
        self.hash = hash
        self.columns = list(columns) if columns else None
        if self.columns:
            for c in (key_col, val_col):
                if c not in self.columns:
                    self.columns.append(c)
        self.P = num_partitions
        self.actors = [GroupedHLLStateActor.remote(i, key_col, p)
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
        preps = [_ghll_prep.options(num_returns=self.P).remote(
            [f], self.columns, self.key_col, self.val_col, self.p,
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

    def registers(self) -> pa.Table:
        """Union of the per-partition per-key register states."""
        tabs = ray.get([a.summary.remote() for a in self.actors])
        tabs = [x for x in tabs if x.num_rows]
        if not tabs:
            return pa.table({self.key_col: pa.array([], pa.string()),
                             "register": pa.array([], pa.int64()),
                             "rho": pa.array([], pa.int64())})
        t = pa.concat_tables(tabs, promote_options="default")
        return t.take(pc.sort_indices(
            t, sort_keys=[(self.key_col, "ascending"),
                          ("register", "ascending")]))

    def finish(self) -> dict:
        st = self.registers()
        return {"epochs": self.epoch + 1,
                "rows_in": sum(m["rows_in"] for m in self.metrics),
                "state_records": st.num_rows,
                "keys": len(pc.unique(st.column(self.key_col)))
                if st.num_rows else 0}
