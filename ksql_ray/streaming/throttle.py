"""Streaming per-key throttle (debounce-on-ingest): keep at most one
row per key per ``interval_us`` across an unbounded micro-batch stream
— the continuous counterpart of ``ops/rows.throttle(mode="chain")``
(telemetry debounce, alert suppression, per-device ingest rate
limiting). The reference has no stateful row suppression of any kind
(absence verified across /root/reference/ksql/*.go).

Semantics: events are processed in the stream's total arrival order
(epoch, file, row); a row is emitted iff its event time is >= the
key's last emission + interval, and emission advances the key's state
to that row's event time. When arrival is event-time-ordered per key
(the replayed-Parquet deployment shape every gate uses), this equals
the bounded chain-throttle / recursive-CTE oracle exactly (pytest +
gate pin it).

Shape (mirrors StreamingDedupJob, SURVEY.md §4):

* stateless prep tasks fingerprint the key columns (md5 of the
  '\\x1f'-joined stringified key — oracle form — or the vectorized
  hash pair for scale), hash-partition by fingerprint, and return P
  point-to-point slices;
* P ``ThrottleStateActor``s hold their partition's (key -> last
  emission ts) map as LSM-style sorted runs with NEWEST-WINS lookup
  (a throttle update overwrites, unlike dedup's monotone set — so
  membership scans the runs newest-first and compaction keeps the
  latest value per key). Within an epoch the chain selection is the
  same per-round batched bisection as the bounded op, seeded by the
  state deadline. State memory is 24 B/key/partition.
* Incremental checkpoints write only the keys TOUCHED since the last
  checkpoint (epoch-stamped; restore folds increments in epoch order,
  latest wins); ``reshard_from`` re-buckets a checkpoint to a new P
  (the N -> 4N rescale path); surviving rows go to the idempotent
  two-phase sink.
"""

from __future__ import annotations

import hashlib
from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from .driver import _split_by_part, limit_worker_threads
from .sink import TwoPhaseSink

_INTERNAL = ["__fp0", "__fp1", "__ord", "__ts", "__part"]
_MAX_ROWS_PER_FILE = 1 << 40
_COMPACT_RUNS = 12


def _key_fingerprint(tbl: pa.Table, key_cols: list[str],
                     method: str) -> tuple[np.ndarray, np.ndarray]:
    """128-bit key fingerprint as two uint64 arrays (NULL key parts
    stringify to '' — all-null keys share one state slot, matching the
    oracle's PARTITION BY semantics)."""
    parts = [pc.fill_null(pc.cast(tbl.column(k), pa.string()), "")
             for k in key_cols]
    joined = parts[0] if len(parts) == 1 else \
        pc.binary_join_element_wise(*parts, "\x1f")
    arr = joined.combine_chunks() if isinstance(
        joined, pa.ChunkedArray) else joined
    if method == "fast":
        import pandas as pd

        np_t = arr.to_numpy(zero_copy_only=False)
        a = pd.util.hash_array(np_t, hash_key="ksql_ray_thrtle0").astype(
            np.uint64)
        b = pd.util.hash_array(np_t, hash_key="ksql_ray_thrtle1").astype(
            np.uint64)
    elif method == "md5":
        vals = arr.to_pylist()
        a = np.zeros(len(vals), dtype=np.uint64)
        b = np.zeros(len(vals), dtype=np.uint64)
        for i, v in enumerate(vals):
            d = hashlib.md5(v.encode("utf-8")).digest()
            a[i] = int.from_bytes(d[:8], "big")
            b[i] = int.from_bytes(d[8:], "big")
    else:
        raise ValueError("method must be 'md5' or 'fast'")
    return a, b


@ray.remote
def _throttle_prep(inputs, columns, key_cols, ts_col: str, method: str,
                   num_partitions: int, file_seq0: int):
    limit_worker_threads()
    tables = []
    for i, x in enumerate(inputs):
        batch = x if isinstance(x, pa.Table) else pq.read_table(
            x, columns=columns)
        a, b = _key_fingerprint(batch, key_cols, method)
        n = batch.num_rows
        if n >= _MAX_ROWS_PER_FILE:
            raise ValueError("micro-batch file exceeds 2^40 rows")
        ordv = ((file_seq0 + i) << 40) + np.arange(n, dtype=np.int64)
        ts = pc.cast(batch.column(ts_col), pa.int64()).to_numpy(
            zero_copy_only=False)
        batch = batch.append_column("__fp0", pa.array(a.view(np.int64)))
        batch = batch.append_column("__fp1", pa.array(b.view(np.int64)))
        batch = batch.append_column("__ord", pa.array(ordv))
        batch = batch.append_column("__ts", pa.array(ts))
        batch = batch.append_column("__part", pa.array(
            (a % np.uint64(num_partitions)).astype(np.int64)))
        tables.append(batch)
    out = tables[0] if len(tables) == 1 else pa.concat_tables(
        tables, promote_options="permissive")
    slices = _split_by_part(out, num_partitions)
    return slices[0] if num_partitions == 1 else tuple(slices)


@ray.remote
class ThrottleStateActor:
    """One key-hash partition of the (key -> last emission ts) map +
    its own sink writer. Runs are (fp0, fp1, last_ts) sorted by
    (fp0, fp1); lookups scan NEWEST run first (updates overwrite);
    compaction keeps the latest value per key."""

    def __init__(self, part_id: int, sink_dir: str, interval_us: int):
        limit_worker_threads()
        self.part_id = part_id
        self.sink = TwoPhaseSink(sink_dir)
        self.interval = int(interval_us)
        self.runs: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []
        self._pending: list[tuple[np.ndarray, np.ndarray, np.ndarray]] = []

    def _lookup(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        """Latest last-emission ts per queried key; MIN_INT64 when the
        key was never seen."""
        out = np.full(len(a), np.iinfo(np.int64).min, dtype=np.int64)
        found = np.zeros(len(a), dtype=bool)
        for ra, rb, rv in reversed(self.runs):      # newest first
            todo = np.flatnonzero(~found)
            if not len(todo):
                break
            lo = np.searchsorted(ra, a[todo], "left")
            hi = np.searchsorted(ra, a[todo], "right")
            one = np.flatnonzero(hi - lo == 1)
            m = rb[lo[one]] == b[todo[one]]
            hits = todo[one[m]]
            out[hits] = rv[lo[one[m]]]
            found[hits] = True
            # fp0 collisions between DISTINCT 128-bit keys in one run
            # are ~n^2/2^64 — this loop runs essentially never
            for j in np.flatnonzero(hi - lo > 1):
                s, e = lo[j], hi[j]
                k = s + np.searchsorted(rb[s:e], b[todo[j]])
                if k < e and rb[k] == b[todo[j]]:
                    out[todo[j]] = rv[k]
                    found[todo[j]] = True
        return out

    def _add_run(self, na, nb, nv) -> None:
        if len(na):
            self.runs.append((na, nb, nv))
        if len(self.runs) > _COMPACT_RUNS:
            run_of = np.concatenate([np.full(len(r[0]), i, np.int64)
                                     for i, r in enumerate(self.runs)])
            ca = np.concatenate([r[0] for r in self.runs])
            cb = np.concatenate([r[1] for r in self.runs])
            cv = np.concatenate([r[2] for r in self.runs])
            o = np.lexsort((run_of, cb, ca))   # latest run last per key
            ca, cb, cv = ca[o], cb[o], cv[o]
            last = np.ones(len(ca), dtype=bool)
            last[:-1] = (ca[1:] != ca[:-1]) | (cb[1:] != cb[:-1])
            self.runs = [(ca[last], cb[last], cv[last])]

    def process(self, epoch: int, *parts) -> dict:
        tbls = [p for p in parts if p is not None and p.num_rows]
        if not tbls:
            return {"rows_in": 0, "rows_out": 0, "state_records": sum(
                len(r[0]) for r in self.runs)}
        tbl = tbls[0] if len(tbls) == 1 else pa.concat_tables(
            tbls, promote_options="permissive")
        a = tbl.column("__fp0").to_numpy(zero_copy_only=False).view(
            np.uint64)
        b = tbl.column("__fp1").to_numpy(zero_copy_only=False).view(
            np.uint64)
        ts = tbl.column("__ts").to_numpy(zero_copy_only=False)
        ordv = tbl.column("__ord").to_numpy(zero_copy_only=False)
        # arrival order within each key segment (epoch-major total order)
        order = np.lexsort((ordv, b, a))
        a_s, b_s, t_s = a[order], b[order], ts[order]
        n = len(order)
        change = np.ones(n, dtype=bool)
        change[1:] = (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])
        starts = np.flatnonzero(change)
        ends = np.r_[starts[1:], n]
        state_last = self._lookup(a_s[starts], b_s[starts])
        lo_int = np.iinfo(np.int64).min
        deadline = np.where(state_last == lo_int, lo_int,
                            state_last + self.interval)
        emitted = np.zeros(n, dtype=bool)
        new_last = state_last.copy()
        cur = starts.copy()
        active = cur < ends
        # sequential chain per key, all keys advanced together: emit the
        # first row >= deadline, then slide the deadline (arrival order,
        # not a sort by ts — ties and out-of-order rows resolve exactly
        # like the one-row-at-a-time definition)
        while active.any():
            idx = cur[active]
            ok = t_s[idx] >= deadline[active]
            hit = np.flatnonzero(active)[ok]
            emitted[cur[hit]] = True
            new_last[hit] = t_s[cur[hit]]
            deadline[hit] = t_s[cur[hit]] + self.interval
            cur[active] += 1
            active = cur < ends
        touched = new_last != state_last
        na = a_s[starts[touched]].copy()
        nb = b_s[starts[touched]].copy()
        nv = new_last[touched].copy()
        o = np.lexsort((nb, na))
        na, nb, nv = na[o], nb[o], nv[o]
        self._add_run(na, nb, nv)
        if len(na):
            self._pending.append((na, nb, nv))
        keep_idx = order[emitted]
        keep_idx = keep_idx[np.argsort(ordv[keep_idx], kind="stable")]
        out = tbl.take(pa.array(keep_idx)).drop_columns(_INTERNAL)
        if out.num_rows:
            self.sink.write(self.part_id, epoch, out)
        return {"rows_in": tbl.num_rows, "rows_out": int(len(keep_idx)),
                # records across LSM runs (a key updated in k epochs
                # appears in k runs until compaction), not distinct keys
                "state_records": sum(len(r[0]) for r in self.runs)}

    def checkpoint(self, epoch: int, ckpt_dir: str) -> None:
        import os

        os.makedirs(ckpt_dir, exist_ok=True)
        final = os.path.join(
            ckpt_dir, f"keys-{self.part_id:04d}-epoch-{epoch:06d}.parquet")
        if not os.path.exists(final):
            if self._pending:
                a = np.concatenate([p[0] for p in self._pending])
                b = np.concatenate([p[1] for p in self._pending])
                v = np.concatenate([p[2] for p in self._pending])
                # several pending epochs may touch one key: keep latest
                run_of = np.concatenate([np.full(len(p[0]), i, np.int64)
                                         for i, p in enumerate(
                                             self._pending)])
                o = np.lexsort((run_of, b, a))
                a, b, v = a[o], b[o], v[o]
                last = np.ones(len(a), dtype=bool)
                last[:-1] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
                a, b, v = a[last], b[last], v[last]
            else:
                a = b = np.empty(0, np.uint64)
                v = np.empty(0, np.int64)
            tmp = final + ".tmp"
            pq.write_table(pa.table({
                "fp0": pa.array(a.view(np.int64)),
                "fp1": pa.array(b.view(np.int64)),
                "last_ts": pa.array(v)}), tmp)
            import os as _os

            _os.replace(tmp, final)
        self._pending = []

    def restore(self, ckpt_dir: str, upto_epoch: int) -> int:
        import glob
        import os

        parts = []
        for p in sorted(glob.glob(os.path.join(
                ckpt_dir, f"keys-{self.part_id:04d}-epoch-*.parquet"))):
            e = int(p.rsplit("-epoch-", 1)[1].split(".")[0])
            if e <= upto_epoch:
                parts.append(pq.read_table(p))
        self.runs, self._pending = [], []
        if not parts:
            return 0
        # epoch order = increment order; latest increment wins per key
        run_of = np.concatenate([np.full(p.num_rows, i, np.int64)
                                 for i, p in enumerate(parts)])
        t = pa.concat_tables(parts)
        a = t.column("fp0").to_numpy(zero_copy_only=False).view(np.uint64)
        b = t.column("fp1").to_numpy(zero_copy_only=False).view(np.uint64)
        v = t.column("last_ts").to_numpy(zero_copy_only=False)
        o = np.lexsort((run_of, b, a))
        a, b, v = a[o], b[o], v[o]
        last = np.ones(len(a), dtype=bool)
        last[:-1] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
        self.runs = [(a[last], b[last], v[last])]
        return int(last.sum())


class StreamingThrottleJob:
    """Continuous per-key debounce over a micro-batch Parquet stream
    (same epoch-pipelined driver shape as StreamingDedupJob)."""

    def __init__(self, out_dir: str, *, key_cols: list[str],
                 ts_col: str = "ts", interval_us: int,
                 method: str = "md5", columns: list[str] | None = None,
                 num_partitions: int = 8,
                 checkpoint_dir: str | None = None,
                 checkpoint_every: int = 0, resume: bool = False):
        import json
        import os

        if method not in ("md5", "fast"):
            raise ValueError("method must be 'md5' or 'fast'")
        if interval_us <= 0:
            raise ValueError("interval_us must be > 0")
        self.key_cols = list(key_cols)
        self.ts_col = ts_col
        self.method = method
        self.columns = list(columns) if columns else None
        if self.columns:
            for c in self.key_cols + [ts_col]:
                if c not in self.columns:
                    self.columns.append(c)
        self.P = num_partitions
        self.sink = TwoPhaseSink(out_dir)
        self.actors = [ThrottleStateActor.remote(p, out_dir, interval_us)
                       for p in range(num_partitions)]
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
            self._restored_keys = sum(ray.get(
                [ac.restore.remote(checkpoint_dir, doc["epoch"])
                 for ac in self.actors]))

    def reshard_from(self, old_dir: str) -> dict:
        """Re-bucket a checkpoint taken at a different partition count
        (contract of StreamingDedupJob.reshard_from; latest-wins value
        resolution per key rides the epoch-ordered increments)."""
        import glob as _glob
        import json
        import os

        if not self.checkpoint_dir:
            raise ValueError("reshard_from requires checkpoint_dir on "
                             "the new job")
        with open(os.path.join(old_dir, "checkpoint.json")) as f:
            doc = json.load(f)
        epoch = doc["epoch"]
        paths = [p for p in sorted(_glob.glob(
            os.path.join(old_dir, "keys-*-epoch-*.parquet")))
            if int(p.rsplit("-epoch-", 1)[1].split(".")[0]) <= epoch]
        old_parts = {int(os.path.basename(p).split("-")[1])
                     for p in paths}
        if paths:
            # epoch-order increments: latest wins per key
            tbls = [pq.read_table(p) for p in sorted(
                paths, key=lambda p: int(
                    p.rsplit("-epoch-", 1)[1].split(".")[0]))]
            run_of = np.concatenate([np.full(t.num_rows, i, np.int64)
                                     for i, t in enumerate(tbls)])
            t = pa.concat_tables(tbls, promote_options="default")
            a = t.column("fp0").to_numpy(zero_copy_only=False).view(
                np.uint64)
            b = t.column("fp1").to_numpy(zero_copy_only=False).view(
                np.uint64)
            v = t.column("last_ts").to_numpy(zero_copy_only=False)
            o = np.lexsort((run_of, b, a))
            a, b, v = a[o], b[o], v[o]
            last = np.ones(len(a), dtype=bool)
            last[:-1] = (a[1:] != a[:-1]) | (b[1:] != b[:-1])
            a, b, v = a[last], b[last], v[last]
        else:
            a = b = np.empty(0, np.uint64)
            v = np.empty(0, np.int64)
        ids = (a % np.uint64(self.P)).astype(np.int64)
        order = np.argsort(ids, kind="stable")
        bounds = np.searchsorted(ids[order], np.arange(self.P + 1))
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        for q in range(self.P):
            sel = order[bounds[q]:bounds[q + 1]]
            final = os.path.join(
                self.checkpoint_dir,
                f"keys-{q:04d}-epoch-{epoch:06d}.parquet")
            tmp = final + ".tmp"
            pq.write_table(pa.table({
                "fp0": pa.array(a[sel].view(np.int64)),
                "fp1": pa.array(b[sel].view(np.int64)),
                "last_ts": pa.array(v[sel])}), tmp)
            os.replace(tmp, final)
        cursor = os.path.join(self.checkpoint_dir, "checkpoint.json")
        tmp = cursor + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"epoch": epoch, "num_partitions": self.P}, f)
        os.replace(tmp, cursor)
        self._resume_cursor = epoch
        self._restored_keys = sum(ray.get(
            [ac.restore.remote(self.checkpoint_dir, epoch)
             for ac in self.actors]))
        return {"epoch": epoch, "old_partitions": len(old_parts),
                "new_partitions": self.P, "keys": int(len(a))}

    def _submit_epoch(self, files_or_tables: Sequence):
        self.epoch += 1
        if self.epoch <= self._resume_cursor:
            self._file_seq += len(files_or_tables)
            return (self.epoch, None, None, self._file_seq)
        preps = []
        for f in files_or_tables:
            preps.append(_throttle_prep.options(
                num_returns=self.P).remote(
                [f], self.columns, self.key_cols, self.ts_col,
                self.method, self.P, self._file_seq))
            self._file_seq += 1
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
        # snapshot file_seq NOW: with pipelined submission
        # (max_inflight > 0) later epochs bump self._file_seq before
        # this epoch drains, so the cursor must record the submit-time
        # value, not drain-time state (ADVICE r4)
        return (self.epoch, acks, ckpt, self._file_seq)

    def _drain_epoch(self, pending) -> dict:
        import json
        import os

        epoch, acks, ckpt, file_seq = pending
        if acks is None:
            m = {"epoch": epoch, "rows_in": 0, "rows_out": 0,
                 "state_records": None, "skipped": True}
            self.metrics.append(m)
            return m
        stats = ray.get(acks)
        m = {"epoch": epoch,
             "rows_in": sum(s["rows_in"] for s in stats),
             "rows_out": sum(s["rows_out"] for s in stats),
             "state_records": sum(s["state_records"] for s in stats)}
        self.metrics.append(m)
        self.sink.commit_epoch(epoch)
        if ckpt is not None:
            ray.get(ckpt)
            cursor = os.path.join(self.checkpoint_dir, "checkpoint.json")
            tmp = cursor + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"epoch": epoch,
                           "file_seq": file_seq}, f)
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
                flush(max_inflight)
        if batch:
            pending.append(self._submit_epoch(batch))
        flush(0)

    def result(self) -> pa.Table:
        return self.sink.read_committed()

    def finish(self) -> dict:
        """run() already drains every epoch; kept for the common job
        CLI shape (dedup/neardup call finish for the summary)."""
        return self.summary()

    def summary(self) -> dict:
        real = [m for m in self.metrics if not m.get("skipped")]
        return {
            "epochs": len(self.metrics),
            "rows_in": sum(m["rows_in"] for m in self.metrics),
            "rows_out": sum(m["rows_out"] for m in self.metrics),
            "state_records": (real[-1]["state_records"] if real else 0),
        }
