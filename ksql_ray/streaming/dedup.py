"""Streaming exact deduplication: keep the FIRST occurrence of every
document key across an unbounded micro-batch stream (dedup-on-ingest —
the streaming counterpart of ``ops/dedup.exact_dedup_keys``).

The reference has no dedup beyond ``COLLECT_SET``/``TOPK_DISTINCT``
(aggregates.go); this is the ingestion-side operator a training-data
pipeline runs continuously so duplicates never reach storage.

Shape (mirrors ``StreamingJob``'s physical plan, SURVEY.md §4):

* stateless prep tasks fingerprint each micro-batch file (128-bit key:
  md5 of the whitespace-normalized lowercase text — the oracle form —
  or the vectorized ``pd.util.hash_array`` pair for the scale path),
  hash-partition rows by fingerprint, and return P per-partition slices
  (``num_returns=P`` point-to-point routing: actor p fetches only its
  own slice);
* P ``DedupStateActor``s hold the seen-key set for their partition as
  an LSM-style list of SORTED uint64-pair runs: membership is one
  ``np.searchsorted`` per run (vectorized over the whole batch), each
  epoch appends its new keys as one pre-sorted run, and runs compact
  geometrically — per-epoch cost stays O(batch log state), never a
  re-sort of the full state. State memory is 16 B/key/partition, spread
  across the cluster by P.
* surviving rows go to the idempotent two-phase sink as one
  (partition, epoch) Parquet file; replays of committed epochs are
  skipped by the sink, and a from-scratch replay recomputes bit-equal
  output (processing is deterministic in (epoch, file, row) order).

First-occurrence order is TOTAL and deterministic: (epoch, file index
within the stream, row index within the file) — two copies of a key in
the same epoch keep the earlier (file, row); a copy in a later epoch is
dropped by the state check. Null text rows share one key (SQL
``PARTITION BY md5(text)`` groups NULLs together — same semantics).
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

_WS = r"\s+"
_INTERNAL = ["__fp0", "__fp1", "__ord", "__part"]
_MAX_ROWS_PER_FILE = 1 << 40
_COMPACT_RUNS = 12


def _fingerprint_u64(texts: pa.ChunkedArray | pa.Array,
                     method: str) -> tuple[np.ndarray, np.ndarray]:
    """128-bit fingerprint of normalized text as two uint64 arrays.
    Nulls map to the (0, 0) sentinel so all null-text rows share one
    key."""
    t = pc.utf8_trim_whitespace(pc.replace_substring_regex(
        pc.utf8_lower(texts), _WS, " "))
    arr = t.combine_chunks() if isinstance(t, pa.ChunkedArray) else t
    if method == "fast":
        import pandas as pd

        np_t = arr.fill_null("").to_numpy(zero_copy_only=False)
        a = pd.util.hash_array(np_t, hash_key="ksql_ray_fprint0").astype(np.uint64)
        b = pd.util.hash_array(np_t, hash_key="ksql_ray_fprint1").astype(np.uint64)
    elif method == "md5":
        # oracle form; per-row md5 is the declared cost of SQL-equality
        # (the fast path above is the scale path, same dedup semantics)
        vals = arr.to_pylist()
        a = np.zeros(len(vals), dtype=np.uint64)
        b = np.zeros(len(vals), dtype=np.uint64)
        for i, v in enumerate(vals):
            if v is None:
                continue
            d = hashlib.md5(v.encode("utf-8")).digest()
            a[i] = int.from_bytes(d[:8], "big")
            b[i] = int.from_bytes(d[8:], "big")
    else:
        raise ValueError("method must be 'md5' or 'fast'")
    null_mask = np.asarray(arr.is_null())
    a[null_mask] = 0
    b[null_mask] = 0
    return a, b


@ray.remote
def _dedup_prep(inputs, columns, text_col: str, method: str,
                num_partitions: int, file_seq0: int,
                pre_transform=None):
    """Read -> [pre_transform] -> fingerprint -> hash-partition one
    epoch's files; returns P per-partition slices (invoked with
    ``num_returns=P``). ``pre_transform`` (a batch -> batch callable,
    e.g. pipelines/prep.prep_batch) runs BEFORE fingerprinting, so a
    normalize -> quality-filter -> dedup prep chain executes in the
    same ingest pass; it may drop and rewrite rows but must keep
    ``text_col``."""
    limit_worker_threads()
    tables = []
    for i, x in enumerate(inputs):
        batch = x if isinstance(x, pa.Table) else pq.read_table(
            x, columns=columns)
        if pre_transform is not None:
            batch = pre_transform(batch)
        a, b = _fingerprint_u64(batch.column(text_col), method)
        n = batch.num_rows
        if n >= _MAX_ROWS_PER_FILE:
            raise ValueError("micro-batch file exceeds 2^40 rows")
        ordv = ((file_seq0 + i) << 40) + np.arange(n, dtype=np.int64)
        batch = batch.append_column("__fp0", pa.array(a.view(np.int64)))
        batch = batch.append_column("__fp1", pa.array(b.view(np.int64)))
        batch = batch.append_column("__ord", pa.array(ordv))
        batch = batch.append_column("__part", pa.array(
            (a % np.uint64(num_partitions)).astype(np.int64)))
        tables.append(batch)
    out = tables[0] if len(tables) == 1 else pa.concat_tables(
        tables, promote_options="permissive")
    slices = _split_by_part(out, num_partitions)
    return slices[0] if num_partitions == 1 else tuple(slices)


@ray.remote
class DedupStateActor:
    """One fingerprint-hash partition of the seen-key set + its own
    sink writer. Checkpoints are INCREMENTAL: only keys added since the
    last checkpoint are written (the full seen-set never re-ships —
    unlike aggregate state it grows monotonically forever), so a
    checkpoint costs O(new keys), not O(state)."""

    def __init__(self, part_id: int, sink_dir: str):
        limit_worker_threads()
        self.part_id = part_id
        self.sink = TwoPhaseSink(sink_dir)
        # LSM-style sorted runs of (fp0, fp1) uint64 pairs
        self.runs: list[tuple[np.ndarray, np.ndarray]] = []
        self._pending: list[tuple[np.ndarray, np.ndarray]] = []

    def _seen(self, a: np.ndarray, b: np.ndarray) -> np.ndarray:
        dup = np.zeros(len(a), dtype=bool)
        for ra, rb in self.runs:
            lo = np.searchsorted(ra, a, "left")
            hi = np.searchsorted(ra, a, "right")
            one = np.flatnonzero((hi - lo == 1) & ~dup)
            dup[one] |= rb[lo[one]] == b[one]
            # fp0 collisions between DISTINCT 128-bit keys inside one run
            # are ~n^2/2^64 — the loop below runs essentially never
            for j in np.flatnonzero((hi - lo > 1) & ~dup):
                seg = rb[lo[j]:hi[j]]
                k = np.searchsorted(seg, b[j])
                dup[j] = k < len(seg) and seg[k] == b[j]
        return dup

    def _add_run(self, na: np.ndarray, nb: np.ndarray) -> None:
        if len(na):
            self.runs.append((na, nb))
        if len(self.runs) > _COMPACT_RUNS:
            ca = np.concatenate([r[0] for r in self.runs])
            cb = np.concatenate([r[1] for r in self.runs])
            o = np.lexsort((cb, ca))
            self.runs = [(ca[o], cb[o])]

    def process(self, epoch: int, *parts) -> dict:
        tbls = [p for p in parts if p is not None and p.num_rows]
        if not tbls:
            return {"rows_in": 0, "rows_out": 0, "state_keys": sum(
                len(r[0]) for r in self.runs)}
        tbl = tbls[0] if len(tbls) == 1 else pa.concat_tables(
            tbls, promote_options="permissive")
        a = tbl.column("__fp0").to_numpy(zero_copy_only=False).view(np.uint64)
        b = tbl.column("__fp1").to_numpy(zero_copy_only=False).view(np.uint64)
        ordv = tbl.column("__ord").to_numpy(zero_copy_only=False)
        dup = self._seen(a, b)
        # intra-epoch keep-first: (fp, arrival) sort, first of each key
        # segment survives; the kept keys come out already (fp0,fp1)-sorted
        order = np.lexsort((ordv, b, a))
        a_s, b_s = a[order], b[order]
        first = np.ones(len(order), dtype=bool)
        first[1:] = (a_s[1:] != a_s[:-1]) | (b_s[1:] != b_s[:-1])
        keep_sorted = first & ~dup[order]
        na, nb = a_s[keep_sorted].copy(), b_s[keep_sorted].copy()
        self._add_run(na, nb)
        if len(na):
            self._pending.append((na, nb))
        keep_idx = order[keep_sorted]
        keep_idx = keep_idx[np.argsort(ordv[keep_idx], kind="stable")]
        out = tbl.take(pa.array(keep_idx)).drop_columns(_INTERNAL)
        if out.num_rows:
            self.sink.write(self.part_id, epoch, out)
        return {"rows_in": tbl.num_rows, "rows_out": int(len(keep_idx)),
                "state_keys": sum(len(r[0]) for r in self.runs)}

    def checkpoint(self, epoch: int, ckpt_dir: str) -> None:
        """Persist the keys added since the last checkpoint (two-phase,
        idempotent by filename)."""
        import os

        os.makedirs(ckpt_dir, exist_ok=True)
        final = os.path.join(
            ckpt_dir, f"keys-{self.part_id:04d}-epoch-{epoch:06d}.parquet")
        if not os.path.exists(final):
            a = (np.concatenate([p[0] for p in self._pending])
                 if self._pending else np.empty(0, np.uint64))
            b = (np.concatenate([p[1] for p in self._pending])
                 if self._pending else np.empty(0, np.uint64))
            tmp = final + ".tmp"
            pq.write_table(pa.table({
                "fp0": pa.array(a.view(np.int64)),
                "fp1": pa.array(b.view(np.int64))}), tmp)
            import os as _os

            _os.replace(tmp, final)
        self._pending = []

    def restore(self, ckpt_dir: str, upto_epoch: int) -> int:
        """Rebuild the seen-set from every checkpointed increment
        <= ``upto_epoch``; returns the number of restored keys."""
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
        t = pa.concat_tables(parts)
        a = t.column("fp0").to_numpy(zero_copy_only=False).view(np.uint64)
        b = t.column("fp1").to_numpy(zero_copy_only=False).view(np.uint64)
        o = np.lexsort((b, a))
        self.runs = [(a[o], b[o])]
        return int(len(a))


class StreamingDedupJob:
    """Continuous exact dedup over a micro-batch Parquet stream.

    Epochs are processed in order (first-occurrence state is inherently
    sequential); prep within an epoch fans out per the task, and the
    actor layer is the same P-way hash-partitioned shape as
    ``StreamingJob`` — on a multi-node cluster each partition's slice
    routes point-to-point to its actor.
    """

    def __init__(self, out_dir: str, *, text_col: str = "text",
                 method: str = "md5", columns: list[str] | None = None,
                 num_partitions: int = 8, checkpoint_dir: str | None = None,
                 checkpoint_every: int = 0, resume: bool = False,
                 pre_transform=None):
        import json
        import os

        if method not in ("md5", "fast"):
            raise ValueError("method must be 'md5' or 'fast'")
        self.text_col = text_col
        self.method = method
        self.pre_transform = pre_transform
        self.columns = list(columns) if columns else None
        if self.columns and text_col not in self.columns:
            self.columns.append(text_col)
        self.P = num_partitions
        self.sink = TwoPhaseSink(out_dir)
        self.actors = [DedupStateActor.remote(p, out_dir)
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
                [a.restore.remote(checkpoint_dir, doc["epoch"])
                 for a in self.actors]))
            # the caller re-feeds the stream from the start: epochs <=
            # cursor only advance the deterministic file counter (their
            # keys are restored; their sink files already exist)

    def reshard_from(self, old_dir: str) -> dict:
        """Re-shard a dedup checkpoint taken at a DIFFERENT partition
        count into this job's ``checkpoint_dir`` / ``P`` (the N -> 4N
        cluster-rescale path, same contract as
        ``StreamingJob.reshard_from``). Every seen key lives in exactly
        one old partition (routing is ``fp0 % P``), so resharding is
        pure re-bucketing: all increment files <= the cursor epoch are
        read, keys re-routed by ``fp0 % new_P``, and ONE consolidated
        increment per new partition is written at the cursor epoch
        (restore reads every increment <= cursor, so a single file
        satisfies it). Reshard an in-flight job's checkpoint, not a
        finished one. Adopts the new checkpoint immediately (no
        ``resume=True`` needed). Returns {epoch, old_partitions,
        new_partitions, keys}."""
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
        tbls = [pq.read_table(p) for p in paths]
        if tbls:
            t = pa.concat_tables(tbls, promote_options="default")
            a = t.column("fp0").to_numpy(zero_copy_only=False).view(
                np.uint64)
            b = t.column("fp1").to_numpy(zero_copy_only=False).view(
                np.uint64)
        else:
            a = b = np.empty(0, np.uint64)
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
                "fp1": pa.array(b[sel].view(np.int64))}), tmp)
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
        """Submit one epoch without waiting. Per-actor task-queue order
        serializes epochs inside each state actor, so several epochs can
        be in flight (prep of epoch e+1 overlaps state work of epoch e)
        while first-occurrence semantics stay exactly sequential."""
        self.epoch += 1
        if self.epoch <= self._resume_cursor:
            self._file_seq += len(files_or_tables)
            return (self.epoch, None, None)
        # one prep task per file: fingerprinting is the epoch's compute,
        # so it fans out across the cluster; each task returns P slices
        # routed point-to-point (actor p fetches only its own slices)
        preps = []
        for f in files_or_tables:
            preps.append(_dedup_prep.options(num_returns=self.P).remote(
                [f], self.columns, self.text_col, self.method, self.P,
                self._file_seq, self.pre_transform))
            self._file_seq += 1
        parts = ([[r] for r in preps] if self.P == 1
                 else [list(r) for r in preps])
        acks = [self.actors[p].process.remote(
            self.epoch, *[parts[i][p] for i in range(len(preps))])
            for p in range(self.P)]
        ckpt = None
        if (self.checkpoint_dir and self.checkpoint_every
                and (self.epoch + 1) % self.checkpoint_every == 0):
            # enqueued right behind process: the snapshot reflects
            # exactly this epoch
            ckpt = [a.checkpoint.remote(self.epoch, self.checkpoint_dir)
                    for a in self.actors]
        return (self.epoch, acks, ckpt)

    def _drain_epoch(self, pending) -> dict:
        import json
        import os

        epoch, acks, ckpt = pending
        if acks is None:  # skipped on resume
            m = {"epoch": epoch, "rows_in": 0, "rows_out": 0,
                 "state_keys": None, "skipped": True}
            self.metrics.append(m)
            return m
        stats = ray.get(acks)
        m = {"epoch": epoch,
             "rows_in": sum(s["rows_in"] for s in stats),
             "rows_out": sum(s["rows_out"] for s in stats),
             "state_keys": sum(s["state_keys"] for s in stats)}
        self.metrics.append(m)
        self.sink.commit_epoch(epoch)
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

    def finish(self) -> dict:
        keys = next((m["state_keys"] for m in reversed(self.metrics)
                     if m["state_keys"] is not None),
                    getattr(self, "_restored_keys", 0))
        return {"epochs": self.epoch + 1,
                "rows_in": sum(m["rows_in"] for m in self.metrics),
                "rows_out": sum(m["rows_out"] for m in self.metrics),
                "state_keys": keys}

    def result(self) -> pa.Table:
        return self.sink.read_committed()
