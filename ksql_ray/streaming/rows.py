"""Streaming per-key row jobs: label transitions and running z-score
anomaly detection over a micro-batch stream with per-key carry state.

Two continuous questions a transcript-ingest pipeline asks that the
windowed aggregate jobs (streaming/driver.py) cannot express, because
each row's answer depends on the PREVIOUS row(s) of its key, not on a
window bucket:

* ``StreamingTransitionsJob`` — the per-key Markov transition matrix
  ``(from_label, to_label) -> count`` (role -> role turn-taking, event
  funnel edges), maintained on ingest. Equivalent bounded SQL:
  ``LAG(label) OVER (PARTITION BY key ORDER BY ord)`` + GROUP BY
  (ops/rows.py:transition_counts is the bounded twin).
* ``StreamingAnomalyJob`` — per-row z-scores against the key's state
  BEFORE the row (running n/sum/sumsq prefix), i.e.
  ``(x - AVG(x) OVER w) / STDDEV_SAMP(x) OVER w`` with
  ``w = (PARTITION BY key ORDER BY ord ROWS BETWEEN UNBOUNDED
  PRECEDING AND 1 PRECEDING)`` — the standard streaming outlier /
  drift alarm, with O(1) state per key.

Physical plan (mirrors StreamingTopKJob / StreamingDedupJob,
SURVEY.md §4): stateless prep tasks read each micro-batch file,
project the needed columns and hash-partition rows by key
(``num_returns=P`` point-to-point routing); P state actors each own
their key partition's carry state. Every key lives in exactly one
partition, so per-partition answers compose exactly.

Ordering contract (same as streaming CEP/as-of): files arrive in
event-time order; WITHIN an epoch rows may be disordered (the actor
sorts its epoch slice by (key, ord)), but a row whose ord precedes
its key's carry cursor is LATE — it is counted in ``late_rows`` and
dropped, never silently mis-attributed. With in-order replay (the
oracle-gated configuration) ``late_rows == 0`` and the stream answer
equals the bounded SQL bit-for-bit.

State per key: transitions carry (last ord, last label) ~= 24 B;
anomaly carries (n, sum, sumsq, last ord) = 32 B — both bounded by
the key universe of the partition, checkpointed full-snapshot
two-phase per (partition, epoch) like the top-k job (the snapshot is
one row per key — at 10^9 conversations / 256 partitions that is a
~100 MB parquet per partition, written only every
``checkpoint_every`` epochs). Anomaly emissions go to an
epoch-stamped idempotent sink directory when ``sink_dir`` is given
(exactly-once under resume, like streaming/neardup.py's survivor
writer); otherwise they accumulate in the actor (test scale only).

Reference semantics: the ksql reference expresses neither LAG nor
window frames (builder surface only, query.go); these jobs extend the
engine the same way the sketch jobs do, with DuckDB window-function
oracles pinning correctness.
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
from .topk import _key_strings

__all__ = ["StreamingTransitionsJob", "StreamingAnomalyJob"]


@ray.remote
def _rows_prep(inputs, columns, key_cols, num_partitions: int):
    """Read -> project -> hash-partition rows by composite key.
    Returns P per-partition row slices (``num_returns=P``); the key
    string is materialized once here so the actor never recomputes
    it."""
    import pandas as pd

    limit_worker_threads()
    tbls = []
    for x in inputs:
        batch = x if isinstance(x, pa.Table) else pq.read_table(
            x, columns=columns)
        tbls.append(batch)
    t = tbls[0] if len(tbls) == 1 else pa.concat_tables(tbls)
    keys = _key_strings(t, key_cols)
    t = t.drop_columns([c for c in t.column_names if c == "__key"])
    t = t.append_column("__key", keys)
    part = (pd.util.hash_array(keys.to_numpy(zero_copy_only=False))
            % np.uint64(num_partitions)).astype(np.int64)
    slices = []
    for p in range(num_partitions):
        idx = np.flatnonzero(part == p)
        slices.append(t.take(idx) if len(idx) < t.num_rows else t)
    return slices[0] if num_partitions == 1 else tuple(slices)


def _sorted_epoch(parts, ord_col: str) -> pa.Table | None:
    tbls = [p for p in parts if p is not None and p.num_rows]
    if not tbls:
        return None
    t = tbls[0] if len(tbls) == 1 else pa.concat_tables(tbls)
    return t.take(pc.sort_indices(
        t, sort_keys=[("__key", "ascending"), (ord_col, "ascending")]))


def _segment_starts(keys: np.ndarray) -> np.ndarray:
    """Index of the first row of each (key-sorted) segment, per row."""
    n = len(keys)
    new = np.r_[True, keys[1:] != keys[:-1]]
    starts = np.flatnonzero(new)
    return starts[np.cumsum(new) - 1]


class _CkptMixin:
    """Two-phase snapshot + cursor plumbing shared by both jobs."""

    def _ckpt_write(self, tag: str, epoch: int, ckpt_dir: str,
                    table: pa.Table) -> None:
        os.makedirs(ckpt_dir, exist_ok=True)
        final = os.path.join(
            ckpt_dir,
            f"{tag}-{self.part_id:04d}-epoch-{epoch:06d}.parquet")
        if not os.path.exists(final):
            tmp = final + ".tmp"
            pq.write_table(table, tmp)
            os.replace(tmp, final)

    def _ckpt_latest(self, tag: str, ckpt_dir: str,
                     upto_epoch: int) -> pa.Table | None:
        import glob

        best = None
        for p in sorted(glob.glob(os.path.join(
                ckpt_dir,
                f"{tag}-{self.part_id:04d}-epoch-*.parquet"))):
            e = int(p.rsplit("-epoch-", 1)[1].split(".")[0])
            if e <= upto_epoch:
                best = p
        return pq.read_table(best) if best else None


@ray.remote
class TransitionsStateActor(_CkptMixin):
    """One key partition: (from,to) pair counts + per-key carry of the
    last (ord, label)."""

    def __init__(self, part_id: int, ord_col: str, label_col: str):
        limit_worker_threads()
        import pandas as pd

        self.part_id = part_id
        self.ord_col = ord_col
        self.label_col = label_col
        self.counts = pd.Series(dtype=np.int64)   # MultiIndex (from,to)
        self.carry_ord = pd.Series(dtype=np.int64)    # key -> last ord
        self.carry_lab = pd.Series(dtype=object)      # key -> last label
        self.late_rows = 0
        self.rows_in = 0

    def process(self, epoch: int, *parts) -> dict:
        import pandas as pd

        t = _sorted_epoch(parts, self.ord_col)
        if t is None:
            return {"rows_in": 0, "late": 0, "keys": len(self.carry_lab)}
        self.rows_in += t.num_rows
        keys = t.column("__key").to_numpy(zero_copy_only=False)
        ordv = pc.cast(t.column(self.ord_col), pa.int64()).to_numpy(
            zero_copy_only=False)
        lab_col = t.column(self.label_col)
        lab = lab_col.to_numpy(zero_copy_only=False)
        valid = pc.is_valid(lab_col).combine_chunks().to_numpy(
            zero_copy_only=False)
        seg = _segment_starts(keys)
        first = seg == np.arange(len(keys))
        # late fence: a row at/before its key's carry cursor is late —
        # counted and dropped so it never produces an out-of-order
        # edge. Within a segment ord is ascending, so the late rows
        # are exactly the prefix with ord <= carry.
        cin_ord = self.carry_ord.reindex(keys[first]).to_numpy(
            dtype=np.float64, na_value=np.nan)
        base = np.where(np.isnan(cin_ord), -2**62, cin_ord)[
            np.cumsum(first) - 1]
        late = ordv <= base
        n_late = int(late.sum())
        if n_late:
            self.late_rows += n_late
            keep = ~late
            keys, ordv, lab, valid = (keys[keep], ordv[keep], lab[keep],
                                      valid[keep])
            if len(keys) == 0:
                return {"rows_in": t.num_rows, "late": n_late,
                        "keys": len(self.carry_lab)}
            seg = _segment_starts(keys)
            first = seg == np.arange(len(keys))
        prev = np.empty(len(keys), object)
        prev[1:] = lab[:-1]
        prev_ok = np.r_[False, valid[:-1]] & ~first
        cl = self.carry_lab.reindex(keys[first])
        prev[first] = cl.to_numpy()
        prev_ok[first] = cl.notna().to_numpy()
        m = prev_ok & valid
        if m.any():
            df = pd.DataFrame({"f": prev[m], "t": lab[m]})
            inc = df.groupby(["f", "t"], sort=False).size()
            if len(self.counts) == 0:
                self.counts = inc.astype(np.int64)
            else:
                self.counts = self.counts.add(
                    inc, fill_value=0).astype(np.int64)
        # update carry with the last PHYSICAL row per key — SQL's
        # LAG(label) sees physical rows, so a trailing null label is
        # carried as null (its outgoing edge is then filtered by the
        # from_label IS NOT NULL rule, exactly as the oracle does).
        last = np.r_[first[1:], True]
        lk = keys[last]
        self.carry_ord = pd.concat(
            [self.carry_ord[~self.carry_ord.index.isin(lk)],
             pd.Series(ordv[last], index=lk)])
        lv = np.where(valid[last], lab[last], None)
        self.carry_lab = pd.concat(
            [self.carry_lab[~self.carry_lab.index.isin(lk)],
             pd.Series(lv, index=lk, dtype=object)])
        return {"rows_in": t.num_rows, "late": n_late,
                "keys": len(self.carry_lab)}

    def summary(self) -> pa.Table:
        if len(self.counts) == 0:
            return pa.table({"from_label": pa.array([], pa.string()),
                             "to_label": pa.array([], pa.string()),
                             "cnt": pa.array([], pa.int64())})
        idx = self.counts.index
        return pa.table({
            "from_label": pa.array(idx.get_level_values(0), pa.string()),
            "to_label": pa.array(idx.get_level_values(1), pa.string()),
            "cnt": pa.array(self.counts.to_numpy(), pa.int64()),
        })

    def checkpoint(self, epoch: int, ckpt_dir: str) -> None:
        self._ckpt_write("trans-counts", epoch, ckpt_dir, self.summary())
        keys = self.carry_ord.index.to_numpy(dtype=object)
        carry = pa.table({
            "key": pa.array(keys, pa.string()),
            "ord": pa.array(self.carry_ord.to_numpy(), pa.int64()),
            "label": pa.array(
                self.carry_lab.reindex(keys).to_numpy(dtype=object),
                pa.string()),
        })
        self._ckpt_write("trans-carry", epoch, ckpt_dir, carry)

    def restore(self, ckpt_dir: str, upto_epoch: int) -> int:
        import pandas as pd

        self.counts = pd.Series(dtype=np.int64)
        self.carry_ord = pd.Series(dtype=np.int64)
        self.carry_lab = pd.Series(dtype=object)
        c = self._ckpt_latest("trans-counts", ckpt_dir, upto_epoch)
        if c is not None and c.num_rows:
            self.counts = pd.Series(
                c.column("cnt").to_numpy(zero_copy_only=False),
                index=pd.MultiIndex.from_arrays(
                    [c.column("from_label").to_numpy(zero_copy_only=False),
                     c.column("to_label").to_numpy(zero_copy_only=False)],
                    names=["f", "t"]))
        k = self._ckpt_latest("trans-carry", ckpt_dir, upto_epoch)
        if k is not None and k.num_rows:
            kk = k.column("key").to_numpy(zero_copy_only=False)
            self.carry_ord = pd.Series(
                k.column("ord").to_numpy(zero_copy_only=False), index=kk)
            self.carry_lab = pd.Series(
                k.column("label").to_numpy(zero_copy_only=False),
                index=kk, dtype=object)
        return int(len(self.carry_ord))


@ray.remote
class AnomalyStateActor(_CkptMixin):
    """One key partition of running (n, sum, sumsq) prefix state; emits
    per-row z-scores against the state BEFORE each row."""

    def __init__(self, part_id: int, ord_col: str, val_col: str,
                 min_n: int, threshold: float | None,
                 sink_dir: str | None):
        limit_worker_threads()
        import pandas as pd

        self.part_id = part_id
        self.ord_col = ord_col
        self.val_col = val_col
        self.min_n = min_n
        self.threshold = threshold
        self.sink_dir = sink_dir
        self.state = pd.DataFrame(
            columns=["n", "s", "ss", "o"], dtype=np.float64)
        self.emitted: list[pa.Table] = []
        self.late_rows = 0
        self.rows_in = 0

    def process(self, epoch: int, *parts) -> dict:
        import pandas as pd

        t = _sorted_epoch(parts, self.ord_col)
        if t is None:
            self._sink(epoch, None)
            return {"rows_in": 0, "late": 0, "emitted": 0,
                    "keys": len(self.state)}
        n0 = t.num_rows
        self.rows_in += n0
        keys = t.column("__key").to_numpy(zero_copy_only=False)
        ordv = pc.cast(t.column(self.ord_col), pa.int64()).to_numpy(
            zero_copy_only=False)
        x = pc.cast(t.column(self.val_col), pa.float64()).to_numpy(
            zero_copy_only=False)
        # NULL values: SQL COUNT(x)/AVG(x) OVER w skip them as inputs
        # but still produce an output row; a null x row has no z-score
        # and does not advance the sums. Track with a validity mask.
        ok = ~np.isnan(x)
        seg = _segment_starts(keys)
        first = seg == np.arange(len(keys))
        st = self.state.reindex(keys[first])
        # late fence (same rule as transitions)
        base = st["o"].fillna(-2**62).to_numpy()[np.cumsum(first) - 1]
        late = ordv <= base
        n_late = int(late.sum())
        if n_late:
            self.late_rows += n_late
            keep = ~late
            t = t.take(np.flatnonzero(keep))
            keys, ordv, x, ok = keys[keep], ordv[keep], x[keep], ok[keep]
            if len(keys) == 0:
                self._sink(epoch, None)
                return {"rows_in": n0, "late": n_late,
                        "emitted": 0, "keys": len(self.state)}
            seg = _segment_starts(keys)
            first = seg == np.arange(len(keys))
            st = self.state.reindex(keys[first])
        xz = np.where(ok, x, 0.0)
        c1 = np.cumsum(ok.astype(np.float64))
        cs = np.cumsum(xz)
        cq = np.cumsum(xz * xz)
        heads = np.cumsum(first) - 1
        cin_n = st["n"].fillna(0.0).to_numpy()[heads]
        cin_s = st["s"].fillna(0.0).to_numpy()[heads]
        cin_q = st["ss"].fillna(0.0).to_numpy()[heads]
        # exclusive prefix within the (key-sorted) epoch slice
        ex_n = cin_n + (c1 - ok) - (c1[seg] - ok[seg])
        ex_s = cin_s + (cs - xz) - (cs[seg] - xz[seg])
        ex_q = cin_q + (cq - xz * xz) - (cq[seg] - xz[seg] * xz[seg])
        with np.errstate(invalid="ignore", divide="ignore"):
            mean = ex_s / ex_n
            var = (ex_q - ex_s * ex_s / ex_n) / (ex_n - 1.0)
            var = np.maximum(var, 0.0)
            z = (x - mean) / np.sqrt(var)
        emit = ok & (ex_n >= self.min_n) & (var > 0)
        if self.threshold is not None:
            emit &= np.abs(z) > self.threshold
        out = None
        n_emit = int(emit.sum())
        if n_emit:
            idx = np.flatnonzero(emit)
            out = t.take(idx).drop_columns(["__key"])
            out = out.append_column(
                "n_before", pa.array(ex_n[idx].astype(np.int64)))
            out = out.append_column("zscore", pa.array(z[idx]))
        # fold the epoch totals back into per-key carry state
        last = np.r_[first[1:], True]
        lk = keys[last]
        upd = pd.DataFrame({
            "n": ex_n[last] + ok[last],
            "s": ex_s[last] + xz[last],
            "ss": ex_q[last] + xz[last] * xz[last],
            "o": ordv[last].astype(np.float64)}, index=lk)
        self.state = pd.concat(
            [self.state[~self.state.index.isin(lk)], upd])
        self._sink(epoch, out)
        return {"rows_in": n0, "late": n_late,
                "emitted": n_emit, "keys": len(self.state)}

    def _sink(self, epoch: int, out: pa.Table | None) -> None:
        if self.sink_dir is None:
            if out is not None:
                self.emitted.append(out)
            return
        if out is None:
            return
        os.makedirs(self.sink_dir, exist_ok=True)
        final = os.path.join(
            self.sink_dir,
            f"anomaly-{self.part_id:04d}-epoch-{epoch:06d}.parquet")
        if not os.path.exists(final):
            tmp = final + ".tmp"
            pq.write_table(out, tmp)
            os.replace(tmp, final)

    def result(self) -> pa.Table | None:
        if not self.emitted:
            return None
        return pa.concat_tables(self.emitted)

    def checkpoint(self, epoch: int, ckpt_dir: str) -> None:
        keys = self.state.index.to_numpy(dtype=object)
        snap = pa.table({
            "key": pa.array(keys, pa.string()),
            "n": pa.array(self.state["n"].to_numpy()),
            "s": pa.array(self.state["s"].to_numpy()),
            "ss": pa.array(self.state["ss"].to_numpy()),
            "o": pa.array(self.state["o"].to_numpy()),
        })
        self._ckpt_write("anom-state", epoch, ckpt_dir, snap)

    def restore(self, ckpt_dir: str, upto_epoch: int) -> int:
        import pandas as pd

        self.state = pd.DataFrame(
            columns=["n", "s", "ss", "o"], dtype=np.float64)
        c = self._ckpt_latest("anom-state", ckpt_dir, upto_epoch)
        if c is not None and c.num_rows:
            self.state = pd.DataFrame(
                {k: c.column(k).to_numpy(zero_copy_only=False)
                 for k in ("n", "s", "ss", "o")},
                index=c.column("key").to_numpy(zero_copy_only=False))
        return int(len(self.state))


class _RowsJobBase:
    """Epoch submit/drain/pipeline/checkpoint loop shared by the two
    jobs (same skeleton as StreamingTopKJob)."""

    def __init__(self, *, key_cols: Sequence[str], ord_col: str,
                 columns: Sequence[str] | None,
                 num_partitions: int, checkpoint_dir: str | None,
                 checkpoint_every: int, resume: bool, needed: list[str]):
        self.key_cols = list(key_cols)
        self.ord_col = ord_col
        self.columns = list(columns) if columns else None
        if self.columns:
            for c in [*self.key_cols, ord_col, *needed]:
                if c not in self.columns:
                    self.columns.append(c)
        self.P = num_partitions
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every = checkpoint_every
        self.epoch = -1
        self._resume_cursor = -1
        self.metrics: list[dict] = []
        self.actors = self._make_actors()
        cursor = (os.path.join(checkpoint_dir, "checkpoint.json")
                  if checkpoint_dir else None)
        if resume and cursor and os.path.exists(cursor):
            with open(cursor) as f:
                doc = json.load(f)
            self._resume_cursor = doc["epoch"]
            self._restored = sum(ray.get(
                [a.restore.remote(checkpoint_dir, doc["epoch"])
                 for a in self.actors]))

    def _make_actors(self):          # pragma: no cover - abstract
        raise NotImplementedError

    def _submit_epoch(self, files_or_tables: Sequence):
        self.epoch += 1
        if self.epoch <= self._resume_cursor:
            return (self.epoch, None, None)
        preps = [_rows_prep.options(num_returns=self.P).remote(
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
            m = {"epoch": epoch, "rows_in": 0, "skipped": True}
            self.metrics.append(m)
            return m
        stats = ray.get(acks)
        m = {"epoch": epoch,
             "rows_in": sum(s["rows_in"] for s in stats),
             "late": sum(s["late"] for s in stats),
             "keys": sum(s["keys"] for s in stats)}
        if "emitted" in stats[0]:
            m["emitted"] = sum(s["emitted"] for s in stats)
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

    def finish(self) -> dict:
        live = [m for m in self.metrics if not m.get("skipped")]
        return {"epochs": self.epoch + 1,
                "rows_in": sum(m["rows_in"] for m in live),
                "late_rows": sum(m.get("late", 0) for m in live),
                "keys": live[-1]["keys"] if live else getattr(
                    self, "_restored", 0)}


class StreamingTransitionsJob(_RowsJobBase):
    """Continuous per-key label transition counts. ``transitions()``
    returns the global (from_label, to_label, cnt) matrix, sorted."""

    def reshard_from(self, old_dir: str) -> dict:
        """Rescale a transitions checkpoint: the (from, to, cnt) matrix
        is additive (redistribute + sum); the per-key carry rows
        re-route by the same combined-key hash the prep uses."""
        from .rescale import (hash_str_route, reshard_snapshots,
                              transitions_counts_combine)

        return reshard_snapshots(self, old_dir, specs=[
            ("trans-counts", None, transitions_counts_combine),
            ("trans-carry", hash_str_route("key"), None),
        ])

    def __init__(self, *, key_cols: Sequence[str], ord_col: str,
                 label_col: str, columns: Sequence[str] | None = None,
                 num_partitions: int = 8,
                 checkpoint_dir: str | None = None,
                 checkpoint_every: int = 0, resume: bool = False):
        self.label_col = label_col
        super().__init__(key_cols=key_cols, ord_col=ord_col,
                         columns=columns, num_partitions=num_partitions,
                         checkpoint_dir=checkpoint_dir,
                         checkpoint_every=checkpoint_every,
                         resume=resume, needed=[label_col])

    def _make_actors(self):
        return [TransitionsStateActor.remote(
            p, self.ord_col, self.label_col) for p in range(self.P)]

    def transitions(self) -> pa.Table:
        # keys are disjoint across partitions but (from,to) label PAIRS
        # are not — merge with one final group-sum over the tiny
        # per-partition matrices (|labels|^2 rows each).
        tabs = ray.get([a.summary.remote() for a in self.actors])
        t = pa.concat_tables(tabs)
        g = t.group_by(["from_label", "to_label"]).aggregate(
            [("cnt", "sum")])
        g = g.rename_columns(["from_label", "to_label", "cnt"])
        g = g.set_column(2, "cnt", pc.cast(g.column("cnt"), pa.int64()))
        idx = pc.sort_indices(g, sort_keys=[
            ("from_label", "ascending"), ("to_label", "ascending")])
        return g.take(idx)


class StreamingAnomalyJob(_RowsJobBase):
    """Continuous per-key running z-score detection. ``result()``
    returns every emitted row with ``n_before`` and ``zscore``
    appended (rows whose key had >= min_n prior values and positive
    variance; |z| > threshold when a threshold is set)."""

    def reshard_from(self, old_dir: str) -> dict:
        """Rescale an anomaly checkpoint: per-key running moments
        re-route by the same combined-key hash the prep uses."""
        from .rescale import hash_str_route, reshard_snapshots

        return reshard_snapshots(self, old_dir, "anom-state",
                                 route=hash_str_route("key"))

    def __init__(self, *, key_cols: Sequence[str], ord_col: str,
                 val_col: str, columns: Sequence[str] | None = None,
                 min_n: int = 8, threshold: float | None = 3.0,
                 sink_dir: str | None = None, num_partitions: int = 8,
                 checkpoint_dir: str | None = None,
                 checkpoint_every: int = 0, resume: bool = False):
        self.val_col = val_col
        self.min_n = min_n
        self.threshold = threshold
        self.sink_dir = sink_dir
        super().__init__(key_cols=key_cols, ord_col=ord_col,
                         columns=columns, num_partitions=num_partitions,
                         checkpoint_dir=checkpoint_dir,
                         checkpoint_every=checkpoint_every,
                         resume=resume, needed=[val_col])

    def _make_actors(self):
        return [AnomalyStateActor.remote(
            p, self.ord_col, self.val_col, self.min_n, self.threshold,
            self.sink_dir) for p in range(self.P)]

    def result(self) -> pa.Table:
        if self.sink_dir is not None:
            import glob

            files = sorted(glob.glob(
                os.path.join(self.sink_dir, "anomaly-*.parquet")))
            tabs = [pq.read_table(f) for f in files]
        else:
            tabs = [x for x in ray.get(
                [a.result.remote() for a in self.actors])
                if x is not None]
        if not tabs:
            return None
        return pa.concat_tables(tabs)
