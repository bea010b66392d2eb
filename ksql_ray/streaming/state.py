"""Per-partition keyed window state (the streaming heart, north_rule).

One ``PartitionState`` per hash partition of the group key (canonically
``conv_id``), living inside a Ray actor across micro-batches. It consumes
vectorized phase-1 partials (exec/groupby.partial_fn /
sessionize_partial_fn output), so Python-level work is bounded by
*distinct keys per batch*, never raw rows.

Semantics:
* watermark = max event ts seen (this partition) − allowed lateness;
  monotone (north_rule 'monotone per-partition watermark derived from ts').
* a partial targeting a window already closed by the watermark is counted
  as a late drop (metric `late_drops`) and discarded — the ksqlDB
  grace-period model.
* EMIT CHANGES emits the current value of every (key, window) updated in
  the epoch; EMIT FINAL emits a window exactly once, when the watermark
  closes it (ksql/select_builder.go:231-245 semantics).
* session windows: per-key interval list; a new within-batch session
  partial merges into any open session within `gap` (merge is
  associative); closed when watermark > end + gap.

State is checkpointable: ``snapshot()`` -> picklable dict with the
watermark, accumulators and metrics; ``restore()`` reverses it
(per-partition lineage for resume, SURVEY.md §4 'Checkpoint / resume').
"""

from __future__ import annotations

import pickle
from typing import Any, Sequence

import pyarrow as pa

from ..aggregates import AggExpr
from ..windows import Hopping, Session, Tumbling, Window
from .accumulators import StreamingAcc, make_acc


class VectorPartitionState:
    """Vectorized keyed window state for TUMBLING/HOPPING (the scale
    path): state IS a merged-partial Arrow table (one row per open
    (key, window)); each epoch's transition is

        state' = plan.remerge_fn(concat(state, incoming_partials))

    — the same deterministic segment kernels as the bounded merge, zero
    Python per-key work. Late partials (window closed by the watermark)
    are dropped and counted; EMIT CHANGES finalizes the state rows whose
    keys appear in the epoch's input (vectorized left-semi join); EMIT
    FINAL finalizes and evicts rows whose window the watermark closed.
    Session windows use the interval-merging ``PartitionState`` below."""

    def __init__(self, part_id: int, plan, lateness_us: int, emit: str):
        self.part_id = part_id
        self.plan = plan
        self.lateness_us = lateness_us
        self.emit = emit
        self.state: pa.Table | None = None
        self.watermark: int = -(1 << 62)
        self.rows_in = 0
        self.rows_out = 0
        self.late_drops = 0

    def _counts(self, tbl: pa.Table) -> int:
        import pyarrow.compute as pc

        s = pc.sum(tbl.column("__ts_count"))
        return int(s.as_py() or 0)

    @property
    def _windowed(self) -> bool:
        return self.plan.window is not None

    def process(self, partial: pa.Table, wm_target: int | None = None) -> pa.Table:
        import pyarrow.compute as pc

        total = self._counts(partial)
        self.rows_in += total
        if self._windowed:
            # late drop: windows already closed by the current watermark
            size = self.plan.window.size_us
            closed = pc.less_equal(
                pc.add(partial.column("__ws"), size), pa.scalar(self.watermark)
            )
            n_late = self._counts(partial.filter(closed))
            if n_late:
                self.late_drops += n_late
                partial = partial.filter(pc.invert(closed))
        # watermark from this epoch's max event time (monotone); a
        # caller-supplied wm_target (source-min mode: the min over all
        # sources' running maxima, same value in every partition)
        # replaces the partition-local max
        if wm_target is not None:
            self.watermark = max(self.watermark, int(wm_target) - self.lateness_us)
        elif partial.num_rows:
            mx = pc.max(partial.column("__ts_max")).as_py()
            if mx is not None:
                self.watermark = max(self.watermark, int(mx) - self.lateness_us)
        # state transition (associative re-merge)
        if self.state is None or self.state.num_rows == 0:
            merged_in = self.plan.remerge_fn(partial) if partial.num_rows else None
            self.state = merged_in if merged_in is not None else self.state
        elif partial.num_rows:
            combined = pa.concat_tables(
                [self.state, partial], promote_options="permissive"
            )
            self.state = self.plan.remerge_fn(combined)
        return self._emit(partial)

    def _emit(self, incoming: pa.Table) -> pa.Table:
        import pyarrow.compute as pc

        keys = self.plan.all_keys
        if self.state is None or self.state.num_rows == 0:
            return pa.table({})
        if self.emit == "changes":
            if incoming.num_rows == 0:
                return pa.table({})
            touched = self.state.join(
                incoming.select(keys), keys=keys, join_type="left semi",
                use_threads=False,
            )
            out = self.plan.merge_fn(touched) if touched.num_rows else pa.table({})
            if self._windowed:
                # purge closed windows (future rows for them are late-dropped)
                size = self.plan.window.size_us
                open_mask = pc.greater(
                    pc.add(self.state.column("__ws"), size), pa.scalar(self.watermark)
                )
                self.state = self.state.filter(open_mask)
        else:  # final (windowed only: an unwindowed table never closes)
            size = self.plan.window.size_us
            closed_mask = pc.less_equal(
                pc.add(self.state.column("__ws"), size), pa.scalar(self.watermark)
            )
            closed = self.state.filter(closed_mask)
            self.state = self.state.filter(pc.invert(closed_mask))
            out = self.plan.merge_fn(closed) if closed.num_rows else pa.table({})
        self.rows_out += out.num_rows
        return out

    def flush(self) -> pa.Table:
        if self.state is None or self.state.num_rows == 0:
            return pa.table({})
        out = self.plan.merge_fn(self.state)
        self.state = None
        self.rows_out += out.num_rows
        return out

    def metrics(self) -> dict:
        return {
            "partition": self.part_id,
            "rows_in": self.rows_in,
            "rows_out": self.rows_out,
            "late_drops": self.late_drops,
            "watermark": self.watermark,
            "watermark_lag_us": self.lateness_us if self.watermark > -(1 << 61) else None,
            "open_windows": 0 if self.state is None else self.state.num_rows,
        }

    def snapshot(self) -> bytes:
        return pickle.dumps(
            {
                "vec_state": self.state,
                "watermark": self.watermark,
                "rows_in": self.rows_in,
                "rows_out": self.rows_out,
                "late_drops": self.late_drops,
            }
        )

    def restore(self, blob: bytes) -> None:
        d = pickle.loads(blob)
        self.state = d["vec_state"]
        self.watermark = d["watermark"]
        self.rows_in = d["rows_in"]
        self.rows_out = d["rows_out"]
        self.late_drops = d["late_drops"]


class PartitionState:
    def __init__(
        self,
        part_id: int,
        aggs: Sequence[AggExpr],
        key_names: Sequence[str],
        ord_names: Sequence[str],
        window: Window,
        lateness_us: int,
        emit: str,  # "changes" | "final"
        key_types: Sequence[pa.DataType],
        agg_types: Sequence[pa.DataType],
    ):
        self.part_id = part_id
        self.aggs = list(aggs)
        self.agg_names = [f"__a{i}" for i in range(len(self.aggs))]
        self.key_names = list(key_names)
        self.ord_names = list(ord_names)
        self.window = window
        self.lateness_us = lateness_us
        self.emit = emit
        self.key_types = list(key_types)
        self.agg_types = list(agg_types)
        self.is_session = isinstance(window, Session)

        # (key..., ws) -> [accs]  |  key... -> [[start, end, accs], ...]
        self.state: dict[tuple, list[StreamingAcc]] = {}
        self.sessions: dict[tuple, list[list[Any]]] = {}
        self.watermark: int = -(1 << 62)
        self.rows_in = 0
        self.rows_out = 0
        self.late_drops = 0

    # ------------------------------------------------------------------
    def _new_accs(self) -> list[StreamingAcc]:
        return [make_acc(a) for a in self.aggs]

    def process(self, partial: pa.Table, wm_target: int | None = None) -> pa.Table:
        """Merge one epoch's partials; return emitted rows."""
        rows = partial.to_pylist()
        touched: set[tuple] = set()
        max_ts = self.watermark + self.lateness_us
        for row in rows:
            key = tuple(row[k] for k in self.key_names)
            nrows = row.get("__ts_count", 1) or 1
            self.rows_in += nrows
            ts_max = row.get("__ts_max")
            if ts_max is not None and ts_max > max_ts:
                max_ts = ts_max
            if self.is_session:
                self._merge_session(key, row, touched, nrows)
            else:
                ws = row["__ws"]
                if ws + self.window.size_us <= self.watermark:
                    self.late_drops += nrows
                    continue
                wkey = key + (ws,)
                accs = self.state.get(wkey)
                if accs is None:
                    accs = self.state[wkey] = self._new_accs()
                for acc, name in zip(accs, self.agg_names):
                    acc.update(row, name, self.ord_names)
                touched.add(wkey)
        # advance the monotone watermark (source-min mode: the caller's
        # cross-source floor replaces the partition-local max)
        if wm_target is not None:
            max_ts = int(wm_target)
        self.watermark = max(self.watermark, max_ts - self.lateness_us)
        return self._emit(touched)

    # ------------------------------------------------------------------
    def _merge_session(self, key: tuple, row: dict, touched: set, nrows: int):
        s, e = row["__ts_min"], row["__ts_max"]
        if e <= self.watermark:
            self.late_drops += nrows
            return
        new_accs = self._new_accs()
        for acc, name in zip(new_accs, self.agg_names):
            acc.update(row, name, self.ord_names)
        gap = self.window.gap_us
        sess_list = self.sessions.setdefault(key, [])
        merged = [s, e, new_accs]
        keep = []
        for sess in sess_list:
            if sess[0] - gap <= merged[1] and merged[0] - gap <= sess[1]:
                # overlap or within gap -> merge (associative)
                merged[0] = min(merged[0], sess[0])
                merged[1] = max(merged[1], sess[1])
                for a0, a1 in zip(merged[2], sess[2]):
                    a0.merge(a1)
            else:
                keep.append(sess)
        keep.append(merged)
        keep.sort(key=lambda t: t[0])
        self.sessions[key] = keep
        touched.add(key)

    # ------------------------------------------------------------------
    def _emit(self, touched: set) -> pa.Table:
        out_keys: list[tuple] = []
        out_ws: list[int] = []
        out_we: list[int] = []
        out_vals: list[list] = []

        if self.is_session:
            gap = self.window.gap_us
            if self.emit == "changes":
                for key in touched:
                    for s, e, accs in self.sessions.get(key, []):
                        out_keys.append(key)
                        out_ws.append(s)
                        out_we.append(e)
                        out_vals.append([a.result() for a in accs])
            else:  # final: sessions closed by the watermark
                for key, sess_list in list(self.sessions.items()):
                    still = []
                    for s, e, accs in sess_list:
                        if self.watermark > e + gap:
                            out_keys.append(key)
                            out_ws.append(s)
                            out_we.append(e)
                            out_vals.append([a.result() for a in accs])
                        else:
                            still.append([s, e, accs])
                    if still:
                        self.sessions[key] = still
                    else:
                        del self.sessions[key]
        else:
            size = self.window.size_us
            if self.emit == "changes":
                for wkey in touched:
                    if wkey in self.state:
                        out_keys.append(wkey[:-1])
                        out_ws.append(wkey[-1])
                        out_we.append(wkey[-1] + size)
                        out_vals.append([a.result() for a in self.state[wkey]])
                # purge closed windows (late rows are dropped anyway)
                for wkey in [k for k in self.state if k[-1] + size <= self.watermark]:
                    del self.state[wkey]
            else:  # final
                for wkey in [k for k in self.state if k[-1] + size <= self.watermark]:
                    accs = self.state.pop(wkey)
                    out_keys.append(wkey[:-1])
                    out_ws.append(wkey[-1])
                    out_we.append(wkey[-1] + size)
                    out_vals.append([a.result() for a in accs])

        self.rows_out += len(out_keys)
        return self._build_table(out_keys, out_ws, out_we, out_vals)

    def flush(self) -> pa.Table:
        """End-of-stream: close everything still open (EMIT FINAL tail /
        bounded-equivalence tests)."""
        out_keys, out_ws, out_we, out_vals = [], [], [], []
        if self.is_session:
            for key, sess_list in self.sessions.items():
                for s, e, accs in sess_list:
                    out_keys.append(key)
                    out_ws.append(s)
                    out_we.append(e)
                    out_vals.append([a.result() for a in accs])
            self.sessions.clear()
        else:
            size = self.window.size_us
            for wkey, accs in self.state.items():
                out_keys.append(wkey[:-1])
                out_ws.append(wkey[-1])
                out_we.append(wkey[-1] + size)
                out_vals.append([a.result() for a in accs])
            self.state.clear()
        self.rows_out += len(out_keys)
        return self._build_table(out_keys, out_ws, out_we, out_vals)

    # ------------------------------------------------------------------
    def _build_table(self, keys, ws, we, vals) -> pa.Table:
        cols: dict[str, pa.Array] = {}
        for j, kn in enumerate(self.key_names):
            cols[kn] = pa.array([k[j] for k in keys], type=self.key_types[j])
        if self.is_session:
            cols["window_start"] = pa.array(ws, type=pa.timestamp("us"))
            cols["window_end"] = pa.array(we, type=pa.timestamp("us"))
        else:
            cols["__ws"] = pa.array(ws, type=pa.int64())
        for i in range(len(self.aggs)):
            cols[f"__agg{i}"] = pa.array(
                [v[i] for v in vals], type=self.agg_types[i]
            )
        return pa.table(cols)

    # ------------------------------------------------------------------
    def metrics(self) -> dict:
        return {
            "partition": self.part_id,
            "rows_in": self.rows_in,
            "rows_out": self.rows_out,
            "late_drops": self.late_drops,
            "watermark": self.watermark,
            "open_windows": len(self.state) + sum(len(v) for v in self.sessions.values()),
        }

    def snapshot(self) -> bytes:
        return pickle.dumps(
            {
                "state": self.state,
                "sessions": self.sessions,
                "watermark": self.watermark,
                "rows_in": self.rows_in,
                "rows_out": self.rows_out,
                "late_drops": self.late_drops,
            }
        )

    def restore(self, blob: bytes) -> None:
        d = pickle.loads(blob)
        self.state = d["state"]
        self.sessions = d["sessions"]
        self.watermark = d["watermark"]
        self.rows_in = d["rows_in"]
        self.rows_out = d["rows_out"]
        self.late_drops = d["late_drops"]
