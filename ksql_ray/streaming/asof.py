"""Streaming as-of enrichment join: every left-stream row picks up the
latest right-stream row (same key, right time <= left time) — the
continuous counterpart of ``ops/asof.asof_join`` and the third stateful
join family next to stream-table lookup (driver.py) and stream-stream
windowed join (join.py).

The canonical use: enrich an event stream with the most recent state of
a slowly-updating reference stream (latest model version per conv,
latest price per symbol, latest profile per user) under EVENT time, not
arrival time — a plain stream-table lookup joins against whatever
happens to have arrived, this one is deterministic for the same input
streams + watermark.

Correctness under disorder: a left row at time t may only be emitted
once every right row with time' <= t has arrived. Both sides therefore
share one watermark — ``min(left running max, right running max) −
lateness`` (the two-input analog of StreamingJob's source-min mode) —
and rows are buffered per partition until the epoch-START watermark
passes them (the epoch-barrier convention of streaming/cep.py: the
band ``(flushed_upto, W]`` flushes BEFORE this epoch's maxima advance
W, so intra-epoch disorder never drops). A row at or below
``flushed_upto`` is a LATE drop, counted per side (an exactly-once
sink cannot retract emitted enrichments).

Bounded state: the left buffer holds only rows above the watermark;
the right history COMPACTS at every flush to (all rows above
``flushed_upto``) + (the single latest row at or below it per key) —
the only right row any future left row can still bind below the
watermark. State per key is O(right updates per lateness window) + 1.

Per-epoch flush is one vectorized merge (the bounded operator's shape):
concat right participants + left band, one ``np.lexsort`` over (key,
time, tiebreak, side), one ``np.maximum.accumulate`` forward-fill of
the last right position per key block. Backward direction,
``allow_exact`` (right at the same timestamp binds), greatest
(time, tiebreak) wins ties — identical contract to
``ops/asof.asof_join(direction="backward")``, and pytest pins
streaming == bounded on random shuffled streams.

Partitioning assumption (custom-operator mandate): equal keys
co-locate via the hash shuffle; the join is key-local, so hot keys
cannot be salted; state per key is bounded as above.
"""

from __future__ import annotations

import pickle
from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ..ops.asof import _as_i8, _factorize_keys
from .driver import _split_by_part, limit_worker_threads
from .sink import TwoPhaseSink

_I64MAX = np.iinfo(np.int64).max

__all__ = ["StreamingAsofJob"]


@ray.remote
def _asof_prep(inputs, columns, by, num_partitions: int, on: str):
    """Read one side's epoch files -> hash-partition by key; returns P
    slices plus the file set's max event time (drives the watermark)."""
    limit_worker_threads()
    from ..exec.groupby import hash_partition_ids

    tables = []
    for x in inputs:
        batch = x if isinstance(x, pa.Table) else pq.read_table(
            x, columns=columns)
        batch = batch.replace_schema_metadata(None)
        part = hash_partition_ids(batch, by, num_partitions)
        tables.append(batch.append_column(
            "__part", pa.array(part, type=pa.int64())))
    out = tables[0] if len(tables) == 1 else pa.concat_tables(
        tables, promote_options="permissive")
    mx = None
    if out.num_rows:
        tvals, t_ok = _as_i8(out.column(on))
        if t_ok.any():
            mx = int(tvals[t_ok].max())
    slices = _split_by_part(out, num_partitions)
    return (*slices, mx) if num_partitions > 1 else (slices[0], mx)


class _AsofPartitionState:
    def __init__(self, spec: dict):
        self.on = spec["on"]
        self.by = spec["by"]
        self.right_payload = spec["right_payload"]   # {src: dst}
        self.tiebreak = spec.get("tiebreak")
        self.lateness_us = spec["lateness_us"]
        self.l_schema = pa.schema(
            [pa.field(n, t) for n, t in spec["l_fields"]])
        self.r_schema = pa.schema(
            [pa.field(n, t) for n, t in spec["r_fields"]])
        neg_inf = -(1 << 62)
        self.lbuf: list[pa.Table] = []
        self.rhist: list[pa.Table] = []
        self.l_max = neg_inf
        self.r_max = neg_inf
        self.flushed_upto = neg_inf
        self.rows_in = 0
        self.rows_out = 0
        self.late_left = 0
        self.late_right = 0

    # --- ingestion ---------------------------------------------------------
    def add(self, tbl: pa.Table, side: int) -> None:
        self.rows_in += tbl.num_rows
        t, _ok = _as_i8(tbl.column(self.on))
        late = t <= self.flushed_upto
        n_late = int(late.sum())
        if side == 0:
            self.late_left += n_late
        else:
            self.late_right += n_late
        if n_late:
            tbl = tbl.filter(pa.array(~late))
        if tbl.num_rows == 0:
            return
        (self.lbuf if side == 0 else self.rhist).append(tbl)

    def advance(self, l_mx: int | None, r_mx: int | None) -> None:
        if l_mx is not None:
            self.l_max = max(self.l_max, l_mx)
        if r_mx is not None:
            self.r_max = max(self.r_max, r_mx)

    @property
    def watermark(self) -> int:
        return min(self.l_max, self.r_max) - self.lateness_us

    # --- flush -------------------------------------------------------------
    def _concat(self, parts: list[pa.Table],
                schema: pa.Schema) -> pa.Table:
        parts = [p for p in parts if p.num_rows]
        if not parts:
            return schema.empty_table()
        return pa.concat_tables(parts, promote_options="permissive")

    def flush(self, upto: int | None = None) -> pa.Table:
        w = self.watermark if upto is None else upto
        out_schema = pa.schema(
            list(self.l_schema)
            + [pa.field(dst, self.r_schema.field(src).type)
               for src, dst in self.right_payload.items()])
        if w <= self.flushed_upto:
            return out_schema.empty_table()
        ltbl = self._concat(self.lbuf, self.l_schema)
        rtbl = self._concat(self.rhist, self.r_schema)
        lt, _ = _as_i8(ltbl.column(self.on)) if ltbl.num_rows else \
            (np.empty(0, np.int64), None)
        band_mask = lt <= w if ltbl.num_rows else np.empty(0, bool)
        band = ltbl.filter(pa.array(band_mask)) if ltbl.num_rows else ltbl
        keep_l = (ltbl.filter(pa.array(~band_mask))
                  if ltbl.num_rows else ltbl)
        rt, _ = _as_i8(rtbl.column(self.on)) if rtbl.num_rows else \
            (np.empty(0, np.int64), None)
        r_part_mask = rt <= w if rtbl.num_rows else np.empty(0, bool)
        rpart = (rtbl.filter(pa.array(r_part_mask))
                 if rtbl.num_rows else rtbl)
        out = self._merge(band, rpart, out_schema)
        self.rows_out += out.num_rows
        # compact: future right rows + the latest <= w row per key
        self.lbuf = [keep_l] if keep_l.num_rows else []
        self.rhist = self._compact(rtbl, rt, w)
        self.flushed_upto = w
        return out

    def _merge(self, band: pa.Table, rpart: pa.Table,
               out_schema: pa.Schema) -> pa.Table:
        nl, nr = band.num_rows, rpart.num_rows
        if nl == 0:
            return out_schema.empty_table()
        lt, lt_ok = _as_i8(band.column(self.on))
        rt, rt_ok = _as_i8(rpart.column(self.on))
        gl, gr, okl, okr = _factorize_keys(band, rpart, self.by, self.by)
        okl &= lt_ok
        okr &= rt_ok
        if self.tiebreak and nr:
            tb, _ = _as_i8(rpart.column(self.tiebreak))
        else:
            tb = np.zeros(nr, dtype=np.int64)
        rkeep = np.flatnonzero(okr)
        g = np.concatenate([gr[rkeep], gl])
        t = np.concatenate([rt[rkeep], lt])
        tbu = np.concatenate([tb[rkeep], np.full(nl, _I64MAX, np.int64)])
        sideu = np.concatenate([np.zeros(len(rkeep), np.int8),
                                np.ones(nl, np.int8)])
        order = np.lexsort((sideu, tbu, t, g))
        g_s = g[order]
        is_left = sideu[order] == 1
        nu = len(order)
        rpos = np.where(is_left, -1, np.arange(nu))
        filled = np.maximum.accumulate(rpos)
        new_block = np.empty(nu, dtype=bool)
        if nu:
            new_block[0] = True
            new_block[1:] = g_s[1:] != g_s[:-1]
        block_start = np.maximum.accumulate(
            np.where(new_block, np.arange(nu), 0))
        valid = filled >= block_start
        match = np.full(nl, -1, dtype=np.int64)
        lsorted = np.flatnonzero(is_left)
        got = valid[lsorted]
        src = filled[lsorted]
        li = order[lsorted] - len(rkeep)
        match[li[got]] = rkeep[order[src[got]]]
        match[~okl] = -1
        take_idx = pa.array(match, mask=match < 0)
        out_cols = {f.name: band.column(f.name) for f in self.l_schema}
        for src_c, dst_c in self.right_payload.items():
            out_cols[dst_c] = rpart.column(src_c).take(take_idx)
        return pa.table(out_cols).cast(out_schema)

    def _compact(self, rtbl: pa.Table, rt: np.ndarray,
                 w: int) -> list[pa.Table]:
        if rtbl.num_rows == 0:
            return []
        future = rt > w
        past_idx = np.flatnonzero(~future)
        keep = np.flatnonzero(future).tolist()
        if len(past_idx):
            past = rtbl.take(pa.array(past_idx))
            gl, _gr, _okl, _okr = _factorize_keys(
                past, past.slice(0, 0), self.by, self.by)
            pt = rt[past_idx]
            if self.tiebreak:
                tb, _ = _as_i8(past.column(self.tiebreak))
            else:
                tb = np.arange(len(past_idx), dtype=np.int64)
            order = np.lexsort((tb, pt, gl))
            g_s = gl[order]
            last = np.ones(len(order), dtype=bool)
            last[:-1] = g_s[1:] != g_s[:-1]
            keep += past_idx[order[last]].tolist()
        if not keep:
            return []
        return [rtbl.take(pa.array(sorted(keep)))]

    # --- checkpointing -----------------------------------------------------
    def snapshot(self) -> bytes:
        def ser(tbl: pa.Table) -> bytes:
            import io

            buf = io.BytesIO()
            with pa.ipc.new_stream(buf, tbl.schema) as wtr:
                wtr.write_table(tbl)
            return buf.getvalue()

        return pickle.dumps({
            "lbuf": ser(self._concat(self.lbuf, self.l_schema)),
            "rhist": ser(self._concat(self.rhist, self.r_schema)),
            "l_max": self.l_max, "r_max": self.r_max,
            "flushed_upto": self.flushed_upto,
        })

    def restore(self, blob: bytes) -> None:
        doc = pickle.loads(blob)

        def de(b: bytes) -> pa.Table:
            with pa.ipc.open_stream(b) as r:
                return r.read_all()

        lb, rh = de(doc["lbuf"]), de(doc["rhist"])
        self.lbuf = [lb] if lb.num_rows else []
        self.rhist = [rh] if rh.num_rows else []
        self.l_max = doc["l_max"]
        self.r_max = doc["r_max"]
        self.flushed_upto = doc["flushed_upto"]
        self.rows_in = self.rows_out = 0
        self.late_left = self.late_right = 0

    def metrics(self) -> dict:
        return {"rows_in": self.rows_in, "rows_out": self.rows_out,
                "late_left": self.late_left,
                "late_right": self.late_right,
                "buffered_left": sum(t.num_rows for t in self.lbuf),
                "right_history": sum(t.num_rows for t in self.rhist),
                "watermark": self.watermark}


@ray.remote
class AsofStateActor:
    def __init__(self, part_id: int, sink_dir: str, spec: dict):
        limit_worker_threads()
        self.part_id = part_id
        self.sink = TwoPhaseSink(sink_dir)
        self.state = _AsofPartitionState(spec)

    def process(self, epoch: int, nl: int, nr: int,
                *maxes_then_parts) -> dict:
        l_maxes = maxes_then_parts[:nl]
        r_maxes = maxes_then_parts[nl:nl + nr]
        parts = maxes_then_parts[nl + nr:]
        for i, p in enumerate(parts):
            if p is not None and p.num_rows:
                self.state.add(p.drop_columns(["__part"]),
                               side=0 if i < nl else 1)
        out = self.state.flush()
        if out.num_rows:
            self.sink.write(self.part_id, epoch, out)
        lm = [m for m in l_maxes if m is not None]
        rm = [m for m in r_maxes if m is not None]
        self.state.advance(max(lm) if lm else None,
                           max(rm) if rm else None)
        return self.state.metrics()

    def flush_all(self, epoch: int) -> dict:
        out = self.state.flush(upto=(1 << 62))
        if out.num_rows:
            self.sink.write(self.part_id, epoch, out)
        return self.state.metrics()

    def checkpoint(self, epoch: int, ckpt_dir: str) -> None:
        import os

        os.makedirs(ckpt_dir, exist_ok=True)
        final = os.path.join(
            ckpt_dir, f"asof-{self.part_id:04d}-epoch-{epoch:06d}.pkl")
        if not os.path.exists(final):
            tmp = final + ".tmp"
            with open(tmp, "wb") as f:
                f.write(self.state.snapshot())
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, final)

    def restore(self, ckpt_dir: str, upto_epoch: int) -> bool:
        import glob
        import os

        best = None
        for p in glob.glob(os.path.join(
                ckpt_dir, f"asof-{self.part_id:04d}-epoch-*.pkl")):
            e = int(p.rsplit("-epoch-", 1)[1].split(".")[0])
            if e <= upto_epoch and (best is None or e > best[0]):
                best = (e, p)
        if best is None:
            return False
        with open(best[1], "rb") as f:
            self.state.restore(f.read())
        return True


class StreamingAsofJob:
    """Continuous as-of enrichment of a left micro-batch stream with a
    right micro-batch stream. Epochs feed PAIRED file lists (left
    files, right files); either may be empty for an epoch.

    ``right_cols`` maps right source columns -> output names (payload;
    key/time columns are never emitted from the right side).
    """

    def reshard_from(self, old_dir: str) -> dict:
        """Rescale an as-of-join checkpoint: the buffered left rows and
        right history re-route by the same `by`-key hash the prep
        uses; watermarks / flush cursors fold min (equal across
        partitions in practice — every actor folds the same epoch
        maxima; flushed rows are gone from the buffers, so a lower
        cursor cannot re-emit)."""
        from .rescale import _pkl_reshard

        info = _pkl_reshard(
            self, old_dir, "asof",
            table_fields={"lbuf": self.by, "rhist": self.by},
            min_fields=["l_max", "r_max", "flushed_upto"],
            sum_fields=[], restore_actors=False)
        # actors are created lazily on the first epoch (they need the
        # stream schemas); flag resume so _ensure_actors restores from
        # the freshly written reshard
        self._resume = True
        return info

    def __init__(self, out_dir: str, *, on: str, by: Sequence[str],
                 right_cols: dict[str, str],
                 left_columns: Sequence[str],
                 right_columns: Sequence[str],
                 left_types: Sequence[tuple] | None = None,
                 tiebreak: str | None = None,
                 lateness_us: int = 0, num_partitions: int = 8,
                 checkpoint_dir: str | None = None,
                 checkpoint_every: int = 0, resume: bool = False):
        import json
        import os

        self.on = on
        self.by = list(by)
        self.left_columns = list(left_columns)
        self.right_columns = list(right_columns)
        for c in [on, *self.by]:
            if c not in self.left_columns:
                self.left_columns.append(c)
        for c in [on, *self.by] + ([tiebreak] if tiebreak else []):
            if c not in self.right_columns:
                self.right_columns.append(c)
        self.P = num_partitions
        self.sink = TwoPhaseSink(out_dir)
        self._spec = {
            "on": on, "by": self.by, "right_payload": dict(right_cols),
            "tiebreak": tiebreak, "lateness_us": lateness_us,
            "l_fields": None, "r_fields": None,
        }
        self._actors = None
        self.out_dir = out_dir
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every = checkpoint_every
        self.epoch = -1
        self._resume_cursor = -1
        self.metrics: list[dict] = []
        self._resume = resume

    def _ensure_actors(self, l_sample: pa.Schema, r_sample: pa.Schema):
        import json
        import os

        if self._actors is not None:
            return
        self._spec["l_fields"] = [
            (f.name, f.type) for f in l_sample if f.name != "__part"]
        self._spec["r_fields"] = [
            (f.name, f.type) for f in r_sample if f.name != "__part"]
        self._actors = [
            AsofStateActor.remote(p, self.out_dir, self._spec)
            for p in range(self.P)]
        cursor = (os.path.join(self.checkpoint_dir, "checkpoint.json")
                  if self.checkpoint_dir else None)
        if self._resume and cursor and os.path.exists(cursor):
            with open(cursor) as f:
                doc = json.load(f)
            self._resume_cursor = doc["epoch"]
            ray.get([a.restore.remote(self.checkpoint_dir, doc["epoch"])
                     for a in self._actors])

    @staticmethod
    def _sample_schema(files_or_tables, columns) -> pa.Schema:
        x = files_or_tables[0]
        if isinstance(x, pa.Table):
            t = x.select([c for c in columns if c in x.column_names])
            return t.schema
        s = pq.read_schema(x)
        return pa.schema([pa.field(f.name, f.type) for f in s
                          if f.name in columns])

    def process_epoch(self, left_files: Sequence,
                      right_files: Sequence) -> dict:
        import json
        import os

        self.epoch += 1
        if self._actors is None:
            lf = left_files or right_files
            rf = right_files or left_files
            self._ensure_actors(
                self._sample_schema(lf, self.left_columns),
                self._sample_schema(rf, self.right_columns))
        if self.epoch <= self._resume_cursor:
            m = {"epoch": self.epoch, "skipped": True}
            self.metrics.append(m)
            return m
        l_preps = [_asof_prep.options(num_returns=self.P + 1).remote(
            [f], self.left_columns, self.by, self.P, self.on)
            for f in left_files]
        r_preps = [_asof_prep.options(num_returns=self.P + 1).remote(
            [f], self.right_columns, self.by, self.P, self.on)
            for f in right_files]
        acks = []
        for p in range(self.P):
            args = ([pr[self.P] for pr in l_preps]
                    + [pr[self.P] for pr in r_preps]
                    + [pr[p] for pr in l_preps]
                    + [pr[p] for pr in r_preps])
            acks.append(self._actors[p].process.remote(
                self.epoch, len(l_preps), len(r_preps), *args))
        stats = ray.get(acks)
        self.sink.commit_epoch(self.epoch)
        m = {"epoch": self.epoch,
             "rows_in": sum(s["rows_in"] for s in stats),
             "rows_out": sum(s["rows_out"] for s in stats),
             "late_left": sum(s["late_left"] for s in stats),
             "late_right": sum(s["late_right"] for s in stats)}
        self.metrics.append(m)
        if (self.checkpoint_dir and self.checkpoint_every
                and (self.epoch + 1) % self.checkpoint_every == 0):
            ray.get([a.checkpoint.remote(self.epoch, self.checkpoint_dir)
                     for a in self._actors])
            cursor = os.path.join(self.checkpoint_dir, "checkpoint.json")
            tmp = cursor + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"epoch": self.epoch}, f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, cursor)
        return m

    def run(self, left_files: Sequence[str], right_files: Sequence[str],
            files_per_epoch: int = 4) -> None:
        li = ri = 0
        while li < len(left_files) or ri < len(right_files):
            lf = left_files[li:li + files_per_epoch]
            rf = right_files[ri:ri + files_per_epoch]
            li += len(lf)
            ri += len(rf)
            self.process_epoch(lf, rf)

    def finish(self) -> dict:
        if self._actors is None:
            return {"epochs": 0, "rows_out": 0}
        self.epoch += 1
        stats = ray.get([a.flush_all.remote(self.epoch)
                         for a in self._actors])
        self.sink.commit_epoch(self.epoch)
        # per-actor counters are cumulative across flushes
        return {"epochs": self.epoch + 1,
                "rows_in": sum(s["rows_in"] for s in stats),
                "rows_out": sum(s["rows_out"] for s in stats),
                "late_left": sum(s["late_left"] for s in stats),
                "late_right": sum(s["late_right"] for s in stats)}

    def result(self) -> pa.Table:
        return self.sink.read_committed()
