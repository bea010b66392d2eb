"""Stream-stream windowed symmetric hash join (SURVEY.md §2.5).

ksqlDB semantics (the reference's Join/LeftJoin/RightJoin/OuterJoin verbs
on two STREAMs, ksql/join.go:28-34 + select_builder.go:329-396): rows
from the two streams match when the equi keys are equal AND their event
times are within the join window (``WITHIN`` bound). Execution here:

* both streams are hash-routed by join key to P ``JoinStateActor``s
  (same deterministic partitioner as aggregation state — keys never
  move between actors);
* each actor keeps one buffered Arrow table per side plus a matched
  bitmap, joins NEW left rows against the full right buffer and NEW
  right rows against the OLD left buffer per epoch (symmetric, no
  double-count), all via vectorized ``pa.Table.join``;
* the per-partition watermark is ``min(max_ts_left, max_ts_right) −
  lateness``; buffered rows expire when ``ts + within < watermark`` —
  expired unmatched rows are emitted null-padded exactly once for
  LEFT/RIGHT/OUTER (SURVEY.md §7.4 hard part 6), then dropped;
* outputs flow through the same two-phase idempotent sink.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from ..builder import SelectBuilder
from ..catalog import Catalog, Ref
from ..errors import PlanError
from ..exec.joins import extract_equi_keys, plan_right_renames
from ..exec.groupby import hash_partition_ids
from .sink import TwoPhaseSink

_NEG_INF = -(1 << 62)


def _route_side(path_or_tbl, columns, ts_col: str, key_cols: list[str],
                renames: dict, num_partitions: int) -> list[pa.Table]:
    from .driver import limit_worker_threads

    limit_worker_threads()
    if isinstance(path_or_tbl, pa.Table):
        batch = path_or_tbl
        if columns:
            batch = batch.select([c for c in columns if c in batch.column_names])
    else:
        batch = pq.read_table(path_or_tbl, columns=columns)
    if renames:
        batch = batch.rename_columns([renames.get(n, n) for n in batch.column_names])
    batch = batch.append_column("__jts", pc.cast(batch.column(ts_col), pa.int64()))
    part = hash_partition_ids(batch, key_cols, num_partitions)
    batch = batch.append_column("__part", pa.array(part, type=pa.int64()))
    si = pc.sort_indices(batch, sort_keys=[("__part", "ascending")])
    batch = batch.take(si)
    parts = batch.column("__part").to_numpy(zero_copy_only=False)
    bounds = np.searchsorted(parts, np.arange(num_partitions + 1))
    return [
        batch.slice(bounds[p], bounds[p + 1] - bounds[p]).drop_columns(["__part"])
        for p in range(num_partitions)
    ]


route_side = ray.remote(_route_side)


class _SideBuffer:
    """One side's buffered rows + matched bitmap."""

    def __init__(self, schema: pa.Schema):
        self.tbl = schema.empty_table()
        self.matched = np.zeros(0, dtype=bool)
        self.max_ts = _NEG_INF

    def append(self, t: pa.Table) -> None:
        if t.num_rows == 0:
            return
        ts = t.column("__jts").to_numpy(zero_copy_only=False)
        self.max_ts = max(self.max_ts, int(ts.max()))
        self.tbl = pa.concat_tables([self.tbl, t], promote_options="permissive")
        self.matched = np.concatenate([self.matched, np.zeros(t.num_rows, dtype=bool)])

    def with_ids(self, start: int = 0) -> pa.Table:
        return self.tbl.append_column(
            "__bid", pa.array(np.arange(self.tbl.num_rows), type=pa.int64())
        )

    def mark(self, ids: np.ndarray) -> None:
        if len(ids):
            self.matched[ids] = True

    def expire(self, threshold_ts: int) -> tuple[pa.Table, np.ndarray]:
        """Drop rows with ts < threshold; return (expired table, expired
        matched flags)."""
        if self.tbl.num_rows == 0:
            return self.tbl, self.matched[:0]
        ts = self.tbl.column("__jts").to_numpy(zero_copy_only=False)
        keep = ts >= threshold_ts
        expired_tbl = self.tbl.filter(pa.array(~keep))
        expired_matched = self.matched[~keep]
        self.tbl = self.tbl.filter(pa.array(keep))
        self.matched = self.matched[keep]
        return expired_tbl, expired_matched


def _null_pad_join(side_tbl: pa.Table, other_schema: pa.Schema) -> pa.Table:
    """Pad one side's rows with nulls for the other side's columns."""
    cols, names = [], []
    for f in side_tbl.schema:
        cols.append(side_tbl.column(f.name))
        names.append(f.name)
    for f in other_schema:
        if f.name in ("__jts",):
            continue
        if f.name not in names:
            cols.append(pa.nulls(side_tbl.num_rows, type=f.type))
            names.append(f.name)
    return pa.table(dict(zip(names, cols)))


@ray.remote
class JoinStateActor:
    def __init__(
        self,
        part_id: int,
        how: str,
        left_keys: list[str],
        right_keys: list[str],
        within_us: int,
        lateness_us: int,
        left_schema: pa.Schema,
        right_schema: pa.Schema,
        sink_dir: str,
        project_fn,
    ):
        from .driver import limit_worker_threads

        limit_worker_threads()
        self.part_id = part_id
        self.how = how
        self.lk = left_keys
        self.rk = right_keys
        self.within_us = within_us
        self.lateness_us = lateness_us
        self.left = _SideBuffer(left_schema)
        self.right = _SideBuffer(right_schema)
        self.left_schema = left_schema
        self.right_schema = right_schema
        self.sink = TwoPhaseSink(sink_dir)
        self.project_fn = project_fn
        self.rows_out = 0
        self.watermark = _NEG_INF

    def _join(self, a: pa.Table, a_side: _SideBuffer, a_offset_ids: np.ndarray | None,
              b: pa.Table, b_ids_into: _SideBuffer) -> pa.Table:
        """new-side table `a` vs buffered table `b` (with __bid); returns
        matched joined rows within the time bound, marking both sides."""
        if a.num_rows == 0 or b.num_rows == 0:
            return None
        a2 = a.append_column("__aid", pa.array(np.arange(a.num_rows), type=pa.int64()))
        a2 = a2.rename_columns(
            [("__ats" if n == "__jts" else n) for n in a2.column_names]
        )
        out = a2.join(b, keys=self.lk if self._a_is_left else self.rk,
                      right_keys=self.rk if self._a_is_left else self.lk,
                      join_type="inner", use_threads=False)
        if out.num_rows == 0:
            return None
        lts = out.column("__ats").to_numpy(zero_copy_only=False)
        rts = out.column("__jts").to_numpy(zero_copy_only=False)
        mask = np.abs(lts - rts) <= self.within_us
        out = out.filter(pa.array(mask))
        if out.num_rows == 0:
            return None
        a_ids = out.column("__aid").to_numpy(zero_copy_only=False)
        b_ids = out.column("__bid").to_numpy(zero_copy_only=False)
        if a_offset_ids is not None:
            a_side.mark(a_offset_ids[a_ids])
        b_ids_into.mark(b_ids)
        return out.drop_columns(["__aid", "__bid", "__ats", "__jts"])

    def process(self, epoch: int, n_left: int, *parts) -> dict:
        left_parts = list(parts[:n_left])
        right_parts = list(parts[n_left:])
        newL = (
            pa.concat_tables([t for t in left_parts if t.num_rows], promote_options="permissive")
            if any(t.num_rows for t in left_parts) else self.left_schema.empty_table()
        )
        newR = (
            pa.concat_tables([t for t in right_parts if t.num_rows], promote_options="permissive")
            if any(t.num_rows for t in right_parts) else self.right_schema.empty_table()
        )
        oldL_n = self.left.tbl.num_rows
        oldR_n = self.right.tbl.num_rows
        # append first so ids are stable; remember which ids are "new"
        self.left.append(newL)
        self.right.append(newR)

        emitted = []
        # new left vs FULL right buffer
        self._a_is_left = True
        newL_ids = np.arange(oldL_n, self.left.tbl.num_rows)
        m = self._join(newL, self.left, newL_ids, self.right.with_ids(), self.right)
        if m is not None:
            emitted.append(m)
        # new right vs OLD left buffer only (avoid double-count of new-new)
        self._a_is_left = False
        newR_ids = np.arange(oldR_n, self.right.tbl.num_rows)
        oldL = self.left.tbl.slice(0, oldL_n).append_column(
            "__bid", pa.array(np.arange(oldL_n), type=pa.int64())
        )
        m = self._join(newR, self.right, newR_ids, oldL, self.left)
        if m is not None:
            emitted.append(m)

        # watermark: min of the two sides' max ts, minus lateness
        self.watermark = max(
            self.watermark,
            min(self.left.max_ts, self.right.max_ts) - self.lateness_us,
        )
        pads = self._expire(self.watermark - self.within_us)
        emitted.extend(pads)
        self._emit(epoch, emitted)
        return self.metrics()

    def _expire(self, threshold: int) -> list[pa.Table]:
        out = []
        expL, mL = self.left.expire(threshold)
        if self.how in ("left", "outer") and expL.num_rows:
            unmatched = expL.filter(pa.array(~mL))
            if unmatched.num_rows:
                out.append(_null_pad_join(unmatched.drop_columns(["__jts"]), self.right_schema))
        expR, mR = self.right.expire(threshold)
        if self.how in ("right", "outer") and expR.num_rows:
            unmatched = expR.filter(pa.array(~mR))
            if unmatched.num_rows:
                out.append(_null_pad_join(unmatched.drop_columns(["__jts"]), self.left_schema))
        return out

    def _emit(self, epoch: int, tables: list[pa.Table]) -> None:
        tables = [t for t in tables if t is not None and t.num_rows]
        if not tables:
            return
        # align all to the full joined schema
        full = [_null_pad_join(t, self.left_schema) for t in tables]
        full = [_null_pad_join(t, self.right_schema) for t in full]
        cols = [n for n in full[0].column_names if n != "__jts"]
        full = [t.select(cols) for t in full]
        out = pa.concat_tables(full, promote_options="permissive")
        final = self.project_fn(out)
        if final.num_rows:
            self.sink.write(self.part_id, epoch, final)
            self.rows_out += final.num_rows

    def finish(self, epoch: int) -> dict:
        pads = self._expire(1 << 62)
        self._emit(epoch, pads)
        return self.metrics()

    def metrics(self) -> dict:
        return {
            "partition": self.part_id,
            "rows_out": self.rows_out,
            "watermark": self.watermark,
            "buffered_left": self.left.tbl.num_rows,
            "buffered_right": self.right.tbl.num_rows,
        }

    # per-partition lineage: buffers + matched bitmaps + watermark snapshot
    def checkpoint(self, epoch: int, ckpt_dir: str) -> str:
        import pickle

        os.makedirs(ckpt_dir, exist_ok=True)
        final = os.path.join(ckpt_dir, f"join-{self.part_id:04d}-epoch-{epoch:06d}.pkl")
        tmp = final + ".tmp"
        with open(tmp, "wb") as f:
            pickle.dump(
                {
                    "left_tbl": self.left.tbl, "left_m": self.left.matched,
                    "left_max": self.left.max_ts,
                    "right_tbl": self.right.tbl, "right_m": self.right.matched,
                    "right_max": self.right.max_ts,
                    "watermark": self.watermark, "rows_out": self.rows_out,
                },
                f,
            )
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, final)
        return final

    def restore(self, path: str) -> None:
        import pickle

        with open(path, "rb") as f:
            d = pickle.load(f)
        self.left.tbl, self.left.matched = d["left_tbl"], d["left_m"]
        self.left.max_ts = d["left_max"]
        self.right.tbl, self.right.matched = d["right_tbl"], d["right_m"]
        self.right.max_ts = d["right_max"]
        self.watermark = d["watermark"]
        self.rows_out = d["rows_out"]


class StreamJoinJob:
    """Continuous stream-stream join of two Parquet micro-batch streams."""

    def __init__(
        self,
        builder: SelectBuilder,
        catalog: Catalog,
        out_dir: str,
        within_us: int,
        num_partitions: int = 4,
        lateness_us: int = 0,
        checkpoint_dir: str | None = None,
        checkpoint_every: int = 0,
        resume: bool = False,
    ):
        if len(builder.joins) != 1:
            raise PlanError("StreamJoinJob takes exactly one stream-stream join")
        j = builder.joins[0]
        if j.how == "cross":
            raise PlanError("CROSS join is not windowed; use the broadcast path")
        lrel = builder._source_relation(catalog)
        rrel = catalog.get(j.source.name)
        if lrel.kind is not Ref.STREAM or rrel.kind is not Ref.STREAM:
            raise PlanError("StreamJoinJob requires two STREAM sources")
        if not lrel.timestamp_col or not rrel.timestamp_col:
            raise PlanError("both streams need a designated event-time column")
        alias = j.source.alias or j.source.name
        lk, rk, residual = extract_equi_keys(
            j.conds, set(lrel.schema.names), set(rrel.schema.names), alias
        )
        if residual:
            raise PlanError("stream-stream join supports equi conditions only (v1)")
        renames = plan_right_renames(set(lrel.schema.names), rrel.schema, rk, lk, alias)
        self.rk = [renames.get(k, k) for k in rk]
        self.lk = lk
        self.renames = renames

        self.catalog = catalog
        self.builder = builder
        self.num_partitions = num_partitions
        self.sink = TwoPhaseSink(out_dir)
        self.left_ts = lrel.timestamp_col
        self.right_ts = renames.get(rrel.timestamp_col, rrel.timestamp_col)

        lschema = pa.schema(list(lrel.schema) + [pa.field("__jts", pa.int64())])
        rfields = [
            pa.field(renames.get(f.name, f.name), f.type) for f in rrel.schema
        ]
        rschema = pa.schema(rfields + [pa.field("__jts", pa.int64())])

        fields = list(builder.fields)
        wheres = list(builder.wheres)

        def project(batch: pa.Table) -> pa.Table:
            if wheres:
                mask = None
                for c in wheres:
                    m = c.eval(batch)
                    mask = m if mask is None else pc.and_kleene(mask, m)
                batch = batch.filter(pc.fill_null(mask, False))
            n = batch.num_rows
            cols, names = [], []
            for e in fields:
                v = e.eval(batch)
                if isinstance(v, pa.Scalar):
                    v = pa.nulls(n, type=v.type) if not v.is_valid else pa.array([v.as_py()] * n, type=v.type)
                cols.append(v)
                names.append(e.output_name())
            return pa.table(dict(zip(names, cols)))

        self.actors = [
            JoinStateActor.remote(
                p, j.how, self.lk, self.rk, within_us, lateness_us,
                lschema, rschema, out_dir, project,
            )
            for p in range(num_partitions)
        ]
        self.epoch = -1
        self.metrics_log: list[dict] = []
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every = checkpoint_every
        self._resume_cursor = -1
        if resume and checkpoint_dir:
            import json as _json

            manifest = os.path.join(checkpoint_dir, "join_checkpoint.json")
            if os.path.exists(manifest):
                with open(manifest) as f:
                    epoch = _json.load(f)["epoch"]
                ray.get([
                    a.restore.remote(os.path.join(
                        checkpoint_dir, f"join-{p:04d}-epoch-{epoch:06d}.pkl"))
                    for p, a in enumerate(self.actors)
                ])
                self._resume_cursor = epoch

    def process_epoch(self, left_inputs: Sequence, right_inputs: Sequence) -> list[dict] | None:
        self.epoch += 1
        if self.epoch <= self._resume_cursor:
            return None  # effect already in restored state; sink idempotent
        nret = self.num_partitions
        lrefs = [
            route_side.options(num_returns=nret).remote(
                x, None, self.left_ts, self.lk, {}, nret
            )
            for x in left_inputs
        ]
        rrefs = [
            route_side.options(num_returns=nret).remote(
                x, None, self.right_ts, self.rk, self.renames, nret
            )
            for x in right_inputs
        ]
        if nret == 1:
            lrefs = [[r] for r in lrefs]
            rrefs = [[r] for r in rrefs]
        acks = []
        for p, actor in enumerate(self.actors):
            lp = [r[p] for r in lrefs]
            rp = [r[p] for r in rrefs]
            acks.append(actor.process.remote(self.epoch, len(lp), *lp, *rp))
        metrics = ray.get(acks)
        self.sink.commit_epoch(self.epoch, {"per_partition": metrics})
        self.metrics_log.append({"epoch": self.epoch, "partitions": metrics})
        if (
            self.checkpoint_dir and self.checkpoint_every
            and (self.epoch + 1) % self.checkpoint_every == 0
        ):
            import json as _json

            ray.get([a.checkpoint.remote(self.epoch, self.checkpoint_dir)
                     for a in self.actors])
            manifest = os.path.join(self.checkpoint_dir, "join_checkpoint.json")
            tmp = manifest + ".tmp"
            with open(tmp, "w") as f:
                _json.dump({"epoch": self.epoch}, f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, manifest)
        return metrics

    def finish(self) -> list[dict]:
        self.epoch += 1
        metrics = ray.get([a.finish.remote(self.epoch) for a in self.actors])
        self.sink.commit_epoch(self.epoch, {"per_partition": metrics})
        return metrics

    def result(self) -> pa.Table:
        return self.sink.read_committed()
