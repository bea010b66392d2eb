"""Micro-batch streaming driver: push queries over a Parquet stream.

The Ray-native replacement for the reference's push-query path
(`SelectWithEmit`, streams/specification.go:626-655 + the long-poll
reader network/network.go:162-188): instead of holding an HTTP
connection to ksqlDB, the driver consumes a sequence of Parquet
micro-batches (epochs) and runs an incremental pipeline per epoch
(SURVEY.md §2.1 'Push query' RD mapping):

  per epoch:  prep task(s)   — read (column-pruned) -> stream-table
              (parallel       broadcast joins -> WHERE -> vectorized
               per file)      phase-1 partials -> hash-route into P slices
              state actors  — P `StateActor`s (one per key partition; keys
                              never move between actors) merge partials
                              into window state, advance the per-partition
                              watermark, and emit per the EMIT mode
              sink          — each actor writes its own
                              part-{p}-epoch-{e}.parquet (two-phase); the
                              driver commits the epoch in the manifest
                              after every partition acked.

Exactly-once: deterministic routing + idempotent (partition, epoch) sink
files + manifest commit; recovery restores actor state from the latest
checkpoint and replays newer epochs (replayed writes are skipped by the
sink). Metrics per north_rule: rows in/out, late drops, watermark lag.
"""

from __future__ import annotations

import json
import os
import pickle
from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from ..builder import SelectBuilder
from ..catalog import Catalog, Ref
from ..errors import PlanError
from ..expr import Field
from ..exec.bounded import Engine, _auto_name, make_finalizer
from ..exec.groupby import GroupByPlan, SessionGroupByPlan
from ..exec.joins import extract_equi_keys, join_batch, plan_right_renames
from ..windows import Session
from .sink import TwoPhaseSink
from .state import PartitionState


def limit_worker_threads() -> None:
    """Pin Arrow's per-process thread pool inside Ray workers: with many
    concurrent tasks, per-task multithreaded kernels oversubscribe the
    node (measured 4x slowdown at 32 CPUs); 1 kernel thread per worker is
    the right shape when Ray provides the parallelism."""
    try:
        pa.set_cpu_count(1)
        pa.set_io_thread_count(2)
    except Exception:
        pass


def _split_by_part(tbl: pa.Table, num_partitions: int) -> list[pa.Table]:
    """Sort by __part and slice — zero-copy views per partition."""
    si = pc.sort_indices(tbl, sort_keys=[("__part", "ascending")])
    tbl = tbl.take(si)
    parts = tbl.column("__part").to_numpy(zero_copy_only=False)
    out = []
    bounds = np.searchsorted(parts, np.arange(num_partitions + 1))
    for p in range(num_partitions):
        out.append(tbl.slice(bounds[p], bounds[p + 1] - bounds[p]))
    return out


@ray.remote
def _prep_file(
    inputs,
    columns,
    join_specs: list,
    wheres: list,
    plan,
    num_partitions: int,
    pre_transform=None,
    split: bool = True,
    with_max: bool = False,
):
    """Stateless per-epoch prep over one or more micro-batch files:
    read -> pre-transform -> broadcast joins -> filter -> phase-1
    partials.

    With ``split`` (the default, invoked via ``num_returns=P``) the
    routed partials come back as P separate objects — the multi-node
    dispatch point: actor p fetches ONLY object p, so cross-node traffic
    per epoch is each partition's own bytes instead of P x the full
    partial table. Each slice is a zero-copy view of one sorted table;
    Arrow IPC truncates buffers on serialization so object p holds only
    partition p's rows. With ``split=False`` it returns the single
    sorted partial table (actors slice their segment from shared plasma
    — fine on one node, P x amplification across nodes)."""
    limit_worker_threads()
    if isinstance(inputs, (str, pa.Table)):
        inputs = [inputs]
    partials = []
    for path_or_tbl in inputs:
        if isinstance(path_or_tbl, pa.Table):
            batch = path_or_tbl
        else:
            batch = pq.read_table(path_or_tbl, columns=columns)
        if pre_transform is not None:
            batch = pre_transform(batch)
        for build_tbl, how, lk, rk, residual in join_specs:
            if isinstance(build_tbl, ray.ObjectRef):
                build_tbl = ray.get(build_tbl)  # plasma-cached, zero-copy
            batch = join_batch(batch, build_tbl, how, lk, rk, residual)
        if wheres:
            mask = None
            for c in wheres:
                m = c.eval(batch)
                mask = m if mask is None else pc.and_kleene(mask, m)
            batch = batch.filter(pc.fill_null(mask, False))
        if isinstance(plan, SessionGroupByPlan):
            partials.append(plan.sessionize_partial_fn(batch))
        else:
            partials.append(plan.partial_fn(batch))
    out = (
        partials[0]
        if len(partials) == 1
        else pa.concat_tables(partials, promote_options="permissive")
    )
    if split:
        slices = _split_by_part(out, num_partitions)
        if with_max:
            # source-min watermark mode: one extra return — this chunk's
            # max event time (num_returns = P + 1)
            mx = None
            if out.num_rows and "__ts_max" in out.column_names:
                m = pc.max(out.column("__ts_max")).as_py()
                mx = None if m is None else int(m)
            return (*slices, mx)
        # num_returns=1 stores the return value as-is (no unpacking):
        # hand back the bare table so the actor sees a pa.Table either way
        return slices[0] if num_partitions == 1 else tuple(slices)
    # pre-sort by __part so actor-side slicing is a zero-copy view
    return out.take(pc.sort_indices(out, sort_keys=[("__part", "ascending")]))


@ray.remote
class StateActor:
    """One hash partition of keyed window state + its own sink writer.
    Tumbling/hopping use the vectorized Arrow state (VectorPartitionState);
    session windows use the interval-merging PartitionState."""

    def __init__(self, part_id: int, spec: dict, sink_dir: str, finalizer):
        from .state import VectorPartitionState

        limit_worker_threads()
        self.part_id = part_id
        if spec.get("session"):
            self.state = PartitionState(part_id=part_id, **spec["kwargs"])
        else:
            self.state = VectorPartitionState(
                part_id, spec["plan"], spec["lateness_us"], spec["emit"]
            )
        self.sink = TwoPhaseSink(sink_dir)
        self.finalizer = finalizer
        self._src_max: dict = {}  # source-min watermark mode only

    def process(self, epoch: int, *parts) -> dict:
        # parts arrive as top-level args so Ray resolves them BEFORE
        # scheduling this call — a blocking ray.get inside the actor makes
        # the raylet spawn extra workers (observed thrash at 32 cpus).
        # route="p2p": each part is already this partition's own slice
        # (searchsorted finds the whole table). route="broadcast": each
        # part is the FULL partial table sorted by __part; slice this
        # partition's contiguous segment zero-copy.
        #
        # The epoch is the watermark barrier (Spark/ksqlDB micro-batch
        # semantics): ALL of an epoch's partials merge in ONE state
        # transition against the epoch-START watermark, and the watermark
        # advances once, afterwards. Per-part advancement would late-drop
        # intra-epoch disorder (e.g. several source streams whose files
        # interleave at slightly different event times) and pay one state
        # re-merge per part instead of one per epoch.
        mine_parts = []
        for t in parts:
            if not t.num_rows:
                continue
            pcol = t.column("__part").to_numpy(zero_copy_only=False)
            lo = np.searchsorted(pcol, self.part_id, side="left")
            hi = np.searchsorted(pcol, self.part_id, side="right")
            if hi > lo:
                mine_parts.append(
                    t.slice(lo, hi - lo).drop_columns(["__part"]))
        out = None
        if mine_parts:
            mine = (mine_parts[0] if len(mine_parts) == 1 else
                    pa.concat_tables(mine_parts, promote_options="permissive"))
            out = self.state.process(mine)
        if out is not None and out.num_rows:
            final = self.finalizer(out)
            if final.num_rows:
                self.sink.write(self.part_id, epoch, final)
        return self.state.metrics()

    def process_srcmin(self, epoch: int, srcs: tuple, n_preps: int,
                       *maxes_then_parts) -> dict:
        """Source-min watermark mode: the first ``n_preps`` args are the
        prep chunks' max event times (each chunk covers ONE source), the
        rest are the routed partial slices. Every actor folds the same
        (source, max) pairs, so the cross-source floor — min over the
        running per-source maxima — is identical in every partition and
        the per-partition watermark stays monotone. A slow source holds
        the watermark back (Flink-style multi-input watermarking), which
        is what makes interleaved multi-source merges lossless without
        lateness tuning."""
        maxes = maxes_then_parts[:n_preps]
        parts = maxes_then_parts[n_preps:]
        for src, m in zip(srcs, maxes):
            if m is not None:
                cur = self._src_max.get(src)
                self._src_max[src] = m if cur is None else max(cur, m)
        cap = min(self._src_max.values()) if self._src_max else None
        mine_parts = []
        for t in parts:
            if not t.num_rows:
                continue
            pcol = t.column("__part").to_numpy(zero_copy_only=False)
            lo = np.searchsorted(pcol, self.part_id, side="left")
            hi = np.searchsorted(pcol, self.part_id, side="right")
            if hi > lo:
                mine_parts.append(
                    t.slice(lo, hi - lo).drop_columns(["__part"]))
        out = None
        if mine_parts:
            mine = (mine_parts[0] if len(mine_parts) == 1 else
                    pa.concat_tables(mine_parts, promote_options="permissive"))
            out = self.state.process(mine, wm_target=cap)
        if out is not None and out.num_rows:
            final = self.finalizer(out)
            if final.num_rows:
                self.sink.write(self.part_id, epoch, final)
        return self.state.metrics()

    def flush(self, epoch: int) -> dict:
        out = self.state.flush()
        if out.num_rows:
            final = self.finalizer(out)
            if final.num_rows:
                self.sink.write(self.part_id, epoch, final)
        return self.state.metrics()

    def checkpoint(self, epoch: int, ckpt_dir: str) -> str:
        import pickle

        os.makedirs(ckpt_dir, exist_ok=True)
        final = os.path.join(ckpt_dir, f"state-{self.part_id:04d}-epoch-{epoch:06d}.pkl")
        tmp = final + ".tmp"
        with open(tmp, "wb") as f:
            f.write(pickle.dumps({"v": 2, "state": self.state.snapshot(),
                                  "src_max": self._src_max}))
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, final)
        return final

    def restore(self, path: str) -> None:
        import pickle

        with open(path, "rb") as f:
            blob = f.read()
        doc = pickle.loads(blob)
        if isinstance(doc, dict) and doc.get("v") == 2:
            self.state.restore(doc["state"])
            self._src_max = doc["src_max"]
        else:  # pre-source-mode snapshot: raw state bytes
            self.state.restore(blob)


def _project_fields(batch: pa.Table, wheres: list, fields: list) -> pa.Table:
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
            v = pa.nulls(n, type=v.type) if not v.is_valid else pa.array(
                [v.as_py()] * n, type=v.type
            )
        cols.append(v)
        names.append(e.output_name())
    return pa.table(dict(zip(names, cols)))


@ray.remote
def _project_file(
    path_or_tbl, columns, join_specs: list, wheres: list, fields: list,
    sink_dir: str, partition: int, epoch: int,
):
    """Stateless push-query epoch: read -> joins -> WHERE -> projection ->
    two-phase sink. One task per input file (no state, no shuffle). For a
    tracked (RIGHT/OUTER) join the build side carries a ``__bid`` row id;
    the task reports which build rows matched so the driver can emit the
    never-matched pads exactly once at end-of-stream."""
    if isinstance(path_or_tbl, pa.Table):
        batch = path_or_tbl
    else:
        batch = pq.read_table(path_or_tbl, columns=columns)
    from ..exec.joins import join_batch

    matched: list = []
    for build_tbl, how, lk, rk, residual in join_specs:
        if isinstance(build_tbl, ray.ObjectRef):
            build_tbl = ray.get(build_tbl)
        tracked = "__bid" in build_tbl.column_names
        batch = join_batch(batch, build_tbl, how, lk, rk, residual)
        if tracked:
            bid = batch.column("__bid")
            if isinstance(bid, pa.ChunkedArray):
                bid = bid.combine_chunks()
            ids = bid.drop_null().to_numpy(zero_copy_only=False)
            matched.append(np.unique(ids))
            batch = batch.drop_columns(["__bid"])
    out = _project_fields(batch, wheres, fields)
    sink = TwoPhaseSink(sink_dir)
    if out.num_rows:
        sink.write(partition, epoch, out)
    return out.num_rows, matched


class StreamingProjectJob:
    """Stateless push query: SELECT + WHERE (+ broadcast joins) with
    EMIT CHANGES over a micro-batch stream — the `SelectWithEmit`
    filter/projection shape (streams/specification.go:626-655,
    select_builder_test.go:615). No shuffle, no state: each input file
    becomes one idempotent (partition=file-index, epoch) sink write.

    RIGHT/FULL-OUTER stream-table joins (reference verbs
    ksql/select_builder.go:353-374) keep one matched-bitmap per build
    row on the driver (the only state — build-side sized, broadcast
    small): per epoch the probe emits INNER (right) or LEFT (outer)
    results, and ``finish()`` null-pads the never-matched build rows
    exactly once at end-of-stream. Supported for single-join queries."""

    def __init__(self, builder: SelectBuilder, catalog: Catalog, out_dir: str):
        builder.validate(catalog)
        if builder.groupby or builder.window is not None:
            raise PlanError("use StreamingJob for aggregating push queries")
        rel = builder._source_relation(catalog)
        self.builder = builder
        self.rel = rel
        self.sink = TwoPhaseSink(out_dir)
        eng = Engine(catalog)
        aggs: list = []
        self.columns = eng._needed_columns(builder, rel, aggs) or None
        self.join_specs = []
        self._pad_joins: list[tuple[int, pa.Table]] = []  # (spec idx, build)
        self._matched: list[np.ndarray] = []
        left_names = set(rel.schema.names)
        tracked_hows = {"right": "inner", "outer": "left"}
        if sum(1 for j in builder.joins if j.how in tracked_hows) > 1 or (
            any(j.how in tracked_hows for j in builder.joins)
            and len(builder.joins) > 1
        ):
            raise PlanError(
                "streaming RIGHT/OUTER stream-table joins support "
                "single-join queries"
            )
        for j in builder.joins:
            jrel = catalog.get(j.source.name)
            if j.how not in ("inner", "left", "cross", "right", "outer"):
                raise PlanError("unsupported push-query join type")
            alias = j.source.alias or j.source.name
            lk, rk, residual = extract_equi_keys(
                j.conds, left_names, set(jrel.schema.names), alias
            )
            renames = plan_right_renames(left_names, jrel.schema, rk, lk, alias)
            rk = [renames.get(k, k) for k in rk]
            build = pq.read_table(jrel.path)
            if renames:
                build = build.rename_columns(
                    [renames.get(n, n) for n in build.column_names]
                )
            how = j.how
            if j.how in tracked_hows:
                build = build.append_column(
                    "__bid", pa.array(np.arange(build.num_rows), type=pa.int64())
                )
                self._pad_joins.append((len(self.join_specs), build, list(lk), list(rk)))
                self._matched.append(np.zeros(build.num_rows, dtype=bool))
                how = tracked_hows[j.how]
            self.join_specs.append((ray.put(build), how, lk, rk, residual))
            left_names |= {renames.get(n, n) for n in jrel.schema.names}
        self._join_ref = ray.put(self.join_specs)
        self._wheres_ref = ray.put(list(builder.wheres))
        self._fields_ref = ray.put(list(builder.fields))
        self.epoch = -1

    def process_epoch(self, files_or_tables: Sequence) -> int:
        self.epoch += 1
        refs = [
            _project_file.remote(
                x, self.columns, self._join_ref, self._wheres_ref,
                self._fields_ref, self.sink.out_dir, i, self.epoch,
            )
            for i, x in enumerate(files_or_tables)
        ]
        results = ray.get(refs)
        n = 0
        for rows, matched in results:
            n += rows
            for k, ids in enumerate(matched):
                if len(ids):
                    self._matched[k][ids] = True
        self.sink.commit_epoch(self.epoch)
        return n

    def run(self, files: Sequence[str], files_per_epoch: int = 4) -> None:
        batch: list[str] = []
        for f in files:
            batch.append(f)
            if len(batch) >= files_per_epoch:
                self.process_epoch(batch)
                batch = []
        if batch:
            self.process_epoch(batch)

    def finish(self) -> int:
        """End-of-stream: emit the never-matched build rows of RIGHT/OUTER
        joins, null-padded for the stream side, through the same WHERE +
        projection (exactly once, own sink epoch)."""
        if not self._pad_joins:
            return 0
        self.epoch += 1
        n = 0
        for k, (_idx, build, lk, rk) in enumerate(self._pad_joins):
            unmatched = build.filter(pa.array(~self._matched[k]))
            if unmatched.num_rows == 0:
                continue
            cols: dict = {}
            for f in self.rel.schema:
                if f.name not in unmatched.column_names:
                    cols[f.name] = pa.nulls(unmatched.num_rows, type=f.type)
            for name in unmatched.column_names:
                if name != "__bid":
                    cols[name] = unmatched.column(name)
            # USING-style key coalescing: pads carry the build-side key
            # value in the stream-side key column (same as the bounded
            # shuffle join's coalesced output)
            for lkc, rkc in zip(lk, rk):
                if lkc != rkc and rkc in unmatched.column_names:
                    cols[lkc] = pc.cast(
                        unmatched.column(rkc), self.rel.schema.field(lkc).type
                    ) if lkc in self.rel.schema.names else unmatched.column(rkc)
            pad = pa.table(cols)
            out = _project_fields(pad, list(self.builder.wheres), list(self.builder.fields))
            if out.num_rows:
                self.sink.write(10_000 + k, self.epoch, out)
                n += out.num_rows
        self.sink.commit_epoch(self.epoch)
        return n

    def result(self) -> pa.Table:
        return self.sink.read_committed()


class StreamingJob:
    """A continuous windowed-aggregate (+ broadcast-join) push query."""

    def __init__(
        self,
        builder: SelectBuilder,
        catalog: Catalog,
        out_dir: str,
        num_partitions: int = 8,
        lateness_us: int = 0,
        checkpoint_dir: str | None = None,
        checkpoint_every: int = 0,
        resume: bool = False,
        pre_transform=None,
        files_per_task: int = 1,
        salt_by_window: bool = False,
        route: str = "p2p",
        source_of=None,
    ):
        """``pre_transform``: optional vectorized batch fn (e.g. token
        counting / quality scoring from ops.text) applied in the prep
        task before joins — user UDF stages, SURVEY.md §2.10.

        ``route``: ``"p2p"`` (default) splits each prep task's partials
        into P separate return objects routed point-to-point to their
        state actor — the multi-node shape (per-epoch network is each
        partition's own bytes). ``"broadcast"`` returns one partial table
        per prep task and every actor slices its segment — equivalent
        output, P x network amplification on a real cluster; kept for
        single-node A/B measurement."""
        builder.validate(catalog)
        if not builder.groupby:
            raise PlanError("streaming jobs require a GROUP BY query")
        if builder.window is None and builder.emit != "changes":
            raise PlanError(
                "unwindowed stream aggregation requires EMIT CHANGES "
                "(ksql/select_builder.go:131-137)"
            )
        rel = builder._source_relation(catalog)
        self.builder = builder
        self.catalog = catalog
        self.num_partitions = num_partitions
        self.emit = "final" if builder.emit == "final" else "changes"
        self.sink = TwoPhaseSink(out_dir)
        self.checkpoint_dir = checkpoint_dir
        self.checkpoint_every = checkpoint_every

        eng = Engine(catalog, num_partitions=num_partitions)
        aggs = builder._agg_exprs()
        self.aggs = aggs
        schema = builder.input_schema(catalog)

        # ---- stream-table joins -------------------------------------------
        # PK-join deferral (the classic streaming planner rewrite): when an
        # INNER join's build side is a TABLE keyed by its join key, the
        # stream-side key is a GROUP BY key, and the build side's columns
        # only feed the projection / group keys (never WHERE or aggregate
        # args), the join moves AFTER aggregation — the per-batch build-side
        # hash probe (the prep hot spot, measured) happens only on emitted
        # rows. Build-side group keys are dropped from the physical grouping
        # (functionally dependent on the PK) and re-attached at finalize.
        prep_joins = []
        deferred = []  # (build_ref, stream_key_name, jrel column names)
        where_cols: set[str] = set()
        for c in builder.wheres:
            where_cols |= c.columns()
        agg_cols: set[str] = set()
        for a in aggs:
            agg_cols |= a.columns()
        gb_bare = {
            e.name for e in builder.groupby if isinstance(e, Field)
        }
        left_names = set(rel.schema.names)
        for j in builder.joins:
            jrel = catalog.get(j.source.name)
            if j.how not in ("inner", "left", "cross"):
                raise PlanError(
                    "streaming supports broadcast stream-table joins "
                    "(INNER/LEFT/CROSS) in v1"
                )
            alias = j.source.alias or j.source.name
            lk, rk, residual = extract_equi_keys(
                j.conds, left_names, set(jrel.schema.names), alias
            )
            jcols = set(jrel.schema.names)
            can_defer = (
                j.how == "inner"
                and not residual
                and jrel.kind is Ref.TABLE
                and jrel.primary_key is not None
                and rk == [jrel.primary_key]
                and len(lk) == 1
                and lk[0] in gb_bare
                and not (jcols - {jrel.primary_key}) & where_cols
                and not (jcols - {jrel.primary_key}) & agg_cols
            )
            if can_defer:
                build = pq.read_table(jrel.path)
                deferred.append((ray.put(build), lk[0], jrel.primary_key, jcols))
                continue
            renames = plan_right_renames(left_names, jrel.schema, rk, lk, alias)
            rk = [renames.get(k, k) for k in rk]
            build = pq.read_table(jrel.path)
            if renames:
                build = build.rename_columns(
                    [renames.get(n, n) for n in build.column_names]
                )
            prep_joins.append((ray.put(build), j.how, lk, rk, residual))
            left_names |= {renames.get(n, n) for n in jrel.schema.names}
        self.join_specs = prep_joins

        deferred_cols: set[str] = set()
        for _, sk, _pk, jcols in deferred:
            deferred_cols |= jcols - {sk}
        physical_groupby = [
            e for e in builder.groupby
            if not (isinstance(e, Field) and e.name in deferred_cols)
        ]

        if isinstance(builder.window, Session):
            plan = SessionGroupByPlan(
                physical_groupby, aggs, rel.order_cols, builder.window,
                rel.timestamp_col, num_partitions,
            )
        else:
            plan = GroupByPlan(
                physical_groupby, aggs, rel.order_cols, builder.window,
                rel.timestamp_col, num_partitions, include_ts=True,
                salt_by_window=salt_by_window,
            )
        self.plan = plan

        import copy as _copy

        fin_builder = builder
        if deferred:
            fin_builder = _copy.copy(builder)
            fin_builder.groupby = physical_groupby
        base_finalizer = make_finalizer(fin_builder, plan, [_auto_name(a) for a in aggs])
        if deferred:
            key_pos = {
                e.name: f"__k{jdx}"
                for jdx, e in enumerate(physical_groupby)
                if isinstance(e, Field)
            }
            join_plan = [
                (ref, key_pos[sk], pk) for ref, sk, pk, _ in deferred
            ]

            def finalizer(batch: pa.Table, _base=base_finalizer, _jp=join_plan):
                for ref, kcol, pkname in _jp:
                    build = ray.get(ref) if isinstance(ref, ray.ObjectRef) else ref
                    batch = batch.join(
                        build, keys=[kcol], right_keys=[pkname],
                        join_type="inner", use_threads=False,
                    )
                return _base(batch)

            self.finalizer = finalizer
        else:
            self.finalizer = base_finalizer

        # column pruning at the read (same rule as the bounded engine).
        # A pre_transform may consume columns the query never names and
        # produce columns not in the file, so pruning needs its declared
        # contract: read = (query-needed - produced) | consumed. Without
        # declared `input_columns`/`output_columns` attributes, pruning is
        # disabled (the UDF is a black box).
        needed = eng._needed_columns(builder, rel, aggs)
        # the streaming partial plan ALWAYS tracks per-key event time
        # (__ts, for watermarks/metrics) — keep the timestamp column in
        # the pruned read even when the query itself never names it
        # (unwindowed EMIT CHANGES over files hit this: the bounded
        # _needed_columns only adds ts_col for windowed queries)
        if needed and rel.timestamp_col and rel.timestamp_col not in needed:
            keep = set(needed) | {rel.timestamp_col}
            needed = [n for n in rel.schema.names if n in keep]
        if pre_transform is None:
            self.columns = needed or None
        else:
            in_cols = getattr(pre_transform, "input_columns", None)
            out_cols = getattr(pre_transform, "output_columns", None)
            if needed and in_cols is not None and out_cols is not None:
                want = (set(needed) - set(out_cols)) | set(in_cols)
                self.columns = [n for n in rel.schema.names if n in want] or None
            else:
                self.columns = None

        # key_types must align with plan.key_names, which are derived from
        # physical_groupby (deferred-PK group keys are dropped there); using
        # builder.groupby here mis-zips types when a dropped key precedes a
        # kept one.
        key_types = [e.out_type(schema) for e in physical_groupby]
        agg_types = [a.out_type(schema) for a in aggs]
        if isinstance(builder.window, Session):
            spec = {
                "session": True,
                "kwargs": dict(
                    aggs=aggs,
                    key_names=plan.key_names,
                    ord_names=plan.ord_names,
                    window=builder.window,
                    lateness_us=lateness_us,
                    emit=self.emit,
                    key_types=key_types,
                    agg_types=agg_types,
                ),
            }
        else:
            spec = {
                "session": False,
                "plan": plan,
                "lateness_us": lateness_us,
                "emit": self.emit,
            }
        self.spec = spec
        self.actors = [
            StateActor.remote(p, spec, out_dir, self.finalizer)
            for p in range(num_partitions)
        ]

        self.pre_transform = pre_transform
        self.files_per_task = files_per_task
        if route not in ("p2p", "broadcast"):
            raise PlanError(f"route must be 'p2p' or 'broadcast', got {route!r}")
        if source_of is not None and route != "p2p":
            raise PlanError("source_of (source-min watermarks) requires route='p2p'")
        self.source_of = source_of
        self.route = route
        # ship per-epoch-invariant objects to the object store ONCE; the
        # prep tasks receive refs (auto-dereferenced), not fresh pickles
        self._plan_ref = ray.put(self.plan)
        self._wheres_ref = ray.put(list(builder.wheres))
        self._join_specs_ref = ray.put(self.join_specs)

        self.epoch = -1
        self.metrics_log: list[dict] = []
        self._resume_cursor = -1
        if resume:
            self._restore()

    # ------------------------------------------------------------------
    @property
    def ckpt_manifest(self) -> str:
        return os.path.join(self.checkpoint_dir, "checkpoint.json")

    def _restore(self) -> None:
        if not self.checkpoint_dir or not os.path.exists(self.ckpt_manifest):
            return
        with open(self.ckpt_manifest) as f:
            doc = json.load(f)
        epoch = doc["epoch"]
        ray.get(
            [
                a.restore.remote(
                    os.path.join(
                        self.checkpoint_dir,
                        f"state-{p:04d}-epoch-{epoch:06d}.pkl",
                    )
                )
                for p, a in enumerate(self.actors)
            ]
        )
        # the epoch counter restarts at -1: the caller re-feeds the stream
        # from the beginning and epochs <= cursor are skipped (their effect
        # is already in the restored state; their sink files already exist)
        self.epoch = -1
        self._resume_cursor = epoch

    def reshard_from(self, old_dir: str) -> dict:
        """Re-shard a checkpoint taken at a DIFFERENT partition count
        into THIS job's ``checkpoint_dir`` / ``num_partitions`` — the
        N -> 4N cluster-rescale path: take a checkpoint on the small
        cluster, reshard, resume on the big one (``resume=True`` on a
        job constructed with the new partition count).

        Every keyed state entry lives in exactly ONE old partition
        (routing is a deterministic key hash), so resharding is pure
        re-bucketing — no merge logic: vectorized-state rows re-route
        via the same ``hash_partition_ids`` the prep tasks use; session
        dict entries re-route by their key tuple cast to the plan's key
        types (type width changes the hash — the cast is load-bearing).
        Watermarks take the min over old partitions (identical in
        practice: every actor folds the same epoch watermark);
        src_max folds elementwise-min (conservative: a lower floor
        never late-drops rows the old run kept). rows_in/out and
        late_drop counters ride on partition 0 so job-level sums are
        preserved. Returns {epoch, old_partitions, new_partitions}.

        Reshard an IN-FLIGHT job's checkpoint (crashed / paused mid-
        stream), not a finished one: ``finish()`` flushes under the
        final epoch's part ids, and a resharded resume that finishes
        AGAIN re-flushes keys now routed to part ids whose flush file
        doesn't exist yet — double emission (same reason resuming any
        completed job is undefined; with unchanged P the idempotent
        sink happens to mask it)."""
        import glob as _glob

        from ..exec.groupby import hash_partition_ids

        if not self.checkpoint_dir:
            raise PlanError("reshard_from requires checkpoint_dir on "
                            "the new job")
        with open(os.path.join(old_dir, "checkpoint.json")) as f:
            doc = json.load(f)
        epoch = doc["epoch"]
        paths = sorted(_glob.glob(os.path.join(
            old_dir, f"state-*-epoch-{epoch:06d}.pkl")))
        if not paths:
            raise PlanError(f"no state snapshots for epoch {epoch} "
                            f"in {old_dir}")
        old_p = doc.get("num_partitions", len(paths))
        new_p = self.num_partitions
        plan = self.plan
        part_cols = (
            plan.key_names
            if (plan.include_ts and plan.key_names
                and not plan.salt_by_window)
            else plan.all_keys
        )
        if self.spec.get("session"):
            key_types = list(self.spec["kwargs"]["key_types"])
            nk = len(plan.key_names)

            def route_keys(keys: list[tuple]) -> np.ndarray:
                cols = {
                    n: pa.array([k[i] for k in keys], type=key_types[i])
                    for i, n in enumerate(plan.key_names)
                }
                return hash_partition_ids(pa.table(cols),
                                          plan.key_names, new_p)

        vec_slices: list[list[pa.Table]] = [[] for _ in range(new_p)]
        d_state: list[dict] = [dict() for _ in range(new_p)]
        d_sessions: list[dict] = [dict() for _ in range(new_p)]
        wms, src_max = [], {}
        rows_in = rows_out = late = 0
        session_mode = None
        for path in paths:
            with open(path, "rb") as f:
                blob = f.read()
            outer = pickle.loads(blob)
            if isinstance(outer, dict) and outer.get("v") == 2:
                state_blob, sm = outer["state"], outer.get("src_max", {})
            else:
                state_blob, sm = blob, {}
            for s, m in sm.items():
                cur = src_max.get(s)
                src_max[s] = m if cur is None else min(cur, m)
            d = pickle.loads(state_blob)
            wms.append(d["watermark"])
            rows_in += d["rows_in"]
            rows_out += d["rows_out"]
            late += d["late_drops"]
            if "vec_state" in d:
                session_mode = False
                st = d["vec_state"]
                if st is not None and st.num_rows:
                    ids = hash_partition_ids(st, part_cols, new_p)
                    order = np.argsort(ids, kind="stable")
                    s = st.take(pa.array(order))
                    b = np.searchsorted(ids[order], np.arange(new_p + 1))
                    for q in range(new_p):
                        if b[q + 1] > b[q]:
                            vec_slices[q].append(
                                s.slice(b[q], b[q + 1] - b[q]))
            else:
                session_mode = True
                skeys = list(d["state"].keys())
                if skeys:
                    for k, q in zip(skeys, route_keys(
                            [k[:nk] for k in skeys])):
                        d_state[q][k] = d["state"][k]
                wkeys = list(d["sessions"].keys())
                if wkeys:
                    for k, q in zip(wkeys, route_keys(wkeys)):
                        d_sessions[q][k] = d["sessions"][k]
        wm = min(wms)
        os.makedirs(self.checkpoint_dir, exist_ok=True)
        for q in range(new_p):
            if session_mode:
                inner = {
                    "state": d_state[q], "sessions": d_sessions[q],
                    "watermark": wm,
                    "rows_in": rows_in if q == 0 else 0,
                    "rows_out": rows_out if q == 0 else 0,
                    "late_drops": late if q == 0 else 0,
                }
            else:
                vt = (pa.concat_tables(vec_slices[q],
                                       promote_options="permissive")
                      if vec_slices[q] else None)
                inner = {
                    "vec_state": vt, "watermark": wm,
                    "rows_in": rows_in if q == 0 else 0,
                    "rows_out": rows_out if q == 0 else 0,
                    "late_drops": late if q == 0 else 0,
                }
            final = os.path.join(
                self.checkpoint_dir,
                f"state-{q:04d}-epoch-{epoch:06d}.pkl")
            tmp = final + ".tmp"
            with open(tmp, "wb") as f:
                f.write(pickle.dumps({
                    "v": 2, "state": pickle.dumps(inner),
                    "src_max": dict(src_max)}))
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, final)
        tmp = self.ckpt_manifest + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"epoch": epoch, "num_partitions": new_p}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.ckpt_manifest)
        # adopt the resharded checkpoint exactly like resume=True
        self._restore()
        return {"epoch": epoch, "old_partitions": old_p,
                "new_partitions": new_p}

    def _maybe_checkpoint(self) -> None:
        if not self.checkpoint_dir or not self.checkpoint_every:
            return
        if (self.epoch + 1) % self.checkpoint_every != 0:
            return
        ray.get([a.checkpoint.remote(self.epoch, self.checkpoint_dir) for a in self.actors])
        tmp = self.ckpt_manifest + ".tmp"
        with open(tmp, "w") as f:
            json.dump({"epoch": self.epoch,
                       "num_partitions": self.num_partitions}, f)
            f.flush()
            os.fsync(f.fileno())
        os.replace(tmp, self.ckpt_manifest)

    # ------------------------------------------------------------------
    def _submit_epoch(self, files_or_tables: Sequence):
        """Submit one epoch without waiting: prep tasks fan out per file,
        each returning P slices as P separate ObjectRefs (routed partials
        flow worker -> actor through the object store, never the driver).
        Actor call order per actor preserves epoch order, so multiple
        epochs can be in flight while state updates stay sequential."""
        self.epoch += 1
        if self.epoch <= self._resume_cursor:
            return None  # already reflected in restored state
        inputs = list(files_or_tables)
        fpt = max(1, self.files_per_task)
        acks = []
        if self.source_of is not None:
            # source-min watermark mode: each prep chunk covers ONE
            # source (its max event time feeds that source's running
            # maximum); the watermark floor = min over sources, so a
            # slow source holds the watermark back and interleaved
            # multi-source merges stay lossless without lateness tuning
            by_src: dict = {}
            for f in inputs:
                by_src.setdefault(self.source_of(f), []).append(f)
            chunks, srcs = [], []
            for src, fl in by_src.items():
                for i in range(0, len(fl), fpt):
                    chunks.append(fl[i : i + fpt])
                    srcs.append(src)
            prep_refs = [
                _prep_file.options(
                    num_returns=self.num_partitions + 1).remote(
                    chunk, self.columns, self._join_specs_ref,
                    self._wheres_ref, self._plan_ref, self.num_partitions,
                    self.pre_transform, True, True,
                )
                for chunk in chunks
            ]
            maxes = [rs[self.num_partitions] for rs in prep_refs]
            for p, actor in enumerate(self.actors):
                acks.append(actor.process_srcmin.remote(
                    self.epoch, tuple(srcs), len(maxes), *maxes,
                    *[rs[p] for rs in prep_refs]))
            ckpt_refs = None
            if (self.checkpoint_dir and self.checkpoint_every
                    and (self.epoch + 1) % self.checkpoint_every == 0):
                ckpt_refs = [
                    a.checkpoint.remote(self.epoch, self.checkpoint_dir)
                    for a in self.actors
                ]
            return (self.epoch, acks, ckpt_refs)
        chunks = [inputs[i : i + fpt] for i in range(0, len(inputs), fpt)]
        if self.route == "p2p":
            # point-to-point: each prep task returns P objects; actor p's
            # call references only the p-th return of every task, so only
            # partition p's bytes move to actor p's node.
            prep_refs = [
                _prep_file.options(num_returns=self.num_partitions).remote(
                    chunk, self.columns, self._join_specs_ref,
                    self._wheres_ref, self._plan_ref, self.num_partitions,
                    self.pre_transform, True,
                )
                for chunk in chunks
            ]
            if self.num_partitions == 1:
                prep_refs = [[r] for r in prep_refs]
            for p, actor in enumerate(self.actors):
                acks.append(
                    actor.process.remote(self.epoch, *[rs[p] for rs in prep_refs])
                )
        else:
            prep_refs = [
                _prep_file.remote(
                    chunk, self.columns, self._join_specs_ref,
                    self._wheres_ref, self._plan_ref, self.num_partitions,
                    self.pre_transform, False,
                )
                for chunk in chunks
            ]
            for p, actor in enumerate(self.actors):
                acks.append(actor.process.remote(self.epoch, *prep_refs))
        ckpt_refs = None
        if (
            self.checkpoint_dir
            and self.checkpoint_every
            and (self.epoch + 1) % self.checkpoint_every == 0
        ):
            # enqueue right behind process: actor queue order guarantees the
            # snapshot reflects exactly this epoch
            ckpt_refs = [
                a.checkpoint.remote(self.epoch, self.checkpoint_dir)
                for a in self.actors
            ]
        return (self.epoch, acks, ckpt_refs)

    def _drain_epoch(self, pending) -> list[dict]:
        epoch, acks, ckpt_refs = pending
        metrics = ray.get(acks)
        self.sink.commit_epoch(epoch, {"per_partition": metrics})
        self.metrics_log.append({"epoch": epoch, "partitions": metrics})
        if ckpt_refs is not None:
            ray.get(ckpt_refs)
            tmp = self.ckpt_manifest + ".tmp"
            with open(tmp, "w") as f:
                json.dump({"epoch": epoch,
                           "num_partitions": self.num_partitions}, f)
                f.flush()
                os.fsync(f.fileno())
            os.replace(tmp, self.ckpt_manifest)
        return metrics

    def process_epoch(self, files_or_tables: Sequence) -> list[dict] | None:
        pending = self._submit_epoch(files_or_tables)
        if pending is None:
            return None
        return self._drain_epoch(pending)

    def run(
        self,
        files: Sequence[str],
        files_per_epoch: int = 1,
        max_inflight: int = 4,
    ) -> None:
        """Process the stream with up to ``max_inflight`` epochs pipelined
        (commits still happen strictly in epoch order)."""
        from collections import deque

        inflight: deque = deque()
        batch: list[str] = []

        def flush_batch(b):
            pending = self._submit_epoch(b)
            if pending is not None:
                inflight.append(pending)
            while len(inflight) >= max_inflight:
                self._drain_epoch(inflight.popleft())

        for f in files:
            batch.append(f)
            if len(batch) >= files_per_epoch:
                flush_batch(batch)
                batch = []
        if batch:
            flush_batch(batch)
        while inflight:
            self._drain_epoch(inflight.popleft())

    def finish(self) -> list[dict]:
        """Flush all open windows (end-of-stream) and commit."""
        self.epoch += 1
        metrics = ray.get([a.flush.remote(self.epoch) for a in self.actors])
        self.sink.commit_epoch(self.epoch, {"per_partition": metrics})
        return metrics

    def result(self) -> pa.Table:
        return self.sink.read_committed()
