"""Bounded (pull-query) execution: logical plan -> ray.data.Dataset.

This is the engine behind ``SelectOnce`` semantics
(streams/specification.go:588-620 in the reference — there it snapshots a
remote ksqlDB materialization; here the pipeline IS the engine):

  read_parquet(columns=pruned)               -- prune at the read
    -> [broadcast | shuffle joins]           -- §2.5
    -> map_batches(filter+project fused)     -- §2.2, zero-copy Arrow
    -> two-phase grouped aggregation         -- §2.3 (exec/groupby.py)
    -> HAVING filter                         -- §2.3
    -> sort                                  -- §2.6 (bounded output only)

Everything stays a lazy streaming Dataset; nothing materializes except
the small build sides of broadcast joins.
"""

from __future__ import annotations

import os
from typing import Sequence

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray
import ray.data

from ..aggregates import AggExpr
from ..builder import JoinClause, SelectBuilder
from ..catalog import Catalog, Ref, Relation
from ..errors import PlanError
from ..expr import Expr, Field, Order
from ..windows import Hopping, Session, Tumbling
from .groupby import DEFAULT_NUM_PARTITIONS, GroupByPlan, SessionGroupByPlan
from .joins import (
    BROADCAST_MAX_BYTES,
    extract_equi_keys,
    join_batch,
    plan_right_renames,
    shuffle_join,
)


def _pin_once():
    """Pin Arrow's thread pool inside Ray Data worker processes (see
    streaming.driver.limit_worker_threads — measured oversubscription);
    no-op after the first call per process."""
    if not getattr(_pin_once, "_done", False):
        try:
            pa.set_cpu_count(1)
            pa.set_io_thread_count(2)
        except Exception:
            pass
        _pin_once._done = True


@ray.remote
def _merge_small(merge_fn, finalize_fn, *tables):
    """Single-task merge of small combined partials (<= SMALL_MERGE_BYTES):
    identical result to the distributed groupby (the merge sorts by group
    keys and reduces contiguous segments) without its ~2.4 s fixed shuffle
    cost, and without using driver heap."""
    _pin_once()
    live = [t for t in tables if t.num_rows]
    whole = live[0] if len(live) == 1 else pa.concat_tables(
        live, promote_options="permissive"
    )
    return finalize_fn(merge_fn(whole))


def _pinned(fn):
    """Wrap a batch fn so the worker process pins kernel threads first."""
    import functools

    @functools.wraps(fn)
    def wrapped(batch):
        _pin_once()
        return fn(batch)

    return wrapped


def _to_array(v, n: int):
    if isinstance(v, pa.Scalar):
        if not v.is_valid:
            return pa.nulls(n, type=v.type if not pa.types.is_null(v.type) else pa.null())
        return pa.array([v.as_py()] * n, type=v.type)
    return v


def _auto_name(agg: AggExpr) -> str:
    return agg.auto_name()


def make_finalizer(b: SelectBuilder, plan, agg_names: list[str]):
    """Build the (picklable) post-aggregation shaping function shared by
    the bounded engine and the streaming state actors: rename internal
    key/agg columns, materialize window bounds, apply HAVING, project.

    Input batch columns: plan.key_names + (__ws | window_start/window_end)
    + __agg{i}; output: the query's public schema (Returns() semantics)."""
    from ..windows import Session

    key_out_names = [e.output_name() for e in b.groupby]
    gb_key_map = {e.key(): out for e, out in zip(b.groupby, key_out_names)}
    win = b.window
    havings = list(b.havings)
    fields = list(b.fields)
    key_names = list(plan.key_names)
    final_agg_names = list(agg_names)

    def finalize_fn(batch: pa.Table) -> pa.Table:
        names = list(batch.column_names)
        mapping = {}
        for kn, out in zip(key_names, key_out_names):
            mapping[kn] = out
        for i, an in enumerate(final_agg_names):
            mapping[f"__agg{i}"] = an
        batch = batch.rename_columns([mapping.get(n, n) for n in names])
        n = batch.num_rows
        if win is not None and not isinstance(win, Session):
            ws = batch.column("__ws")
            batch = batch.drop_columns(["__ws"])
            start = pc.cast(ws, pa.timestamp("us"))
            end = pc.cast(pc.add(ws, win.size_us), pa.timestamp("us"))
            batch = batch.append_column("window_start", start)
            batch = batch.append_column("window_end", end)
        if havings:
            mask = None
            for c in havings:
                m = c.eval(batch)
                mask = m if mask is None else pc.and_kleene(mask, m)
            batch = batch.filter(pc.fill_null(mask, False))
            n = batch.num_rows
        cols, names_out = [], []
        if win is not None:
            for wc in ("window_start", "window_end"):
                cols.append(batch.column(wc))
                names_out.append(wc)
        for e in fields:
            if e.key() in gb_key_map:
                cols.append(batch.column(gb_key_map[e.key()]))
            else:
                cols.append(_to_array(e.eval(batch), n))
            names_out.append(e.output_name())
        return pa.table(dict(zip(names_out, cols)))

    return finalize_fn


class Engine:
    """Executes validated SelectBuilder plans on Ray Data."""

    def __init__(
        self,
        catalog: Catalog,
        num_partitions: int | None = None,
        broadcast_max_bytes: int = BROADCAST_MAX_BYTES,
        allow_large_cross: bool = False,
    ):
        self.catalog = catalog
        if num_partitions is None:
            # phase-2 merge partitions: enough for parallel merge, few
            # enough that the partial shuffle's per-block overhead stays low
            ncpu = int(ray.available_resources().get("CPU", 8)) if ray.is_initialized() else 8
            num_partitions = max(4, min(DEFAULT_NUM_PARTITIONS, ncpu))
        self.num_partitions = num_partitions
        self.broadcast_max_bytes = broadcast_max_bytes
        # CROSS with a build side too large to broadcast is a deliberate
        # opt-in (block-nested-loop; output is the row-count product)
        self.allow_large_cross = allow_large_cross

    # ------------------------------------------------------------------
    def dataset(self, b: SelectBuilder) -> ray.data.Dataset:
        b.validate(self.catalog)
        rel = b._source_relation(self.catalog)
        aggs = self._unique_aggs(b)
        needed = self._needed_columns(b, rel, aggs)

        ds = self._read_source(b, rel, needed)
        ds, working_names = self._apply_joins(b, ds, rel)

        if b.wheres:
            wheres = list(b.wheres)

            def filter_fn(batch: pa.Table, _w=wheres) -> pa.Table:
                mask = None
                for c in _w:
                    m = c.eval(batch)
                    mask = m if mask is None else pc.and_kleene(mask, m)
                return batch.filter(pc.fill_null(mask, False))

            ds = ds.map_batches(_pinned(filter_fn), batch_format="pyarrow", zero_copy_batch=True)

        if aggs or b.groupby:
            ds = self._aggregate(b, ds, rel, aggs)
        else:
            fields = list(b.fields)

            def project_fn(batch: pa.Table, _f=fields) -> pa.Table:
                n = batch.num_rows
                cols, names = [], []
                for e in _f:
                    cols.append(_to_array(e.eval(batch), n))
                    names.append(e.output_name())
                return pa.table(dict(zip(names, cols))) if cols else batch

            ds = ds.map_batches(_pinned(project_fn), batch_format="pyarrow", zero_copy_batch=True)

        if b.orderbys:
            keys, desc = [], []
            for o in b.orderbys:
                name = o.expr.output_name()
                keys.append(name)
                desc.append(not o.ascending)
            ds = ds.sort(keys, descending=desc)

        if getattr(b, "as_struct", False):
            def fold_struct(batch: pa.Table) -> pa.Table:
                arr = pa.StructArray.from_arrays(
                    [batch.column(n).combine_chunks() if isinstance(batch.column(n), pa.ChunkedArray) else batch.column(n)
                     for n in batch.column_names],
                    names=list(batch.column_names),
                )
                return pa.table({"row": arr})

            ds = ds.map_batches(_pinned(fold_struct), batch_format="pyarrow", zero_copy_batch=True)
        return ds

    def explain(self, b: SelectBuilder) -> str:
        """Human-readable physical plan (the DESCRIBE-the-query analog):
        which columns are read, which join strategy each JOIN uses, where
        the shuffles are. Purely plan-time — no tasks launch."""
        b.validate(self.catalog)
        rel = b._source_relation(self.catalog)
        aggs = self._unique_aggs(b)
        needed = self._needed_columns(b, rel, aggs)
        lines = [
            f"ReadParquet[{rel.name}] columns={needed or 'ALL'}",
        ]
        left_names = set(rel.schema.names)
        for j in b.joins:
            jrel = self.catalog.get(j.source.name)
            alias = j.source.alias or j.source.name
            lk, rk, residual = extract_equi_keys(
                j.conds, left_names, set(jrel.schema.names), alias
            )
            small = self._rel_bytes(jrel) <= self.broadcast_max_bytes
            strat = (
                "BroadcastHashJoin(build side ray.put once)"
                if j.how in ("inner", "left", "cross") and small
                else f"ShuffleHashJoin(num_partitions<=CPU budget)"
            )
            res = f" residual={len(residual)}" if residual else ""
            lines.append(f"{j.how.upper()} {strat} {jrel.name} ON {lk}={rk}{res}")
            left_names |= set(jrel.schema.names)
        if b.wheres:
            pushed = 0
            if not b.joins:
                from .pushdown import to_scanner_filter

                _expr, pushed = to_scanner_filter(
                    b.wheres, rel.schema.names)
            lines.append(
                f"Filter[{len(b.wheres)} conds] (fused map_batches; "
                f"{pushed} pushed to the Parquet scanner)")
        if aggs or b.groupby:
            win = f" window={b.window!r}" if b.window else ""
            lines.append(
                f"PartialAggregate[per-batch pa.TableGroupBy, {len(aggs)} aggs]{win}"
            )
            lines.append(
                f"HashExchange[__part={self.num_partitions}] -> SegmentMerge"
            )
            if b.havings:
                lines.append(f"Having[{len(b.havings)} conds]")
            lines.append("Finalize[rename keys, window bounds, project]")
        else:
            lines.append("Project (fused map_batches)")
        if b.orderbys:
            lines.append(f"Sort[{[o.expr.output_name() for o in b.orderbys]}]")
        return "\n".join(lines)

    def table(self, b: SelectBuilder) -> pa.Table:
        """Materialize a bounded query result (small outputs only).
        Zero-row results keep the query's declared schema (Returns())."""
        ds = self.dataset(b)
        tables = [t for t in ray.get(ds.to_arrow_refs()) if t.num_columns]
        if not tables or sum(t.num_rows for t in tables) == 0:
            return b.returns(self.catalog).empty_table()
        return pa.concat_tables(tables, promote_options="permissive")

    # ------------------------------------------------------------------
    def _unique_aggs(self, b: SelectBuilder) -> list[AggExpr]:
        return b._agg_exprs()

    def _needed_columns(self, b: SelectBuilder, rel: Relation, aggs) -> list[str]:
        cols: set[str] = set()
        for e in b.fields + b.wheres + b.groupby + b.havings:
            cols |= e.columns()
        for o in b.orderbys:
            cols |= o.expr.columns()
        for j in b.joins:
            for c in j.conds:
                cols |= c.columns()
        if b.window is not None and rel.timestamp_col:
            cols.add(rel.timestamp_col)
        if any(a.needs_order for a in aggs):
            cols.update(rel.order_cols)
        return [n for n in rel.schema.names if n in cols]

    def _read_source(self, b: SelectBuilder, rel: Relation, needed: list[str]) -> ray.data.Dataset:
        if b.cte and b.source.name == b.cte[0]:
            return self.dataset(b.cte[1])
        if rel.path is None:
            raise PlanError(f"relation {rel.name} has no backing path")
        cols = needed or None
        # size read blocks to the CPU budget: tiny blocks mean per-task
        # overhead dominates vectorized kernels (ds.stats() evidence)
        ncpu = int(ray.available_resources().get("CPU", 8)) if ray.is_initialized() else 8
        nblocks = max(4, ncpu)
        fmt = (rel.properties or {}).get("value_format", "PARQUET").upper()
        # WITH (VALUE_FORMAT=...) analog (ksql/metadata.go:10-56; the
        # reference's wire format is JSON, kinds/fmt.go:7-9)
        if fmt == "JSON":
            ds = ray.data.read_json(rel.path, override_num_blocks=nblocks)
            return ds.select_columns(cols) if cols else ds
        if fmt == "CSV":
            ds = ray.data.read_csv(rel.path, override_num_blocks=nblocks)
            return ds.select_columns(cols) if cols else ds
        if fmt in ("ARROW", "IPC", "FEATHER"):
            # Arrow IPC / Feather-v2 files: Ray Data ships no IPC
            # reader, so read file bytes (one task per file — the read
            # stays distributed) and decode each file's IPC payload
            # zero-copy in the task; stream-format payloads fall back
            # to open_stream
            want = list(cols) if cols else None

            def _decode_ipc(batch: pa.Table) -> pa.Table:
                outs = []
                for b in batch.column("bytes").to_pylist():
                    buf = pa.BufferReader(b)
                    try:
                        t = pa.ipc.open_file(buf).read_all()
                    except pa.ArrowInvalid:
                        buf.seek(0)
                        t = pa.ipc.open_stream(buf).read_all()
                    outs.append(t.select(want) if want else t)
                return (pa.concat_tables(outs, promote_options="default")
                        if outs else batch.drop_columns(
                            batch.column_names))

            return ray.data.read_binary_files(rel.path).map_batches(
                _decode_ipc, batch_format="pyarrow")
        # strip schema metadata (testdata files carry pandas metadata whose
        # dict values make the Arrow schema unhashable — Ray Data then logs
        # "Failed to hash the schemas" per read task); schema must cover
        # exactly the projected columns, in file order
        clean = pa.schema([
            pa.field(f.name, f.type) for f in rel.schema
            if not cols or f.name in cols
        ])
        # WHERE pushdown into the scanner (join-free queries only: with
        # joins a same-named column could resolve to the other side).
        # Conservative superset — the fused in-memory filter still runs,
        # so results are identical; row groups whose stats exclude the
        # predicate never leave storage (exec/pushdown.py).
        scan_filter = None
        if b.wheres and not b.joins:
            from .pushdown import to_scanner_filter

            scan_filter, _pushed = to_scanner_filter(
                b.wheres, rel.schema.names)
        return ray.data.read_parquet(
            rel.path, columns=cols, schema=clean,
            override_num_blocks=nblocks,
            **({"filter": scan_filter} if scan_filter is not None else {})
        )

    # ------------------------------------------------------------------
    def _apply_joins(self, b: SelectBuilder, ds: ray.data.Dataset, rel: Relation):
        left_names = set(rel.schema.names)
        for j in b.joins:
            jrel = self.catalog.get(j.source.name)
            alias = j.source.alias or j.source.name
            right_names = set(jrel.schema.names)
            lk, rk, residual = extract_equi_keys(j.conds, left_names, right_names, alias)
            renames = plan_right_renames(left_names, jrel.schema, rk, lk, alias)
            rk = [renames.get(k, k) for k in rk]

            small = self._rel_bytes(jrel) <= self.broadcast_max_bytes
            if j.how in ("inner", "left", "cross") and small:
                right_cols = self._right_needed(b, jrel, rk, renames)
                build = pq.read_table(jrel.path, columns=right_cols or None)
                if renames:
                    build = build.rename_columns(
                        [renames.get(n, n) for n in build.column_names]
                    )
                ref = ray.put(build)
                how, lkk, rkk, res = j.how, list(lk), list(rk), list(residual)

                def bjoin(batch: pa.Table, _r=ref, _h=how, _lk=lkk, _rk=rkk, _res=res):
                    return join_batch(batch, ray.get(_r), _h, _lk, _rk, _res)

                ds = ds.map_batches(_pinned(bjoin), batch_format="pyarrow", zero_copy_batch=True)
            else:
                if j.how == "cross":
                    if not self.allow_large_cross:
                        raise PlanError(
                            "CROSS JOIN build side too large to broadcast; "
                            "opt in with Engine(allow_large_cross=True) — "
                            "block-nested-loop, output is the row-count "
                            "product (reference enum has CROSS "
                            "unconditionally, ksql/join.go:33)"
                        )
                    ds = self._cross_bnl(ds, jrel, b, rk, renames, residual)
                    left_names |= {renames.get(n, n) for n in right_names}
                    continue
                right_cols = self._right_needed(b, jrel, [k for k in rk], renames)
                right_ds = ray.data.read_parquet(jrel.path, columns=right_cols or None)
                if renames:
                    renames_present = {
                        k: v for k, v in renames.items() if not right_cols or k in right_cols
                    }
                    if renames_present:
                        right_ds = right_ds.rename_columns(renames_present)
                # Ray's hash-shuffle join spawns one aggregator actor per
                # partition; cap at the CPU budget so small clusters don't
                # starve (raise num_partitions for real multi-node runs)
                navail = int(ray.available_resources().get("CPU", 4)) if ray.is_initialized() else 4
                nparts = max(2, min(self.num_partitions, navail))
                if residual and j.how != "inner":
                    # compound ON for non-inner joins: co-partition both
                    # sides and join each partition at the table level
                    # (reference renders compound ON for all join types,
                    # ksql/join.go:61-103)
                    from .joins import copartition_join

                    lschema = ds.schema().base_schema
                    rschema = pa.schema([
                        pa.field(renames.get(f.name, f.name), f.type)
                        for f in jrel.schema
                        if not right_cols or f.name in right_cols
                    ])
                    ds = copartition_join(
                        ds, right_ds, j.how, lk, rk, list(residual),
                        self.num_partitions, lschema, rschema,
                    )
                else:
                    ds = shuffle_join(ds, right_ds, j.how, lk, rk, nparts)
                    if residual:
                        res = list(residual)

                        def resfilter(batch: pa.Table, _res=res):
                            mask = None
                            for c in _res:
                                m = c.eval(batch)
                                mask = m if mask is None else pc.and_kleene(mask, m)
                            return batch.filter(pc.fill_null(mask, False))

                        ds = ds.map_batches(_pinned(resfilter), batch_format="pyarrow", zero_copy_batch=True)
            left_names |= {renames.get(n, n) for n in right_names}
        return ds, left_names

    def _cross_bnl(self, ds, jrel: Relation, b: SelectBuilder, rk, renames,
                   residual):
        """Large x large CROSS join as a block-nested loop: the build side
        is read ONCE into sharded plasma objects (one remote read per
        file — never the driver), and every probe batch joins each shard
        in turn. Per-task memory is one probe batch x one shard; output
        is the row-count product, so callers must reduce/filter
        downstream (the partitioning assumption this relies on: the
        build side fits the CLUSTER object store in aggregate, spill-
        backed — not any single node's heap)."""
        import glob as _glob

        from .joins import join_batch as _jb

        right_cols = self._right_needed(b, jrel, [k for k in rk], renames)
        if os.path.isdir(jrel.path):
            files = sorted(_glob.glob(os.path.join(jrel.path, "*.parquet")))
        else:
            files = [jrel.path]

        @ray.remote
        def _read_shard(path: str, cols, ren):
            t = pq.read_table(path, columns=cols or None)
            if ren:
                t = t.rename_columns([ren.get(n, n) for n in t.column_names])
            return t

        shard_refs = [_read_shard.remote(f, right_cols, dict(renames)) for f in files]
        ray.wait(shard_refs, num_returns=len(shard_refs))  # resolve before map
        res = list(residual)

        def bnl(batch: pa.Table, _refs=shard_refs, _res=res):
            outs = []
            for r in _refs:
                right = ray.get(r)  # plasma-cached, zero-copy per node
                out = _jb(batch, right, "cross", [], [], [])
                if _res and out.num_rows:
                    mask = None
                    for c in _res:
                        m = c.eval(out)
                        mask = m if mask is None else pc.and_kleene(mask, m)
                    out = out.filter(pc.fill_null(mask, False))
                if out.num_rows:
                    outs.append(out)
            if not outs:
                return _jb(batch.slice(0, 0), ray.get(_refs[0]), "cross", [], [], [])
            return pa.concat_tables(outs, promote_options="permissive")

        return ds.map_batches(_pinned(bnl), batch_format="pyarrow", zero_copy_batch=True)

    def _right_needed(self, b: SelectBuilder, jrel: Relation, rk, renames) -> list[str]:
        cols: set[str] = set(k for k in rk)
        inv = {v: k for k, v in renames.items()}
        exprs: list[Expr] = list(b.fields) + list(b.wheres) + list(b.havings) + list(b.groupby)
        exprs += [o.expr for o in b.orderbys]
        for j2 in b.joins:
            exprs += list(j2.conds)
        for e in exprs:
            for c in e.columns():
                base = inv.get(c, c)
                if base in jrel.schema.names:
                    cols.add(base)
        return [n for n in jrel.schema.names if n in cols or renames.get(n, n) in cols]

    def _rel_bytes(self, rel: Relation) -> int:
        if rel.path and os.path.isfile(rel.path):
            return os.path.getsize(rel.path)
        if rel.path and os.path.isdir(rel.path):
            total = 0
            for root, _, files in os.walk(rel.path):
                total += sum(os.path.getsize(os.path.join(root, f)) for f in files)
            return total
        return 1 << 62

    # the partial shuffle's fixed cost: Ray's sort-based groupby takes
    # seconds regardless of data size (measured: 2.4 s to shuffle 180
    # partial rows). When the combined partials fit this budget, merge
    # them in one local vectorized call instead — the merge is
    # partition-independent (it sorts by the group keys and reduces
    # contiguous segments), so the result is identical.
    SMALL_MERGE_BYTES = 64 << 20

    def _merge_partials(self, partials, merge_fn, finalize_fn):
        mat = partials.materialize()
        if mat.size_bytes() <= self.SMALL_MERGE_BYTES:
            refs = mat.to_arrow_refs()
            if refs and mat.count() > 0:
                # ONE remote task, not the driver: concurrent bounded
                # queries would otherwise share driver heap for their
                # merges (the block refs are passed as *args so they
                # resolve before the task runs — no ray.get inside, and
                # the result stays in the object store as a ref)
                return ray.data.from_arrow_refs(
                    [_merge_small.remote(merge_fn, finalize_fn, *refs)]
                )
            # fall through on empty input: the groupby path yields the
            # correct empty dataset
        from .exchange import exchange_map_groups, use_direct_exchange

        if use_direct_exchange():
            merged = exchange_map_groups(mat, self.num_partitions,
                                         _pinned(merge_fn))
        else:
            merged = mat.groupby("__part").map_groups(
                _pinned(merge_fn), batch_format="pyarrow"
            )
        return merged.map_batches(
            _pinned(finalize_fn), batch_format="pyarrow", zero_copy_batch=True
        )

    # ------------------------------------------------------------------
    def _aggregate(self, b: SelectBuilder, ds, rel: Relation, aggs: list[AggExpr]):
        agg_names = [_auto_name(a) for a in aggs]

        if isinstance(b.window, Session):
            plan = SessionGroupByPlan(
                b.groupby, aggs, rel.order_cols, b.window, rel.timestamp_col,
                self.num_partitions,
            )
            # pre-aggregate WITHIN each batch (sessionize + p1 partials) so
            # the partition shuffle moves per-(key, batch-session) partials,
            # never raw rows (the streaming path's shape, reused here)
            partials = ds.map_batches(
                _pinned(plan.sessionize_partial_fn), batch_format="pyarrow",
                zero_copy_batch=True,
            )
            merge_fn = plan.session_partial_merge_fn
        else:
            plan = GroupByPlan(
                b.groupby, aggs, rel.order_cols, b.window, rel.timestamp_col,
                self.num_partitions,
            )
            partials = ds.map_batches(_pinned(plan.partial_fn), batch_format="pyarrow", zero_copy_batch=True)
            merge_fn = plan.merge_fn

        finalize_fn = make_finalizer(b, plan, agg_names)
        return self._merge_partials(partials, merge_fn, finalize_fn)
