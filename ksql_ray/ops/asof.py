"""Distributed as-of and range (interval) joins over Ray Datasets.

The reference has no temporal joins (its enum stops at CROSS,
ksql/join.go:28-34); these are the two temporal lookups every
training-data pipeline needs — "attach the most recent profile /
model-version / consent record as of each event" (as-of) and "attach
every event inside a campaign / session / incident window" (range).
Neither is expressible as an equi-join, so Ray Data's native
``Dataset.join`` can't run them; both are built here as ONE hash
shuffle + a fully vectorized per-partition merge (SURVEY.md §2.11).

Scale shape
-----------
* **as-of**: both sides are hash-partitioned by the ``by`` keys
  (side-tagged union through one sort shuffle, the ``copartition_join``
  pattern from ``exec/joins.py``). Every row of a key lands in one
  partition, so the per-partition answer is exact. The merge is one
  ``np.lexsort`` over the union + one ``np.maximum.accumulate``
  forward-fill — no Python loop over rows or keys, no per-key
  ``groupby().map_groups`` (millions of tiny groups die on per-group
  overhead, measured on the dedup bench).
* **range**: time is cut into fixed-width buckets. A left row goes to
  exactly ONE partition ``hash(by..., bucket(t))``; an interval is
  replicated to every bucket it overlaps (``np.repeat`` fan-out, counted
  to op-stats — no silent caps). A matching pair co-occurs exactly once
  (in the left row's bucket), so no output dedup pass is needed and
  LEFT padding is a purely local decision. Per-interval fan-out is
  ``span/width + 1``: pick ``bucket_width`` near the typical interval
  span; pathological configs raise instead of exploding.

Partitioning assumption (documented per the custom-operator mandate):
correctness needs only that equal ``by`` keys co-locate (as-of) or that
equal (key, bucket) pairs co-locate (range) — both guaranteed by the
hash shuffle, on any cluster size. Skewed keys skew partitions; the
range join's bucket dimension already splits a hot key across time.
"""

from __future__ import annotations

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .stats import ensure_stats_actor, record_stats

_I64MAX = np.iinfo(np.int64).max


def _pin(fn):
    import functools

    @functools.wraps(fn)
    def wrapped(*a, **kw):
        from ..streaming.driver import limit_worker_threads

        limit_worker_threads()
        return fn(*a, **kw)

    return wrapped


def _arrow_schema(ds: ray.data.Dataset) -> pa.Schema:
    """Arrow schema of a dataset without executing it; pandas-block
    datasets (``from_pandas``) get their numpy dtypes mapped
    (object -> string, the pandas text convention)."""
    s = ds.schema()
    if s is None:  # empty dataset with no recorded schema
        return pa.schema([])
    base = s.base_schema
    if isinstance(base, pa.Schema):
        return base
    fields = []
    for name, dt in zip(base.names, base.types):
        try:
            t = pa.from_numpy_dtype(dt)
        except (pa.ArrowNotImplementedError, pa.ArrowTypeError, TypeError):
            t = pa.string()
        fields.append(pa.field(name, t))
    return pa.schema(fields)


def _as_i8(col: pa.ChunkedArray | pa.Array) -> np.ndarray:
    """Order-preserving int64 view of a time/numeric column (nulls -> a
    sentinel the caller masks separately)."""
    if pa.types.is_timestamp(col.type) or pa.types.is_date(col.type):
        col = pc.cast(col, pa.int64())
    elif pa.types.is_floating(col.type):
        raise TypeError(
            "float time axes are not supported (exact-tie semantics need "
            "integer time); cast to timestamp or int first")
    elif not pa.types.is_integer(col.type):
        raise TypeError(f"unsupported time column type {col.type}")
    arr = col.combine_chunks() if isinstance(col, pa.ChunkedArray) else col
    valid = ~np.asarray(arr.is_null())
    return arr.fill_null(0).to_numpy(zero_copy_only=False).astype(np.int64), valid


def _factorize_keys(l_tbl: pa.Table, r_tbl: pa.Table,
                    l_by: list[str], r_by: list[str]):
    """Joint integer group ids for the by-keys of both sides (exact —
    factorized codes, never hashes). Returns (l_gid, r_gid, l_valid,
    r_valid); rows with any null key are flagged invalid."""
    nl, nr = l_tbl.num_rows, r_tbl.num_rows
    if not l_by:
        z = np.zeros(nl, dtype=np.int64), np.zeros(nr, dtype=np.int64)
        return z[0], z[1], np.ones(nl, bool), np.ones(nr, bool)
    gid_l = np.zeros(nl, dtype=np.int64)
    gid_r = np.zeros(nr, dtype=np.int64)
    ok_l = np.ones(nl, dtype=bool)
    ok_r = np.ones(nr, dtype=bool)
    for lk, rk in zip(l_by, r_by):
        lcol = l_tbl.column(lk)
        rcol = pc.cast(r_tbl.column(rk), l_tbl.schema.field(lk).type)
        both = np.concatenate([lcol.to_numpy(zero_copy_only=False),
                               rcol.to_numpy(zero_copy_only=False)])
        codes, _ = pd.factorize(both, use_na_sentinel=True)
        card = int(codes.max()) + 1 if len(codes) else 1
        gid_l = gid_l * card + codes[:nl]
        gid_r = gid_r * card + codes[nl:]
        ok_l &= codes[:nl] >= 0
        ok_r &= codes[nl:] >= 0
    return gid_l, gid_r, ok_l, ok_r


def _union_shuffle(left: ray.data.Dataset, right: ray.data.Dataset,
                   part_fn_left, part_fn_right,
                   l_schema: pa.Schema, r_schema: pa.Schema,
                   rename: dict[str, str],
                   extra_fields: tuple[pa.Field, ...] = ()):
    """Side-tag both datasets into one unified schema and group by the
    caller-computed partition id (ONE sort shuffle for both sides).
    ``part_fn`` returns (partition_ids, replication_counts | None,
    extra_columns: dict) — extra columns (e.g. the range join's replica
    bucket id) are per-OUTPUT-row and declared via ``extra_fields``."""
    r_fields = [pa.field(rename.get(f.name, f.name), f.type) for f in r_schema]
    all_fields = list(l_schema) + [f for f in r_fields
                                   if f.name not in l_schema.names]

    def make_tag(side: int, schema: pa.Schema, ren: dict[str, str], part_fn):
        @_pin
        def tag(batch: pa.Table) -> pa.Table:
            src = {ren.get(f.name, f.name): batch.column(f.name)
                   for f in schema}
            n = batch.num_rows
            cols = {}
            for f in all_fields:
                c = src.get(f.name)
                if c is None:
                    cols[f.name] = pa.nulls(n, type=f.type)
                elif c.type != f.type:
                    cols[f.name] = pc.cast(c, f.type)
                else:
                    cols[f.name] = c
            part, reps, extra = part_fn(batch)
            tbl = pa.table(cols)
            if reps is not None:  # fan-out (range-join interval replication)
                idx = np.repeat(np.arange(n), reps)
                tbl = tbl.take(pa.array(idx))
            for f in extra_fields:
                c = extra.get(f.name)
                tbl = tbl.append_column(
                    f.name, pa.nulls(tbl.num_rows, type=f.type)
                    if c is None else pa.array(c, type=f.type))
            tbl = tbl.append_column("__side", pa.array(
                np.full(tbl.num_rows, side, dtype=np.int8)))
            return tbl.append_column("__part", pa.array(part, type=pa.int64()))

        return tag

    tagged = left.map_batches(
        make_tag(0, l_schema, {}, part_fn_left),
        batch_format="pyarrow", zero_copy_batch=True,
    ).union(right.map_batches(
        make_tag(1, r_schema, rename, part_fn_right),
        batch_format="pyarrow", zero_copy_batch=True,
    ))
    return tagged.groupby("__part"), all_fields


def _resolve_payload(l_schema: pa.Schema, r_schema: pa.Schema,
                     right_cols, exclude: set[str], suffix: str):
    if right_cols is None:
        right_cols = [f.name for f in r_schema if f.name not in exclude]
    rename = {c: (c + suffix if c in l_schema.names else c)
              for c in right_cols}
    clash = [v for v in rename.values()
             if v in l_schema.names]
    if clash:
        raise ValueError(f"suffixed right columns still clash: {clash}")
    return right_cols, rename


def _degenerate_right(left: ray.data.Dataset, right_cols: list[str],
                      rename: dict[str, str], how: str) -> ray.data.Dataset:
    """Right side is empty with no schema: the join result is the left
    side null-padded (types unknowable -> null columns) or nothing."""
    out_names = [rename[c] for c in right_cols]

    def pad(batch: pa.Table) -> pa.Table:
        if how == "inner":
            batch = batch.slice(0, 0)
        for n in out_names:
            batch = batch.append_column(n, pa.nulls(batch.num_rows))
        return batch

    return left.map_batches(pad, batch_format="pyarrow", zero_copy_batch=True)


def asof_join(left: ray.data.Dataset, right: ray.data.Dataset, *,
              on: str, right_on: str | None = None,
              by: list[str] | None = None, right_by: list[str] | None = None,
              direction: str = "backward", allow_exact: bool = True,
              tolerance: int | None = None, how: str = "left",
              right_cols: list[str] | None = None, suffix: str = "_r",
              tiebreak: str | None = None,
              num_partitions: int = 32) -> ray.data.Dataset:
    """For every left row, attach the single right row with the same
    ``by`` keys and the greatest right time <= left time (``backward``;
    ``forward`` = smallest >=). ``tolerance`` (same units as the time
    column, e.g. microseconds for timestamp[us]) bounds the gap;
    ``tiebreak`` breaks equal-time ties deterministically (greatest
    wins), else ties resolve by shuffle arrival order.

    ``how="left"`` keeps unmatched left rows null-padded; ``"inner"``
    drops them. Output = left columns + ``right_cols`` (all non-key
    right columns by default), suffixed on clash.
    """
    if direction not in ("backward", "forward"):
        raise ValueError("direction must be 'backward' or 'forward'")
    if how not in ("left", "inner"):
        raise ValueError("how must be 'left' or 'inner'")
    right_on = right_on or on
    by = list(by or [])
    right_by = list(right_by or by)
    if len(by) != len(right_by):
        raise ValueError("by and right_by must have equal length")
    l_schema, r_schema = _arrow_schema(left), _arrow_schema(right)
    right_cols, rename = _resolve_payload(
        l_schema, r_schema, right_cols, set(right_by), suffix)
    if not r_schema.names:
        return _degenerate_right(left, right_cols, rename, how)
    internal = [c for c in {right_on, *right_by, tiebreak} - {None}
                if c not in right_cols]
    r_needed = right.select_columns(list(dict.fromkeys(right_cols + internal)))
    r_sel_schema = _arrow_schema(r_needed)
    # internal (non-payload) right columns keep a __r_ prefix so they
    # never clash and are dropped from the output — EXCEPT by-keys,
    # which are coalesced into the left-named column (equal by join
    # definition): the shuffle ships one key column, not two half-null
    # ones
    rename_all = dict(rename)
    for c in internal:
        rename_all[c] = "__r_" + c
    for lk, rk in zip(by, right_by):
        if rk not in right_cols:
            rename_all[rk] = lk
    key_types = {lk: l_schema.field(lk).type for lk in by}
    ensure_stats_actor()

    from ..exec.groupby import hash_partition_ids

    def part_left(batch: pa.Table):
        if by:
            ktbl = pa.table({k: batch.column(k) for k in by})
            return hash_partition_ids(ktbl, by, num_partitions), None, {}
        return np.zeros(batch.num_rows, dtype=np.int64), None, {}

    def part_right(batch: pa.Table):
        if by:
            ktbl = pa.table({lk: pc.cast(batch.column(rk), key_types[lk])
                             for lk, rk in zip(by, right_by)})
            return hash_partition_ids(ktbl, by, num_partitions), None, {}
        return np.zeros(batch.num_rows, dtype=np.int64), None, {}

    grouped, _ = _union_shuffle(left, r_needed, part_left, part_right,
                                l_schema, r_sel_schema, rename_all)
    lnames = list(l_schema.names)
    out_right = [rename[c] for c in right_cols]
    fwd = direction == "forward"
    rt_name = rename_all[right_on]
    rby_names = [rename_all.get(c, c) for c in right_by]
    tb_name = rename_all.get(tiebreak, tiebreak)

    @_pin
    def merge(group: pa.Table) -> pa.Table:
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        side = group.column("__side").to_numpy(zero_copy_only=False)
        lpart = group.filter(pa.array(side == 0)).select(lnames)
        rsel = list(dict.fromkeys(
            [rt_name, *rby_names, *out_right] + ([tb_name] if tb_name else [])))
        rpart = group.filter(pa.array(side == 1)).select(rsel)
        nl, nr = lpart.num_rows, rpart.num_rows
        lt, lt_ok = _as_i8(lpart.column(on))
        rt, rt_ok = _as_i8(rpart.column(rt_name))
        _gl_gr = _factorize_keys(lpart, rpart, by, rby_names)
        gl, gr, okl, okr = _gl_gr
        okl &= lt_ok
        okr &= rt_ok
        if fwd:
            lt, rt = -lt, -rt
        if tb_name:
            tb, _tb_ok = _as_i8(rpart.column(tb_name))
            if fwd:
                tb = -tb  # keep "greatest tiebreak wins" in both directions
        else:
            tb = np.zeros(nr, dtype=np.int64)
        if not allow_exact:
            lt = lt - 1  # strict inequality on integer time
        # drop invalid right rows from the merge entirely
        rkeep = np.flatnonzero(okr)
        # union arrays: right rows first fields, then left queries
        g = np.concatenate([gr[rkeep], gl])
        t = np.concatenate([rt[rkeep], lt])
        tbu = np.concatenate([tb[rkeep],
                              np.full(nl, _I64MAX, dtype=np.int64)])
        sideu = np.concatenate([np.zeros(len(rkeep), np.int8),
                                np.ones(nl, np.int8)])
        order = np.lexsort((sideu, tbu, t, g))
        g_s = g[order]
        is_left = sideu[order] == 1
        nu = len(order)
        # forward-fill the most recent RIGHT union-position per gid block
        rpos = np.where(is_left, -1, np.arange(nu))
        filled = np.maximum.accumulate(rpos)
        new_block = np.empty(nu, dtype=bool)
        if nu:
            new_block[0] = True
            new_block[1:] = g_s[1:] != g_s[:-1]
        block_start = np.maximum.accumulate(
            np.where(new_block, np.arange(nu), 0))
        valid = filled >= block_start
        # map each left row (by its original index) to its matched right
        # original row index, or -1: ``order`` maps union position ->
        # concat index, and right rows occupy concat positions
        # [0, len(rkeep)) which double as rkeep-local indices
        match = np.full(nl, -1, dtype=np.int64)
        lsorted = np.flatnonzero(is_left)
        got = valid[lsorted]
        src = filled[lsorted]
        li = order[lsorted] - len(rkeep)
        match[li[got]] = rkeep[order[src[got]]]
        match[~okl] = -1
        if tolerance is not None:
            m = match >= 0
            gap = (lt + (1 if not allow_exact else 0))[m] - rt[match[m]]
            bad = gap > int(tolerance)
            mm = np.flatnonzero(m)
            match[mm[bad]] = -1
        if how == "inner":
            keep = np.flatnonzero(match >= 0)
            lpart = lpart.take(pa.array(keep))
            match = match[keep]
        take_idx = pa.array(match, mask=match < 0)
        out_cols = {c: lpart.column(c) for c in lnames}
        for dst_c in out_right:
            out_cols[dst_c] = rpart.column(dst_c).take(take_idx)
        return pa.table(out_cols)

    return grouped.map_groups(merge, batch_format="pyarrow")


def range_join(left: ray.data.Dataset, right: ray.data.Dataset, *,
               on: str, right_start: str, right_end: str,
               by: list[str] | None = None, right_by: list[str] | None = None,
               bucket_width: int = None, how: str = "inner",
               right_cols: list[str] | None = None, suffix: str = "_r",
               num_partitions: int = 32,
               max_fanout: int = 4096) -> ray.data.Dataset:
    """Interval join: emit (left, right) for every right interval with
    ``right_start <= left.on <= right_end`` (inclusive BETWEEN) and equal
    ``by`` keys. ``bucket_width`` (int, time-column units — e.g.
    microseconds for timestamp[us]) is the time-bucket size used to
    co-locate rows with the intervals that can match them: each interval
    is replicated to ``span/width + 1`` buckets, so pick it near the
    typical interval span. Intervals spanning more than ``max_fanout``
    buckets raise (mis-sized width), never silently truncate; total
    replication is counted to op-stats (``range.replicated_rows``).
    """
    if how not in ("left", "inner"):
        raise ValueError("how must be 'left' or 'inner'")
    if not bucket_width or bucket_width <= 0:
        raise ValueError("bucket_width (int > 0, time-column units) is required")
    by = list(by or [])
    right_by = list(right_by or by)
    if len(by) != len(right_by):
        raise ValueError("by and right_by must have equal length")
    l_schema, r_schema = _arrow_schema(left), _arrow_schema(right)
    right_cols, rename = _resolve_payload(
        l_schema, r_schema, right_cols, set(right_by), suffix)
    if not r_schema.names:
        return _degenerate_right(left, right_cols, rename, how)
    internal = [c for c in {right_start, right_end, *right_by}
                if c not in right_cols]
    r_needed = right.select_columns(list(dict.fromkeys(right_cols + internal)))
    r_sel_schema = _arrow_schema(r_needed)
    rename_all = dict(rename)
    for c in internal:
        rename_all[c] = "__r_" + c
    for lk, rk in zip(by, right_by):  # coalesce by-keys (see asof_join)
        if rk not in right_cols:
            rename_all[rk] = lk
    key_types = {lk: l_schema.field(lk).type for lk in by}
    width = int(bucket_width)
    ensure_stats_actor()

    from ..exec.groupby import hash_partition_ids

    def _part_of(ktbl: pa.Table | None, bucket: np.ndarray) -> np.ndarray:
        bt = pa.table(({} if ktbl is None else
                       {c: ktbl.column(c) for c in ktbl.column_names})
                      | {"__bucket": pa.array(bucket)})
        return hash_partition_ids(
            bt, list(bt.column_names), num_partitions)

    def part_left(batch: pa.Table):
        t, _ok = _as_i8(batch.column(on))
        bucket = np.floor_divide(t, width)
        ktbl = pa.table({k: batch.column(k) for k in by}) if by else None
        return _part_of(ktbl, bucket), None, {"__bucket": bucket}

    def part_right(batch: pa.Table):
        s, s_ok = _as_i8(batch.column(right_start))
        e, e_ok = _as_i8(batch.column(right_end))
        b0 = np.floor_divide(s, width)
        b1 = np.floor_divide(e, width)
        reps = np.maximum(b1 - b0 + 1, 0)         # empty/null intervals: 0
        reps[~(s_ok & e_ok)] = 0
        if reps.size and int(reps.max()) > max_fanout:
            raise ValueError(
                f"an interval spans {int(reps.max())} buckets "
                f"(> max_fanout={max_fanout}); raise bucket_width")
        record_stats("range", replicated_rows=int(reps.sum()),
                     input_intervals=batch.num_rows)
        total = int(reps.sum())
        starts = np.repeat(np.cumsum(reps) - reps, reps)
        bucket = np.repeat(b0, reps) + (np.arange(total) - starts)
        if by:
            ktbl = pa.table({lk: pc.cast(batch.column(rk), key_types[lk])
                             for lk, rk in zip(by, right_by)})
            ktbl = ktbl.take(pa.array(np.repeat(np.arange(batch.num_rows),
                                                reps)))
        else:
            ktbl = None
        return _part_of(ktbl, bucket), reps, {"__bucket": bucket}

    # the replica's bucket id rides the shuffle and joins the exact group
    # key: a partition can hold several (key, bucket) combos (hash
    # collisions) and several replicas of ONE interval — bucket-exact
    # grouping keeps each pair to the single copy in the left row's bucket
    grouped, _ = _union_shuffle(left, r_needed, part_left, part_right,
                                l_schema, r_sel_schema, rename_all,
                                extra_fields=(pa.field("__bucket",
                                                       pa.int64()),))
    lnames = list(l_schema.names)
    out_right = [rename[c] for c in right_cols]
    rs_name, re_name = rename_all[right_start], rename_all[right_end]
    rby_names = [rename_all.get(c, c) for c in right_by]

    @_pin
    def merge(group: pa.Table) -> pa.Table:
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        side = group.column("__side").to_numpy(zero_copy_only=False)
        lpart = group.filter(pa.array(side == 0)).select(
            lnames + ["__bucket"])
        rsel = list(dict.fromkeys(
            [rs_name, re_name, *rby_names, *out_right, "__bucket"]))
        rpart = group.filter(pa.array(side == 1)).select(rsel)
        nl, nr = lpart.num_rows, rpart.num_rows
        lt, lt_ok = _as_i8(lpart.column(on))
        rs, rs_ok = _as_i8(rpart.column(rs_name))
        re_, re_ok = _as_i8(rpart.column(re_name))
        # the replica bucket is part of the exact group key (see the
        # shuffle comment): each (left row, interval) pair survives only
        # in the left row's own bucket
        gl, gr, okl, okr = _factorize_keys(
            lpart, rpart, by + ["__bucket"], rby_names + ["__bucket"])
        okl &= lt_ok
        okr &= rs_ok & re_ok
        rkeep = np.flatnonzero(okr)
        g = np.concatenate([gr[rkeep], gl])
        t = np.concatenate([rs[rkeep], lt])
        sideu = np.concatenate([np.zeros(len(rkeep), np.int8),
                                np.ones(nl, np.int8)])
        order = np.lexsort((sideu, t, g))   # right-before-left at equal t
        g_s, is_left = g[order], sideu[order] == 1
        nu = len(order)
        # per union position: count of right rows so far (prefix) and the
        # right-count at the current gid block start
        rcnt = np.cumsum(~is_left)                      # inclusive prefix
        new_block = np.empty(nu, dtype=bool)
        if nu:
            new_block[0] = True
            new_block[1:] = g_s[1:] != g_s[:-1]
        blk_rcnt0 = np.maximum.accumulate(
            np.where(new_block, rcnt - (~is_left).astype(np.int64), -1))
        lsorted = np.flatnonzero(is_left)
        hi = rcnt[lsorted]                 # rights with (g,t) <= (g,lt): count
        lo = blk_rcnt0[lsorted]
        li = order[lsorted] - len(rkeep)   # original left row index
        counts = hi - lo
        ok = okl[li]
        counts = np.where(ok, counts, 0)
        # candidate emission: for left row j, right-sorted ranks [lo, hi)
        tot = int(counts.sum())
        l_idx = np.repeat(li, counts)
        starts = np.repeat(np.cumsum(counts) - counts, counts)
        ranks = np.repeat(lo, counts) + (np.arange(tot) - starts)
        # right rows ordered by (gid, start): recover via the union order
        rsorted_union = np.flatnonzero(~is_left)
        r_by_rank = order[rsorted_union]          # concat idx == rkeep idx
        r_idx = rkeep[r_by_rank[ranks]]
        keep = re_[r_idx] >= lt[l_idx]            # end bound (start holds)
        l_idx, r_idx = l_idx[keep], r_idx[keep]
        if how == "left":
            matched = np.zeros(nl, dtype=bool)
            matched[l_idx] = True
            pad = np.flatnonzero(~matched)
            l_all = np.concatenate([l_idx, pad])
            r_all = np.concatenate([r_idx, np.full(len(pad), -1,
                                                   dtype=np.int64)])
        else:
            l_all, r_all = l_idx, r_idx
        lout = lpart.take(pa.array(l_all))
        take_idx = pa.array(r_all, mask=r_all < 0)
        out_cols = {c: lout.column(c) for c in lnames}
        for src_c, dst_c in zip(right_cols, out_right):
            nm = rename_all[src_c]
            out_cols[dst_c] = rpart.column(
                nm if nm in rpart.column_names else dst_c).take(take_idx)
        return pa.table(out_cols)

    return grouped.map_groups(merge, batch_format="pyarrow")
