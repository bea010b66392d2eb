"""Multi-level aggregation: GROUP BY ROLLUP and pivot (crosstab).

ksqlDB has neither ROLLUP/CUBE nor PIVOT (absence verified across
/root/reference/ksql/*.go — the builder emits plain GROUP BY only);
corpus triage wants both: per-(source, lang) counts with per-source
and grand totals in one answer, and per-key wide feature columns
(one column per event type / role) for training tables.

Scale shapes:

* ``rollup_agg``: ONE scan computes per-batch partials grouped by the
  full key (payload bounded by per-batch distinct keys); the base
  groupby merges them, and each coarser level re-aggregates the
  PREVIOUS level's already-aggregated output — so level L's shuffle
  moves at most |distinct level-(L+1) keys| rows, never the input.
  The grand total is a driver-side fold of the final level (one tiny
  ``sum``). Rolled-up key columns are NULL, exactly like SQL ROLLUP.
* ``pivot_agg``: per-batch partial pivot — a dense (batch keys ×
  pivot values) ``np.add.at`` scatter — then one groupby(key) sum of
  the wide columns. The shuffle carries ``|pivot values|`` numeric
  columns per distinct per-batch key, never one row per input row.
  Groups with no rows for a pivot value yield NULL (SQL
  ``SUM(CASE WHEN ...)`` semantics), tracked via a parallel count.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .dedup import _pin

__all__ = ["rollup_agg", "cube_agg", "pivot_agg",
           "grouping_sets_agg"]

# Partials at or under this size are merged in ONE remote task instead
# of one Ray sort-groupby per rollup level (each costs ~2.4 s fixed on
# this Ray version regardless of row count — BASELINE.md lesson; same
# budget as the bounded engine's small-partial fast path). Partials are
# bounded by per-batch distinct keys, so real corpora with bounded key
# cardinality take this path even at 100 TB input.
_SMALL_PARTIAL_BYTES = 64 * 1024 * 1024


@ray.remote
def _rollup_merge_task(keys: list[str], *blocks: pa.Table) -> pa.Table:
    """All rollup levels + grand total from small partials, one task.

    Bit-equal to the distributed per-level path: every level is a
    pandas hash groupby with dropna=False over float64 __sum / int64
    __cnt partials, exactly like _base_partial, and all-NULL groups
    (cnt 0) get a NULL sum via the validity mask.
    """
    import pandas as pd

    t = pa.concat_tables(blocks, promote_options="default")
    key_types = {k: t.schema.field(k).type for k in keys}
    df = t.to_pandas()
    outs = []
    for lvl in range(len(keys), 0, -1):
        g = df.groupby(keys[:lvl], dropna=False, sort=False).agg(
            __sum=("__sum", "sum"), __cnt=("__cnt", "sum")).reset_index()
        n = len(g)
        cols = {}
        for k in keys[:lvl]:
            cols[k] = pa.Array.from_pandas(g[k], type=key_types[k])
        for k in keys[lvl:]:
            cols[k] = pa.nulls(n, key_types[k])
        cnt = g["__cnt"].to_numpy(np.int64)
        cols["sum_v"] = pa.array(g["__sum"].to_numpy(np.float64),
                                 type=pa.float64(), mask=cnt == 0)
        cols["cnt_v"] = pa.array(cnt, type=pa.int64())
        outs.append(pa.table(cols))
        df = g  # coarser levels re-aggregate the previous level
    tot_cnt = int(df["__cnt"].sum())
    outs.append(pa.table({
        **{k: pa.nulls(1, key_types[k]) for k in keys},
        "sum_v": pa.array(
            [None if tot_cnt == 0 else float(df["__sum"].sum())],
            type=pa.float64()),
        "cnt_v": pa.array([tot_cnt], type=pa.int64()),
    }))
    return pa.concat_tables(outs)


def _base_partial(batch: pa.Table, keys: list[str],
                  value_col: str) -> pa.Table:
    """Per-batch (keys..., __sum, __cnt) partial via one pandas
    groupby (hash-based; Arrow's TableGroupBy emission order is
    unreliable — perf lesson #1)."""
    import pandas as pd

    cols = {k: batch.column(k).to_numpy(zero_copy_only=False)
            for k in keys}
    v = pc.cast(batch.column(value_col), pa.float64()).to_numpy(
        zero_copy_only=False)
    df = pd.DataFrame(cols)
    df["__v"] = v
    g = df.groupby(keys, dropna=False, sort=False)["__v"].agg(
        ["sum", "count"]).reset_index()
    out = {k: pa.array(g[k]) for k in keys}
    out["__sum"] = pa.array(g["sum"].to_numpy(), type=pa.float64())
    out["__cnt"] = pa.array(g["count"].to_numpy(), type=pa.int64())
    return pa.table(out)


@ray.remote
def _cube_merge_task(keys: list[str], *blocks: pa.Table) -> pa.Table:
    """All 2^k CUBE groupings from small partials, one task. Every
    subset re-aggregates the merged base level (bounded by distinct
    full keys), not the input."""
    import pandas as pd
    from itertools import combinations

    t = pa.concat_tables(blocks, promote_options="default")
    key_types = {k: t.schema.field(k).type for k in keys}
    base = t.to_pandas().groupby(keys, dropna=False, sort=False).agg(
        __sum=("__sum", "sum"), __cnt=("__cnt", "sum")).reset_index()
    outs = []
    for r in range(len(keys), -1, -1):
        for sub in combinations(keys, r):
            if sub:
                g = base.groupby(list(sub), dropna=False,
                                 sort=False).agg(
                    __sum=("__sum", "sum"),
                    __cnt=("__cnt", "sum")).reset_index()
            else:
                g = pd.DataFrame({"__sum": [base["__sum"].sum()],
                                  "__cnt": [base["__cnt"].sum()]})
            n = len(g)
            cols = {}
            for k in keys:
                if k in sub:
                    cols[k] = pa.Array.from_pandas(g[k],
                                                   type=key_types[k])
                else:
                    cols[k] = pa.nulls(n, key_types[k])
            cnt = g["__cnt"].to_numpy(np.int64)
            cols["sum_v"] = pa.array(g["__sum"].to_numpy(np.float64),
                                     type=pa.float64(), mask=cnt == 0)
            cols["cnt_v"] = pa.array(cnt, type=pa.int64())
            outs.append(pa.table(cols))
    return pa.concat_tables(outs)


def cube_agg(ds: ray.data.Dataset, keys: list[str],
             value_col: str) -> ray.data.Dataset:
    """SQL ``GROUP BY CUBE(keys)``: one row per group for EVERY subset
    of the key columns (2^k grouping sets), NULL in the unused key
    columns, ``sum_v``/``cnt_v`` like ``rollup_agg``.

    Scale shape: identical partial scheme to rollup (one scan, per-
    batch distinct-key partials); every grouping set re-aggregates the
    merged BASE level, whose size is the distinct full-key count — so
    the small-partial one-task path covers any corpus whose full-key
    cardinality is bounded. The large-cardinality fallback runs one
    ``groupby`` per subset against the base level (2^k exchanges of at
    most |distinct keys| rows each); k is capped at 6 to keep that
    explicit."""
    if not keys:
        raise ValueError("keys must be non-empty")
    if len(keys) > 6:
        raise ValueError("cube_agg caps at 6 key columns (2^k sets)")

    parts = ds.map_batches(
        _pin(lambda b: _base_partial(b, keys, value_col)),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    if parts.size_bytes() <= _SMALL_PARTIAL_BYTES:
        ref = _cube_merge_task.remote(keys, *parts.to_arrow_refs())
        return ray.data.from_arrow_refs([ref])

    from itertools import combinations

    key_types = {f.name: f.type for f in ds.schema().base_schema
                 if f.name in keys}
    from .smallagg import grouped_sum

    base = grouped_sum(parts, keys, ["__sum", "__cnt"]).materialize()

    def _widen_sub(sub: tuple[str, ...]):
        def fix(b: pa.Table) -> pa.Table:
            n = b.num_rows
            for k in keys:
                if k not in sub:
                    b = b.append_column(k, pa.nulls(n, key_types[k]))
            mask = pc.equal(b.column("__cnt"), 0)
            s = pc.if_else(mask, pa.scalar(None, pa.float64()),
                           b.column("__sum"))
            return pa.table({**{k: b.column(k) for k in keys},
                             "sum_v": s, "cnt_v": b.column("__cnt")})
        return fix

    levels = []
    for r in range(len(keys), 0, -1):
        for sub in combinations(keys, r):
            if r == len(keys):
                agg = base
            else:
                agg = grouped_sum(base, list(sub),
                                  ["__sum", "__cnt"])
            levels.append(agg.map_batches(_widen_sub(sub),
                                          batch_format="pyarrow"))
    tot = base.sum(["__sum", "__cnt"])
    total_tbl = pa.table({
        **{k: pa.nulls(1, key_types[k]) for k in keys},
        "sum_v": pa.array(
            [None if tot["sum(__cnt)"] == 0 else tot["sum(__sum)"]],
            type=pa.float64()),
        "cnt_v": pa.array([tot["sum(__cnt)"]], type=pa.int64()),
    })
    levels.append(ray.data.from_arrow(total_tbl))
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def rollup_agg(ds: ray.data.Dataset, keys: list[str],
               value_col: str) -> ray.data.Dataset:
    """SQL ``GROUP BY ROLLUP(keys)``: one row per group at every key
    prefix level (full keys, each shorter prefix, and the grand
    total), with ``sum_v``/``cnt_v`` of ``value_col`` and NULL in the
    rolled-up key columns. NULL sums follow SQL (a group of zero
    non-null values is impossible here since partials count non-null
    rows; all-NULL value groups yield sum NULL via cnt=0)."""
    if not keys:
        raise ValueError("keys must be non-empty")

    parts = ds.map_batches(
        _pin(lambda b: _base_partial(b, keys, value_col)),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    if parts.size_bytes() <= _SMALL_PARTIAL_BYTES:
        # one task computes every level; refs stay in the object store
        # (passed as top-level args so Ray resolves them — lesson #3)
        ref = _rollup_merge_task.remote(keys, *parts.to_arrow_refs())
        return ray.data.from_arrow_refs([ref])

    def _merge(level_keys: list[str], src: ray.data.Dataset):
        from .smallagg import grouped_sum

        return grouped_sum(src, level_keys, ["__sum", "__cnt"])

    key_types = {f.name: f.type for f in ds.schema().base_schema
                 if f.name in keys}

    def _widen(level: int):
        """Append typed NULL columns for rolled-up keys + final names."""
        rolled = keys[level:]

        def fix(b: pa.Table) -> pa.Table:
            n = b.num_rows
            for k in rolled:
                b = b.append_column(k, pa.nulls(n, key_types[k]))
            b = b.select(keys + ["__sum", "__cnt"])
            mask = pc.equal(b.column("__cnt"), 0)
            s = pc.if_else(mask, pa.scalar(None, pa.float64()),
                           b.column("__sum"))
            return pa.table(
                {**{k: b.column(k) for k in keys},
                 "sum_v": s, "cnt_v": b.column("__cnt")})

        return fix

    levels = []
    cur = _merge(keys, parts)                       # finest level
    levels.append(cur.map_batches(_widen(len(keys)),
                                  batch_format="pyarrow"))
    for i in range(len(keys) - 1, 0, -1):
        cur = _merge(keys[:i], cur)                 # re-agg previous
        levels.append(cur.map_batches(_widen(i),
                                      batch_format="pyarrow"))
    # grand total: fold the coarsest level (already tiny)
    tot = cur.sum(["__sum", "__cnt"])
    total_tbl = pa.table({
        **{k: pa.nulls(1, key_types[k]) for k in keys},
        "sum_v": pa.array(
            [None if tot["sum(__cnt)"] == 0 else tot["sum(__sum)"]],
            type=pa.float64()),
        "cnt_v": pa.array([tot["sum(__cnt)"]], type=pa.int64()),
    })
    levels.append(ray.data.from_arrow(total_tbl))
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out


def _pivot_partial(batch: pa.Table, key_col: str, pivot_col: str,
                   values: list[str], value_col: str) -> pa.Table:
    """Dense per-batch (key × pivot value) scatter — stateless (the
    label lookup costs nothing to rebuild, so plain tasks beat an
    actor pool: the pool's startup was 4× the whole op's runtime)."""
    import pandas as pd

    keys = batch.column(key_col).to_numpy(zero_copy_only=False)
    piv = batch.column(pivot_col)
    # map pivot labels -> column index; unknown labels are dropped
    codes = pc.index_in(
        piv, value_set=pa.array(values, type=piv.type)
    ).to_numpy(zero_copy_only=False)
    v = pc.cast(batch.column(value_col), pa.float64())
    vnp = v.to_numpy(zero_copy_only=False)
    ok = ~pd.isna(codes) & ~np.isnan(vnp)
    # use_na_sentinel=False: a NULL key is a REAL pivot row (SQL GROUP
    # BY keeps it; rollup/cube in this module use dropna=False), not
    # the -1 sentinel that would np.add.at-fold null-key rows into the
    # LAST factorized key's sums.
    kcodes, uniq = pd.factorize(keys[ok], use_na_sentinel=False)
    pcodes = codes[ok].astype(np.int64)
    nv = len(values)
    sums = np.zeros((len(uniq), nv))
    cnts = np.zeros((len(uniq), nv), dtype=np.int64)
    np.add.at(sums, (kcodes, pcodes), vnp[ok])
    np.add.at(cnts, (kcodes, pcodes), 1)
    out = {key_col: pa.array(uniq, type=batch.schema.field(key_col).type,
                             from_pandas=True)}
    for j, name in enumerate(values):
        out[f"__s_{name}"] = pa.array(sums[:, j])
        out[f"__c_{name}"] = pa.array(cnts[:, j], type=pa.int64())
    return pa.table(out)


def pivot_agg(ds: ray.data.Dataset, key_col: str, pivot_col: str,
              values: list[str], value_col: str) -> ray.data.Dataset:
    """Crosstab: one row per ``key_col`` with ``<value>_sum`` /
    ``<value>_cnt`` columns per pivot value — SQL
    ``SUM(CASE WHEN pivot = v THEN value END) AS v_sum`` (NULL when
    the group has no such rows). Rows whose pivot label is not in
    ``values`` are ignored (project the label list explicitly)."""
    if not values:
        raise ValueError("values must be non-empty")
    wide_cols = [c for v in values for c in (f"__s_{v}", f"__c_{v}")]
    parts = ds.map_batches(
        _pin(lambda b: _pivot_partial(b, key_col, pivot_col,
                                      list(values), value_col)),
        batch_format="pyarrow", zero_copy_batch=True)
    from .smallagg import grouped_sum

    # partials carry one row per per-batch distinct key -> usually small
    agg = grouped_sum(parts, [key_col], wide_cols)

    def finish(b: pa.Table) -> pa.Table:
        out = {key_col: b.column(key_col)}
        for v in values:
            c = b.column(f"__c_{v}")
            empty = pc.equal(c, 0)
            out[f"{v}_sum"] = pc.if_else(
                empty, pa.scalar(None, pa.float64()),
                b.column(f"__s_{v}"))
            out[f"{v}_cnt"] = c
        return pa.table(out)

    return agg.map_batches(finish, batch_format="pyarrow",
                           zero_copy_batch=True)


@ray.remote
def _gsets_merge_task(keys: list[str], sets: list[tuple],
                      key_types: dict, *blocks: pa.Table) -> pa.Table:
    """User-listed grouping sets from small partials, one task — one
    output block PER LISTED SET (SQL emits duplicates if a set is
    listed twice), each re-aggregating the merged base level.
    ``key_types`` ships from the input schema: empty inputs produce
    schema-less partial blocks (perf lesson #16), so types cannot be
    recovered from the partials."""
    import pandas as pd

    blocks = [b for b in blocks
              if all(c in b.column_names for c in keys)]
    if blocks:
        t = pa.concat_tables(blocks, promote_options="default")
        base = t.to_pandas().groupby(
            keys, dropna=False, sort=False).agg(
            __sum=("__sum", "sum"), __cnt=("__cnt", "sum")).reset_index()
    else:
        base = pd.DataFrame({**{k: pd.Series(dtype=object)
                                for k in keys},
                             "__sum": pd.Series(dtype=float),
                             "__cnt": pd.Series(dtype="int64")})
    outs = []
    for sub in sets:
        if sub:
            g = base.groupby(list(sub), dropna=False, sort=False).agg(
                __sum=("__sum", "sum"),
                __cnt=("__cnt", "sum")).reset_index()
        else:
            g = pd.DataFrame({"__sum": [base["__sum"].sum()],
                              "__cnt": [base["__cnt"].sum()]})
        n = len(g)
        cols = {}
        for k in keys:
            if k in sub:
                cols[k] = pa.Array.from_pandas(g[k], type=key_types[k])
            else:
                cols[k] = pa.nulls(n, key_types[k])
        cnt = g["__cnt"].to_numpy(np.int64)
        cols["sum_v"] = pa.array(g["__sum"].to_numpy(np.float64),
                                 type=pa.float64(), mask=cnt == 0)
        cols["cnt_v"] = pa.array(cnt, type=pa.int64())
        outs.append(pa.table(cols))
    return pa.concat_tables(outs)


def grouping_sets_agg(ds: ray.data.Dataset, keys: list[str],
                      sets: list[tuple], value_col: str
                      ) -> ray.data.Dataset:
    """SQL ``GROUP BY GROUPING SETS (...)``: the user-listed subset
    family (ROLLUP and CUBE are the prefix / power-set special cases),
    NULL in unused key columns, ``sum_v``/``cnt_v`` per group; a set
    listed twice emits twice (SQL semantics). Same scale shape as
    ``cube_agg``: one scan of per-batch distinct-key partials, every
    set re-aggregated from the merged base level (one task small, one
    ``grouped_sum`` exchange per distinct non-base set large)."""
    if not keys:
        raise ValueError("keys must be non-empty")
    sets = [tuple(s) for s in sets]
    if not sets:
        raise ValueError("sets must be non-empty")
    for s in sets:
        bad = [c for c in s if c not in keys]
        if bad:
            raise ValueError(f"grouping-set columns not in keys: {bad}")

    parts = ds.map_batches(
        _pin(lambda b: _base_partial(b, keys, value_col)),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    key_types = {f.name: f.type for f in ds.schema().base_schema
                 if f.name in keys}
    if parts.size_bytes() <= _SMALL_PARTIAL_BYTES:
        ref = _gsets_merge_task.remote(keys, sets, key_types,
                                       *parts.to_arrow_refs())
        return ray.data.from_arrow_refs([ref])

    from .smallagg import grouped_sum
    base = grouped_sum(parts, keys, ["__sum", "__cnt"]).materialize()

    def _widen_sub(sub: tuple):
        def fix(b: pa.Table) -> pa.Table:
            n = b.num_rows
            for k in keys:
                if k not in sub:
                    b = b.append_column(k, pa.nulls(n, key_types[k]))
            mask = pc.equal(b.column("__cnt"), 0)
            s = pc.if_else(mask, pa.scalar(None, pa.float64()),
                           b.column("__sum"))
            return pa.table({**{k: b.column(k) for k in keys},
                             "sum_v": s, "cnt_v": b.column("__cnt")})
        return fix

    levels = []
    for sub in sets:
        if not sub:
            tot = base.sum(["__sum", "__cnt"])
            total_tbl = pa.table({
                **{k: pa.nulls(1, key_types[k]) for k in keys},
                "sum_v": pa.array(
                    [None if tot["sum(__cnt)"] == 0
                     else tot["sum(__sum)"]], type=pa.float64()),
                "cnt_v": pa.array([tot["sum(__cnt)"]], type=pa.int64()),
            })
            levels.append(ray.data.from_arrow(total_tbl))
        elif set(sub) == set(keys):
            levels.append(base.map_batches(_widen_sub(sub),
                                           batch_format="pyarrow"))
        else:
            agg = grouped_sum(base, list(sub), ["__sum", "__cnt"])
            levels.append(agg.map_batches(_widen_sub(sub),
                                          batch_format="pyarrow"))
    out = levels[0]
    for lv in levels[1:]:
        out = out.union(lv)
    return out
