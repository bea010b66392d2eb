"""Distributed column profiling: nulls, exact distinct counts, ranges.

The data-quality preflight every 100 TB ingest needs before the real
pipeline runs: per-column row/null counts, EXACT distinct counts, and
numeric min/max. (ksqlDB's DESCRIBE reports schema only — reference
ksql/ddl.go List/Describe — not value statistics.)

Scale shapes:

* counts/min/max: one row per (batch, column) partial — a few floats
  per block regardless of block size — merged in ONE remote task.
* exact distinct: per-batch per-column UNIQUE (payload bounded by
  per-batch distinct values, not rows), then either one merge task
  (small) or a ``groupby(col, val).count -> groupby(col).count``
  exchange (the payload is already distinct pairs, so the shuffle
  moves |distinct| rows). Values travel stringified so one partial
  schema serves every column type; counts stay exact.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray
import ray.data

from .cube import _SMALL_PARTIAL_BYTES
from .dedup import _pin

__all__ = ["profile_columns", "grouped_corr", "mad_outliers"]

_NUMERIC = (pa.types.is_integer, pa.types.is_floating)


def _is_numeric(t: pa.DataType) -> bool:
    return any(f(t) for f in _NUMERIC)


def _stats_partial(batch: pa.Table, cols: list[str]) -> pa.Table:
    names, ns, nulls, mins, maxs = [], [], [], [], []
    for c in cols:
        col = batch.column(c)
        names.append(c)
        ns.append(batch.num_rows)
        nulls.append(col.null_count)
        if _is_numeric(col.type) and batch.num_rows > col.null_count:
            as_f = pc.cast(col, pa.float64())
            # SQL MIN/MAX ignore NaN (Arrow's propagate it): mask to null
            if pa.types.is_floating(col.type):
                as_f = pc.if_else(pc.is_nan(as_f),
                                  pa.scalar(None, pa.float64()), as_f)
            mins.append(pc.min(as_f).as_py())
            maxs.append(pc.max(as_f).as_py())
        else:
            mins.append(None)
            maxs.append(None)
    return pa.table({
        "col": pa.array(names), "n": pa.array(ns, pa.int64()),
        "nulls": pa.array(nulls, pa.int64()),
        "min_v": pa.array(mins, pa.float64()),
        "max_v": pa.array(maxs, pa.float64()),
    })


def _pairs_partial(batch: pa.Table, cols: list[str]) -> pa.Table:
    names, vals = [], []
    for c in cols:
        u = pc.unique(pc.cast(batch.column(c), pa.string()))
        u = u.drop_null()
        names.append(pa.array([c] * len(u)))
        vals.append(u)
    return pa.table({"col": pa.concat_arrays(names) if names else
                     pa.array([], pa.string()),
                     "val": pa.concat_arrays(
                         [v.combine_chunks() if isinstance(
                             v, pa.ChunkedArray) else v for v in vals])
                     if vals else pa.array([], pa.string())})


@ray.remote
def _profile_merge(cols: list[str], n_stats: int, *blocks) -> pa.Table:
    """Fold stats partials + (optionally) distinct pairs in one task.

    ``blocks[:n_stats]`` are stats partials; the rest are either raw
    distinct-pair partials (small path) or pre-reduced
    (col, n_distinct) rows from the exchange fallback."""
    import pandas as pd

    stats = pa.concat_tables(blocks[:n_stats]).to_pandas()
    g = stats.groupby("col", sort=False).agg(
        n_rows=("n", "sum"), n_null=("nulls", "sum"),
        min_v=("min_v", "min"), max_v=("max_v", "max"))
    rest = pa.concat_tables(blocks[n_stats:],
                            promote_options="default").to_pandas()
    if "val" in rest.columns:
        nd = rest.drop_duplicates().groupby("col", sort=False)["val"].size()
    else:
        nd = rest.set_index("col")["n_distinct"]
    out_cols = [c for c in cols if c in g.index]
    return pa.table({
        "col": pa.array(out_cols),
        "n_rows": pa.array([int(g.loc[c, "n_rows"]) for c in out_cols],
                           pa.int64()),
        "n_null": pa.array([int(g.loc[c, "n_null"]) for c in out_cols],
                           pa.int64()),
        "n_distinct": pa.array(
            [int(nd.get(c, 0)) for c in out_cols], pa.int64()),
        # NaN here means "no numeric partial ever saw a value" (e.g. a
        # string column) — that is SQL NULL, not float NaN
        "min_v": pa.array([None if pd.isna(g.loc[c, "min_v"])
                           else float(g.loc[c, "min_v"])
                           for c in out_cols], pa.float64()),
        "max_v": pa.array([None if pd.isna(g.loc[c, "max_v"])
                           else float(g.loc[c, "max_v"])
                           for c in out_cols], pa.float64()),
    })


def grouped_corr(ds: ray.data.Dataset, key_cols: list[str], x: str,
                 y: str) -> ray.data.Dataset:
    """Per-group Pearson correlation and sample covariance of two
    numeric columns — SQL ``CORR(x, y)`` / ``COVAR_SAMP(x, y)`` /
    ``COUNT`` over rows where BOTH are non-null (SQL pairwise
    semantics). Algebraic over the (n, Σx, Σy, Σx², Σy², Σxy) tuple:
    six floats per (key, batch) partial, one compact merge
    (smallagg.grouped_sum), final kernels vectorized per key. NULL
    corr for n<2 or zero variance on either side."""

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        keys = {k: batch.column(k).to_numpy(zero_copy_only=False)
                for k in key_cols}
        xv = pc.cast(batch.column(x), pa.float64()).to_numpy(
            zero_copy_only=False)
        yv = pc.cast(batch.column(y), pa.float64()).to_numpy(
            zero_copy_only=False)
        ok = ~(np.isnan(xv) | np.isnan(yv))
        df = pd.DataFrame({**{k: v[ok] for k, v in keys.items()},
                           "__x": xv[ok], "__y": yv[ok]})
        df["__xx"] = df["__x"] * df["__x"]
        df["__yy"] = df["__y"] * df["__y"]
        df["__xy"] = df["__x"] * df["__y"]
        df["__n"] = 1
        g = df.groupby(key_cols, dropna=False, sort=False).sum(
        ).reset_index()
        out = {k: pa.Array.from_pandas(
            g[k], type=batch.schema.field(k).type) for k in key_cols}
        for c in ["__n", "__x", "__y", "__xx", "__yy", "__xy"]:
            out[c] = pa.array(g[c].to_numpy(np.float64),
                              type=pa.float64())
        return pa.table(out)

    from .smallagg import grouped_sum

    mom = ["__n", "__x", "__y", "__xx", "__yy", "__xy"]
    merged = grouped_sum(
        ds.map_batches(_pin(partial), batch_format="pyarrow",
                       zero_copy_batch=True), key_cols, mom)

    def finish(b: pa.Table) -> pa.Table:
        n = b.column("__n").to_numpy(zero_copy_only=False)
        sx = b.column("__x").to_numpy(zero_copy_only=False)
        sy = b.column("__y").to_numpy(zero_copy_only=False)
        sxx = b.column("__xx").to_numpy(zero_copy_only=False)
        syy = b.column("__yy").to_numpy(zero_copy_only=False)
        sxy = b.column("__xy").to_numpy(zero_copy_only=False)
        with np.errstate(invalid="ignore", divide="ignore"):
            cov = (sxy - sx * sy / n) / (n - 1.0)
            vx = np.maximum(sxx - sx * sx / n, 0.0)
            vy = np.maximum(syy - sy * sy / n, 0.0)
            corr = (sxy - sx * sy / n) / np.sqrt(vx * vy)
        bad = (n < 2) | (vx <= 0.0) | (vy <= 0.0)
        return pa.table({
            **{k: b.column(k) for k in key_cols},
            "corr": pa.array(np.where(bad, np.nan, corr),
                             type=pa.float64(), from_pandas=True),
            "covar": pa.array(np.where(n < 2, np.nan, cov),
                              type=pa.float64(), from_pandas=True),
            "n": pa.array(n.astype(np.int64), type=pa.int64()),
        })

    return merged.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)


def profile_columns(ds: ray.data.Dataset,
                    cols: list[str]) -> ray.data.Dataset:
    """One row per profiled column: ``n_rows``, ``n_null``, exact
    ``n_distinct`` (of non-null values), and float64 ``min_v`` /
    ``max_v`` (NULL for non-numeric columns) — SQL
    ``COUNT(*) / COUNT(*)-COUNT(c) / COUNT(DISTINCT c) /
    CAST(MIN(c) AS DOUBLE) / CAST(MAX(c) AS DOUBLE)``."""
    if not cols:
        raise ValueError("cols must be non-empty")
    ds = ds.select_columns(cols)
    stats = ds.map_batches(
        _pin(lambda b: _stats_partial(b, cols)),
        batch_format="pyarrow", zero_copy_batch=True).materialize()
    pairs = ds.map_batches(
        _pin(lambda b: _pairs_partial(b, cols)),
        batch_format="pyarrow", zero_copy_batch=True).materialize()

    if pairs.size_bytes() <= _SMALL_PARTIAL_BYTES:
        dist_refs = pairs.to_arrow_refs()
    else:
        # exchange path: global dedup of (col, val) then count per col;
        # both shuffles move distinct pairs, never input rows
        dd = pairs.groupby(["col", "val"]).count()
        counts = dd.groupby("col").count().map_batches(
            lambda b: b.rename_columns(["col", "n_distinct"]),
            batch_format="pyarrow", zero_copy_batch=True).materialize()
        dist_refs = counts.to_arrow_refs()

    stats_refs = stats.to_arrow_refs()
    ref = _profile_merge.remote(cols, len(stats_refs),
                                *stats_refs, *dist_refs)
    return ray.data.from_arrow_refs([ref])


def _interp_median(v: np.ndarray, starts: np.ndarray,
                   nv: np.ndarray) -> np.ndarray:
    """Per-segment interpolated median (quantile_cont 0.5) over sorted
    values; segments with nv == 0 yield NaN. Interpolation form is
    ``lo + 0.5*(hi - lo)`` — DuckDB's quantile_cont formula — so the
    oracle comparison is bit-exact, not just 1-ulp close."""
    med = np.full(len(starts), np.nan)
    ok = nv > 0
    lo = v[starts[ok] + (nv[ok] - 1) // 2]
    hi = v[starts[ok] + nv[ok] // 2]
    med[ok] = lo + 0.5 * (hi - lo)
    return med


class _MadFlagger:
    """Actor-pool flag pass: the broadcast (key -> med, mad) map is
    resolved ONCE per actor (never per batch)."""

    def __init__(self, stats_ref, key_col: str, val_col: str, c: float):
        import pandas as pd

        med_map, mad_map = ray.get(stats_ref)
        self._med = pd.Series(med_map)
        self._mad = pd.Series(mad_map)
        self._key, self._val, self._c = key_col, val_col, c

    def __call__(self, batch: pa.Table) -> pa.Table:
        import pandas as pd

        keys = pd.Series(
            batch.column(self._key).to_numpy(zero_copy_only=False))
        med = keys.map(self._med).to_numpy(dtype=np.float64)
        mad = keys.map(self._mad).to_numpy(dtype=np.float64)
        v = pc.cast(batch.column(self._val), pa.float64()).to_numpy(
            zero_copy_only=False)
        dev = np.abs(v - med)
        flag = dev > self._c * mad
        mask = np.isnan(v) | np.isnan(med) | np.isnan(mad)
        return (batch
                .append_column("med", pa.array(med, mask=np.isnan(med)))
                .append_column("mad", pa.array(mad, mask=np.isnan(mad)))
                .append_column("is_outlier",
                               pa.array(flag, type=pa.bool_(), mask=mask)))


def mad_outliers(ds: ray.data.Dataset, key_col: str, val_col: str,
                 c: float = 3.0, num_partitions: int = 32,
                 concurrency=(1, 8)) -> ray.data.Dataset:
    """Per-key robust outlier flags: row is an outlier iff
    ``|x - median_key| > c * MAD_key`` (MAD = median absolute deviation,
    the robust z-score — unlike mean/stddev, one corrupt feed can't
    drag the threshold). Appends ``med``, ``mad``, ``is_outlier`` to the
    input rows; NULL values (or keys whose MAD is undefined) flag NULL.
    NULL keys form one group for the stats pass but their rows flag
    NULL (the broadcast lookup maps them to no threshold) — unlike a
    SQL inner join on the key, which would drop the rows entirely; the
    row set here is always the input row set.

    Scale shape: ONE hash exchange of the (key, value) projection
    computes exact per-key median + MAD (keys are partition-disjoint;
    two in-memory per-segment median scans over one sort). The
    resulting stats table is O(distinct keys) — broadcast once with
    ``ray.put`` and joined back by a stateless actor-pool map, so the
    full-width rows never shuffle. Medians interpolate exactly like
    DuckDB ``median`` (quantile_cont 0.5)."""
    from .dedup import _partition_by
    from .rows import _key_arrays, _segment_starts

    sel = ds.select_columns([key_col, val_col])

    def stats(group: pa.Table) -> pa.Table:
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        kt = group.schema.field(key_col).type if \
            key_col in group.column_names else pa.string()
        empty = pa.table({key_col: pa.nulls(0, kt),
                          "med": pa.array([], type=pa.float64()),
                          "mad": pa.array([], type=pa.float64())})
        if group.num_rows == 0 or key_col not in group.column_names:
            return empty
        tbl = group.take(pc.sort_indices(
            group, sort_keys=[(key_col, "ascending"),
                              (val_col, "ascending")],
            null_placement="at_end"))
        n = tbl.num_rows
        v = pc.cast(tbl.column(val_col), pa.float64()).to_numpy(
            zero_copy_only=False)
        seg = _segment_starts(_key_arrays(tbl, [key_col]), n)  # per row
        starts = np.unique(seg)                       # per segment
        # values sort nulls-last within each key: valid count per segment
        nv = np.add.reduceat(~np.isnan(v), starts).astype(np.int64) \
            if n else np.zeros(0, dtype=np.int64)
        med = _interp_median(v, starts, nv)
        kcodes = np.searchsorted(starts, seg)
        dev = np.abs(v - med[kcodes])
        order = np.lexsort((dev, kcodes))  # NaN devs land last per key
        mad = _interp_median(dev[order], starts, nv)
        return pa.table({
            key_col: tbl.column(key_col).take(pa.array(starts)),
            "med": pa.array(med, mask=np.isnan(med)),
            "mad": pa.array(mad, mask=np.isnan(mad))})

    parts = _partition_by(sel, [key_col], num_partitions).map_groups(
        _pin(stats), batch_format="pyarrow").materialize()

    import pandas as pd

    blocks = [b for b in ray.get(parts.to_arrow_refs())
              if "med" in b.column_names]
    st = pa.concat_tables(blocks, promote_options="default") if blocks \
        else pa.table({key_col: pa.nulls(0, pa.string()),
                       "med": pa.array([], type=pa.float64()),
                       "mad": pa.array([], type=pa.float64())})
    kv = st.column(key_col).to_numpy(zero_copy_only=False)
    stats_ref = ray.put((
        pd.Series(st.column("med").to_numpy(zero_copy_only=False),
                  index=kv).to_dict(),
        pd.Series(st.column("mad").to_numpy(zero_copy_only=False),
                  index=kv).to_dict()))
    return ds.map_batches(_MadFlagger, batch_format="pyarrow",
                          zero_copy_batch=True, concurrency=concurrency,
                          fn_constructor_args=(stats_ref, key_col,
                                               val_col, c),
                          # ctor ref in object store + restarts ->
                          # ray#53727 warning
                          max_restarts=0)
