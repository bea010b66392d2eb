"""Deterministic mergeable quantile sketch (Munro-Paterson /
Manku-Rajagopalan-Lindsay merge-and-prune family).

Percentile questions over a 10^12-turn stream (p50/p99 turn latency,
length distributions for curriculum buckets) need bounded state;
sort-based exact quantiles are a full-data shuffle. This sketch keeps
``capacity`` values per weight level; a full level collapses by
merge + take-every-other (alternating offset — DETERMINISTIC, unlike
KLL's coin flips, so runs are exactly reproducible). Summaries merge
level-wise, which makes them the right shape for per-partition actor
state and per-batch partials.

**No silent approximation**: every collapse at weight-w level adds at
most w to the rank error of any query, and the sketch ACCUMULATES that
bound (``max_rank_error``). While nothing has collapsed the bound is 0
and every quantile is EXACT — the oracle-gated configuration (vs
DuckDB ``quantile_disc``). Under pressure the bound is reported, never
guessed: callers decide whether ±bound/n is acceptable.

Query contract: ``quantile(q)`` returns the smallest stored value whose
weighted rank (number of inserted values ≤ it) is ≥ ``floor(q·(n−1)) + 1``
— exactly SQL ``quantile_disc(col, q)`` when the bound is 0.

All kernel work is vectorized: inserts are one ``np.sort`` per batch,
collapses are slicing, rank queries are one ``np.searchsorted`` per
level. Python loops touch LEVELS (≤ ~40), never values.
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

__all__ = ["QuantileSketch", "dataset_quantiles", "quantile_bucketize",
           "grouped_quantiles", "grouped_hist_partial"]


class QuantileSketch:
    """Levels of sorted float64 arrays; level ℓ items carry weight 2^ℓ."""

    def __init__(self, capacity: int = 4096):
        if capacity < 2 or capacity % 2:
            raise ValueError("capacity must be an even integer >= 2")
        self.capacity = capacity
        self.levels: list[np.ndarray] = []
        self._flip: list[bool] = []     # per-level alternating offset
        self.n = 0                      # total inserted values
        self.max_rank_error = 0         # accumulated collapse bound

    def insert(self, values: np.ndarray) -> None:
        """Insert a batch (NaNs must be filtered by the caller)."""
        v = np.asarray(values, dtype=np.float64)
        if len(v) == 0:
            return
        self.n += len(v)
        v = np.sort(v)
        if not self.levels:
            self.levels.append(np.empty(0, np.float64))
            self._flip.append(False)
        lvl0 = self.levels[0]
        self.levels[0] = (v if len(lvl0) == 0 else
                          np.concatenate([lvl0, v]))
        if len(lvl0):
            self.levels[0].sort(kind="mergesort")
        self._compact()

    def _compact(self) -> None:
        ell = 0
        while ell < len(self.levels):
            buf = self.levels[ell]
            if len(buf) < self.capacity:
                ell += 1
                continue
            # keep every other element; alternate the offset so the
            # systematic rank bias cancels across collapses
            off = 1 if self._flip[ell] else 0
            self._flip[ell] = not self._flip[ell]
            kept = buf[off::2].copy()
            # an odd-length buffer keeps the parity-matching extra item
            self.levels[ell] = np.empty(0, np.float64)
            if ell + 1 == len(self.levels):
                self.levels.append(np.empty(0, np.float64))
                self._flip.append(False)
            nxt = self.levels[ell + 1]
            merged = (kept if len(nxt) == 0 else
                      np.concatenate([nxt, kept]))
            if len(nxt):
                merged.sort(kind="mergesort")
            self.levels[ell + 1] = merged
            # any query rank moves by at most the collapsed weight
            self.max_rank_error += 1 << ell
            ell += 1

    def merge(self, other: "QuantileSketch") -> None:
        if other.capacity != self.capacity:
            raise ValueError("capacity mismatch")
        while len(self.levels) < len(other.levels):
            self.levels.append(np.empty(0, np.float64))
            self._flip.append(False)
        for ell, buf in enumerate(other.levels):
            if len(buf) == 0:
                continue
            mine = self.levels[ell]
            merged = (buf.copy() if len(mine) == 0 else
                      np.concatenate([mine, buf]))
            if len(mine):
                merged.sort(kind="mergesort")
            self.levels[ell] = merged
        self.n += other.n
        self.max_rank_error += other.max_rank_error
        self._compact()

    def rank(self, value: float) -> int:
        """Estimated number of inserted values <= value."""
        r = 0
        for ell, buf in enumerate(self.levels):
            if len(buf):
                r += int(np.searchsorted(buf, value, side="right")) << ell
        return r

    def quantile(self, q: float) -> float:
        """Smallest stored value with rank >= max(1, ceil(q*n)) — the
        inverse-CDF definition, = SQL quantile_disc when
        max_rank_error == 0 (verified against DuckDB)."""
        if self.n == 0:
            raise ValueError("empty sketch")
        if not 0.0 <= q <= 1.0:
            raise ValueError("q must be in [0, 1]")
        target = max(1, int(np.ceil(q * self.n - 1e-9)))
        vals = np.concatenate([b for b in self.levels if len(b)])
        vals = np.unique(vals)
        # weighted rank of every candidate: one searchsorted per level
        ranks = np.zeros(len(vals), dtype=np.int64)
        for ell, buf in enumerate(self.levels):
            if len(buf):
                ranks += np.searchsorted(
                    buf, vals, side="right").astype(np.int64) << ell
        i = int(np.searchsorted(ranks, target, side="left"))
        return float(vals[min(i, len(vals) - 1)])

    # --- (de)serialization for actor checkpoints / cross-task merge ---

    def to_table(self) -> pa.Table:
        lv = [np.full(len(b), ell, np.int64)
              for ell, b in enumerate(self.levels) if len(b)]
        vs = [b for b in self.levels if len(b)]
        return pa.table({
            "level": pa.array(np.concatenate(lv) if lv
                              else np.empty(0, np.int64)),
            "value": pa.array(np.concatenate(vs) if vs
                              else np.empty(0, np.float64)),
            "n": pa.array([self.n] * (len(np.concatenate(lv)) if lv
                                      else 0), type=pa.int64()),
            "err": pa.array([self.max_rank_error] *
                            (len(np.concatenate(lv)) if lv else 0),
                            type=pa.int64()),
        })

    @classmethod
    def from_table(cls, t: pa.Table, capacity: int) -> "QuantileSketch":
        sk = cls(capacity)
        if t.num_rows == 0:
            return sk
        lev = t.column("level").to_numpy(zero_copy_only=False)
        val = t.column("value").to_numpy(zero_copy_only=False)
        top = int(lev.max())
        sk.levels = [np.sort(val[lev == ell]) for ell in range(top + 1)]
        sk._flip = [False] * (top + 1)
        sk.n = int(t.column("n")[0].as_py())
        sk.max_rank_error = int(t.column("err")[0].as_py())
        return sk


def dataset_quantiles(ds: ray.data.Dataset, col: str,
                      qs: list[float], capacity: int = 4096,
                      ) -> tuple[pa.Table, int]:
    """Distributed quantiles of a numeric column: per-batch partial
    sketches (serialized tables, ≤ ~capacity rows each) merged once —
    the only thing that moves is sketch state, never the column.
    Returns ((q, value) table, max_rank_error)."""
    def partial(batch: pa.Table) -> pa.Table:
        sk = QuantileSketch(capacity)
        v = pc.cast(batch.column(col), pa.float64()).combine_chunks()
        npv = v.to_numpy(zero_copy_only=False)
        sk.insert(npv[~np.isnan(npv)])
        return sk.to_table()

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    import ray as _ray

    @_ray.remote
    def _merge_and_query(qs_, capacity_, *tables):
        merged = QuantileSketch(capacity_)
        for t in tables:
            if t.num_rows:
                merged.merge(QuantileSketch.from_table(t, capacity_))
        out = pa.table({
            "q": pa.array(qs_, type=pa.float64()),
            "value": pa.array([merged.quantile(q) for q in qs_],
                              type=pa.float64()),
        })
        return out, merged.max_rank_error

    # sketches are tiny (<= ~capacity rows each); the merge runs in ONE
    # remote task, not on the driver (refs passed top-level: lesson #3)
    return _ray.get(_merge_and_query.remote(
        qs, capacity, *parts.to_arrow_refs()))


def quantile_bucketize(ds: ray.data.Dataset, col: str,
                       qs: list[float] | None = None,
                       capacity: int = 4096,
                       out: str = "bucket",
                       require_exact: bool = False) -> ray.data.Dataset:
    """Rows with a quantile-bucket ordinal attached: ``bucket`` = the
    number of quantile boundaries <= value (``searchsorted
    side='right'``), boundaries taken from :func:`dataset_quantiles`
    (exact ``quantile_disc`` values while max_rank_error is 0, which
    the sketch guarantees until ~capacity² rows). NULL values get a
    NULL bucket. Two passes (boundary sketch, then a stateless
    assignment map) — the boundary list is a handful of floats shipped
    in the task closure, never a shuffle."""
    if qs is None:
        qs = [0.25, 0.5, 0.75]
    if not qs or any(not 0 <= q <= 1 for q in qs):
        raise ValueError("qs must be fractions in [0, 1]")
    t, err = dataset_quantiles(ds, col, sorted(qs), capacity)
    if require_exact and err != 0:
        raise ValueError(
            f"rank error {err} != 0: raise capacity above the row count "
            "for exact quantile_disc boundaries")
    bounds = np.sort(t.column("value").to_numpy())

    def assign(batch: pa.Table) -> pa.Table:
        v = pc.cast(batch.column(col), pa.float64()).to_numpy(
            zero_copy_only=False)
        nulls = np.isnan(v)
        b = np.searchsorted(bounds, v, side="right")
        return batch.append_column(
            out, pa.array(b.astype(np.int64), mask=nulls))

    return ds.map_batches(assign, batch_format="pyarrow",
                          zero_copy_batch=True)


def grouped_hist_partial(batch: pa.Table, key_cols: list[str],
                         col: str) -> pa.Table:
    """One batch -> its (key..., __val, __cnt) histogram partial:
    distinct (key, value) pairs with counts. The unit of work shared by
    the bounded ``grouped_quantiles`` and the streaming job — partials
    merge by summing ``__cnt``. NaN/NULL values are dropped."""
    import pandas as pd

    v = pc.cast(batch.column(col), pa.float64()).to_numpy(
        zero_copy_only=False)
    ok = ~np.isnan(v)
    d = {k: batch.column(k).to_numpy(zero_copy_only=False)[ok]
         for k in key_cols}
    d["__val"] = v[ok]
    g = pd.DataFrame(d).groupby(key_cols + ["__val"], dropna=False,
                                sort=False).size().rename(
        "__cnt").reset_index()
    out = {k: pa.Array.from_pandas(
        g[k], type=batch.schema.field(k).type) for k in key_cols}
    out["__val"] = pa.array(g["__val"].to_numpy(np.float64),
                            type=pa.float64())
    out["__cnt"] = pa.array(g["__cnt"].to_numpy(np.int64),
                            type=pa.int64())
    return pa.table(out)


def _gq_finalize(df, key_cols: list[str], qs: list[float],
                 key_types: dict) -> pa.Table:
    """(key..., __val, __cnt) histogram rows -> one row per (key, q)
    with the exact quantile_disc value. Vectorized: one sort, one
    per-key cumsum, one boolean pick per q (exactly one row per key
    satisfies cum >= target > cum - cnt)."""
    import math

    import pandas as pd

    df = df.groupby(key_cols + ["__val"], dropna=False,
                    sort=False)["__cnt"].sum().reset_index()
    df = df.sort_values(key_cols + ["__val"], kind="mergesort")
    cnt = df["__cnt"].to_numpy(np.int64)
    keys = [df[k].to_numpy() for k in key_cols]
    n = len(df)
    new = np.zeros(n, dtype=bool)
    new[:1] = True
    for k in keys:
        new[1:] |= k[1:] != k[:-1]
    gid = np.cumsum(new) - 1
    totals = np.bincount(gid, weights=cnt).astype(np.int64)
    csum = np.cumsum(cnt)
    base = np.concatenate(([0], csum))[np.flatnonzero(new)]
    cum = csum - np.repeat(base, np.bincount(gid))
    vals = df["__val"].to_numpy(np.float64)
    outs = {k: [] for k in key_cols}
    out_q, out_v = [], []
    for q in qs:
        tgt = np.maximum(1, np.ceil(q * totals - 1e-9)).astype(np.int64)
        tgt_row = np.repeat(tgt, np.bincount(gid))
        pick = (cum >= tgt_row) & ((cum - cnt) < tgt_row)
        idx = np.flatnonzero(pick)
        for k, arr in zip(key_cols, keys):
            outs[k].append(arr[idx])
        out_q.append(np.full(len(idx), q))
        out_v.append(vals[idx])
    cols = {}
    for k in key_cols:
        cols[k] = pa.array(np.concatenate(outs[k]), type=key_types[k],
                           from_pandas=True)
    cols["q"] = pa.array(np.concatenate(out_q), type=pa.float64())
    cols["value"] = pa.array(np.concatenate(out_v), type=pa.float64())
    return pa.table(cols)


@ray.remote
def _gq_merge_task(key_cols: list[str], qs: list[float],
                   *blocks: pa.Table) -> pa.Table:
    from .smallagg import _with_schema

    blocks = _with_schema(blocks, key_cols + ["__val", "__cnt"])
    if not blocks:
        return pa.table({})
    t = pa.concat_tables(blocks, promote_options="default")
    key_types = {k: t.schema.field(k).type for k in key_cols}
    return _gq_finalize(t.to_pandas(), key_cols, qs, key_types)


def grouped_quantiles(ds: ray.data.Dataset, key_cols: list[str],
                      col: str, qs: list[float] | None = None,
                      num_partitions: int = 32) -> ray.data.Dataset:
    """EXACT per-key discrete quantiles — SQL
    ``quantile_disc(col, q) GROUP BY keys`` — via (key, value, count)
    HISTOGRAM partials: each batch collapses to its distinct
    (key, value) pairs, so shuffle payload and state are bounded by
    the key x value-domain cardinality, never the row count. This is
    the scale path for the bounded domains training pipelines bucket
    on (scores, lengths, ratings, turn indices); for unbounded
    continuous domains use the bounded-state sketch
    (``dataset_quantiles``) instead — the Percentile AGGREGATE's
    full-list partials are exact for any domain but carry O(rows)
    state. One merge task when the histogram fits the small budget; a
    key-partitioned exchange of histogram rows otherwise. Output: one
    row per (key, q) with float64 ``value``; NaN/NULL input values are
    ignored, and keys whose values are ALL null are absent from the
    output (SQL emits them with NULL quantiles — filter the oracle or
    the input accordingly)."""
    if qs is None:
        qs = [0.5, 0.9, 0.99]
    if not qs or any(not 0 <= q <= 1 for q in qs):
        raise ValueError("qs must be fractions in [0, 1]")
    qs = sorted(qs)

    def partial(batch: pa.Table) -> pa.Table:
        return grouped_hist_partial(batch, key_cols, col)

    from .dedup import _partition_by, _pin
    from .smallagg import _SMALL_PARTIAL_BYTES

    parts = ds.map_batches(_pin(partial), batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    if parts.size_bytes() <= _SMALL_PARTIAL_BYTES:
        ref = _gq_merge_task.remote(key_cols, qs, *parts.to_arrow_refs())
        return ray.data.from_arrow_refs([ref])

    key_types = {f.name: f.type for f in ds.schema().base_schema
                 if f.name in key_cols}

    def per_part(group: pa.Table) -> pa.Table:
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        if group.num_rows == 0:
            return pa.table({})
        return _gq_finalize(group.to_pandas(), key_cols, qs, key_types)

    return _partition_by(parts, key_cols, num_partitions).map_groups(
        _pin(per_part), batch_format="pyarrow")
