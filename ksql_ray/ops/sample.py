"""Deterministic (hash-based) sampling for training-data pipelines.

Reservoir/random sampling is not reproducible across retries and
resumes; web-scale pipelines instead sample by **key hash** — a pure
function of the row, stable under re-execution, repartitioning and
failure replay, and shardable (each task samples its own batch with no
coordination). Supports uniform and per-stratum fractions (e.g. keep
30% of 'en' docs, 100% of low-resource languages).

Two hash methods:

- ``method="md5"`` — oracle form; row r is kept iff
  ``uint32(first 8 hex digits of md5(str(key) || seed)) < frac * 2^32``.
  DuckDB-expressible verbatim (``('0x' || substr(md5(...), 1, 8))::UBIGINT``),
  see ``op_stratified_sample`` in pipelines/driver_queries.py. Per-row
  md5 costs a Python loop — fine for gates, not the 10^10-doc path.
- ``method="fast"`` — scale path; vectorized ``pd.util.hash_array``
  over the stringified keys (cython, no row loop). Same statistical
  contract, different hash — NOT oracle-comparable.

The sampling decision is made inside ``map_batches`` (streaming,
per-batch, no shuffle); nothing is materialized.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

__all__ = ["add_sample_hash", "stratified_sample", "weighted_sample",
           "split_assign", "sample_per_key", "bottom_k_sample",
           "weighted_bottom_k", "mixture_sample"]

_2_32 = float(1 << 32)


def add_sample_hash(batch: pa.Table, key_col: str, out: str = "sample_hash",
                    method: str = "md5", seed: str = "") -> pa.Table:
    """Append a uint32-range int64 hash of ``str(key) + seed``."""
    keys = pc.cast(batch.column(key_col), pa.string())
    if isinstance(keys, pa.ChunkedArray):
        keys = keys.combine_chunks()
    if method == "md5":
        h = np.fromiter(
            (int(hashlib.md5((k + seed).encode()).hexdigest()[:8], 16)
             for k in keys.to_pylist()),
            dtype=np.int64, count=len(keys),
        )
    elif method == "fast":
        import pandas as pd

        vals = keys.to_numpy(zero_copy_only=False)
        if seed:
            vals = np.char.add(vals.astype(str), seed)
        h = (pd.util.hash_array(vals).astype(np.uint64) >> np.uint64(32)).astype(np.int64)
    else:
        raise ValueError("method must be 'md5' or 'fast'")
    return batch.append_column(out, pa.array(h, type=pa.int64()))


def stratified_sample(
    ds: ray.data.Dataset,
    key_col: str,
    fractions: float | dict[str, float] = 0.1,
    strata_col: str | None = None,
    default_fraction: float = 0.0,
    method: str = "md5",
    seed: str = "",
) -> ray.data.Dataset:
    """Keep each row iff hash(key) < fraction(stratum) * 2^32.

    ``fractions``: a float (uniform sample) or a dict mapping
    ``strata_col`` values to per-stratum fractions (values not in the
    dict get ``default_fraction``)."""
    if isinstance(fractions, dict) and strata_col is None:
        raise ValueError("per-stratum fractions require strata_col")

    def fn(batch: pa.Table) -> pa.Table:
        b = add_sample_hash(batch, key_col, "__sh", method=method, seed=seed)
        h = b.column("__sh").to_numpy(zero_copy_only=False).astype(np.float64)
        if isinstance(fractions, dict):
            strata = batch.column(strata_col).to_pylist()
            thr = np.fromiter(
                (fractions.get(s, default_fraction) for s in strata),
                dtype=np.float64, count=len(strata),
            ) * _2_32
        else:
            thr = float(fractions) * _2_32
        return batch.filter(pa.array(h < thr))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def weighted_sample(
    ds: ray.data.Dataset,
    key_col: str,
    weight_col: str,
    rate: float,
    scale: float,
    method: str = "md5",
    seed: str = "",
) -> ray.data.Dataset:
    """Deterministic Bernoulli sampling with per-row inclusion
    probability ``weight/scale * rate`` (clamped at 1): keep row iff
    ``hash(key) < ((weight * rate) * 2^32) / scale``.

    Every arithmetic op on the threshold is IEEE correctly-rounded
    (*, /) with this exact association, so DuckDB reproduces the kept
    set bit-for-bit — no transcendental (ln/pow) whose libm rounding
    could flip a boundary row. NULL weights are never kept (SQL
    ``NULL < x`` is not TRUE). Stateless per-batch filter, no shuffle."""
    if scale <= 0 or rate < 0:
        raise ValueError("scale must be > 0 and rate >= 0")

    def fn(batch: pa.Table) -> pa.Table:
        b = add_sample_hash(batch, key_col, "__sh", method=method,
                            seed=seed)
        h = b.column("__sh").to_numpy(zero_copy_only=False).astype(
            np.float64)
        w = pc.cast(batch.column(weight_col),
                    pa.float64()).to_numpy(zero_copy_only=False)
        thr = ((w * rate) * _2_32) / scale
        with np.errstate(invalid="ignore"):
            keep = h < thr                      # NaN weight -> False
        return batch.filter(pa.array(keep))

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def split_assign(
    ds: ray.data.Dataset,
    key_col: str,
    splits: list[tuple[str, int]] | None = None,
    out: str = "split",
    method: str = "md5",
    seed: str = "",
) -> ray.data.Dataset:
    """Deterministic train/val/test assignment: ``hash(key) % 100``
    lands in cumulative integer buckets (default 80/10/10). Pure
    integer arithmetic — reproducible across retries, resumes and in
    SQL; a key always lands in the same split regardless of which
    shard or epoch carries it. Stateless per-batch map, no shuffle."""
    splits = splits or [("train", 80), ("val", 10), ("test", 10)]
    total = sum(p for _, p in splits)
    if total != 100 or any(p <= 0 for _, p in splits):
        raise ValueError("split percents must be positive and sum to 100")
    names = [n for n, _ in splits]
    bounds = np.cumsum([p for _, p in splits])     # e.g. [80, 90, 100]

    def fn(batch: pa.Table) -> pa.Table:
        b = add_sample_hash(batch, key_col, "__sh", method=method,
                            seed=seed)
        h = b.column("__sh").to_numpy(zero_copy_only=False)
        idx = np.searchsorted(bounds, h % 100, side="right")
        lab = pa.DictionaryArray.from_arrays(
            pa.array(idx, type=pa.int32()), pa.array(names)).cast(
            pa.string())
        return batch.append_column(out, lab)

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)


def sample_per_key(
    ds: ray.data.Dataset,
    key_cols: list[str],
    id_col: str,
    n: int,
    method: str = "md5",
    seed: str = "",
) -> ray.data.Dataset:
    """Deterministic n-per-group sample: rank rows within each key by
    ``(hash(id), id)`` and keep rank < n — SQL ``ROW_NUMBER() OVER
    (PARTITION BY key ORDER BY hash_expr, id) <= n``. One key shuffle
    + per-partition sort (ops/rows.top_n_per_key); the hash order is a
    uniform random permutation that is stable under re-execution."""
    from .rows import top_n_per_key

    hashed = ds.map_batches(
        lambda b: add_sample_hash(b, id_col, "__sh", method=method,
                                  seed=seed),
        batch_format="pyarrow", zero_copy_batch=True)
    out = top_n_per_key(hashed, key_cols, "__sh", n, descending=False,
                        tiebreak=id_col)
    return out.map_batches(lambda b: b.drop_columns(["__sh", "rank"]),
                           batch_format="pyarrow", zero_copy_batch=True)


@ray.remote
def _bottomk_merge_task(k: int, sort_cols: list[str],
                        *blocks: pa.Table) -> pa.Table:
    blocks = [b for b in blocks if b.num_rows]
    if not blocks:
        return pa.table({})
    t = pa.concat_tables(blocks, promote_options="default")
    idx = pc.sort_indices(
        t, sort_keys=[(c, "ascending") for c in sort_cols])[:k]
    return t.take(idx)


def bottom_k_sample(
    ds: ray.data.Dataset,
    key_col: str,
    k: int,
    method: str = "md5",
    seed: str = "",
    keep_hash: bool = False,
) -> ray.data.Dataset:
    """Exact-size-k uniform sample: the k rows with the globally
    smallest ``hash(key)`` (ties broken by the key itself).

    Reservoir sampling gives an exact-size sample but is neither
    deterministic nor mergeable across retries; **bottom-k by hash**
    (Cohen & Kaplan, PODS'07 "Summarizing data using bottom-k
    sketches") is both — the bottom-k of a union is the bottom-k of
    the per-shard bottom-k's, so the sample is stable under
    repartitioning, resume and failure replay, and two shards' samples
    merge without coordination.

    Shape: per-batch partial bottom-k inside ``map_batches`` (each
    batch contributes <= k rows regardless of batch size), then ONE
    merge task over the compact partials (ops/smallagg.py rationale:
    a distributed sort exchange costs ~2.4 s fixed for what is <= k x
    num_batches tiny rows). At 100 TB the network carries
    O(k * num_batches) rows, never the data.

    Oracle (DuckDB, bit-equal for method="md5")::

        SELECT ... ORDER BY ('0x' || substr(md5(CAST(key AS VARCHAR)),
          1, 8))::UBIGINT, key LIMIT k
    """
    if k <= 0:
        raise ValueError("k must be positive")

    def partial(batch: pa.Table) -> pa.Table:
        b = add_sample_hash(batch, key_col, "__sh", method=method,
                            seed=seed)
        if b.num_rows > k:
            idx = pc.sort_indices(
                b, sort_keys=[("__sh", "ascending"),
                              (key_col, "ascending")])[:k]
            b = b.take(idx)
        return b

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    ref = _bottomk_merge_task.remote(k, ["__sh", key_col],
                                     *parts.to_arrow_refs())
    out = ray.data.from_arrow_refs([ref])
    if keep_hash:
        return out
    return out.map_batches(
        lambda b: b.drop_columns(["__sh"]) if "__sh" in b.column_names
        else b,
        batch_format="pyarrow", zero_copy_batch=True)


def mixture_sample(
    ds: ray.data.Dataset,
    key_col: str,
    domain_col: str,
    weights: dict[str, float],
    n_target: int,
    method: str = "md5",
    seed: str = "",
) -> ray.data.Dataset:
    """Domain-mixture (temperature) sampling: downsample each domain so
    the kept set approximates ``n_target`` rows distributed by
    ``weights`` — the data-mixing step of large-LM pipelines (Gopher /
    The Pile fix per-source weights; Xie et al. 2023 DoReMi learns
    them; this op applies a given weight vector at scale).

    Pass 1 counts rows per domain (per-batch ``value_counts`` partials
    -> one small merge; the shuffle carries one row per domain per
    batch). The per-domain keep rate is then

        rate(d) = LEAST(1.0, (n_target * w_norm(d)) / count(d))

    computed with exactly this IEEE association so the DuckDB oracle
    reproduces the boundary bit-for-bit, and pass 2 is a stateless
    ``hash(key) < rate * 2^32`` filter (stratified_sample). Domains
    absent from ``weights`` are dropped (rate 0). Nothing is
    materialized on the driver except the tiny domain->count dict."""
    if n_target <= 0:
        raise ValueError("n_target must be positive")
    tot_w = sum(weights.values())
    if tot_w <= 0:
        raise ValueError("weights must sum to a positive value")

    def count_partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        vc = pd.Series(
            batch.column(domain_col).to_pandas()).value_counts()
        return pa.table({
            domain_col: pa.array(vc.index.astype(str), type=pa.string()),
            "cnt": pa.array(vc.to_numpy(), type=pa.int64()),
        })

    from .smallagg import grouped_sum

    parts = ds.select_columns([domain_col]).map_batches(
        count_partial, batch_format="pyarrow", zero_copy_batch=True)
    counts = {r[domain_col]: r["cnt"]
              for r in grouped_sum(parts, [domain_col],
                                   ["cnt"]).take_all()}
    fractions = {
        d: min(1.0, (float(n_target) * (w / tot_w)) / float(counts[d]))
        for d, w in weights.items() if counts.get(d)
    }
    return stratified_sample(ds, key_col, fractions=fractions,
                             strata_col=domain_col, default_fraction=0.0,
                             method=method, seed=seed)


@ray.remote
def _topk_priority_merge(k: int, key_col: str,
                         *blocks: pa.Table) -> pa.Table:
    blocks = [b for b in blocks if b.num_rows]
    if not blocks:
        return pa.table({})
    t = pa.concat_tables(blocks, promote_options="default")
    idx = pc.sort_indices(t, sort_keys=[("__pr", "descending"),
                                        (key_col, "ascending")])[:k]
    return t.take(idx)


def weighted_bottom_k(
    ds: ray.data.Dataset,
    key_col: str,
    weight_col: str,
    k: int,
    method: str = "md5",
    seed: str = "",
    keep_priority: bool = False,
) -> ray.data.Dataset:
    """Exact-size-k sample WITHOUT replacement with inclusion
    probability proportional to weight — Efraimidis & Spirakis 2006
    priority sampling ("weighted random sampling with a reservoir"):
    priority = u^(1/w) with u uniform in (0,1), keep the k LARGEST.
    As with :func:`bottom_k_sample`, u derives deterministically from
    the repo-wide key hash (u = (hash + 0.5) / 2^32), so the sample is
    replay/reshard/merge-stable and the DuckDB oracle reproduces it
    verbatim (``pow(u, 1.0/w) DESC``). Rows with NULL or non-positive
    weight are excluded (SQL ``WHERE w > 0``).

    Shape: per-batch top-k partials (<= k rows per batch on the wire),
    ONE merge task — the same top-k-of-union = top-k-of-top-k's
    mergeability the uniform bottom-k relies on."""
    if k <= 0:
        raise ValueError("k must be positive")

    def partial(batch: pa.Table) -> pa.Table:
        b = add_sample_hash(batch, key_col, "__sh", method=method,
                            seed=seed)
        h = b.column("__sh").to_numpy(zero_copy_only=False)
        w = pc.cast(b.column(weight_col), pa.float64()).to_numpy(
            zero_copy_only=False)
        u = (h + 0.5) / _2_32
        with np.errstate(invalid="ignore", divide="ignore"):
            pr = np.power(u, 1.0 / w)
        ok = ~np.isnan(w) & (w > 0)
        b = b.append_column("__pr", pa.array(
            np.where(ok, pr, np.nan), from_pandas=True)).filter(
            pa.array(ok))
        if b.num_rows > k:
            idx = pc.sort_indices(
                b, sort_keys=[("__pr", "descending"),
                              (key_col, "ascending")])[:k]
            b = b.take(idx)
        return b.drop_columns(["__sh"])

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True).materialize()
    ref = _topk_priority_merge.remote(k, key_col,
                                      *parts.to_arrow_refs())
    out = ray.data.from_arrow_refs([ref])
    if keep_priority:
        return out
    return out.map_batches(
        lambda b: b.drop_columns(["__pr"]) if "__pr" in b.column_names
        else b,
        batch_format="pyarrow", zero_copy_batch=True)
