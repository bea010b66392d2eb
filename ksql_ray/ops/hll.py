"""HyperLogLog cardinality estimation (Flajolet et al. 2007).

Distinct-count questions over a 10^12-turn corpus (unique
conversations, vocabulary size, unique users) can't afford the exact
seen-set; HLL answers them in ``m`` bytes with ~1.04/√m relative
error, and its register array is MERGEABLE (elementwise max) — the
right shape for per-batch partials and per-partition actor state. The
reference's only cardinality surface is exact ``COLLECT_SET``
(aggregates.go); this is the bounded-memory counterpart.

Hash contract (same stance as ops/sample.py / ops/dsir.py):

- ``hash="md5"`` — oracle form: h = uint64(first 16 hex of
  md5(str(key))); register = top p bits, rho = 1 + leading zeros of
  the remaining 64−p bits. DuckDB-expressible VERBATIM — including
  rho, via ``strpos(lpad(bin(w), 64-p, '0'), '1')`` — so the gate
  checks the full REGISTER STATE, not just the scalar estimate. md5
  runs once per DISTINCT key per batch (one ``pd.factorize`` pass).
- ``hash="fast"`` — scale path: vectorized ``pd.util.hash_array``.

Register extraction is exact integer work: leading zeros come from a
6-step vectorized binary bit-length (``np.log2`` on a float64 rounds
56-bit ints near power-of-two boundaries and can be off by one).

Shape: one stateless ``map_batches`` emits per-batch partial registers
(≤ m (register, rho) rows per batch, m defaults to 256) merged by a
distributed ``groupby(register).max(rho)`` — nothing corpus-sized
moves. ``hll_estimate`` applies the standard raw estimator with the
small-range (linear counting) correction; both are replicated in the
oracle SQL.
"""

from __future__ import annotations

import hashlib

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

__all__ = ["hll_registers", "hll_estimate", "grouped_hll_registers",
           "grouped_hll"]


def _bitlen_u64(w: np.ndarray) -> np.ndarray:
    """Exact bit length of uint64 values (0 -> 0), vectorized."""
    out = np.zeros(len(w), dtype=np.int64)
    v = w.copy()
    for sh in (32, 16, 8, 4, 2, 1):
        m = v >= (np.uint64(1) << np.uint64(sh))
        out[m] += sh
        v[m] >>= np.uint64(sh)
    out[v > 0] += 1
    return out


def _hash_keys(keys: np.ndarray, hash: str) -> np.ndarray:
    import pandas as pd

    if hash == "md5":
        codes, uniq = pd.factorize(keys)
        hu = np.fromiter(
            (int(hashlib.md5(k.encode()).hexdigest()[:16], 16)
             for k in uniq),
            dtype=np.uint64, count=len(uniq))
        return hu[codes]
    if hash == "fast":
        return pd.util.hash_array(keys).astype(np.uint64)
    raise ValueError("hash must be 'md5' or 'fast'")


def registers_from_keys(keys: np.ndarray, p: int,
                        hash: str) -> tuple[np.ndarray, np.ndarray]:
    """-> (register id, rho) per key; callers max-reduce per register."""
    h = _hash_keys(keys, hash)
    reg = (h >> np.uint64(64 - p)).astype(np.int64)
    w = h & ((np.uint64(1) << np.uint64(64 - p)) - np.uint64(1))
    rho = (64 - p) - _bitlen_u64(w) + 1
    return reg, rho


def hll_registers(ds: ray.data.Dataset, key_col: str, p: int = 8,
                  hash: str = "md5") -> ray.data.Dataset:
    """Nonzero HLL registers of the column: (register, rho) rows,
    rho = max over all keys landing in the register."""
    if not 4 <= p <= 18:
        raise ValueError("p must be in [4, 18]")

    def partial(batch: pa.Table) -> pa.Table:
        col = pc.fill_null(pc.cast(batch.column(key_col),
                                   pa.string()), "")
        arr = (col.combine_chunks()
               if isinstance(col, pa.ChunkedArray) else col)
        keys = arr.to_numpy(zero_copy_only=False)
        if len(keys) == 0:
            return pa.table({"register": pa.array([], pa.int64()),
                             "rho": pa.array([], pa.int64())})
        reg, rho = registers_from_keys(keys, p, hash)
        best = np.zeros(1 << p, dtype=np.int64)
        np.maximum.at(best, reg, rho)
        nz = np.flatnonzero(best)
        return pa.table({"register": pa.array(nz, type=pa.int64()),
                         "rho": pa.array(best[nz], type=pa.int64())})

    from .smallagg import grouped_max

    return grouped_max(ds.map_batches(partial, batch_format="pyarrow",
                                      zero_copy_batch=True),
                       ["register"], ["rho"])


def hll_estimate(registers: pa.Table, p: int = 8) -> float:
    """Raw HLL estimator + small-range (linear counting) correction,
    from a (register, rho) table of the NONZERO registers."""
    m = 1 << p
    rho = registers.column("rho").to_numpy(zero_copy_only=False)
    alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(p, 0.7213 / (1 + 1.079 / m))
    denom = float(np.sum(np.power(2.0, -rho.astype(np.float64))))
    denom += m - len(rho)                 # zero registers contribute 2^0
    e = alpha * m * m / denom
    v = m - len(rho)
    if e <= 2.5 * m and v > 0:
        return float(m * np.log(m / v))
    return float(e)


def grouped_hll_registers(ds: ray.data.Dataset, key_cols: list[str],
                          col: str, p: int = 8,
                          hash: str = "md5") -> ray.data.Dataset:
    """Per-key HLL register state: (key..., register, rho) rows with
    rho max-merged — the bounded-state counterpart of the exact
    COUNT_DISTINCT aggregate (whose partials carry per-key distinct
    VALUE lists, O(distinct) state per key; this carries <= 2^p small
    ints per key no matter how many distinct values the key has).
    Partials: per batch, a dense (batch keys x 2^p) ``np.maximum.at``
    scatter, emitted as nonzero rows only; merge is one compact
    ``grouped_max``. NULL values are skipped; NULL keys form their own
    group (SQL GROUP BY semantics, matching the merge task's
    ``groupby(dropna=False)``)."""
    if not 4 <= p <= 18:
        raise ValueError("p must be in [4, 18]")

    from .dedup import _pin
    from .smallagg import grouped_max

    parts = ds.map_batches(
        _pin(lambda b: grouped_partial(b, key_cols, col, p, hash)),
        batch_format="pyarrow", zero_copy_batch=True)
    return grouped_max(parts, key_cols + ["register"], ["rho"])


def grouped_partial(batch: pa.Table, key_cols: list[str], col: str,
                    p: int, hash: str) -> pa.Table:
    """Per-batch per-key nonzero (key..., register, rho) maxima —
    shared by the bounded op and the streaming per-key job."""
    import pandas as pd

    col_a = batch.column(col)
    valid = pc.is_valid(col_a).to_numpy(zero_copy_only=False)
    vals = pc.fill_null(pc.cast(col_a, pa.string()), "").to_numpy(
        zero_copy_only=False)
    keys = {k: batch.column(k).to_numpy(zero_copy_only=False)
            for k in key_cols}
    if not valid.any():
        return pa.table({
            **{k: pa.array([], batch.schema.field(k).type)
               for k in key_cols},
            "register": pa.array([], pa.int64()),
            "rho": pa.array([], pa.int64())})
    vals = vals[valid]
    # use_na_sentinel=False: NULL keys are a REAL group (code >= 0),
    # never the -1 sentinel — a -1 here would wrap the np.maximum.at
    # row index and max-merge null-key rows into the LAST key's
    # registers (and an all-null batch would scatter into a 0-row
    # array). Matches the merge task's groupby(dropna=False).
    kcodes, uniq_idx = pd.factorize(
        pd.MultiIndex.from_arrays([v[valid] for v in keys.values()])
        if len(key_cols) > 1 else next(iter(keys.values()))[valid],
        use_na_sentinel=False)
    reg, rho = registers_from_keys(vals, p, hash)
    m = 1 << p
    best = np.zeros((len(uniq_idx), m), dtype=np.int64)
    np.maximum.at(best, (kcodes, reg), rho)
    krow, regcol = np.nonzero(best)
    out = {}
    for k, arr in keys.items():
        first = np.zeros(len(uniq_idx), dtype=np.int64)
        # first occurrence index of each factorized key
        seen = np.full(len(uniq_idx), -1, dtype=np.int64)
        idxs = np.arange(len(kcodes))
        # reverse fill: later writes overwrite, so write reversed
        seen[kcodes[::-1]] = idxs[::-1]
        first = seen
        src = arr[valid][first]
        out[k] = pa.array(src[krow],
                          type=batch.schema.field(k).type,
                          from_pandas=True)
    out["register"] = pa.array(regcol.astype(np.int64))
    out["rho"] = pa.array(best[krow, regcol])
    return pa.table(out)


def grouped_hll(ds: ray.data.Dataset, key_cols: list[str], col: str,
                p: int = 8, hash: str = "md5") -> ray.data.Dataset:
    """Per-key approximate distinct count: the standard HLL raw
    estimator + linear-counting small-range correction applied to the
    per-key register state. Output: (key..., est float64). The
    reduction is two compact passes — register max-merge, then per-key
    (sum 2^-rho, nonzero-register count) via ``grouped_sum`` — so
    nothing key-set-sized ever concentrates."""
    regs = grouped_hll_registers(ds, key_cols, col, p, hash=hash)
    m = 1 << p

    def powsum(batch: pa.Table) -> pa.Table:
        rho = batch.column("rho").to_numpy(zero_copy_only=False)
        return pa.table({
            **{k: batch.column(k) for k in key_cols},
            "__pw": pa.array(np.power(2.0, -rho.astype(np.float64))),
            "__nz": pa.array(np.ones(len(rho), dtype=np.int64)),
        })

    from .dedup import _pin
    from .smallagg import grouped_sum

    merged = grouped_sum(
        regs.map_batches(_pin(powsum), batch_format="pyarrow",
                         zero_copy_batch=True),
        key_cols, ["__pw", "__nz"])

    alpha = {4: 0.673, 5: 0.697, 6: 0.709}.get(
        p, 0.7213 / (1 + 1.079 / m))

    def finish(batch: pa.Table) -> pa.Table:
        pw = batch.column("__pw").to_numpy(zero_copy_only=False)
        nz = batch.column("__nz").to_numpy(zero_copy_only=False)
        zeros = m - nz
        denom = pw + zeros            # zero registers contribute 2^0
        est = alpha * m * m / denom
        small = (est <= 2.5 * m) & (zeros > 0)
        with np.errstate(divide="ignore"):
            lin = m * np.log(m / np.maximum(zeros, 1e-300))
        est = np.where(small, lin, est)
        return pa.table({**{k: batch.column(k) for k in key_cols},
                         "est": pa.array(est, type=pa.float64())})

    return merged.map_batches(_pin(finish), batch_format="pyarrow",
                              zero_copy_batch=True)
