"""Streaming similarity join against a STATIC reference corpus:
"which incoming documents near-match a fixed reference set" on ingest —
cross-dataset contamination / licensed-content / benchmark-overlap
detection as a continuous job (the streaming counterpart of
``ops/dedup.similarity_join``; WITHIN-stream near-dup suppression lives
in ``streaming/neardup.py``).

Semantics: a match is emitted for every (stream doc, reference doc)
pair that shares >= 1 MinHash-LSH band bucket AND has exact word-n-gram
Jaccard >= ``threshold`` (the candidate-verify shape of Broder 1997 /
Xiao et al. WWW'08). The reference never changes, so unlike
``StreamingNearDupJob`` there is no insert phase, no LSM runs and no
cross-epoch ordering constraint — epochs are embarrassingly parallel
and a replayed epoch rewrites the same sink file (idempotent).

Physical shape:

* build-once (``__init__``): one task per reference file computes the
  doc store (id, sig, sorted-unique shingle hashes) and returns P
  band-key slices + S payload shards (``num_returns=P+S`` point-to-point
  routing). P ``SimJoinIndexActor``s each hold their key partition of
  the reference LSH index as ONE sorted (key, ref_id) array pair
  (static — sealed after build; membership is one ``np.searchsorted``
  vectorized over the whole probe batch). S payload shards (ref_id ->
  packed shingles, ref_id-sorted) are consolidated once and pinned in
  the object store — at 10M reference docs x 16 bands the index is
  ~2.5 GB spread over P actors, the payload ~sharded by S; neither is
  ever on the driver.
* per epoch: prep tasks (one per file) compute the stream-side store
  (id-sorted) + band-key probe slices; index actors return candidate
  (stream_id, ref_id) pairs (matches per probe key capped at
  ``ref_cap``, caps counted, never silent); one verify task per payload
  shard dedups its candidates, gathers both sides' shingles
  (searchsorted lookups — no concat/re-sort of the epoch), computes
  exact Jaccard vectorized (ops/dedup._exact_jaccard_of_pairs), and
  writes (partition, epoch) output through the idempotent two-phase
  sink.
* resume: the reference is static and the sink idempotent, so the
  committed-epoch manifest IS the checkpoint — ``resume=True`` skips
  epochs <= ``sink.committed_epoch()`` (replayed epochs report
  ``rows_in: 0``).

Stream ids must be globally unique and |id| < 2^63 (they are never
side-encoded here — unlike the bounded op, the two sides live in
physically different structures).
"""

from __future__ import annotations

from typing import Sequence

import numpy as np
import os

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import ray

from ..ops.dedup import (_band_rows_fn, _exact_jaccard_of_pairs,
                         _mh_store_stage)
from ..ops.vectors import pack_u64_var, unpack_u64
from .driver import _split_by_part, limit_worker_threads
from .sink import TwoPhaseSink

__all__ = ["StreamingSimJoinJob"]

_KEY_PRIME = np.uint64(0x9E3779B97F4A7C15)


def _band_keys(store: pa.Table, id_col: str, num_hashes: int,
               bands: int) -> tuple[np.ndarray, np.ndarray]:
    """Store rows -> (uint64 band key, doc id) flat arrays: the (band,
    bucket) pair folded into one 64-bit key so routing and the sorted
    index are single-array operations."""
    rows = _band_rows_fn(id_col, num_hashes, bands,
                         sig_dtype=np.uint32)(store)
    band = rows.column("band").to_numpy(zero_copy_only=False)
    bucket = rows.column("bucket").to_numpy(
        zero_copy_only=False).view(np.uint64)
    key = (band.astype(np.uint64) + np.uint64(1)) * _KEY_PRIME ^ bucket
    ids = rows.column(id_col).to_numpy(zero_copy_only=False)
    return key, ids


def _store_for(batch: pa.Table, id_col: str, text_col: str, ngram: int,
               num_hashes: int, seed: int) -> pa.Table:
    st = _mh_store_stage(batch, id_col, text_col, ngram, num_hashes,
                         seed, True, sig_dtype=np.uint32)
    return st.take(pc.sort_indices(
        st, sort_keys=[(id_col, "ascending")]))


@ray.remote
def _ref_build(inputs, columns, id_col: str, text_col: str, ngram: int,
               num_hashes: int, seed: int, bands: int, P: int, S: int):
    """Reference file -> P (key, ref_id) slices + S id-sorted payload
    shards (invoked with ``num_returns=P+S``)."""
    limit_worker_threads()
    tabs = []
    for x in inputs:
        batch = x if isinstance(x, pa.Table) else pq.read_table(
            x, columns=columns)
        tabs.append(_store_for(batch, id_col, text_col, ngram,
                               num_hashes, seed))
    store = tabs[0] if len(tabs) == 1 else pa.concat_tables(tabs)
    key, ids = _band_keys(store, id_col, num_hashes, bands)
    kt = pa.table({"key": pa.array(key.view(np.int64)),
                   "ref_id": pa.array(ids.astype(np.int64)),
                   "__part": pa.array(
                       (key % np.uint64(P)).astype(np.int64))})
    out = list(_split_by_part(kt, P))
    sid = store.column(id_col).to_numpy(
        zero_copy_only=False).astype(np.int64)
    shard = (sid.view(np.uint64) % np.uint64(S)).astype(np.int64)
    pt = pa.table({"ref_id": pa.array(sid),
                   "shingles": store.column("shingles"),
                   "__part": pa.array(shard)})
    out.extend(_split_by_part(pt, S))
    return out[0] if len(out) == 1 else tuple(out)


@ray.remote
def _consolidate_shard(*parts: pa.Table) -> pa.Table:
    """Union one payload shard's per-file slices, ref_id-sorted."""
    limit_worker_threads()
    live = [p.drop_columns(["__part"]) for p in parts
            if p is not None and p.num_rows]
    if not live:
        return pa.table({"ref_id": pa.array([], pa.int64()),
                         "shingles": pa.array([], pa.binary())})
    t = pa.concat_tables(live)
    return t.take(pc.sort_indices(
        t, sort_keys=[("ref_id", "ascending")]))


@ray.remote
class SimJoinIndexActor:
    """One key partition of the static reference LSH index."""

    def __init__(self, part_id: int, ref_cap: int):
        limit_worker_threads()
        self.part_id = part_id
        self.ref_cap = ref_cap
        self._build: list[pa.Table] = []
        self.keys: np.ndarray | None = None
        self.ref_ids: np.ndarray | None = None

    def ingest(self, *parts) -> None:
        self._build.extend(p for p in parts
                           if p is not None and p.num_rows)

    def seal(self) -> int:
        if self._build:
            t = pa.concat_tables(
                [p.drop_columns(["__part"]) for p in self._build])
            k = t.column("key").to_numpy(
                zero_copy_only=False).view(np.uint64)
            r = t.column("ref_id").to_numpy(zero_copy_only=False)
            o = np.lexsort((r, k))
            self.keys, self.ref_ids = k[o], r[o].astype(np.int64)
        else:
            self.keys = np.empty(0, dtype=np.uint64)
            self.ref_ids = np.empty(0, dtype=np.int64)
        self._build = []
        return int(len(self.keys))

    def probe(self, epoch: int, *slices) -> pa.Table:
        """(key, stream_id) probe rows -> candidate (stream_id, ref_id)
        pairs + per-probe stats (rows of the epoch seen by this
        partition ride the ``probe_rows`` column of row 0)."""
        outs_s, outs_r = [], []
        probe_rows = 0
        capped = 0
        for t in slices:
            if t is None or t.num_rows == 0:
                continue
            probe_rows += t.num_rows
            k = t.column("key").to_numpy(
                zero_copy_only=False).view(np.uint64)
            sid = t.column("stream_id").to_numpy(zero_copy_only=False)
            lo = np.searchsorted(self.keys, k, "left")
            hi = np.searchsorted(self.keys, k, "right")
            cnt = hi - lo
            over = cnt > self.ref_cap
            capped += int(over.sum())
            cnt = np.minimum(cnt, self.ref_cap)
            m = cnt > 0
            if not m.any():
                continue
            reps = cnt[m]
            # gather each probe's [lo, lo+cnt) index range, vectorized
            base = np.repeat(lo[m], reps)
            within = np.arange(int(reps.sum())) - np.repeat(
                np.concatenate(([0], np.cumsum(reps)))[:-1], reps)
            outs_r.append(self.ref_ids[base + within])
            outs_s.append(np.repeat(sid[m], reps))
        s = (np.concatenate(outs_s) if outs_s
             else np.empty(0, dtype=np.int64))
        r = (np.concatenate(outs_r) if outs_r
             else np.empty(0, dtype=np.int64))
        # stats ride row 0; an all-stats sentinel row (real=False) is
        # appended when the partition saw no candidates
        n = max(len(s), 1)
        pr = np.zeros(n, dtype=np.int64)
        cp = np.zeros(n, dtype=np.int64)
        pr[0], cp[0] = probe_rows, capped
        real = np.ones(n, dtype=bool)
        if len(s) == 0:
            s = np.zeros(1, dtype=np.int64)
            r = np.zeros(1, dtype=np.int64)
            real[0] = False
        return pa.table({
            "stream_id": pa.array(s.astype(np.int64)),
            "ref_id": pa.array(r.astype(np.int64)),
            "probe_rows": pa.array(pr),
            "capped": pa.array(cp),
            "real": pa.array(real),
        })


def _ranges(base: np.ndarray, counts: np.ndarray) -> np.ndarray:
    """Flat gather indices for segments [base[i], base[i]+counts[i])."""
    total = int(counts.sum())
    if total == 0:
        return np.empty(0, dtype=np.int64)
    rep = np.repeat(base, counts)
    within = np.arange(total, dtype=np.int64) - np.repeat(
        np.concatenate(([0], np.cumsum(counts)))[:-1], counts)
    return rep + within


def _lookup_shingles(tables: Sequence[pa.Table], ids: np.ndarray,
                     id_name: str) -> tuple[np.ndarray, np.ndarray]:
    """Gather packed shingles for ``ids`` from id-sorted tables ->
    (flat uint64 in ``ids`` order, per-id counts). Missing ids get zero
    shingles. Fully vectorized: one searchsorted + one segment gather
    per table, one segment reorder at the end — no per-id Python."""
    counts = np.zeros(len(ids), dtype=np.int64)
    dest_rows: list[np.ndarray] = []
    seg_counts: list[np.ndarray] = []
    seg_flat: list[np.ndarray] = []
    for t in tables:
        if t is None or t.num_rows == 0:
            continue
        tid = t.column(id_name).to_numpy(zero_copy_only=False)
        pos = np.searchsorted(tid, ids)
        pos = np.minimum(pos, len(tid) - 1)
        hit = tid[pos] == ids
        if not hit.any():
            continue
        fl, ct = unpack_u64(t.column("shingles"))
        offs = np.concatenate(([0], np.cumsum(ct)))
        rows = np.flatnonzero(hit)
        p = pos[rows]
        cts = ct[p]
        counts[rows] = cts
        dest_rows.append(rows)
        seg_counts.append(cts)
        seg_flat.append(fl[_ranges(offs[p], cts)])
    if not dest_rows:
        return np.empty(0, dtype=np.uint64), counts
    rows = np.concatenate(dest_rows)
    cts = np.concatenate(seg_counts)
    fl = np.concatenate(seg_flat)
    order = np.argsort(rows, kind="stable")
    offs = np.concatenate(([0], np.cumsum(cts)))
    return fl[_ranges(offs[order], cts[order])], counts


@ray.remote
def _verify(epoch: int, shard: int, S: int, threshold: float,
            sink_dir: str, n_cands: int, *refs):
    """Dedup + exactly verify this payload shard's candidates; write
    the epoch's matches through the idempotent sink. ``refs`` =
    ``n_cands`` candidate tables + the epoch's stream stores + the
    payload shard (flattened varargs so Ray resolves every ref)."""
    limit_worker_threads()
    cand_tables = refs[:n_cands]
    stream_stores = refs[n_cands:-1]
    payload = refs[-1]
    cands = pa.concat_tables(
        [t for t in cand_tables if t is not None and t.num_rows])
    probe_rows = int(pc.sum(cands.column("probe_rows")).as_py() or 0)
    capped = int(pc.sum(cands.column("capped")).as_py() or 0)
    s_all = cands.column("stream_id").to_numpy(zero_copy_only=False)
    r_all = cands.column("ref_id").to_numpy(zero_copy_only=False)
    real = cands.column("real").to_numpy(zero_copy_only=False)
    mine = real & ((r_all.view(np.uint64) % np.uint64(S)).astype(
        np.int64) == shard)
    s, r = s_all[mine], r_all[mine]
    sink = TwoPhaseSink(sink_dir)
    stats = {"probe_rows": probe_rows if shard == 0 else 0,
             "capped": capped if shard == 0 else 0,
             "candidates": 0, "matches": 0}
    empty = pa.table({"stream_id": pa.array([], pa.int64()),
                      "ref_id": pa.array([], pa.int64()),
                      "jaccard": pa.array([], pa.float64())})
    if len(s) == 0:
        sink.write(shard, epoch, empty)
        return stats
    o = np.lexsort((r, s))
    s, r = s[o], r[o]
    uniq = np.ones(len(s), dtype=bool)
    uniq[1:] = (s[1:] != s[:-1]) | (r[1:] != r[:-1])
    s, r = s[uniq], r[uniq]
    stats["candidates"] = int(len(s))
    sf, sc = _lookup_shingles(stream_stores, s, "doc_id")
    rf, rc = _lookup_shingles([payload], r, "ref_id")
    # interleave [stream_i, ref_i] rows into one pair-segment table
    k = len(s)
    counts = np.empty(2 * k, dtype=np.int64)
    counts[0::2], counts[1::2] = sc, rc
    offs = np.concatenate(([0], np.cumsum(counts)))
    flat = np.empty(int(counts.sum()), dtype=np.uint64)
    flat[_ranges(offs[0:-1:2], sc)] = sf   # stream rows (even)
    flat[_ranges(offs[1:-1:2], rc)] = rf   # ref rows (odd)
    seg = pa.table({
        "doc_a": pa.array(np.repeat(s, 2)),
        "doc_b": pa.array(np.repeat(r, 2)),
        "shingles": pack_u64_var(flat, counts),
    })
    a, b, jac = _exact_jaccard_of_pairs(seg)
    keep = jac >= threshold
    out = pa.table({"stream_id": pa.array(a[keep].astype(np.int64)),
                    "ref_id": pa.array(b[keep].astype(np.int64)),
                    "jaccard": pa.array(jac[keep], type=pa.float64())})
    stats["matches"] = out.num_rows
    sink.write(shard, epoch, out)
    return stats


@ray.remote
def _write_clean(epoch: int, file_idx: int, src, columns,
                 id_col: str, pair_sink_dir: str, clean_dir: str,
                 num_shards: int, *verify_acks) -> dict:
    """Decontamination-FILTER writer: drop this file's rows whose id
    matched the reference this epoch, write the survivors as one
    (file, epoch) Parquet through the idempotent sink. Runs after the
    epoch's verify tasks (their acks are ordering-only args); matched
    ids are read back from the committed pair files — the sink is the
    single source of truth, so a replayed epoch filters identically."""
    limit_worker_threads()
    sink = TwoPhaseSink(clean_dir)
    batch = src if isinstance(src, pa.Table) else pq.read_table(
        src, columns=columns)
    matched = []
    for sh in range(num_shards):
        f = os.path.join(pair_sink_dir,
                         f"part-{sh:04d}-epoch-{epoch:06d}.parquet")
        if os.path.exists(f):
            matched.append(pq.read_table(f, columns=["stream_id"])
                           .column("stream_id").to_numpy(
                               zero_copy_only=False))
    ids = batch.column(id_col).to_numpy(zero_copy_only=False)
    bad = (np.unique(np.concatenate(matched)) if matched
           else np.empty(0, dtype=np.int64))
    if len(bad):
        pos = np.searchsorted(bad, ids)
        pos = np.minimum(pos, len(bad) - 1)
        keep = bad[pos] != ids
    else:
        keep = np.ones(len(ids), dtype=bool)
    out = batch.filter(pa.array(keep))
    sink.write(file_idx, epoch, out)
    return {"rows_clean": out.num_rows, "rows_dropped":
            int(batch.num_rows - out.num_rows)}



@ray.remote
def _sim_prep(inputs, columns, id_col: str, text_col: str, ngram: int,
              num_hashes: int, seed: int, bands: int, P: int):
    """Stream file -> P (key, stream_id) probe slices + the id-sorted
    stream store (invoked with ``num_returns=P+1``)."""
    limit_worker_threads()
    tabs = []
    for x in inputs:
        batch = x if isinstance(x, pa.Table) else pq.read_table(
            x, columns=columns)
        tabs.append(_store_for(batch, id_col, text_col, ngram,
                               num_hashes, seed))
    store = tabs[0] if len(tabs) == 1 else pa.concat_tables(tabs)
    if len(tabs) > 1:
        store = store.take(pc.sort_indices(
            store, sort_keys=[(id_col, "ascending")]))
    key, ids = _band_keys(store, id_col, num_hashes, bands)
    kt = pa.table({"key": pa.array(key.view(np.int64)),
                   "stream_id": pa.array(ids.astype(np.int64)),
                   "__part": pa.array(
                       (key % np.uint64(P)).astype(np.int64))})
    out = list(_split_by_part(kt, P))
    out.append(pa.table({
        "doc_id": store.column(id_col),
        "shingles": store.column("shingles"),
    }))
    return tuple(out)


class StreamingSimJoinJob:
    """Continuous similarity join of a micro-batch Parquet stream
    against a static reference corpus."""

    def __init__(self, sink_dir: str, reference, *,
                 id_col: str = "doc_id", text_col: str = "text",
                 ref_id_col: str | None = None,
                 threshold: float = 0.7, num_hashes: int = 64,
                 bands: int = 16, ngram: int = 3, seed: int = 42,
                 ref_cap: int = 64, num_partitions: int = 4,
                 num_shards: int | None = None,
                 columns: Sequence[str] | None = None,
                 clean_dir: str | None = None,
                 resume: bool = False):
        self.sink_dir = sink_dir
        self.sink = TwoPhaseSink(sink_dir)
        self.id_col = id_col
        self.text_col = text_col
        self.threshold = threshold
        self.num_hashes = num_hashes
        self.bands = bands
        self.ngram = ngram
        self.seed = seed
        self.P = num_partitions
        self.S = num_shards or num_partitions
        self.columns = list(columns) if columns else None
        if self.columns:
            for c in (id_col, text_col):
                if c not in self.columns:
                    self.columns.append(c)
        self.actors = [SimJoinIndexActor.remote(i, ref_cap)
                       for i in range(self.P)]
        rid = ref_id_col or id_col
        ref_files = ([reference] if isinstance(reference, (str, pa.Table))
                     else list(reference))
        builds = [_ref_build.options(num_returns=self.P + self.S).remote(
            [f], None, rid, text_col, ngram, num_hashes, seed, bands,
            self.P, self.S) for f in ref_files]
        parts = ([[r] for r in builds] if self.P + self.S == 1
                 else [list(r) for r in builds])
        for p in range(self.P):
            ray.get(self.actors[p].ingest.remote(
                *[parts[i][p] for i in range(len(builds))]))
        self.index_keys = sum(ray.get(
            [a.seal.remote() for a in self.actors]))
        self.payload = [_consolidate_shard.remote(
            *[parts[i][self.P + sh] for i in range(len(builds))])
            for sh in range(self.S)]
        # decontamination-FILTER mode: also write the CLEAN stream
        # (rows with no reference match) to a second idempotent sink
        self.clean_dir = clean_dir
        self.clean_sink = TwoPhaseSink(clean_dir) if clean_dir else None
        self._file_seq = 0
        self.epoch = -1
        self._resume_cursor = (self.sink.committed_epoch()
                               if resume else -1)
        if resume and self.clean_sink:
            self._resume_cursor = min(self._resume_cursor,
                                      self.clean_sink.committed_epoch())
        self.metrics: list[dict] = []

    def _submit_epoch(self, files_or_tables: Sequence):
        self.epoch += 1
        if self.epoch <= self._resume_cursor:
            self._file_seq += len(files_or_tables)
            return (self.epoch, None)
        preps = [_sim_prep.options(num_returns=self.P + 1).remote(
            [f], self.columns, self.id_col, self.text_col, self.ngram,
            self.num_hashes, self.seed, self.bands, self.P)
            for f in files_or_tables]
        parts = [list(r) for r in preps]
        cand_refs = [self.actors[p].probe.remote(
            self.epoch, *[parts[i][p] for i in range(len(preps))])
            for p in range(self.P)]
        stores = [parts[i][self.P] for i in range(len(preps))]
        acks = [_verify.remote(self.epoch, sh, self.S, self.threshold,
                               self.sink_dir, len(cand_refs),
                               *cand_refs, *stores, self.payload[sh])
                for sh in range(self.S)]
        if self.clean_sink:
            # writers run after the epoch's verify tasks (acks are
            # ordering-only args) and read matched ids back from the
            # committed pair files
            writers = [_write_clean.remote(
                self.epoch, self._file_seq + i, f, None, self.id_col,
                self.sink_dir, self.clean_dir, self.S, *acks)
                for i, f in enumerate(files_or_tables)]
            acks = acks + writers
        self._file_seq += len(files_or_tables)
        return (self.epoch, acks)

    def _drain_epoch(self, pending) -> dict:
        epoch, acks = pending
        if acks is None:
            m = {"epoch": epoch, "rows_in": 0, "skipped": True}
            self.metrics.append(m)
            return m
        stats = ray.get(acks)
        vstats = stats[:self.S]
        m = {"epoch": epoch,
             "rows_in": sum(s["probe_rows"] for s in vstats)
             // self.bands,
             "candidates": sum(s["candidates"] for s in vstats),
             "capped": sum(s["capped"] for s in vstats),
             "matches_out": sum(s["matches"] for s in vstats)}
        if self.clean_sink:
            wstats = stats[self.S:]
            m["rows_clean"] = sum(s["rows_clean"] for s in wstats)
            m["rows_dropped"] = sum(s["rows_dropped"] for s in wstats)
        self.metrics.append(m)
        self.sink.commit_epoch(epoch)
        if self.clean_sink:
            self.clean_sink.commit_epoch(epoch)
        return m

    def process_epoch(self, files_or_tables: Sequence) -> dict:
        return self._drain_epoch(self._submit_epoch(files_or_tables))

    def run(self, files: Sequence[str], files_per_epoch: int = 4,
            max_inflight: int = 2) -> None:
        from collections import deque

        pending: deque = deque()
        batch: list = []

        def flush(limit: int) -> None:
            while len(pending) > limit:
                self._drain_epoch(pending.popleft())

        for f in files:
            batch.append(f)
            if len(batch) >= files_per_epoch:
                pending.append(self._submit_epoch(batch))
                batch = []
                flush(max_inflight - 1)
        if batch:
            pending.append(self._submit_epoch(batch))
        flush(0)

    def clean_result(self) -> pa.Table:
        """Union of the committed CLEAN stream (decontam-filter mode)."""
        if not self.clean_sink:
            raise ValueError("job was built without clean_dir")
        files = self.clean_sink.committed_files()
        tabs = [pq.read_table(f) for f in files]
        tabs = [t for t in tabs if t.num_rows]
        if not tabs:
            return pa.table({})
        t = pa.concat_tables(tabs, promote_options="default")
        return t.take(pc.sort_indices(t, sort_keys=[
            (self.id_col, "ascending")]))

    def result(self) -> pa.Table:
        files = self.sink.committed_files()
        tabs = [pq.read_table(f) for f in files]
        tabs = [t for t in tabs if t.num_rows]
        if not tabs:
            return pa.table({"stream_id": pa.array([], pa.int64()),
                             "ref_id": pa.array([], pa.int64()),
                             "jaccard": pa.array([], pa.float64())})
        t = pa.concat_tables(tabs)
        return t.take(pc.sort_indices(t, sort_keys=[
            ("stream_id", "ascending"), ("ref_id", "ascending")]))

    def finish(self) -> dict:
        return {"epochs": self.epoch + 1,
                "rows_in": sum(m.get("rows_in", 0)
                               for m in self.metrics),
                "candidates": sum(m.get("candidates", 0)
                                  for m in self.metrics),
                "capped": sum(m.get("capped", 0) for m in self.metrics),
                "matches_out": sum(m.get("matches_out", 0)
                                   for m in self.metrics),
                "rows_clean": sum(m.get("rows_clean", 0)
                                  for m in self.metrics),
                "index_keys": self.index_keys}
