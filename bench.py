#!/usr/bin/env python
"""Benchmark harness (driver-run per round; see BASELINE.md).

Runs the headline pipelines over $GRAFT_SF_DIR (default
/root/testdata/sf0.1) under ray.init(num_cpus=$RAY_GRAFT_CPUS, default 32)
and prints ONE JSON line:

  {"metric": ..., "value": <total sec>, "unit": "sec",
   "queries": {name: sec, ...}, "sf": ..., "num_cpus": N,
   "streaming": {turns, sec, turns_per_sec, late_drops}}

`--scaling` evidences the N->4N cluster-size criterion in-sandbox: the
same headline job in fresh pinned subprocesses at num_cpus in
(2,4,8,16,32), reporting efficiency T(4N)/(4*T(N)) for the pairs
2->8, 4->16 and 8->32 (BASELINE.md measurement plan).
"""

from __future__ import annotations

import json
import os
import subprocess
import sys
import time


def _sf_dir() -> str:
    return os.environ.get("GRAFT_SF_DIR", "/root/testdata/sf0.1")


def _num_cpus() -> int:
    return int(os.environ.get("RAY_GRAFT_CPUS", "32"))


BENCH_QUERIES = [
    "agg_basic",            # TPC-H Q1 shape: wide scan + low-card groupby
    "agg_having_orderby",
    "join_then_aggregate",  # 3-way broadcast join + aggregate
    "join_multi",
    "window_tumbling",
    "window_hopping",
    "window_session",
    "latest_earliest_by_offset",
    "collect_list",
    "topk",
]


def run_queries(sf_dir: str) -> dict[str, float]:
    from ksql_ray.pipelines.driver_queries import REGISTRY

    # warm Ray Data's worker pool once (untimed) so per-query numbers
    # measure the engine, not process spawn + imports
    REGISTRY["filter_project"].run(sf_dir)
    out: dict[str, float] = {}
    for name in BENCH_QUERIES:
        best = None
        for _ in range(2):  # min-of-2 (noisy-neighbor host)
            t0 = time.perf_counter()
            REGISTRY[name].run(sf_dir)
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        out[name] = round(best, 3)
    return out


def headline_parts(stream_dir: str, first_file: str, meta_path: str):
    """Shared (build_cat, make_query, pre_transform) for the headline
    windowed-aggregate + stream-table join — one definition for the
    headline, skew-A/B and multi-source benches."""
    import pyarrow as pa
    import pyarrow.parquet as pq

    from ksql_ray import (
        Avg, Catalog, Count, F, LatestByOffset, MINUTES, Relation, Schema,
        Select, Sum, Tumbling,
    )
    from ksql_ray.catalog import Ref
    from ksql_ray.ops.text import add_quality_score, add_token_count

    def pre_transform(batch):
        # realistic transcript processing: token counting + quality
        # scoring per turn (vectorized), feeding the windowed aggregate
        batch = add_token_count(batch, "text", "token_count")
        return add_quality_score(batch, "text", "quality")

    # declared column contract -> the driver prunes the Parquet read to
    # (query-needed - produced) | consumed instead of reading every column
    pre_transform.input_columns = ["text"]
    pre_transform.output_columns = ["token_count", "quality"]

    def build_cat():
        cat = Catalog()
        sch = pq.read_schema(first_file)
        cat.create(Relation(
            "transcripts", Ref.STREAM,
            pa.schema([pa.field(f.name, f.type) for f in sch]),
            path=stream_dir, timestamp_col="ts",
            order_cols=["ts", "turn_idx"],
        ))
        msch = pq.read_schema(meta_path)
        cat.create(Relation(
            "conv_meta", Ref.TABLE,
            pa.schema([pa.field(f.name, f.type) for f in msch]),
            path=meta_path, primary_key="conv_id",
        ))
        # the aggregate schema sees the pre_transform columns
        tsch = cat.get("transcripts").schema
        cat.get("transcripts").schema = tsch.append(
            pa.field("token_count", pa.int64())
        ).append(pa.field("quality", pa.float64()))
        return cat

    def make_query():
        return (
            Select(F("conv_id"), F("user_tier"),
                   Count(F("turn_idx")).As("turns"),
                   Sum(F("token_count")).As("tokens"),
                   Avg(F("quality")).As("avg_quality"),
                   LatestByOffset(F("role")).As("last_role"))
            .From(Schema("transcripts"))
            .Join(Schema("conv_meta"),
                  F("transcripts.conv_id").Equal(F("conv_meta.conv_id")))
            .GroupBy(F("conv_id"), F("user_tier"))
            .Windowed(Tumbling(1, MINUTES))
            .EmitFinal()
        )

    return build_cat, make_query, pre_transform


def run_streaming_headline(sf_dir: str, num_cpus: int) -> dict:
    """The BASELINE.json metric: windowed-aggregate + stream-table join
    throughput (turns/sec) over a synthetic transcript Parquet stream."""
    import glob

    from ksql_ray.fixtures import materialize_fixture_dir
    from ksql_ray.streaming.driver import StreamingJob

    # transcript volume scales with the sf dir (sf0.1 -> 4M turns);
    # KSQL_BENCH_TURNS overrides (the scaling run needs a compute-bound
    # stream: per-epoch fixed costs floor small epochs)
    sf = sf_dir.rstrip("/").split("sf")[-1]
    n_turns = {"0.001": 5_000, "0.01": 200_000, "0.1": 4_000_000}.get(sf, 4_000_000)
    n_turns = int(os.environ.get("KSQL_BENCH_TURNS", n_turns))
    # many small micro-batch files so per-epoch prep parallelism covers the
    # CPU budget (files/epoch >= cpus)
    n_files = 256 if n_turns >= 2_000_000 else (64 if n_turns >= 500_000 else 16)
    fdir = f"/tmp/ksql_ray_transcripts_{n_turns}"
    paths = materialize_fixture_dir(fdir, n_turns=n_turns, seed=42, n_files=n_files)

    out_dir = f"/tmp/ksql_ray_bench_out_{os.getpid()}"
    files = sorted(glob.glob(paths["transcripts"] + "/*.parquet"))
    build_cat, make_query, pre_transform = headline_parts(
        paths["transcripts"], files[0], paths["conv_meta"])
    cat = build_cat()
    P = 16  # fixed partitioning across cluster sizes (the scaling job)
    route = os.environ.get("KSQL_STREAM_ROUTE", "p2p")
    # warm the worker pool (process spawn + imports) outside the timing
    warm = StreamingJob(make_query(), cat, out_dir + "_warm", num_partitions=P,
                        lateness_us=300_000_000, pre_transform=pre_transform,
                        route=route)
    warm.run(files[:2], files_per_epoch=2)
    warm.finish()

    fpe = max(2, len(files) // 4)  # 4 big epochs, prep fan-out >= cpus
    # min-of-2: the sandbox host has noisy neighbors (loadavg ~10 from
    # outside the container); a single sample can lose 30%+ to external
    # contention (measured) — report the best of two identical runs
    best_sec, late = None, 0
    for trial in range(2):
        job = StreamingJob(make_query(), cat, f"{out_dir}_t{trial}",
                           num_partitions=P, lateness_us=300_000_000,
                           pre_transform=pre_transform, route=route)
        t0 = time.perf_counter()
        job.run(files, files_per_epoch=fpe, max_inflight=2)
        job.finish()
        sec = time.perf_counter() - t0
        if best_sec is None or sec < best_sec:
            best_sec = sec
            late = sum(p["late_drops"] for p in job.metrics_log[-1]["partitions"]) if job.metrics_log else 0
    return {
        "turns": n_turns,
        "sec": round(best_sec, 3),
        "turns_per_sec": round(n_turns / best_sec, 1),
        "late_drops": late,
    }


def run_ops_bench(sf_dir: str, num_cpus: int) -> dict:
    """Training-data ops at volume: text analysis + MinHash-LSH dedup +
    SimHash over a 200k-document corpus (transcript turns as documents),
    brute-force ANN over the embeddings table."""
    import glob

    import numpy as np
    import pyarrow as pa
    import pyarrow.parquet as pq
    import ray.data

    from ksql_ray.fixtures import materialize_fixture_dir
    from ksql_ray.ops.ann import brute_force_topk
    from ksql_ray.ops.dedup import minhash_dedup_pairs, simhash_pairs
    from ksql_ray.ops.text import analyze_documents

    n_docs = 200_000
    paths = materialize_fixture_dir(
        f"/tmp/ksql_ray_transcripts_{n_docs}", n_turns=n_docs, seed=42, n_files=16
    )

    import pandas as pd
    import pyarrow.compute as pc

    def to_docs(batch: pa.Table) -> pa.Table:
        # globally-unique content-derived doc ids (a per-batch arange
        # repeats across files and breaks id-keyed dedup joins)
        key = pc.binary_join_element_wise(
            batch.column("conv_id"), pc.cast(batch.column("turn_idx"), pa.string()), ":"
        )
        # >> 2 keeps ids within 62 bits (similarity_join's side-bit
        # encoding needs |id| < 2^62); uniqueness loss at 200k random
        # keys in a 2^62 space is ~4e-9
        ids = (pd.util.hash_array(
            key.combine_chunks().to_numpy(zero_copy_only=False)
        ) >> np.uint64(2)).astype(np.int64)
        return pa.table({
            "doc_id": pa.array(ids),
            "text": batch.column("text"),
        })

    def docs_ds():
        return ray.data.read_parquet(paths["transcripts"]).map_batches(
            to_docs, batch_format="pyarrow", zero_copy_batch=True)

    def min2(thunk) -> float:
        # min-of-2: noisy-neighbor host; a single sample can lose 30%+
        # to external contention (see BASELINE.md measurement conditions)
        best = None
        for _ in range(2):
            t0 = time.perf_counter()
            thunk()
            dt = time.perf_counter() - t0
            best = dt if best is None or dt < best else best
        return round(best, 2)

    out: dict[str, float] = {}
    out["text_analysis_200k"] = min2(lambda: analyze_documents(docs_ds()).count())
    out["minhash_dedup_200k"] = min2(
        lambda: minhash_dedup_pairs(docs_ds(), threshold=0.8, verify="est").count())
    out["minhash_exact_dedup_200k"] = min2(
        lambda: minhash_dedup_pairs(docs_ds(), threshold=0.8, verify="exact").count())
    out["simhash_dedup_200k"] = min2(
        lambda: simhash_pairs(docs_ds(), max_hamming=2).count())

    # cross-table LSH similarity join: 200k left x ~29k right (every
    # 7th doc re-keyed) — shared store, parity-filtered candidates
    from ksql_ray.ops.dedup import similarity_join

    def _right_ds():
        def plant(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id")
            m7 = pc.subtract(ids, pc.multiply(pc.divide(ids, 7), 7))
            sel = batch.filter(pc.equal(m7, 0))
            i = sel.column_names.index("doc_id")
            return sel.set_column(i, "doc_id",
                                  pc.add(sel.column("doc_id"), 1))
        return docs_ds().map_batches(plant, batch_format="pyarrow",
                                     zero_copy_batch=True)

    out["similarity_join_200k"] = min2(lambda: similarity_join(
        docs_ds(), _right_ds(), threshold=0.8).count())

    from ksql_ray.ops.quality import quality_filter
    from ksql_ray.ops.sample import stratified_sample
    from ksql_ray.ops.scrub import scrub_documents
    from ksql_ray.ops.terms import top_terms

    out["quality_filter_200k"] = min2(lambda: quality_filter(docs_ds()).count())

    # Gopher n-gram repetition signals (top-2/3/4-gram char frac +
    # dup-5..10-gram coverage): 9 lexsort passes per batch, fully fused
    from ksql_ray.ops.quality import add_ngram_repetition

    out["ngram_repetition_200k"] = min2(lambda: docs_ds().map_batches(
        add_ngram_repetition, batch_format="pyarrow",
        zero_copy_batch=True).count())

    # Count-Min frequency sketch: per-batch dense counters, tiny
    # (d, bucket) groupby merge — counts travel, not keys
    from ksql_ray.ops.cms import cms_counters

    out["cms_200k"] = min2(lambda: cms_counters(
        docs_ds(), "text", depth=4, width=4096, hash="fast").count())
    out["pii_scrub_200k"] = min2(lambda: scrub_documents(docs_ds()).count())
    out["sample_10pct_200k"] = min2(
        lambda: stratified_sample(
            docs_ds(), "doc_id", fractions=0.1, method="fast").count())

    from ksql_ray.ops.sample import weighted_bottom_k

    def turns_w():
        return ray.data.read_parquet(
            paths["transcripts"], columns=["conv_id", "turn_idx"]
        ).map_batches(
            lambda b: b.append_column("w", pc.cast(pc.add(
                b.column("turn_idx"), 1), pa.float64())),
            batch_format="pyarrow", zero_copy_batch=True)

    out["weighted_bottomk_200k"] = min2(lambda: weighted_bottom_k(
        turns_w(), "conv_id", "w", k=10_000, method="fast").count())
    out["top_terms_200k"] = min2(lambda: top_terms(docs_ds(), k=50).count())

    # transitive cluster resolution over the near-dup pair graph (pairs
    # materialized once outside the timer: the bench isolates the
    # large-star/small-star + label-join cost, not the LSH)
    from ksql_ray.ops.components import dedup_by_components

    cc_pairs = minhash_dedup_pairs(
        docs_ds(), threshold=0.8, verify="est").materialize()
    cc_docs = docs_ds().drop_columns(["text"]).materialize()
    out["dup_clusters_200k"] = min2(
        lambda: dedup_by_components(cc_docs, cc_pairs).count())

    # benchmark decontamination: every 97th doc stands in for the
    # benchmark suite (~2k docs), 13-gram spans as in the GPT-3 method
    from ksql_ray.ops.decontam import contamination

    def _mod_split(want_bench):
        def f(batch: pa.Table) -> pa.Table:
            ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
            m = (ids % 97) == 0
            return batch.filter(pa.array(m if want_bench else ~m))
        return f

    out["contamination_200k"] = min2(lambda: contamination(
        docs_ds().map_batches(_mod_split(False), batch_format="pyarrow",
                              zero_copy_batch=True),
        docs_ds().map_batches(_mod_split(True), batch_format="pyarrow",
                              zero_copy_batch=True),
        n=13, concurrency=(1, 16)).count())

    # token-budget shard packing (two-phase distributed prefix sum)
    from ksql_ray.ops.pack import pack_shards

    out["pack_shards_200k"] = min2(
        lambda: pack_shards(docs_ds(), budget=100_000).count())

    # temporal joins over the same 200k-turn corpus: every turn gets its
    # conversation's latest prior user turn (as-of) / all turns inside
    # the 60 s window opened by each user turn (range)
    from ksql_ray.ops.asof import asof_join, range_join

    def turns_ds(cols):
        return ray.data.read_parquet(paths["transcripts"], columns=cols)

    def user_turns(cols):
        return ray.data.read_parquet(
            paths["transcripts"], columns=cols + ["role"]
        ).filter(expr="role == 'user'").drop_columns(["role"])

    out["asof_join_200k"] = min2(lambda: asof_join(
        turns_ds(["conv_id", "turn_idx", "ts"]),
        user_turns(["conv_id", "turn_idx", "ts"]),
        on="ts", by=["conv_id"], how="left", tiebreak="turn_idx",
        right_cols=["turn_idx", "ts"], num_partitions=32).count())

    def windows60(batch: pa.Table) -> pa.Table:
        return pa.table({
            "conv_id": batch.column("conv_id"),
            "w_start": batch.column("ts"),
            "w_end": pc.add(batch.column("ts"),
                            pa.scalar(60_000_000, pa.duration("us"))),
        })

    out["range_join_200k"] = min2(lambda: range_join(
        turns_ds(["conv_id", "turn_idx", "ts"]),
        user_turns(["conv_id", "ts"]).map_batches(
            windows60, batch_format="pyarrow", zero_copy_batch=True),
        on="ts", right_start="w_start", right_end="w_end", by=["conv_id"],
        bucket_width=60_000_000, how="inner",
        right_cols=["w_start"], num_partitions=32).count())

    # streaming dedup-on-ingest over the 16 micro-batch files (fast
    # 128-bit fingerprints — the scale path; md5 is the oracle form)
    import glob as _glob
    import shutil as _shutil
    import tempfile as _tempfile

    from ksql_ray.streaming.dedup import StreamingDedupJob

    tfiles = sorted(_glob.glob(paths["transcripts"] + "/*.parquet"))

    # streaming jobs replay MICRO-batches: 256 files (the continuous-
    # ingest shape BASELINE.md documents — ~780 docs/file). Epoch size
    # matters: at 16 files x 4/epoch the first epoch carries 50k docs
    # and the near-dup intra-epoch resolution on this worst-case-dup
    # corpus takes ~85 s; at 256 x 4 the same work pipelines across 64
    # small epochs (measured r4; the r3 record was accidentally taken
    # over a warm 256-file dir)
    spaths = materialize_fixture_dir(
        f"/tmp/ksql_ray_transcripts_{n_docs}_f256", n_turns=n_docs,
        seed=42, n_files=256)
    sfiles = sorted(_glob.glob(spaths["transcripts"] + "/*.parquet"))

    def _sdedup():
        outd = _tempfile.mkdtemp(prefix="ksql_bench_sdedup_")
        try:
            job = StreamingDedupJob(outd, method="fast", num_partitions=8,
                                    columns=["conv_id", "turn_idx", "text"])
            job.run(sfiles, files_per_epoch=16)
            job.finish()
        finally:
            _shutil.rmtree(outd, ignore_errors=True)

    out["streaming_dedup_200k"] = min2(_sdedup)

    # cluster-rescale cost: reshard a 200k-key dedup checkpoint 8 -> 32
    # partitions (checkpoint built once outside the timer)
    _rs_base = _tempfile.mkdtemp(prefix="ksql_bench_rescale_")
    _rs_job = StreamingDedupJob(
        f"{_rs_base}/out", method="fast", num_partitions=8,
        columns=["conv_id", "turn_idx", "text"],
        checkpoint_dir=f"{_rs_base}/ck8", checkpoint_every=4)
    _rs_job.run(sfiles, files_per_epoch=16)

    def _rescale():
        nd = _tempfile.mkdtemp(prefix="ksql_bench_rescale_new_")
        try:
            j = StreamingDedupJob(
                f"{nd}/out", method="fast", num_partitions=32,
                columns=["conv_id", "turn_idx", "text"],
                checkpoint_dir=f"{nd}/ck32", checkpoint_every=4)
            j.reshard_from(f"{_rs_base}/ck8")
        finally:
            _shutil.rmtree(nd, ignore_errors=True)

    out["rescale_dedup_200k"] = min2(_rescale)
    _shutil.rmtree(_rs_base, ignore_errors=True)

    # streaming per-key debounce-on-ingest (last-emission state actors)
    from ksql_ray.streaming.throttle import StreamingThrottleJob

    def _sthrottle():
        outd = _tempfile.mkdtemp(prefix="ksql_bench_sthr_")
        try:
            job = StreamingThrottleJob(
                outd, key_cols=["conv_id"], ts_col="ts",
                interval_us=60_000_000, method="fast", num_partitions=8,
                columns=["conv_id", "turn_idx", "ts"])
            job.run(sfiles, files_per_epoch=16)
            job.finish()
        finally:
            _shutil.rmtree(outd, ignore_errors=True)

    out["streaming_throttle_200k"] = min2(_sthrottle)

    # the WHOLE prep chain on ingest: normalize -> Gopher quality
    # filter -> first-occurrence dedup in one pass (pre_transform runs
    # inside the prep tasks, before fingerprinting)
    from ksql_ray.pipelines.prep import prep_batch

    def _sprep():
        outd = _tempfile.mkdtemp(prefix="ksql_bench_sprep_")
        try:
            job = StreamingDedupJob(outd, method="fast",
                                    num_partitions=8,
                                    columns=["conv_id", "turn_idx",
                                             "text"],
                                    pre_transform=_prep_docs)
            job.run(sfiles, files_per_epoch=16)
            job.finish()
        finally:
            _shutil.rmtree(outd, ignore_errors=True)

    def _prep_docs(batch: pa.Table) -> pa.Table:
        b = pa.table({"doc_id": batch.column("turn_idx"),
                      "text": batch.column("text")})
        return prep_batch(b)

    out["streaming_prep_200k"] = min2(_sprep)


    # streaming NEAR-dup-on-ingest (MinHash-LSH greedy first-occurrence)
    # over the same 256 micro-batch files, 4 files/epoch (64 pipelined
    # epochs — the natural continuous-ingest shape)
    from ksql_ray.streaming.neardup import StreamingNearDupJob

    def _sneardup():
        outd = _tempfile.mkdtemp(prefix="ksql_bench_sndup_")
        try:
            job = StreamingNearDupJob(outd, num_partitions=8,
                                      columns=["conv_id", "turn_idx", "text"])
            job.run(sfiles, files_per_epoch=4)
            job.finish()
        finally:
            _shutil.rmtree(outd, ignore_errors=True)

    out["streaming_neardup_200k"] = min2(_sneardup)

    # streaming CEP over the same 256 micro-batch files: the
    # user -> tool -> assistant turn funnel per conversation, partials
    # carried across 64 pipelined epochs
    from ksql_ray.expr import F as _F
    from ksql_ray.streaming.cep import StreamingCEPJob

    def _scep():
        outd = _tempfile.mkdtemp(prefix="ksql_bench_scep_")
        try:
            job = StreamingCEPJob(
                outd, partition_by=["conv_id"], order_by="ts",
                steps=[("u", _F("role").Equal("user")),
                       ("t", _F("role").Equal("tool")),
                       ("a", _F("role").Equal("assistant"))],
                within=3_600_000_000, tiebreak="turn_idx",
                lateness_us=3_600_000_000, num_partitions=8,
                input_files=sfiles)
            job.run(sfiles, files_per_epoch=4)
            job.finish()
        finally:
            _shutil.rmtree(outd, ignore_errors=True)

    out["streaming_cep_200k"] = min2(_scep)

    # funnel conversion table (one matcher run per prefix)
    from ksql_ray.expr import F as _F
    from ksql_ray.ops.cep import funnel_rates

    def _frates():
        funnel_rates(
            ray.data.read_parquet(
                paths["transcripts"],
                columns=["conv_id", "turn_idx", "ts", "role"]),
            partition_by=["conv_id"], order_by="ts",
            steps=[("u", _F("role").Equal("user")),
                   ("t", _F("role").Equal("tool")),
                   ("a", _F("role").Equal("assistant"))],
            tiebreak="turn_idx")

    out["funnel_rates_200k"] = min2(_frates)

    # quantified pattern (r5): user -> tool{1,3} -> assistant over
    # CONSECUTIVE turns (strict contiguity, possessive run binding)
    from ksql_ray.ops.cep import match_pattern as _match_pattern

    def _cepq():
        return _match_pattern(
            ray.data.read_parquet(
                paths["transcripts"],
                columns=["conv_id", "turn_idx", "ts", "role"]),
            partition_by=["conv_id"], order_by="ts",
            steps=[("u", _F("role").Equal("user")),
                   ("t", _F("role").Equal("tool"), (1, 3)),
                   ("a", _F("role").Equal("assistant"))],
            contiguity="strict", tiebreak="turn_idx",
            num_partitions=32).count()

    out["cep_repeat_200k"] = min2(_cepq)

    # streaming per-key row jobs: role-transition matrix and running
    # z-score anomalies on ingest (per-key carry state, 64 epochs)
    from ksql_ray.streaming.rows import (StreamingAnomalyJob,
                                         StreamingTransitionsJob)

    def _strans():
        job = StreamingTransitionsJob(
            key_cols=["conv_id"], ord_col="turn_idx", label_col="role",
            columns=["conv_id", "turn_idx", "role"], num_partitions=8)
        job.run(sfiles, files_per_epoch=4)
        job.transitions()
        job.finish()

    out["streaming_transitions_200k"] = min2(_strans)

    def _sanom():
        job = StreamingAnomalyJob(
            key_cols=["conv_id"], ord_col="turn_idx", val_col="turn_idx",
            columns=["conv_id", "turn_idx"], min_n=8, threshold=3.0,
            num_partitions=8)
        job.run(sfiles, files_per_epoch=4)
        job.finish()

    out["streaming_anomaly_200k"] = min2(_sanom)

    # streaming Count-Min sketch on ingest (epoch-fenced + merge)
    from ksql_ray.streaming.cms import StreamingCMSJob

    def _scms():
        job = StreamingCMSJob(key_col="text", depth=4, width=4096,
                              hash="fast", columns=["text"],
                              num_partitions=8)
        job.run(sfiles, files_per_epoch=4)
        job.finish()

    out["streaming_cms_200k"] = min2(_scms)

    # streaming similarity join vs a static reference (contamination
    # on ingest): ~29k-doc reference index built once, 200k docs probed
    import shutil as _shutil

    from ksql_ray.streaming.simjoin import StreamingSimJoinJob

    sj_in = "/tmp/ksql_ray_simjoin_in256"
    sj_ref = "/tmp/ksql_ray_simjoin_ref.parquet"
    if not os.path.isdir(sj_in):
        os.makedirs(sj_in, exist_ok=True)
        refs = []
        for i, f in enumerate(sfiles):
            t = pq.read_table(f, columns=["conv_id", "turn_idx",
                                          "text"])
            t = to_docs(t)
            pq.write_table(t, os.path.join(sj_in, f"s{i:03d}.parquet"))
            ids = t.column("doc_id")
            m7 = pc.subtract(ids, pc.multiply(pc.divide(ids, 7), 7))
            r = t.filter(pc.equal(m7, 0))
            refs.append(r.set_column(0, "doc_id",
                                     pc.add(r.column("doc_id"), 1)))
        pq.write_table(pa.concat_tables(refs), sj_ref)
    sj_files = sorted(_glob.glob(sj_in + "/*.parquet"))

    def _ssj():
        sink = "/tmp/ksql_ray_simjoin_sink"
        _shutil.rmtree(sink, ignore_errors=True)
        job = StreamingSimJoinJob(sink, sj_ref, threshold=0.8,
                                  num_partitions=8)
        job.run(sj_files, files_per_epoch=4)
        job.finish()

    out["streaming_simjoin_200k"] = min2(_ssj)

    esch = pq.read_schema(f"{sf_dir}/embeddings.parquet")
    emb = ray.data.read_parquet(
        f"{sf_dir}/embeddings.parquet",
        schema=pa.schema([pa.field(f.name, f.type) for f in esch]),
    )
    qtbl = pq.read_table(f"{sf_dir}/embeddings.parquet")
    sub = qtbl.slice(0, 16)
    qids = sub.column("vec_id").to_pylist()
    qm = np.array(sub.column("embedding").to_pylist(), dtype=np.float64)
    out["ann_topk_16q"] = min2(
        lambda: brute_force_topk(emb, qids, qm, k=10).count())

    # embedding ops at volume: 100k x 64d synthetic vectors with 1000
    # planted near-dup pairs (the sf embeddings table is tiny)
    from ksql_ray.ops.ann import ivf_topk
    from ksql_ray.ops.dedup import embedding_neardup_pairs

    vec_path = "/tmp/ksql_ray_vectors_100k.parquet"
    if not os.path.exists(vec_path):
        rng = np.random.default_rng(42)
        m = rng.standard_normal((100_000, 64)).astype(np.float32)
        m[1:2000:2] = m[0:2000:2] + 0.05 * rng.standard_normal((1000, 64)).astype(np.float32)
        pq.write_table(pa.table({
            "vec_id": pa.array(np.arange(100_000), type=pa.int64()),
            "embedding": pa.FixedSizeListArray.from_arrays(
                pa.array(m.reshape(-1)), 64
            ),
        }), vec_path + ".tmp")
        os.replace(vec_path + ".tmp", vec_path)  # no partial files on kill

    out["embedding_neardup_100k"] = min2(
        lambda: embedding_neardup_pairs(
            ray.data.read_parquet(vec_path), threshold=0.9, n_planes=10,
            n_tables=4, vec_dtype=np.float32,
        ).count())

    # contrastive hard-negative mining: 256 anchors vs the 100k corpus
    # (labels synthesized by id bucket; the training-minibatch shape)
    from ksql_ray.ops.ann import mine_hard_negatives

    def _with_labels():
        def lab(b: pa.Table) -> pa.Table:
            ids = b.column("vec_id")
            return b.append_column("label", pc.cast(
                pc.subtract(ids, pc.multiply(pc.divide(ids, 16), 16)),
                pa.int32()))
        return ray.data.read_parquet(vec_path).map_batches(
            lab, batch_format="pyarrow", zero_copy_batch=True)

    out["hard_negatives_100k_256a"] = min2(
        lambda: mine_hard_negatives(
            _with_labels(), k=8,
            anchor_ids=list(range(0, 25_600, 100))).count())

    qcol = pq.read_table(vec_path).slice(0, 16).column("embedding").combine_chunks()
    qm2 = qcol.flatten().to_numpy(zero_copy_only=False).reshape(16, 64).astype(np.float64)
    out["ivf_ann_100k_16q"] = min2(
        lambda: ivf_topk(
            ray.data.read_parquet(vec_path), list(range(16)), qm2, k=10,
            n_planes=8, n_tables=4, probe_radius=1,
        ).count())

    # distributed k-means over the same 100k x 64d vectors (broadcast
    # centroids + scatter-add partials; no shuffle)
    from ksql_ray.ops.cluster import kmeans

    out["kmeans_100k_k16"] = min2(
        lambda: kmeans(ray.data.read_parquet(vec_path), k=16, iters=3,
                       concurrency=(1, 16)).count())

    # SemDeDup over the same vectors (the 1000 planted pairs sit at
    # cosine ~0.95+): Lloyd loop + one cluster shuffle + per-cluster
    # pairwise cosine
    from ksql_ray.ops.cluster import semdedup

    out["semdedup_100k_k16"] = min2(
        lambda: semdedup(ray.data.read_parquet(vec_path), k=16, iters=3,
                         tau=0.9, concurrency=(1, 16)).count())

    # auto-k regime (k = n/1000 = 100 here): the per-cluster pairwise
    # term O(n^2/k) drops ~6x vs k=16 — the knob that keeps SemDeDup
    # viable as the corpus grows (see ops/cluster.semdedup docstring)
    out["semdedup_100k_autok"] = min2(
        lambda: semdedup(ray.data.read_parquet(vec_path), k=None,
                         iters=3, tau=0.9, concurrency=(1, 16)).count())

    # span-level exact dedup over the 200k transcript-derived docs
    # (templated text -> heavy chunk overlap; exercises the rebuild)
    from ksql_ray.ops.spans import chunk_dedup

    out["chunk_dedup_200k"] = min2(
        lambda: chunk_dedup(docs_ds(), width=8).count())

    # PQ train+encode+ADC-search over the 100k vectors (the 32x-
    # compressed scan path: codes are 8 bytes/vector here)
    from ksql_ray.ops.pq import pq_encode, pq_topk, pq_train

    def _pq():
        vds = ray.data.read_parquet(vec_path)
        cents = pq_train(vds, m=8, k=16, iters=2, concurrency=(1, 16))
        codes = pq_encode(vds, cents, pack=True,
                          concurrency=(1, 16)).materialize()
        pq_topk(codes, cents, list(range(16)), qm2, k=10).count()

    out["pq_train_encode_search_100k"] = min2(_pq)

    # IVF-PQ: coarse quantizer + residual codes, multi-probe ADC scan
    # touching ~nprobe/nlist of the corpus
    from ksql_ray.ops.pq import ivfpq_build, ivfpq_topk

    def _ivfpq():
        vds = ray.data.read_parquet(vec_path)
        codes, coarse, cents = ivfpq_build(vds, nlist=64, m=8, k=16,
                                           coarse_iters=2, pq_iters=1)
        codes = codes.materialize()
        ivfpq_topk(codes, coarse, cents, list(range(16)), qm2, k=10,
                   nprobe=8).count()

    out["ivfpq_100k_16q"] = min2(_ivfpq)

    # SQ8 scalar quantization: per-dim affine uint8 grid (4x over
    # float32), asymmetric search on reconstructed vectors
    from ksql_ray.ops.pq import sq8_encode, sq8_topk, sq8_train

    def _sq8():
        vds = ray.data.read_parquet(vec_path)
        lo, hi = sq8_train(vds)
        codes = sq8_encode(vds, lo, hi).materialize()
        sq8_topk(codes, list(range(16)), qm2, lo, hi, k=10).count()

    out["sq8_100k_16q"] = min2(_sq8)

    # semantic dedup on ingest: the 100k vectors streamed as 32
    # micro-batches (8 pipelined epochs), greedy first occurrence of
    # every cosine>=0.9 cluster survives
    from ksql_ray.streaming.neardup import StreamingEmbeddingDedupJob

    def _sembdedup():
        outd = _tempfile.mkdtemp(prefix="ksql_bench_sed_")
        try:
            t = pq.read_table(vec_path)
            job = StreamingEmbeddingDedupJob(
                outd, dim=64, threshold=0.9, n_planes=10, n_tables=4,
                num_partitions=8)
            job.run([t.slice(i * 3125, 3125) for i in range(32)],
                    files_per_epoch=4)
            job.finish()
        finally:
            _shutil.rmtree(outd, ignore_errors=True)

    out["streaming_embdedup_100k"] = min2(_sembdedup)

    # sliding-window substring dedup (every overlapping 16-token window
    # hashed; ~1 hash/token vs chunk_dedup's 1/chunk)
    from ksql_ray.ops.spans import window_dedup

    out["window_dedup_200k"] = min2(
        lambda: window_dedup(docs_ds(), width=16).count())

    # streaming as-of enrichment: every turn binds its conversation's
    # latest prior user turn, two interleaved streams, 64 epochs
    from ksql_ray.streaming.asof import StreamingAsofJob

    rdir = "/tmp/ksql_bench_sasof_right"
    if not os.path.exists(rdir):
        os.makedirs(rdir, exist_ok=True)
        for i, f in enumerate(tfiles):
            t = pq.read_table(f, columns=["conv_id", "ts", "turn_idx",
                                          "role"])
            u = t.filter(pc.equal(t.column("role"), "user"))
            pq.write_table(u.rename_columns(
                ["conv_id", "ts", "turn_idx", "ref_role"]),
                os.path.join(rdir, f"r{i:04d}.parquet"))
    rfiles = sorted(_glob.glob(rdir + "/*.parquet"))

    def _sasof():
        outd = _tempfile.mkdtemp(prefix="ksql_bench_sasof_")
        try:
            job = StreamingAsofJob(
                outd, on="ts", by=["conv_id"],
                right_cols={"ref_role": "ref_role"},
                left_columns=["conv_id", "turn_idx", "ts", "role"],
                right_columns=["conv_id", "ts", "turn_idx", "ref_role"],
                tiebreak="turn_idx", lateness_us=3_600_000_000,
                num_partitions=8)
            job.run(tfiles, rfiles, files_per_epoch=4)
            job.finish()
        finally:
            _shutil.rmtree(outd, ignore_errors=True)

    out["streaming_asof_200k"] = min2(_sasof)

    # lexical retrieval + corpus-fit scoring over the 200k-doc corpus
    from ksql_ray.ops.bm25 import bm25_topk
    from ksql_ray.ops.dsir import dsir_select

    out["bm25_topk_200k"] = min2(lambda: bm25_topk(
        docs_ds(), "vector join stream token", k=100).count())

    # batch retrieval: 64 queries in ONE corpus scan (vs 64 scans)
    from ksql_ray.ops.bm25 import bm25_topk_multi

    _vocab = ["vector", "join", "stream", "token", "batch", "trace",
              "plan", "key", "log", "prompt", "span", "shard", "agent",
              "code", "browse", "search"]
    _queries = {f"q{i:02d}": " ".join(
        _vocab[j % len(_vocab)] for j in (i, i + 3, i + 7))
        for i in range(64)}
    out["bm25_multi64_200k"] = min2(lambda: bm25_topk_multi(
        docs_ds(), _queries, k=20).count())

    def _dsir_mask(batch: pa.Table):
        ids = batch.column("doc_id").to_numpy(zero_copy_only=False)
        return ids % 10 == 0

    # fused one-pass target form (target = predicate over the corpus)
    out["dsir_select_200k"] = min2(lambda: dsir_select(
        docs_ds(), n=1000, buckets=8192, hash="fast",
        target_mask=_dsir_mask).count())

    # per-key row ops + export + canonicalization over the same corpus
    from ksql_ray.ops.rows import sessionize, top_n_per_key
    from ksql_ray.ops.shard import shuffle_shard
    from ksql_ray.ops.text import normalize_documents

    def turns3():
        return ray.data.read_parquet(
            paths["transcripts"], columns=["conv_id", "turn_idx", "ts"])

    out["top_per_key_200k"] = min2(lambda: top_n_per_key(
        turns3(), ["conv_id"], "ts", n=3, tiebreak="turn_idx").count())
    out["sessionize_200k"] = min2(lambda: sessionize(
        turns3(), ["conv_id"], "ts", gap_us=300_000_000,
        tiebreak="turn_idx").count())
    out["shuffle_shard_200k"] = min2(lambda: shuffle_shard(
        docs_ds(), "doc_id", n_shards=64, method="fast").count())
    out["normalize_text_200k"] = min2(lambda: normalize_documents(
        docs_ds(), form="none").count())

    # transcript assembly + context-window chunking + rolling stats
    from ksql_ray.ops.rows import moving_agg
    from ksql_ray.ops.transcripts import assemble_conversations, chunk_split

    def turns4():
        return ray.data.read_parquet(
            paths["transcripts"],
            columns=["conv_id", "turn_idx", "role", "text"])

    out["assemble_convs_200k"] = min2(lambda: assemble_conversations(
        turns4(), ["conv_id"], ["turn_idx"], text_col="text",
        role_col="role").count())
    out["chunk_split_200k"] = min2(lambda: chunk_split(
        docs_ds(), width=64, stride=48).count())
    out["moving_agg_200k"] = min2(lambda: moving_agg(
        turns3(), ["conv_id"], "ts", "turn_idx", window_rows=7,
        tiebreak="turn_idx").count())

    from ksql_ray.ops.terms import top_ngrams

    out["top_bigrams_200k"] = min2(lambda: top_ngrams(
        docs_ds(), n=2, k=25).count())

    # conversation triage metrics (pure combiner; full transcript cols)
    from ksql_ray.ops.transcripts import conversation_stats

    def turns6():
        return ray.data.read_parquet(paths["transcripts"])

    out["conv_stats_200k"] = min2(lambda: conversation_stats(
        turns6(), ["conv_id"]).count())

    # high-block-count exchange stress (r5): 2,000 tiny input blocks x
    # P=64 through the direct exchange — the worst-case metadata shape
    # (the grouped split keeps ~max(P,32) split tasks; the sort path
    # takes ~190 s on this shape, measured once in BASELINE.md)
    from ksql_ray.ops.dedup import _partition_by as _pb2000

    _x2000 = ray.data.from_items(
        [{"k": f"k{i % 97}", "v": i} for i in range(6000)],
        override_num_blocks=2000).materialize()

    def _sum_k(group):
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        df = group.to_pandas().groupby("k", as_index=False)["v"].sum()
        return pa.Table.from_pandas(df, preserve_index=False)

    out["exchange_2000blk_p64"] = min2(lambda: _pb2000(
        _x2000, ["k"], 64).map_groups(
        _sum_k, batch_format="pyarrow").count())

    # corpus vocabulary shape (one term exchange + one merge task)
    from ksql_ray.ops.terms import corpus_zipf_stats

    out["zipf_stats_200k"] = min2(lambda: corpus_zipf_stats(
        docs_ds(), k=100).count())

    # robust per-key outlier flags (exact per-key median + MAD)
    from ksql_ray.ops.profile import mad_outliers

    out["mad_outliers_200k"] = min2(lambda: mad_outliers(
        turns6(), "conv_id", "turn_idx", c=3.0).count())

    # data-contract validation (counter partials + one value exchange)
    from ksql_ray.ops.validate import validate_rules

    def turns_all():
        return ray.data.read_parquet(paths["transcripts"])

    out["validate_200k"] = min2(lambda: validate_rules(turns_all(), [
        ("not_null", "text"),
        ("in_set", "role", ["user", "assistant", "tool"]),
        ("regex", "conv_id", "conv-[0-9]+"),
        ("range", "turn_idx", 0, 100_000),
        ("unique", "text"),
        ("increasing_by", "ts", "conv_id", "turn_idx"),
    ]).count())

    # corpus session analytics (four counters per partition, one merge)
    from ksql_ray.ops.rows import session_stats

    out["session_stats_200k"] = min2(lambda: session_stats(
        turns3(), ["conv_id"], "ts", 300_000_000,
        tiebreak="turn_idx").count())

    # percentile-auto-calibrated filtering (sketch pass per metric)
    from ksql_ray.ops.quality import auto_quality_filter

    def _autoq():
        out, _ = auto_quality_filter(
            turns3(), keep={"turn_idx": 0.5}, require_exact=False)
        out.count()

    out["auto_quality_200k"] = min2(_autoq)

    # Flesch readability (three RE2 kernels + one reduceat)
    from ksql_ray.ops.quality import add_readability

    out["readability_200k"] = min2(lambda: docs_ds().map_batches(
        add_readability, batch_format="pyarrow",
        zero_copy_batch=True).count())

    # per-key debounce (chained emission; batched bisection per round)
    from ksql_ray.ops.rows import throttle

    out["throttle_200k"] = min2(lambda: throttle(
        turns3(), ["conv_id"], "ts", 60_000_000,
        tiebreak="turn_idx").count())

    # cross-source duplication matrix (templated fixture text means
    # real dup groups exist; role stands in for the source column)
    from ksql_ray.ops.dedup import source_overlap

    def turns_src():
        return ray.data.read_parquet(
            paths["transcripts"], columns=["role", "text"])

    out["source_overlap_200k"] = min2(lambda: source_overlap(
        turns_src(), source_col="role", fingerprint="fast").count())

    # rank family, next-turn pairing, transition matrix, cumulative agg
    from ksql_ray.ops.rows import (rank_per_key, transition_counts,
                                   with_lead)

    def turns5():
        return ray.data.read_parquet(
            paths["transcripts"], columns=["conv_id", "turn_idx", "ts",
                                           "role"])

    out["rank_per_key_200k"] = min2(lambda: rank_per_key(
        turns5(), ["conv_id"], "role", tiebreak="turn_idx").count())
    out["with_lead_200k"] = min2(lambda: with_lead(
        turns5(), ["conv_id"], "ts", ["role"],
        tiebreak="turn_idx").count())
    out["transitions_200k"] = min2(lambda: transition_counts(
        turns5(), ["conv_id"], "ts", "role",
        tiebreak="turn_idx").count())
    out["cumulative_agg_200k"] = min2(lambda: moving_agg(
        turns3(), ["conv_id"], "ts", "turn_idx", window_rows=None,
        tiebreak="turn_idx").count())

    from ksql_ray.ops.rows import first_last_per_key, rank_dist_per_key

    out["rank_dist_200k"] = min2(lambda: rank_dist_per_key(
        turns5(), ["conv_id"], "role", n_tiles=4,
        tiebreak="turn_idx").count())
    out["first_last_200k"] = min2(lambda: first_last_per_key(
        turns5(), ["conv_id"], "ts", ["role"], nth=3,
        tiebreak="turn_idx").count())

    from ksql_ray.ops.quality import add_char_entropy
    from ksql_ray.ops.rows import standardize_per_key, time_range_agg
    from ksql_ray.ops.terms import tfidf_top_terms

    out["standardize_200k"] = min2(lambda: standardize_per_key(
        turns3(), ["conv_id"], "turn_idx").count())
    out["time_range_agg_200k"] = min2(lambda: time_range_agg(
        turns3(), ["conv_id"], "ts", "turn_idx",
        range_us=3_600_000_000).count())

    from ksql_ray.ops.intervals import gap_fill, merge_intervals
    from ksql_ray.ops.rows import time_range_distinct

    out["time_range_distinct_200k"] = min2(lambda: time_range_distinct(
        turns5(), ["conv_id"], "ts", "role",
        range_us=3_600_000_000).count())

    def _turn_intervals():
        import pyarrow as pa

        def add_end(b):
            tsv = b.column("ts").cast(pa.int64()).to_numpy()
            end = pa.array(tsv + 60_000_000,
                           type=pa.int64()).cast(b.schema.field("ts").type)
            return b.append_column("ts_end", end)
        return turns3().map_batches(add_end, batch_format="pyarrow")

    out["interval_merge_200k"] = min2(lambda: merge_intervals(
        _turn_intervals(), ["conv_id"], "ts", "ts_end").count())
    out["gap_fill_200k"] = min2(lambda: gap_fill(
        turns3(), ["conv_id"], "ts", ["turn_idx"],
        step_us=60_000_000, tiebreak="turn_idx").count())
    from ksql_ray.ops.explode import split_tokens
    from ksql_ray.ops.fuzzy import fuzzy_pairs

    out["fuzzy_pairs_vocab"] = min2(lambda: fuzzy_pairs(
        split_tokens(docs_ds(), "text", keep=[], pos_col=None),
        "tok", min_len=2, max_len=16).count())
    out["tfidf_top5_200k"] = min2(lambda: tfidf_top_terms(
        docs_ds(), "doc_id", "text", k=5).count())
    out["char_entropy_200k"] = min2(lambda: docs_ds().map_batches(
        add_char_entropy, batch_format="pyarrow",
        zero_copy_batch=True).count())

    # set ops + broadcast semi-join + histogram over the turn stream
    from ksql_ray.ops.hist import numeric_histogram
    from ksql_ray.ops.sets import intersect_distinct, semi_join_filter

    from ksql_ray.ops.sets import union_distinct

    out["union_200k"] = min2(lambda: union_distinct(
        turns5().filter(expr="role == 'user'"),
        turns5().filter(expr="role == 'assistant'"),
        ["conv_id", "turn_idx"]).count())
    out["intersect_200k"] = min2(lambda: intersect_distinct(
        turns5().filter(expr="role == 'user'"),
        turns5().filter(expr="role == 'assistant'"),
        ["conv_id"]).count())
    out["semi_join_200k"] = min2(lambda: semi_join_filter(
        turns5(), turns5().filter(expr="role == 'tool'"),
        "conv_id", "conv_id").count())
    from ksql_ray.ops.bloom import bloom_semi_join

    out["bloom_semi_200k"] = min2(lambda: bloom_semi_join(
        turns5(), turns5().filter(expr="role == 'tool'"),
        "conv_id", "conv_id", expected_keys=50_000).count())
    from ksql_ray.ops.diff import snapshot_diff

    def _perturbed(b: pa.Table) -> pa.Table:
        ids = b.column("doc_id").to_numpy(zero_copy_only=False)
        t = pc.if_else(pa.array(ids % 3 == 0),
                       pc.utf8_upper(b.column("text")), b.column("text"))
        return b.set_column(b.column_names.index("text"), "text",
                            t).filter(pa.array(ids % 5 != 0))

    out["snapshot_diff_200k"] = min2(lambda: snapshot_diff(
        docs_ds(), docs_ds().map_batches(
            _perturbed, batch_format="pyarrow", zero_copy_batch=True),
        "doc_id", ["text"]).count())
    out["histogram_200k"] = min2(lambda: numeric_histogram(
        turns3(), "turn_idx", bins=32).count())

    # rollup + pivot + quantile bucketize over the turn stream
    from ksql_ray.ops.cube import pivot_agg, rollup_agg
    from ksql_ray.ops.quantiles import quantile_bucketize

    out["rollup_200k"] = min2(lambda: rollup_agg(
        turns5(), ["role", "conv_id"], "turn_idx").count())
    out["pivot_200k"] = min2(lambda: pivot_agg(
        turns5(), "conv_id", "role",
        ["user", "assistant", "tool"], "turn_idx").count())
    out["bucketize_200k"] = min2(lambda: quantile_bucketize(
        turns3(), "turn_idx", qs=[0.25, 0.5, 0.75]).count())
    from ksql_ray.ops.quantiles import grouped_quantiles

    out["grouped_quantiles_200k"] = min2(lambda: grouped_quantiles(
        turns5(), ["role"], "turn_idx", qs=[0.5, 0.9, 0.99]).count())
    from ksql_ray.ops.hll import grouped_hll

    out["grouped_hll_200k"] = min2(lambda: grouped_hll(
        turns5(), ["role"], "conv_id", p=10, hash="fast").count())
    from ksql_ray.ops.rows import top_values_per_key

    out["top_values_per_key_200k"] = min2(lambda: top_values_per_key(
        turns5(), ["role"], "conv_id", k=5).count())

    from ksql_ray.ops.graph import pagerank

    def edge_stream():
        # link graph derived from the turn stream: conversation ->
        # hashed reply bucket (multi-edges, skewed degree — the shape
        # of a crawl graph at 200k edges / ~50k nodes)
        def mk(b):
            import pyarrow.compute as _pc
            conv = b.column("conv_id")
            tix = b.column("turn_idx")
            bucket = _pc.add(
                _pc.multiply(_pc.cast(tix, pa.int64()), 2654435761),
                _pc.cast(_pc.utf8_length(conv), pa.int64()))
            bucket = _pc.cast(
                _pc.bit_wise_and(bucket, 0xFFFF), pa.string())
            return pa.table({
                "s": conv,
                "d": _pc.binary_join_element_wise("b", bucket, ""),
            })
        return turns5().map_batches(mk, batch_format="pyarrow",
                                    zero_copy_batch=True)

    out["pagerank_200k_edges"] = min2(lambda: pagerank(
        edge_stream(), "s", "d", damping=0.85, iters=5).count())

    from ksql_ray.ops.cube import cube_agg
    from ksql_ray.ops.explode import melt

    out["cube_200k"] = min2(lambda: cube_agg(
        turns5(), ["role", "conv_id"], "turn_idx").count())
    out["melt_200k"] = min2(lambda: melt(
        turns5(), ["conv_id", "role"], ["turn_idx"]).count())

    # unnest, regex extract, profiling, deterministic sampling family
    from ksql_ray.ops.explode import split_tokens
    from ksql_ray.ops.extract import regex_extract
    from ksql_ray.ops.profile import profile_columns
    from ksql_ray.ops.sample import (sample_per_key, split_assign,
                                     weighted_sample)

    out["unnest_tokens_200k"] = min2(lambda: split_tokens(
        turns4(), "text", ["conv_id", "turn_idx"]).count())
    out["regex_extract_200k"] = min2(lambda: regex_extract(
        turns4(), "text", r"^(?P<first>\S+)",
        keep=["conv_id", "turn_idx"]).count())
    out["profile_200k"] = min2(lambda: profile_columns(
        turns5(), ["conv_id", "role", "turn_idx"]).count())
    from ksql_ray.ops.profile import grouped_corr

    def _corr_src():
        def add(b):
            import pyarrow.compute as _pc
            return b.append_column(
                "tlen", _pc.cast(_pc.utf8_length(b.column("text")),
                                 pa.float64()))
        return turns4().map_batches(add, batch_format="pyarrow",
                                    zero_copy_batch=True)

    out["grouped_corr_200k"] = min2(lambda: grouped_corr(
        _corr_src(), ["role"], "turn_idx", "tlen").count())
    out["weighted_sample_200k"] = min2(lambda: weighted_sample(
        turns3(), "conv_id", "turn_idx", rate=0.05, scale=8.0,
        method="fast").count())
    out["split_assign_200k"] = min2(lambda: split_assign(
        turns5(), "conv_id", method="fast").count())
    out["sample_per_key_200k"] = min2(lambda: sample_per_key(
        turns5(), ["conv_id"], "turn_idx", n=4, method="fast").count())
    from ksql_ray.ops.c4 import c4_clean
    from ksql_ray.ops.sample import bottom_k_sample, mixture_sample

    out["c4_clean_200k"] = min2(
        lambda: c4_clean(turns4(), min_words=3, min_lines=1).count())

    # line-level cleanup + BPE vocabulary over the 200k-turn corpus
    from ksql_ray.ops.bpe import bpe_token_counts, learn_bpe
    from ksql_ray.ops.lines import dedup_lines, strip_frequent_lines

    out["dedup_lines_200k"] = min2(
        lambda: dedup_lines(turns4()).count())
    out["strip_boilerplate_200k"] = min2(
        lambda: strip_frequent_lines(turns4(), min_docs=50).count())
    _bpe_merges = []

    def _bpe_learn():
        _bpe_merges.clear()
        _bpe_merges.extend(learn_bpe(turns4(), num_merges=256,
                                     max_word_vocab=32_768))

    out["bpe_learn_200k"] = min2(_bpe_learn)
    out["bpe_encode_200k"] = min2(
        lambda: bpe_token_counts(turns4(), list(_bpe_merges)).count())

    # model-based filtering: multinomial NB trained on (text -> role),
    # then the whole corpus classified (one count pass + one score pass)
    from ksql_ray.ops.nbayes import classify_nb, train_nb

    def _nb():
        model = train_nb(turns4(), "text", "role", alpha=0.5)
        classify_nb(turns4(), model, id_col="turn_idx").count()

    out["nb_train_classify_200k"] = min2(_nb)

    from ksql_ray.ops.diversity import distinct_ngram_ratios

    out["distinct_ngrams_200k"] = min2(
        lambda: distinct_ngram_ratios(turns4(), ns=(1, 2)).num_rows)
    out["bottom_k_sample_200k"] = min2(lambda: bottom_k_sample(
        turns3(), "turn_idx", 10_000, method="fast").count())
    out["mixture_sample_200k"] = min2(lambda: mixture_sample(
        turns5(), "turn_idx", "role",
        {"user": 0.5, "assistant": 0.4, "tool": 0.1}, 50_000,
        method="fast").count())

    # PCA moments + projection over the 100k x 64d vector corpus
    from ksql_ray.ops.pca import pca_project, pca_train

    def vec_ds():
        return ray.data.read_parquet(vec_path)

    def _pca():
        model = pca_train(vec_ds(), k=16, dim=64)
        pca_project(vec_ds(), model).count()

    out["pca_train_project_100k"] = min2(_pca)

    # sketch suite: heavy hitters / cardinality / quantiles on ingest
    # over the same 16 micro-batch files (fast hashes — the scale path)
    from ksql_ray.ops.hll import hll_estimate
    from ksql_ray.streaming.cardinality import StreamingHLLJob
    from ksql_ray.streaming.quantiles import StreamingQuantilesJob
    from ksql_ray.streaming.topk import StreamingTopKJob

    def _stopk():
        job = StreamingTopKJob(key_cols=["role", "tool"],
                               columns=["role", "tool"],
                               capacity=4096, num_partitions=8)
        job.run(tfiles, files_per_epoch=4)
        job.finish()
        job.topk(20)

    out["streaming_topk_200k"] = min2(_stopk)

    def _shll():
        job = StreamingHLLJob(key_col="conv_id", p=12, hash="fast",
                              columns=["conv_id"], num_partitions=4)
        job.run(tfiles, files_per_epoch=4)
        job.finish()

    out["streaming_hll_200k"] = min2(_shll)

    def _squant():
        job = StreamingQuantilesJob(col="turn_idx", capacity=4096,
                                    columns=["turn_idx"],
                                    num_partitions=4)
        job.run(tfiles, files_per_epoch=4)
        job.quantiles([0.5, 0.9, 0.99])

    out["streaming_quantiles_200k"] = min2(_squant)

    # per-key EXACT quantiles on ingest (value-histogram state)
    from ksql_ray.streaming.quantiles import StreamingGroupedQuantilesJob

    def _sgq():
        job = StreamingGroupedQuantilesJob(
            key_cols=["role"], col="turn_idx",
            columns=["role", "turn_idx"], num_partitions=8)
        job.run(sfiles, files_per_epoch=4)
        job.quantiles([0.5, 0.9, 0.99])
        job.finish()

    out["streaming_grouped_quantiles_200k"] = min2(_sgq)

    # "no silent caps": star-capped jumbo buckets and dropped store-join
    # segments across all dedup runs above (recall impact is quantifiable
    # from these — a zero here means no cap fired at this scale)
    from ksql_ray.ops.stats import collect_op_stats

    out["cap_stats"] = collect_op_stats()
    return out


def run_multisource(sf_dir: str, num_cpus: int) -> dict:
    """64M-turn, 4-source event-time merge (the BASELINE.md scale step,
    reproducible): four 16M-turn fixtures (seeds 42-45) interleaved at
    file granularity — per-file event-time spans of hours with
    cross-source offsets of minutes, the shape that requires the
    epoch-barrier watermark. First run generates ~19 min of fixtures
    (~1.3 GB each, idempotent)."""
    import glob

    from ksql_ray.fixtures import materialize_fixture_dir
    from ksql_ray.streaming.driver import StreamingJob

    per_source = int(os.environ.get("KSQL_BENCH_TURNS", 16_000_000))
    dirs = []
    for seed in (42, 43, 44, 45):
        tag = (f"/tmp/ksql_ray_transcripts_{per_source}" if seed == 42 else
               f"/tmp/ksql_ray_transcripts_{per_source // 1_000_000}M_s{seed}")
        dirs.append(materialize_fixture_dir(
            tag, n_turns=per_source, seed=seed, n_files=256))
    per_dir = [sorted(glob.glob(d["transcripts"] + "/*.parquet")) for d in dirs]
    # interleave file k across sources: all four streams' event time
    # advances together (sequential concat replays each source's whole
    # timeline from the start — everything after source 1 would be late)
    files = [pd_[k] for k in range(len(per_dir[0])) for pd_ in per_dir]
    n_turns = 4 * per_source
    build_cat, make_query, pre_transform = headline_parts(
        dirs[0]["transcripts"], files[0], dirs[0]["conv_meta"])

    warm = StreamingJob(make_query(), build_cat(),
                        f"/tmp/ksql_ray_ms_warm_{os.getpid()}",
                        num_partitions=16, lateness_us=300_000_000,
                        pre_transform=pre_transform)
    warm.run(files[:4], files_per_epoch=4)
    warm.finish()

    best, late, rows_out = None, 0, 0
    for trial in range(2):
        job = StreamingJob(make_query(), build_cat(),
                           f"/tmp/ksql_ray_ms_t{trial}_{os.getpid()}",
                           num_partitions=16, lateness_us=300_000_000,
                           pre_transform=pre_transform)
        t0 = time.perf_counter()
        job.run(files, files_per_epoch=256, max_inflight=2)
        job.finish()
        dt = time.perf_counter() - t0
        if best is None or dt < best:
            best = dt
            late = sum(p["late_drops"]
                       for p in job.metrics_log[-1]["partitions"]) if job.metrics_log else 0
            rows_out = job.result().num_rows
    # source-min watermark A/B: the watermark waits for the slowest
    # source (source_of = the file's fixture directory), so the merge is
    # lossless without lateness tuning
    src_of = os.path.dirname
    job = StreamingJob(make_query(), build_cat(),
                       f"/tmp/ksql_ray_ms_sm_{os.getpid()}",
                       num_partitions=16, lateness_us=300_000_000,
                       pre_transform=pre_transform, source_of=src_of)
    t0 = time.perf_counter()
    job.run(files, files_per_epoch=256, max_inflight=2)
    job.finish()
    sm_dt = time.perf_counter() - t0
    sm_late = (sum(p["late_drops"]
                   for p in job.metrics_log[-1]["partitions"])
               if job.metrics_log else 0)
    sm_rows = job.result().num_rows
    return {
        "metric": "multi-source event-time merge (4 interleaved streams)",
        "sources": 4, "turns": n_turns, "num_cpus": num_cpus,
        "sec": round(best, 2), "turns_per_sec": round(n_turns / best),
        "srcmin_sec": round(sm_dt, 2),
        "srcmin_turns_per_sec": round(n_turns / sm_dt),
        "srcmin_late_drops": sm_late, "srcmin_rows_out": sm_rows,
        "late_drops": late, "late_frac": round(late / n_turns, 6),
        "rows_out": rows_out,
    }


def run_skew_ab(sf_dir: str, num_cpus: int) -> dict:
    """Hot-key skew A/B (north_rule "skew handled explicitly"): the
    fixture's Zipf(1.2) conversation sizes give the hottest conv_id
    ~15% of ALL turns. Runs the headline job with salting off vs on and
    reports throughput + per-partition rows_in balance. Single-node
    work conservation hides the unsalted hot actor (other actors use
    the idle cores); on a real N-node cluster the unsalted hot
    partition caps whole-job throughput near 1/hot_share effective
    partitions, while salted load is flat by construction."""
    import glob

    from ksql_ray.fixtures import materialize_fixture_dir
    from ksql_ray.streaming.driver import StreamingJob

    n_turns = int(os.environ.get("KSQL_BENCH_TURNS", 4_000_000))
    paths = materialize_fixture_dir(
        f"/tmp/ksql_ray_transcripts_{n_turns}", n_turns=n_turns, seed=42,
        n_files=256)
    files = sorted(glob.glob(paths["transcripts"] + "/*.parquet"))
    build_cat, make_query, pre_transform = headline_parts(
        paths["transcripts"], files[0], paths["conv_meta"])

    fpe = max(2, len(files) // 4)
    out = {"metric": "hot-key skew A/B (salt_by_window off vs on)",
           "turns": n_turns, "num_cpus": num_cpus, "partitions": 16}
    for salt in (False, True):
        best, rows = None, []
        for trial in range(2):
            job = StreamingJob(
                make_query(), build_cat(),
                f"/tmp/ksql_ray_skew_{salt}_{trial}_{os.getpid()}",
                num_partitions=16, lateness_us=300_000_000,
                pre_transform=pre_transform, salt_by_window=salt)
            t0 = time.perf_counter()
            job.run(files, files_per_epoch=fpe, max_inflight=2)
            job.finish()
            dt = time.perf_counter() - t0
            if best is None or dt < best:
                best = dt
                last = job.metrics_log[-1]["partitions"] if job.metrics_log else []
                rows = sorted(m.get("rows_in", 0) for m in last)
        key = "salted" if salt else "unsalted"
        out[key] = {
            "sec": round(best, 2),
            "turns_per_sec": round(n_turns / best),
            "partition_rows_min": rows[0] if rows else 0,
            "partition_rows_med": rows[len(rows) // 2] if rows else 0,
            "partition_rows_max": rows[-1] if rows else 0,
        }
    return out


def run_skew_hot(sf_dir: str, num_cpus: int) -> dict:
    """PLANTED hot-key proof (VERDICT r4 item #9): remap every
    conversation whose id ends in 0/1/2 (~30% of all turns in
    expectation) onto ONE conv_id, then run the headline A/B with
    salting off vs on. The salted skewed stream should land within
    ~1.3x of the uniform headline; record the row in BASELINE.md."""
    import glob

    import pyarrow as pa
    import pyarrow.compute as pc

    from ksql_ray.fixtures import materialize_fixture_dir
    from ksql_ray.streaming.driver import StreamingJob

    n_turns = int(os.environ.get("KSQL_BENCH_TURNS", 4_000_000))
    paths = materialize_fixture_dir(
        f"/tmp/ksql_ray_transcripts_{n_turns}", n_turns=n_turns, seed=42,
        n_files=256)
    files = sorted(glob.glob(paths["transcripts"] + "/*.parquet"))
    build_cat, make_query, base_pre = headline_parts(
        paths["transcripts"], files[0], paths["conv_meta"])

    def hot_pre(batch: pa.Table) -> pa.Table:
        batch = base_pre(batch)
        cid = batch.column("conv_id")
        if isinstance(cid, pa.ChunkedArray):
            cid = cid.combine_chunks()
        # fixed-width ids 'conv-XXXXXXXX': last digit 0/1/2 -> ~30%
        last = pc.utf8_slice_codeunits(cid, start=12, stop=13)
        hot = pc.is_in(last, value_set=pa.array(["0", "1", "2"]))
        newc = pc.if_else(hot, pa.scalar("conv-00000001"), cid)
        return batch.set_column(
            batch.column_names.index("conv_id"), "conv_id", newc)

    hot_pre.input_columns = ["text", "conv_id"]
    hot_pre.output_columns = ["token_count", "quality"]

    fpe = max(2, len(files) // 4)
    out = {"metric": "planted 30%-hot-conv A/B (salt off vs on)",
           "turns": n_turns, "num_cpus": num_cpus, "partitions": 16}
    for salt in (False, True):
        best, rows = None, []
        for trial in range(2):
            job = StreamingJob(
                make_query(), build_cat(),
                f"/tmp/ksql_ray_skewhot_{salt}_{trial}_{os.getpid()}",
                num_partitions=16, lateness_us=300_000_000,
                pre_transform=hot_pre, salt_by_window=salt)
            t0 = time.perf_counter()
            job.run(files, files_per_epoch=fpe, max_inflight=2)
            job.finish()
            dt = time.perf_counter() - t0
            if best is None or dt < best:
                best = dt
                last = (job.metrics_log[-1]["partitions"]
                        if job.metrics_log else [])
                rows = sorted(m.get("rows_in", 0) for m in last)
        key = "salted" if salt else "unsalted"
        out[key] = {
            "sec": round(best, 2),
            "turns_per_sec": round(n_turns / best),
            "partition_rows_min": rows[0] if rows else 0,
            "partition_rows_med": rows[len(rows) // 2] if rows else 0,
            "partition_rows_max": rows[-1] if rows else 0,
        }
    return out


def main() -> None:
    sf_dir = _sf_dir()
    num_cpus = _num_cpus()

    if "--scaling" in sys.argv:
        import shutil as _sh

        results = {}
        have_taskset = _sh.which("taskset") is not None
        sizes = (2, 4, 8, 16, 32)
        for cpus in sizes:
            env = dict(os.environ, RAY_GRAFT_CPUS=str(cpus), GRAFT_SF_DIR=sf_dir)
            cmd = [sys.executable, __file__, "--single-streaming"]
            if have_taskset:
                # pin the whole process tree so the small "cluster" cannot
                # borrow unaccounted physical cores (honest N-node analog)
                cmd = ["taskset", "-c", f"0-{cpus - 1}"] + cmd
            out = subprocess.run(
                cmd, env=env, capture_output=True, text=True, timeout=3600,
            )
            line = [l for l in out.stdout.strip().splitlines() if l.startswith("{")][-1]
            results[cpus] = json.loads(line)
        tput = {c: results[c]["streaming"]["turns_per_sec"] for c in sizes}
        effs = {f"efficiency_{n}_to_{4 * n}": round(tput[4 * n] / (4 * tput[n]), 3)
                for n in (2, 4, 8)}
        print(json.dumps({
            "metric": "scaling efficiency N->4N (pinned cores; "
                      "pairs 2->8, 4->16, 8->32)",
            "value": effs["efficiency_4_to_16"], "unit": "efficiency",
            **effs,
            "throughputs": tput,
            "note": "the larger the fraction of this single node the '4N "
                    "cluster' occupies, the more the shared-DRAM-bandwidth "
                    "artifact depresses the pair (8->32 shares one memory "
                    "bus both sides); separate 4N nodes have 4x the "
                    "aggregate bandwidth (see BASELINE.md)",
            "sf": sf_dir, "detail": results,
        }))
        return

    import ray

    import logging

    # --object-store-gb N: cap plasma (the memory-bounded scale proof —
    # a 64M-turn merge under a 16 GiB store shows no stage ever needs
    # aggregate-volume memory; Ray spills the excess; see BASELINE.md)
    oss = None
    if "--object-store-gb" in sys.argv:
        oss = int(float(
            sys.argv[sys.argv.index("--object-store-gb") + 1]) * 2 ** 30)
    ray.init(address="local", num_cpus=num_cpus, include_dashboard=False,
             logging_level="ERROR", object_store_memory=oss)
    ray.data.DataContext.get_current().enable_progress_bars = False
    logging.getLogger("ray.data").setLevel(logging.ERROR)

    if "--skew-hot" in sys.argv:
        print(json.dumps(run_skew_hot(sf_dir, num_cpus)))
        ray.shutdown()
        return

    if "--skew" in sys.argv:
        print(json.dumps(run_skew_ab(sf_dir, num_cpus)))
        ray.shutdown()
        return

    if "--multisource" in sys.argv:
        res = run_multisource(sf_dir, num_cpus)
        if oss is not None:
            # no grpc module in this env, so memory_summary() is
            # unavailable — measure the session's spill directory
            # directly (object_spilling_config default: filesystem
            # under <session>/ray_spilled_objects)
            import glob as _glob

            sess = ray._private.worker._global_node.get_session_dir_path()
            spilled = _glob.glob(os.path.join(
                sess, "ray_spilled_objects*", "*"))
            res["object_store_gb"] = round(oss / 2 ** 30, 1)
            res["spilled_files"] = len(spilled)
            res["spilled_gb"] = round(
                sum(os.path.getsize(p) for p in spilled) / 2 ** 30, 2)
        print(json.dumps(res))
        ray.shutdown()
        return

    check = "--check" in sys.argv
    bands = None
    if check:
        bpath = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                             "BENCH_BANDS.json")
        if not os.path.exists(bpath):
            print(json.dumps({"check": "no BENCH_BANDS.json — run the "
                              "full bench once and commit the bands"}))
            ray.shutdown()
            sys.exit(2)
        bands = json.load(open(bpath))
        if (os.path.basename(sf_dir.rstrip("/"))
                != os.path.basename(bands["sf"].rstrip("/"))
                or num_cpus != bands["num_cpus"]):
            print(json.dumps({
                "check": "config mismatch", "bands_sf": bands["sf"],
                "bands_cpus": bands["num_cpus"], "run_sf": sf_dir,
                "run_cpus": num_cpus,
                "note": "bands are only comparable at the recorded "
                        "sf/num_cpus"}))
            ray.shutdown()
            sys.exit(2)

    streaming = run_streaming_headline(sf_dir, num_cpus)
    if "--single-streaming" in sys.argv:
        print(json.dumps({
            "metric": "streaming turns/sec", "value": streaming["sec"],
            "unit": "sec", "streaming": streaming, "num_cpus": num_cpus,
        }))
        ray.shutdown()
        return

    queries = run_queries(sf_dir)
    ops = run_ops_bench(sf_dir, num_cpus)
    total = round(sum(queries.values()) + streaming["sec"], 3)
    print(json.dumps({
        "metric": "detail: per-op timings (see final summary line)",
        "value": total,
        "unit": "sec",
        "ops": ops,
        "sf": sf_dir,
        "num_cpus": num_cpus,
    }))
    # compact summary LAST: the driver keeps only the TAIL of bench
    # stdout, and the full ops dict (65+ entries) once pushed the
    # parseable headline out of the truncation window (BENCH_r03
    # recorded "parsed": null). Everything the driver needs to parse
    # lives on this short final line.
    print(json.dumps({
        "metric": "end-to-end windowed-aggregate + join throughput "
                  "(headline queries + transcript streaming)",
        "value": total,
        "unit": "sec",
        "queries": queries,
        "streaming": streaming,
        "ops_benched": len(ops),
        "suite_sec": total,
        "sf": sf_dir,
        "num_cpus": num_cpus,
    }))
    if check:
        # regression gate (VERDICT r4 item #5): any op/query >1.5x its
        # recorded band AND >1.0 s absolute over it (sub-second ops on
        # this shared host swing 1.5-2.4x on neighbor noise alone, and
        # late-session object-store state adds ~0.5-0.8 s to a handful
        # of rows — both measured same-code; standalone re-runs of the
        # flagged ops sit inside their bands), or headline throughput
        # <1/1.5 of its band, fails the run with the offending rows
        # printed
        breaches = []
        for sec, rec in (("queries", queries), ("ops", ops)):
            for k, v in rec.items():
                band = bands.get(sec, {}).get(k)
                if (isinstance(band, (int, float))
                        and isinstance(v, (int, float))
                        and v > band * 1.5 and v - band > 1.0):
                    breaches.append({"section": sec, "op": k,
                                     "sec_now": v, "band_sec": band,
                                     "ratio": round(v / band, 2)})
        tps_band = bands.get("streaming_turns_per_sec")
        tps = streaming.get("turns_per_sec")
        if tps_band and tps and tps < tps_band / 1.5:
            breaches.append({"section": "streaming",
                             "op": "turns_per_sec", "now": tps,
                             "band": tps_band,
                             "ratio": round(tps_band / tps, 2)})
        print(json.dumps({"check": "FAIL" if breaches else "OK",
                          "threshold": 1.5, "breaches": breaches}))
        ray.shutdown()
        sys.exit(1 if breaches else 0)
    ray.shutdown()


def write_bands(detail_line: dict, out_path: str = "BENCH_BANDS.json"):
    """Persist a full bench run's timings as the canonical regression
    bands for ``--check`` (call from a REPL after a quiet-host run)."""
    bands = {"sf": detail_line["sf"], "num_cpus": detail_line["num_cpus"],
             "queries": detail_line.get("queries", {}),
             "ops": {k: v for k, v in detail_line.get("ops", {}).items()
                     if isinstance(v, (int, float))},
             "streaming_turns_per_sec":
                 detail_line.get("streaming", {}).get("turns_per_sec")}
    with open(out_path, "w") as f:
        json.dump(bands, f, indent=1, sort_keys=True)
    return bands


if __name__ == "__main__":
    main()
