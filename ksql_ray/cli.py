"""CLI: ``python -m ksql_ray.cli <create|up|down|auto|stream> ...``.

The reference's cobra CLI (cmd/cli/main.go:5, internal/root.go:14-31,
up.go:17-37) drives migrations against a remote ksqlDB; ours drives the
local catalog + Parquet relations. Environment fallback mirrors
KSQL_DB_URL: ``KSQL_RAY_STATE_DIR`` selects the migration state dir.

``stream`` is the cluster job entrypoint (the north-rule's ``ray job
submit`` shape): it owns the Ray session (``RAY_ADDRESS`` or ``auto``
inside a cluster), runs the headline windowed-aggregate + stream-table
join over a directory of transcript Parquet micro-batches, and prints
one JSON summary line. On a real cluster::

    ray job submit --working-dir . -- python -m ksql_ray.cli stream \\
        --input s3://bucket/transcripts --meta s3://bucket/conv_meta.parquet \\
        --sink /mnt/out --partitions 256 --checkpoint-dir /mnt/ckpt \\
        --checkpoint-every 4 --resume
"""

from __future__ import annotations

import argparse
import os
import sys
import time


def main(argv: list[str] | None = None) -> int:
    p = argparse.ArgumentParser(prog="ksql-ray")
    p.add_argument(
        "--state-dir",
        default=os.environ.get("KSQL_RAY_STATE_DIR", "/tmp/ksql_ray_state"),
        help="migration state directory (KSQL_RAY_STATE_DIR)",
    )
    sub = p.add_subparsers(dest="cmd", required=True)

    c = sub.add_parser("create", help="create a timestamped migration file")
    c.add_argument("name")
    c.add_argument("--dir", default=".")

    u = sub.add_parser("up", help="apply one migration file")
    u.add_argument("file")

    d = sub.add_parser("down", help="revert one migration file")
    d.add_argument("file")

    a = sub.add_parser("auto", help="apply all pending migrations in a dir")
    a.add_argument("dir")

    s = sub.add_parser(
        "stream", help="run the headline streaming job (ray-job entrypoint)")
    s.add_argument("--input", required=True,
                   help="directory of transcript parquet micro-batch files")
    s.add_argument("--meta", default=None,
                   help="conv_meta parquet for the stream-table join "
                        "(omit to aggregate without the join)")
    s.add_argument("--sink", required=True, help="committed-output directory")
    s.add_argument("--partitions", type=int, default=16)
    s.add_argument("--files-per-epoch", type=int, default=8)
    s.add_argument("--window-min", type=int, default=1)
    s.add_argument("--lateness-s", type=int, default=300)
    s.add_argument("--checkpoint-dir", default=None)
    s.add_argument("--checkpoint-every", type=int, default=0,
                   help="checkpoint state stores every K epochs")
    s.add_argument("--resume", action="store_true",
                   help="resume from the newest checkpoint in --checkpoint-dir")
    s.add_argument("--reshard-from", default=None, metavar="OLD_CKPT",
                   help="re-shard OLD_CKPT's checkpoint (taken at any "
                        "partition count) into --checkpoint-dir at "
                        "--partitions, then resume from it: the N->4N "
                        "cluster-rescale path")
    s.add_argument("--max-inflight", type=int, default=2,
                   help="pipelined epochs in flight")
    s.add_argument("--salt", action="store_true",
                   help="salt hot keys by window id (spreads a hot "
                        "conversation's windows across state actors)")

    dd = sub.add_parser(
        "dedup", help="streaming exact dedup-on-ingest (ray-job entrypoint)")
    dd.add_argument("--input", required=True,
                    help="directory of parquet micro-batch files")
    dd.add_argument("--sink", required=True, help="committed-output directory")
    dd.add_argument("--text-col", default="text")
    dd.add_argument("--method", default="fast", choices=["fast", "md5"],
                    help="fingerprint: vectorized 128-bit (scale path) or "
                         "md5 (SQL-oracle form)")
    dd.add_argument("--columns", default=None,
                    help="comma-separated passthrough columns (default all)")
    dd.add_argument("--partitions", type=int, default=16)
    dd.add_argument("--files-per-epoch", type=int, default=8)
    dd.add_argument("--checkpoint-dir", default=None)
    dd.add_argument("--checkpoint-every", type=int, default=0)
    dd.add_argument("--resume", action="store_true")
    dd.add_argument("--reshard-from", default=None, metavar="OLD_CKPT",
                    help="re-shard OLD_CKPT into --checkpoint-dir at "
                         "--partitions, then resume (cluster rescale)")

    th = sub.add_parser(
        "throttle",
        help="streaming per-key debounce-on-ingest (ray-job entrypoint): "
             "keep at most one row per key per interval")
    th.add_argument("--input", required=True,
                    help="directory of parquet micro-batch files")
    th.add_argument("--sink", required=True,
                    help="committed-output directory")
    th.add_argument("--key-cols", required=True,
                    help="comma-separated key columns")
    th.add_argument("--ts-col", default="ts")
    th.add_argument("--interval-s", type=float, required=True,
                    help="minimum seconds between emissions per key")
    th.add_argument("--method", default="fast", choices=["fast", "md5"],
                    help="key fingerprint: vectorized 128-bit (scale "
                         "path) or md5 (SQL-oracle form)")
    th.add_argument("--columns", default=None,
                    help="comma-separated passthrough columns "
                         "(default all)")
    th.add_argument("--partitions", type=int, default=16)
    th.add_argument("--files-per-epoch", type=int, default=8)
    th.add_argument("--checkpoint-dir", default=None)
    th.add_argument("--checkpoint-every", type=int, default=0)
    th.add_argument("--resume", action="store_true")
    th.add_argument("--reshard-from", default=None, metavar="OLD_CKPT",
                    help="re-shard OLD_CKPT into --checkpoint-dir at "
                         "--partitions, then resume (cluster rescale)")

    nd = sub.add_parser(
        "neardup",
        help="streaming MinHash-LSH near-dup suppression (ray-job "
             "entrypoint): greedy first occurrence of every near-dup "
             "cluster survives")
    nd.add_argument("--input", required=True,
                    help="directory of parquet micro-batch files")
    nd.add_argument("--sink", required=True, help="committed-output directory")
    nd.add_argument("--text-col", default="text")
    nd.add_argument("--columns", default=None,
                    help="comma-separated passthrough columns (default all)")
    nd.add_argument("--ngram", type=int, default=3)
    nd.add_argument("--num-hashes", type=int, default=64)
    nd.add_argument("--bands", type=int, default=16)
    nd.add_argument("--tau", type=float, default=0.7,
                    help="minhash-lane agreement threshold (~Jaccard)")
    nd.add_argument("--star-cap", type=int, default=128)
    nd.add_argument("--partitions", type=int, default=16)
    nd.add_argument("--files-per-epoch", type=int, default=8)
    nd.add_argument("--checkpoint-dir", default=None)
    nd.add_argument("--checkpoint-every", type=int, default=0)
    nd.add_argument("--resume", action="store_true")
    nd.add_argument("--reshard-from", default=None, metavar="OLD_CKPT",
                    help="re-shard OLD_CKPT into --checkpoint-dir at "
                         "--partitions, then resume (cluster rescale)")

    ed = sub.add_parser(
        "embdedup",
        help="streaming embedding (semantic) dedup-on-ingest (ray-job "
             "entrypoint): greedy first occurrence of every "
             "cosine-similar cluster survives")
    ed.add_argument("--input", required=True,
                    help="directory of parquet micro-batch files")
    ed.add_argument("--sink", required=True, help="committed-output directory")
    ed.add_argument("--vec-col", default="embedding")
    ed.add_argument("--dim", type=int, required=True,
                    help="embedding width")
    ed.add_argument("--columns", default=None,
                    help="comma-separated passthrough columns (default all)")
    ed.add_argument("--threshold", type=float, default=0.9,
                    help="cosine similarity threshold")
    ed.add_argument("--planes", type=int, default=8)
    ed.add_argument("--tables", type=int, default=8)
    ed.add_argument("--star-cap", type=int, default=128)
    ed.add_argument("--partitions", type=int, default=16)
    ed.add_argument("--files-per-epoch", type=int, default=8)
    ed.add_argument("--checkpoint-dir", default=None)
    ed.add_argument("--checkpoint-every", type=int, default=0)
    ed.add_argument("--resume", action="store_true")
    ed.add_argument("--reshard-from", default=None, metavar="OLD_CKPT",
                    help="re-shard OLD_CKPT into --checkpoint-dir at "
                         "--partitions, then resume (cluster rescale)")

    sj = sub.add_parser(
        "simjoin",
        help="streaming similarity join against a STATIC reference "
             "corpus (ray-job entrypoint): emits (stream_id, ref_id, "
             "jaccard) for every cross match >= threshold")
    sj.add_argument("--input", required=True,
                    help="directory of parquet micro-batch files")
    sj.add_argument("--reference", required=True,
                    help="reference parquet file or directory")
    sj.add_argument("--sink", required=True,
                    help="committed-output directory")
    sj.add_argument("--id-col", default="doc_id")
    sj.add_argument("--text-col", default="text")
    sj.add_argument("--threshold", type=float, default=0.7,
                    help="exact n-gram Jaccard threshold")
    sj.add_argument("--ngram", type=int, default=3)
    sj.add_argument("--num-hashes", type=int, default=64)
    sj.add_argument("--bands", type=int, default=16)
    sj.add_argument("--ref-cap", type=int, default=64)
    sj.add_argument("--clean-sink", default=None,
                    help="decontamination-FILTER mode: also write the "
                         "stream MINUS matched rows to this sink")
    sj.add_argument("--partitions", type=int, default=8)
    sj.add_argument("--files-per-epoch", type=int, default=8)
    sj.add_argument("--resume", action="store_true")

    ce = sub.add_parser(
        "cep",
        help="streaming CEP sequence-pattern matching (ray-job "
             "entrypoint): emit a row per completed pattern, partial "
             "matches carried across epochs")
    ce.add_argument("--input", required=True,
                    help="directory of parquet micro-batch files")
    ce.add_argument("--sink", required=True, help="committed-output directory")
    ce.add_argument("--steps", required=True,
                    help="comma-separated name:column=value equality steps, "
                         "e.g. 'v:event_type=view,c:event_type=click'")
    ce.add_argument("--partition-by", required=True,
                    help="comma-separated pattern key columns")
    ce.add_argument("--order-by", default="ts")
    ce.add_argument("--tiebreak", default=None)
    ce.add_argument("--measures", default=None,
                    help="comma-separated per-step output columns")
    ce.add_argument("--contiguity", default="skip",
                    choices=["skip", "strict"])
    ce.add_argument("--absent", default=None,
                    help="comma-separated stepA:stepB:column=value "
                         "negations (no matching row strictly between "
                         "the bound rows of A and B)")
    ce.add_argument("--within-us", type=int, default=None,
                    help="pattern horizon (event-time µs); also bounds "
                         "open-partial state")
    ce.add_argument("--lateness-s", type=int, default=300)
    ce.add_argument("--partitions", type=int, default=16)
    ce.add_argument("--files-per-epoch", type=int, default=8)
    ce.add_argument("--checkpoint-dir", default=None)
    ce.add_argument("--checkpoint-every", type=int, default=0)
    ce.add_argument("--resume", action="store_true")
    ce.add_argument("--reshard-from", default=None, metavar="OLD_CKPT",
                    help="re-shard OLD_CKPT into --checkpoint-dir at "
                         "--partitions, then resume (cluster rescale)")

    tk = sub.add_parser(
        "topk",
        help="streaming heavy hitters (ray-job entrypoint): continuous "
             "top-k keys with bounded Misra-Gries state per partition")
    tk.add_argument("--input", required=True,
                    help="directory of parquet micro-batch files")
    tk.add_argument("--key-cols", required=True,
                    help="comma-separated key columns (composite key)")
    tk.add_argument("--k", type=int, default=20)
    tk.add_argument("--capacity", type=int, default=4096,
                    help="tracked keys per partition (MG summary size); "
                         "counts are exact while distinct keys per "
                         "partition stay under it")
    tk.add_argument("--out", default=None,
                    help="write the final top-k snapshot parquet here")
    tk.add_argument("--partitions", type=int, default=16)
    tk.add_argument("--files-per-epoch", type=int, default=8)
    tk.add_argument("--checkpoint-dir", default=None)
    tk.add_argument("--checkpoint-every", type=int, default=0)
    tk.add_argument("--resume", action="store_true")
    tk.add_argument("--reshard-from", default=None, metavar="OLD_CKPT",
                    help="re-shard OLD_CKPT into --checkpoint-dir at "
                         "--partitions, then resume (cluster rescale)")

    hl = sub.add_parser(
        "hll",
        help="streaming distinct-count (ray-job entrypoint): HyperLogLog "
             "registers merged across partitions, constant state")
    hl.add_argument("--input", required=True,
                    help="directory of parquet micro-batch files")
    hl.add_argument("--key-col", required=True)
    hl.add_argument("--p", type=int, default=12,
                    help="2^p registers (~1.04/sqrt(2^p) rel. error)")
    hl.add_argument("--val-col", default=None,
                    help="per-KEY mode: count distinct values of this "
                         "column per --key-col (StreamingGroupedHLLJob)")
    hl.add_argument("--partitions", type=int, default=4)
    hl.add_argument("--files-per-epoch", type=int, default=8)
    hl.add_argument("--checkpoint-dir", default=None)
    hl.add_argument("--checkpoint-every", type=int, default=0)
    hl.add_argument("--resume", action="store_true")
    hl.add_argument("--reshard-from", default=None, metavar="OLD_CKPT",
                    help="re-shard OLD_CKPT into --checkpoint-dir at "
                         "--partitions, then resume (cluster rescale)")

    sp = sub.add_parser(
        "sample",
        help="streaming uniform distinct-key sample (ray-job "
             "entrypoint): deterministic bottom-k by key hash, O(k) "
             "state per partition")
    sp.add_argument("--input", required=True,
                    help="directory of parquet micro-batch files")
    sp.add_argument("--key-col", required=True)
    sp.add_argument("--k", type=int, default=1000)
    sp.add_argument("--method", choices=["md5", "fast"], default="fast",
                    help="key-hash function (md5 = SQL-checkable, "
                         "fast = vectorized)")
    sp.add_argument("--seed", default="", help="hash salt")
    sp.add_argument("--out", default=None,
                    help="write the sampled keys parquet here")
    sp.add_argument("--partitions", type=int, default=4)
    sp.add_argument("--files-per-epoch", type=int, default=8)
    sp.add_argument("--checkpoint-dir", default=None)
    sp.add_argument("--checkpoint-every", type=int, default=0)
    sp.add_argument("--resume", action="store_true")
    sp.add_argument("--reshard-from", default=None, metavar="OLD_CKPT",
                    help="re-shard OLD_CKPT into --checkpoint-dir at "
                         "--partitions, then resume (cluster rescale)")

    qu = sub.add_parser(
        "quantiles",
        help="streaming quantiles (ray-job entrypoint): deterministic "
             "mergeable sketches with a counted rank-error bound")
    qu.add_argument("--input", required=True,
                    help="directory of parquet micro-batch files")
    qu.add_argument("--col", required=True, help="numeric column")
    qu.add_argument("--key-cols", default=None,
                    help="comma-separated key columns: per-key EXACT "
                         "quantiles via histogram state (grouped job)")
    qu.add_argument("--q", default="0.5,0.9,0.99",
                    help="comma-separated quantiles")
    qu.add_argument("--capacity", type=int, default=4096,
                    help="values per sketch level; exact while the "
                         "stream volume stays under it")
    qu.add_argument("--partitions", type=int, default=4)
    qu.add_argument("--files-per-epoch", type=int, default=8)
    qu.add_argument("--checkpoint-dir", default=None)
    qu.add_argument("--checkpoint-every", type=int, default=0)
    qu.add_argument("--resume", action="store_true")
    qu.add_argument("--reshard-from", default=None, metavar="OLD_CKPT",
                    help="re-shard OLD_CKPT into --checkpoint-dir at "
                         "--partitions, then resume (cluster rescale)")

    aj = sub.add_parser(
        "asof",
        help="streaming as-of enrichment join (ray-job entrypoint): "
             "each left row binds its key's latest right row at or "
             "before its event time")
    aj.add_argument("--left", required=True,
                    help="directory of left-stream parquet files")
    aj.add_argument("--right", required=True,
                    help="directory of right-stream parquet files")
    aj.add_argument("--sink", required=True)
    aj.add_argument("--on", default="ts")
    aj.add_argument("--by", required=True,
                    help="comma-separated join key columns")
    aj.add_argument("--right-cols", required=True,
                    help="comma-separated right payload columns "
                         "(src or src:dst)")
    aj.add_argument("--left-cols", required=True,
                    help="comma-separated left output columns")
    aj.add_argument("--tiebreak", default=None,
                    help="right-side tie column (greatest wins)")
    aj.add_argument("--lateness-s", type=int, default=300)
    aj.add_argument("--partitions", type=int, default=8)
    aj.add_argument("--files-per-epoch", type=int, default=4)
    aj.add_argument("--checkpoint-dir", default=None)
    aj.add_argument("--checkpoint-every", type=int, default=0)
    aj.add_argument("--resume", action="store_true")
    aj.add_argument("--reshard-from", default=None, metavar="OLD_CKPT",
                    help="re-shard OLD_CKPT into --checkpoint-dir at "
                         "--partitions, then resume (cluster rescale)")

    cp = sub.add_parser(
        "compact",
        help="fold a sink's committed per-epoch files into segments "
             "(offline maintenance; idempotent, crash-safe)")
    cp.add_argument("--sink", required=True)
    cp.add_argument("--target-mb", type=int, default=128)

    pr = sub.add_parser(
        "prep",
        help="composed training-data prep (ray-job entrypoint): "
             "normalize -> quality filter -> exact dedup -> shuffled "
             "shard export")
    pr.add_argument("--input", required=True,
                    help="directory of document parquet files")
    pr.add_argument("--out", required=True,
                    help="shard output directory (one parquet/shard)")
    pr.add_argument("--id-col", default="doc_id")
    pr.add_argument("--text-col", default="text")
    pr.add_argument("--shards", type=int, default=64)
    pr.add_argument("--form", default="none", choices=["none", "nfc"])
    pr.add_argument("--fingerprint", default="fast",
                    choices=["fast", "md5"])

    pf = sub.add_parser(
        "profile",
        help="column profiling preflight (ray-job entrypoint): per-"
             "column rows/nulls/exact distinct/min-max over a parquet "
             "dir, one JSON line out")
    pf.add_argument("--input", required=True,
                    help="parquet file or directory")
    pf.add_argument("--cols", required=True,
                    help="comma-separated column names")

    vl = sub.add_parser(
        "validate",
        help="data-contract validation (ray-job entrypoint): violation "
             "counts per rule over a parquet dir, one JSON line out")
    vl.add_argument("--input", required=True,
                    help="parquet file or directory")
    vl.add_argument("--rules", required=True,
                    help="JSON list of rule arrays, e.g. "
                         '\'[["not_null","text"],["unique","id"],'
                         '["range","v",0,100],["in_set","k",["a"]],'
                         '["regex","k","[a-z]+"],'
                         '["increasing_by","ts","k","id"]]\'')
    vl.add_argument("--fail-on-violations", action="store_true",
                    help="exit 1 if any rule has violations > 0")

    pg = sub.add_parser(
        "pagerank",
        help="link-graph centrality (ray-job entrypoint): multi-edge "
             "PageRank over an edge parquet dir, ranks written as "
             "parquet")
    pg.add_argument("--input", required=True,
                    help="edge parquet file or directory")
    pg.add_argument("--src", required=True)
    pg.add_argument("--dst", required=True)
    pg.add_argument("--damping", type=float, default=0.85)
    pg.add_argument("--iters", type=int, default=3)
    pg.add_argument("--out", required=True,
                    help="output directory for (node, rank) parquet")

    args = p.parse_args(argv)

    if args.cmd == "pagerank":
        return _run_pagerank(args)
    if args.cmd == "validate":
        return _run_validate(args)
    if args.cmd == "profile":
        return _run_profile(args)
    if args.cmd == "prep":
        return _run_prep(args)
    if args.cmd == "compact":
        import json as _json

        from .streaming.sink import TwoPhaseSink

        m = TwoPhaseSink(args.sink).compact(
            target_bytes=args.target_mb << 20)
        print(_json.dumps({**m, "sink": args.sink}))
        return 0
    if args.cmd == "asof":
        return _run_asof(args)
    if args.cmd == "topk":
        return _run_topk(args)
    if args.cmd == "hll":
        return _run_hll(args)
    if args.cmd == "quantiles":
        return _run_quantiles(args)
    if args.cmd == "sample":
        return _run_sample(args)
    if args.cmd == "stream":
        return _run_stream(args)
    if args.cmd == "dedup":
        return _run_dedup(args)
    if args.cmd == "throttle":
        return _run_throttle(args)
    if args.cmd == "neardup":
        return _run_neardup(args)
    if args.cmd == "cep":
        return _run_cep(args)
    if args.cmd == "embdedup":
        return _run_embdedup(args)
    if args.cmd == "simjoin":
        return _run_simjoin(args)

    if args.cmd == "create":
        os.makedirs(args.dir, exist_ok=True)
        fname = os.path.join(args.dir, f"{int(time.time())}_{args.name}.sql")
        with open(fname, "w") as f:
            f.write("-- +seeker Up\n\n-- +seeker Down\n")
        print(fname)
        return 0

    from .catalog import Catalog
    from .errors import KsqlRayError
    from .migrations import Migrator

    cat = Catalog()
    mig = Migrator(cat, args.state_dir)
    try:
        if args.cmd == "up":
            mig.up(args.file)
            print(f"applied {args.file}; version={mig.latest_version()}")
        elif args.cmd == "down":
            mig.down(args.file)
            print(f"reverted {args.file}; version={mig.latest_version()}")
        elif args.cmd == "auto":
            applied = mig.auto_migrate(args.dir)
            print(f"applied versions: {applied}")
    except KsqlRayError as ex:
        print(f"error: {ex}", file=sys.stderr)
        return 1
    return 0


def _run_asof(args) -> int:
    """Streaming as-of join job (owns the Ray session, one JSON summary
    line — the same ``ray job submit`` shape as ``dedup``)."""
    import glob
    import json
    import time as _time

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 include_dashboard=False, ignore_reinit_error=True)
    from .streaming.asof import StreamingAsofJob

    lf = sorted(glob.glob(os.path.join(args.left, "*.parquet")))
    rf = sorted(glob.glob(os.path.join(args.right, "*.parquet")))
    if not lf or not rf:
        print("error: empty --left or --right input dir", file=sys.stderr)
        return 1
    right_cols = {}
    for spec in args.right_cols.split(","):
        src, _, dst = spec.partition(":")
        right_cols[src] = dst or src
    t0 = _time.perf_counter()
    job = StreamingAsofJob(
        args.sink, on=args.on, by=args.by.split(","),
        right_cols=right_cols, left_columns=args.left_cols.split(","),
        right_columns=list(right_cols), tiebreak=args.tiebreak,
        lateness_us=args.lateness_s * 1_000_000,
        num_partitions=args.partitions,
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every, resume=args.resume)
    if getattr(args, "reshard_from", None):
        print(json.dumps({"resharded": job.reshard_from(
            args.reshard_from)}), flush=True)
    job.run(lf, rf, files_per_epoch=args.files_per_epoch)
    m = job.finish()
    print(json.dumps({
        "left_files": len(lf), "right_files": len(rf),
        "epochs": m["epochs"],
        "sec": round(_time.perf_counter() - t0, 3),
        "rows_in": m["rows_in"], "rows_out": m["rows_out"],
        "late_left": m["late_left"], "late_right": m["late_right"],
        "sink": args.sink,
    }))
    if owns_session:
        ray.shutdown()
    return 0


def _run_pagerank(args) -> int:
    import json
    import time as _time

    import ray
    import ray.data

    from .ops.graph import pagerank

    if not ray.is_initialized():
        ray.init(include_dashboard=False)
    t0 = _time.time()
    ds = ray.data.read_parquet(args.input)
    out = pagerank(ds, args.src, args.dst, damping=args.damping,
                   iters=args.iters)
    out.write_parquet(args.out)
    n = ray.data.read_parquet(args.out).count()
    print(json.dumps({"sec": round(_time.time() - t0, 3), "nodes": n,
                      "iters": args.iters, "damping": args.damping,
                      "out": args.out}))
    return 0


def _run_profile(args) -> int:
    import json
    import time as _time

    import ray
    import ray.data

    from .ops.profile import profile_columns

    if not ray.is_initialized():
        ray.init(include_dashboard=False)
    cols = [c.strip() for c in args.cols.split(",") if c.strip()]
    t0 = _time.time()
    ds = ray.data.read_parquet(args.input)
    rows = sorted(profile_columns(ds, cols).take_all(),
                  key=lambda r: cols.index(r["col"]))
    print(json.dumps({"sec": round(_time.time() - t0, 3),
                      "columns": rows, "input": args.input}))
    return 0


def _run_validate(args) -> int:
    import json
    import time as _time

    import ray
    import ray.data

    from .ops.validate import validate_rules

    if not ray.is_initialized():
        ray.init(include_dashboard=False)
    rules = [tuple(r) for r in json.loads(args.rules)]
    t0 = _time.time()
    ds = ray.data.read_parquet(args.input)
    rows = sorted(validate_rules(ds, rules).take_all(),
                  key=lambda r: r["rule"])
    total = sum(r["violations"] for r in rows)
    print(json.dumps({"sec": round(_time.time() - t0, 3),
                      "rules": rows, "total_violations": int(total),
                      "input": args.input}))
    return 1 if (args.fail_on_violations and total) else 0


def _run_prep(args) -> int:
    """Composed prep pipeline job (owns the Ray session, one JSON
    summary line). Shard writes are idempotent by filename, so a
    partial failure resumes by re-running the same command."""
    import json
    import time as _time

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 include_dashboard=False, ignore_reinit_error=True)
    import ray.data

    from .ops.shard import write_shards
    from .pipelines.prep import dedup_rows, prep_pipeline
    from .ops.quality import quality_filter
    from .ops.text import normalize_documents

    t0 = _time.perf_counter()
    ds = ray.data.read_parquet(args.input,
                               columns=[args.id_col, args.text_col])
    # same chain as prep_pipeline, but the terminal stage WRITES the
    # shards (idempotent per-shard files) instead of returning rows
    import pyarrow as pa

    norm = normalize_documents(ds, text_col=args.text_col,
                               id_col=args.id_col, out="__norm",
                               form=args.form)

    def rebind(batch: pa.Table) -> pa.Table:
        return pa.table({args.id_col: batch.column(args.id_col),
                         args.text_col: batch.column("__norm")})

    canon = norm.map_batches(rebind, batch_format="pyarrow",
                             zero_copy_batch=True)
    kept = quality_filter(canon, text_col=args.text_col)
    unique = dedup_rows(kept, id_col=args.id_col,
                        text_col=args.text_col,
                        fingerprint=args.fingerprint)
    m = write_shards(unique, args.out, args.id_col,
                     n_shards=args.shards, method=args.fingerprint)
    print(json.dumps({
        "sec": round(_time.perf_counter() - t0, 3),
        "rows_out": m["rows"], "shards_written": m["written"],
        "shards_skipped": m["skipped"], "out": args.out,
    }))
    if owns_session:
        ray.shutdown()
    return 0


def _run_topk(args) -> int:
    """Streaming heavy-hitters job (owns the Ray session, one JSON
    summary line — the same ``ray job submit`` shape as ``dedup``)."""
    import glob
    import json
    import time as _time

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 include_dashboard=False, ignore_reinit_error=True)
    from .streaming.topk import StreamingTopKJob

    files = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
    if not files:
        print(f"error: no parquet files under {args.input}", file=sys.stderr)
        return 1
    key_cols = args.key_cols.split(",")
    t0 = _time.perf_counter()
    job = StreamingTopKJob(
        key_cols=key_cols, columns=key_cols, capacity=args.capacity,
        num_partitions=args.partitions, checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every, resume=args.resume)
    if getattr(args, "reshard_from", None):
        print(json.dumps({"resharded": job.reshard_from(
            args.reshard_from)}), flush=True)
    job.run(files, files_per_epoch=args.files_per_epoch)
    m = job.finish()
    snap = job.topk(args.k)
    if args.out:
        import pyarrow.parquet as pq

        os.makedirs(os.path.dirname(args.out) or ".", exist_ok=True)
        pq.write_table(snap, args.out)
    print(json.dumps({
        "files": len(files), "epochs": m["epochs"],
        "sec": round(_time.perf_counter() - t0, 3),
        "rows_in": m["rows_in"], "tracked": m["tracked"],
        "max_undercount": m["max_undercount"],
        "topk": [[r["key"], r["cnt"]] for r in snap.to_pylist()],
    }))
    if owns_session:  # never tear down a caller's (e.g. pytest's) session
        ray.shutdown()
    return 0


def _run_sample(args) -> int:
    """Streaming uniform-sample job (owns the Ray session, one JSON
    summary line — the same ``ray job submit`` shape as ``hll``)."""
    import glob
    import json
    import time as _time

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 include_dashboard=False, ignore_reinit_error=True)
    from .streaming.sample import StreamingSampleJob

    files = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
    if not files:
        print(f"error: no parquet files under {args.input}", file=sys.stderr)
        return 1
    t0 = _time.perf_counter()
    job = StreamingSampleJob(
        key_col=args.key_col, k=args.k, method=args.method,
        seed=args.seed, columns=[args.key_col],
        num_partitions=args.partitions,
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every, resume=args.resume)
    if getattr(args, "reshard_from", None):
        print(json.dumps({"resharded": job.reshard_from(
            args.reshard_from)}), flush=True)
    job.run(files, files_per_epoch=args.files_per_epoch)
    m = job.finish()
    out = None
    if args.out:
        import pyarrow.parquet as _pq

        os.makedirs(args.out, exist_ok=True)
        out = os.path.join(args.out, "sample.parquet")
        tmp = out + ".tmp"
        _pq.write_table(job.sample(), tmp)
        os.replace(tmp, out)
    print(json.dumps({
        "files": len(files), "epochs": m["epochs"],
        "sec": round(_time.perf_counter() - t0, 3),
        "rows_in": m["rows_in"], "sample_rows": m["sample_rows"],
        "k": args.k, "out": out,
    }))
    if owns_session:
        ray.shutdown()
    return 0


def _run_hll(args) -> int:
    """Streaming distinct-count job (owns the Ray session, one JSON
    summary line — the same ``ray job submit`` shape as ``topk``)."""
    import glob
    import json
    import time as _time

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 include_dashboard=False, ignore_reinit_error=True)
    from .streaming.cardinality import StreamingHLLJob

    files = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
    if not files:
        print(f"error: no parquet files under {args.input}", file=sys.stderr)
        return 1
    t0 = _time.perf_counter()
    if args.val_col:
        from .streaming.cardinality import StreamingGroupedHLLJob

        gjob = StreamingGroupedHLLJob(
            key_col=args.key_col, val_col=args.val_col, p=args.p,
            columns=[args.key_col, args.val_col],
            num_partitions=args.partitions,
            checkpoint_dir=args.checkpoint_dir,
            checkpoint_every=args.checkpoint_every, resume=args.resume)
        if getattr(args, "reshard_from", None):
            print(json.dumps({"resharded": gjob.reshard_from(
                args.reshard_from)}), flush=True)
        gjob.run(files, files_per_epoch=args.files_per_epoch)
        gm = gjob.finish()
        print(json.dumps({
            "files": len(files), "epochs": gm["epochs"],
            "sec": round(_time.perf_counter() - t0, 3),
            "rows_in": gm["rows_in"], "keys": gm["keys"],
            "state_records": gm["state_records"],
        }))
        if owns_session:
            ray.shutdown()
        return 0
    job = StreamingHLLJob(
        key_col=args.key_col, p=args.p, columns=[args.key_col],
        num_partitions=args.partitions, checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every, resume=args.resume)
    if getattr(args, "reshard_from", None):
        print(json.dumps({"resharded": job.reshard_from(
            args.reshard_from)}), flush=True)
    job.run(files, files_per_epoch=args.files_per_epoch)
    m = job.finish()
    print(json.dumps({
        "files": len(files), "epochs": m["epochs"],
        "sec": round(_time.perf_counter() - t0, 3),
        "rows_in": m["rows_in"], "registers": 1 << args.p,
        "estimate": round(m["estimate"], 1),
    }))
    if owns_session:
        ray.shutdown()
    return 0


def _run_quantiles(args) -> int:
    """Streaming quantiles job (owns the Ray session, one JSON summary
    line — the same ``ray job submit`` shape as ``topk``)."""
    import glob
    import json
    import time as _time

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 include_dashboard=False, ignore_reinit_error=True)
    from .streaming.quantiles import (StreamingGroupedQuantilesJob,
                                      StreamingQuantilesJob)

    files = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
    if not files:
        print(f"error: no parquet files under {args.input}", file=sys.stderr)
        return 1
    qs = [float(x) for x in args.q.split(",")]
    t0 = _time.perf_counter()
    if args.key_cols:
        keys = args.key_cols.split(",")
        job = StreamingGroupedQuantilesJob(
            key_cols=keys, col=args.col, columns=keys + [args.col],
            num_partitions=args.partitions,
            checkpoint_dir=args.checkpoint_dir,
            checkpoint_every=args.checkpoint_every, resume=args.resume)
        if getattr(args, "reshard_from", None):
            print(json.dumps({"resharded": job.reshard_from(
                args.reshard_from)}), flush=True)
        job.run(files, files_per_epoch=args.files_per_epoch)
        m = job.finish()
        snap = job.quantiles(qs)
        print(json.dumps({
            "files": len(files), "epochs": m["epochs"],
            "sec": round(_time.perf_counter() - t0, 3),
            "rows_in": m["rows_in"],
            "state_records": m["state_records"],
            "keys": snap.num_rows // max(len(qs), 1),
        }))
        if owns_session:
            ray.shutdown()
        return 0
    job = StreamingQuantilesJob(
        col=args.col, capacity=args.capacity, columns=[args.col],
        num_partitions=args.partitions, checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every, resume=args.resume)
    if getattr(args, "reshard_from", None):
        print(json.dumps({"resharded": job.reshard_from(
            args.reshard_from)}), flush=True)
    job.run(files, files_per_epoch=args.files_per_epoch)
    m = job.finish()
    snap = job.quantiles(qs)
    print(json.dumps({
        "files": len(files), "epochs": m["epochs"],
        "sec": round(_time.perf_counter() - t0, 3),
        "rows_in": m["rows_in"], "n": m["n"],
        "max_rank_error": m["max_rank_error"],
        "quantiles": {str(r["q"]): r["value"] for r in snap.to_pylist()},
    }))
    if owns_session:
        ray.shutdown()
    return 0


def _run_dedup(args) -> int:
    """Streaming exact dedup job (owns the Ray session, one JSON summary
    line — the same ``ray job submit`` shape as ``stream``)."""
    import glob
    import json
    import time as _time

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 include_dashboard=False, ignore_reinit_error=True)
    from .streaming.dedup import StreamingDedupJob

    files = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
    if not files:
        print(f"error: no parquet files under {args.input}", file=sys.stderr)
        return 1
    cols = args.columns.split(",") if args.columns else None
    t0 = _time.perf_counter()
    job = StreamingDedupJob(
        args.sink, text_col=args.text_col, method=args.method, columns=cols,
        num_partitions=args.partitions, checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every, resume=args.resume)
    if args.reshard_from:
        print(json.dumps({"resharded": job.reshard_from(
            args.reshard_from)}), flush=True)
    job.run(files, files_per_epoch=args.files_per_epoch)
    m = job.finish()
    print(json.dumps({
        "files": len(files), "epochs": m["epochs"],
        "sec": round(_time.perf_counter() - t0, 3),
        "rows_in": m["rows_in"], "rows_out": m["rows_out"],
        "state_keys": m["state_keys"], "sink": args.sink,
    }))
    if owns_session:  # never tear down a caller's (e.g. pytest's) session
        ray.shutdown()
    return 0


def _run_throttle(args) -> int:
    """Streaming per-key throttle job (owns the Ray session, one JSON
    summary line — the same ``ray job submit`` shape as ``dedup``)."""
    import glob
    import json
    import time as _time

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 include_dashboard=False, ignore_reinit_error=True)
    from .streaming.throttle import StreamingThrottleJob

    files = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
    if not files:
        print(f"error: no parquet files under {args.input}", file=sys.stderr)
        return 1
    cols = args.columns.split(",") if args.columns else None
    t0 = _time.perf_counter()
    job = StreamingThrottleJob(
        args.sink, key_cols=args.key_cols.split(","), ts_col=args.ts_col,
        interval_us=int(args.interval_s * 1_000_000), method=args.method,
        columns=cols, num_partitions=args.partitions,
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every, resume=args.resume)
    if args.reshard_from:
        print(json.dumps({"resharded": job.reshard_from(
            args.reshard_from)}), flush=True)
    job.run(files, files_per_epoch=args.files_per_epoch)
    m = job.finish()
    print(json.dumps({
        "files": len(files), "epochs": m["epochs"],
        "sec": round(_time.perf_counter() - t0, 3),
        "rows_in": m["rows_in"], "rows_out": m["rows_out"],
        "state_records": m["state_records"], "sink": args.sink,
    }))
    if owns_session:  # never tear down a caller's (e.g. pytest's) session
        ray.shutdown()
    return 0


def _run_embdedup(args) -> int:
    """Streaming embedding dedup job (owns the Ray session, one JSON
    summary line — the same ``ray job submit`` shape as ``dedup``)."""
    import glob
    import json
    import time as _time

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 include_dashboard=False, ignore_reinit_error=True)
    from .streaming.neardup import StreamingEmbeddingDedupJob

    files = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
    if not files:
        print(f"error: no parquet files under {args.input}", file=sys.stderr)
        return 1
    cols = args.columns.split(",") if args.columns else None
    t0 = _time.perf_counter()
    job = StreamingEmbeddingDedupJob(
        args.sink, dim=args.dim, vec_col=args.vec_col, columns=cols,
        n_planes=args.planes, n_tables=args.tables,
        threshold=args.threshold, star_cap=args.star_cap,
        num_partitions=args.partitions, checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every, resume=args.resume)
    if args.reshard_from:
        print(json.dumps({"resharded": job.reshard_from(
            args.reshard_from)}), flush=True)
    job.run(files, files_per_epoch=args.files_per_epoch)
    m = job.finish()
    print(json.dumps({
        "files": len(files), "epochs": m["epochs"],
        "sec": round(_time.perf_counter() - t0, 3),
        "rows_in": m["rows_in"], "rows_out": m["rows_out"],
        "capped": m["capped"], "state_records": m["state_records"],
        "sink": args.sink,
    }))
    if owns_session:
        ray.shutdown()
    return 0


def _run_cep(args) -> int:
    """Streaming CEP job (owns the Ray session, one JSON summary line —
    the same ``ray job submit`` shape as ``stream``/``dedup``)."""
    import glob
    import json
    import time as _time

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 include_dashboard=False, ignore_reinit_error=True)
    from .expr import F
    from .streaming.cep import StreamingCEPJob

    files = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
    if not files:
        print(f"error: no parquet files under {args.input}", file=sys.stderr)
        return 1
    steps = []
    for part in args.steps.split(","):
        name, cond = part.split(":", 1)
        col, val = cond.split("=", 1)
        steps.append((name.strip(), F(col.strip()).Equal(val.strip())))
    absent = []
    if args.absent:
        for part in args.absent.split(","):
            na, nb, cond = part.split(":", 2)
            col, val = cond.split("=", 1)
            absent.append((na.strip(), nb.strip(),
                           F(col.strip()).Equal(val.strip())))
    t0 = _time.perf_counter()
    job = StreamingCEPJob(
        args.sink, partition_by=args.partition_by.split(","),
        order_by=args.order_by, steps=steps, contiguity=args.contiguity,
        within=args.within_us, tiebreak=args.tiebreak,
        measures=args.measures.split(",") if args.measures else None,
        absent=absent or None,
        lateness_us=args.lateness_s * 1_000_000,
        num_partitions=args.partitions, input_files=files,
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every, resume=args.resume)
    if getattr(args, "reshard_from", None):
        print(json.dumps({"resharded": job.reshard_from(
            args.reshard_from)}), flush=True)
    job.run(files, files_per_epoch=args.files_per_epoch)
    m = job.finish()
    print(json.dumps({
        "files": len(files), "epochs": m["epochs"],
        "sec": round(_time.perf_counter() - t0, 3),
        "rows_in": m["rows_in"], "matches_out": m["matches_out"],
        "late_drops": m["late_drops"],
        "expired_partials": m["expired_partials"],
        "open_partials": m["open_partials"], "sink": args.sink,
    }))
    if owns_session:
        ray.shutdown()
    return 0


def _run_neardup(args) -> int:
    """Streaming MinHash-LSH near-dup job (owns the Ray session, one
    JSON summary line — the same ``ray job submit`` shape as
    ``stream``/``dedup``)."""
    import glob
    import json
    import time as _time

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 include_dashboard=False, ignore_reinit_error=True)
    from .streaming.neardup import StreamingNearDupJob

    files = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
    if not files:
        print(f"error: no parquet files under {args.input}", file=sys.stderr)
        return 1
    cols = args.columns.split(",") if args.columns else None
    t0 = _time.perf_counter()
    job = StreamingNearDupJob(
        args.sink, text_col=args.text_col, columns=cols, ngram=args.ngram,
        num_hashes=args.num_hashes, bands=args.bands, tau=args.tau,
        star_cap=args.star_cap, num_partitions=args.partitions,
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every, resume=args.resume)
    if args.reshard_from:
        print(json.dumps({"resharded": job.reshard_from(
            args.reshard_from)}), flush=True)
    job.run(files, files_per_epoch=args.files_per_epoch)
    m = job.finish()
    print(json.dumps({
        "files": len(files), "epochs": m["epochs"],
        "sec": round(_time.perf_counter() - t0, 3),
        "rows_in": m["rows_in"], "rows_out": m["rows_out"],
        "capped": m["capped"], "state_records": m["state_records"],
        "sink": args.sink,
    }))
    if owns_session:  # never tear down a caller's (e.g. pytest's) session
        ray.shutdown()
    return 0


def _run_simjoin(args) -> int:
    """Streaming similarity join vs a static reference (owns the Ray
    session, one JSON summary line — the same ``ray job submit`` shape
    as ``stream``/``dedup``). Resume rides the sink manifest: the
    reference index is rebuilt (static) and committed epochs are
    skipped."""
    import glob
    import json
    import time as _time

    import ray

    owns_session = not ray.is_initialized()
    if owns_session:
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 include_dashboard=False, ignore_reinit_error=True)
    from .streaming.simjoin import StreamingSimJoinJob

    files = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
    if not files:
        print(f"error: no parquet files under {args.input}",
              file=sys.stderr)
        return 1
    ref = args.reference
    if os.path.isdir(ref):
        ref = sorted(glob.glob(os.path.join(ref, "*.parquet")))
        if not ref:
            print(f"error: no parquet files under {args.reference}",
                  file=sys.stderr)
            return 1
    t0 = _time.perf_counter()
    job = StreamingSimJoinJob(
        args.sink, ref, id_col=args.id_col, text_col=args.text_col,
        threshold=args.threshold, ngram=args.ngram,
        num_hashes=args.num_hashes, bands=args.bands,
        ref_cap=args.ref_cap, num_partitions=args.partitions,
        clean_dir=args.clean_sink, resume=args.resume)
    job.run(files, files_per_epoch=args.files_per_epoch)
    m = job.finish()
    print(json.dumps({
        "files": len(files), "epochs": m["epochs"],
        "sec": round(_time.perf_counter() - t0, 3),
        "rows_in": m["rows_in"], "candidates": m["candidates"],
        "matches_out": m["matches_out"], "capped": m["capped"],
        "rows_clean": m.get("rows_clean", 0),
        "index_keys": m["index_keys"], "sink": args.sink,
    }))
    if owns_session:
        ray.shutdown()
    return 0


def _run_stream(args) -> int:
    """Headline windowed-aggregate (+ optional stream-table join) job.

    Owns the Ray session (per the repo contract only CLI entry points,
    bench.py and the test fixture call ``ray.init``): connects to the
    cluster named by ``RAY_ADDRESS`` — which ``ray job submit`` sets —
    or ``auto`` when unset.
    """
    import glob
    import json
    import time as _time

    import ray

    if not ray.is_initialized():
        ray.init(address=os.environ.get("RAY_ADDRESS", "auto"),
                 include_dashboard=False, ignore_reinit_error=True)

    import pyarrow as pa
    import pyarrow.parquet as pq

    from . import (
        Avg, Catalog, Count, F, LatestByOffset, MINUTES, Relation, Schema,
        Select, Sum, Tumbling,
    )
    from .catalog import Ref
    from .ops.text import add_quality_score, add_token_count
    from .streaming.driver import StreamingJob

    files = sorted(glob.glob(os.path.join(args.input, "*.parquet")))
    if not files:
        print(f"error: no parquet files under {args.input}", file=sys.stderr)
        return 1

    cat = Catalog()
    sch = pq.read_schema(files[0])
    cat.create(Relation(
        "transcripts", Ref.STREAM,
        pa.schema([pa.field(f.name, f.type) for f in sch]),
        path=args.input, timestamp_col="ts", order_cols=["ts", "turn_idx"],
    ))

    def pre_transform(batch):
        batch = add_token_count(batch, "text", "token_count")
        return add_quality_score(batch, "text", "quality")

    pre_transform.input_columns = ["text"]
    pre_transform.output_columns = ["token_count", "quality"]

    q = Select(F("conv_id"),
               *([F("user_tier")] if args.meta else []),
               Count(F("turn_idx")).As("turns"),
               Sum(F("token_count")).As("tokens"),
               Avg(F("quality")).As("avg_quality"),
               LatestByOffset(F("role")).As("last_role")) \
        .From(Schema("transcripts"))
    if args.meta:
        msch = pq.read_schema(args.meta)
        cat.create(Relation(
            "conv_meta", Ref.TABLE,
            pa.schema([pa.field(f.name, f.type) for f in msch]),
            path=args.meta, primary_key="conv_id",
        ))
        q = q.Join(Schema("conv_meta"),
                   F("transcripts.conv_id").Equal(F("conv_meta.conv_id")))
        q = q.GroupBy(F("conv_id"), F("user_tier"))
    else:
        q = q.GroupBy(F("conv_id"))
    q = q.Windowed(Tumbling(args.window_min, MINUTES)).EmitFinal()

    tsch = cat.get("transcripts").schema
    cat.get("transcripts").schema = tsch.append(
        pa.field("token_count", pa.int64())
    ).append(pa.field("quality", pa.float64()))

    job = StreamingJob(
        q, cat, args.sink, num_partitions=args.partitions,
        lateness_us=args.lateness_s * 1_000_000,
        checkpoint_dir=args.checkpoint_dir,
        checkpoint_every=args.checkpoint_every,
        resume=args.resume, pre_transform=pre_transform,
        salt_by_window=args.salt,
    )
    if args.reshard_from:
        info = job.reshard_from(args.reshard_from)
        print(json.dumps({"resharded": info}), flush=True)
    t0 = _time.perf_counter()
    job.run(files, files_per_epoch=args.files_per_epoch,
            max_inflight=args.max_inflight)
    job.finish()
    sec = _time.perf_counter() - t0
    out = job.result()
    last = job.metrics_log[-1]["partitions"] if job.metrics_log else []
    wms = [m["watermark"] for m in last if m.get("watermark") is not None]
    print(json.dumps({
        "files": len(files), "epochs": job.epoch + 1,
        "sec": round(sec, 3), "rows_out": out.num_rows,
        "rows_in": sum(m.get("rows_in", 0) for m in last),
        "late_drops": sum(m.get("late_drops", 0) for m in last),
        # north_rule operator metrics: per-partition watermark spread at
        # end-of-stream (lag = max - min; 0 means partitions kept pace)
        "watermark_min_us": min(wms) if wms else None,
        "watermark_lag_us": (max(wms) - min(wms)) if wms else None,
        "sink": args.sink,
    }))
    return 0


if __name__ == "__main__":
    sys.exit(main())
