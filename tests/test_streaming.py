"""Streaming-engine tests (SURVEY.md §5.2): windowed aggregation over
micro-batches with watermarks, EMIT CHANGES/FINAL, late-data drops,
session merges across batches, exactly-once sink, checkpoint/resume.

The conformance anchor: with no late data and an end-of-stream flush, the
streaming EMIT FINAL output must equal the bounded (pull-query) oracle
over the concatenated input — same emitted rows per window for identical
input stream + watermark (north_rule)."""

import glob
import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest

from ksql_ray import (
    Avg, CollectList, Count, F, LatestByOffset, MINUTES, Relation, Schema,
    Select, Session, Sum, Tumbling, STREAM, TABLE, Catalog,
)
from ksql_ray.catalog import Ref
from ksql_ray.fixtures import (
    gen_conv_meta, gen_transcripts, materialize_fixture_dir, write_stream_files,
)
from ksql_ray.streaming.driver import StreamingJob

from conftest import assert_tables_equal


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    base = tmp_path_factory.mktemp("transcripts")
    paths = materialize_fixture_dir(str(base), n_turns=3000, seed=42, n_files=6)
    return paths


@pytest.fixture(scope="module")
def stream_catalog(fixture_dir):
    cat = Catalog()
    sample = pq.read_schema(sorted(glob.glob(fixture_dir["transcripts"] + "/*.parquet"))[0])
    schema = pa.schema([pa.field(f.name, f.type) for f in sample])
    cat.create(Relation(
        "transcripts", Ref.STREAM, schema, path=fixture_dir["transcripts"],
        timestamp_col="ts", order_cols=["ts", "turn_idx"],
    ))
    meta_schema = pq.read_schema(fixture_dir["conv_meta"])
    cat.create(Relation(
        "conv_meta", Ref.TABLE,
        pa.schema([pa.field(f.name, f.type) for f in meta_schema]),
        path=fixture_dir["conv_meta"], primary_key="conv_id",
    ))
    return cat


def _stream_files(fixture_dir):
    return sorted(glob.glob(fixture_dir["transcripts"] + "/*.parquet"))


def _tumbling_query():
    return (
        Select(F("conv_id"), Count(F("turn_idx")).As("turns"),
               LatestByOffset(F("role")).As("last_role"))
        .From(Schema("transcripts"))
        .GroupBy(F("conv_id"))
        .Windowed(Tumbling(1, MINUTES))
        .EmitFinal()
    )


def test_emit_final_equals_bounded_oracle(stream_catalog, fixture_dir, tmp_path):
    """No-late-data conformance: streaming final rows == bounded result."""
    from ksql_ray import Engine

    files = _stream_files(fixture_dir)
    job = StreamingJob(
        _tumbling_query(), stream_catalog, str(tmp_path / "out"),
        num_partitions=4, lateness_us=1 << 60,  # effectively no late drops
    )
    job.run(files)
    job.finish()
    streamed = job.result()

    eng = Engine(stream_catalog, num_partitions=4)
    expected = eng.table(_tumbling_query())
    assert_tables_equal(streamed, expected)
    total_late = sum(m["late_drops"] for m in job.metrics_log[-1]["partitions"])
    assert total_late == 0


def test_emit_final_emits_each_window_once(stream_catalog, fixture_dir, tmp_path):
    files = _stream_files(fixture_dir)
    job = StreamingJob(
        _tumbling_query(), stream_catalog, str(tmp_path / "out"),
        num_partitions=4, lateness_us=1 << 60,
    )
    job.run(files)
    job.finish()
    t = job.result()
    keys = list(zip(t.column("conv_id").to_pylist(),
                    t.column("window_start").to_pylist()))
    assert len(keys) == len(set(keys)), "EMIT FINAL emitted a window twice"


def test_epoch_is_the_watermark_barrier(stream_catalog, tmp_path):
    """Intra-epoch disorder must NOT late-drop: two micro-batch tables in
    ONE epoch, where the second's rows would fall behind the first's
    watermark under per-partial advancement (e.g. several source streams
    whose files interleave at offset event times). The watermark advances
    at the epoch barrier, so both rows must aggregate."""
    base = 1_700_000_000_000_000
    minute = 60_000_000

    def batch(turn_idx, ts_us):
        return pa.table({
            "conv_id": ["c1"],
            "turn_idx": pa.array([turn_idx], type=pa.int32()),
            "role": ["user"],
            "text": [f"c1:{turn_idx} x"],
            "tool": pa.array([None], type=pa.string()),
            "ts": pa.array([ts_us], type=pa.timestamp("us")),
        })

    ahead = batch(0, base + 10 * minute)  # would advance wm past base
    behind = batch(1, base)               # 10 min earlier, same epoch
    cat = Catalog()
    cat.create(Relation("transcripts", Ref.STREAM, ahead.schema,
                        path="/nonexistent", timestamp_col="ts",
                        order_cols=["ts", "turn_idx"]))
    job = StreamingJob(_tumbling_query(), cat, str(tmp_path / "out"),
                       num_partitions=2, lateness_us=0)
    m = job.process_epoch([ahead, behind])
    assert sum(p["late_drops"] for p in m) == 0
    job.finish()
    t = job.result()
    ws = sorted(pc.cast(t.column("window_start"), pa.int64()).to_pylist())
    # both windows present: the behind row survived the same-epoch merge
    floor = lambda ts: ts - ts % minute
    assert ws == [floor(base), floor(base + 10 * minute)]


def test_late_rows_dropped_and_counted(stream_catalog, tmp_path):
    """Hand-made batches: second batch carries a row for a window closed
    by the first batch's watermark."""
    base = 1_700_000_000_000_000
    minute = 60_000_000
    b1 = pa.table({
        "conv_id": ["c1", "c1"],
        "turn_idx": pa.array([0, 1], type=pa.int32()),
        "role": ["user", "assistant"],
        "text": ["c1:0 x", "c1:1 y"],
        "tool": pa.array([None, None], type=pa.string()),
        "ts": pa.array([base + 10 * minute, base + 10 * minute + 1], type=pa.timestamp("us")),
    })
    late = pa.table({
        "conv_id": ["c1"],
        "turn_idx": pa.array([2], type=pa.int32()),
        "role": ["user"],
        "text": ["c1:2 z"],
        "tool": pa.array([None], type=pa.string()),
        "ts": pa.array([base], type=pa.timestamp("us")),  # 10 min earlier
    })
    cat = Catalog()
    cat.create(Relation("transcripts", Ref.STREAM, b1.schema, path="/nonexistent",
                        timestamp_col="ts", order_cols=["ts", "turn_idx"]))
    job = StreamingJob(_tumbling_query(), cat, str(tmp_path / "out"),
                       num_partitions=2, lateness_us=0)
    job.process_epoch([b1])
    m = job.process_epoch([late])
    assert sum(p["late_drops"] for p in m) == 1
    job.finish()
    t = job.result()
    # the late row's window (base) must NOT appear
    ws = pc.cast(t.column("window_start"), pa.int64()).to_pylist()
    assert base not in [w - (w % minute) for w in ws] or all(
        w >= base + 10 * minute for w in ws
    )
    # and the on-time window has both rows
    assert sorted(t.column("turns").to_pylist()) == [2]


def test_emit_changes_trace_deterministic(stream_catalog, fixture_dir, tmp_path):
    q = (
        Select(F("conv_id"), Count(F("turn_idx")).As("turns"))
        .From(Schema("transcripts"))
        .GroupBy(F("conv_id"))
        .Windowed(Tumbling(1, MINUTES))
        .EmitChanges()
    )
    files = _stream_files(fixture_dir)
    outs = []
    for run in range(2):
        job = StreamingJob(q, stream_catalog, str(tmp_path / f"out{run}"),
                           num_partitions=4, lateness_us=1 << 60)
        job.run(files)
        job.finish()
        outs.append(job.result())
    # identical emit trace (same rows, same per-epoch files)
    a, e = outs
    assert a.num_rows == e.num_rows
    assert_tables_equal(a, e, sort_by=None)


def test_session_windows_across_batches(stream_catalog, fixture_dir, tmp_path):
    """Sessions that span micro-batch boundaries merge correctly: compare
    against the bounded session path over the whole stream."""
    from ksql_ray import Engine

    q = (
        Select(F("conv_id"), Count(F("turn_idx")).As("turns"),
               Avg(F("turn_idx")).As("avg_idx"))
        .From(Schema("transcripts"))
        .GroupBy(F("conv_id"))
        .Windowed(Session(2, MINUTES))
        .EmitFinal()
    )
    files = _stream_files(fixture_dir)
    job = StreamingJob(q, stream_catalog, str(tmp_path / "out"),
                       num_partitions=4, lateness_us=1 << 60)
    job.run(files)
    job.finish()
    streamed = job.result()

    eng = Engine(stream_catalog, num_partitions=4)
    expected = eng.table(q)
    assert_tables_equal(streamed, expected)


def test_stream_table_join(stream_catalog, fixture_dir, tmp_path):
    """Stream-table broadcast join (conv_meta keyed by conv_id) feeding a
    windowed aggregate."""
    from ksql_ray import Engine

    q = (
        Select(F("conv_id"), F("user_tier"), Count(F("turn_idx")).As("turns"))
        .From(Schema("transcripts"))
        .Join(Schema("conv_meta"),
              F("transcripts.conv_id").Equal(F("conv_meta.conv_id")))
        .GroupBy(F("conv_id"), F("user_tier"))
        .Windowed(Tumbling(5, MINUTES))
        .EmitFinal()
    )
    files = _stream_files(fixture_dir)
    job = StreamingJob(q, stream_catalog, str(tmp_path / "out"),
                       num_partitions=4, lateness_us=1 << 60)
    job.run(files)
    job.finish()
    streamed = job.result()
    eng = Engine(stream_catalog, num_partitions=4)
    expected = eng.table(q)
    assert_tables_equal(streamed, expected)


def test_checkpoint_resume_exactly_once(stream_catalog, fixture_dir, tmp_path):
    """Kill-and-resume: process 3 epochs with checkpoints, start a fresh
    job from the checkpoint, finish — committed output equals an
    uninterrupted run (exactly-once across restart)."""
    files = _stream_files(fixture_dir)
    out1 = str(tmp_path / "out1")
    ck = str(tmp_path / "ck")
    job = StreamingJob(_tumbling_query(), stream_catalog, out1,
                       num_partitions=4, lateness_us=1 << 60,
                       checkpoint_dir=ck, checkpoint_every=1)
    job.run(files[:3])
    # job "dies" here; a new job resumes from the checkpoint
    job2 = StreamingJob(_tumbling_query(), stream_catalog, out1,
                        num_partitions=4, lateness_us=1 << 60,
                        checkpoint_dir=ck, checkpoint_every=1, resume=True)
    job2.run(files)  # replays all files; epochs <= cursor are skipped
    job2.finish()
    resumed = job2.result()

    out2 = str(tmp_path / "out2")
    ref = StreamingJob(_tumbling_query(), stream_catalog, out2,
                       num_partitions=4, lateness_us=1 << 60)
    ref.run(files)
    ref.finish()
    assert_tables_equal(resumed, ref.result())


@pytest.mark.parametrize("kwargs", [
    {"route": "broadcast"},
    {"files_per_task": 2},
    {"route": "broadcast", "files_per_task": 3},
])
def test_route_and_chunking_equivalence(stream_catalog, fixture_dir,
                                        tmp_path, kwargs):
    """route="broadcast" (full-partial shipping) and files_per_task>1
    (multi-file prep tasks) are alternate physical plans — committed
    output must be identical to the p2p/one-file default."""
    files = _stream_files(fixture_dir)
    ref = StreamingJob(_tumbling_query(), stream_catalog,
                       str(tmp_path / "ref"), num_partitions=4,
                       lateness_us=1 << 60)
    ref.run(files)
    ref.finish()
    tag = "_".join(f"{k}{v}" for k, v in kwargs.items())
    job = StreamingJob(_tumbling_query(), stream_catalog,
                       str(tmp_path / tag), num_partitions=4,
                       lateness_us=1 << 60, **kwargs)
    job.run(files)
    job.finish()
    assert_tables_equal(job.result(), ref.result())


def test_checkpoint_resume_lagging_cursor(stream_catalog, fixture_dir,
                                          tmp_path):
    """checkpoint_every=2 with a kill after 3 epochs: the snapshot cursor
    LAGS the epochs already committed to the sink. Resume must replay
    from the older state without double-writing the already-committed
    epochs (idempotent per-(partition, epoch) files)."""
    files = _stream_files(fixture_dir)
    out1, ck = str(tmp_path / "out1"), str(tmp_path / "ck")
    job = StreamingJob(_tumbling_query(), stream_catalog, out1,
                       num_partitions=4, lateness_us=1 << 60,
                       checkpoint_dir=ck, checkpoint_every=2)
    job.run(files[:3])  # checkpoints after epoch 1; epochs 0-2 committed
    job2 = StreamingJob(_tumbling_query(), stream_catalog, out1,
                        num_partitions=4, lateness_us=1 << 60,
                        checkpoint_dir=ck, checkpoint_every=2, resume=True)
    job2.run(files)
    job2.finish()

    ref = StreamingJob(_tumbling_query(), stream_catalog,
                       str(tmp_path / "out2"), num_partitions=4,
                       lateness_us=1 << 60)
    ref.run(files)
    ref.finish()
    assert_tables_equal(job2.result(), ref.result())


def test_checkpoint_resume_emit_changes(stream_catalog, fixture_dir, tmp_path):
    """Kill-and-resume under EMIT CHANGES: the committed changelog after
    a restart must equal an uninterrupted run's — replayed epochs keep
    their original sink files, resumed epochs re-emit from restored
    state."""
    q = (Select(F("conv_id"), Count(F("turn_idx")).As("turns"))
         .From(Schema("transcripts")).GroupBy(F("conv_id"))
         .EmitChanges())
    files = _stream_files(fixture_dir)
    out1, ck = str(tmp_path / "out1"), str(tmp_path / "ck")
    job = StreamingJob(q, stream_catalog, out1, num_partitions=4,
                       lateness_us=1 << 60,
                       checkpoint_dir=ck, checkpoint_every=1)
    job.run(files[:3])
    job2 = StreamingJob(q, stream_catalog, out1, num_partitions=4,
                        lateness_us=1 << 60,
                        checkpoint_dir=ck, checkpoint_every=1, resume=True)
    job2.run(files)
    job2.finish()

    out2 = str(tmp_path / "out2")
    ref = StreamingJob(q, stream_catalog, out2, num_partitions=4,
                       lateness_us=1 << 60)
    ref.run(files)
    ref.finish()
    assert_tables_equal(job2.result(), ref.result())


def test_collect_list_streaming(stream_catalog, fixture_dir, tmp_path):
    """Order-sensitive aggregate across batches: per-turn text equality
    under stable (conv_id, turn_idx) ordering (input_hint invariant)."""
    from ksql_ray import Engine

    q = (
        Select(F("conv_id"), CollectList(F("text")).As("texts"))
        .From(Schema("transcripts"))
        .GroupBy(F("conv_id"))
        .Windowed(Tumbling(10, MINUTES))
        .EmitFinal()
    )
    files = _stream_files(fixture_dir)
    job = StreamingJob(q, stream_catalog, str(tmp_path / "out"),
                       num_partitions=4, lateness_us=1 << 60)
    job.run(files)
    job.finish()
    streamed = job.result()
    eng = Engine(stream_catalog, num_partitions=4)
    expected = eng.table(q)
    assert_tables_equal(streamed, expected)


def test_hot_key_salting(stream_catalog, fixture_dir, tmp_path):
    """north_rule: explicit salting for hot conversations — with
    salt_by_window, a hot key's windows spread across partitions, and the
    final result still equals the bounded oracle."""
    from ksql_ray import Engine

    files = _stream_files(fixture_dir)
    job = StreamingJob(
        _tumbling_query(), stream_catalog, str(tmp_path / "out"),
        num_partitions=4, lateness_us=1 << 60, salt_by_window=True,
    )
    job.run(files)
    job.finish()
    streamed = job.result()
    eng = Engine(stream_catalog, num_partitions=4)
    expected = eng.table(_tumbling_query())
    assert_tables_equal(streamed, expected)
    # the hottest conversation (Zipf head: conv-00000000) must appear in
    # the output of more than one partition file
    import pyarrow.parquet as pq_
    import glob as glob_

    parts_with_hot = set()
    for f in glob_.glob(str(tmp_path / "out" / "part-*.parquet")):
        t = pq_.read_table(f, columns=["conv_id"])
        if "conv-00000000" in set(t.column("conv_id").to_pylist()):
            parts_with_hot.add(f.split("part-")[1][:4])
    assert len(parts_with_hot) > 1, "hot key not spread across partitions"


def test_unwindowed_emit_changes(stream_catalog, fixture_dir, tmp_path):
    """Running aggregate (GROUP BY + EMIT CHANGES, no window): the last
    emitted value per key equals the bounded result over the whole
    stream — the ksqlDB changelog-table semantic."""
    from ksql_ray import Engine

    q = (
        Select(F("conv_id"), Count(F("turn_idx")).As("turns"),
               LatestByOffset(F("role")).As("last_role"))
        .From(Schema("transcripts"))
        .GroupBy(F("conv_id"))
        .EmitChanges()
    )
    files = _stream_files(fixture_dir)
    job = StreamingJob(q, stream_catalog, str(tmp_path / "out"),
                       num_partitions=4, lateness_us=1 << 60)
    job.run(files)
    m = job.finish()
    emitted = job.result().to_pandas()
    # changelog compaction: keep the LAST emitted row per conv_id
    # (files are part-{p}-epoch-{e}; reading committed returns epoch order)
    last = emitted.groupby("conv_id").tail(1).reset_index(drop=True)
    eng = Engine(stream_catalog, num_partitions=4)
    expected = eng.table(q).to_pandas()
    assert_tables_equal(last, expected)


def test_state_bounded_under_watermark(stream_catalog, fixture_dir, tmp_path):
    """With finite lateness, EMIT FINAL closes windows as the watermark
    advances: open state must SHRINK over the run, not grow with input
    (the 100 TB memory-boundedness invariant)."""
    files = _stream_files(fixture_dir)
    job = StreamingJob(_tumbling_query(), stream_catalog, str(tmp_path / "out"),
                       num_partitions=4, lateness_us=60_000_000)
    open_counts = []
    for f in files:
        m = job.process_epoch([f])
        open_counts.append(sum(p["open_windows"] for p in m))
    job.finish()
    # late in the stream, open state must be far below its peak
    assert open_counts[-1] < max(open_counts), f"state never shrank: {open_counts}"


def test_session_export_assembles_docs(stream_catalog, fixture_dir, tmp_path):
    """Session-close conversation export: two ordered CollectLists in one
    session-window query, joined post-emit into 'role: text' documents —
    streaming result == bounded engine == DuckDB string_agg oracle."""
    import duckdb
    import pyarrow.compute as pc

    gap_us = 2 * 60 * 1_000_000
    q = (
        Select(F("conv_id"), CollectList(F("role")).As("roles"),
               CollectList(F("text")).As("texts"),
               Count(F("turn_idx")).As("n_turns"))
        .From(Schema("transcripts"))
        .GroupBy(F("conv_id"))
        .Windowed(Session(2, MINUTES))
        .EmitFinal()
    )
    files = _stream_files(fixture_dir)
    job = StreamingJob(q, stream_catalog, str(tmp_path / "out"),
                       num_partitions=4, lateness_us=1 << 60)
    job.run(files)
    job.finish()

    def join_docs(tbl):
        roles = tbl.column("roles").combine_chunks() if isinstance(
            tbl.column("roles"), pa.ChunkedArray) else tbl.column("roles")
        texts = tbl.column("texts").combine_chunks() if isinstance(
            tbl.column("texts"), pa.ChunkedArray) else tbl.column("texts")
        lines = pc.binary_join_element_wise(
            pc.cast(roles.values, pa.string()),
            pc.cast(texts.values, pa.string()), ": ")
        docs = pc.binary_join(
            pa.ListArray.from_arrays(texts.offsets, lines), chr(10))
        return tbl.drop_columns(["roles", "texts"]).append_column(
            "doc", docs)

    streamed = join_docs(job.result())

    from ksql_ray import Engine

    eng = Engine(stream_catalog, num_partitions=4)
    assert_tables_equal(streamed, join_docs(eng.table(q)))

    con = duckdb.connect()
    glob_pat = fixture_dir["transcripts"] + "/*.parquet"
    oracle = con.sql(f"""
        WITH flagged AS (
          SELECT conv_id, turn_idx, role, text, ts,
                 CASE WHEN lag(ts) OVER w IS NULL
                      OR epoch_us(ts) - epoch_us(lag(ts) OVER w) > {gap_us}
                      THEN 1 ELSE 0 END AS new_sess
          FROM '{glob_pat}'
          WINDOW w AS (PARTITION BY conv_id ORDER BY ts, turn_idx)
        ), sessions AS (
          SELECT *, sum(new_sess) OVER (PARTITION BY conv_id
                      ORDER BY ts, turn_idx ROWS UNBOUNDED PRECEDING)
                 AS sess_id
          FROM flagged)
        SELECT min(ts) AS window_start, max(ts) AS window_end, conv_id,
               count(turn_idx)::BIGINT AS n_turns,
               string_agg(role || ': ' || text, chr(10)
                          ORDER BY ts, turn_idx) AS doc
        FROM sessions GROUP BY conv_id, sess_id""").arrow()
    con.close()
    assert_tables_equal(streamed, oracle)
