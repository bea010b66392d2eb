"""Stream-stream windowed join tests (SURVEY.md §2.5 stream-stream RD
mapping): symmetric hash join across micro-batches vs a DuckDB oracle
over the same data, including LEFT/OUTER null padding at expiry."""

import glob

import duckdb
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ksql_ray import Catalog, F, Relation, Schema, Select
from ksql_ray.catalog import Ref
from ksql_ray.fixtures import gen_transcripts, gen_turn_scores, write_stream_files
from ksql_ray.streaming.join import StreamJoinJob

from conftest import assert_tables_equal

WITHIN_US = 10_000_000  # 10 s


@pytest.fixture(scope="module")
def join_fixture(tmp_path_factory):
    base = tmp_path_factory.mktemp("sjoin")
    t = gen_transcripts(n_turns=1500, seed=42, late_frac=0.0)
    s = gen_turn_scores(t, seed=42, coverage=0.8)
    t_dir = str(base / "transcripts")
    s_dir = str(base / "scores")
    write_stream_files(t, t_dir, n_files=5)
    write_stream_files(s, s_dir, n_files=5)
    cat = Catalog()
    cat.create(Relation("transcripts", Ref.STREAM,
                        pa.schema([pa.field(f.name, f.type) for f in t.schema]),
                        path=t_dir, timestamp_col="ts", order_cols=["ts", "turn_idx"]))
    # scores carry their own ts; rename collision handled by the planner
    cat.create(Relation("turn_scores", Ref.STREAM,
                        pa.schema([pa.field(f.name, f.type) for f in s.schema]),
                        path=s_dir, timestamp_col="ts", order_cols=["ts", "turn_idx"]))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW t AS SELECT * FROM '{t_dir}/*.parquet'")
    con.execute(f"CREATE VIEW s AS SELECT * FROM '{s_dir}/*.parquet'")
    yield {"cat": cat, "t_dir": t_dir, "s_dir": s_dir, "con": con}
    con.close()


def _builder(how: str):
    b = Select(F("transcripts.conv_id"), F("transcripts.turn_idx"),
               F("text"), F("score"))
    b = b.From(Schema("transcripts"))
    cond = [
        F("transcripts.conv_id").Equal(F("turn_scores.conv_id")),
        F("transcripts.turn_idx").Equal(F("turn_scores.turn_idx")),
    ]
    if how == "inner":
        return b.Join(Schema("turn_scores"), *cond)
    if how == "left":
        return b.LeftJoin(Schema("turn_scores"), *cond)
    if how == "outer":
        return b.OuterJoin(Schema("turn_scores"), *cond)
    raise ValueError(how)


def _run(fix, how, tmp_path, files_per_epoch=1):
    job = StreamJoinJob(
        _builder(how), fix["cat"], str(tmp_path / f"out_{how}"),
        within_us=WITHIN_US, num_partitions=3, lateness_us=1 << 60,
    )
    lf = sorted(glob.glob(fix["t_dir"] + "/*.parquet"))
    rf = sorted(glob.glob(fix["s_dir"] + "/*.parquet"))
    for i in range(0, max(len(lf), len(rf))):
        job.process_epoch(lf[i : i + 1], rf[i : i + 1])
    job.finish()
    return job.result()


def test_inner_stream_join(join_fixture, tmp_path, ray_session):
    got = _run(join_fixture, "inner", tmp_path)
    exp = join_fixture["con"].execute(f"""
        SELECT t.conv_id, t.turn_idx, t.text, s.score
        FROM t JOIN s ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
        WHERE abs(epoch_us(t.ts) - epoch_us(s.ts)) <= {WITHIN_US}
    """).arrow()
    assert_tables_equal(got, exp)


def test_left_stream_join(join_fixture, tmp_path, ray_session):
    got = _run(join_fixture, "left", tmp_path)
    exp = join_fixture["con"].execute(f"""
        SELECT t.conv_id, t.turn_idx, t.text, s.score
        FROM t LEFT JOIN s ON t.conv_id = s.conv_id AND t.turn_idx = s.turn_idx
           AND abs(epoch_us(t.ts) - epoch_us(s.ts)) <= {WITHIN_US}
    """).arrow()
    assert_tables_equal(got, exp)


def test_outer_stream_join(join_fixture, tmp_path, ray_session):
    got = _run(join_fixture, "outer", tmp_path)
    exp = join_fixture["con"].execute(f"""
        SELECT coalesce(t.conv_id, s.conv_id) AS conv_id,
               coalesce(t.turn_idx, s.turn_idx) AS turn_idx,
               t.text, s.score
        FROM t FULL OUTER JOIN s ON t.conv_id = s.conv_id
           AND t.turn_idx = s.turn_idx
           AND abs(epoch_us(t.ts) - epoch_us(s.ts)) <= {WITHIN_US}
    """).arrow()
    assert_tables_equal(got, exp)


def test_stream_join_checkpoint_resume(join_fixture, tmp_path, ray_session):
    """Kill-and-resume for the join state: resumed run's committed output
    equals an uninterrupted run (exactly-once across restart)."""
    import glob as glob_

    lf = sorted(glob_.glob(join_fixture["t_dir"] + "/*.parquet"))
    rf = sorted(glob_.glob(join_fixture["s_dir"] + "/*.parquet"))
    out = str(tmp_path / "ck_out")
    ck = str(tmp_path / "ck")

    def mk(resume):
        return StreamJoinJob(
            _builder("inner"), join_fixture["cat"], out, within_us=WITHIN_US,
            num_partitions=3, lateness_us=1 << 60,
            checkpoint_dir=ck, checkpoint_every=1, resume=resume,
        )

    j1 = mk(False)
    for i in range(2):
        j1.process_epoch(lf[i:i + 1], rf[i:i + 1])
    # j1 dies; resume replays the full stream
    j2 = mk(True)
    for i in range(len(lf)):
        j2.process_epoch(lf[i:i + 1], rf[i:i + 1])
    j2.finish()
    resumed = j2.result()

    ref_out = str(tmp_path / "ref_out")
    jr = StreamJoinJob(_builder("inner"), join_fixture["cat"], ref_out,
                       within_us=WITHIN_US, num_partitions=3, lateness_us=1 << 60)
    for i in range(len(lf)):
        jr.process_epoch(lf[i:i + 1], rf[i:i + 1])
    jr.finish()
    assert_tables_equal(resumed, jr.result())
