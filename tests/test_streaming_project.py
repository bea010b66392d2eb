"""Stateless push query (EMIT CHANGES filter/projection): the milestone-0
shape `SELECT conv_id, text FROM transcripts WHERE role = 'assistant'
EMIT CHANGES` (SURVEY.md §7.1, select_builder_test.go:615)."""

import glob

import duckdb
import pyarrow as pa
import pytest

from ksql_ray import Catalog, F, Relation, Schema, Select
from ksql_ray.catalog import Ref
from ksql_ray.fixtures import gen_conv_meta, gen_transcripts, write_stream_files
from ksql_ray.streaming.driver import StreamingProjectJob

from conftest import assert_tables_equal


@pytest.fixture(scope="module")
def fix(tmp_path_factory):
    base = tmp_path_factory.mktemp("push")
    t = gen_transcripts(n_turns=1200, seed=42)
    t_dir = str(base / "transcripts")
    write_stream_files(t, t_dir, n_files=4)
    import pyarrow.parquet as pq

    meta = gen_conv_meta(t, 42)
    meta_path = str(base / "conv_meta.parquet")
    pq.write_table(meta, meta_path)
    cat = Catalog()
    cat.create(Relation("transcripts", Ref.STREAM,
                        pa.schema([pa.field(f.name, f.type) for f in t.schema]),
                        path=t_dir, timestamp_col="ts", order_cols=["ts", "turn_idx"]))
    cat.create(Relation("conv_meta", Ref.TABLE,
                        pa.schema([pa.field(f.name, f.type) for f in meta.schema]),
                        path=meta_path, primary_key="conv_id"))
    con = duckdb.connect()
    con.execute(f"CREATE VIEW transcripts AS SELECT * FROM '{t_dir}/*.parquet'")
    con.execute(f"CREATE VIEW conv_meta AS SELECT * FROM '{meta_path}'")
    yield {"cat": cat, "t_dir": t_dir, "con": con}
    con.close()


def test_push_filter_project(fix, tmp_path, ray_session):
    q = (Select(F("conv_id"), F("turn_idx"), F("text"))
         .From(Schema("transcripts"))
         .Where(F("role").Equal("assistant"))
         .EmitChanges())
    job = StreamingProjectJob(q, fix["cat"], str(tmp_path / "out"))
    job.run(sorted(glob.glob(fix["t_dir"] + "/*.parquet")), files_per_epoch=2)
    got = job.result()
    exp = fix["con"].execute(
        "SELECT conv_id, turn_idx, text FROM transcripts WHERE role = 'assistant'"
    ).arrow()
    assert_tables_equal(got, exp)


def test_push_with_broadcast_join(fix, tmp_path, ray_session):
    q = (Select(F("conv_id"), F("turn_idx"), F("user_tier"))
         .From(Schema("transcripts"))
         .Join(Schema("conv_meta"),
               F("transcripts.conv_id").Equal(F("conv_meta.conv_id")))
         .Where(F("user_tier").In("pro", "enterprise"))
         .EmitChanges())
    job = StreamingProjectJob(q, fix["cat"], str(tmp_path / "out2"))
    job.run(sorted(glob.glob(fix["t_dir"] + "/*.parquet")), files_per_epoch=2)
    got = job.result()
    exp = fix["con"].execute(
        "SELECT t.conv_id, t.turn_idx, m.user_tier FROM transcripts t "
        "JOIN conv_meta m ON t.conv_id = m.conv_id "
        "WHERE m.user_tier IN ('pro', 'enterprise')"
    ).arrow()
    assert_tables_equal(got, exp)


def test_push_replay_idempotent(fix, tmp_path, ray_session):
    q = (Select(F("conv_id"), F("turn_idx"))
         .From(Schema("transcripts")).EmitChanges())
    files = sorted(glob.glob(fix["t_dir"] + "/*.parquet"))
    out = str(tmp_path / "out3")
    job = StreamingProjectJob(q, fix["cat"], out)
    job.run(files, files_per_epoch=2)
    n1 = job.result().num_rows
    # replay the same stream into the same sink: idempotent, no duplicates
    job2 = StreamingProjectJob(q, fix["cat"], out)
    job2.run(files, files_per_epoch=2)
    assert job2.result().num_rows == n1


def test_push_right_outer_join_pads(fix, tmp_path, ray_session):
    """RIGHT/OUTER stream-table joins: never-matched build rows are
    null-padded exactly once at finish() (matched-bitmap state)."""
    q = (Select(F("conv_id"), F("turn_idx"), F("user_tier"))
         .From(Schema("transcripts"))
         .RightJoin(Schema("conv_meta"),
                    F("transcripts.conv_id").Equal(F("conv_meta.conv_id")))
         .EmitChanges())
    files = sorted(glob.glob(fix["t_dir"] + "/*.parquet"))
    job = StreamingProjectJob(q, fix["cat"], str(tmp_path / "out_r"))
    job.run(files, files_per_epoch=2)
    job.finish()
    got = job.result()
    exp = fix["con"].execute(
        "SELECT m.conv_id AS conv_id, t.turn_idx, m.user_tier FROM transcripts t "
        "RIGHT JOIN conv_meta m ON t.conv_id = m.conv_id"
    ).arrow()
    assert_tables_equal(got, exp)

    # replaying the same stream into the same sink must not duplicate pads
    job2 = StreamingProjectJob(q, fix["cat"], str(tmp_path / "out_r"))
    job2.run(files, files_per_epoch=2)
    job2.finish()
    assert job2.result().num_rows == got.num_rows
