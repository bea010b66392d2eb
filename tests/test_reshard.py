"""Checkpoint re-sharding (StreamingJob.reshard_from): take a
checkpoint at P partitions, reshard, resume at a different P — the
N -> 4N cluster-rescale path. Committed output must equal an
uninterrupted single-P run for tumbling (vectorized state) and
session (dict state), scale-up and scale-down."""

import glob

import pyarrow.parquet as pq
import pytest

from ksql_ray import (Avg, Count, F, LatestByOffset, MINUTES, Schema,
                      Select, Session, Tumbling)
from ksql_ray.catalog import Catalog, Ref, Relation
from ksql_ray.fixtures import materialize_fixture_dir
from ksql_ray.streaming.driver import StreamingJob

from conftest import assert_tables_equal


@pytest.fixture(scope="module")
def fixture_dir(tmp_path_factory):
    base = tmp_path_factory.mktemp("reshard_fix")
    return materialize_fixture_dir(str(base), n_turns=3000, seed=7,
                                   n_files=6)


@pytest.fixture(scope="module")
def cat(fixture_dir):
    import pyarrow as pa

    sample = pq.read_schema(sorted(glob.glob(
        fixture_dir["transcripts"] + "/*.parquet"))[0])
    schema = pa.schema([pa.field(f.name, f.type) for f in sample])
    c = Catalog()
    c.create(Relation("transcripts", Ref.STREAM, schema,
                      path=fixture_dir["transcripts"],
                      timestamp_col="ts",
                      order_cols=["ts", "turn_idx"]))
    return c


def _files(fixture_dir):
    return sorted(glob.glob(fixture_dir["transcripts"] + "/*.parquet"))


def _tumbling():
    return (Select(F("conv_id"), Count(F("turn_idx")).As("turns"),
                   LatestByOffset(F("role")).As("last_role"))
            .From(Schema("transcripts"))
            .GroupBy(F("conv_id"))
            .Windowed(Tumbling(1, MINUTES))
            .EmitFinal())


def _session():
    return (Select(F("conv_id"), Count(F("turn_idx")).As("turns"),
                   Avg(F("turn_idx")).As("avg_idx"))
            .From(Schema("transcripts"))
            .GroupBy(F("conv_id"))
            .Windowed(Session(2, MINUTES))
            .EmitFinal())


@pytest.mark.parametrize("make_q,old_p,new_p", [
    (_tumbling, 3, 5),   # scale up, vectorized state
    (_tumbling, 5, 2),   # scale down
    (_session, 3, 5),    # scale up, dict/session state
])
def test_reshard_resume_matches_single_run(cat, fixture_dir, tmp_path,
                                           make_q, old_p, new_p):
    files = _files(fixture_dir)
    tag = f"{make_q.__name__}_{old_p}to{new_p}"
    out = str(tmp_path / f"out_{tag}")
    ck_old = str(tmp_path / f"ck_old_{tag}")
    ck_new = str(tmp_path / f"ck_new_{tag}")

    job = StreamingJob(make_q(), cat, out, num_partitions=old_p,
                       lateness_us=1 << 60, checkpoint_dir=ck_old,
                       checkpoint_every=1)
    job.run(files[:3])
    # old job "dies"; rescale the checkpoint to new_p and resume
    job2 = StreamingJob(make_q(), cat, out, num_partitions=new_p,
                        lateness_us=1 << 60, checkpoint_dir=ck_new,
                        checkpoint_every=1)
    info = job2.reshard_from(ck_old)
    assert info == {"epoch": 2, "old_partitions": old_p,
                    "new_partitions": new_p}
    job2.run(files)  # replays all; epochs <= cursor skipped
    job2.finish()

    ref = StreamingJob(make_q(), cat, str(tmp_path / f"ref_{tag}"),
                       num_partitions=new_p, lateness_us=1 << 60)
    ref.run(files)
    ref.finish()
    assert_tables_equal(job2.result(), ref.result())


def test_reshard_requires_checkpoint_dir(cat, fixture_dir, tmp_path):
    from ksql_ray.errors import PlanError

    job = StreamingJob(_tumbling(), cat, str(tmp_path / "o"),
                       num_partitions=2, lateness_us=1 << 60)
    with pytest.raises(PlanError, match="checkpoint_dir"):
        job.reshard_from(str(tmp_path / "nope"))
