"""Checkpoint re-sharding for the streaming dedup job
(StreamingDedupJob.reshard_from): the seen-key set taken at P
partitions re-buckets to a different P and the resumed run emits
exactly the rows an uninterrupted single-P run emits."""

import glob

import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ksql_ray.fixtures import materialize_fixture_dir
from ksql_ray.streaming.dedup import StreamingDedupJob


@pytest.fixture(scope="module")
def stream_files(tmp_path_factory):
    base = tmp_path_factory.mktemp("rsd_fix")
    paths = materialize_fixture_dir(str(base), n_turns=2500, seed=11,
                                    n_files=6)
    return sorted(glob.glob(paths["transcripts"] + "/*.parquet"))


def _rows(job) -> set:
    t = job.result()
    return set(zip(t.column("conv_id").to_pylist(),
                   t.column("turn_idx").to_pylist()))


@pytest.mark.parametrize("old_p,new_p", [(3, 6), (6, 2)])
def test_dedup_reshard_matches_single_run(stream_files, tmp_path,
                                          old_p, new_p):
    tag = f"{old_p}to{new_p}"
    out = str(tmp_path / f"out_{tag}")
    ck_old = str(tmp_path / f"cko_{tag}")
    ck_new = str(tmp_path / f"ckn_{tag}")
    job = StreamingDedupJob(out, num_partitions=old_p,
                            checkpoint_dir=ck_old, checkpoint_every=1)
    job.run(stream_files[:3], files_per_epoch=1)
    # job "dies" mid-stream; rescale the checkpoint and resume
    job2 = StreamingDedupJob(out, num_partitions=new_p,
                             checkpoint_dir=ck_new, checkpoint_every=1)
    info = job2.reshard_from(ck_old)
    assert info["old_partitions"] == old_p
    assert info["new_partitions"] == new_p
    assert info["keys"] == job2._restored_keys > 0
    job2.run(stream_files, files_per_epoch=1)
    m = job2.finish()
    assert m["rows_in"] > 0  # replayed epochs skipped, tail processed

    ref = StreamingDedupJob(str(tmp_path / f"ref_{tag}"),
                            num_partitions=new_p)
    ref.run(stream_files, files_per_epoch=1)
    ref.finish()
    assert _rows(job2) == _rows(ref)
