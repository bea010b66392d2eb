"""Streaming uniform sample (streaming/sample.py): bounded-equivalence,
replay/duplicate insensitivity, checkpoint/resume, and rescale."""

import hashlib
import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ksql_ray.streaming.sample import StreamingSampleJob, _bottom_k


def _h(key: str) -> int:
    return int(hashlib.md5(key.encode()).hexdigest()[:8], 16)


def _files(tmp_path, keys_per_file):
    files = []
    for i, keys in enumerate(keys_per_file):
        p = str(tmp_path / f"b{i:02d}.parquet")
        pq.write_table(pa.table({"k": pa.array(keys, pa.int64())}), p)
        files.append(p)
    return files


def _expect(all_keys, k):
    rows = sorted({(_h(str(x)), str(x)) for x in all_keys})[:k]
    return [key for _, key in rows]


def test_matches_bounded_cut(ray_session, tmp_path):
    rng = np.random.default_rng(7)
    per_file = [rng.integers(0, 5000, 300).tolist() for _ in range(6)]
    files = _files(tmp_path, per_file)
    job = StreamingSampleJob(key_col="k", k=25, num_partitions=3)
    job.run(files, files_per_epoch=2)
    got = job.sample()
    allk = [x for f in per_file for x in f]
    assert got.column("key").to_pylist() == _expect(allk, 25)
    assert job.finish()["rows_in"] == sum(len(f) for f in per_file)


def test_duplicate_and_replay_insensitive(ray_session, tmp_path):
    keys = list(range(200))
    files = _files(tmp_path, [keys, keys, keys[:50]])
    job = StreamingSampleJob(key_col="k", k=10, num_partitions=2)
    job.run(files, files_per_epoch=1)
    first = job.sample()
    # replay the whole stream again into the same actors
    job.run(files, files_per_epoch=1)
    assert job.sample().equals(first)
    assert first.column("key").to_pylist() == _expect(keys, 10)


def test_checkpoint_resume(ray_session, tmp_path):
    rng = np.random.default_rng(3)
    per_file = [rng.integers(0, 9999, 250).tolist() for _ in range(4)]
    files = _files(tmp_path, per_file)
    ck = str(tmp_path / "ck")
    job = StreamingSampleJob(key_col="k", k=15, num_partitions=2,
                             checkpoint_dir=ck, checkpoint_every=1)
    job.run(files, files_per_epoch=2)
    want = job.sample()
    # fresh job resumes from the cursor: replays report rows_in=0
    job2 = StreamingSampleJob(key_col="k", k=15, num_partitions=2,
                              checkpoint_dir=ck, resume=True)
    job2.run(files, files_per_epoch=2)
    assert all(m["rows_in"] == 0 for m in job2.metrics)
    assert job2.sample().equals(want)


def test_reshard_to_more_partitions(ray_session, tmp_path):
    rng = np.random.default_rng(11)
    per_file = [rng.integers(0, 7777, 200).tolist() for _ in range(4)]
    files = _files(tmp_path, per_file)
    old_ck = str(tmp_path / "old")
    job = StreamingSampleJob(key_col="k", k=12, num_partitions=2,
                             checkpoint_dir=old_ck, checkpoint_every=1)
    job.run(files[:2], files_per_epoch=1)
    half_sample = job.sample()

    new_ck = str(tmp_path / "new")
    job2 = StreamingSampleJob(key_col="k", k=12, num_partitions=8,
                              checkpoint_dir=new_ck)
    info = job2.reshard_from(old_ck)
    assert info["old_partitions"] == 2 and info["new_partitions"] == 8
    assert job2.sample().equals(half_sample)
    job2.run(files, files_per_epoch=1)   # first 2 epochs replay-skip
    assert [m.get("rows_in") for m in job2.metrics][:2] == [0, 0]

    # the resharded continuation equals a single straight-through run
    ref = StreamingSampleJob(key_col="k", k=12, num_partitions=4)
    ref.run(files, files_per_epoch=1)
    assert job2.sample().equals(ref.sample())


def test_bottom_k_tie_handling():
    t = pa.table({"key": pa.array(["b", "a", "c", "d"]),
                  "h": pa.array([5, 5, 5, 1], pa.int64())})
    got = _bottom_k(t, 2)
    assert got.column("key").to_pylist() == ["d", "a"]
    assert _bottom_k(t.slice(0, 0), 3).num_rows == 0


def test_validation(ray_session):
    with pytest.raises(ValueError, match="k must"):
        StreamingSampleJob(key_col="k", k=0)
    with pytest.raises(ValueError, match="method"):
        StreamingSampleJob(key_col="k", k=1, method="sha")
