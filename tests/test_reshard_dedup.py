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


def _neardup_rows(job) -> set:
    t = job.result()
    if "doc_id" in t.column_names:
        return set(t.column("doc_id").to_pylist())
    return set(zip(t.column("conv_id").to_pylist(),
                   t.column("turn_idx").to_pylist()))


@pytest.mark.parametrize("old_p,new_p", [(3, 6), (6, 2)])
def test_neardup_reshard_matches_single_run(stream_files, tmp_path,
                                            old_p, new_p):
    from ksql_ray.streaming.neardup import StreamingNearDupJob

    def mk(out, p, ck=None):
        return StreamingNearDupJob(
            out, num_partitions=p, tau=0.8,
            checkpoint_dir=ck, checkpoint_every=1)

    tag = f"nd_{old_p}to{new_p}"
    out = str(tmp_path / f"out_{tag}")
    job = mk(out, old_p, str(tmp_path / f"cko_{tag}"))
    job.run(stream_files[:3], files_per_epoch=1)
    job2 = mk(out, new_p, str(tmp_path / f"ckn_{tag}"))
    info = job2.reshard_from(str(tmp_path / f"cko_{tag}"))
    assert (info["old_partitions"], info["new_partitions"]) == (old_p, new_p)
    assert info["records"] == job2._restored_records > 0
    job2.run(stream_files, files_per_epoch=1)
    job2.finish()

    ref = mk(str(tmp_path / f"ref_{tag}"), new_p)
    ref.run(stream_files, files_per_epoch=1)
    ref.finish()
    assert _neardup_rows(job2) == _neardup_rows(ref)


def test_embdedup_reshard_matches_single_run(tmp_path):
    import numpy as np
    import ray

    from ksql_ray.streaming.neardup import StreamingEmbeddingDedupJob

    rng = np.random.default_rng(3)
    base = rng.standard_normal((40, 16)).astype(np.float32)
    rows = []
    for i in range(160):
        v = base[i % 40] + (0.001 if i >= 40 else 0) * rng.standard_normal(
            16).astype(np.float32)
        rows.append({"doc_id": i, "embedding": v.tolist()})
    files = []
    for j in range(4):
        t = pa.table({
            "doc_id": pa.array([r["doc_id"] for r in rows[j*40:(j+1)*40]],
                               type=pa.int64()),
            "embedding": pa.array([r["embedding"] for r in
                                   rows[j*40:(j+1)*40]],
                                  type=pa.list_(pa.float32(), 16)),
        })
        p = str(tmp_path / f"emb{j}.parquet")
        pq.write_table(t, p)
        files.append(p)

    def mk(out, p, ck=None):
        return StreamingEmbeddingDedupJob(
            out, dim=16, num_partitions=p, threshold=0.95,
            checkpoint_dir=ck, checkpoint_every=1)

    job = mk(str(tmp_path / "eout"), 2, str(tmp_path / "ecko"))
    job.run(files[:2], files_per_epoch=1)
    job2 = mk(str(tmp_path / "eout"), 5, str(tmp_path / "eckn"))
    info = job2.reshard_from(str(tmp_path / "ecko"))
    assert info["new_partitions"] == 5
    job2.run(files, files_per_epoch=1)
    job2.finish()
    ref = mk(str(tmp_path / "eref"), 5)
    ref.run(files, files_per_epoch=1)
    ref.finish()
    assert _neardup_rows(job2) == _neardup_rows(ref)


def test_dedup_chained_rescale(stream_files, tmp_path):
    """Rescale twice (3 -> 6 -> 2) mid-stream; the final output still
    equals an uninterrupted run."""
    out = str(tmp_path / "out_chain")
    ck = [str(tmp_path / f"ck_{i}") for i in range(3)]
    j1 = StreamingDedupJob(out, num_partitions=3,
                           checkpoint_dir=ck[0], checkpoint_every=1)
    j1.run(stream_files[:2], files_per_epoch=1)
    j2 = StreamingDedupJob(out, num_partitions=6,
                           checkpoint_dir=ck[1], checkpoint_every=1)
    j2.reshard_from(ck[0])
    j2.run(stream_files[:4], files_per_epoch=1)
    j3 = StreamingDedupJob(out, num_partitions=2,
                           checkpoint_dir=ck[2], checkpoint_every=1)
    info = j3.reshard_from(ck[1])
    assert info["epoch"] == 3
    j3.run(stream_files, files_per_epoch=1)
    j3.finish()

    ref = StreamingDedupJob(str(tmp_path / "ref_chain"),
                            num_partitions=4)
    ref.run(stream_files, files_per_epoch=1)
    ref.finish()
    assert _rows(j3) == _rows(ref)
