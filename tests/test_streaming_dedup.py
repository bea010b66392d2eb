"""Streaming exact-dedup tests: first-occurrence semantics vs a DuckDB
ROW_NUMBER oracle, cross-epoch state, intra-epoch ordering, null/
normalization key rules, replay idempotence, md5 vs fast equivalence."""

import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from conftest import SF_DIR
from ksql_ray.streaming.dedup import StreamingDedupJob


def _corpus() -> pa.Table:
    """documents + a replayed copy of every 7th doc (planted exact dups,
    appended AFTER the originals in arrival order)."""
    docs = pq.read_table(f"{SF_DIR}/documents.parquet")
    import pyarrow.compute as pc

    dups = docs.filter(
        pc.equal(pc.subtract(docs.column("doc_id"),
                             pc.multiply(pc.divide(docs.column("doc_id"), 7),
                                         7)), 0))
    dups = dups.set_column(
        dups.schema.get_field_index("doc_id"), "doc_id",
        pc.add(dups.column("doc_id"), 1_000_000))
    return pa.concat_tables([docs, dups])


def _run(tbl: pa.Table, n_files=6, files_per_epoch=2, method="md5",
         out_dir=None, **kw) -> pa.Table:
    fdir = tempfile.mkdtemp(prefix="ksql_dedup_in_")
    own_out = out_dir is None
    out = out_dir or tempfile.mkdtemp(prefix="ksql_dedup_out_")
    try:
        n = tbl.num_rows
        files = []
        for i in range(n_files):
            s = tbl.slice(i * n // n_files, (i + 1) * n // n_files - i * n // n_files)
            p = os.path.join(fdir, f"f{i:02d}.parquet")
            pq.write_table(s, p)
            files.append(p)
        job = StreamingDedupJob(out, method=method, **kw)
        job.run(files, files_per_epoch=files_per_epoch)
        m = job.finish()
        assert m["rows_in"] == n
        return job.result()
    finally:
        shutil.rmtree(fdir, ignore_errors=True)
        if own_out:
            shutil.rmtree(out, ignore_errors=True)


def test_matches_rownumber_oracle(ray_session, duck):
    tbl = _corpus()
    duck.register("dedup_corpus", tbl.to_pandas())
    exp = duck.execute(r"""
        SELECT doc_id FROM (
          SELECT doc_id, ROW_NUMBER() OVER (
            PARTITION BY md5(trim(regexp_replace(lower(text), '\s+', ' ', 'g')))
            ORDER BY doc_id) AS rn
          FROM dedup_corpus) WHERE rn = 1""").df()
    got = _run(tbl)
    assert sorted(got.column("doc_id").to_pylist()) == sorted(exp.doc_id)
    # all planted replays dropped, originals kept
    assert got.num_rows == pq.read_table(f"{SF_DIR}/documents.parquet").num_rows
    # fast fingerprints agree on this corpus
    got_fast = _run(tbl, method="fast")
    assert sorted(got_fast.column("doc_id").to_pylist()) == sorted(exp.doc_id)


def test_first_occurrence_order_and_state(ray_session):
    # same text appears in epochs 0 (twice, different files) and 2:
    # only the (file 0, row 1) copy survives
    rows = pa.table({
        "doc_id": pa.array([0, 1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array(["a b", "same  TEXT", "Same text", "c",
                          "same text", "d"]),
    })
    got = _run(rows, n_files=6, files_per_epoch=2)
    # normalization: "same  TEXT" / "Same text" / "same text" are ONE key
    assert sorted(got.column("doc_id").to_pylist()) == [0, 1, 3, 5]


def test_null_texts_share_one_key(ray_session):
    rows = pa.table({
        "doc_id": pa.array([0, 1, 2, 3], pa.int64()),
        "text": pa.array([None, "x", None, None], pa.string()),
    })
    got = _run(rows, n_files=2, files_per_epoch=1)
    assert sorted(got.column("doc_id").to_pylist()) == [0, 1]


def test_replay_idempotent(ray_session):
    tbl = _corpus()
    out = tempfile.mkdtemp(prefix="ksql_dedup_replay_")
    try:
        first = _run(tbl, out_dir=out)
        again = _run(tbl, out_dir=out)  # fresh job, same sink
        assert first.num_rows == again.num_rows
        assert sorted(first.column("doc_id").to_pylist()) == \
            sorted(again.column("doc_id").to_pylist())
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_checkpoint_kill_and_resume(ray_session):
    tbl = _corpus()
    n = tbl.num_rows
    fdir = tempfile.mkdtemp(prefix="ksql_dedup_ck_in_")
    out = tempfile.mkdtemp(prefix="ksql_dedup_ck_out_")
    ck = tempfile.mkdtemp(prefix="ksql_dedup_ck_state_")
    try:
        files = []
        for i in range(8):
            s = tbl.slice(i * n // 8, (i + 1) * n // 8 - i * n // 8)
            p = os.path.join(fdir, f"f{i}.parquet")
            pq.write_table(s, p)
            files.append(p)
        # straight run for the expected answer (separate sink)
        ref_out = tempfile.mkdtemp(prefix="ksql_dedup_ck_ref_")
        ref = StreamingDedupJob(ref_out, num_partitions=4)
        ref.run(files, files_per_epoch=2)
        expected = sorted(ref.result().column("doc_id").to_pylist())
        shutil.rmtree(ref_out, ignore_errors=True)
        # "killed" run: first 2 of 4 epochs, checkpointing every epoch
        job = StreamingDedupJob(out, num_partitions=4, checkpoint_dir=ck,
                                checkpoint_every=1)
        job.run(files[:4], files_per_epoch=2)
        # resumed run re-feeds the FULL stream; committed epochs replay
        # with rows_in 0 and the state picks up where the cursor left off
        job2 = StreamingDedupJob(out, num_partitions=4, checkpoint_dir=ck,
                                 checkpoint_every=1, resume=True)
        job2.run(files, files_per_epoch=2)
        m = job2.finish()
        assert [x["rows_in"] for x in job2.metrics[:2]] == [0, 0]
        got = sorted(job2.result().column("doc_id").to_pylist())
        assert got == expected
        assert m["state_keys"] == len(expected)
    finally:
        for d in (fdir, out, ck):
            shutil.rmtree(d, ignore_errors=True)


def test_run_compaction(ray_session):
    # >12 epochs forces at least one LSM compaction; dedup still exact
    rng = np.random.default_rng(5)
    texts = [f"doc {i}" for i in range(300)] + \
        [f"doc {i}" for i in rng.integers(0, 300, 300)]
    tbl = pa.table({"doc_id": pa.array(range(600), pa.int64()),
                    "text": pa.array([texts[i] for i in range(600)])})
    got = _run(tbl, n_files=30, files_per_epoch=1, num_partitions=2)
    kept = got.column("doc_id").to_pylist()
    assert len(kept) == 300 and max(kept) < 300


def test_streaming_dedup_pre_transform_prep(ray_session, tmp_path):
    # prep-on-ingest: normalize folds case/whitespace variants onto one
    # fingerprint, quality filter drops repetitive junk, all in the
    # prep task before fingerprinting
    from ksql_ray.pipelines.prep import prep_batch

    rows = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": [
            "the quick brown fox jumps over the lazy dog today",
            "  THE   QUICK brown fox JUMPS over the lazy dog today ",
            "spam spam spam spam spam spam spam spam spam spam",
            "a completely different sentence about engines and state",
            None,
        ],
    })
    f = os.path.join(str(tmp_path), "in.parquet")
    pq.write_table(rows, f)
    job = StreamingDedupJob(str(tmp_path / "out"), method="md5",
                            num_partitions=2,
                            columns=["doc_id", "text"],
                            pre_transform=prep_batch)
    job.run([f], files_per_epoch=1)
    m = job.finish()
    out = job.result()
    got = sorted(out.column("doc_id").to_pylist())
    # 2 normalizes onto 1 (dropped as dup); 3 fails dup_word_frac;
    # 5 (NULL -> '' -> mean_word_len 0) fails quality
    assert got == [1, 4]
    # text is stored in normalized form
    texts = dict(zip(out.column("doc_id").to_pylist(),
                     out.column("text").to_pylist()))
    assert texts[1] == "the quick brown fox jumps over the lazy dog today"
    assert m["rows_in"] == 3  # post-filter rows reach the state actors
