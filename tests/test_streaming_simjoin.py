"""Streaming similarity join vs a static reference
(streaming/simjoin.py): parity with the bounded similarity_join,
epoch-split invariance, idempotent replay + manifest resume, and
ref_cap accounting. The sf0.01 DuckDB oracle runs via the
streaming_simjoin gate in test_driver_contract.py."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq
import pytest
import ray

from ksql_ray.streaming.simjoin import StreamingSimJoinJob

WORDS = np.array(["alpha", "bravo", "charlie", "delta", "echo",
                  "foxtrot", "golf", "hotel", "india", "juliet"],
                 dtype=object)


def _mk_docs(rng, n, id0=0, mutate_of=None):
    texts, ids = [], []
    for i in range(n):
        if mutate_of is not None and i < len(mutate_of):
            toks = mutate_of[i].split()
            j = int(rng.integers(0, len(toks)))
            toks[j] = str(WORDS[rng.integers(0, len(WORDS))])
            texts.append(" ".join(toks))
        else:
            k = int(rng.integers(8, 16))
            texts.append(" ".join(WORDS[rng.integers(0, len(WORDS), k)]))
        ids.append(id0 + i)
    return pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                     "text": pa.array(texts, type=pa.string())})


@pytest.fixture(scope="module")
def corpus(tmp_path_factory):
    root = str(tmp_path_factory.mktemp("simjoin"))
    rng = np.random.default_rng(17)
    ref = _mk_docs(rng, 40, id0=1000)
    ref_texts = ref.column("text").to_pylist()
    # stream: 80 docs, the first 30 are 1-token mutations of ref docs
    stream = _mk_docs(rng, 80, id0=0, mutate_of=ref_texts[:30])
    rp = os.path.join(root, "ref.parquet")
    pq.write_table(ref, rp)
    files = []
    for i in range(8):
        s = stream.slice(i * 10, 10)
        p = os.path.join(root, f"s{i:02d}.parquet")
        pq.write_table(s, p)
        files.append(p)
    return {"root": root, "ref_path": rp, "ref": ref, "stream": stream,
            "files": files}


def _run(corpus, sink, threshold=0.6, files_per_epoch=4, resume=False,
         **kw):
    job = StreamingSimJoinJob(sink, corpus["ref_path"],
                              threshold=threshold, num_partitions=2,
                              resume=resume, **kw)
    job.run(corpus["files"], files_per_epoch=files_per_epoch)
    return job


def test_simjoin_matches_bounded(ray_session, corpus, tmp_path):
    from ksql_ray.ops.dedup import similarity_join

    job = _run(corpus, str(tmp_path / "s1"))
    got = job.result()
    bounded = similarity_join(
        ray.data.from_arrow(corpus["stream"]),
        ray.data.from_arrow(corpus["ref"]), threshold=0.6)
    bt = pa.Table.from_pylist(bounded.take_all())
    want = sorted(zip(bt.column("left_id").to_pylist(),
                      bt.column("right_id").to_pylist(),
                      bt.column("jaccard").to_pylist()))
    have = sorted(zip(got.column("stream_id").to_pylist(),
                      got.column("ref_id").to_pylist(),
                      got.column("jaccard").to_pylist()))
    assert have == want
    assert len(have) >= 10  # the planted mutations actually match
    m = job.finish()
    assert m["rows_in"] == 80
    assert m["matches_out"] == len(have)


def test_simjoin_epoch_split_invariance(ray_session, corpus, tmp_path):
    a = _run(corpus, str(tmp_path / "a"), files_per_epoch=2).result()
    b = _run(corpus, str(tmp_path / "b"), files_per_epoch=8).result()
    assert a.equals(b)


def test_simjoin_idempotent_and_resume(ray_session, corpus, tmp_path):
    sink = str(tmp_path / "s2")
    first = _run(corpus, sink).result()
    again = _run(corpus, sink).result()          # replay: same files
    assert again.equals(first)
    j3 = _run(corpus, sink, resume=True)          # manifest resume
    m = j3.finish()
    assert m["rows_in"] == 0
    assert j3.result().equals(first)


def test_simjoin_ref_cap_counted(ray_session, tmp_path):
    # 40 identical reference docs: every probe key explodes past
    # ref_cap=4 and the truncation must be counted, never silent
    txt = "alpha bravo charlie delta echo foxtrot golf hotel"
    ref = pa.table({"doc_id": pa.array(list(range(100, 140)),
                                       type=pa.int64()),
                    "text": pa.array([txt] * 40)})
    rp = str(tmp_path / "ref.parquet")
    pq.write_table(ref, rp)
    sp = str(tmp_path / "s.parquet")
    pq.write_table(pa.table({"doc_id": pa.array([0], type=pa.int64()),
                             "text": pa.array([txt])}), sp)
    job = StreamingSimJoinJob(str(tmp_path / "sink"), rp,
                              threshold=0.9, num_partitions=2,
                              ref_cap=4)
    job.run([sp], files_per_epoch=1)
    m = job.finish()
    assert m["capped"] > 0
    # capped matching still links the doc to the cap's worth of refs
    assert 1 <= job.result().num_rows <= 4 * 16


def test_simjoin_pair_dedup(ray_session, tmp_path):
    # identical docs collide in EVERY band; the emitted pair must
    # appear exactly once
    txt = "one two three four five six seven eight nine ten"
    rp = str(tmp_path / "r.parquet")
    pq.write_table(pa.table({"doc_id": pa.array([7], type=pa.int64()),
                             "text": pa.array([txt])}), rp)
    sp = str(tmp_path / "s.parquet")
    pq.write_table(pa.table({"doc_id": pa.array([1], type=pa.int64()),
                             "text": pa.array([txt])}), sp)
    job = StreamingSimJoinJob(str(tmp_path / "sink"), rp,
                              threshold=0.5, num_partitions=3)
    job.run([sp], files_per_epoch=1)
    out = job.result()
    assert out.to_pydict() == {"stream_id": [1], "ref_id": [7],
                               "jaccard": [1.0]}


def test_simjoin_decontam_filter(ray_session, corpus, tmp_path):
    # clean_dir mode: the surviving stream is exactly (all stream rows)
    # minus (rows whose id appears in the pair output)
    job = StreamingSimJoinJob(str(tmp_path / "pairs"),
                              corpus["ref_path"], threshold=0.6,
                              num_partitions=2,
                              clean_dir=str(tmp_path / "clean"))
    job.run(corpus["files"], files_per_epoch=4)
    m = job.finish()
    pairs = job.result()
    clean = job.clean_result()
    matched = set(pairs.column("stream_id").to_pylist())
    all_ids = set(corpus["stream"].column("doc_id").to_pylist())
    assert set(clean.column("doc_id").to_pylist()) == all_ids - matched
    assert m["rows_clean"] == len(all_ids - matched)
    # clean rows keep the full schema
    assert set(clean.column_names) == {"doc_id", "text"}
    # idempotent replay into both sinks
    job2 = StreamingSimJoinJob(str(tmp_path / "pairs"),
                               corpus["ref_path"], threshold=0.6,
                               num_partitions=2,
                               clean_dir=str(tmp_path / "clean"))
    job2.run(corpus["files"], files_per_epoch=4)
    assert job2.clean_result().equals(clean)
    # resume skips everything
    job3 = StreamingSimJoinJob(str(tmp_path / "pairs"),
                               corpus["ref_path"], threshold=0.6,
                               num_partitions=2,
                               clean_dir=str(tmp_path / "clean"),
                               resume=True)
    job3.run(corpus["files"], files_per_epoch=4)
    assert job3.finish()["rows_in"] == 0
    assert job3.clean_result().equals(clean)


def test_simjoin_empty_and_missing_token_files(ray_session, tmp_path):
    # zero-row files and all-short-doc files must flow through probe,
    # verify and the clean writer without errors
    rp = str(tmp_path / "r.parquet")
    pq.write_table(pa.table({"doc_id": pa.array([7], pa.int64()),
                             "text": ["one two three four five"]}), rp)
    f_empty = str(tmp_path / "e.parquet")
    pq.write_table(pa.table({"doc_id": pa.array([], pa.int64()),
                             "text": pa.array([], pa.string())}),
                   f_empty)
    f_short = str(tmp_path / "s.parquet")
    pq.write_table(pa.table({"doc_id": pa.array([1, 2], pa.int64()),
                             "text": ["hi", ""]}), f_short)
    f_hit = str(tmp_path / "h.parquet")
    pq.write_table(pa.table({"doc_id": pa.array([3], pa.int64()),
                             "text": ["one two three four five"]}),
                   f_hit)
    job = StreamingSimJoinJob(str(tmp_path / "pairs"), rp,
                              threshold=0.5, num_partitions=2,
                              clean_dir=str(tmp_path / "clean"))
    job.run([f_empty, f_short, f_hit], files_per_epoch=2)
    m = job.finish()
    assert m["matches_out"] == 1
    clean = job.clean_result()
    # doc 3 matched and is dropped; 1 and 2 survive
    assert clean.column("doc_id").to_pylist() == [1, 2]
