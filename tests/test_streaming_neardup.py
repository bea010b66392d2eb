"""Streaming MinHash-LSH near-dup tests: parity with the sequential
greedy first-occurrence definition (same LSH rule), epoch/partition
invariance, cross-epoch state, chain-aware resolution, capped-bucket
accounting, replay idempotence."""

import os
import shutil
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray

from ksql_ray.ops.dedup import _minhash_signatures, _word_ngram_hashes
from ksql_ray.streaming.neardup import StreamingNearDupJob, _resolve

NGRAM, L, BANDS, TAU, SEED = 3, 64, 16, 0.7, 42


def _lsh(texts):
    """The job's exact signature/band-key computation, in-process."""
    arr = pa.array([t for t in texts], type=pa.string())
    flat, offsets = _word_ngram_hashes(arr, NGRAM)
    sig = (_minhash_signatures(flat, offsets, L, SEED)
           & np.uint64(0xFFFFFFFF)).astype(np.uint32)
    n = len(texts)
    r = L // BANDS
    bs = sig.reshape(n, BANDS, r).astype(np.uint64)
    bucket = np.zeros((n, BANDS), np.uint64)
    for j in range(r):
        bucket = bucket * np.uint64(0x100000001B3) + bs[:, :, j]
    keys = (np.arange(BANDS, dtype=np.uint64)
            * np.uint64(0x9E3779B97F4A7C15)) ^ bucket
    return sig, keys


def _ref_greedy(texts) -> set:
    """Sequential definition: doc i dropped iff near some already-KEPT
    earlier doc (shares a band bucket AND lane agreement >= tau)."""
    sig, keys = _lsh(texts)
    kept: list[int] = []
    for i in range(len(texts)):
        drop = any(
            (keys[i] == keys[k]).any()
            and (sig[i] == sig[k]).mean() >= TAU
            for k in kept)
        if not drop:
            kept.append(i)
    return set(kept)


def _make_corpus(seed=7, n_base=110, n_dups=25):
    rng = np.random.default_rng(seed)
    vocab = np.array([f"w{i:03d}" for i in range(400)])
    docs = [" ".join(rng.choice(vocab, size=30)) for _ in range(n_base)]
    # planted near-dups: 1-2 words perturbed, appended after originals
    for _ in range(n_dups):
        words = docs[int(rng.integers(0, n_base))].split()
        for _ in range(int(rng.integers(1, 3))):
            words[int(rng.integers(0, len(words)))] = str(rng.choice(vocab))
        docs.append(" ".join(words))
    # corner rows: nulls, blanks, short docs (whole-doc gram path)
    docs += [None, "", "   ", "one two", "one two", "solo"]
    return docs


def _run(docs, n_files=6, files_per_epoch=2, out_dir=None, **kw):
    fdir = tempfile.mkdtemp(prefix="ksql_ndup_in_")
    own_out = out_dir is None
    out = out_dir or tempfile.mkdtemp(prefix="ksql_ndup_out_")
    tbl = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                    "text": pa.array(docs, pa.string())})
    try:
        n = tbl.num_rows
        files = []
        for i in range(n_files):
            s = tbl.slice(i * n // n_files,
                          (i + 1) * n // n_files - i * n // n_files)
            p = os.path.join(fdir, f"f{i:02d}.parquet")
            pq.write_table(s, p)
            files.append(p)
        kw.setdefault("ngram", NGRAM)
        kw.setdefault("num_hashes", L)
        kw.setdefault("bands", BANDS)
        kw.setdefault("tau", TAU)
        kw.setdefault("seed", SEED)
        kw.setdefault("star_cap", 1024)
        kw.setdefault("num_partitions", 3)
        job = StreamingNearDupJob(out, **kw)
        job.run(files, files_per_epoch=files_per_epoch)
        m = job.finish()
        assert m["rows_in"] == n
        res = job.result()
        return res, m
    finally:
        shutil.rmtree(fdir, ignore_errors=True)
        if own_out:
            shutil.rmtree(out, ignore_errors=True)


def _kept_ids(res: pa.Table) -> set:
    return set(res.column("doc_id").to_pylist())


def test_matches_sequential_greedy(ray_session):
    docs = _make_corpus()
    res, m = _run(docs)
    expect = _ref_greedy(docs)
    assert _kept_ids(res) == expect
    assert m["rows_out"] == len(expect)
    assert m["rows_out"] < m["rows_in"]  # the planted dups were dropped
    assert m["state_records"] > 0


def test_epoch_and_partition_invariance(ray_session):
    """The greedy rule is over the total arrival order, so epoch
    chunking and partition count must not change the kept set."""
    docs = _make_corpus(seed=11)
    base, _ = _run(docs, files_per_epoch=1, num_partitions=1)
    for fpe, p in ((2, 3), (6, 4)):
        res, _ = _run(docs, files_per_epoch=fpe, num_partitions=p)
        assert _kept_ids(res) == _kept_ids(base)


def test_cross_epoch_state(ray_session):
    """An exact copy arriving epochs later is dropped by actor state."""
    rng = np.random.default_rng(3)
    vocab = np.array([f"v{i}" for i in range(300)])
    docs = [" ".join(rng.choice(vocab, size=25)) for _ in range(60)]
    docs += docs[:10]  # replays of epoch-0 docs in the final file
    res, _ = _run(docs, n_files=7, files_per_epoch=1)
    assert _kept_ids(res) == set(range(60))


def test_resolve_chain_aware(ray_session):
    """Drop iff near an already-KEPT doc: B dropped via A, C (near only
    B) survives; a doc condemned by state frees its later pair-mate."""
    def mk(ords, dup, pairs):
        return {"ords": np.array(ords, np.int64),
                "dup": np.array(dup, bool),
                "pairs": np.array(pairs, np.int64).reshape(-1, 2),
                "capped": 0}

    kept = ray.get(_resolve.remote(
        mk([1, 2, 3], [False, False, False], [(1, 2), (2, 3)])))
    assert kept.tolist() == [1, 3]
    kept = ray.get(_resolve.remote(
        mk([1, 2], [True, False], [(1, 2)])))
    assert kept.tolist() == [2]
    # verdicts and pairs split across actors still merge correctly
    kept = ray.get(_resolve.remote(
        mk([1, 3], [False, False], [(1, 3)]),
        mk([2, 3], [False, False], [(2, 3)])))
    assert kept.tolist() == [1, 2]


def test_star_cap_counted_never_silent(ray_session):
    """A tiny cap on a hot bucket must surface in the metrics."""
    docs = ["same text repeated here for everyone"] * 12 + ["other words"]
    res, m = _run(docs, n_files=1, star_cap=2, num_partitions=2)
    assert m["capped"] > 0
    assert 0 in _kept_ids(res)  # first occurrence always survives


def test_checkpoint_resume_matches_single_run(ray_session, tmp_path):
    """Kill-and-resume: job1 processes a prefix with incremental
    checkpoints; job2 resumes and re-feeds the whole stream (prefix
    epochs skipped, index restored) — the combined sink must equal a
    single uninterrupted run."""
    docs = _make_corpus(seed=13)
    tbl = pa.table({"doc_id": pa.array(range(len(docs)), pa.int64()),
                    "text": pa.array(docs, pa.string())})
    files = []
    n = tbl.num_rows
    for i in range(6):
        p = str(tmp_path / f"f{i:02d}.parquet")
        pq.write_table(tbl.slice(i * n // 6, (i + 1) * n // 6 - i * n // 6), p)
        files.append(p)
    cfg = dict(ngram=NGRAM, num_hashes=L, bands=BANDS, tau=TAU, seed=SEED,
               star_cap=1024, num_partitions=3)
    out, ckpt = str(tmp_path / "out"), str(tmp_path / "ckpt")
    job1 = StreamingNearDupJob(out, checkpoint_dir=ckpt,
                               checkpoint_every=1, **cfg)
    job1.run(files[:4], files_per_epoch=2)  # epochs 0-1, then "crash"
    pre = job1.finish()
    job2 = StreamingNearDupJob(out, checkpoint_dir=ckpt, checkpoint_every=1,
                               resume=True, **cfg)
    job2.run(files, files_per_epoch=2)  # re-feed from the start
    m = job2.finish()
    assert m["rows_in"] == n - pre["rows_in"]  # prefix epochs skipped
    fresh = str(tmp_path / "fresh")
    job3 = StreamingNearDupJob(fresh, **cfg)
    job3.run(files, files_per_epoch=2)
    assert _kept_ids(job2.result()) == _kept_ids(job3.result())
    assert m["state_records"] == job3.finish()["state_records"]


def test_replay_is_idempotent(ray_session):
    docs = _make_corpus(seed=5, n_base=40, n_dups=8)
    out = tempfile.mkdtemp(prefix="ksql_ndup_replay_")
    try:
        first, _ = _run(docs, out_dir=out)
        again, _ = _run(docs, out_dir=out)  # committed epochs skipped
        assert _kept_ids(again) == _kept_ids(first)
        assert again.num_rows == first.num_rows
    finally:
        shutil.rmtree(out, ignore_errors=True)
