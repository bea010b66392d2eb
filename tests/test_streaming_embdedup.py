"""StreamingEmbeddingDedupJob: parity with the sequential greedy
first-occurrence definition under the same LSH probe rule, chain
awareness, epoch invariance, checkpoint/resume, replay idempotence."""

import os
import tempfile

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

from ksql_ray.streaming.neardup import StreamingEmbeddingDedupJob

DIM, PLANES, TABLES, THR, SEED = 16, 4, 16, 0.9, 42


def _norm(m):
    return m / np.linalg.norm(m, axis=1, keepdims=True)


def _buckets(norm):
    rng = np.random.default_rng(SEED)
    planes = rng.standard_normal((norm.shape[1], TABLES * PLANES))
    signs = (norm.astype(np.float32) @ planes > 0).astype(np.uint64)
    signs = signs.reshape(len(norm), TABLES, PLANES)
    shifts = np.arange(PLANES, dtype=np.uint64)
    return (signs << shifts).sum(axis=2, dtype=np.uint64)


def _ref_greedy(mat) -> set:
    """Sequential definition: vector i dropped iff cosine >= THR to an
    already-KEPT earlier vector sharing >= 1 table bucket."""
    norm32 = _norm(mat.astype(np.float64)).astype(np.float32)
    buckets = _buckets(norm32)
    kept: list[int] = []
    dropped = set()
    for i in range(len(mat)):
        hit = False
        for j in kept:
            if (buckets[i] == buckets[j]).any():
                cos = float(norm32[i].astype(np.float64) @ norm32[j])
                if cos >= THR:
                    hit = True
                    break
        if hit:
            dropped.add(i)
        else:
            kept.append(i)
    return dropped


def _mk(mat):
    return pa.table({
        "vec_id": pa.array(np.arange(len(mat)), pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in mat],
                              pa.list_(pa.float32())),
    })


def _corpus(n=240, seed=3):
    rng = np.random.default_rng(seed)
    mat = rng.normal(size=(n, DIM)).astype(np.float32)
    # plant near-dup CHAINS: i ~ i+40 ~ i+80 for i in 0..20 — copies
    # with noise small enough that adjacent links clear THR
    for i in range(20):
        mat[i + 40] = mat[i] + rng.normal(scale=0.05, size=DIM).astype(np.float32)
        mat[i + 80] = mat[i + 40] + rng.normal(scale=0.05, size=DIM).astype(np.float32)
    return mat


def _run(mat, files_per_epoch=2, n_files=8, partitions=4, **kw):
    tbl = _mk(mat)
    n = tbl.num_rows
    out = tempfile.mkdtemp(prefix="sed_out_")
    job = StreamingEmbeddingDedupJob(out, dim=DIM, threshold=THR,
                                     n_planes=PLANES, n_tables=TABLES,
                                     seed=SEED, num_partitions=partitions,
                                     **kw)
    chunks = [tbl.slice(i * n // n_files,
                        (i + 1) * n // n_files - i * n // n_files)
              for i in range(n_files)]
    job.run(chunks, files_per_epoch=files_per_epoch)
    fin = job.finish()
    return job.result(), fin, out


def test_matches_sequential_greedy(ray_session):
    mat = _corpus()
    got, fin, _ = _run(mat)
    dropped = _ref_greedy(mat)
    kept = sorted(set(range(len(mat))) - dropped)
    assert sorted(got.column("vec_id").to_pylist()) == kept
    # the chains actually exercised chain-awareness: the 3rd link
    # (i+80) survives whenever it is near ONLY the dropped i+40
    assert fin["rows_out"] == len(kept) and fin["rows_in"] == len(mat)


def test_epoch_chunking_invariance(ray_session):
    mat = _corpus(seed=9)
    a, _, _ = _run(mat, files_per_epoch=1, n_files=8)
    b, _, _ = _run(mat, files_per_epoch=4, n_files=8, partitions=2)
    assert (sorted(a.column("vec_id").to_pylist())
            == sorted(b.column("vec_id").to_pylist()))


def test_checkpoint_resume_matches_single_run(ray_session):
    mat = _corpus(seed=11)
    ref, _, _ = _run(mat)
    tbl = _mk(mat)
    chunks = [tbl.slice(i * 30, 30) for i in range(8)]
    out = tempfile.mkdtemp(prefix="sed_ck_out_")
    ck = tempfile.mkdtemp(prefix="sed_ck_")
    job = StreamingEmbeddingDedupJob(out, dim=DIM, threshold=THR,
                                     n_planes=PLANES, n_tables=TABLES,
                                     seed=SEED, num_partitions=4,
                                     checkpoint_dir=ck, checkpoint_every=1)
    for c in chunks[:4]:
        job.process_epoch([c])  # "crash" after 4 epochs
    job2 = StreamingEmbeddingDedupJob(out, dim=DIM, threshold=THR,
                                      n_planes=PLANES, n_tables=TABLES,
                                      seed=SEED, num_partitions=4,
                                      checkpoint_dir=ck, checkpoint_every=1,
                                      resume=True)
    for c in chunks:  # re-feed from the start
        job2.process_epoch([c])
    job2.finish()
    assert (sorted(job2.result().column("vec_id").to_pylist())
            == sorted(ref.column("vec_id").to_pylist()))


def test_replay_is_idempotent(ray_session):
    mat = _corpus(seed=13)
    tbl = _mk(mat)
    out = tempfile.mkdtemp(prefix="sed_idem_")
    for _ in range(2):
        job = StreamingEmbeddingDedupJob(out, dim=DIM, threshold=THR,
                                         n_planes=PLANES, n_tables=TABLES,
                                         seed=SEED, num_partitions=4)
        job.run([tbl.slice(i * 30, 30) for i in range(8)],
                files_per_epoch=2)
        job.finish()
        n = job.result().num_rows
    dropped = _ref_greedy(mat)
    assert n == len(mat) - len(dropped)
