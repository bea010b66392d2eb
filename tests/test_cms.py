"""Count–Min sketch (ops/cms.py + streaming/cms.py): counter-state
exactness vs a brute-force dense sketch, one-sided point-estimate error
bound, md5-hash oracle parity with DuckDB, and the streaming job's
replay fence + checkpoint/kill/resume. The sf0.01 full-state oracle
runs via the op_cms_counters / streaming_cms gates in
test_driver_contract.py."""

import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray

from ksql_ray.ops.cms import (buckets_from_keys, cms_counters,
                              cms_estimate, counters_from_keys)
from ksql_ray.streaming.cms import StreamingCMSJob

DEPTH, WIDTH = 4, 64


def _keys(seed=3, n=4000, uniq=300, null_frac=0.02):
    rng = np.random.default_rng(seed)
    k = ("u" + pd.Series(rng.zipf(1.3, n) % uniq).astype(str)).to_numpy(
        dtype=object)
    k[rng.random(n) < null_frac] = None
    return k


def _tbl(keys):
    return pa.table({"k": pa.array(keys, type=pa.string()),
                     "x": pa.array(np.arange(len(keys)))})


def _dense(counters: pa.Table) -> np.ndarray:
    out = np.zeros((DEPTH, WIDTH), dtype=np.int64)
    d = counters.column("d").to_numpy(zero_copy_only=False)
    b = counters.column("bucket").to_numpy(zero_copy_only=False)
    out[d, b] = counters.column("cnt").to_numpy(zero_copy_only=False)
    return out


@pytest.mark.parametrize("hash", ["md5", "fast"])
def test_cms_counters_exact_state(hash):
    keys = _keys()
    ds = ray.data.from_arrow(_tbl(keys)).repartition(6)
    got = _dense(pa.Table.from_pylist(
        cms_counters(ds, "k", DEPTH, WIDTH, hash=hash).take_all()))
    want = counters_from_keys(
        np.where(pd.isna(keys), "", keys).astype(object),
        DEPTH, WIDTH, hash)
    assert np.array_equal(got, want)
    # every depth row sums to the stream length
    assert (got.sum(axis=1) == len(keys)).all()


def test_cms_estimate_one_sided():
    keys = _keys(seed=11)
    ds = ray.data.from_arrow(_tbl(keys)).repartition(4)
    counters = pa.Table.from_pylist(
        cms_counters(ds, "k", DEPTH, WIDTH, hash="fast").take_all())
    filled = np.where(pd.isna(keys), "", keys).astype(object)
    true = pd.Series(filled).value_counts()
    qkeys = true.index.to_numpy(dtype=object)
    est = cms_estimate(counters, qkeys, DEPTH, WIDTH,
                       hash="fast").to_pydict()
    n = len(keys)
    for k, e in zip(est["key"], est["est"]):
        t = int(true[k])
        assert e >= t, (k, e, t)
        # CMS guarantee: est <= true + 2N/width whp; generous factor
        assert e <= t + 8 * n // WIDTH + 1


def test_cms_md5_matches_duckdb():
    keys = np.array(["alpha", "beta", "beta", "gamma", "alpha", "beta"],
                    dtype=object)
    got = counters_from_keys(keys, 3, 16, "md5")
    con = duckdb.connect()
    con.register("t", pd.DataFrame({"k": keys}))
    df = con.execute("""
        SELECT d, ('0x' || substr(md5(k || '|' || d), 1, 16))::UBIGINT
               % 16 AS bucket, COUNT(*) AS cnt
        FROM t CROSS JOIN (SELECT unnest(range(3)) AS d)
        GROUP BY 1, 2""").df()
    want = np.zeros((3, 16), dtype=np.int64)
    want[df["d"].to_numpy(np.int64),
         df["bucket"].to_numpy(np.int64)] = df["cnt"].to_numpy(np.int64)
    con.close()
    assert np.array_equal(got, want)


def test_buckets_depth_rows_differ():
    keys = np.array([f"k{i}" for i in range(200)], dtype=object)
    b = buckets_from_keys(keys, 4, 1024, "fast")
    # different depth rows must hash independently
    for d in range(1, 4):
        assert (b[0] != b[d]).any()
    b2 = buckets_from_keys(keys, 4, 1024, "md5")
    for d in range(1, 4):
        assert (b2[0] != b2[d]).any()


def _write_files(tmp_path, keys, n_files=8):
    files = []
    for i, s in enumerate(np.array_split(np.arange(len(keys)), n_files)):
        p = os.path.join(tmp_path, f"f{i:03d}.parquet")
        pq.write_table(_tbl(keys[s]), p)
        files.append(p)
    return files


def test_streaming_cms_equals_bounded(tmp_path):
    keys = _keys(seed=5)
    files = _write_files(str(tmp_path), keys)
    job = StreamingCMSJob(key_col="k", depth=DEPTH, width=WIDTH,
                          hash="fast", num_partitions=3)
    job.run(files, files_per_epoch=3)
    m = job.finish()
    assert m["rows_in"] == len(keys)
    assert m["replayed"] == 0
    want = counters_from_keys(
        np.where(pd.isna(keys), "", keys).astype(object),
        DEPTH, WIDTH, "fast")
    assert np.array_equal(_dense(job.counters()), want)


def test_streaming_cms_replay_fence(tmp_path):
    keys = _keys(seed=9, n=1000)
    files = _write_files(str(tmp_path), keys, n_files=4)
    job = StreamingCMSJob(key_col="k", depth=DEPTH, width=WIDTH,
                          hash="fast", num_partitions=2)
    job.run(files, files_per_epoch=2)
    before = _dense(job.counters())
    # re-deliver an already-applied epoch directly to the actors:
    # the fence must make it a counted no-op
    stats = ray.get([a.process.remote(0) for a in job.actors])
    assert all(s["replayed"] == 1 for s in stats)
    assert np.array_equal(_dense(job.counters()), before)


def test_streaming_cms_checkpoint_resume(tmp_path):
    keys = _keys(seed=13, n=2000)
    files = _write_files(str(tmp_path), keys, n_files=8)
    ck = str(tmp_path / "ck")
    job = StreamingCMSJob(key_col="k", depth=DEPTH, width=WIDTH,
                          hash="fast", num_partitions=2,
                          checkpoint_dir=ck, checkpoint_every=1)
    job.run(files, files_per_epoch=2)
    full = _dense(job.counters())
    # "crash" and resume over the same file list: every epoch is
    # skipped (rows_in == 0) and the state is identical
    job2 = StreamingCMSJob(key_col="k", depth=DEPTH, width=WIDTH,
                           hash="fast", num_partitions=2,
                           checkpoint_dir=ck, checkpoint_every=1,
                           resume=True)
    job2.run(files, files_per_epoch=2)
    m = job2.finish()
    assert m["rows_in"] == 0
    assert np.array_equal(_dense(job2.counters()), full)
    # partial resume: drop the cursor back two epochs and verify the
    # replayed suffix rebuilds the same counters (no double count)
    import json

    with open(os.path.join(ck, "checkpoint.json")) as f:
        cur = json.load(f)["epoch"]
    with open(os.path.join(ck, "checkpoint.json"), "w") as f:
        json.dump({"epoch": cur - 2}, f)
    job3 = StreamingCMSJob(key_col="k", depth=DEPTH, width=WIDTH,
                           hash="fast", num_partitions=2,
                           checkpoint_dir=ck, checkpoint_every=0,
                           resume=True)
    job3.run(files, files_per_epoch=2)
    m3 = job3.finish()
    assert m3["rows_in"] > 0
    assert np.array_equal(_dense(job3.counters()), full)


def test_cms_empty_and_errors():
    with pytest.raises(ValueError):
        counters_from_keys(np.array(["a"], dtype=object), 2, 8, "nope")
    got = counters_from_keys(np.array([], dtype=object), 2, 8, "fast")
    assert got.sum() == 0
    est = cms_estimate(pa.table({"d": pa.array([], pa.int64()),
                                 "bucket": pa.array([], pa.int64()),
                                 "cnt": pa.array([], pa.int64())}),
                       [], 2, 8, "fast")
    assert est.num_rows == 0


def test_streaming_cms_empty_files(tmp_path):
    # zero-row micro-batch files mid-stream must not corrupt state
    keys = _keys(seed=2, n=600)
    files = _write_files(str(tmp_path), keys, n_files=3)
    empty = os.path.join(str(tmp_path), "e.parquet")
    pq.write_table(_tbl(np.array([], dtype=object)), empty)
    job = StreamingCMSJob(key_col="k", depth=DEPTH, width=WIDTH,
                          hash="fast", num_partitions=2)
    job.run([files[0], empty, files[1], empty, files[2]],
            files_per_epoch=2)
    m = job.finish()
    assert m["rows_in"] == len(keys)
    want = counters_from_keys(
        np.where(pd.isna(keys), "", keys).astype(object),
        DEPTH, WIDTH, "fast")
    assert np.array_equal(_dense(job.counters()), want)


def test_cms_estimate_sums_duplicate_cells():
    # the streaming job's counters() carries one row per partition-cell;
    # two partitions' keys can collide into the SAME (d, bucket) —
    # estimate must sum, not overwrite (regression: dense[d,b] = c)
    import pyarrow as pa

    from ksql_ray.ops.cms import cms_estimate

    counters = pa.table({
        "d": pa.array([0, 0, 1], type=pa.int64()),
        "bucket": pa.array([5, 5, 9], type=pa.int64()),
        "cnt": pa.array([3, 4, 7], type=pa.int64()),
    })
    # whichever key hits (0,5) must see 7, not 4
    import numpy as np

    from ksql_ray.ops.cms import buckets_from_keys

    key = "probe"
    b = buckets_from_keys(np.asarray([key], dtype=object), 2, 16, "md5")
    fake = pa.table({
        "d": pa.array([0, 0, 1], type=pa.int64()),
        "bucket": pa.array([int(b[0, 0]), int(b[0, 0]),
                            int(b[1, 0])], type=pa.int64()),
        "cnt": pa.array([3, 4, 7], type=pa.int64()),
    })
    est = cms_estimate(fake, [key], 2, 16, "md5")
    assert est.column("est").to_pylist() == [7]
