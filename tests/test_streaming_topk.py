"""Streaming heavy hitters (streaming/topk.py): exactness when capacity
covers the key universe, Misra-Gries error bounds under pressure,
epoch-split invariance, checkpoint/resume. The sf0.01 oracle runs via
the streaming_topk gate in test_driver_contract.py."""

import collections
import os

import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ksql_ray.streaming.topk import StreamingTopKJob


def _mk_tables(keys: list[str], per: int = 1) -> list[pa.Table]:
    """One table per call site; each key repeated `per` times."""
    return pa.table({
        "k": pa.array([k for k in keys for _ in range(per)], pa.string()),
        "v": pa.array([1] * (len(keys) * per), pa.int64()),
    })


def _write_files(tmpdir, tables):
    files = []
    for i, t in enumerate(tables):
        p = os.path.join(tmpdir, f"f{i:02d}.parquet")
        pq.write_table(t, p)
        files.append(p)
    return files


def _skewed_stream(n_files=6, rows=400, seed=7):
    rng = np.random.default_rng(seed)
    tables = []
    truth = collections.Counter()
    for _ in range(n_files):
        # Zipf-ish: few hot keys, long tail
        ks = [f"hot{j}" for j in rng.integers(0, 3, rows // 2)]
        ks += [f"cold{j}" for j in rng.integers(0, 200, rows - rows // 2)]
        truth.update(ks)
        tables.append(_mk_tables(ks))
    return tables, truth


def test_topk_exact_when_capacity_covers(ray_session, tmp_path):
    tables, truth = _skewed_stream()
    files = _write_files(tmp_path, tables)
    job = StreamingTopKJob(key_cols=["k"], capacity=1 << 12,
                           num_partitions=4)
    job.run(files, files_per_epoch=2)
    m = job.finish()
    assert m["max_undercount"] == 0
    assert m["rows_in"] == sum(truth.values())
    got = job.topk(10).to_pylist()
    want = sorted(truth.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
    assert [(r["key"], r["cnt"]) for r in got] == want


def test_topk_epoch_split_invariant(ray_session, tmp_path):
    """Same input, different files_per_epoch -> identical exact result."""
    tables, _ = _skewed_stream(seed=11)
    files = _write_files(tmp_path, tables)
    snaps = []
    for fpe in (1, 3):
        job = StreamingTopKJob(key_cols=["k"], capacity=1 << 12,
                               num_partitions=3)
        job.run(files, files_per_epoch=fpe)
        snaps.append(job.topk(20))
    assert snaps[0].equals(snaps[1])


def test_topk_mg_bounds_under_pressure(ray_session, tmp_path):
    """capacity << distinct keys: reported counts may undercount by at
    most the partition's max_undercount, never overcount; every key
    whose true count exceeds the bound is present."""
    tables, truth = _skewed_stream(n_files=8, rows=600, seed=3)
    files = _write_files(tmp_path, tables)
    job = StreamingTopKJob(key_cols=["k"], capacity=16,
                           num_partitions=2)
    job.run(files, files_per_epoch=2)
    m = job.finish()
    assert m["max_undercount"] > 0          # pressure actually happened
    snap = {r["key"]: r["cnt"] for r in job.topk(10_000).to_pylist()}
    for k, c in snap.items():
        assert c <= truth[k]                 # never overcounts
        assert truth[k] - c <= m["max_undercount"]
    for k, c in truth.items():
        if c > m["max_undercount"]:
            assert k in snap                 # guaranteed-present rule


def test_topk_checkpoint_resume(ray_session, tmp_path):
    tables, truth = _skewed_stream(seed=23)
    files = _write_files(tmp_path / "in" if False else tmp_path, tables)
    ck = str(tmp_path / "ck")
    job = StreamingTopKJob(key_cols=["k"], capacity=1 << 12,
                           num_partitions=2, checkpoint_dir=ck,
                           checkpoint_every=1)
    job.run(files, files_per_epoch=2)
    want = job.topk(15)
    # resume from the cursor and replay the same stream: replayed epochs
    # are skipped (rows_in 0) and the snapshot is identical
    job2 = StreamingTopKJob(key_cols=["k"], capacity=1 << 12,
                            num_partitions=2, checkpoint_dir=ck,
                            resume=True)
    job2.run(files, files_per_epoch=2)
    m2 = job2.finish()
    assert m2["rows_in"] == 0
    assert job2.topk(15).equals(want)


def test_topk_composite_key_and_nulls(ray_session):
    t = pa.table({
        "a": pa.array(["x", "x", None, "y"], pa.string()),
        "b": pa.array([1, 1, 2, None], pa.int64()),
    })
    job = StreamingTopKJob(key_cols=["a", "b"], capacity=64,
                           num_partitions=1)
    job.process_epoch([t])
    got = {r["key"]: r["cnt"] for r in job.topk(10).to_pylist()}
    assert got == {"x:1": 2, ":2": 1, "y:": 1}


# ---------------------------------------------------------------- grouped quantiles


def _gq_fixture(tmp_path, seed=21, n=4000, keys=6, n_files=8):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({
        "k": "r" + pd.Series(rng.integers(0, keys, n)).astype(str),
        "v": rng.integers(0, 50, n).astype(float),
    })
    df.loc[rng.random(n) < 0.05, "v"] = np.nan
    files = []
    for i, s in enumerate(np.array_split(np.arange(n), n_files)):
        p = os.path.join(str(tmp_path), f"g{i:02d}.parquet")
        pq.write_table(pa.Table.from_pandas(df.iloc[s],
                                            preserve_index=False), p)
        files.append(p)
    return df, files


def test_streaming_grouped_quantiles_exact(ray_session, tmp_path):
    import duckdb

    from ksql_ray.streaming.quantiles import StreamingGroupedQuantilesJob

    df, files = _gq_fixture(tmp_path)
    job = StreamingGroupedQuantilesJob(key_cols=["k"], col="v",
                                       num_partitions=3)
    job.run(files, files_per_epoch=3)
    m = job.finish()
    assert m["rows_in"] == len(df) and m["replayed"] == 0
    got = job.quantiles([0.5, 0.9]).to_pandas()
    con = duckdb.connect()
    con.register("t", df)
    exp = con.execute("""
        SELECT k, 0.5 AS q, quantile_disc(v, 0.5) AS value
        FROM t WHERE v IS NOT NULL GROUP BY k
        UNION ALL
        SELECT k, 0.9 AS q, quantile_disc(v, 0.9) AS value
        FROM t WHERE v IS NOT NULL GROUP BY k
        ORDER BY k, q""").df()
    con.close()
    pd.testing.assert_frame_equal(got.reset_index(drop=True), exp,
                                  check_dtype=False)


def test_streaming_grouped_quantiles_fence_and_resume(ray_session,
                                                      tmp_path):
    import ray as _ray

    from ksql_ray.streaming.quantiles import StreamingGroupedQuantilesJob

    df, files = _gq_fixture(tmp_path, seed=5, n=1200, n_files=4)
    ck = os.path.join(str(tmp_path), "ck")
    job = StreamingGroupedQuantilesJob(key_cols=["k"], col="v",
                                       num_partitions=2,
                                       checkpoint_dir=ck,
                                       checkpoint_every=1)
    job.run(files, files_per_epoch=2)
    before = job.quantiles([0.5, 0.99]).to_pandas()
    # replay fence: re-delivering an applied epoch is a counted no-op
    stats = _ray.get([a.process.remote(0) for a in job.actors])
    assert all(s["replayed"] == 1 for s in stats)
    pd.testing.assert_frame_equal(
        job.quantiles([0.5, 0.99]).to_pandas(), before)
    # resume: all epochs skipped, same state
    job2 = StreamingGroupedQuantilesJob(key_cols=["k"], col="v",
                                        num_partitions=2,
                                        checkpoint_dir=ck,
                                        checkpoint_every=1, resume=True)
    job2.run(files, files_per_epoch=2)
    assert job2.finish()["rows_in"] == 0
    pd.testing.assert_frame_equal(
        job2.quantiles([0.5, 0.99]).to_pandas(), before)
