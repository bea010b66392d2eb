"""Streaming per-key row jobs (streaming/rows.py): label transitions
and running z-score anomalies vs DuckDB window-function oracles, NULL
handling, the late-row fence, epoch-split invariance, and
checkpoint/kill/resume. The sf0.01 oracles run via the
streaming_transitions / streaming_anomaly gates in
test_driver_contract.py."""

import glob
import os

import duckdb
import numpy as np
import pandas as pd
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ksql_ray.streaming.rows import (StreamingAnomalyJob,
                                     StreamingTransitionsJob)


def _fixture(seed=7, n=6000, keys=120, null_frac=0.05):
    rng = np.random.default_rng(seed)
    df = pd.DataFrame({"k": rng.integers(0, keys, n)})
    df["ord"] = df.groupby("k").cumcount()
    lab = np.array(["user", "assistant", "system", "tool"],
                   dtype=object)[rng.integers(0, 4, n)]
    lab[rng.random(n) < null_frac] = None
    df["label"] = lab
    v = rng.normal(5.0, 2.0, n)
    v[rng.random(n) < null_frac] = np.nan
    df["val"] = v
    df["k"] = "c" + df["k"].astype(str)
    # event order: ord-major so per-key order matches file order
    return df.sort_values("ord", kind="stable").reset_index(drop=True)


def _write(tmpdir, df, n_files=8):
    files = []
    for i, s in enumerate(np.array_split(np.arange(len(df)), n_files)):
        p = os.path.join(tmpdir, f"f{i:03d}.parquet")
        pq.write_table(
            pa.Table.from_pandas(df.iloc[s], preserve_index=False), p)
        files.append(p)
    return files


def _oracle_transitions(df):
    con = duckdb.connect()
    con.register("t", df)
    return con.execute("""
      SELECT from_label, to_label, COUNT(*) AS cnt FROM (
        SELECT LAG(label) OVER (PARTITION BY k ORDER BY ord)
                 AS from_label,
               label AS to_label FROM t)
      WHERE from_label IS NOT NULL AND to_label IS NOT NULL
      GROUP BY 1, 2 ORDER BY 1, 2""").df().astype({"cnt": "int64"})


def _oracle_anomaly(df, min_n=5, thr=1.5):
    con = duckdb.connect()
    con.register("t", df)
    return con.execute(f"""
      SELECT k, ord, n_before, zscore FROM (
        SELECT k, ord, COUNT(val) OVER w AS n_before,
               CASE WHEN STDDEV_SAMP(val) OVER w > 0
                    THEN (val - AVG(val) OVER w)
                         / STDDEV_SAMP(val) OVER w END AS zscore
        FROM t
        WINDOW w AS (PARTITION BY k ORDER BY ord
                     ROWS BETWEEN UNBOUNDED PRECEDING
                     AND 1 PRECEDING))
      WHERE n_before >= {min_n} AND zscore IS NOT NULL
        AND ABS(zscore) > {thr}
      ORDER BY k, ord""").df().astype(
          {"ord": "int64", "n_before": "int64"})


def test_transitions_matches_lag_oracle(ray_session, tmp_path):
    df = _fixture()
    files = _write(tmp_path, df)
    job = StreamingTransitionsJob(
        key_cols=["k"], ord_col="ord", label_col="label",
        num_partitions=4)
    job.run(files, files_per_epoch=3)
    m = job.finish()
    assert m["late_rows"] == 0 and m["rows_in"] == len(df)
    got = job.transitions().to_pandas()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        _oracle_transitions(df).reset_index(drop=True))


def test_transitions_epoch_split_invariance(ray_session, tmp_path):
    df = _fixture(seed=11, n=2000, keys=40)
    files = _write(tmp_path, df, n_files=6)
    outs = []
    for fpe in (1, 6):
        job = StreamingTransitionsJob(
            key_cols=["k"], ord_col="ord", label_col="label",
            num_partitions=3)
        job.run(files, files_per_epoch=fpe)
        outs.append(job.transitions().to_pandas())
    pd.testing.assert_frame_equal(outs[0], outs[1])


def test_transitions_late_rows_dropped_not_misattributed(
        ray_session, tmp_path):
    t1 = pa.table({"k": ["a", "a", "a"], "ord": [1, 2, 3],
                   "label": ["x", "y", "x"]})
    # ord 2 is behind a's carry cursor (3) -> late; ord 4 continues x->z
    t2 = pa.table({"k": ["a", "a"], "ord": [2, 4],
                   "label": ["y", "z"]})
    files = []
    for i, t in enumerate((t1, t2)):
        p = os.path.join(tmp_path, f"f{i}.parquet")
        pq.write_table(t, p)
        files.append(p)
    job = StreamingTransitionsJob(
        key_cols=["k"], ord_col="ord", label_col="label",
        num_partitions=2)
    job.run(files, files_per_epoch=1)
    m = job.finish()
    assert m["late_rows"] == 1
    got = {(r["from_label"], r["to_label"]): r["cnt"]
           for r in job.transitions().to_pylist()}
    assert got == {("x", "y"): 1, ("y", "x"): 1, ("x", "z"): 1}


def test_transitions_checkpoint_resume(ray_session, tmp_path):
    df = _fixture(seed=3, n=3000, keys=60)
    files = _write(tmp_path, df, n_files=8)
    ck = str(tmp_path / "ck")
    job = StreamingTransitionsJob(
        key_cols=["k"], ord_col="ord", label_col="label",
        num_partitions=3, checkpoint_dir=ck, checkpoint_every=1)
    job.run(files[:4], files_per_epoch=2)  # 2 epochs, then "crash"
    job2 = StreamingTransitionsJob(
        key_cols=["k"], ord_col="ord", label_col="label",
        num_partitions=3, checkpoint_dir=ck, checkpoint_every=1,
        resume=True)
    job2.run(files, files_per_epoch=2)  # full replay; first 2 skipped
    got = job2.transitions().to_pandas()
    pd.testing.assert_frame_equal(
        got.reset_index(drop=True),
        _oracle_transitions(df).reset_index(drop=True))


def test_anomaly_matches_window_oracle(ray_session, tmp_path):
    df = _fixture(seed=5)
    files = _write(tmp_path, df)
    job = StreamingAnomalyJob(
        key_cols=["k"], ord_col="ord", val_col="val",
        min_n=5, threshold=1.5, num_partitions=4)
    job.run(files, files_per_epoch=3)
    m = job.finish()
    assert m["late_rows"] == 0 and m["rows_in"] == len(df)
    got = (job.result().select(["k", "ord", "n_before", "zscore"])
           .to_pandas().sort_values(["k", "ord"])
           .reset_index(drop=True))
    want = _oracle_anomaly(df).reset_index(drop=True)
    assert len(got) == len(want)
    pd.testing.assert_frame_equal(
        got[["k", "ord", "n_before"]], want[["k", "ord", "n_before"]])
    assert np.abs(got["zscore"] - want["zscore"]).max() < 1e-8


def test_anomaly_late_fence_and_null_vals(ray_session, tmp_path):
    # key "a": 1..8 then a late ord 4 and a null value at ord 9
    base = pa.table({"k": ["a"] * 8, "ord": list(range(1, 9)),
                     "val": [1.0, 2.0, 1.5, 2.5, 1.0, 2.0, 1.5, 2.5]})
    tail = pa.table({"k": ["a", "a", "a"], "ord": [4, 9, 10],
                     "val": [100.0, None, 100.0]})
    files = []
    for i, t in enumerate((base, tail)):
        p = os.path.join(tmp_path, f"f{i}.parquet")
        pq.write_table(t, p)
        files.append(p)
    job = StreamingAnomalyJob(
        key_cols=["k"], ord_col="ord", val_col="val",
        min_n=5, threshold=3.0, num_partitions=1)
    job.run(files, files_per_epoch=1)
    m = job.finish()
    assert m["late_rows"] == 1  # the replayed ord 4
    out = job.result().to_pylist()
    # only ord 10 fires: null at 9 is skipped (no z, sums unchanged)
    assert [r["ord"] for r in out] == [10]
    assert out[0]["n_before"] == 8  # null did not advance the count


def test_anomaly_sink_resume_exactly_once(ray_session, tmp_path):
    df = _fixture(seed=13, n=3000, keys=50)
    files = _write(tmp_path, df, n_files=8)
    ck, sink = str(tmp_path / "ck"), str(tmp_path / "sink")
    kw = dict(key_cols=["k"], ord_col="ord", val_col="val",
              min_n=5, threshold=1.5, num_partitions=3,
              checkpoint_dir=ck, checkpoint_every=1, sink_dir=sink)
    job = StreamingAnomalyJob(**kw)
    job.run(files[:4], files_per_epoch=2)
    n_files_before = len(glob.glob(os.path.join(sink, "*.parquet")))
    job2 = StreamingAnomalyJob(**kw, resume=True)
    job2.run(files, files_per_epoch=2)
    got = (job2.result().select(["k", "ord", "n_before"])
           .to_pandas().sort_values(["k", "ord"])
           .reset_index(drop=True))
    want = _oracle_anomaly(df)[["k", "ord", "n_before"]].reset_index(
        drop=True)
    pd.testing.assert_frame_equal(got, want)  # no dupes, no gaps
    assert n_files_before > 0


def test_anomaly_all_null_epoch(ray_session, tmp_path):
    t = pa.table({"k": ["a", "b"], "ord": [1, 1],
                  "val": pa.array([None, None], pa.float64())})
    p = os.path.join(tmp_path, "f0.parquet")
    pq.write_table(t, p)
    job = StreamingAnomalyJob(key_cols=["k"], ord_col="ord",
                              val_col="val", num_partitions=2)
    job.run([p], files_per_epoch=1)
    assert job.result() is None
    assert job.finish()["rows_in"] == 2
