"""Streaming as-of join (streaming/asof.py): streaming == bounded on
random shuffled streams, watermark/lateness drop accounting, bounded
right-history compaction, checkpoint/resume. The sf0.01 DuckDB oracle
runs via the streaming_asof gate in test_driver_contract.py."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import ray.data

from ksql_ray.ops.asof import asof_join
from ksql_ray.streaming.asof import StreamingAsofJob


def _streams(seed=0, n=3000, nr=800, keys=20):
    rng = np.random.default_rng(seed)
    left = pa.table({
        "k": pa.array([f"u{v}" for v in rng.integers(0, keys, n)]),
        "ts": pa.array(np.sort(rng.integers(0, 5_000_000, n)), pa.int64()),
        "eid": pa.array(np.arange(n), pa.int64()),
    })
    right = pa.table({
        "k": pa.array([f"u{v}" for v in rng.integers(0, keys, nr)]),
        "ts": pa.array(np.sort(rng.integers(0, 5_000_000, nr)), pa.int64()),
        "rid": pa.array(np.arange(nr), pa.int64()),
        "ref": pa.array(np.round(rng.uniform(0, 10, nr), 3)),
    })
    return left, right


def _bounded_map(left, right, ray_session):
    b = asof_join(ray.data.from_arrow(left), ray.data.from_arrow(right),
                  on="ts", by=["k"], how="left", tiebreak="rid",
                  right_cols=["ref"]).to_pandas()
    return {r.eid: (None if r.ref != r.ref else r.ref)
            for r in b.itertuples()}


def _write(tmp, name, tbl, n_files):
    files = []
    n = tbl.num_rows
    for i in range(n_files):
        p = os.path.join(tmp, f"{name}{i:02d}.parquet")
        pq.write_table(tbl.slice(i * n // n_files,
                                 (i + 1) * n // n_files - i * n // n_files),
                       p)
        files.append(p)
    return files


def _run_job(tmp, lf, rf, out, **kw):
    job = StreamingAsofJob(
        out, on="ts", by=["k"], right_cols={"ref": "ref"},
        left_columns=["k", "ts", "eid"],
        right_columns=["k", "ts", "rid", "ref"],
        tiebreak="rid", num_partitions=3, **kw)
    job.run(lf, rf, files_per_epoch=2)
    return job


def test_streaming_equals_bounded(ray_session, tmp_path):
    left, right = _streams(seed=1)
    want = _bounded_map(left, right, ray_session)
    lf = _write(tmp_path, "l", left, 8)
    rf = _write(tmp_path, "r", right, 8)
    out = str(tmp_path / "out")
    job = _run_job(tmp_path, lf, rf, out, lateness_us=1 << 60)
    m = job.finish()
    assert m["late_left"] == 0 and m["late_right"] == 0
    res = job.result().to_pandas()
    got = {r.eid: (None if r.ref != r.ref else r.ref)
           for r in res.itertuples()}
    assert got == want


def test_streaming_asof_late_drops_counted(ray_session, tmp_path):
    """Zero lateness + one left file replayed at the END (ts far behind
    the watermark): its rows are counted as late, never emitted twice."""
    left, right = _streams(seed=2)
    lf = _write(tmp_path, "l", left, 8)
    rf = _write(tmp_path, "r", right, 8)
    out = str(tmp_path / "out")
    job = StreamingAsofJob(
        out, on="ts", by=["k"], right_cols={"ref": "ref"},
        left_columns=["k", "ts", "eid"],
        right_columns=["k", "ts", "rid", "ref"],
        tiebreak="rid", lateness_us=0, num_partitions=3)
    job.run(lf, rf, files_per_epoch=2)
    # replay the FIRST left file after the watermark has moved past it
    job.process_epoch([lf[0]], [])
    m = job.finish()
    n0 = pq.read_table(lf[0]).num_rows
    assert m["late_left"] == n0
    assert m["rows_out"] == left.num_rows   # originals all emitted once


def test_streaming_asof_history_compacts(ray_session, tmp_path):
    """After each flush the right history holds at most (rows above the
    watermark) + one row per key."""
    left, right = _streams(seed=3, keys=5)
    lf = _write(tmp_path, "l", left, 8)
    rf = _write(tmp_path, "r", right, 8)
    out = str(tmp_path / "out")
    job = _run_job(tmp_path, lf, rf, out, lateness_us=0)
    import ray as _ray

    stats = _ray.get([a.flush_all.remote(999) for a in job._actors])
    # all input consumed; post-final-flush history is exactly the
    # per-key latest row (<= 5 keys spread over 3 partitions)
    assert sum(s["right_history"] for s in stats) <= 5


def test_streaming_asof_checkpoint_resume(ray_session, tmp_path):
    left, right = _streams(seed=4)
    lf = _write(tmp_path, "l", left, 8)
    rf = _write(tmp_path, "r", right, 8)
    ck = str(tmp_path / "ck")
    out = str(tmp_path / "out")
    job = _run_job(tmp_path, lf, rf, out, lateness_us=1 << 60,
                   checkpoint_dir=ck, checkpoint_every=1)
    job.finish()
    want = job.result()
    out2 = out  # same sink: committed epochs are skipped on replay
    job2 = _run_job(tmp_path, lf, rf, out2, lateness_us=1 << 60,
                    checkpoint_dir=ck, resume=True)
    m2 = job2.finish()
    assert m2["rows_in"] == 0               # everything replay-skipped
    assert job2.result().num_rows == want.num_rows