"""Streaming per-key throttle tests: streaming == bounded chain op on
ts-ordered replay, cross-epoch last-emission state, newest-wins LSM
lookups, replay idempotence, checkpoint/kill-resume, rescale, md5 vs
fast fingerprint equivalence."""

import os
import shutil
import tempfile

import pyarrow as pa
import pyarrow.compute as pc
import pyarrow.parquet as pq

from conftest import SF_DIR
from ksql_ray.streaming.throttle import StreamingThrottleJob

T = 3_600_000_000  # 1h


def _events() -> pa.Table:
    tbl = pq.read_table(f"{SF_DIR}/events.parquet")
    return tbl.take(pc.sort_indices(tbl, sort_keys=[
        ("ts", "ascending"), ("event_id", "ascending")]))


def _files(tbl: pa.Table, fdir: str, n_files=6) -> list[str]:
    n = tbl.num_rows
    out = []
    for i in range(n_files):
        s = tbl.slice(i * n // n_files,
                      (i + 1) * n // n_files - i * n // n_files)
        p = os.path.join(fdir, f"f{i:02d}.parquet")
        pq.write_table(s, p)
        out.append(p)
    return out


def _run(tbl: pa.Table, out=None, **kw) -> pa.Table:
    fdir = tempfile.mkdtemp(prefix="ksql_thr_in_")
    own = out is None
    out = out or tempfile.mkdtemp(prefix="ksql_thr_out_")
    kw.setdefault("key_cols", ["user_id"])
    kw.setdefault("interval_us", T)
    kw.setdefault("num_partitions", 4)
    try:
        job = StreamingThrottleJob(out, **kw)
        job.run(_files(tbl, fdir), files_per_epoch=2)
        return job.result()
    finally:
        shutil.rmtree(fdir, ignore_errors=True)
        if own:
            shutil.rmtree(out, ignore_errors=True)


def _bounded(tbl: pa.Table) -> list[int]:
    import ray.data

    from ksql_ray.ops.rows import throttle

    ds = ray.data.from_arrow(tbl)
    rows = throttle(ds, ["user_id"], "ts", T,
                    tiebreak="event_id").take_all()
    return sorted(r["event_id"] for r in rows)


def test_streaming_equals_bounded_chain(ray_session):
    tbl = _events()
    got = sorted(_run(tbl).column("event_id").to_pylist())
    assert got == _bounded(tbl)


def test_fast_fingerprint_equals_md5(ray_session):
    tbl = _events()
    md5 = sorted(_run(tbl, method="md5").column("event_id").to_pylist())
    fast = sorted(_run(tbl, method="fast").column("event_id").to_pylist())
    assert md5 == fast


def test_state_spans_epochs(ray_session):
    # one key, events 30min apart: emissions alternate across the whole
    # stream regardless of epoch boundaries (state carries last emit)
    n = 24
    tbl = pa.table({
        "user_id": pa.array([1] * n, pa.int64()),
        "event_id": pa.array(range(n), pa.int64()),
        "ts": pa.array([i * 1_800_000_000 for i in range(n)],
                       pa.timestamp("us")),
    })
    got = sorted(_run(tbl).column("event_id").to_pylist())
    assert got == list(range(0, n, 2))


def test_replay_idempotent(ray_session):
    tbl = _events()
    out = tempfile.mkdtemp(prefix="ksql_thr_sink_")
    try:
        first = _run(tbl, out=out).num_rows
        again = _run(tbl, out=out).num_rows
        assert first == again
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_checkpoint_kill_resume_and_rescale(ray_session):
    tbl = _events()
    fdir = tempfile.mkdtemp(prefix="ksql_thr_in_")
    out = tempfile.mkdtemp(prefix="ksql_thr_out_")
    ck1 = tempfile.mkdtemp(prefix="ksql_thr_ck1_")
    ck2 = tempfile.mkdtemp(prefix="ksql_thr_ck2_")
    try:
        files = _files(tbl, fdir)
        # run the first 2 epochs with per-epoch checkpoints, then "die"
        job = StreamingThrottleJob(out, key_cols=["user_id"], ts_col="ts",
                                   interval_us=T, num_partitions=4,
                                   checkpoint_dir=ck1, checkpoint_every=1)
        job.process_epoch(files[:2])
        job.process_epoch(files[2:4])
        # resume replays the whole stream; committed epochs skip
        # checkpoint_every=0: the resumed run must not advance ck1's
        # cursor (the rescale below re-buckets the 2-epoch checkpoint)
        job2 = StreamingThrottleJob(out, key_cols=["user_id"],
                                    ts_col="ts", interval_us=T,
                                    num_partitions=4, checkpoint_dir=ck1,
                                    resume=True)
        job2.run(files, files_per_epoch=2)
        resumed = sorted(job2.result().column("event_id").to_pylist())
        assert resumed == _bounded(tbl)
        replay_in = sum(m["rows_in"] for m in job2.metrics
                        if m.get("skipped"))
        assert replay_in == 0
        # rescale 4 -> 8 partitions mid-stream, then finish the stream
        out2 = tempfile.mkdtemp(prefix="ksql_thr_out2_")
        job3 = StreamingThrottleJob(out2, key_cols=["user_id"],
                                    ts_col="ts", interval_us=T,
                                    num_partitions=8, checkpoint_dir=ck2,
                                    checkpoint_every=1)
        info = job3.reshard_from(ck1)
        assert info["old_partitions"] == 4 and info["new_partitions"] == 8
        job3.run(files, files_per_epoch=2)
        tail = sorted(job3.result().column("event_id").to_pylist())
        # epochs 0-1 were committed to the OLD sink; the rescaled job
        # emits exactly the stream's remaining emissions
        done = set()
        job_ref = StreamingThrottleJob(
            tempfile.mkdtemp(prefix="ksql_thr_ref_"),
            key_cols=["user_id"], ts_col="ts", interval_us=T,
            num_partitions=4)
        job_ref.process_epoch(files[:2])
        job_ref.process_epoch(files[2:4])
        done = set(job_ref.result().column("event_id").to_pylist())
        expect = [e for e in _bounded(tbl) if e not in done]
        assert tail == sorted(expect)
        shutil.rmtree(out2, ignore_errors=True)
    finally:
        for d in (fdir, out, ck1, ck2):
            shutil.rmtree(d, ignore_errors=True)


def test_empty_epoch_and_validation(ray_session):
    import pytest as _pytest

    with _pytest.raises(ValueError):
        StreamingThrottleJob(tempfile.mkdtemp(), key_cols=["k"],
                             interval_us=0)
    out = tempfile.mkdtemp(prefix="ksql_thr_out_")
    try:
        job = StreamingThrottleJob(out, key_cols=["user_id"], ts_col="ts",
                                   interval_us=T, num_partitions=2)
        empty = pa.table({
            "user_id": pa.array([], pa.int64()),
            "event_id": pa.array([], pa.int64()),
            "ts": pa.array([], pa.timestamp("us"))})
        m = job.process_epoch([empty])
        assert m["rows_in"] == 0 and m["rows_out"] == 0
    finally:
        shutil.rmtree(out, ignore_errors=True)


def test_throttle_then_dedup_chain(ray_session):
    """Job composability: the throttle sink directory feeds a
    downstream dedup job unchanged (the ingest-chain deployment
    shape: rate-limit -> dedup -> store)."""
    from ksql_ray.streaming.dedup import StreamingDedupJob

    turns = pa.table({
        "user_id": pa.array([1, 1, 1, 2, 2], pa.int64()),
        "event_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "props": pa.array(["a", "a", "b", "a", "c"]),
        "ts": pa.array([0, 1_000_000, 2 * T, 0, 5], pa.timestamp("us")),
    })
    d1 = tempfile.mkdtemp(prefix="ksql_chain_t_")
    d2 = tempfile.mkdtemp(prefix="ksql_chain_d_")
    fdir = tempfile.mkdtemp(prefix="ksql_chain_in_")
    try:
        job = StreamingThrottleJob(d1, key_cols=["user_id"],
                                   ts_col="ts", interval_us=T,
                                   num_partitions=2)
        job.run(_files(turns, fdir, n_files=2), files_per_epoch=1)
        # user 1 emits event 0 (t=0) and 2 (t=2T); user 2 emits 3
        kept = sorted(job.result().column("event_id").to_pylist())
        assert kept == [0, 2, 3]
        import glob

        thr_files = sorted(glob.glob(os.path.join(d1, "*.parquet")))
        dd = StreamingDedupJob(d2, text_col="props", num_partitions=2)
        dd.run(thr_files, files_per_epoch=1)
        # texts of kept rows: a, b, a -> dedup keeps first a, b
        out = dd.result()
        assert sorted(out.column("props").to_pylist()) == ["a", "b"]
    finally:
        for d in (d1, d2, fdir):
            shutil.rmtree(d, ignore_errors=True)
