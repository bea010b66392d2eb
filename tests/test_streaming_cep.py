"""StreamingCEPJob vs the bounded matcher (ops/cep.py), plus streaming-
only behaviors: cross-epoch partials, late drops, expiry, checkpoint."""

import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from ksql_ray.expr import F
from ksql_ray.ops.cep import match_pattern
from ksql_ray.streaming.cep import StreamingCEPJob

STEPS = [("v", F("event_type").Equal("view")),
         ("c", F("event_type").Equal("click")),
         ("p", F("event_type").Equal("purchase"))]
KW = dict(partition_by=["user_id"], order_by="ts", steps=STEPS,
          tiebreak="event_id", measures=["event_id"])


def _events(n=4000, n_users=60, seed=5):
    rng = np.random.default_rng(seed)
    ts = np.sort(rng.integers(0, 10_000_000, size=n))
    return pa.table({
        "user_id": pa.array(rng.integers(0, n_users, size=n), pa.int64()),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "event_id": pa.array(np.arange(n), pa.int64()),
        "event_type": pa.array(
            rng.choice(["view", "click", "purchase", "other"], size=n)),
    })


def _norm(tbl_or_rows, cols):
    df = (tbl_or_rows.to_pandas() if isinstance(tbl_or_rows, pa.Table)
          else pd.DataFrame(tbl_or_rows))
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df[cols].sort_values(cols).reset_index(drop=True)


def _run_stream(tbl, *, chunk=500, contiguity="skip", within=None,
                lateness_us=0, **extra):
    outd = tempfile.mkdtemp(prefix="cep_stream_")
    job = StreamingCEPJob(outd, contiguity=contiguity, within=within,
                          lateness_us=lateness_us, num_partitions=4,
                          in_schema=tbl.schema, **KW, **extra)
    for i in range(0, tbl.num_rows, chunk):
        job.process_epoch([tbl.slice(i, chunk)])
    fin = job.finish()
    return job.result(), fin


@pytest.mark.parametrize("contiguity", ["skip", "strict"])
@pytest.mark.parametrize("within", [None, 2_000_000])
def test_equals_bounded(ray_session, contiguity, within):
    tbl = _events()
    bounded = match_pattern(ray.data.from_arrow(tbl), contiguity=contiguity,
                            within=within, num_partitions=4, **KW).take_all()
    got, fin = _run_stream(tbl, contiguity=contiguity, within=within)
    cols = ["user_id", "v_ts", "v_event_id", "c_ts", "c_event_id",
            "p_ts", "p_event_id"]
    assert fin["late_drops"] == 0
    assert _norm(got, cols).equals(_norm(bounded, cols))


def test_cross_epoch_partial(ray_session):
    # view in epoch 1, click in epoch 2, purchase in epoch 3 — the match
    # only exists because partials survive across epochs
    def ev(eid, us, et):
        return {"user_id": 1, "ts": np.datetime64(us, "us"),
                "event_id": eid, "event_type": et}

    rows = [ev(0, 100, "view"), ev(1, 200, "other"),
            ev(2, 1000, "click"), ev(3, 1100, "other"),
            ev(4, 2000, "purchase"), ev(5, 2100, "other")]
    tbl = pa.Table.from_pylist(rows)
    got, fin = _run_stream(tbl, chunk=2)
    assert got.num_rows == 1
    r = got.to_pylist()[0]
    assert (r["v_event_id"], r["c_event_id"], r["p_event_id"]) == (0, 2, 4)
    assert fin["open_partials"] == 0


def test_late_rows_dropped_and_counted(ray_session):
    def ev(eid, us, et):
        return {"user_id": 1, "ts": np.datetime64(us, "us"),
                "event_id": eid, "event_type": et}

    outd = tempfile.mkdtemp(prefix="cep_late_")
    job = StreamingCEPJob(outd, contiguity="skip", num_partitions=2,
                          in_schema=pa.Table.from_pylist([ev(0, 1, "x")]).schema,
                          **KW)
    job.process_epoch([pa.Table.from_pylist([ev(0, 100, "view"),
                                             ev(1, 5000, "other")])])
    # watermark is now 5000; epoch 2 flushes the band <= 5000
    job.process_epoch([pa.Table.from_pylist([ev(2, 6000, "click")])])
    # a click at ts=200 is behind the flushed band -> late drop
    job.process_epoch([pa.Table.from_pylist([ev(3, 200, "click"),
                                             ev(4, 7000, "purchase")])])
    fin = job.finish()
    assert fin["late_drops"] == 1
    r = job.result().to_pylist()
    assert len(r) == 1 and r[0]["c_event_id"] == 2  # late click unusable


def test_lateness_buffers_disorder(ray_session):
    # same stream, epochs shuffled WITHIN a lateness horizon: with
    # lateness_us covering the disorder, output equals bounded exactly
    tbl = _events(n=3000)
    rng = np.random.default_rng(9)
    ts = tbl.column("ts").to_numpy(zero_copy_only=False).astype("datetime64[us]")
    jitter = rng.integers(0, 400_000, size=len(ts))
    order = np.argsort(ts.astype(np.int64) + jitter, kind="stable")
    shuffled = tbl.take(pa.array(order))  # arrival order != event order
    bounded = match_pattern(ray.data.from_arrow(tbl), contiguity="skip",
                            within=2_000_000, num_partitions=4,
                            **KW).take_all()
    got, fin = _run_stream(shuffled, chunk=300, within=2_000_000,
                           lateness_us=500_000)
    cols = ["user_id", "v_ts", "v_event_id", "c_ts", "c_event_id",
            "p_ts", "p_event_id"]
    assert fin["late_drops"] == 0
    assert _norm(got, cols).equals(_norm(bounded, cols))


def test_within_expires_partials(ray_session):
    tbl = _events(n=2000)
    _, fin = _run_stream(tbl, within=500_000)
    assert fin["expired_partials"] > 0
    # skip-till-next partials without a horizon never expire
    _, fin2 = _run_stream(tbl, within=None)
    assert fin2["expired_partials"] == 0 and fin2["open_partials"] > 0


def test_sink_idempotent_replay(ray_session):
    tbl = _events(n=1500)
    outd = tempfile.mkdtemp(prefix="cep_idem_")
    for _ in range(2):  # full replay into the SAME sink
        job = StreamingCEPJob(outd, contiguity="skip", within=2_000_000,
                              num_partitions=4, in_schema=tbl.schema, **KW)
        for i in range(0, tbl.num_rows, 300):
            job.process_epoch([tbl.slice(i, 300)])
        job.finish()
        n = job.result().num_rows
    bounded = match_pattern(ray.data.from_arrow(tbl), contiguity="skip",
                            within=2_000_000, num_partitions=4,
                            **KW).take_all()
    assert n == len(bounded)


def test_checkpoint_resume(ray_session):
    tbl = _events(n=2400)
    cols = ["user_id", "v_ts", "v_event_id", "c_ts", "c_event_id",
            "p_ts", "p_event_id"]
    ref, _ = _run_stream(tbl, chunk=300, within=2_000_000)

    outd = tempfile.mkdtemp(prefix="cep_ck_")
    ck = tempfile.mkdtemp(prefix="cep_ckpt_")
    job = StreamingCEPJob(outd, contiguity="skip", within=2_000_000,
                          num_partitions=4, in_schema=tbl.schema,
                          checkpoint_dir=ck, checkpoint_every=1, **KW)
    for i in range(0, 1200, 300):  # "crash" after 4 of 8 epochs
        job.process_epoch([tbl.slice(i, 300)])
    job2 = StreamingCEPJob(outd, contiguity="skip", within=2_000_000,
                           num_partitions=4, in_schema=tbl.schema,
                           checkpoint_dir=ck, checkpoint_every=1,
                           resume=True, **KW)
    for i in range(0, tbl.num_rows, 300):  # re-feed from the start
        job2.process_epoch([tbl.slice(i, 300)])
    job2.finish()
    assert _norm(job2.result(), cols).equals(_norm(ref, cols))


def test_measures_may_not_repeat_order_by(ray_session):
    import pytest

    with pytest.raises(ValueError, match="repeat order_by"):
        StreamingCEPJob(tempfile.mkdtemp(), partition_by=["user_id"],
                        order_by="ts", steps=STEPS, tiebreak="event_id",
                        measures=["ts"], num_partitions=2,
                        in_schema=_events(n=4).schema)


ABSENT = [("v", "p", F("event_type").Equal("error"))]


def _events_with_errors(n=4000, seed=15):
    rng = np.random.default_rng(seed)
    ts = np.sort(rng.integers(0, 10_000_000, size=n))
    return pa.table({
        "user_id": pa.array(rng.integers(0, 60, size=n), pa.int64()),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "event_id": pa.array(np.arange(n), pa.int64()),
        "event_type": pa.array(rng.choice(
            ["view", "click", "purchase", "error", "other"], size=n)),
    })


@pytest.mark.parametrize("contiguity", ["skip", "strict"])
def test_absent_equals_bounded(ray_session, contiguity):
    tbl = _events_with_errors()
    bounded = match_pattern(ray.data.from_arrow(tbl), contiguity=contiguity,
                            within=2_000_000, num_partitions=4,
                            absent=ABSENT, **KW).take_all()
    got, fin = _run_stream(tbl, contiguity=contiguity, within=2_000_000,
                           absent=ABSENT)
    cols = ["user_id", "v_ts", "v_event_id", "c_ts", "c_event_id",
            "p_ts", "p_event_id"]
    assert fin["late_drops"] == 0
    assert _norm(got, cols).equals(_norm(bounded, cols))
    # the negation actually removed matches on this fixture
    plain = match_pattern(ray.data.from_arrow(tbl), contiguity=contiguity,
                          within=2_000_000, num_partitions=4, **KW).take_all()
    if contiguity == "skip":
        assert len(bounded) < len(plain)


def test_absent_cross_epoch_error(ray_session):
    """The error arrives in the epoch BETWEEN the click and the
    purchase: the carried negation flag must kill the attempt."""
    def ev(eid, us, et):
        return {"user_id": 1, "ts": np.datetime64(us, "us"),
                "event_id": eid, "event_type": et}

    # epoch boundaries at chunk=2 rows
    rows = [ev(0, 100, "view"), ev(1, 200, "click"),
            ev(2, 1000, "error"), ev(3, 1100, "other"),
            ev(4, 2000, "purchase"), ev(5, 2100, "other"),
            # a second funnel with NO error in its window
            ev(6, 5000, "view"), ev(7, 5100, "click"),
            ev(8, 6000, "other"), ev(9, 6100, "other"),
            ev(10, 7000, "purchase"), ev(11, 7100, "other")]
    tbl = pa.Table.from_pylist(rows)
    got, _ = _run_stream(tbl, chunk=2, absent=ABSENT)
    assert got.num_rows == 1
    assert got.to_pylist()[0]["v_event_id"] == 6
