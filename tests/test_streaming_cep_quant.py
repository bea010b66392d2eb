"""Streaming quantifier parity (round 5): StreamingCEPJob with {m,n}
bounded repetition must equal the bounded matcher on the same closed
stream, across epoch chunkings that split runs mid-repetition, plus a
checkpoint/resume round-trip mid-run."""

import tempfile

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from ksql_ray.expr import F
from ksql_ray.ops.cep import match_pattern
from ksql_ray.streaming.cep import StreamingCEPJob


def _events(n=4000, n_users=40, seed=13):
    rng = np.random.default_rng(seed)
    ts = np.sort(rng.integers(0, 10_000_000, size=n))
    return pa.table({
        "user_id": pa.array(rng.integers(0, n_users, size=n), pa.int64()),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "event_id": pa.array(np.arange(n), pa.int64()),
        "event_type": pa.array(
            # heavier view/click mass -> long runs that straddle epochs
            rng.choice(["view", "click", "purchase", "other"], size=n,
                       p=[0.4, 0.3, 0.15, 0.15])),
    })


def _norm(tbl_or_rows, cols):
    df = (tbl_or_rows.to_pandas() if isinstance(tbl_or_rows, pa.Table)
          else pd.DataFrame(tbl_or_rows))
    for c in df.columns:
        if str(df[c].dtype).startswith("datetime64"):
            df[c] = df[c].astype("datetime64[us]")
    return df[cols].sort_values(cols).reset_index(drop=True)


def _stream(tbl, steps, *, chunk, within=None, **extra):
    outd = tempfile.mkdtemp(prefix="cep_q_")
    job = StreamingCEPJob(
        outd, partition_by=["user_id"], order_by="ts", steps=steps,
        contiguity="strict", within=within, tiebreak="event_id",
        num_partitions=4, in_schema=tbl.schema, **extra)
    for i in range(0, tbl.num_rows, chunk):
        job.process_epoch([tbl.slice(i, chunk)])
    fin = job.finish()
    return job.result(), fin


QSTEPS = [("v", F("event_type").Equal("view"), (1, 3)),
          ("c", F("event_type").Equal("click"))]
COLS = ["user_id", "v_ts", "v_n", "c_ts"]


@pytest.mark.parametrize("chunk", [4000, 500, 137])
@pytest.mark.parametrize("within", [None, 2_000_000])
def test_quant_equals_bounded(ray_session, chunk, within):
    tbl = _events()
    bounded = match_pattern(
        ray.data.from_arrow(tbl), partition_by=["user_id"],
        order_by="ts", steps=QSTEPS, contiguity="strict", within=within,
        tiebreak="event_id", num_partitions=4).take_all()
    got, fin = _stream(tbl, QSTEPS, chunk=chunk, within=within)
    assert fin["late_drops"] == 0
    a, b = _norm(got, COLS), _norm(pd.DataFrame(bounded), COLS)
    assert len(b) > 0, "vacuous fixture"
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


@pytest.mark.parametrize("chunk", [400, 93])
def test_quant_last_step_and_unbounded(ray_session, chunk):
    # quantified LAST step (completes by terminator or end-of-stream
    # exhaustion) and an unbounded Kleene-plus middle step
    steps = [("a", F("event_type").Equal("view")),
             ("b", F("event_type").Equal("click"), (1, None)),
             ("p", F("event_type").Equal("purchase"), (2, 4))]
    cols = ["user_id", "a_ts", "b_ts", "b_n", "p_ts", "p_n"]
    tbl = _events(seed=29)
    bounded = match_pattern(
        ray.data.from_arrow(tbl), partition_by=["user_id"],
        order_by="ts", steps=steps, contiguity="strict",
        tiebreak="event_id", num_partitions=4).take_all()
    got, fin = _stream(tbl, steps, chunk=chunk)
    assert fin["late_drops"] == 0
    a = _norm(got, cols)
    b = _norm(pd.DataFrame(bounded), cols)
    assert len(b) > 0, "vacuous fixture"
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_quant_checkpoint_resume_midrun(ray_session):
    """Kill after 4 of 8 epochs (open {m,n} runs straddle the cut:
    __rep/__last_t ride the snapshot), resume into the SAME sink,
    re-feed from the start — output must equal an uninterrupted run."""
    import shutil

    tbl = _events(seed=3, n=2000)
    kw = dict(partition_by=["user_id"], order_by="ts", steps=QSTEPS,
              contiguity="strict", within=2_000_000,
              tiebreak="event_id", num_partitions=4,
              in_schema=tbl.schema)

    ref_out = tempfile.mkdtemp(prefix="cep_q_ref_")
    ref = StreamingCEPJob(ref_out, **kw)
    for i in range(0, 2000, 250):
        ref.process_epoch([tbl.slice(i, 250)])
    ref.finish()
    want = _norm(ref.result(), COLS)
    assert len(want) > 0, "vacuous fixture"

    outd = tempfile.mkdtemp(prefix="cep_q_ck_")
    ckd = tempfile.mkdtemp(prefix="cep_q_ckpt_")
    job = StreamingCEPJob(outd, checkpoint_dir=ckd, checkpoint_every=1,
                          **kw)
    for i in range(0, 1000, 250):  # "crash" after 4 of 8 epochs
        job.process_epoch([tbl.slice(i, 250)])
    job2 = StreamingCEPJob(outd, checkpoint_dir=ckd, checkpoint_every=1,
                           resume=True, **kw)
    for i in range(0, 2000, 250):  # re-feed from the start
        job2.process_epoch([tbl.slice(i, 250)])
    job2.finish()
    got = _norm(job2.result(), COLS)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    shutil.rmtree(ckd, ignore_errors=True)


def test_quant_with_measures_parity(ray_session):
    # measures columns on a quantified step come from its FIRST bound
    # row in both engines
    steps = [("v", F("event_type").Equal("view"), (1, 3)),
             ("c", F("event_type").Equal("click"))]
    tbl = _events(seed=7, n=1500)
    kw = dict(partition_by=["user_id"], order_by="ts", steps=steps,
              contiguity="strict", tiebreak="event_id")
    bounded = match_pattern(ray.data.from_arrow(tbl),
                            measures=["event_id"], num_partitions=4,
                            **kw).take_all()
    outd = tempfile.mkdtemp(prefix="cep_qm_")
    job = StreamingCEPJob(outd, measures=["event_id"],
                          num_partitions=4, in_schema=tbl.schema, **kw)
    for i in range(0, tbl.num_rows, 200):
        job.process_epoch([tbl.slice(i, 200)])
    job.finish()
    cols = ["user_id", "v_ts", "v_event_id", "v_n", "c_ts",
            "c_event_id"]
    a = _norm(job.result(), cols)
    b = _norm(pd.DataFrame(bounded), cols)
    assert len(b) > 0
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_quant_reshard_4_to_8(ray_session):
    """Rescale a checkpoint holding open {m,n} runs (__rep/__last_t
    re-route by key hash) from 4 to 8 partitions; the resumed job's
    output must equal the uninterrupted 4-partition run."""
    import shutil

    tbl = _events(seed=17, n=2000)
    kw = dict(partition_by=["user_id"], order_by="ts", steps=QSTEPS,
              contiguity="strict", within=2_000_000,
              tiebreak="event_id", in_schema=tbl.schema)

    ref_out = tempfile.mkdtemp(prefix="cep_qr_ref_")
    ref = StreamingCEPJob(ref_out, num_partitions=4, **kw)
    for i in range(0, 2000, 250):
        ref.process_epoch([tbl.slice(i, 250)])
    ref.finish()
    want = _norm(ref.result(), COLS)
    assert len(want) > 0

    outd = tempfile.mkdtemp(prefix="cep_qr_a_")
    ckd = tempfile.mkdtemp(prefix="cep_qr_ck_")
    job = StreamingCEPJob(outd, num_partitions=4, checkpoint_dir=ckd,
                          checkpoint_every=1, **kw)
    for i in range(0, 1000, 250):  # stop mid-stream with open runs
        job.process_epoch([tbl.slice(i, 250)])

    # SAME sink: replayed epochs' matches are already committed there
    # (the rescale protocol — see tests/test_reshard_flows.py)
    ckd2 = tempfile.mkdtemp(prefix="cep_qr_ck2_")
    job2 = StreamingCEPJob(outd, num_partitions=8,
                           checkpoint_dir=ckd2, checkpoint_every=1, **kw)
    rs = job2.reshard_from(ckd)
    assert rs["old_partitions"] == 4 and rs["new_partitions"] == 8
    for i in range(0, 2000, 250):  # re-feed from the start
        job2.process_epoch([tbl.slice(i, 250)])
    job2.finish()
    got = _norm(job2.result(), COLS)
    pd.testing.assert_frame_equal(got, want, check_dtype=False)
    shutil.rmtree(ckd, ignore_errors=True)
    shutil.rmtree(ckd2, ignore_errors=True)
