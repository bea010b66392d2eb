"""Checkpoint rescale for the pickled-state streaming jobs: as-of join
and CEP. Reshard an in-flight checkpoint to a different partition
count; the committed result equals an uninterrupted run at the new
partition count (both jobs sink per-epoch, so pre-crash output is in
the shared sink and replayed epochs skip)."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest

from ksql_ray.expr import F
from ksql_ray.streaming.asof import StreamingAsofJob
from ksql_ray.streaming.cep import StreamingCEPJob


def _write(tmp, name, tbl, n_files):
    files = []
    n = tbl.num_rows
    for i in range(n_files):
        p = os.path.join(str(tmp), f"{name}{i:02d}.parquet")
        pq.write_table(tbl.slice(i * n // n_files,
                                 (i + 1) * n // n_files
                                 - i * n // n_files), p)
        files.append(p)
    return files


def _rows(t: pa.Table, cols):
    if t is None or t.num_rows == 0:
        return []
    return sorted(map(tuple, zip(*[t.column(c).to_pylist()
                                   for c in cols])))


@pytest.mark.parametrize("old_p,new_p", [(3, 6), (6, 2)])
def test_asof_reshard(tmp_path, old_p, new_p, ray_session):
    rng = np.random.default_rng(9)
    n, nr = 1200, 600
    left = pa.table({
        "k": pa.array([f"u{v}" for v in rng.integers(0, 25, n)]),
        "ts": pa.array(np.sort(rng.integers(0, 5_000_000, n)), pa.int64()),
        "eid": pa.array(np.arange(n), pa.int64()),
    })
    right = pa.table({
        "k": pa.array([f"u{v}" for v in rng.integers(0, 25, nr)]),
        "ts": pa.array(np.sort(rng.integers(0, 5_000_000, nr)), pa.int64()),
        "rid": pa.array(np.arange(nr), pa.int64()),
        "ref": pa.array(np.round(rng.uniform(0, 10, nr), 3)),
    })
    lf = _write(tmp_path, "l", left, 6)
    rf = _write(tmp_path, "r", right, 6)

    def mk(out, p, ck=None):
        return StreamingAsofJob(
            out, on="ts", by=["k"], right_cols={"ref": "ref"},
            left_columns=["k", "ts", "eid"],
            right_columns=["k", "ts", "rid", "ref"],
            tiebreak="rid", num_partitions=p,
            checkpoint_dir=ck, checkpoint_every=1)

    tag = f"{old_p}to{new_p}"
    out = str(tmp_path / f"out_{tag}")
    job = mk(out, old_p, str(tmp_path / f"cko_{tag}"))
    job.run(lf[:3], rf[:3], files_per_epoch=1)
    job2 = mk(out, new_p, str(tmp_path / f"ckn_{tag}"))
    info = job2.reshard_from(str(tmp_path / f"cko_{tag}"))
    assert (info["old_partitions"], info["new_partitions"]) == (old_p, new_p)
    job2.run(lf, rf, files_per_epoch=1)
    job2.finish()

    ref = mk(str(tmp_path / f"ref_{tag}"), new_p)
    ref.run(lf, rf, files_per_epoch=1)
    ref.finish()
    cols = ["eid", "ref"]
    assert _rows(job2.result(), cols) == _rows(ref.result(), cols)


@pytest.mark.parametrize("old_p,new_p", [(2, 5), (5, 2)])
def test_cep_reshard(tmp_path, old_p, new_p, ray_session):
    rng = np.random.default_rng(4)
    n = 3000
    ts = np.sort(rng.integers(0, 10_000_000, size=n))
    events = pa.table({
        "user_id": pa.array(rng.integers(0, 50, size=n), pa.int64()),
        "ts": pa.array(ts.astype("datetime64[us]")),
        "event_id": pa.array(np.arange(n), pa.int64()),
        "event_type": pa.array(
            rng.choice(["view", "click", "purchase", "x"], size=n)),
    })
    steps = [("v", F("event_type").Equal("view")),
             ("c", F("event_type").Equal("click")),
             ("p", F("event_type").Equal("purchase"))]
    kw = dict(partition_by=["user_id"], order_by="ts", steps=steps,
              tiebreak="event_id", measures=["event_id"],
              contiguity="skip", in_schema=events.schema)

    def mk(out, p, ck=None):
        return StreamingCEPJob(out, num_partitions=p,
                               checkpoint_dir=ck, checkpoint_every=1,
                               **kw)

    chunks = [events.slice(i, 500) for i in range(0, n, 500)]
    tag = f"{old_p}to{new_p}"
    out = str(tmp_path / f"out_{tag}")
    job = mk(out, old_p, str(tmp_path / f"cko_{tag}"))
    for c in chunks[:3]:
        job.process_epoch([c])
    job2 = mk(out, new_p, str(tmp_path / f"ckn_{tag}"))
    info = job2.reshard_from(str(tmp_path / f"cko_{tag}"))
    assert (info["old_partitions"], info["new_partitions"]) == (old_p, new_p)
    for c in chunks:
        job2.process_epoch([c])
    job2.finish()

    ref = mk(str(tmp_path / f"ref_{tag}"), new_p)
    for c in chunks:
        ref.process_epoch([c])
    ref.finish()
    r2, rr = job2.result(), ref.result()
    cols = [c for c in r2.column_names] if r2 is not None else []
    assert _rows(r2, cols) == _rows(rr, cols)
