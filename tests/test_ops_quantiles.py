"""Quantile sketch (ops/quantiles.py + streaming/quantiles.py):
quantile_disc equality in exact mode, rank-error bounds under
compaction pressure, merge associativity, streaming == bounded,
checkpoint/resume. The sf0.01 DuckDB oracles run via the op_quantiles /
streaming_quantiles gates in test_driver_contract.py."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from ksql_ray.ops.quantiles import QuantileSketch, dataset_quantiles
from ksql_ray.streaming.quantiles import StreamingQuantilesJob

QS = [0.0, 0.05, 0.25, 0.5, 0.75, 0.9, 0.99, 1.0]


def test_sketch_exact_matches_quantile_disc(duck):
    rng = np.random.default_rng(0)
    vals = np.round(rng.normal(50, 20, 997), 2)
    sk = QuantileSketch(capacity=2048)
    sk.insert(vals)
    assert sk.max_rank_error == 0
    duck.execute("CREATE OR REPLACE TABLE qv AS SELECT unnest(?) AS v",
                 [vals.tolist()])
    for q in QS:
        want = duck.execute(
            "SELECT quantile_disc(v, ?) FROM qv", [q]).fetchone()[0]
        assert sk.quantile(q) == want, q
    duck.execute("DROP TABLE qv")


def test_sketch_bound_under_pressure():
    rng = np.random.default_rng(1)
    vals = rng.uniform(0, 1000, 50_000)
    sk = QuantileSketch(capacity=64)
    for i in range(0, len(vals), 1000):
        sk.insert(vals[i:i + 1000])
    assert sk.max_rank_error > 0
    s = np.sort(vals)
    for q in (0.1, 0.5, 0.9, 0.99):
        v = sk.quantile(q)
        target = max(1, int(np.ceil(q * len(vals) - 1e-9)))
        below = int(np.searchsorted(s, v, side="left"))
        at_or_below = int(np.searchsorted(s, v, side="right"))
        # the guarantee: the returned value's true rank window overlaps
        # [target - err, target + err)
        assert at_or_below >= target - sk.max_rank_error
        assert below < target + sk.max_rank_error
    # the bound is also USEFUL: well under n for this capacity
    assert sk.max_rank_error < len(vals) // 4


def test_sketch_merge_equals_single():
    """merge(a, b) answers within the combined bound of inserting all
    values into one sketch; in exact capacity it is identical."""
    rng = np.random.default_rng(2)
    a, b = rng.normal(size=500), rng.normal(size=700)
    one = QuantileSketch(capacity=4096)
    one.insert(np.concatenate([a, b]))
    m1 = QuantileSketch(capacity=4096)
    m1.insert(a)
    m2 = QuantileSketch(capacity=4096)
    m2.insert(b)
    m1.merge(m2)
    assert m1.n == one.n and m1.max_rank_error == 0
    for q in QS:
        assert m1.quantile(q) == one.quantile(q)


def test_sketch_roundtrip_table():
    rng = np.random.default_rng(3)
    sk = QuantileSketch(capacity=32)
    sk.insert(rng.uniform(size=2000))
    back = QuantileSketch.from_table(sk.to_table(), 32)
    assert back.n == sk.n
    assert back.max_rank_error == sk.max_rank_error
    for q in (0.1, 0.5, 0.9):
        assert back.quantile(q) == sk.quantile(q)


def test_sketch_validation():
    with pytest.raises(ValueError):
        QuantileSketch(capacity=7)          # odd
    sk = QuantileSketch(capacity=4)
    with pytest.raises(ValueError):
        sk.quantile(0.5)                    # empty
    sk.insert(np.array([1.0]))
    with pytest.raises(ValueError):
        sk.quantile(1.5)


def test_dataset_quantiles_exact(ray_session, duck):
    rng = np.random.default_rng(4)
    vals = np.round(rng.exponential(100, 3000), 3)
    t = pa.table({"x": pa.array(vals)})
    out, err = dataset_quantiles(
        ray.data.from_arrow(t).repartition(5), "x",
        [0.25, 0.5, 0.95], capacity=1 << 13)
    assert err == 0
    duck.execute("CREATE OR REPLACE TABLE qv AS SELECT unnest(?) AS v",
                 [vals.tolist()])
    for row in out.to_pylist():
        want = duck.execute("SELECT quantile_disc(v, ?) FROM qv",
                            [row["q"]]).fetchone()[0]
        assert row["value"] == want
    duck.execute("DROP TABLE qv")


def test_streaming_quantiles_checkpoint_resume(ray_session, tmp_path):
    rng = np.random.default_rng(5)
    vals = rng.normal(0, 10, 4000)
    files = []
    for i in range(4):
        p = os.path.join(tmp_path, f"f{i}.parquet")
        pq.write_table(pa.table({"value": vals[i * 1000:(i + 1) * 1000]}),
                       p)
        files.append(p)
    ck = str(tmp_path / "ck")
    job = StreamingQuantilesJob(col="value", capacity=1 << 13,
                                num_partitions=2, checkpoint_dir=ck,
                                checkpoint_every=1)
    job.run(files, files_per_epoch=2)
    m = job.finish()
    assert m["rows_in"] == 4000 and m["max_rank_error"] == 0
    want = job.quantiles([0.1, 0.5, 0.9])
    job2 = StreamingQuantilesJob(col="value", capacity=1 << 13,
                                 num_partitions=2, checkpoint_dir=ck,
                                 resume=True)
    job2.run(files, files_per_epoch=2)
    m2 = job2.finish()
    assert m2["rows_in"] == 4000          # restored, not re-read
    assert job2.quantiles([0.1, 0.5, 0.9]).equals(want)
    # exactness: streaming == plain sort
    s = np.sort(vals)
    got = {r["q"]: r["value"] for r in want.to_pylist()}
    for q in (0.1, 0.5, 0.9):
        tgt = max(1, int(np.ceil(q * 4000 - 1e-9)))
        assert got[q] == s[tgt - 1]
