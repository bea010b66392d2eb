"""HyperLogLog (ops/hll.py + streaming/cardinality.py): exact bit-length
kernel, register invariants, estimator accuracy, streaming == bounded,
checkpoint/resume. The sf0.01 DuckDB oracles run via the
op_hll_distinct / streaming_hll gates in test_driver_contract.py."""

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from conftest import collect
from ksql_ray.ops.hll import _bitlen_u64, hll_estimate, hll_registers
from ksql_ray.streaming.cardinality import StreamingHLLJob


def test_bitlen_exact_near_boundaries():
    """np.log2-based bit length misrounds near 2^k for >53-bit ints;
    the shift-based kernel must be exact everywhere."""
    vals = []
    for k in range(1, 64):
        vals += [(1 << k) - 1, 1 << k, (1 << k) + 1]
    vals = np.array([0, 1] + [v for v in vals if v < (1 << 64)],
                    dtype=np.uint64)
    got = _bitlen_u64(vals)
    want = np.array([int(v).bit_length() for v in vals], dtype=np.int64)
    assert np.array_equal(got, want)


def _keyed(n, distinct, seed=0):
    rng = np.random.default_rng(seed)
    return pa.table({"k": pa.array(
        [f"key-{v}" for v in rng.integers(0, distinct, n)], pa.string())})


def test_hll_partition_invariant(ray_session):
    t = _keyed(5000, 800)
    r1 = collect(hll_registers(ray.data.from_arrow(t), "k", p=8,
                               hash="fast"))
    r4 = collect(hll_registers(ray.data.from_arrow(t).repartition(5),
                               "k", p=8, hash="fast"))
    a = sorted(r1.to_pylist(), key=lambda r: r["register"])
    b = sorted(r4.to_pylist(), key=lambda r: r["register"])
    assert a == b


def test_hll_estimate_accuracy(ray_session):
    """p=10 -> ~3.3% std error; assert within 4 sigma across three
    cardinalities (deterministic hash, so this never flakes)."""
    for distinct in (100, 2000, 20000):
        t = _keyed(distinct * 3, distinct, seed=distinct)
        regs = collect(hll_registers(ray.data.from_arrow(t), "k", p=10,
                                     hash="fast"))
        est = hll_estimate(regs, p=10)
        assert abs(est - distinct) / distinct < 4 * 1.04 / np.sqrt(1024)


def test_hll_duplicate_insensitive(ray_session):
    """Feeding the same keys 1x vs 10x yields identical registers."""
    base = _keyed(1000, 300, seed=5)
    many = pa.concat_tables([base] * 10)
    r1 = collect(hll_registers(ray.data.from_arrow(base), "k", p=8,
                               hash="fast")).to_pylist()
    r10 = collect(hll_registers(ray.data.from_arrow(many), "k", p=8,
                                hash="fast")).to_pylist()
    key = lambda r: r["register"]
    assert sorted(r1, key=key) == sorted(r10, key=key)


def test_hll_p_validation(ray_session):
    with pytest.raises(ValueError):
        hll_registers(ray.data.from_arrow(_keyed(10, 5)), "k", p=3)
    with pytest.raises(ValueError):
        StreamingHLLJob(key_col="k", p=19)


def test_streaming_hll_equals_bounded(ray_session, tmp_path):
    t = _keyed(4000, 700, seed=9)
    files = []
    for i in range(6):
        p = os.path.join(tmp_path, f"f{i}.parquet")
        pq.write_table(t.slice(i * 666, 666), p)
        files.append(p)
    job = StreamingHLLJob(key_col="k", p=8, hash="fast",
                          num_partitions=3)
    job.run(files, files_per_epoch=2)
    sregs = job.registers()
    bregs = collect(hll_registers(ray.data.from_arrow(t.slice(0, 3996)),
                                  "k", p=8, hash="fast"))
    bregs = bregs.take(
        pa.compute.sort_indices(bregs,
                                sort_keys=[("register", "ascending")]))
    assert sregs.equals(bregs)
    assert job.finish()["rows_in"] == 3996


def test_streaming_hll_checkpoint_resume(ray_session, tmp_path):
    t = _keyed(3000, 500, seed=13)
    files = []
    for i in range(4):
        p = os.path.join(tmp_path, f"f{i}.parquet")
        pq.write_table(t.slice(i * 750, 750), p)
        files.append(p)
    ck = str(tmp_path / "ck")
    job = StreamingHLLJob(key_col="k", p=8, hash="fast",
                          num_partitions=2, checkpoint_dir=ck,
                          checkpoint_every=1)
    job.run(files, files_per_epoch=2)
    want = job.registers()
    job2 = StreamingHLLJob(key_col="k", p=8, hash="fast",
                           num_partitions=2, checkpoint_dir=ck,
                           resume=True)
    job2.run(files, files_per_epoch=2)
    m2 = job2.finish()
    assert m2["rows_in"] == 0
    assert job2.registers().equals(want)


def _kv(n, nkeys, nvals, seed=0):
    rng = np.random.default_rng(seed)
    return pa.table({
        "k": pa.array([f"g{v}" for v in rng.integers(0, nkeys, n)]),
        "v": pa.array(rng.integers(0, nvals, n), pa.int64()),
    })


def test_streaming_grouped_hll_equals_bounded(ray_session, tmp_path):
    from ksql_ray.ops.hll import grouped_hll_registers
    from ksql_ray.streaming.cardinality import StreamingGroupedHLLJob

    t = _kv(4200, 7, 900, seed=21)
    files = []
    for i in range(6):
        p = os.path.join(tmp_path, f"g{i}.parquet")
        pq.write_table(t.slice(i * 700, 700), p)
        files.append(p)
    job = StreamingGroupedHLLJob(key_col="k", val_col="v", p=8,
                                 hash="fast", num_partitions=3)
    job.run(files, files_per_epoch=2)
    sregs = job.registers()
    bregs = collect(grouped_hll_registers(
        ray.data.from_arrow(t), ["k"], "v", p=8, hash="fast"))
    bregs = bregs.take(pa.compute.sort_indices(
        bregs, sort_keys=[("k", "ascending"),
                          ("register", "ascending")]))
    assert sregs.equals(bregs)
    m = job.finish()
    assert m["rows_in"] == 4200 and m["keys"] == 7


def test_streaming_grouped_hll_checkpoint_replay(ray_session, tmp_path):
    from ksql_ray.streaming.cardinality import StreamingGroupedHLLJob

    t = _kv(2000, 5, 400, seed=27)
    files = []
    for i in range(4):
        p = os.path.join(tmp_path, f"g{i}.parquet")
        pq.write_table(t.slice(i * 500, 500), p)
        files.append(p)
    ck = str(tmp_path / "ck")
    job = StreamingGroupedHLLJob(key_col="k", val_col="v", p=8,
                                 hash="fast", num_partitions=2,
                                 checkpoint_dir=ck, checkpoint_every=1)
    job.run(files, files_per_epoch=2)
    want = job.registers()
    # resumed run replays nothing and restores identical state
    job2 = StreamingGroupedHLLJob(key_col="k", val_col="v", p=8,
                                  hash="fast", num_partitions=2,
                                  checkpoint_dir=ck, resume=True)
    job2.run(files, files_per_epoch=2)
    assert job2.finish()["rows_in"] == 0
    assert job2.registers().equals(want)
    # replaying the same files AGAIN into a live job cannot corrupt
    # state (register max-merge is replay-insensitive)
    job3 = StreamingGroupedHLLJob(key_col="k", val_col="v", p=8,
                                  hash="fast", num_partitions=2)
    job3.run(files + files, files_per_epoch=2)
    assert job3.registers().equals(want)
