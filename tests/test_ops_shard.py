"""Deterministic shuffle-shard (ops/shard.py): reproducibility across
repartitions and seeds, fast-vs-md5 contract, idempotent shard writes.
The sf0.01 DuckDB oracle runs via the op_shuffle_shard gate in
test_driver_contract.py."""

import os

import pyarrow as pa
import pyarrow.parquet as pq
import pytest
import ray.data

from conftest import collect
from ksql_ray.ops.shard import shuffle_shard, write_shards


def _docs(n=200):
    return pa.table({
        "doc_id": pa.array(range(n), pa.int64()),
        "text": pa.array([f"doc {i} body" for i in range(n)]),
    })


def _snap(t):
    return sorted((r["doc_id"], r["shard"], r["pos"])
                  for r in t.to_pylist())


def test_shuffle_deterministic_across_partitioning(ray_session):
    t = _docs()
    a = collect(shuffle_shard(ray.data.from_arrow(t), "doc_id", 8,
                              method="fast"))
    b = collect(shuffle_shard(ray.data.from_arrow(t).repartition(7),
                              "doc_id", 8, method="fast"))
    assert _snap(a) == _snap(b)
    # every row present exactly once; pos is a dense 0..k-1 per shard
    assert len(_snap(a)) == 200
    per_shard = {}
    for _, s, p in _snap(a):
        per_shard.setdefault(s, []).append(p)
    for s, ps in per_shard.items():
        assert sorted(ps) == list(range(len(ps)))


def test_shuffle_seed_changes_order(ray_session):
    t = _docs()
    a = collect(shuffle_shard(ray.data.from_arrow(t), "doc_id", 8,
                              method="fast", seed="s1"))
    b = collect(shuffle_shard(ray.data.from_arrow(t), "doc_id", 8,
                              method="fast", seed="s2"))
    assert _snap(a) != _snap(b)


def test_shuffle_breaks_input_order(ray_session):
    """The within-shard order must not be the input order (that is the
    whole point). With 200 sequential ids the probability of the hash
    order agreeing is ~0."""
    t = _docs()
    got = collect(shuffle_shard(ray.data.from_arrow(t), "doc_id", 1,
                                method="fast"))
    order = [r["doc_id"] for r in sorted(got.to_pylist(),
                                         key=lambda r: r["pos"])]
    assert order != sorted(order)


def test_write_shards_idempotent(ray_session, tmp_path):
    t = _docs(150)
    out = str(tmp_path / "shards")
    m1 = write_shards(ray.data.from_arrow(t), out, "doc_id", n_shards=8)
    assert m1["rows"] == 150 and m1["written"] >= 1 and m1["skipped"] == 0
    files = sorted(os.listdir(out))
    content1 = {f: pq.read_table(os.path.join(out, f)) for f in files}
    # second run: everything skipped, bytes untouched
    m2 = write_shards(ray.data.from_arrow(t), out, "doc_id", n_shards=8)
    assert m2["written"] == 0 and m2["skipped"] == m1["written"]
    assert m2["rows"] == 150
    for f in files:
        assert pq.read_table(os.path.join(out, f)).equals(content1[f])
    # partial-failure resume: delete one shard, only it is rewritten
    os.remove(os.path.join(out, files[0]))
    m3 = write_shards(ray.data.from_arrow(t), out, "doc_id", n_shards=8)
    assert m3["written"] == 1
    assert pq.read_table(os.path.join(out, files[0])).equals(
        content1[files[0]])


def test_shuffle_validation(ray_session):
    with pytest.raises(ValueError):
        shuffle_shard(ray.data.from_arrow(_docs(5)), "doc_id", 0)
