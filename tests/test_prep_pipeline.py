"""Composed prep pipeline (pipelines/prep.py): the chain's semantics
on a controlled corpus — normalization folds messy duplicates,
quality drops junk, dedup keeps first ids, sharding is complete and
dense. The sf DuckDB oracle runs via op_prep_pipeline in
test_driver_contract.py."""

import pyarrow as pa
import ray.data

from conftest import collect
from ksql_ray.pipelines.prep import dedup_rows, prep_pipeline

GOOD = ("the quick brown fox jumps over the lazy dog and then walks "
        "away to find some other interesting things")


def _corpus():
    return pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array([
            GOOD,
            "  " + GOOD.upper() + "   ",       # messy dup of doc 0
            GOOD + " with a different ending entirely here now",
            "spam spam spam spam spam spam",    # top_word_frac junk
            "a b c d e f g h i j",              # mean_word_len < 2
            "   ",                              # empty after trim
        ]),
    })


def test_prep_pipeline_semantics(ray_session):
    got = collect(prep_pipeline(
        ray.data.from_arrow(_corpus()).repartition(3),
        n_shards=4, form="none"))
    rows = {r["doc_id"]: r for r in got.to_pylist()}
    # survivors: 0 (first of the dup pair) and 2; 1 deduped, 3-5 junk
    assert set(rows) == {0, 2}
    assert rows[0]["text"] == GOOD.lower()
    # shard/pos present and dense per shard
    per_shard = {}
    for r in rows.values():
        per_shard.setdefault(r["shard"], []).append(r["pos"])
    for ps in per_shard.values():
        assert sorted(ps) == list(range(len(ps)))


def test_dedup_rows_first_id_wins(ray_session):
    t = pa.table({
        "doc_id": pa.array([5, 3, 9, 1], pa.int64()),
        "text": pa.array(["x y z", "x y z", "other", "x y z"]),
    })
    got = collect(dedup_rows(ray.data.from_arrow(t).repartition(2)))
    assert sorted(r["doc_id"] for r in got.to_pylist()) == [1, 9]


def test_dedup_rows_fast_equals_md5(ray_session):
    t = pa.table({
        "doc_id": pa.array(range(40), pa.int64()),
        "text": pa.array([f"doc body {i % 13}" for i in range(40)]),
    })
    a = collect(dedup_rows(ray.data.from_arrow(t), fingerprint="md5"))
    b = collect(dedup_rows(ray.data.from_arrow(t), fingerprint="fast"))
    key = lambda x: sorted(r["doc_id"] for r in x.to_pylist())
    assert key(a) == key(b)
    assert len(key(a)) == 13
