"""DSIR importance resampling (ops/dsir.py): brute-force pin on a toy
corpus, fast-vs-md5 hash invariants, edge cases. The sf0.01 DuckDB
oracle runs via the op_dsir_select gate in test_driver_contract.py."""

import hashlib
import math
import re

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from conftest import collect

B = 64


def _toy():
    return pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array([
            "good clean text good clean text",
            "spam spam spam buy now",
            "good text",
            "one",                       # single token: 0 bigrams
            "   ",                       # whitespace-only: 1 token, 0 bigrams
            "clean good clean good clean",
        ]),
        "is_target": pa.array([True, False, True, False, False, True]),
    })


def _brute(table, target_mask, a=0.5, buckets=B):
    docs = [re.split(r"\s+", t.strip().lower())
            for t in table.column("text").to_pylist()]
    def bks(toks):
        return [int(hashlib.md5(f"{w1} {w2}".encode()).hexdigest()[:8], 16)
                % buckets for w1, w2 in zip(toks, toks[1:])]
    raw = np.zeros(buckets)
    tgt = np.zeros(buckets)
    for d, m in zip(docs, target_mask):
        for b in bks(d):
            raw[b] += 1
            if m:
                tgt[b] += 1
    lw = (np.log((tgt + a) / (tgt.sum() + a * buckets))
          - np.log((raw + a) / (raw.sum() + a * buckets)))
    return [(i, len(bks(d)), float(sum(lw[b] for b in bks(d))))
            for i, d in enumerate(docs)]


def test_dsir_brute_force(ray_session):
    from ksql_ray.ops.dsir import dsir_select

    toy = _toy()
    raw = ray.data.from_arrow(toy)
    tgt = raw.filter(expr="is_target")
    got = collect(dsir_select(raw, tgt, n=10, buckets=B))
    want = sorted(_brute(toy, toy.column("is_target").to_pylist()),
                  key=lambda r: (-r[2], r[0]))
    assert got.num_rows == 6
    for row, (doc, ng, s) in zip(got.to_pylist(), want):
        assert row["doc_id"] == doc
        assert row["n_grams"] == ng
        assert row["dsir_logw"] == pytest.approx(s, rel=1e-12)
    # target-looking docs must outrank the spam doc
    order = [r["doc_id"] for r in got.to_pylist()]
    assert order.index(1) > order.index(0)
    assert order.index(1) > order.index(5)


def test_dsir_no_bigram_docs_score_zero(ray_session):
    from ksql_ray.ops.dsir import dsir_select

    toy = _toy()
    raw = ray.data.from_arrow(toy)
    got = {r["doc_id"]: r for r in collect(
        dsir_select(raw, raw.filter(expr="is_target"), n=10,
                    buckets=B)).to_pylist()}
    for d in (3, 4):
        assert got[d]["n_grams"] == 0
        assert got[d]["dsir_logw"] == 0.0


def test_dsir_fast_hash_same_shape(ray_session):
    """hash='fast' is a different hash (not oracle-comparable) but the
    scoring identity must hold: sum over docs of n_grams matches, and
    scores are finite."""
    from ksql_ray.ops.dsir import dsir_select

    toy = _toy()
    raw = ray.data.from_arrow(toy)
    got = collect(dsir_select(raw, raw.filter(expr="is_target"), n=10,
                              buckets=B, hash="fast"))
    assert got.num_rows == 6
    assert sum(r["n_grams"] for r in got.to_pylist()) == \
        sum(r[1] for r in _brute(toy, toy.column("is_target").to_pylist()))
    assert all(math.isfinite(r["dsir_logw"]) for r in got.to_pylist())


def test_dsir_counts_partition_invariant(ray_session):
    """Bucket counts are the same no matter how the corpus is split
    into batches (per-batch partials merge exactly)."""
    from ksql_ray.ops.dsir import hashed_bigram_counts

    toy = _toy()
    c1 = hashed_bigram_counts(ray.data.from_arrow(toy), buckets=B)
    c3 = hashed_bigram_counts(ray.data.from_arrow(toy).repartition(4),
                              buckets=B)
    assert np.array_equal(c1, c3)


def test_dsir_fused_equals_two_pass(ray_session):
    """target_mask (one fused counting pass) must equal the two-corpus
    two-pass form when the target is the same filtered subset."""
    from ksql_ray.ops.dsir import dsir_select

    toy = _toy()
    raw = ray.data.from_arrow(toy)
    two = collect(dsir_select(raw, raw.filter(expr="is_target"), n=10,
                              buckets=B))

    def mask(batch):
        return batch.column("is_target").to_numpy(zero_copy_only=False)

    fused = collect(dsir_select(raw, n=10, buckets=B, target_mask=mask))
    assert fused.equals(two)
    with pytest.raises(ValueError):
        dsir_select(raw, raw, n=5, target_mask=mask)
    with pytest.raises(ValueError):
        dsir_select(raw, n=5)
