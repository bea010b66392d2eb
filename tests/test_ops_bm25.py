"""BM25 retrieval (ops/bm25.py): brute-force pin on a toy corpus plus
edge cases (empty query, no-match docs excluded, top-k cap, tie order).
The sf0.01 DuckDB oracle runs via the op_bm25_topk gate in
test_driver_contract.py."""

import math
import re
from collections import Counter

import pyarrow as pa
import pytest
import ray.data

from conftest import collect


def _toy():
    return pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array([
            "cat sat on the mat",
            "the cat cat cat",            # tf saturation case
            "dog ran",                    # no query-term match
            "   ",                        # whitespace-only -> [''] token
            "cat and mat and cat",
            "mat",                        # short doc, dl < avgdl
        ]),
    })


def _brute(table, query, k1=1.2, b=0.75):
    docs = [re.split(r"\s+", t.strip().lower()) if t is not None else []
            for t in table.column("text").to_pylist()]
    terms = sorted(set(query.strip().lower().split()))
    n = len(docs)
    avgdl = sum(len(d) for d in docs) / n
    df = {t: sum(1 for d in docs if t in d) for t in terms}
    out = []
    for i, d in enumerate(docs):
        tf = Counter(d)
        s = 0.0
        for t in terms:
            if tf[t] == 0:
                continue
            idf = math.log(1 + (n - df[t] + 0.5) / (df[t] + 0.5))
            s += (idf * tf[t] * (k1 + 1)
                  / (tf[t] + k1 * (1 - b + b * len(d) / avgdl)))
        if s > 0:
            out.append((i, s))
    out.sort(key=lambda r: (-r[1], r[0]))
    return out


def test_bm25_brute_force(ray_session):
    from ksql_ray.ops.bm25 import bm25_topk

    toy = _toy()
    got = collect(bm25_topk(ray.data.from_arrow(toy), "cat mat", k=10))
    want = _brute(toy, "cat mat")
    assert got.num_rows == len(want) == 4       # doc 2 and 3 excluded
    for row, (doc, score) in zip(got.to_pylist(), want):
        assert row["doc_id"] == doc
        assert row["score"] == pytest.approx(score, rel=1e-12)


def test_bm25_topk_cap(ray_session):
    """k smaller than the match count: per-batch capping must still
    produce the exact global top-k (same set AND order as brute force)."""
    from ksql_ray.ops.bm25 import bm25_topk

    toy = _toy()
    got = collect(
        bm25_topk(ray.data.from_arrow(toy).repartition(3), "cat mat", k=2))
    want = _brute(toy, "cat mat")[:2]
    assert [(r["doc_id"], pytest.approx(r["score"], rel=1e-12))
            for r in got.to_pylist()] == [(d, pytest.approx(s, rel=1e-12))
                                          for d, s in want]


def test_bm25_empty_query_raises(ray_session):
    from ksql_ray.ops.bm25 import bm25_topk

    with pytest.raises(ValueError):
        bm25_topk(ray.data.from_arrow(_toy()), "   ")


def test_bm25_unseen_term_no_nan(ray_session):
    """A query term absent from the corpus (df=0) must not poison the
    scores (idf stays finite; matched terms still rank)."""
    from ksql_ray.ops.bm25 import bm25_topk

    got = collect(bm25_topk(ray.data.from_arrow(_toy()),
                            "cat zzz_unseen", k=10))
    assert got.num_rows == 3                     # the three cat docs
    assert all(math.isfinite(r["score"]) for r in got.to_pylist())


def test_bm25_multi_equals_single(ray_session):
    """Each query's multi-retrieval slice must equal its own
    single-query bm25_topk result."""
    from ksql_ray.ops.bm25 import bm25_topk, bm25_topk_multi

    toy = _toy()
    ds = ray.data.from_arrow(toy).repartition(3)
    multi = collect(bm25_topk_multi(
        ds, {"a": "cat mat", "b": "mat dog"}, k=3)).to_pylist()
    for qid, q in (("a", "cat mat"), ("b", "mat dog")):
        single = collect(bm25_topk(ds, q, k=3)).to_pylist()
        mine = [(r["doc_id"], r["score"]) for r in multi
                if r["qid"] == qid]
        assert mine == [(r["doc_id"], pytest.approx(r["score"]))
                        for r in single]


def test_bm25_multi_validation(ray_session):
    from ksql_ray.ops.bm25 import bm25_topk_multi

    ds = ray.data.from_arrow(_toy())
    with pytest.raises(ValueError):
        bm25_topk_multi(ds, {}, k=3)
    with pytest.raises(ValueError):
        bm25_topk_multi(ds, {"a": "  "}, k=3)
