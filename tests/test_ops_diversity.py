"""Corpus distinct-n diversity (ops/diversity.py). The sf0.01 DuckDB
oracle runs via the op_distinct_ngrams gate."""

import ray
import ray.data

from ksql_ray.ops.diversity import distinct_ngram_ratios


def test_distinct_n_hand_checked(ray_session):
    # tokens: [a b a] [a b] -> uni: 5 occ, 2 distinct; bi: "a b","b a",
    # "a b" -> 3 occ, 2 distinct
    ds = ray.data.from_items([
        {"doc_id": 0, "text": "a b a"},
        {"doc_id": 1, "text": "a b"},
    ])
    t = distinct_ngram_ratios(ds, ns=(1, 2))
    got = {r["n"]: (r["distinct_grams"], r["total_grams"],
                    r["distinct_ratio"]) for r in t.to_pylist()}
    assert got[1] == (2, 5, 0.4)
    assert got[2] == (2, 3, round(2 / 3, 6))


def test_distinct_n_template_collapse_signal(ray_session):
    # a fully templated corpus shows a LOW distinct-2 ratio vs varied
    varied = ray.data.from_items(
        [{"doc_id": i, "text": f"w{i} w{i+1} w{i+2}"} for i in range(50)])
    collapsed = ray.data.from_items(
        [{"doc_id": i, "text": "same old phrase"} for i in range(50)])
    rv = distinct_ngram_ratios(varied, ns=(2,)).to_pylist()[0]
    rc = distinct_ngram_ratios(collapsed, ns=(2,)).to_pylist()[0]
    assert rv["distinct_ratio"] > 0.5 > rc["distinct_ratio"]


def test_empty_and_single_token(ray_session):
    ds = ray.data.from_items([
        {"doc_id": 0, "text": ""},
        {"doc_id": 1, "text": "one"},
    ])
    t = distinct_ngram_ratios(ds, ns=(1, 2))
    got = {r["n"]: (r["distinct_grams"], r["total_grams"])
           for r in t.to_pylist()}
    # "" splits to one empty token; no doc has 2 tokens -> no bigrams
    assert got[1] == (2, 2)
    assert got[2] == (0, 0)
