"""Bigram LM scoring (ops/lm.py): brute-force pins + DuckDB oracle +
min_count pruning semantics."""

import math
import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from conftest import SF_DIR, collect


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    return ray.data.read_parquet(f"{SF_DIR}/documents.parquet")


def _toy():
    return pa.table({
        "doc_id": pa.array(range(5), pa.int64()),
        "text": pa.array([
            "the cat sat on the mat",
            "the cat ran",
            "one",                       # single token: 0 transitions
            "   ",                       # whitespace-only -> [''] token
            "the cat sat on the mat",    # exact dup boosts those transitions
        ]),
    })


def _brute(table, k=0.1, min_count=1):
    docs = [re.split(r"\s+", t.strip().lower()) if t is not None else []
            for t in table.column("text").to_pylist()]
    trans = Counter()
    for toks in docs:
        trans.update(zip(toks, toks[1:]))
    ctx = Counter()
    for (w1, _), c in trans.items():
        ctx[w1] += c
    vocab = {t for toks in docs for t in toks}
    v = len(vocab)
    kept = {g: c for g, c in trans.items() if c >= min_count}
    out = []
    for toks in docs:
        lp = 0.0
        n = 0
        for g in zip(toks, toks[1:]):
            c2 = kept.get(g, 0)
            c1 = ctx.get(g[0], 0)
            lp += math.log((c2 + k) / (c1 + k * v))
            n += 1
        out.append((n, lp))
    return out, v


def test_bigram_lm_brute_force(ray_session):
    from ksql_ray.ops.lm import score_bigram_lm, train_bigram_lm

    tbl = _toy()
    ds = ray.data.from_arrow(tbl)
    lm = train_bigram_lm(ds, "text")
    exp, v = _brute(tbl)
    assert lm.vocab_size == v
    got = collect(score_bigram_lm(ds, lm)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    for i, (n, lp) in enumerate(exp):
        assert got["n_trans"][i] == n
        assert got["lm_logprob"][i] == pytest.approx(lp, abs=1e-9)
    # single-token and whitespace-only docs score exactly 0
    assert got["lm_logprob"][2] == 0.0 and got["n_trans"][3] == 0


def test_bigram_lm_min_count_prunes_to_smoothing_mass(ray_session):
    from ksql_ray.ops.lm import score_bigram_lm, train_bigram_lm

    tbl = _toy()
    ds = ray.data.from_arrow(tbl)
    lm = train_bigram_lm(ds, "text", min_count=2)
    exp, _ = _brute(tbl, min_count=2)
    got = collect(score_bigram_lm(ds, lm)).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    for i, (n, lp) in enumerate(exp):
        assert got["lm_logprob"][i] == pytest.approx(lp, abs=1e-9), i
    # pruning must strictly lower the score of docs with rare transitions
    full = collect(score_bigram_lm(ds, train_bigram_lm(ds, "text"))) \
        .to_pandas().sort_values("doc_id").reset_index(drop=True)
    assert got["lm_logprob"][1] < full["lm_logprob"][1]


def test_bigram_lm_vs_duckdb(docs_ds, duck):
    from ksql_ray.ops.lm import score_bigram_lm, train_bigram_lm
    from ksql_ray.pipelines.driver_queries import REGISTRY, _round_cols

    lm = train_bigram_lm(docs_ds, "text")
    got = _round_cols(collect(score_bigram_lm(docs_ds, lm)),
                      {"lm_logprob": 4}).to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    ora = duck.execute(REGISTRY["op_lm_score"].sql).arrow().to_pandas() \
        .sort_values("doc_id").reset_index(drop=True)
    assert len(got) == len(ora)
    assert (got["n_trans"].to_numpy() == ora["n_trans"].to_numpy()).all()
    np.testing.assert_array_equal(got["lm_logprob"].to_numpy(),
                                  ora["lm_logprob"].to_numpy())


def test_bigram_lm_duplicate_docs_score_higher(docs_ds, ray_session):
    """The CCNet use-case sanity check: a doc duplicated in the corpus has
    higher per-transition probability than a unique doc of similar length."""
    from ksql_ray.ops.lm import score_bigram_lm, train_bigram_lm

    tbl = _toy()
    ds = ray.data.from_arrow(tbl)
    lm = train_bigram_lm(ds, "text")
    got = collect(score_bigram_lm(ds, lm)).to_pandas() \
        .set_index("doc_id")
    per0 = got.loc[0, "lm_logprob"] / got.loc[0, "n_trans"]
    per1 = got.loc[1, "lm_logprob"] / got.loc[1, "n_trans"]
    assert per0 > per1  # duplicated sentence transitions are more probable
