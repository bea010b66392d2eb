"""pack_shards() vs a single-process exclusive-cumsum oracle."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data
from hypothesis import given, settings, strategies as st

from ksql_ray.ops.pack import pack_shards


def _py_oracle(rows, budget):
    # rows: [(doc_id, token_count)] with the split-of-'' = 1 convention
    out, run = {}, 0
    for i, n in sorted(rows):
        out[i] = (run // budget, n)
        run += n
    return out


def _tokens(text):
    n = len([t for t in text.split() if t])
    return max(n, 1)  # whitespace-only counts 1 (split-of-'' convention)


def _run(docs, budget, **kw):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d[0] for d in docs], pa.int64()),
        "text": pa.array([d[1] for d in docs], pa.string()),
    }))
    out = pack_shards(ds, budget, **kw).to_pandas()
    return {r.doc_id: (r.shard_id, r.n_tokens) for r in out.itertuples()}


def test_basic_packing(ray_session):
    docs = [(1, "a b c"), (2, "d e"), (3, "f g h i"), (4, "j")]
    # cumsum(excl): 0, 3, 5, 9 -> budget 5 -> shards 0, 0, 1, 1
    got = _run(docs, budget=5)
    assert got == {1: (0, 3), 2: (0, 2), 3: (1, 4), 4: (1, 1)}


def test_order_is_by_id_not_input(ray_session):
    docs = [(30, "x x x"), (10, "y"), (20, "z z")]
    got = _run(docs, budget=3)
    # id order: 10 (excl 0), 20 (excl 1), 30 (excl 3)
    assert got == {10: (0, 1), 20: (0, 2), 30: (1, 3)}


def test_whitespace_only_counts_one(ray_session):
    got = _run([(1, "   "), (2, "")], budget=1)
    assert got == {1: (0, 1), 2: (1, 1)}


def test_bad_budget(ray_session):
    with pytest.raises(ValueError):
        pack_shards(ray.data.from_arrow(
            pa.table({"doc_id": pa.array([1], pa.int64()), "text": ["a"]})), 0)


@settings(max_examples=10, deadline=None)
@given(st.lists(st.text(alphabet="ab \n", max_size=12), min_size=1,
                max_size=60),
       st.integers(1, 20), st.integers(1, 6))
def test_property_vs_cumsum(ray_session, texts, budget, num_ranges):
    docs = list(enumerate(texts))
    got = _run(docs, budget, num_ranges=num_ranges)
    want = _py_oracle([(i, _tokens(t)) for i, t in docs], budget)
    assert got == want
