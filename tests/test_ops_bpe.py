"""BPE subword vocabulary (ops/bpe.py): canonical Sennrich merges,
zero-merge invariant, monotonicity, partitioning-independence. The
sf0.01 DuckDB oracle runs via the op_bpe_token_count gate; the learned
vocab's determinism is pinned here (op_bpe_vocab is rows-only)."""

import pyarrow as pa
import pytest
import ray
import ray.data

from ksql_ray.ops.bpe import bpe_token_counts, learn_bpe, merges_table

DOCS = ["low low low low low", "lower lower newest newest",
        "newest newest newest newest", "widest widest widest"]


def _ds(docs=DOCS, blocks=None):
    items = [{"doc_id": i, "text": t} for i, t in enumerate(docs)]
    if blocks:
        return ray.data.from_items(items, override_num_blocks=blocks)
    return ray.data.from_items(items)


def _counts(ds):
    t = pa.concat_tables(
        [r for r in ray.get(ds.materialize().to_arrow_refs())
         if r.num_columns], promote_options="default")
    return dict(zip(t.column("doc_id").to_pylist(),
                    t.column("bpe_token_count").to_pylist()))


def test_sennrich_canonical_merges(ray_session):
    # the ACL'16 paper's worked example: es, est, est</w>, lo, low
    m = learn_bpe(_ds(), num_merges=5)
    assert m == [("e", "s"), ("es", "t"), ("est", "</w>"),
                 ("l", "o"), ("lo", "w")]


def test_zero_merges_is_char_plus_eow(ray_session):
    got = _counts(bpe_token_counts(_ds(), []))
    want = {i: sum(len(w) + 1 for w in t.split())
            for i, t in enumerate(DOCS)}
    assert got == want


def test_counts_monotone_in_merges(ray_session):
    m = learn_bpe(_ds(), num_merges=10)
    base = _counts(bpe_token_counts(_ds(), []))
    half = _counts(bpe_token_counts(_ds(), m[:3]))
    full = _counts(bpe_token_counts(_ds(), m))
    for i in base:
        assert full[i] <= half[i] <= base[i]
    # fully-merged whole words collapse to single tokens
    assert full[0] == 5    # "low" x5
    assert full[2] == 4    # "newest" x4


def test_learn_partitioning_independent(ray_session):
    a = learn_bpe(_ds(blocks=1), num_merges=8)
    b = learn_bpe(_ds(blocks=4), num_merges=8)
    assert a == b


def test_empty_and_null_text(ray_session):
    ds = ray.data.from_items([
        {"doc_id": 0, "text": ""},
        {"doc_id": 1, "text": None},
        {"doc_id": 2, "text": "  "},
        {"doc_id": 3, "text": "ab"},
    ])
    got = _counts(bpe_token_counts(ds, []))
    assert got == {0: 0, 1: 0, 2: 0, 3: 3}


def test_merges_table_shape(ray_session):
    m = learn_bpe(_ds(), num_merges=4)
    t = merges_table(m)
    assert t.column_names == ["rank", "left", "right", "token"]
    assert t.column("token").to_pylist() == [a + b for a, b in m]
