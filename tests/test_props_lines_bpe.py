"""Property tests for the line-cleanup and BPE ops: random corpora,
random partitionings — invariants that must hold for ANY input."""

import numpy as np
import pyarrow as pa
import pytest
import ray
import ray.data
from hypothesis import given, settings
from hypothesis import strategies as st

from ksql_ray.ops.bpe import bpe_token_counts, learn_bpe
from ksql_ray.ops.lines import dedup_lines, strip_frequent_lines

_words = st.lists(st.sampled_from(
    ["alpha", "beta", "gamma", "delta", "x", "yz", ""]), max_size=8)
_lines = st.lists(st.sampled_from(
    ["header", "body text", "footer", "a", ""]), max_size=6)


def _docs(texts, blocks=None):
    items = [{"doc_id": i, "text": t} for i, t in enumerate(texts)]
    if blocks:
        return ray.data.from_items(items, override_num_blocks=blocks)
    return ray.data.from_items(items)


def _texts(ds):
    t = pa.concat_tables(
        [r for r in ray.get(ds.materialize().to_arrow_refs())
         if r.num_columns], promote_options="default")
    return dict(zip(t.column("doc_id").to_pylist(),
                    t.column("text").to_pylist()))


@settings(max_examples=10, deadline=None)
@given(docs=st.lists(_lines, min_size=1, max_size=12),
       blocks=st.sampled_from([1, 3]))
def test_dedup_lines_matches_python(ray_session, docs, blocks):
    texts = ["\n".join(d) for d in docs]
    got = _texts(dedup_lines(_docs(texts, blocks)))
    for i, t in enumerate(texts):
        seen, keep = set(), []
        for ln in t.split("\n"):
            if ln not in seen:
                seen.add(ln)
                keep.append(ln)
        assert got[i] == "\n".join(keep)


@settings(max_examples=10, deadline=None)
@given(docs=st.lists(_lines, min_size=1, max_size=12),
       min_docs=st.integers(1, 4))
def test_strip_frequent_matches_python(ray_session, docs, min_docs):
    texts = ["\n".join(d) for d in docs]
    got = _texts(strip_frequent_lines(_docs(texts), min_docs=min_docs))
    from collections import defaultdict

    indocs = defaultdict(set)
    for i, t in enumerate(texts):
        for ln in set(t.split("\n")):
            indocs[ln].add(i)
    for i, t in enumerate(texts):
        keep = [ln for ln in t.split("\n")
                if len(indocs[ln]) < min_docs]
        assert got[i] == "\n".join(keep)


@settings(max_examples=8, deadline=None)
@given(docs=st.lists(_words, min_size=1, max_size=10),
       merges=st.integers(0, 12), blocks=st.sampled_from([1, 4]))
def test_bpe_counts_invariants(ray_session, docs, merges, blocks):
    texts = [" ".join(d) for d in docs]
    ds = _docs(texts, blocks)
    m = learn_bpe(ds, num_merges=merges) if merges else []

    def counts(mm):
        t = pa.concat_tables(
            [r for r in ray.get(bpe_token_counts(
                _docs(texts, blocks), mm).materialize().to_arrow_refs())
             if r.num_columns], promote_options="default")
        return dict(zip(t.column("doc_id").to_pylist(),
                        t.column("bpe_token_count").to_pylist()))

    base = counts([])
    full = counts(m)
    for i, t in enumerate(texts):
        # base-case: chars + eow per non-empty word (empty text -> 0;
        # the op splits trim(lower(text)) on \s+, i.e. str.split())
        want = (sum(len(w) + 1 for w in t.strip().split())
                if t.strip() else 0)
        assert base[i] == want
        assert 0 <= full[i] <= base[i]   # merges never grow counts
