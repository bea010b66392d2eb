"""Property tests for the round-4 additions: CMS mergeability and
one-sided error, n-gram repetition invariants, similarity-join
soundness vs a brute-force Jaccard join."""

import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest
import ray.data
from hypothesis import given, settings, strategies as st

from ksql_ray.ops.cms import cms_estimate, counters_from_keys

WORDS = ["a", "bb", "ccc", "dddd", "tool", "user", "xyz"]


@st.composite
def key_arrays(draw):
    n = draw(st.integers(0, 200))
    uniq = draw(st.integers(1, 12))
    idx = draw(st.lists(st.integers(0, uniq - 1), min_size=n,
                        max_size=n))
    return np.array([f"k{i}" for i in idx], dtype=object)


@given(key_arrays(), key_arrays(), st.sampled_from(["fast", "md5"]))
@settings(max_examples=25, deadline=None)
def test_cms_counters_mergeable(a, b, hash):
    # sketch(a ++ b) == sketch(a) + sketch(b): the property every
    # per-batch partial / per-partition actor / cross-partition union
    # relies on
    d, w = 3, 32
    both = counters_from_keys(np.concatenate([a, b]), d, w, hash)
    merged = (counters_from_keys(a, d, w, hash)
              + counters_from_keys(b, d, w, hash))
    assert np.array_equal(both, merged)


@given(key_arrays())
@settings(max_examples=25, deadline=None)
def test_cms_estimate_one_sided(keys):
    d, w = 4, 64
    cnt = counters_from_keys(keys, d, w, "fast")
    dd, bb = np.nonzero(cnt)
    counters = pa.table({"d": pa.array(dd, type=pa.int64()),
                         "bucket": pa.array(bb, type=pa.int64()),
                         "cnt": pa.array(cnt[dd, bb],
                                         type=pa.int64())})
    true = Counter(keys.tolist())
    qk = np.array(sorted(true), dtype=object)
    est = cms_estimate(counters, qk, d, w, "fast").to_pydict()
    for k, e in zip(est["key"], est["est"]):
        assert e >= true[k]                      # never undercounts
        assert e <= len(keys)                    # never above N


@st.composite
def doc_batches(draw):
    n = draw(st.integers(1, 12))
    texts = []
    for _ in range(n):
        k = draw(st.integers(0, 20))
        toks = draw(st.lists(st.sampled_from(WORDS), min_size=k,
                             max_size=k))
        texts.append(" ".join(toks))
    return texts


@given(doc_batches(), st.integers(2, 4))
@settings(max_examples=25, deadline=None)
def test_ngram_repetition_row_independent(texts, n):
    # per-row results must not depend on batch composition: computing
    # the whole batch equals computing each row alone
    from ksql_ray.ops.quality import add_ngram_repetition

    whole = add_ngram_repetition(
        pa.table({"text": pa.array(texts, type=pa.string())}),
        top_ns=(n,), dup_ns=(n,)).to_pydict()
    for i, t in enumerate(texts):
        single = add_ngram_repetition(
            pa.table({"text": pa.array([t], type=pa.string())}),
            top_ns=(n,), dup_ns=(n,)).to_pydict()
        assert whole[f"top_{n}gram_char_frac"][i] == \
            single[f"top_{n}gram_char_frac"][0]
        assert whole[f"dup_{n}gram_char_frac"][i] == \
            single[f"dup_{n}gram_char_frac"][0]
        # dup coverage is a char fraction; top can exceed 1 (overlaps)
        assert 0.0 <= whole[f"dup_{n}gram_char_frac"][i] <= 1.0
        assert whole[f"top_{n}gram_char_frac"][i] >= 0.0


def _brute_jaccard(lt, rt, n=3):
    def grams(t):
        toks = [w for w in re.split(r"\s+", t.strip().lower()) if w]
        if len(toks) < n:
            return None
        return {" ".join(toks[i:i + n])
                for i in range(len(toks) - n + 1)}

    out = {}
    for li, a in lt:
        ga = grams(a)
        if not ga:
            continue
        for ri, b in rt:
            gb = grams(b)
            if not gb:
                continue
            j = len(ga & gb) / len(ga | gb)
            out[(li, ri)] = j
    return out


def test_similarity_join_sound_and_complete_on_dups(ray_session):
    # soundness: every emitted pair's jaccard matches brute force and
    # clears the threshold; completeness floor: exact duplicates are
    # always found (they collide in every band)
    from ksql_ray.ops.dedup import similarity_join

    rng = np.random.default_rng(3)
    mk = lambda: " ".join(
        np.random.default_rng(int(rng.integers(1 << 30))).choice(
            WORDS, 10))
    lt = [(i, mk()) for i in range(12)]
    rt = [(100 + i, t) for i, (_, t) in enumerate(lt[:6])]  # 6 dups
    rt += [(200 + i, mk()) for i in range(6)]
    left = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([i for i, _ in lt], pa.int64()),
        "text": pa.array([t for _, t in lt])}))
    right = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([i for i, _ in rt], pa.int64()),
        "text": pa.array([t for _, t in rt])}))
    got = pa.Table.from_pylist(
        similarity_join(left, right, threshold=0.6).take_all())
    brute = _brute_jaccard(lt, rt)
    for la, rb, j in zip(got.column("left_id").to_pylist(),
                         got.column("right_id").to_pylist(),
                         got.column("jaccard").to_pylist()):
        assert j >= 0.6
        assert j == pytest.approx(brute[(la, rb)], abs=1e-9)
    found = set(zip(got.column("left_id").to_pylist(),
                    got.column("right_id").to_pylist()))
    for i in range(6):
        assert (i, 100 + i) in found


# ------------------------------------------------------- throttle chain
@st.composite
def segmented_times(draw):
    """Random per-key ts arrays: list of sorted int64 segments."""
    n_seg = draw(st.integers(1, 6))
    segs = []
    for _ in range(n_seg):
        m = draw(st.integers(0, 30))
        ts = sorted(draw(st.lists(st.integers(0, 400), min_size=m,
                                  max_size=m)))
        segs.append(np.array(ts, dtype=np.int64))
    return segs


@given(segmented_times(), st.integers(1, 100))
@settings(max_examples=60, deadline=None)
def test_chain_emitted_matches_sequential_reference(segs, interval):
    from ksql_ray.ops.rows import _chain_emitted

    t = np.concatenate([s for s in segs]) if segs else np.zeros(0)
    starts = np.array(np.cumsum([0] + [len(s) for s in segs[:-1]]),
                      dtype=np.int64)
    starts = starts[[len(s) > 0 for s in segs]]
    # drop empty segments (the op's np.unique(seg) never yields them)
    t = t.astype(np.int64)
    got = _chain_emitted(t, starts, interval)

    # one-row-at-a-time reference
    exp = np.zeros(len(t), dtype=bool)
    pos = 0
    for s in segs:
        last = None
        for j in range(len(s)):
            if last is None or s[j] >= last + interval:
                exp[pos + j] = True
                last = s[j]
        pos += len(s)
    assert np.array_equal(got, exp)

    # invariants: first row of every segment emits; emitted rows are
    # >= interval apart within a segment
    pos = 0
    for s in segs:
        idx = np.flatnonzero(got[pos:pos + len(s)])
        if len(s):
            assert got[pos]
        if len(idx) > 1:
            assert (np.diff(s[idx]) >= interval).all()
        pos += len(s)


@given(st.lists(st.floats(-1e6, 1e6, allow_nan=False), min_size=1,
                max_size=50))
@settings(max_examples=40, deadline=None)
def test_interp_median_matches_numpy(vals):
    from ksql_ray.ops.profile import _interp_median

    v = np.sort(np.array(vals, dtype=np.float64))
    got = _interp_median(v, np.array([0]), np.array([len(v)]))
    assert got[0] == pytest.approx(np.median(v), rel=0, abs=1e-9)


# ----------------------------------------------------- validator partials
@st.composite
def mixed_column(draw):
    n = draw(st.integers(0, 80))
    vals = draw(st.lists(
        st.one_of(st.none(), st.floats(-100, 200, allow_nan=False)),
        min_size=n, max_size=n))
    return vals


@given(mixed_column(), st.floats(-50, 50, allow_nan=False),
       st.floats(60, 150, allow_nan=False))
@settings(max_examples=40, deadline=None)
def test_counter_partial_range_matches_brute(vals, lo, hi):
    from ksql_ray.ops.validate import _counter_partial

    t = pa.table({"x": pa.array(vals, type=pa.float64())})
    out = _counter_partial(t, [("range", "x", lo, hi),
                               ("not_null", "x")]).to_pydict()
    got = dict(zip(out["rule"], out["violations"]))
    brute_range = sum(1 for v in vals
                      if v is not None and (v < lo or v > hi))
    brute_null = sum(1 for v in vals if v is None)
    assert got["range(x)"] == brute_range
    assert got["not_null(x)"] == brute_null


@given(st.lists(st.one_of(st.none(),
                          st.sampled_from(["a", "b", "cc", "D9"])),
                max_size=60))
@settings(max_examples=40, deadline=None)
def test_counter_partial_set_and_regex_match_brute(vals):
    import re

    from ksql_ray.ops.validate import _counter_partial

    t = pa.table({"k": pa.array(vals, type=pa.string())})
    out = _counter_partial(t, [("in_set", "k", ["a", "b"]),
                               ("regex", "k", "[a-z]+")]).to_pydict()
    got = dict(zip(out["rule"], out["violations"]))
    assert got["in_set(k)"] == sum(
        1 for v in vals if v is not None and v not in ("a", "b"))
    assert got["regex(k)"] == sum(
        1 for v in vals
        if v is not None and not re.fullmatch("[a-z]+", v))
