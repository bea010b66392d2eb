"""contamination() vs a pure-Python n-gram overlap oracle."""

import pyarrow as pa
import ray.data
from hypothesis import given, settings, strategies as st

from ksql_ray.ops.decontam import contamination


def _py_ngrams(text, n):
    toks = text.strip().lower().split()
    return {" ".join(toks[i:i + n]) for i in range(len(toks) - n + 1)}


def _py_oracle(train, bench, n):
    bg = set().union(*(_py_ngrams(t, n) for _, t in bench)) if bench else set()
    return {i: len(_py_ngrams(t, n) & bg) for i, t in train}


def _run(train, bench, n):
    def ds(rows):
        return ray.data.from_arrow(pa.table({
            "doc_id": pa.array([r[0] for r in rows], pa.int64()),
            "text": pa.array([r[1] for r in rows], pa.string()),
        }))

    out = contamination(ds(train), ds(bench), n=n).to_pandas()
    return dict(zip(out["doc_id"], out["matched_grams"]))


def test_basic_overlap(ray_session):
    train = [(1, "a b c d e f"), (2, "x y z w q"), (3, "c d e g h")]
    bench = [(10, "b c d e f z"), (11, "nothing shared here at all")]
    got = _run(train, bench, n=3)
    assert got == _py_oracle(train, bench, 3)
    assert got[1] == 3   # 'b c d', 'c d e', 'd e f'
    assert got[2] == 0
    assert got[3] == 1   # 'c d e'


def test_short_docs_zero_grams(ray_session):
    # < n tokens -> no grams -> never contaminated (strict semantics)
    train = [(1, "a b"), (2, ""), (3, "   ")]
    bench = [(10, "a b c")]
    got = _run(train, bench, n=3)
    assert got == {1: 0, 2: 0, 3: 0}


def test_repeated_gram_counts_once(ray_session):
    train = [(1, "p q r p q r p q r")]
    bench = [(10, "p q r")]
    # 'p q r' appears 3x in doc 1 but is ONE distinct matched gram;
    # 'q r p' / 'r p q' also match nothing in bench
    got = _run(train, bench, n=3)
    assert got == {1: 1}


def test_empty_bench(ray_session):
    got = _run([(1, "a b c d")], [], n=3)
    assert got == {1: 0}


@settings(max_examples=15, deadline=None)
@given(st.data())
def test_property_vs_python(ray_session, data):
    words = ["w%d" % i for i in range(8)]
    doc = st.lists(st.sampled_from(words), min_size=0, max_size=12).map(" ".join)
    train = [(i, data.draw(doc)) for i in range(6)]
    bench = [(100 + i, data.draw(doc)) for i in range(3)]
    n = data.draw(st.integers(2, 4))
    assert _run(train, bench, n) == _py_oracle(train, bench, n)
