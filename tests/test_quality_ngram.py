"""Gopher n-gram repetition stats (ops/quality.add_ngram_repetition)
vs a brute-force Counter oracle, handcrafted exact cases, and edge
cases. The sf0.01 SQL oracle runs via the op_ngram_repetition gate in
test_driver_contract.py."""

import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest

from ksql_ray.ops.quality import add_ngram_repetition


def _round6(x):
    return np.floor(x * 1e6 + 0.5) / 1e6


def _brute(text, n):
    toks = [w for w in re.split(r"\s+", (text or "").lower()) if w]
    total = sum(len(w) for w in toks)
    grams = [tuple(toks[i:i + n]) for i in range(len(toks) - n + 1)]
    c = Counter(grams)
    top = 0.0
    if grams and total:
        best = max(c.items(),
                   key=lambda kv: (kv[1], sum(len(w) for w in kv[0])))
        top = best[1] * sum(len(w) for w in best[0]) / total
    covered = set()
    for i, g in enumerate(grams):
        if c[g] > 1:
            covered.update(range(i, i + n))
    dup = (sum(len(toks[i]) for i in covered) / total) if total else 0.0
    return float(_round6(top)), float(_round6(dup))


def test_ngram_handcrafted():
    # "a b a b a": top 2-gram ("a","b") x2, chars 2*2/5 = 0.8;
    # dup 2-grams cover all tokens -> 5/5 = 1.0
    t = pa.table({"text": ["a b a b a"]})
    out = add_ngram_repetition(t, top_ns=(2,), dup_ns=(2,)).to_pydict()
    assert out["top_2gram_char_frac"] == [0.8]
    assert out["dup_2gram_char_frac"] == [1.0]
    # "a b a c a": all three 3-grams distinct -> dup 0; top occurs
    # once: 3/5
    t2 = pa.table({"text": ["a b a c a"]})
    out = add_ngram_repetition(t2, top_ns=(3,), dup_ns=(3,)).to_pydict()
    assert out["top_3gram_char_frac"] == [0.6]
    assert out["dup_3gram_char_frac"] == [0.0]


def test_ngram_tiebreak_char_total():
    # both 2-grams occur once; winner is the one with more chars
    t = pa.table({"text": ["aa b cccc"]})
    out = add_ngram_repetition(t, top_ns=(2,), dup_ns=()).to_pydict()
    # ("b","cccc") = 5 chars > ("aa","b") = 3; total = 7
    assert out["top_2gram_char_frac"] == [float(_round6(5 / 7))]


def test_ngram_union_coverage_counts_once():
    # "x x x x": dup 2-gram (x,x) occurrences overlap; union covers
    # all 4 tokens exactly once -> 1.0 (not > 1)
    t = pa.table({"text": ["x x x x"]})
    out = add_ngram_repetition(t, top_ns=(2,), dup_ns=(2,)).to_pydict()
    assert out["dup_2gram_char_frac"] == [1.0]
    # top 2-gram (x,x) occurs 3 times, chars 3*2/4 = 1.5 (overlaps
    # double-count by definition, may exceed 1)
    assert out["top_2gram_char_frac"] == [1.5]


def test_ngram_brute_force_random():
    rng = np.random.default_rng(42)
    vocab = np.array(["the", "cat", "sat", "on", "a", "mat", "zz",
                      "longword"], dtype=object)
    texts = []
    for i in range(120):
        k = int(rng.integers(0, 30))
        words = list(vocab[rng.integers(0, len(vocab), k)])
        sep = [" ", "  ", "\n", "\t"][int(rng.integers(0, 4))]
        texts.append(sep.join(words) + (" " if i % 3 == 0 else ""))
    texts += [None, "", "   ", "one"]
    t = pa.table({"doc_id": list(range(len(texts))),
                  "text": pa.array(texts, type=pa.string())})
    ns = (2, 3, 5)
    out = add_ngram_repetition(t, top_ns=ns, dup_ns=ns).to_pydict()
    for i, txt in enumerate(texts):
        for n in ns:
            top, dup = _brute(txt, n)
            assert out[f"top_{n}gram_char_frac"][i] == pytest.approx(
                top, abs=1e-9), (i, n, txt)
            assert out[f"dup_{n}gram_char_frac"][i] == pytest.approx(
                dup, abs=1e-9), (i, n, txt)


def test_ngram_multirow_isolation():
    # windows must not cross document boundaries
    t = pa.table({"text": ["p q", "q p q p"]})
    out = add_ngram_repetition(t, top_ns=(2,), dup_ns=(2,)).to_pydict()
    assert out["top_2gram_char_frac"] == [1.0, 1.0]   # (q,p) x2 *2/4
    assert out["dup_2gram_char_frac"] == [0.0, 1.0]


def test_ngram_large_string_and_errors():
    t = pa.table({"text": pc.cast(pa.array(["a b a b"]),
                                  pa.large_string())})
    out = add_ngram_repetition(t, top_ns=(2,), dup_ns=(2,)).to_pydict()
    assert out["dup_2gram_char_frac"] == [1.0]
    with pytest.raises(ValueError):
        add_ngram_repetition(t, top_ns=(1,))
