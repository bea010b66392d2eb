"""Fuzzy edit-distance-1 pairs (ops/fuzzy.py): brute-force Levenshtein
pin, star-cap behavior, unicode, length filters. The sf0.01 DuckDB
levenshtein oracle runs via the op_fuzzy_pairs gate."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from conftest import collect
from ksql_ray.ops.fuzzy import _ed1_mask, fuzzy_pairs


def _lev(a, b):
    if len(a) < len(b):
        a, b = b, a
    prev = list(range(len(b) + 1))
    for i, ca in enumerate(a, 1):
        cur = [i]
        for j, cb in enumerate(b, 1):
            cur.append(min(prev[j] + 1, cur[j - 1] + 1,
                           prev[j - 1] + (ca != cb)))
        prev = cur
    return prev[-1]


def _pairs(got):
    return {(r["tok_a"], r["tok_b"]) for r in got.to_pylist()}


def test_fuzzy_pairs_brute(ray_session):
    rng = np.random.default_rng(3)
    base = ["alpha", "beta", "gamma", "delta", "epsilon", "zeta",
            "kappa", "omega", "ab", "ba", "x", "y", "sigma"]
    vals = []
    for w in base:
        vals += [w, w + "q", "z" + w[1:], w[::-1]]
        if len(w) > 1:
            vals.append(w[:-1])
    for _ in range(300):
        vals.append("".join(rng.choice(list("abcdefg"),
                                       rng.integers(1, 9))))
    got = collect(fuzzy_pairs(
        ray.data.from_arrow(pa.table({"s": pa.array(vals * 3)}))
        .repartition(5), "s", min_len=1, max_len=12,
        max_full_pairwise=100000))
    dv = sorted({v for v in vals if 1 <= len(v) <= 12})
    want = {(a, b) for i, a in enumerate(dv) for b in dv[i + 1:]
            if _lev(a, b) <= 1}
    assert _pairs(got) == want


def test_fuzzy_pairs_star_cap_keeps_representative(ray_session):
    # 80 same-length strings differing only in last char share one
    # deletion-variant bucket -> star pairs around the min member
    vals = [f"word{chr(48 + i)}" for i in range(80)]
    got = collect(fuzzy_pairs(ray.data.from_arrow(
        pa.table({"s": vals})), "s", max_full_pairwise=16))
    ps = _pairs(got)
    rep = min(vals)
    # every member still pairs with the representative
    assert {(rep, v) for v in vals if v != rep} <= ps


def test_fuzzy_pairs_unicode_and_length_filter(ray_session):
    vals = ["café", "cafe", "cafés", "c", "a" * 30]
    got = collect(fuzzy_pairs(ray.data.from_arrow(
        pa.table({"s": vals})), "s", min_len=2, max_len=12))
    # substitution é->e and insertion of s are both distance 1;
    # "c" (too short) and the 30-char string (too long) are excluded
    assert _pairs(got) == {("cafe", "café"),
                           ("café", "cafés")}


def test_ed1_mask_direct():
    a = ["abc", "abc", "abc", "ab", "ab", "kitten", "", "aaa"]
    b = ["abd", "abcd", "xbc", "ba", "abc", "sitten", "a", "aa"]
    # "" is below any min_len in the pipeline but the kernel is total
    got = _ed1_mask(a, b, width=8)
    want = [_lev(x, y) <= 1 for x, y in zip(a, b)]
    assert got.tolist() == want
