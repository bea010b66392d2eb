"""Winnowing fingerprints (ops/fingerprint.py) vs a Python-loop
reference of the SIGMOD'03 selection rule, in both hash forms."""

import hashlib

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from conftest import SF_DIR

from ksql_ray.ops.fingerprint import (
    _gram_hashes_fast, _tokenize, winnow_fingerprints)

K, W = 3, 4


def _ref_select(hs, w):
    """Reference winnowing over one doc's gram-hash sequence."""
    n = len(hs)
    if n == 0:
        return []
    sel = set()
    if n < w:
        m = min(hs)
        pos = max(i for i in range(n) if hs[i] == m)
        sel.add((pos, hs[pos]))
    else:
        for j in range(n - w + 1):
            win = hs[j:j + w]
            m = min(win)
            pos = j + max(i for i in range(w) if win[i] == m)
            sel.add((pos, hs[pos]))
    return sorted(sel)


def _ref_md5(text, k, w):
    toks = (text or "").strip().lower().split()
    grams = [" ".join(toks[i:i + k]) for i in range(max(len(toks) - k + 1, 0))]
    hs = [int(hashlib.md5(g.encode()).hexdigest()[:15], 16) for g in grams]
    return _ref_select(hs, w)


@pytest.mark.parametrize("hash_form", ["md5", "fast"])
def test_matches_reference(ray_session, hash_form):
    df = pd.read_parquet(f"{SF_DIR}/documents.parquet")
    ds = ray.data.read_parquet(f"{SF_DIR}/documents.parquet")
    out = winnow_fingerprints(ds, k=K, window=W, hash=hash_form).to_pandas()
    got = {d: sorted(zip(g["pos"], g["h"])) for d, g in out.groupby("doc_id")}
    for _, r in df.iterrows():
        if hash_form == "md5":
            exp = _ref_md5(r["text"], K, W)
        else:
            flat, counts = _tokenize(pa.array([r["text"]], pa.string()))
            hs = _gram_hashes_fast(flat, counts, K).astype(np.int64).tolist()
            exp = _ref_select(hs, W)
        act = [tuple(x) for x in got.get(r["doc_id"], [])]
        assert act == exp, f"doc {r['doc_id']}"


def test_edge_docs(ray_session):
    docs = pa.table({
        "doc_id": pa.array([1, 2, 3, 4, 5], pa.int64()),
        "text": pa.array(["", "   ", "one two", "a b c",      # 0/0/0/1 grams
                          "w x y z w x y z w x y z"], pa.string()),
    })
    out = winnow_fingerprints(ray.data.from_arrow(docs),
                              k=K, window=W, hash="md5").to_pandas()
    assert set(out["doc_id"]) == {4, 5}
    assert len(out[out.doc_id == 4]) == 1          # single-gram doc: 1 pick
    ref = dict(_ref_md5("a b c", K, W))
    assert out[out.doc_id == 4].iloc[0]["pos"] == list(ref)[0]
    # repeated text: selected picks must be a subset of all gram positions
    assert (out[out.doc_id == 5]["pos"] < 10).all()


def test_guarantee_shared_span(ray_session):
    """The winnowing guarantee: two docs sharing >= W + K - 1 consecutive
    tokens share at least one selected hash."""
    rng = np.random.default_rng(7)
    span = " ".join(f"tok{v}" for v in rng.integers(0, 1000, size=W + K - 1))
    mk = lambda seed: " ".join(
        f"w{v}" for v in np.random.default_rng(seed).integers(0, 1000, 30))
    docs = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([mk(1) + " " + span + " " + mk(2),
                          mk(3) + " " + span + " " + mk(4)], pa.string()),
    })
    out = winnow_fingerprints(ray.data.from_arrow(docs),
                              k=K, window=W, hash="fast").to_pandas()
    h1 = set(out[out.doc_id == 1]["h"])
    h2 = set(out[out.doc_id == 2]["h"])
    assert h1 & h2, "shared span must share a fingerprint hash"


def test_validation(ray_session):
    ds = ray.data.range(1)
    with pytest.raises(ValueError, match="k and window"):
        winnow_fingerprints(ds, k=0, window=4)
    with pytest.raises(ValueError, match="hash must be"):
        winnow_fingerprints(ds, hash="sha1")
