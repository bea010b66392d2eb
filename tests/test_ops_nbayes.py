"""Multinomial Naive Bayes (ops/nbayes.py): brute-force pins on a toy
corpus, OOV modes, vocab cap, tie-break, and null-label handling."""

import math
import re
from collections import Counter

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from conftest import collect

from ksql_ray.ops.nbayes import classify_nb, score_nb, train_nb


def _toy():
    return pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array([
            "spam spam buy now",
            "buy spam now now",
            "hello world meeting",
            "world hello notes",
            "spam hello",
            None,                      # null text -> '' -> [''] token
        ]),
        "label": pa.array(["s", "s", "h", "h", "s", "h"]),
    })


def _brute(table, alpha, oov="smooth"):
    """Reference NB: per-class token counts + add-alpha smoothing."""
    texts = [(t or "") for t in table.column("text").to_pylist()]
    docs = [re.split(r"\s+", t.strip().lower()) for t in texts]
    labels = table.column("label").to_pylist()
    classes = sorted(set(l for l in labels if l is not None))
    vocab = sorted({tok for d, l in zip(docs, labels)
                    if l is not None for tok in d})
    V = len(vocab)
    cnt = {c: Counter() for c in classes}
    nd = Counter()
    for d, l in zip(docs, labels):
        if l is None:
            continue
        nd[l] += 1
        cnt[l].update(d)
    total = {c: sum(cnt[c].values()) for c in classes}
    pri = {c: math.log(nd[c] / sum(nd.values())) for c in classes}

    def score(doc_toks, c):
        s = pri[c]
        for t in doc_toks:
            if t in vocab or oov == "smooth":
                s += math.log((cnt[c].get(t, 0) + alpha)
                              / (total[c] + alpha * V))
        return s

    return classes, score


def test_scores_match_bruteforce(ray_session):
    t = _toy()
    ds = ray.data.from_arrow(t)
    m = train_nb(ds, "text", "label", alpha=0.7)
    got = collect(score_nb(ds, m)).sort_by(
        [("doc_id", "ascending"), ("label", "ascending")])
    classes, score = _brute(t, 0.7)
    texts = [(x or "") for x in t.column("text").to_pylist()]
    want = [score(re.split(r"\s+", texts[i].strip().lower()), c)
            for i in range(t.num_rows) for c in classes]
    assert got.num_rows == t.num_rows * len(classes)
    np.testing.assert_allclose(
        got.column("score").to_numpy(), want, rtol=1e-12)
    assert got.column("label").to_pylist()[:2] == classes


def test_classify_argmax_and_tiebreak(ray_session):
    t = _toy()
    ds = ray.data.from_arrow(t)
    m = train_nb(ds, "text", "label", alpha=1.0)
    got = collect(classify_nb(ds, m)).sort_by([("doc_id", "ascending")])
    classes, score = _brute(t, 1.0)
    texts = [(x or "") for x in t.column("text").to_pylist()]
    for i, pred in enumerate(got.column("pred").to_pylist()):
        toks = re.split(r"\s+", texts[i].strip().lower())
        best = max(classes, key=lambda c: (score(toks, c), [-ord(ch) for ch in c]))
        # ties break by ascending label: max on (score, reversed-label)
        assert pred == best
    # spam docs classify as 's', ham as 'h' on this separable toy
    assert got.column("pred").to_pylist()[:5] == ["s", "s", "h", "h", "s"]


def test_oov_modes(ray_session):
    train = ray.data.from_arrow(_toy())
    m = train_nb(train, "text", "label", alpha=0.5)
    unseen = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["zzz qqq spam"]),
    }))
    sm = collect(score_nb(unseen, m, oov="smooth")).sort_by(
        [("label", "ascending")])
    sk = collect(score_nb(unseen, m, oov="skip")).sort_by(
        [("label", "ascending")])
    V, a = m.vocab_size, m.alpha
    for row_sm, row_sk, c in zip(
            sm.column("score").to_pylist(), sk.column("score").to_pylist(),
            m.labels):
        ci = list(m.labels).index(c)
        # smooth adds exactly 2 OOV-token masses vs skip
        assert row_sm == pytest.approx(
            row_sk + 2 * m.oov_log_prob[ci], rel=1e-12)


def test_max_vocab_cap(ray_session):
    ds = ray.data.from_arrow(_toy())
    m_full = train_nb(ds, "text", "label", alpha=0.5)
    m_cap = train_nb(ds, "text", "label", alpha=0.5, max_vocab=3)
    assert len(m_cap.vocab) == 3 and len(m_full.vocab) > 3
    # smoothing V stays the FULL corpus vocab (cap changes coverage,
    # not the distribution), and kept terms keep their full log-prob
    assert m_cap.vocab_size == m_full.vocab_size
    for t in m_cap.vocab:
        i_c = list(m_cap.vocab).index(t)
        i_f = list(m_full.vocab).index(t)
        np.testing.assert_allclose(m_cap.log_prob[i_c], m_full.log_prob[i_f])
    # capped-out terms score as OOV
    got = collect(score_nb(
        ray.data.from_arrow(pa.table({
            "doc_id": pa.array([0], pa.int64()),
            "text": pa.array([" ".join(sorted(set(m_full.vocab)
                                              - set(m_cap.vocab))[:1])]),
        })), m_cap)).sort_by([("label", "ascending")])
    np.testing.assert_allclose(
        got.column("score").to_numpy(),
        m_cap.log_prior + m_cap.oov_log_prob)


def test_null_labels_dropped(ray_session):
    t = pa.table({
        "doc_id": pa.array([0, 1, 2], pa.int64()),
        "text": pa.array(["a b", "a c", "poison poison"]),
        "label": pa.array(["x", "y", None]),
    })
    m = train_nb(ray.data.from_arrow(t), "text", "label", alpha=1.0)
    assert list(m.labels) == ["x", "y"]
    assert "poison" not in m.vocab
    # priors from labeled docs only: 1/2 each
    np.testing.assert_allclose(m.log_prior, [math.log(0.5)] * 2)


def test_train_validation(ray_session):
    ds = ray.data.from_arrow(_toy())
    with pytest.raises(ValueError, match="alpha"):
        train_nb(ds, "text", "label", alpha=0.0)
    all_null = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0], pa.int64()),
        "text": pa.array(["a"]),
        "label": pa.array([None], pa.string()),
    }))
    with pytest.raises(ValueError, match="no labeled rows"):
        train_nb(all_null, "text", "label")
    with pytest.raises(ValueError, match="oov"):
        score_nb(ds, train_nb(ds, "text", "label"), oov="bogus")
