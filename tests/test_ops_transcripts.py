"""Transcript assembly + chunking (ops/transcripts.py): brute-force
pins, overlap invariants, edge cases. The sf0.01 DuckDB oracles run via
the op_assemble_convs / op_chunk_split gates in test_driver_contract.py."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from conftest import collect
from ksql_ray.ops.transcripts import assemble_conversations, chunk_split


def _turns(n=400, n_convs=30, seed=11):
    rng = np.random.default_rng(seed)
    conv = rng.integers(0, n_convs, n)
    words = np.array(["alpha", "beta", "gamma", "delta", "eps"])
    text = [" ".join(words[rng.integers(0, 5, rng.integers(0, 12))])
            for _ in range(n)]
    return pa.table({
        "conv": pa.array([f"c{v:03d}" for v in conv]),
        "idx": pa.array(rng.permutation(n), pa.int64()),
        "role": pa.array([["user", "assistant"][i % 2] for i in range(n)]),
        "text": pa.array(text),
    })


def test_assemble_brute(ray_session):
    t = _turns()
    got = collect(assemble_conversations(
        ray.data.from_arrow(t).repartition(4), ["conv"], ["idx"],
        text_col="text", role_col="role", sep="\n"))
    byconv = {}
    for c, i, r, x in zip(t.column("conv").to_pylist(),
                          t.column("idx").to_pylist(),
                          t.column("role").to_pylist(),
                          t.column("text").to_pylist()):
        byconv.setdefault(c, []).append((i, f"{r}: {x}"))
    want = {c: "\n".join(s for _, s in sorted(lst))
            for c, lst in byconv.items()}
    got_map = {r["conv"]: r for r in got.to_pylist()}
    assert set(got_map) == set(want)
    for c, doc in want.items():
        assert got_map[c]["doc"] == doc
        assert got_map[c]["n_turns"] == len(byconv[c])
        assert got_map[c]["n_chars"] == len(doc)


def test_assemble_no_role_null_text(ray_session):
    t = pa.table({
        "k": pa.array(["a", "a", "b"]),
        "o": pa.array([2, 1, 1], pa.int64()),
        "text": pa.array(["second", None, "only"]),
    })
    got = collect(assemble_conversations(
        ray.data.from_arrow(t), ["k"], ["o"], sep=" | "))
    m = {r["k"]: r["doc"] for r in got.to_pylist()}
    assert m == {"a": " | second", "b": "only"}  # NULL text -> ''


def _brute_chunks(text, width, stride):
    toks = "".join(" " if ch.isspace() else ch for ch in text or "")
    toks = toks.strip().split(" ") if (text or "").strip() else [""]
    # mirror \s+ splitting: collapse runs
    toks = [t for t in toks if t != ""] or [""]
    out = []
    for ci, s in enumerate(range(0, len(toks), stride)):
        piece = toks[s:s + width]
        out.append((ci, len(piece), " ".join(piece)))
    return out


@pytest.mark.parametrize("width,stride", [(4, 4), (8, 3), (5, 1), (1, 1)])
def test_chunk_split_brute(ray_session, width, stride):
    rng = np.random.default_rng(7)
    words = np.array(["w%d" % i for i in range(40)])
    docs = [" ".join(words[rng.integers(0, 40, rng.integers(0, 30))])
            for _ in range(120)]
    docs += ["", "   ", "single", None]
    t = pa.table({"doc_id": pa.array(np.arange(len(docs)), pa.int64()),
                  "text": pa.array(docs)})
    got = collect(chunk_split(ray.data.from_arrow(t).repartition(3),
                              width=width, stride=stride))
    got_map = {}
    for r in got.to_pylist():
        got_map.setdefault(r["doc_id"], []).append(
            (r["chunk_idx"], r["n_tokens"], r["chunk"]))
    for did, text in enumerate(docs):
        want = _brute_chunks(text, width, stride)
        assert sorted(got_map[did]) == want, (did, text)


def test_chunk_split_overlap_reconstructs(ray_session):
    """stride == width chunks concatenate back to the token stream."""
    text = " ".join(f"t{i}" for i in range(101))
    t = pa.table({"doc_id": pa.array([0], pa.int64()),
                  "text": pa.array([text])})
    got = collect(chunk_split(ray.data.from_arrow(t), width=8))
    rows = sorted(got.to_pylist(), key=lambda r: r["chunk_idx"])
    assert " ".join(r["chunk"] for r in rows) == text
    assert [r["n_tokens"] for r in rows] == [8] * 12 + [5]


def test_chunk_split_validation(ray_session):
    ds = ray.data.from_arrow(pa.table(
        {"doc_id": pa.array([0], pa.int64()), "text": pa.array(["x"])}))
    with pytest.raises(ValueError):
        chunk_split(ds, width=0)
    with pytest.raises(ValueError):
        chunk_split(ds, width=4, stride=5)


def test_moving_agg_brute(ray_session):
    from ksql_ray.ops.rows import moving_agg

    rng = np.random.default_rng(3)
    n = 600
    t = pa.table({
        "k": pa.array([f"u{v}" for v in rng.integers(0, 15, n)]),
        "eid": pa.array(np.arange(n), pa.int64()),
        "ts": pa.array(np.sort(rng.integers(0, 1_000_000, n)), pa.int64()),
        "v": pa.array(np.where(rng.random(n) < 0.1, np.nan,
                               np.round(rng.uniform(0, 50, n), 2))),
    })
    # np.nan placeholder -> real NULLs
    vals = t.column("v").to_numpy(zero_copy_only=False)
    t = t.set_column(3, "v", pa.array(vals, mask=np.isnan(vals)))
    w = 5
    got = collect(moving_agg(ray.data.from_arrow(t).repartition(4),
                             ["k"], "ts", "v", w, tiebreak="eid"))
    bykey = {}
    for k, e, ts, v in zip(t.column("k").to_pylist(),
                           t.column("eid").to_pylist(),
                           t.column("ts").to_pylist(),
                           t.column("v").to_pylist()):
        bykey.setdefault(k, []).append((ts, e, v))
    want = {}
    for k, lst in bykey.items():
        lst.sort()
        for i in range(len(lst)):
            window = [v for _, _, v in lst[max(0, i - w + 1):i + 1]
                      if v is not None]
            want[lst[i][1]] = (sum(window) if window else None,
                              len(window))
    for r in got.to_pylist():
        ws, wc = want[r["eid"]]
        assert r["v_rcnt"] == wc
        if ws is None:
            assert r["v_rsum"] is None and r["v_ravg"] is None
        else:
            assert abs(r["v_rsum"] - ws) < 1e-9
            assert abs(r["v_ravg"] - ws / wc) < 1e-9


def test_moving_agg_validation(ray_session):
    from ksql_ray.ops.rows import moving_agg

    ds = ray.data.from_arrow(pa.table(
        {"k": pa.array(["a"]), "o": pa.array([1], pa.int64()),
         "v": pa.array([1.0])}))
    with pytest.raises(ValueError):
        moving_agg(ds, ["k"], "o", "v", 0)
