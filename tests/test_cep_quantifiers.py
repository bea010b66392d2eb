"""CEP bounded repetition (ops/cep.py, round 5): greedy-possessive
``{m,n}`` quantifiers in strict contiguity, pinned against a per-key
Python brute force on randomized corpora, plus API validation."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray.data

from ksql_ray.expr import F
from ksql_ray.ops.cep import match_pattern


def _random_events(seed, n=1200, keys=60, p=("a", "b", "c")):
    rng = np.random.default_rng(seed)
    return pa.table({
        "k": pa.array(rng.integers(0, keys, n), type=pa.int64()),
        "typ": pa.array(rng.choice(list(p) + ["x"], size=n,
                                   p=[0.35, 0.25, 0.2, 0.2])),
        "ts": pa.array(rng.choice(np.arange(5 * n), size=n,
                                  replace=False).astype(np.int64)),
        "id": pa.array(np.arange(n), type=pa.int64()),
    })


def _brute(tbl: pa.Table, steps, within):
    """Independent possessive-{m,n} matcher: per key, per start row,
    walk consecutive rows step by step; quantified steps consume while
    the predicate holds (capped at n), never backtracking."""
    df = tbl.to_pandas().sort_values(["k", "ts", "id"]).reset_index(
        drop=True)
    rows = []
    for _, g in df.groupby("k"):
        g = g.reset_index(drop=True)
        types = g["typ"].tolist()
        N = len(g)
        for s in range(N):
            pos = s
            binds = []  # (first, count) per step
            ok = True
            for si, (_, want, q) in enumerate(steps):
                m, nq = q if q else (1, 1)
                if pos >= N or types[pos] != want:
                    ok = False
                    break
                first = pos
                cnt = 0
                while (pos < N and types[pos] == want
                       and (nq is None or cnt < nq)
                       and (q is not None or cnt < 1)):
                    pos += 1
                    cnt += 1
                if cnt < m:
                    ok = False
                    break
                binds.append((first, cnt))
            if not ok:
                continue
            last = binds[-1][0] + binds[-1][1] - 1
            if within is not None and \
                    g["ts"][last] - g["ts"][binds[0][0]] > within:
                continue
            row = {"k": g["k"][s]}
            for (name, _, q), (first, cnt) in zip(steps, binds):
                row[f"{name}_ts"] = g["ts"][first]
                if q is not None:
                    row[f"{name}_n"] = cnt
            rows.append(row)
    return pd.DataFrame(rows)


@pytest.mark.parametrize("quant", [(1, 3), (2, 2), (1, None), (2, None)])
@pytest.mark.parametrize("within", [None, 900])
@pytest.mark.parametrize("seed", [1, 5])
def test_quantified_middle_step_vs_brute(ray_session, quant, within,
                                         seed):
    tbl = _random_events(seed)
    steps = [("s1", "a", None), ("s2", "b", quant), ("s3", "c", None)]
    got = match_pattern(
        ray.data.from_arrow(tbl), partition_by=["k"], order_by="ts",
        steps=[("s1", F("typ").Equal("a")),
               ("s2", F("typ").Equal("b"), quant),
               ("s3", F("typ").Equal("c"))],
        contiguity="strict", within=within, tiebreak="id",
        num_partitions=4).to_pandas()
    ref = _brute(tbl, steps, within)
    cols = ["k", "s1_ts", "s2_ts", "s2_n", "s3_ts"]
    if len(ref) == 0:
        assert len(got) == 0
        return
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = ref[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)
    assert len(a) > 0, f"vacuous: {quant} {within} {seed}"


@pytest.mark.parametrize("seed", [2, 9])
def test_quantified_first_and_last_step_vs_brute(ray_session, seed):
    tbl = _random_events(seed)
    steps = [("s1", "a", (1, 2)), ("s2", "b", None), ("s3", "c", (2, 4))]
    got = match_pattern(
        ray.data.from_arrow(tbl), partition_by=["k"], order_by="ts",
        steps=[("s1", F("typ").Equal("a"), (1, 2)),
               ("s2", F("typ").Equal("b")),
               ("s3", F("typ").Equal("c"), (2, 4))],
        contiguity="strict", tiebreak="id", num_partitions=4).to_pandas()
    ref = _brute(tbl, steps, None)
    cols = ["k", "s1_ts", "s1_n", "s2_ts", "s3_ts", "s3_n"]
    if len(ref) == 0:
        assert len(got) == 0
        return
    a = got[cols].sort_values(cols).reset_index(drop=True)
    b = ref[cols].sort_values(cols).reset_index(drop=True)
    pd.testing.assert_frame_equal(a, b, check_dtype=False)


def test_possessive_no_backtrack(ray_session):
    # b{1,3} then b: possessive consumes BOTH b's, leaving none for the
    # final step -> no match (a backtracking matcher would emit one)
    tbl = pa.table({
        "k": pa.array([0, 0, 0], type=pa.int64()),
        "typ": pa.array(["a", "b", "b"]),
        "ts": pa.array([0, 1, 2], type=pa.int64()),
        "id": pa.array([0, 1, 2], type=pa.int64()),
    })
    out = match_pattern(
        ray.data.from_arrow(tbl), partition_by=["k"], order_by="ts",
        steps=[("s1", F("typ").Equal("a")),
               ("s2", F("typ").Equal("b"), (1, 3)),
               ("s3", F("typ").Equal("b"))],
        contiguity="strict", tiebreak="id", num_partitions=2)
    assert out.count() == 0


def test_quantifier_validation(ray_session):
    tbl = pa.table({"k": pa.array([0]), "typ": pa.array(["a"]),
                    "ts": pa.array([0], type=pa.int64())})
    ds = ray.data.from_arrow(tbl)
    with pytest.raises(ValueError, match="strict"):
        match_pattern(ds, partition_by=["k"], order_by="ts",
                      steps=[("a", F("typ").Equal("a"), (1, 2)),
                             ("b", F("typ").Equal("b"))],
                      contiguity="skip")
    for bad in [(0, 2), (3, 2), (-1, None)]:
        with pytest.raises(ValueError, match="quantifier"):
            match_pattern(ds, partition_by=["k"], order_by="ts",
                          steps=[("a", F("typ").Equal("a"), bad),
                                 ("b", F("typ").Equal("b"))],
                          contiguity="strict")
