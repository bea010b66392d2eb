"""Data-contract validation tests: per-rule violation counts on a
hand-built corpus, cross-batch uniqueness, validation errors."""

import pyarrow as pa
import pytest
import ray.data

from ksql_ray.ops.validate import validate_rules


def _run(t, rules, nparts=3):
    ds = ray.data.from_arrow(t).repartition(nparts)
    return {r["rule"]: r["violations"]
            for r in validate_rules(ds, rules).take_all()}


def test_validate_counts_brute_force(ray_session):
    t = pa.table({
        "id": pa.array([1, 2, 2, 3, 4, 4, 4], pa.int64()),
        "cat": pa.array(["a", "b", "zz", None, "a", "b", "9"]),
        "x": pa.array([5.0, -1.0, 50.0, 200.0, None, 5.0, 5.0]),
    })
    out = _run(t, [
        ("not_null", "cat"),
        ("unique", "id"),
        ("in_set", "cat", ["a", "b"]),
        ("range", "x", 0.0, 100.0),
        ("regex", "cat", "[a-z]+"),
    ])
    assert out["not_null(cat)"] == 1
    # ids: 1,2,2,3,4,4,4 -> 7 valid rows, 4 distinct -> 3 extras
    assert out["unique(id)"] == 3
    assert out["in_set(cat)"] == 2          # 'zz', '9' (NULL ignored)
    assert out["range(x)"] == 2             # -1.0, 200.0 (NULL ignored)
    assert out["regex(cat)"] == 1           # '9' ('zz' matches)


def test_validate_unique_across_batches(ray_session):
    # the same value in different batches must count as duplicate
    t = pa.table({"v": pa.array(["x"] * 6 + ["y"])})
    out = _run(t, [("unique", "v")], nparts=6)
    assert out["unique(v)"] == 5


def test_validate_increasing_by(ray_session):
    t = pa.table({
        "k": pa.array(["u", "u", "u", "w", "w"]),
        "ts": pa.array([10, 5, 20, 1, 1], pa.timestamp("us")),
        "o": pa.array([1, 2, 3, 1, 2], pa.int64()),
    })
    out = _run(t, [("increasing_by", "ts", "k", "o")])
    # u: 10 -> 5 decreases (1 violation); 5 -> 20 fine; w: 1 -> 1 fine
    assert out["increasing_by(ts)"] == 1


def test_validate_rejects_unknown_rule(ray_session):
    t = pa.table({"v": pa.array([1])})
    with pytest.raises(ValueError):
        validate_rules(ray.data.from_arrow(t), [("bogus", "v")])
    with pytest.raises(ValueError):
        validate_rules(ray.data.from_arrow(t), [])


def test_validate_clean_corpus_all_zero(ray_session):
    t = pa.table({
        "id": pa.array([1, 2, 3], pa.int64()),
        "cat": pa.array(["a", "b", "a"]),
    })
    out = _run(t, [("not_null", "cat"), ("unique", "id"),
                   ("in_set", "cat", ["a", "b"]),
                   ("regex", "cat", "[ab]")])
    assert set(out.values()) == {0}


def test_validate_cli(ray_session, tmp_path):
    import json
    import subprocess
    import sys

    import pyarrow.parquet as pq

    t = pa.table({"id": pa.array([1, 1, 2], pa.int64()),
                  "v": pa.array([5.0, 500.0, 7.0])})
    p = str(tmp_path / "d.parquet")
    pq.write_table(t, p)
    rules = json.dumps([["unique", "id"], ["range", "v", 0, 100]])
    r = subprocess.run(
        [sys.executable, "-m", "ksql_ray.cli", "validate",
         "--input", p, "--rules", rules, "--fail-on-violations"],
        capture_output=True, text=True, cwd="/root/repo",
        env={**__import__("os").environ, "RAY_ADDRESS": "local"})
    assert r.returncode == 1, r.stderr[-500:]
    line = [l for l in r.stdout.splitlines() if l.startswith("{")][-1]
    doc = json.loads(line)
    got = {x["rule"]: x["violations"] for x in doc["rules"]}
    assert got == {"unique(id)": 1, "range(v)": 1}
    assert doc["total_violations"] == 2


# -------------------------------------------------- jsonl shard export
def test_write_shards_jsonl_matches_parquet(ray_session, tmp_path):
    import json
    import os

    import pyarrow.parquet as pq
    import ray.data as rd

    from ksql_ray.ops.shard import write_shards

    t = pa.table({"doc_id": pa.array(range(40), pa.int64()),
                  "text": pa.array([f"doc {i}" for i in range(40)])})
    dp = str(tmp_path / "pq")
    dj = str(tmp_path / "jl")
    sp = write_shards(rd.from_arrow(t), dp, "doc_id", n_shards=4,
                      method="md5")
    sj = write_shards(rd.from_arrow(t), dj, "doc_id", n_shards=4,
                      method="md5", fmt="jsonl")
    assert sp["rows"] == sj["rows"] == 40
    for i in range(4):
        ptbl = pq.read_table(os.path.join(dp, f"shard-{i:05d}.parquet"))
        with open(os.path.join(dj, f"shard-{i:05d}.jsonl")) as f:
            jrows = [json.loads(l) for l in f]
        # same rows, same within-shard order, across formats
        assert ptbl.to_pylist() == jrows
    # idempotent: second jsonl export writes nothing
    again = write_shards(rd.from_arrow(t), dj, "doc_id", n_shards=4,
                         method="md5", fmt="jsonl")
    assert again["written"] == 0 and again["skipped"] == 4
    import pytest as _pytest

    with _pytest.raises(ValueError):
        write_shards(rd.from_arrow(t), dj, "doc_id", fmt="xml")


# ------------------------------------------------------- session stats
def test_session_stats_brute_force(ray_session):
    from ksql_ray.ops.rows import session_stats

    # u: sessions [0,5], [100] ; w: [0], [50] ; gap 10
    t = pa.table({
        "k": pa.array(["u", "u", "u", "w", "w"]),
        "ts": pa.array([0, 5, 100, 0, 50], pa.timestamp("us")),
        "id": pa.array([1, 2, 3, 4, 5], pa.int64()),
    })
    out = session_stats(ray.data.from_arrow(t).repartition(2), ["k"],
                        "ts", 10, tiebreak="id").take_all()[0]
    assert out["n_sessions"] == 4 and out["n_events"] == 5
    assert out["avg_events"] == 5 / 4
    assert out["bounce_rate"] == 3 / 4     # [100], [0], [50] are solo
    assert out["avg_duration_s"] == (5 / 4) / 1e6


def test_session_stats_empty(ray_session):
    from ksql_ray.ops.rows import session_stats

    t = pa.table({"k": pa.array([], type=pa.string()),
                  "ts": pa.array([], type=pa.timestamp("us"))})
    out = session_stats(ray.data.from_arrow(t), ["k"], "ts",
                        10).take_all()[0]
    assert out["n_sessions"] == 0 and out["avg_events"] is None


# ------------------------------------------------------------ SQ8
def test_sq8_roundtrip_error_bound(ray_session):
    import numpy as np

    from ksql_ray.ops.pq import _sq8_codes, sq8_encode, sq8_train

    rng = np.random.default_rng(1)
    m = rng.standard_normal((200, 16)).astype(np.float32)
    t = pa.table({
        "vec_id": pa.array(range(200), pa.int64()),
        "embedding": pa.array(m.tolist(), type=pa.list_(pa.float32())),
    })
    lo, hi = sq8_train(ray.data.from_arrow(t).repartition(3))
    assert np.allclose(lo, m.min(axis=0)) and np.allclose(
        hi, m.max(axis=0))
    codes = _sq8_codes(m, lo, hi)
    recon = lo + codes.astype(np.float64) * (hi - lo) / 255.0
    # affine-grid guarantee: |x - recon| <= span / 255 / 2 per dim
    assert (np.abs(m - recon) <= (hi - lo) / 255.0 / 2 + 1e-12).all()
    n = sq8_encode(ray.data.from_arrow(t), lo, hi).count()
    assert n == 200


def test_sq8_constant_dim_codes_zero(ray_session):
    import numpy as np

    from ksql_ray.ops.pq import _sq8_codes

    m = np.array([[1.0, 5.0], [1.0, 7.0]], dtype=np.float32)
    lo = m.min(axis=0).astype(np.float64)
    hi = m.max(axis=0).astype(np.float64)
    c = _sq8_codes(m, lo, hi)
    assert (c[:, 0] == 0).all()            # constant dim
    assert c[0, 1] == 0 and c[1, 1] == 255


def test_sq8_search_perfect_recall_on_separated_clusters(ray_session):
    import numpy as np

    from ksql_ray.ops.ann import brute_force_topk
    from ksql_ray.ops.pq import sq8_encode, sq8_topk, sq8_train

    rng = np.random.default_rng(7)
    m = np.concatenate([rng.standard_normal((50, 8)) + 10,
                        rng.standard_normal((50, 8)) - 10]).astype(
        np.float32)
    t = pa.table({
        "vec_id": pa.array(range(100), pa.int64()),
        "embedding": pa.array(m.tolist(), type=pa.list_(pa.float32())),
    })
    ds = ray.data.from_arrow(t)
    lo, hi = sq8_train(ds)
    codes = sq8_encode(ds, lo, hi)
    qm = m[:4].astype(np.float64)
    approx = {(r["query_id"], r["vec_id"])
              for r in sq8_topk(codes, [0, 1, 2, 3], qm, lo, hi,
                                k=5).take_all()}
    exact = {(r["query_id"], r["vec_id"])
             for r in brute_force_topk(ds, [0, 1, 2, 3], qm,
                                       k=5).take_all()}
    # recall@5 across well-separated clusters
    assert len(approx & exact) / len(exact) >= 0.9


# ----------------------------------------------- weighted priority sample
def test_weighted_bottom_k_brute_force(ray_session):
    import hashlib

    import numpy as np

    from ksql_ray.ops.sample import weighted_bottom_k

    t = pa.table({
        "id": pa.array(range(50), pa.int64()),
        "w": pa.array([float(i % 7) - 1 for i in range(50)]),
    })
    got = sorted(r["id"] for r in weighted_bottom_k(
        ray.data.from_arrow(t).repartition(4), "id", "w",
        k=10).take_all())

    def pr(i, w):
        h = int(hashlib.md5(str(i).encode()).hexdigest()[:8], 16)
        u = (h + 0.5) / float(1 << 32)
        return u ** (1.0 / w)

    eligible = [(pr(i, float(i % 7) - 1), -i)
                for i in range(50) if (i % 7) - 1 > 0]
    exp = sorted(-b for _, b in sorted(eligible, reverse=True)[:10])
    assert got == exp


def test_weighted_bottom_k_heavy_weights_dominate(ray_session):
    from ksql_ray.ops.sample import weighted_bottom_k

    # ids 0-9 weight 1000, ids 10-99 weight 0.01: the heavy ten should
    # essentially always fill a k=10 sample
    t = pa.table({
        "id": pa.array(range(100), pa.int64()),
        "w": pa.array([1000.0] * 10 + [0.01] * 90),
    })
    got = sorted(r["id"] for r in weighted_bottom_k(
        ray.data.from_arrow(t), "id", "w", k=10).take_all())
    assert got == list(range(10))


def test_weighted_bottom_k_merge_stability(ray_session):
    from ksql_ray.ops.sample import weighted_bottom_k

    t = pa.table({"id": pa.array(range(200), pa.int64()),
                  "w": pa.array([1.0 + (i % 5) for i in range(200)])})
    a = sorted(r["id"] for r in weighted_bottom_k(
        ray.data.from_arrow(t).repartition(2), "id", "w",
        k=25).take_all())
    b = sorted(r["id"] for r in weighted_bottom_k(
        ray.data.from_arrow(t).repartition(13), "id", "w",
        k=25).take_all())
    assert a == b                      # reshard-stable


def test_validate_all_null_and_empty_still_report_rules(ray_session):
    t = pa.table({"v": pa.array([None, None], type=pa.string()),
                  "x": pa.array([None, None], type=pa.float64())})
    out = _run(t, [("unique", "v"), ("not_null", "v"),
                   ("range", "x", 0, 1)], nparts=2)
    assert out == {"unique(v)": 0, "not_null(v)": 2, "range(x)": 0}
    empty = pa.table({"v": pa.array([], type=pa.string())})
    out2 = _run(empty, [("unique", "v"), ("not_null", "v")], nparts=1)
    assert out2 == {"unique(v)": 0, "not_null(v)": 0}


def test_validate_duplicate_rule_labels_rejected(ray_session):
    # ADVICE r4 #2: two same-kind rules on one column would silently
    # sum their counts into a single row — must refuse instead
    t = pa.table({"v": pa.array([1.0, 2.0])})
    with pytest.raises(ValueError, match="duplicate rule labels"):
        validate_rules(ray.data.from_arrow(t),
                       [("range", "v", 0, 1), ("range", "v", 5, 9)])


def test_validate_range_nan_matches_duckdb(ray_session):
    # ADVICE r4 #3: DuckDB's total order ranks NaN above all numbers,
    # so `value > hi` flags NaN rows; the engine must agree
    import math

    import duckdb

    t = pa.table({"v": pa.array([0.5, math.nan, -1.0, 200.0, None,
                                 math.nan, 50.0], pa.float64())})
    out = _run(t, [("range", "v", 0.0, 100.0)], nparts=2)
    ref = duckdb.connect().execute(
        "SELECT count(*) FILTER (v < 0.0 OR v > 100.0) FROM t"
    ).fetchone()[0]
    assert out == {"range(v)": ref} == {"range(v)": 4}
