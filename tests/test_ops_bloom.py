"""Bloom-prefiltered semi/anti join (ops/bloom.py): brute-force pins +
bloom no-false-negative property. The sf0.01 DuckDB oracles run via the
op_bloom_semi / op_bloom_anti gates."""

import numpy as np
import pyarrow as pa
import ray
import ray.data

from conftest import collect
from ksql_ray.ops.bloom import (_BloomProbe, bloom_fpr, bloom_semi_join,
                                build_bloom)


def _sides(seed=7, nl=400, nr=150, kmax=60):
    rng = np.random.default_rng(seed)
    lk = rng.integers(0, kmax, nl).astype(object)
    lk[rng.random(nl) < 0.05] = None  # NULL probes
    left = pa.table({
        "row_id": pa.array(np.arange(nl), pa.int64()),
        "k": pa.array(list(lk), pa.int64()),
        "v": pa.array(np.round(rng.uniform(0, 10, nl), 2)),
    })
    rk = rng.integers(0, kmax // 2, nr).astype(object)  # proper subset range
    rk[rng.random(nr) < 0.05] = None  # NULL right keys never match
    right = pa.table({"rk": pa.array(list(rk), pa.int64())})
    return left, right


def _expected(left, right, anti):
    rset = {k for k in right.column("rk").to_pylist() if k is not None}
    out = set()
    for rid, k in zip(left.column("row_id").to_pylist(),
                      left.column("k").to_pylist()):
        hit = k is not None and k in rset
        if (hit and not anti) or (anti and not hit):
            out.add(rid)
    return out


def test_bloom_semi_anti_exact_brute(ray_session):
    lt, rt = _sides()
    l = ray.data.from_arrow(lt).repartition(4)
    r = ray.data.from_arrow(rt).repartition(3)
    for anti in (False, True):
        got = collect(bloom_semi_join(l, r, "k", "rk", anti=anti,
                                      expected_keys=200))
        assert set(got.column("row_id").to_pylist()) == \
            _expected(lt, rt, anti)
        assert got.column_names == lt.column_names  # schema preserved
        assert got.num_rows  # both branches non-trivial
    # semi + anti partition the non-degenerate left exactly
    s = _expected(lt, rt, False) | _expected(lt, rt, True)
    assert s == set(lt.column("row_id").to_pylist())


def test_bloom_no_false_negatives_and_fpr(ray_session):
    # approximate semi (exact=False) must be a SUPERSET of exact semi
    lt, rt = _sides(seed=11, nl=600, kmax=80)
    l = ray.data.from_arrow(lt).repartition(4)
    r = ray.data.from_arrow(rt).repartition(3)
    approx = collect(bloom_semi_join(l, r, "k", "rk", exact=False,
                                     expected_keys=200))
    exact = _expected(lt, rt, False)
    got = set(approx.column("row_id").to_pylist())
    assert got >= exact          # a bloom never false-negatives
    # approximate anti is a SUBSET of exact anti (fp rows dropped)
    approx_a = collect(bloom_semi_join(l, r, "k", "rk", anti=True,
                                       exact=False, expected_keys=200))
    assert set(approx_a.column("row_id").to_pylist()) <= \
        _expected(lt, rt, True)
    assert 0.0 < bloom_fpr(100, 1000, 5) < 0.02


def test_bloom_tiny_bitmap_still_exact(ray_session):
    # undersized bitmap -> high FPR -> exact mode must still be exact
    lt, rt = _sides(seed=3)
    l = ray.data.from_arrow(lt).repartition(4)
    r = ray.data.from_arrow(rt).repartition(2)
    got = collect(bloom_semi_join(l, r, "k", "rk", expected_keys=8,
                                  bits_per_key=1, num_hashes=2))
    assert set(got.column("row_id").to_pylist()) == \
        _expected(lt, rt, False)


def test_bloom_empty_right_and_probe_stage(ray_session):
    lt, _ = _sides(seed=5)
    l = ray.data.from_arrow(lt).repartition(2)
    empty = ray.data.from_arrow(pa.table({"rk": pa.array([], pa.int64())}))
    assert collect(bloom_semi_join(l, empty, "k", "rk",
                                   expected_keys=1)).num_rows == 0
    anti = collect(bloom_semi_join(l, empty, "k", "rk", anti=True,
                                   expected_keys=1))
    assert anti.num_rows == lt.num_rows  # NOT EXISTS keeps all (incl NULL)
    # direct probe-stage check: zero-row batch is a no-op
    ref = build_bloom(empty, "rk", num_bits=64)
    st = _BloomProbe(ref, "k", 64, 2, True, False)
    out = st(lt.slice(0, 0))
    assert out.num_rows == 0 and out.column_names == lt.column_names
