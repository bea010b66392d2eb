"""Corpus snapshot diff (ops/diff.py): brute-force pins. The sf0.01
DuckDB oracle runs via the op_snapshot_diff gate."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from conftest import collect
from ksql_ray.ops.diff import snapshot_diff


def _snap(rows):
    return pa.table({
        "k": pa.array([r[0] for r in rows], pa.int64()),
        "a": pa.array([r[1] for r in rows], pa.string()),
        "b": pa.array([r[2] for r in rows], pa.float64()),
    })


def test_diff_statuses(ray_session):
    old = _snap([(1, "x", 1.0), (2, "y", 2.0), (3, "z", 3.0),
                 (4, None, 4.0), (5, "w", None)])
    new = _snap([(2, "y", 2.0),          # unchanged
                 (3, "z2", 3.0),         # changed (a)
                 (4, None, 4.5),         # changed (b)
                 (5, "w", None),         # unchanged (null == null here)
                 (6, "n", 6.0)])         # added; 1 removed
    o = ray.data.from_arrow(old).repartition(2)
    n = ray.data.from_arrow(new).repartition(2)
    got = collect(snapshot_diff(o, n, "k", ["a", "b"]))
    d = dict(zip(got.column("k").to_pylist(),
                 got.column("status").to_pylist()))
    assert d == {1: "removed", 3: "changed", 4: "changed", 6: "added"}
    # include_unchanged covers every key exactly once
    allrows = collect(snapshot_diff(o, n, "k", ["a", "b"],
                                    include_unchanged=True))
    d2 = dict(zip(allrows.column("k").to_pylist(),
                  allrows.column("status").to_pylist()))
    assert d2 == {**d, 2: "unchanged", 5: "unchanged"}


def test_diff_null_vs_value_is_changed(ray_session):
    old = _snap([(1, "x", 1.0)])
    new = _snap([(1, None, 1.0)])
    got = collect(snapshot_diff(ray.data.from_arrow(old),
                                ray.data.from_arrow(new), "k", ["a"]))
    assert got.column("status").to_pylist() == ["changed"]


def test_diff_duplicate_key_raises(ray_session):
    old = _snap([(1, "x", 1.0), (1, "x2", 1.0)])
    new = _snap([(1, "x", 1.0)])
    with pytest.raises(Exception, match="snapshot_diff"):
        collect(snapshot_diff(ray.data.from_arrow(old),
                              ray.data.from_arrow(new), "k", ["a"]))


def test_diff_brute_random(ray_session):
    rng = np.random.default_rng(42)
    ko = rng.choice(200, 120, replace=False)
    kn = rng.choice(200, 120, replace=False)
    old = pa.table({"k": pa.array(np.sort(ko), pa.int64()),
                    "a": pa.array([f"v{x % 9}" for x in np.sort(ko)])})
    # new re-values keys %4==0
    new = pa.table({"k": pa.array(np.sort(kn), pa.int64()),
                    "a": pa.array([f"v{x % 9}" if x % 4 else "CHG"
                                   for x in np.sort(kn)])})
    got = collect(snapshot_diff(
        ray.data.from_arrow(old).repartition(3),
        ray.data.from_arrow(new).repartition(4), "k", ["a"],
        num_partitions=8))
    d = dict(zip(got.column("k").to_pylist(),
                 got.column("status").to_pylist()))
    so, sn = set(ko.tolist()), set(kn.tolist())
    exp = {}
    for k in so - sn:
        exp[k] = "removed"
    for k in sn - so:
        exp[k] = "added"
    for k in so & sn:
        if k % 4 == 0 and f"v{k % 9}" != "CHG":
            exp[k] = "changed"
    assert d == exp and len(d)  # non-trivial
