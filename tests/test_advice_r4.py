"""Round-4 ADVICE regression tests: NULL-key / NULL-label / NULL-order
handling in the factorize-scatter partials (ops/hll.py, ops/cube.py,
ops/rows.py) and the empty-column histogram (ops/hist.py).

Each test reproduces the reported failure shape: a pd.factorize -1
sentinel used as a scatter row index silently folded NULL-key rows into
the LAST factorized key (hll grouped_partial, _pivot_partial), made
np.bincount crash on negative packed codes (transition_counts), or let
NaN != NaN split SQL rank peers (rank_per_key)."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from conftest import collect
from ksql_ray.ops.cube import _pivot_partial, pivot_agg
from ksql_ray.ops.hist import numeric_histogram
from ksql_ray.ops.hll import grouped_hll_registers, grouped_partial
from ksql_ray.ops.rows import rank_per_key, transition_counts


def test_hll_grouped_partial_null_keys_isolated():
    """NULL-key rows must not leak registers into another key."""
    # 'b' sees exactly ONE value; nulls see five distinct values that
    # previously max-merged into the last factorized key.
    t = pa.table({
        "k": pa.array(["a", None, "b", None, None, None, None],
                      pa.string()),
        "v": pa.array(["x1", "n1", "only", "n2", "n3", "n4", "n5"]),
    })
    out = grouped_partial(t, ["k"], "v", p=8, hash="md5")
    ks = out.column("k").to_pylist()
    # per-key register counts: 'b' has exactly 1 nonzero register
    assert ks.count("b") == 1
    assert ks.count("a") == 1
    # NULL keys are a REAL group carrying their own registers
    n_null = sum(1 for k in ks if k is None)
    assert 1 <= n_null <= 5


def test_hll_grouped_partial_all_null_keys():
    """All-null-key batch used to IndexError on the (0, 2^p) scatter."""
    t = pa.table({"k": pa.array([None, None], pa.string()),
                  "v": pa.array(["a", "b"])})
    out = grouped_partial(t, ["k"], "v", p=8, hash="md5")
    assert out.num_rows >= 1
    assert set(out.column("k").to_pylist()) == {None}


def test_hll_grouped_registers_null_key_end_to_end(ray_session):
    t = pa.table({
        "k": pa.array((["a"] * 50 + [None] * 50) * 4, pa.string()),
        "v": pa.array([f"v{i}" for i in range(100)] * 4),
    })
    regs = collect(grouped_hll_registers(
        ray.data.from_arrow(t).repartition(3), ["k"], "v", p=8))
    by_key = {}
    for r in regs.to_pylist():
        by_key.setdefault(r["k"], set()).add((r["register"], r["rho"]))
    # 'a' saw v0..v49, nulls saw v50..v99 -> disjoint register states
    assert set(by_key) == {"a", None}
    assert by_key["a"] != by_key[None]


def test_pivot_partial_null_keys_isolated():
    t = pa.table({
        "k": pa.array(["a", None, "b", None], pa.string()),
        "p": pa.array(["x", "x", "x", "y"]),
        "v": pa.array([1.0, 100.0, 2.0, 200.0]),
    })
    out = _pivot_partial(t, "k", "p", ["x", "y"], "v")
    rows = {r["k"]: r for r in out.to_pylist()}
    assert rows["b"]["__s_x"] == 2.0          # was 302.0 pre-fix
    assert rows["a"]["__s_x"] == 1.0
    assert rows[None]["__s_x"] == 100.0       # NULL key is its own row
    assert rows[None]["__s_y"] == 200.0


def test_pivot_agg_null_keys_end_to_end(ray_session):
    t = pa.table({
        "k": pa.array(["a", None, "b", None, "b"], pa.string()),
        "p": pa.array(["x", "x", "x", "x", "y"]),
        "v": pa.array([1.0, 10.0, 2.0, 20.0, 3.0]),
    })
    got = {r["k"]: r for r in collect(pivot_agg(
        ray.data.from_arrow(t).repartition(2),
        "k", "p", ["x", "y"], "v")).to_pylist()}
    assert got["b"]["x_sum"] == 2.0 and got["b"]["y_sum"] == 3.0
    assert got["a"]["x_sum"] == 1.0 and got["a"]["y_sum"] is None
    assert got[None]["x_sum"] == 30.0


def test_transition_counts_null_labels(ray_session):
    """NULL labels drop the pair (both directions); no bincount crash."""
    t = pa.table({
        "k": pa.array(["c1"] * 5, pa.string()),
        "i": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "role": pa.array(["user", None, "user", "asst", "user"],
                         pa.string()),
    })
    got = {(r["from_label"], r["to_label"]): r["cnt"]
           for r in collect(transition_counts(
               ray.data.from_arrow(t), ["k"], "i", "role")).to_pylist()}
    # pairs: (user,None) X, (None,user) X, (user,asst), (asst,user)
    assert got == {("user", "asst"): 1, ("asst", "user"): 1}


def test_transition_counts_all_null_labels(ray_session):
    t = pa.table({
        "k": pa.array(["c1"] * 3, pa.string()),
        "i": pa.array([0, 1, 2], pa.int64()),
        "role": pa.array([None, None, None], pa.string()),
    })
    got = collect(transition_counts(
        ray.data.from_arrow(t), ["k"], "i", "role"))
    assert got.num_rows == 0


def test_rank_per_key_null_order_values_are_peers(ray_session):
    t = pa.table({
        "k": pa.array(["a"] * 5, pa.string()),
        "eid": pa.array([0, 1, 2, 3, 4], pa.int64()),
        "v": pa.array([1.0, None, None, 2.0, None], pa.float64()),
    })
    got = {r["eid"]: (r["rank"], r["dense_rank"])
           for r in collect(rank_per_key(
               ray.data.from_arrow(t), ["k"], "v",
               tiebreak="eid")).to_pylist()}
    # ascending, nulls last: v=1 rank 1, v=2 rank 2, NULLs are PEERS
    # sharing rank 3 / dense_rank 3
    assert got[0] == (1, 1)
    assert got[3] == (2, 2)
    assert got[1] == got[2] == got[4] == (3, 3)


def test_numeric_histogram_all_null_column(ray_session):
    t = pa.table({"v": pa.array([None, None], pa.float64())})
    got = collect(numeric_histogram(ray.data.from_arrow(t), "v",
                                    bins=4))
    assert got.num_rows == 0
    assert got.column_names == ["bin", "lo", "hi", "cnt"]


def test_numeric_histogram_empty_dataset(ray_session):
    t = pa.table({"v": pa.array([], pa.float64())})
    got = collect(numeric_histogram(ray.data.from_arrow(t), "v",
                                    bins=4))
    assert got.num_rows == 0


@pytest.mark.parametrize("gate", ["op_prep_pipeline", "op_window_dedup",
                                  "op_normalize_text"])
def test_gate_plant_stages_survive_empty_match_batches(
        tmp_path, gate, ray_session):
    """Round-3 driver-parallelism crash: a planted-copy filter that
    matches ZERO rows in a batch used to build a null-typed empty
    literal array and crash binary_join_element_wise. Feed each gate a
    documents table where NO doc_id matches the plant predicate (all
    ids ≡ 1 mod 99), so every batch takes the empty path."""
    import pyarrow.parquet as pq

    from ksql_ray.pipelines.driver_queries import REGISTRY

    n = 40
    docs = pa.table({
        "doc_id": pa.array([99 * i + 1 for i in range(n)], pa.int64()),
        "text": pa.array([f"some text body {i} aaa bbb ccc"
                          for i in range(n)]),
        "lang": pa.array(["en"] * n),
        "source": pa.array(["t"] * n),
        "n_chars": pa.array([20] * n, pa.int64()),
    })
    pq.write_table(docs, str(tmp_path / "documents.parquet"))
    out = REGISTRY[gate].run(str(tmp_path))
    assert out.num_rows >= n  # no crash; originals survive
