"""Property tests for the direct exchange family: random data, random
partition counts, random emptiness — direct vs sort-path bit equality,
topk_table vs global sort + limit, grouped_sum vs pandas."""

import numpy as np
import pandas as pd
import pyarrow as pa
import pytest
import ray
import ray.data
from hypothesis import given, settings
from hypothesis import strategies as st

from ksql_ray.ops.dedup import _partition_by
from ksql_ray.ops.smallagg import grouped_sum, topk_table


def _collect(ds) -> pa.Table:
    ts = [t for t in ray.get(ds.materialize().to_arrow_refs())
          if t.num_columns]
    if not ts:
        return pa.table({})
    return pa.concat_tables(ts, promote_options="default")


@settings(max_examples=12, deadline=None)
@given(
    n=st.integers(0, 400),
    n_keys=st.integers(1, 40),
    parts=st.sampled_from([1, 2, 7, 32, 64]),
    blocks=st.sampled_from([1, 3, 16]),
    seed=st.integers(0, 2**31 - 1),
)
def test_exchange_matches_pandas_groupsum(ray_session, n, n_keys, parts,
                                          blocks, seed):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, n_keys, n)
    vals = rng.integers(-100, 100, n)
    ds = ray.data.from_items(
        [{"k": int(k), "v": int(v)} for k, v in zip(keys, vals)],
        override_num_blocks=blocks) if n else ray.data.from_items(
        [{"k": 0, "v": 0}]).filter(expr="v > 1")

    def fn(g: pa.Table) -> pa.Table:
        if "__part" in g.column_names:
            g = g.drop_columns(["__part"])
        df = g.to_pandas().groupby("k", as_index=False)["v"].sum()
        return pa.Table.from_pandas(df, preserve_index=False)

    got = _collect(_partition_by(ds, ["k"], parts).map_groups(
        fn, batch_format="pyarrow"))
    want = (pd.DataFrame({"k": keys, "v": vals}).groupby("k")["v"].sum()
            if n else pd.Series(dtype=np.int64))
    got_d = (dict(zip(got.column("k").to_pylist(),
                      got.column("v").to_pylist()))
             if got.num_columns else {})
    assert got_d == want.to_dict()


@settings(max_examples=12, deadline=None)
@given(
    n=st.integers(0, 500),
    k=st.integers(1, 50),
    blocks=st.sampled_from([1, 4, 16]),
    seed=st.integers(0, 2**31 - 1),
)
def test_topk_table_matches_global_sort(ray_session, n, k, blocks, seed):
    rng = np.random.default_rng(seed)
    score = rng.integers(0, 50, n)  # deliberate ties
    ids = rng.permutation(n) if n else np.array([], dtype=np.int64)
    ds = ray.data.from_items(
        [{"i": int(i), "s": int(s)} for i, s in zip(ids, score)],
        override_num_blocks=blocks) if n else ray.data.from_items(
        [{"i": 0, "s": 0}]).filter(expr="s > 1")
    got = _collect(topk_table(
        ds, [("s", "descending"), ("i", "ascending")], k))
    df = pd.DataFrame({"i": ids, "s": score}).sort_values(
        ["s", "i"], ascending=[False, True]).head(k)
    if got.num_columns:
        assert got.column("s").to_pylist() == df["s"].tolist()
        assert got.column("i").to_pylist() == df["i"].tolist()
    else:
        assert len(df) == 0


@settings(max_examples=8, deadline=None)
@given(
    n=st.integers(0, 300),
    n_keys=st.integers(1, 10),
    seed=st.integers(0, 2**31 - 1),
)
def test_grouped_sum_matches_pandas(ray_session, n, n_keys, seed):
    rng = np.random.default_rng(seed)
    keys = rng.integers(0, n_keys, n)
    vals = rng.integers(-5, 5, n)
    parts = ray.data.from_items(
        [{"g": int(g), "c": int(c)} for g, c in zip(keys, vals)]
    ) if n else ray.data.from_items(
        [{"g": 0, "c": 0}]).filter(expr="c > 99")
    got = _collect(grouped_sum(parts, ["g"], ["c"]))
    want = pd.DataFrame({"g": keys, "c": vals}).groupby("g")["c"].sum(
    ).to_dict() if n else {}
    got_d = (dict(zip(got.column("g").to_pylist(),
                      got.column("c").to_pylist()))
             if got.num_columns and got.num_rows else {})
    assert got_d == want
