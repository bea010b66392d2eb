"""Direct task-based hash exchange (exec/exchange.py): bit-equality vs
the legacy sort-groupby path, empty-block tolerance, and fn-call
semantics (never called on empty partitions)."""

import os

import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray
import ray.data

from ksql_ray.ops.dedup import _partition_by


def _rows(ds):
    t = pa.concat_tables(
        [r for r in ray.get(ds.materialize().to_arrow_refs())
         if r.num_columns],
        promote_options="default")
    return sorted(map(tuple, zip(*[c.to_pylist() for c in t.columns])))


def _make_sum_per_key():
    # returned as a CLOSURE: test modules aren't importable from Ray
    # workers, so a module-level fn would pickle by reference and fail
    def _sum_per_key(group: pa.Table) -> pa.Table:
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        df = group.to_pandas().groupby("k", as_index=False)["v"].sum()
        return pa.Table.from_pandas(df, preserve_index=False)

    return _sum_per_key


_sum_per_key = _make_sum_per_key()


@pytest.fixture
def toy(ray_session):
    return ray.data.from_items(
        [{"k": f"k{i % 13}", "v": i} for i in range(5000)])


def test_direct_matches_sort_path(toy, monkeypatch):
    got = _rows(_partition_by(toy, ["k"], 8).map_groups(
        _sum_per_key, batch_format="pyarrow"))
    monkeypatch.setenv("KSQL_RAY_EXCHANGE", "sort")
    want = _rows(_partition_by(toy, ["k"], 8).map_groups(
        _sum_per_key, batch_format="pyarrow"))
    assert got == want
    assert len(got) == 13


def test_more_partitions_than_keys(toy):
    # empty partitions must be skipped, never call fn
    out = _rows(_partition_by(toy, ["k"], 64).map_groups(
        _sum_per_key, batch_format="pyarrow"))
    assert len(out) == 13


def test_empty_blocks_pass_through(ray_session):
    # a filter that leaves some upstream blocks empty: Ray passes
    # 0-row blocks through map ops as ZERO-COLUMN empties — the
    # exchange must tolerate them (the original production failure)
    ds = ray.data.from_items(
        [{"k": f"k{i % 5}", "v": i} for i in range(2000)],
        override_num_blocks=16).filter(expr="v < 40")
    out = _rows(_partition_by(ds, ["k"], 8).map_groups(
        _sum_per_key, batch_format="pyarrow"))
    assert len(out) == 5
    assert sum(v for _, v in out) == sum(range(40))


def test_empty_input_dataset(ray_session):
    ds = ray.data.from_items(
        [{"k": "a", "v": 1}]).filter(expr="v > 99")
    out = _partition_by(ds, ["k"], 8).map_groups(
        _sum_per_key, batch_format="pyarrow")
    assert out.count() == 0


def test_out_of_range_part_id_raises(ray_session):
    # a tagging stage that disagrees with the caller's partition count
    # must fail loudly, never silently drop rows
    import pytest

    from ksql_ray.exec.exchange import exchange_map_groups

    ds = ray.data.from_items([{"k": i} for i in range(10)]).map_batches(
        lambda b: b.append_column(
            "__part", pa.array([7] * b.num_rows, type=pa.int64())),
        batch_format="pyarrow")
    with pytest.raises(Exception, match="__part ids outside"):
        exchange_map_groups(ds, 4, lambda g: g).materialize()


def test_chained_exchanges(ray_session):
    ds = ray.data.from_items(
        [{"k": f"k{i % 7}", "v": i % 3} for i in range(999)])
    one = _partition_by(ds, ["k"], 8).map_groups(
        _sum_per_key, batch_format="pyarrow")
    two = _rows(_partition_by(one, ["v"], 8).map_groups(
        lambda g: pa.table({
            "n": pa.array([g.num_rows], type=pa.int64())}),
        batch_format="pyarrow"))
    assert sum(n for (n,) in two) == 7


def test_plan_split_groups_bounded_tasks():
    from ksql_ray.exec.exchange import _plan_split_groups

    # 2,000 tiny blocks at P=64: ~64 split tasks (ceil grouping may
    # round down by a few), all refs used exactly once
    sizes = _plan_split_groups(2000, 64)
    assert 32 <= len(sizes) <= 64 and sum(sizes) == 2000
    # tiny inputs never over-split
    assert _plan_split_groups(3, 64) == [1, 1, 1]
    sizes = _plan_split_groups(10_000, 512)
    assert 256 <= len(sizes) <= 512 and sum(sizes) == 10_000
    # P below node width still gets ~32 tasks for read parallelism
    assert 16 <= len(_plan_split_groups(2000, 4)) <= 32


def test_high_block_count_stress_bit_equal(ray_session, monkeypatch):
    """VERDICT r4 item #6: >= 2,000 tiny input blocks x P=64 — the
    grouped split keeps the ref table ~P wide and stays bit-equal to
    the sort path. The sort reference runs on a coarse 8-block layout
    of the SAME rows (at 2,000 tiny blocks Ray's sort shuffle takes
    ~190 s vs ~4 s direct — the measured reason this exchange exists;
    recorded in BASELINE.md)."""
    n = 6000
    items = [{"k": f"k{i % 97}", "v": i} for i in range(n)]
    fine = ray.data.from_items(items, override_num_blocks=2000)
    got = _rows(_partition_by(fine, ["k"], 64).map_groups(
        _sum_per_key, batch_format="pyarrow"))
    monkeypatch.setenv("KSQL_RAY_EXCHANGE", "sort")
    coarse = ray.data.from_items(items, override_num_blocks=8)
    want = _rows(_partition_by(coarse, ["k"], 64).map_groups(
        _sum_per_key, batch_format="pyarrow"))
    assert got == want
    assert len(got) == 97
