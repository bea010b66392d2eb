"""Line-level cleanup (ops/lines.py): intra-doc first-occurrence
dedup and corpus-frequency boilerplate removal. sf0.01 DuckDB oracles
run via the op_dedup_lines / op_strip_boilerplate gates."""

import pyarrow as pa
import ray
import ray.data

from ksql_ray.ops.lines import (dedup_lines, frequent_line_hashes,
                                strip_frequent_lines)


def _out(ds):
    t = pa.concat_tables(
        [r for r in ray.get(ds.materialize().to_arrow_refs())
         if r.num_columns], promote_options="default")
    return dict(zip(t.column("doc_id").to_pylist(),
                    t.column("text").to_pylist()))


def test_dedup_lines_first_occurrence(ray_session):
    ds = ray.data.from_items([
        {"doc_id": 0, "text": "a\nb\na\nc\nb\na"},
        {"doc_id": 1, "text": "x"},
        {"doc_id": 2, "text": ""},
        {"doc_id": 3, "text": None},
    ])
    assert _out(dedup_lines(ds)) == {0: "a\nb\nc", 1: "x", 2: "", 3: ""}


def test_dedup_lines_is_per_doc(ray_session):
    # the same line in TWO docs survives in both (dedup is intra-doc)
    ds = ray.data.from_items([
        {"doc_id": 0, "text": "same\nother"},
        {"doc_id": 1, "text": "same\nmore"},
    ])
    out = _out(dedup_lines(ds))
    assert out[0].startswith("same") and out[1].startswith("same")


def test_strip_frequent_distinct_doc_counting(ray_session):
    # "twice" repeats WITHIN one doc (1 distinct doc -> kept);
    # "banner" appears once in each of 3 docs (3 distinct -> dropped)
    ds = ray.data.from_items([
        {"doc_id": 0, "text": "twice\ntwice\nbanner\nu0"},
        {"doc_id": 1, "text": "banner\nu1"},
        {"doc_id": 2, "text": "banner\nu2"},
    ])
    out = _out(strip_frequent_lines(ds, min_docs=3))
    assert out == {0: "twice\ntwice\nu0", 1: "u1", 2: "u2"}


def test_strip_all_lines_removed(ray_session):
    ds = ray.data.from_items(
        [{"doc_id": i, "text": "only boilerplate"} for i in range(4)])
    out = _out(strip_frequent_lines(ds, min_docs=2))
    assert out == {i: "" for i in range(4)}


def test_frequent_set_reuse_and_cap(ray_session):
    import pytest

    ds = ray.data.from_items(
        [{"doc_id": i, "text": f"common\nrare {i}"} for i in range(6)])
    ref = frequent_line_hashes(ds, min_docs=4)
    assert len(ray.get(ref)) == 1
    out = _out(strip_frequent_lines(ds, frequent_ref=ref))
    assert all(v == f"rare {k}" for k, v in out.items())
    with pytest.raises(ValueError):
        frequent_line_hashes(ds, min_docs=1, max_frequent=2)
