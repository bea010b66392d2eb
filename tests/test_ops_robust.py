"""Tests: conversation_stats (combiner metrics), corpus_zipf_stats
(vocabulary shape), mad_outliers (robust per-key flags), and the
smallagg.grouped_agg mixed merge they ride on."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from conftest import SF_DIR, assert_tables_equal, collect


# ------------------------------------------------------ conversation_stats
def test_conversation_stats_vs_duckdb(ray_session, duck):
    from ksql_ray.ops.transcripts import conversation_stats

    ds = ray.data.read_parquet(f"{SF_DIR}/events.parquet")
    got = collect(conversation_stats(
        ds, ["user_id"], ts_col="ts", text_col="props",
        role_col="event_type", roles=("click", "error"), tool_col=None))
    exp = duck.sql("""
        SELECT user_id, count(*)::BIGINT AS n_turns,
          count(*) FILTER (event_type = 'click')::BIGINT AS n_click,
          count(*) FILTER (event_type = 'error')::BIGINT AS n_error,
          sum(length(coalesce(props, '')))::BIGINT AS total_chars,
          min(ts) AS first_ts, max(ts) AS last_ts,
          epoch_us(max(ts) - min(ts)) / 1000000.0 AS duration_s,
          sum(length(coalesce(props, ''))) / count(*)::DOUBLE AS avg_chars
        FROM events GROUP BY user_id""").arrow()
    assert_tables_equal(got, exp)


def test_conversation_stats_nulls_and_roles(ray_session):
    from ksql_ray.ops.transcripts import conversation_stats

    t = pa.table({
        "conv_id": pa.array(["a", "a", "a", "b"]),
        "turn_idx": pa.array([0, 1, 2, 0], pa.int32()),
        "role": pa.array(["user", "assistant", None, "user"]),
        "text": pa.array(["hi", None, "bye", ""]),
        "tool": pa.array([None, "search", None, None]),
        "ts": pa.array([0, 5_000_000, 10_000_000, 7],
                       pa.timestamp("us")),
    })
    out = collect(conversation_stats(
        ray.data.from_arrow(t), ["conv_id"])).to_pandas().set_index(
        "conv_id").sort_index()
    a = out.loc["a"]
    assert a["n_turns"] == 3 and a["n_user"] == 1 and a["n_assistant"] == 1
    assert a["n_tool"] == 1                      # one non-null tool row
    assert a["total_chars"] == 5                 # 'hi' + NULL(0) + 'bye'
    assert a["duration_s"] == pytest.approx(10.0)
    assert a["avg_chars"] == pytest.approx(5 / 3)
    b = out.loc["b"]
    assert b["n_turns"] == 1 and b["total_chars"] == 0
    assert b["duration_s"] == 0.0


def test_grouped_agg_mixed_merge(ray_session):
    from ksql_ray.ops.smallagg import grouped_agg

    t = pa.table({"k": pa.array(["x", "y", "x", "y", "x"]),
                  "s": pa.array([1, 2, 3, 4, 5], pa.int64()),
                  "lo": pa.array([9, 2, 3, 8, 1], pa.int64()),
                  "hi": pa.array([9, 2, 3, 8, 1], pa.int64())})
    out = collect(grouped_agg(
        ray.data.from_arrow(t).repartition(3), ["k"],
        {"s": "sum", "lo": "min", "hi": "max"})).to_pandas().set_index(
        "k").sort_index()
    assert out.loc["x"].tolist() == [9, 1, 9]
    assert out.loc["y"].tolist() == [6, 2, 8]
    with pytest.raises(ValueError):
        grouped_agg(ray.data.from_arrow(t), ["k"], {"s": "mean"})


# ------------------------------------------------------- corpus_zipf_stats
def test_zipf_stats_brute_force(ray_session):
    from ksql_ray.ops.terms import corpus_zipf_stats

    t = pa.table({"text": pa.array([
        "the cat sat on the mat",
        "the dog ate the cat food",
        "zebra",
    ])})
    out = collect(corpus_zipf_stats(
        ray.data.from_arrow(t).repartition(2), k=2)).to_pydict()
    # counts: the=4 cat=2 sat=1 on=1 mat=1 dog=1 ate=1 food=1 zebra=1
    assert out["vocab_size"] == [9]
    assert out["total_tokens"] == [13]
    assert out["hapax_cnt"] == [7]
    assert out["top_mass"] == [pytest.approx(6 / 13)]


def test_zipf_stats_vs_duckdb(ray_session, duck):
    from ksql_ray.ops.terms import corpus_zipf_stats

    ds = ray.data.read_parquet(f"{SF_DIR}/documents.parquet")
    got = collect(corpus_zipf_stats(ds, k=10))
    exp = duck.sql(r"""
        WITH toks AS (SELECT unnest(regexp_split_to_array(
                          trim(lower(text)), '\s+')) AS term FROM documents),
        c AS (SELECT term, count(*) AS cnt FROM toks GROUP BY term),
        t AS (SELECT count(*)::BIGINT AS vocab_size,
                     sum(cnt)::BIGINT AS total_tokens,
                     count(*) FILTER (cnt = 1)::BIGINT AS hapax_cnt FROM c),
        top AS (SELECT sum(cnt)::DOUBLE AS mass FROM
                (SELECT cnt FROM c ORDER BY cnt DESC, term LIMIT 10))
        SELECT vocab_size, total_tokens, hapax_cnt,
               mass / total_tokens AS top_mass FROM t, top""").arrow()
    assert_tables_equal(got, exp)


def test_zipf_stats_empty(ray_session):
    from ksql_ray.ops.terms import corpus_zipf_stats

    empty = pa.table({"text": pa.array([], type=pa.string())})
    out = collect(corpus_zipf_stats(ray.data.from_arrow(empty))).to_pydict()
    assert out == {"vocab_size": [0], "total_tokens": [0],
                   "hapax_cnt": [0], "top_mass": [0.0]}


# ----------------------------------------------------------- mad_outliers
def test_mad_outliers_vs_duckdb(ray_session, duck):
    from ksql_ray.ops.profile import mad_outliers

    ds = ray.data.read_parquet(f"{SF_DIR}/events.parquet")
    got = collect(mad_outliers(ds, "event_type", "value", c=1.5))
    got = got.select(["event_id", "event_type", "med", "mad",
                      "is_outlier"])
    exp = duck.sql("""
        WITH med AS (SELECT event_type, median(value) AS med
                     FROM events GROUP BY 1),
        dev AS (SELECT e.event_type, median(abs(e.value - m.med)) AS mad
                FROM events e JOIN med m USING (event_type) GROUP BY 1)
        SELECT e.event_id, e.event_type, m.med, d.mad,
               (abs(e.value - m.med) > 1.5 * d.mad) AS is_outlier
        FROM events e JOIN med m USING (event_type)
             JOIN dev d USING (event_type)""").arrow()
    assert_tables_equal(got, exp, float_tol=0)


def test_mad_outliers_nulls_and_constant_key(ray_session):
    from ksql_ray.ops.profile import mad_outliers

    t = pa.table({
        "k": pa.array(["c", "c", "c", "n", "n", "o", "o", "o"]),
        "v": pa.array([5.0, 5.0, 5.0, None, None, 1.0, 2.0, 100.0]),
    })
    out = collect(mad_outliers(ray.data.from_arrow(t), "k", "v",
                               c=3.0)).to_pandas()
    c = out[out.k == "c"]
    # constant key: med 5, mad 0, dev 0 -> 0 > 0 is False everywhere
    assert (c.med == 5.0).all() and (c.mad == 0.0).all()
    assert (~c.is_outlier.astype(bool)).all()
    n = out[out.k == "n"]                  # all-null key: everything NULL
    assert n.med.isna().all() and n.is_outlier.isna().all()
    o = out[out.k == "o"].sort_values("v")
    # med 2, devs {1, 0, 98} -> mad 1; only 98 > 3*1
    assert o.is_outlier.tolist() == [False, False, True]


def test_mad_outliers_null_value_rows_flag_null(ray_session):
    from ksql_ray.ops.profile import mad_outliers

    t = pa.table({"k": pa.array(["a"] * 5),
                  "v": pa.array([1.0, 2.0, 3.0, None, 50.0])})
    out = collect(mad_outliers(ray.data.from_arrow(t), "k", "v",
                               c=3.0)).to_pandas()
    assert out.med.iloc[0] == 2.5          # interpolated over 4 valid
    nulls = out[out.v.isna()]
    assert nulls.is_outlier.isna().all()   # NULL value -> NULL flag
    assert out[out.v == 50.0].is_outlier.astype(bool).all()


# ---------------------------------------------------------- source_overlap
def test_source_overlap_brute_force(ray_session):
    from ksql_ray.ops.dedup import source_overlap

    t = pa.table({
        "text": pa.array(["x", "x", "y", "y", "y", "z", "w", "w", "x"]),
        "source": pa.array(["A", "B", "A", "A", "C", "B", "C", "C", "A"]),
    })
    out = {(r["source_a"], r["source_b"]): r["n_groups"]
           for r in source_overlap(
               ray.data.from_arrow(t).repartition(3)).take_all()}
    # x in {A:2, B:1}; y in {A:2, C:1}; w in {C:2}; z unique
    assert out == {("A", "A"): 2, ("A", "B"): 1, ("A", "C"): 1,
                   ("C", "C"): 1}


def test_source_overlap_fast_fingerprint_agrees(ray_session):
    from ksql_ray.ops.dedup import source_overlap

    t = pa.table({
        "text": pa.array(["x", "x", "y", "y", "y", "z", "w", "w", "x"]),
        "source": pa.array(["A", "B", "A", "A", "C", "B", "C", "C", "A"]),
    })
    md5 = sorted(map(tuple, (r.values() for r in source_overlap(
        ray.data.from_arrow(t)).take_all())))
    fast = sorted(map(tuple, (r.values() for r in source_overlap(
        ray.data.from_arrow(t), fingerprint="fast").take_all())))
    assert md5 == fast


def test_source_overlap_no_dups_is_empty(ray_session):
    from ksql_ray.ops.dedup import source_overlap

    t = pa.table({"text": pa.array(["a", "b", "c"]),
                  "source": pa.array(["A", "B", "C"])})
    assert source_overlap(ray.data.from_arrow(t)).count() == 0


def test_conversation_stats_empty_input(ray_session):
    from ksql_ray.ops.transcripts import conversation_stats

    t = pa.table({
        "conv_id": pa.array([], type=pa.string()),
        "role": pa.array([], type=pa.string()),
        "text": pa.array([], type=pa.string()),
        "tool": pa.array([], type=pa.string()),
        "ts": pa.array([], type=pa.timestamp("us")),
    })
    assert conversation_stats(
        ray.data.from_arrow(t), ["conv_id"]).count() == 0


def test_grouping_sets_empty_input(ray_session):
    from ksql_ray.ops.cube import grouping_sets_agg

    t = pa.table({"k": pa.array([], type=pa.string()),
                  "v": pa.array([], type=pa.float64())})
    rows = grouping_sets_agg(ray.data.from_arrow(t), ["k"],
                             [("k",), ()], "v").take_all()
    # the () total row exists even on empty input: cnt 0, sum NULL
    assert len(rows) == 1
    assert rows[0]["cnt_v"] == 0 and rows[0]["sum_v"] is None


def test_conversation_stats_all_null_ts_key(ray_session):
    from ksql_ray.ops.transcripts import conversation_stats

    t = pa.table({
        "conv_id": pa.array(["a", "a", "b"]),
        "role": pa.array(["user", "assistant", "user"]),
        "text": pa.array(["x", "y", "z"]),
        "tool": pa.array([None, None, None], type=pa.string()),
        "ts": pa.array([None, None, 5], type=pa.timestamp("us")),
    })
    out = collect(conversation_stats(
        ray.data.from_arrow(t), ["conv_id"])).to_pandas().set_index(
        "conv_id").sort_index()
    # all-NULL-ts key: span columns NULL, counts still exact
    a = out.loc["a"]
    assert a["n_turns"] == 2 and pd_isna(a["first_ts"])
    assert pd_isna(a["duration_s"])
    b = out.loc["b"]
    assert b["n_turns"] == 1 and not pd_isna(b["first_ts"])


def pd_isna(x):
    import pandas as pd

    return pd.isna(x)


def test_source_overlap_null_source_sql_semantics(ray_session):
    from ksql_ray.ops.dedup import source_overlap

    t = pa.table({
        "text": pa.array(["x", "x", "x", "y", "y"]),
        "source": pa.array(["A", None, None, "B", None]),
    })
    out = {(r["source_a"], r["source_b"]): r["n_groups"]
           for r in source_overlap(ray.data.from_arrow(t)).take_all()}
    # NULL source joins no off-diagonal pair (SQL a.source < b.source);
    # the NULL group's own diagonal (x appears twice under NULL) stays
    assert out == {(None, None): 1}


def test_source_overlap_null_text_no_cross_pairs(ray_session):
    from ksql_ray.ops.dedup import source_overlap

    # two NULL texts in different sources: SQL a.h = b.h with NULL h
    # joins nothing, but each source's own NULL group can still be an
    # intra-source duplicate
    t = pa.table({
        "text": pa.array([None, None, None, "x"], type=pa.string()),
        "source": pa.array(["A", "B", "B", "A"]),
    })
    out = {(r["source_a"], r["source_b"]): r["n_groups"]
           for r in source_overlap(ray.data.from_arrow(t)).take_all()}
    assert out == {("B", "B"): 1}     # two NULL texts within B
