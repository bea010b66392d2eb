"""Pipeline-ops tests: text analysis, dedup (exact/minhash/simhash/
embedding), ANN search, multimodal plumbing."""

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import pytest
import ray.data

from conftest import SF_DIR, assert_tables_equal, collect


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    return ray.data.read_parquet(f"{SF_DIR}/documents.parquet")


@pytest.fixture(scope="module")
def emb_ds(ray_session):
    return ray.data.read_parquet(f"{SF_DIR}/embeddings.parquet")


# ------------------------------------------------------------------ text
def test_text_analysis(docs_ds, duck):
    from ksql_ray.ops.text import analyze_documents

    tbl = collect(analyze_documents(docs_ds))
    assert tbl.num_rows == 500
    exp = duck.execute(
        "SELECT doc_id, length(text) AS char_count, "
        "length(regexp_split_to_array(trim(text), '\\s+')) AS token_count, "
        "md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS fingerprint "
        "FROM documents"
    ).arrow()
    got = tbl.select(["doc_id", "char_count", "token_count", "fingerprint"])
    assert_tables_equal(got, exp)
    # lang / quality deterministic and in range
    langs = set(tbl.column("lang_pred").to_pylist())
    assert langs <= {"en", "de", "fr", "es", "ja", "und"}
    q = tbl.column("quality").to_numpy()
    assert ((q >= 0) & (q <= 1)).all()


# ------------------------------------------------------------------ dedup
def test_exact_dedup(docs_ds, duck):
    from ksql_ray.ops.dedup import exact_dedup_keys

    out = collect(exact_dedup_keys(docs_ds))
    exp = duck.execute(
        "SELECT md5(trim(regexp_replace(lower(text), '\\s+', ' ', 'g'))) AS h, "
        "min(doc_id) AS doc_id, count(*) AS dup_count FROM documents GROUP BY 1"
    ).arrow()
    assert_tables_equal(out, exp)


def _dup_docs_ds():
    """Documents with planted near/exact duplicates."""
    base = [
        "the quick brown fox jumps over the lazy dog and runs far away home",
        "a completely different document about streaming engines and state",
        "numbers one two three four five six seven eight nine ten eleven",
    ]
    texts, ids = [], []
    i = 0
    for b in base:
        for variant in (b, b, b + " extra"):  # exact dup + near dup
            texts.append(variant)
            ids.append(i)
            i += 1
    return ray.data.from_arrow(pa.table({"doc_id": pa.array(ids, type=pa.int64()),
                                         "text": pa.array(texts)}))


def test_minhash_pairs(ray_session):
    from ksql_ray.ops.dedup import minhash_dedup_pairs

    ds = _dup_docs_ds()
    pairs = collect(minhash_dedup_pairs(ds, threshold=0.5))
    got = set(zip(pairs.column("doc_a").to_pylist(), pairs.column("doc_b").to_pylist()))
    # exact duplicates within each trio must be found
    for b in (0, 3, 6):
        assert (b, b + 1) in got
    # different base docs must NOT pair
    for a, b in got:
        assert a // 3 == b // 3


def test_similarity_join(ray_session, duck):
    from ksql_ray.ops.dedup import similarity_join

    base = [
        "the quick brown fox jumps over the lazy dog and runs far away",
        "a completely different document about streaming engines and state",
        "numbers one two three four five six seven eight nine ten eleven",
    ]
    # left: the three bases; right: one near-dup of base 0, one exact
    # dup of base 2, one unrelated — negative ids exercise the parity
    # decode
    left = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([0, 1, -2], type=pa.int64()),
        "text": pa.array(base)}))
    right_rows = pa.table({
        "doc_id": pa.array([10, -11, 12], type=pa.int64()),
        "text": pa.array([base[0] + " again", base[2],
                          "nothing shared with anything at all here ok"])})
    right = ray.data.from_arrow(right_rows)
    out = collect(similarity_join(left, right, threshold=0.5))
    got = {(la, rb): j for la, rb, j in zip(
        out.column("left_id").to_pylist(),
        out.column("right_id").to_pylist(),
        out.column("jaccard").to_pylist())}
    assert set(got) == {(0, 10), (-2, -11)}
    assert got[(-2, -11)] == 1.0
    # exact-jaccard oracle for the matched near-dup pair
    import pandas as pd

    con = duck
    con.register("sj_l", pa.table({"doc_id": [0], "text": [base[0]]}))
    con.register("sj_r", pa.table({"doc_id": [10],
                                   "text": [base[0] + " again"]}))
    exp = con.execute(r"""
        WITH gl AS (
          SELECT DISTINCT unnest(list_transform(range(1, len(t) - 1),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
          FROM (SELECT regexp_split_to_array(trim(lower(text)), '\s+')
                AS t FROM sj_l)
        ), gr AS (
          SELECT DISTINCT unnest(list_transform(range(1, len(t) - 1),
                 i -> t[i] || ' ' || t[i+1] || ' ' || t[i+2])) AS g
          FROM (SELECT regexp_split_to_array(trim(lower(text)), '\s+')
                AS t FROM sj_r)
        )
        SELECT (SELECT count(*) FROM gl JOIN gr USING (g))::DOUBLE
               / ((SELECT count(*) FROM gl) + (SELECT count(*) FROM gr)
                  - (SELECT count(*) FROM gl JOIN gr USING (g)))
    """).fetchone()[0]
    assert got[(0, 10)] == pytest.approx(exp, abs=1e-12)
    # same-side near-dups (base0 left vs base0-left) must NOT appear:
    # left ids only on the left, right ids only on the right
    assert all(k[0] in (0, 1, -2) and k[1] in (10, -11, 12) for k in got)


def test_simhash_pairs(ray_session):
    from ksql_ray.ops.dedup import simhash_pairs

    ds = _dup_docs_ds()
    pairs = collect(simhash_pairs(ds, max_hamming=3))
    got = set(zip(pairs.column("doc_a").to_pylist(), pairs.column("doc_b").to_pylist()))
    for b in (0, 3, 6):
        assert (b, b + 1) in got
    hams = dict(zip(zip(pairs.column("doc_a").to_pylist(), pairs.column("doc_b").to_pylist()),
                    pairs.column("hamming").to_pylist()))
    assert hams[(0, 1)] == 0  # identical text -> identical simhash


def test_embedding_neardup(ray_session):
    from ksql_ray.ops.dedup import embedding_neardup_pairs

    rng = np.random.default_rng(7)
    base = rng.standard_normal((20, 32))
    # plant near-dups: rows 20..24 are tiny perturbations of rows 0..4
    near = base[:5] + rng.standard_normal((5, 32)) * 0.01
    m = np.vstack([base, near])
    ds = ray.data.from_arrow(pa.table({
        "vec_id": pa.array(np.arange(25), type=pa.int64()),
        "embedding": pa.array([list(map(float, r)) for r in m], type=pa.list_(pa.float32())),
    }))
    pairs = collect(embedding_neardup_pairs(ds, threshold=0.98))
    got = set(zip(pairs.column("vec_a").to_pylist(), pairs.column("vec_b").to_pylist()))
    assert {(i, 20 + i) for i in range(5)} <= got


# ------------------------------------------------------------------ ANN
def test_brute_force_topk_vs_oracle(emb_ds, duck):
    from ksql_ray.ops.ann import brute_force_topk

    qrows = duck.execute(
        "SELECT vec_id, embedding FROM embeddings WHERE vec_id < 5 ORDER BY vec_id"
    ).fetchall()
    qids = [r[0] for r in qrows]
    qm = np.array([r[1] for r in qrows], dtype=np.float64)
    got = collect(brute_force_topk(emb_ds, qids, qm, k=10))
    exp = duck.execute("""
        WITH qn AS (
          SELECT vec_id, embedding, sqrt(list_sum(list_transform(embedding, x -> x*x))) AS n
          FROM embeddings WHERE vec_id < 5
        ), en AS (
          SELECT vec_id, embedding, sqrt(list_sum(list_transform(embedding, x -> x*x))) AS n
          FROM embeddings
        )
        SELECT q.vec_id AS query_id, e.vec_id AS vec_id,
               row_number() OVER (
                 PARTITION BY q.vec_id
                 ORDER BY list_inner_product(q.embedding, e.embedding)/(q.n*e.n) DESC,
                          e.vec_id) AS rank
        FROM qn q CROSS JOIN en e WHERE e.vec_id != q.vec_id
        QUALIFY rank <= 10
    """).arrow()
    assert_tables_equal(got, exp)


def test_ivf_topk_recall(emb_ds, ray_session):
    from ksql_ray.ops.ann import brute_force_topk, ivf_topk
    import duckdb

    con = duckdb.connect()
    rows = con.execute(
        f"SELECT vec_id, embedding FROM '{SF_DIR}/embeddings.parquet' WHERE vec_id < 5"
    ).fetchall()
    con.close()
    qids = [r[0] for r in rows]
    qm = np.array([r[1] for r in rows], dtype=np.float64)
    exact = collect(brute_force_topk(emb_ds, qids, qm, k=10))
    approx = collect(ivf_topk(emb_ds, qids, qm, k=10, n_planes=4))
    e = set(zip(exact.column("query_id").to_pylist(), exact.column("vec_id").to_pylist()))
    a = set(zip(approx.column("query_id").to_pylist(), approx.column("vec_id").to_pylist()))
    recall = len(e & a) / len(e)
    assert recall >= 0.2, f"IVF recall too low: {recall}"  # approximate by design


# ------------------------------------------------------------------ media
def test_media_pipeline_fake_decode(ray_session):
    from ksql_ray.ops.multimodal import (
        MediaFeatureExtractor, extract_media_features, frame_sample_stub,
        synth_media_table,
    )

    tbl = synth_media_table(48, seed=42)
    ds = ray.data.from_arrow(tbl)
    out = collect(extract_media_features(ds, decode="fake", batch_size=8, concurrency=2))
    assert out.num_rows == 48
    assert out.schema.field("features").type == pa.list_(pa.float64())
    # deterministic: same payload -> same features
    out2 = MediaFeatureExtractor(decode="fake")(tbl)
    f1 = sorted(zip(out.column("media_id").to_pylist(), map(tuple, out.column("features").to_pylist())))
    f2 = sorted(zip(out2.column("media_id").to_pylist(), map(tuple, out2.column("features").to_pylist())))
    assert f1 == f2
    # strict decode raises (the production plug-in slot)
    with pytest.raises(NotImplementedError):
        MediaFeatureExtractor(decode="strict")(tbl.slice(0, 1))
    # frame sampling expands videos deterministically
    frames = frame_sample_stub(tbl)
    durs = {i: d for i, k, d in zip(tbl.column("media_id").to_pylist(),
                                    tbl.column("kind").to_pylist(),
                                    tbl.column("duration_ms").to_pylist()) if k == "video"}
    counts = {}
    for mid in frames.column("media_id").to_pylist():
        counts[mid] = counts.get(mid, 0) + 1
    for mid, d in durs.items():
        assert counts[mid] == max(1, d // 1000)


def test_ngram_jaccard_pairs(ray_session):
    from ksql_ray.ops.dedup import ngram_jaccard_pairs

    ds = _dup_docs_ds()
    pairs = collect(ngram_jaccard_pairs(ds, threshold=0.5))
    got = {(a, b): j for a, b, j in zip(pairs.column("doc_a").to_pylist(),
                                        pairs.column("doc_b").to_pylist(),
                                        pairs.column("jaccard").to_pylist())}
    # exact duplicates have jaccard exactly 1.0
    for base in (0, 3, 6):
        assert got.get((base, base + 1)) == 1.0
    # near-dup (extra token) has 0.5 <= j < 1
    for base in (0, 3, 6):
        key = (base, base + 2)
        if key in got:
            assert 0.5 <= got[key] < 1.0
    # no cross-base pairs
    for a, b in got:
        assert a // 3 == b // 3


def test_cap_stats_and_fast_fingerprint(ray_session):
    """No-silent-caps: star-capped jumbo buckets surface in op stats;
    128-bit fast fingerprint agrees with md5 on grouping."""
    from ksql_ray.ops.dedup import exact_dedup_keys, minhash_dedup_pairs, simhash_pairs
    from ksql_ray.ops.stats import collect_op_stats

    texts = (["the quick brown fox jumps over the lazy dog again"] * 100
             + [f"unique doc number {i} with distinct words {i * 7}" for i in range(50)])
    tbl = pa.table({
        "doc_id": pa.array(np.arange(len(texts)), type=pa.int64()),
        "text": pa.array(texts),
    })
    ds = ray.data.from_arrow(tbl)

    collect_op_stats()  # clear any residue from earlier tests
    # 100 identical docs share every LSH bucket -> star cap (>64) fires
    pairs = collect(minhash_dedup_pairs(ds, threshold=0.8, verify="est"))
    stats = collect_op_stats()
    assert pairs.num_rows == 99  # star pairs: doc 0 vs each duplicate
    assert stats.get("minhash.capped_buckets", 0) > 0
    assert stats.get("minhash.capped_members", 0) > 0

    collect(simhash_pairs(ds, max_hamming=2))
    stats = collect_op_stats()
    assert stats.get("simhash.capped_buckets", 0) > 0

    # fast (128-bit, two int64 keys) and md5 modes group identically
    fast = collect(exact_dedup_keys(ds, fingerprint="fast"))
    md5 = collect(exact_dedup_keys(ds, fingerprint="md5"))
    assert {"h", "h_hi"} <= set(fast.column_names)
    f = sorted(zip(fast.column("doc_id").to_pylist(), fast.column("dup_count").to_pylist()))
    m = sorted(zip(md5.column("doc_id").to_pylist(), md5.column("dup_count").to_pylist()))
    assert f == m


def test_simhash_blocks_scheme_exact(ray_session):
    """Block-union tables (the 10^9-doc scale path) recover exactly the
    brute-force Hamming<=3 pairs, including pairs the chunk scheme loses
    to star-capped jumbo buckets — and the caps are visible in op stats."""
    from ksql_ray.ops.dedup import simhash_pairs, simhash_stage
    from ksql_ray.ops.stats import collect_op_stats

    base = [
        f"the quick brown fox {i} jumps over the lazy dog {i * 3} "
        "extra words here for volume" for i in range(300)
    ]
    texts = []
    for i, b in enumerate(base):
        texts.append(b)
        if i % 5 == 0:
            texts.append(b + " tail")
    tbl = pa.table({
        "doc_id": pa.array(np.arange(len(texts)), type=pa.int64()),
        "text": pa.array(texts),
    })
    st = simhash_stage(tbl)
    sims = st.column("simhash").to_numpy(zero_copy_only=False).view(np.uint64)
    n = len(sims)
    x = sims[:, None] ^ sims[None, :]
    hd = np.unpackbits(x.view(np.uint8).reshape(n, n, 8), axis=2).sum(axis=2)
    brute = {(i, j, int(hd[i, j]))
             for i in range(n) for j in range(i + 1, n) if hd[i, j] <= 3}

    ds = ray.data.from_arrow(tbl)
    collect_op_stats()
    got_blocks = {(r["doc_a"], r["doc_b"], r["hamming"])
                  for r in simhash_pairs(ds, max_hamming=3, scheme="blocks").take_all()}
    assert collect_op_stats().get("simhash.capped_buckets", 0) == 0
    assert got_blocks == brute

    got_chunks = {(r["doc_a"], r["doc_b"], r["hamming"])
                  for r in simhash_pairs(ds, max_hamming=3, scheme="chunks").take_all()}
    stats = collect_op_stats()
    # this fixture is built to overflow one 16-bit-chunk bucket: the cap
    # fires, is REPORTED, and blocks-scheme recall covers the loss
    assert got_chunks <= brute
    if got_chunks != brute:
        assert stats.get("simhash.capped_buckets", 0) > 0


# ------------------------------------------------------ hard-negative mining
def test_hard_negatives_brute_force(ray_session):
    import numpy as np

    from ksql_ray.ops.ann import mine_hard_negatives

    # anchors on axes: nearest different-label vector is unambiguous
    vecs = np.array([
        [1.0, 0.0], [0.9, 0.1],        # label 0 cluster
        [0.0, 1.0], [0.1, 0.9],        # label 1 cluster
        [0.7, 0.7],                    # label 2, between clusters
    ])
    t = pa.table({
        "vec_id": pa.array(range(5), pa.int64()),
        "embedding": pa.array(vecs.tolist(),
                              type=pa.list_(pa.float32())),
        "label": pa.array([0, 0, 1, 1, 2], pa.int32()),
    })
    out = {(r["anchor_id"], r["rank"]): r["neg_id"]
           for r in mine_hard_negatives(
               ray.data.from_arrow(t).repartition(2), k=1).take_all()}
    # the diagonal vector 4 is every axis cluster's hardest negative
    assert out[(0, 1)] == 4 and out[(2, 1)] == 4
    # for 4 itself both clusters tie by symmetry -> lowest neg_id wins
    assert out[(4, 1)] in (1, 3)


def test_hard_negatives_same_label_only_is_empty(ray_session):
    import numpy as np

    from ksql_ray.ops.ann import mine_hard_negatives

    t = pa.table({
        "vec_id": pa.array([0, 1], pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [0.0, 1.0]],
                              type=pa.list_(pa.float32())),
        "label": pa.array([7, 7], pa.int32()),
    })
    assert mine_hard_negatives(ray.data.from_arrow(t), k=3).count() == 0


def test_hard_negatives_anchor_subset(ray_session):
    import numpy as np

    from ksql_ray.ops.ann import mine_hard_negatives

    rng = np.random.default_rng(0)
    vecs = rng.standard_normal((20, 4))
    t = pa.table({
        "vec_id": pa.array(range(20), pa.int64()),
        "embedding": pa.array(vecs.tolist(), type=pa.list_(pa.float32())),
        "label": pa.array([i % 3 for i in range(20)], pa.int32()),
    })
    rows = mine_hard_negatives(ray.data.from_arrow(t), k=2,
                               anchor_ids=[3, 7]).take_all()
    assert {r["anchor_id"] for r in rows} == {3, 7}
    assert all(r["rank"] <= 2 for r in rows)
    # negatives never share the anchor's label
    lbl = {i: i % 3 for i in range(20)}
    assert all(lbl[r["anchor_id"]] != lbl[r["neg_id"]] for r in rows)


def test_hard_negatives_null_labels_match_sql_semantics(ray_session):
    import numpy as np

    from ksql_ray.ops.ann import mine_hard_negatives

    t = pa.table({
        "vec_id": pa.array([0, 1, 2], pa.int64()),
        "embedding": pa.array([[1.0, 0.0], [0.9, 0.1], [0.0, 1.0]],
                              type=pa.list_(pa.float32())),
        "label": pa.array([0, None, 1], pa.int32()),
    })
    rows = mine_hard_negatives(ray.data.from_arrow(t), k=3).take_all()
    # SQL label <> label: the NULL-label row 1 is never an anchor nor
    # a negative — only (0 <-> 2) pair up
    assert {(r["anchor_id"], r["neg_id"]) for r in rows} == \
        {(0, 2), (2, 0)}
