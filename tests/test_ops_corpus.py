"""Corpus-ops tests: Gopher-style repetition stats / quality filter,
PII scrubbing, deterministic stratified sampling, top-k terms."""

import numpy as np
import pyarrow as pa
import pytest
import ray.data

from conftest import SF_DIR, assert_tables_equal, collect


@pytest.fixture(scope="module")
def docs_ds(ray_session):
    return ray.data.read_parquet(f"{SF_DIR}/documents.parquet")


# -------------------------------------------------------- repetition stats
def _stats_tbl():
    return pa.table({
        "doc_id": pa.array(range(6), pa.int64()),
        "text": pa.array([
            "the cat sat on the mat",            # 'the' twice: 6 tok, 5 distinct
            "spam spam spam spam",               # all same
            "one\ntwo\none\ntwo\nthree",         # dup lines
            "   ",                               # whitespace-only -> [''] token
            "Hello... wait #### what...",
            "Unique words only here",
        ]),
    })


def test_repetition_stats_brute_force():
    from ksql_ray.ops.quality import add_repetition_stats

    out = add_repetition_stats(_stats_tbl()).to_pydict()

    def brute(text):
        toks = __import__("re").split(r"\s+", text.strip().lower())
        lines = text.split("\n")
        from collections import Counter
        tc = Counter(toks)
        r6 = lambda x: np.floor(x * 1e6 + 0.5) / 1e6
        return (
            r6(1 - len(tc) / len(toks)),
            r6(max(tc.values()) / len(toks)),
            r6(sum(len(t) for t in toks) / len(toks)),
            r6((text.count("#") + text.count("...")) / len(toks)),
            r6(1 - len(set(lines)) / len(lines)),
        )

    for i, text in enumerate(_stats_tbl().column("text").to_pylist()):
        exp = brute(text)
        got = (out["dup_word_frac"][i], out["top_word_frac"][i],
               out["mean_word_len"][i], out["symbol_word_ratio"][i],
               out["dup_line_frac"][i])
        assert got == pytest.approx(exp, abs=0), (i, got, exp)


def test_repetition_stats_vs_duckdb(docs_ds, duck):
    from ksql_ray.ops.quality import add_repetition_stats
    from ksql_ray.pipelines.driver_queries import REGISTRY

    got = collect(docs_ds.map_batches(
        add_repetition_stats, batch_format="pyarrow", zero_copy_batch=True,
    )).select(["doc_id", "dup_word_frac", "top_word_frac", "mean_word_len",
               "symbol_word_ratio", "dup_line_frac"])
    exp = duck.execute(REGISTRY["op_quality_filter"].sql).arrow()
    assert_tables_equal(got, exp)


def test_quality_filter_thresholds(ray_session):
    from ksql_ray.ops.quality import quality_filter

    ds = ray.data.from_arrow(_stats_tbl())
    kept = collect(quality_filter(
        ds, max_dup_word_frac=0.2, max_top_word_frac=0.5,
        max_dup_line_frac=0.1, min_mean_word_len=2.0, max_mean_word_len=12.0,
        max_symbol_word_ratio=0.5,
    ))
    # doc 0 passes (dup_word 1/6 < .2); 1 fails dup_word; 2 fails dup_line;
    # 3 fails mean_word_len (0); 4 fails symbol ratio (5/4 > .5); 5 passes
    assert sorted(kept.column("doc_id").to_pylist()) == [0, 5]
    assert kept.column_names == ["doc_id", "text"]  # stats dropped

    with_stats = collect(quality_filter(ds, keep_stats=True))
    assert "dup_word_frac" in with_stats.column_names


# ------------------------------------------------------------- PII scrub
def test_scrub_pii_forms():
    from ksql_ray.ops.scrub import scrub_pii

    t = pa.table({"text": pa.array([
        "mail a.b+c@d-e.co.uk now",
        "go to https://x.y/z?a=1#f and http://plain.com",
        "host 192.168.0.1 done",
        "url with creds http://u@h.com/p then bare u@h.com",
        "nothing here",
    ])})
    out = scrub_pii(t).to_pydict()
    assert out["text_scrubbed"] == [
        "mail <EMAIL> now",
        "go to <URL> and <URL>",
        "host <IP> done",
        "url with creds <URL> then bare <EMAIL>",
        "nothing here",
    ]
    assert out["n_emails"] == [1, 0, 0, 1, 0]
    assert out["n_urls"] == [0, 2, 0, 1, 0]
    assert out["n_ips"] == [0, 0, 1, 0, 0]


def test_scrub_documents_replace(ray_session):
    from ksql_ray.ops.scrub import scrub_documents

    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array(["ping bob@x.io", "clean"]),
    }))
    out = collect(scrub_documents(ds)).sort_by("doc_id")
    assert out.column("text").to_pylist() == ["ping <EMAIL>", "clean"]
    assert out.column("n_emails").to_pylist() == [1, 0]
    assert "text_scrubbed" not in out.column_names


# ------------------------------------------------------ stratified sample
def test_stratified_sample_md5_vs_duckdb(docs_ds, duck):
    from ksql_ray.ops.sample import stratified_sample

    got = collect(stratified_sample(
        docs_ds, "doc_id", fractions={"en": 0.5, "de": 1.0},
        strata_col="lang", default_fraction=0.1,
    ))
    exp = duck.execute(
        "SELECT * FROM documents WHERE "
        "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT "
        "< (CASE lang WHEN 'en' THEN 0.5 WHEN 'de' THEN 1.0 ELSE 0.1 END) "
        "* 4294967296.0"
    ).arrow()
    assert sorted(got.column("doc_id").to_pylist()) == \
        sorted(exp.column("doc_id").to_pylist())


def test_stratified_sample_deterministic_and_fast(docs_ds):
    from ksql_ray.ops.sample import stratified_sample

    a = collect(stratified_sample(docs_ds, "doc_id", fractions=0.3))
    b = collect(stratified_sample(docs_ds, "doc_id", fractions=0.3))
    assert sorted(a.column("doc_id").to_pylist()) == \
        sorted(b.column("doc_id").to_pylist())
    # different seed -> different (deterministic) subset
    c = collect(stratified_sample(docs_ds, "doc_id", fractions=0.3, seed="s2"))
    assert sorted(a.column("doc_id").to_pylist()) != \
        sorted(c.column("doc_id").to_pylist())
    # fast method: roughly the right rate, deterministic
    f1 = collect(stratified_sample(docs_ds, "doc_id", fractions=0.3, method="fast"))
    f2 = collect(stratified_sample(docs_ds, "doc_id", fractions=0.3, method="fast"))
    assert sorted(f1.column("doc_id").to_pylist()) == \
        sorted(f2.column("doc_id").to_pylist())
    assert 0.15 < f1.num_rows / 500 < 0.45

    with pytest.raises(ValueError):
        stratified_sample(docs_ds, "doc_id", fractions={"en": 1.0})  # no strata_col


# ------------------------------------------------------------- top terms
def test_top_terms_vs_duckdb(docs_ds, duck):
    from ksql_ray.ops.terms import top_terms

    got = collect(top_terms(docs_ds, k=10))
    exp = duck.execute(
        r"WITH toks AS (SELECT unnest(regexp_split_to_array(trim(lower(text)),"
        r" '\s+')) AS term FROM documents) "
        "SELECT term, count(*) AS cnt FROM toks GROUP BY 1 "
        "ORDER BY cnt DESC, term LIMIT 10"
    ).arrow()
    # ordered comparison: the op's contract includes the (cnt desc, term asc) order
    assert got.to_pydict() == exp.to_pydict()


def test_top_terms_tie_break(ray_session):
    from ksql_ray.ops.terms import top_terms

    ds = ray.data.from_arrow(pa.table({
        "text": pa.array(["b a", "a c b", "d d"]),
    }))
    got = collect(top_terms(ds, k=3)).to_pydict()
    # counts: a=2 b=2 d=2 c=1 -> top3 by (cnt desc, term asc) = a, b, d
    assert got["term"] == ["a", "b", "d"]
    assert got["cnt"] == [2, 2, 2]


def test_top_ngrams_brute(ray_session):
    from collections import Counter

    from ksql_ray.ops.terms import top_ngrams

    rng = np.random.default_rng(5)
    words = ["aa", "bb", "cc", "dd"]
    docs = [" ".join(words[j] for j in rng.integers(0, 4,
                                                    rng.integers(0, 9)))
            for _ in range(80)] + ["", "solo", None, "  x  y  "]
    ds = ray.data.from_arrow(pa.table({"text": pa.array(docs)}))
    for n in (2, 3):
        want = Counter()
        for d in docs:
            toks = (d or "").strip().split()
            toks = toks if toks else [""]
            for i in range(len(toks) - n + 1):
                want[" ".join(toks[i:i + n])] += 1
        top = sorted(want.items(), key=lambda kv: (-kv[1], kv[0]))[:10]
        got = collect(top_ngrams(ds, n=n, k=10)).to_pydict()
        assert list(zip(got["term"], got["cnt"])) == top, n


def test_top_ngrams_large_string(ray_session):
    # bench's to_docs emits large_string text; the join-separator kernel
    # must match that value type (regression: no kernel for
    # (large_string, large_string, string))
    from ksql_ray.ops.terms import top_ngrams

    ds = ray.data.from_arrow(pa.table({
        "text": pa.array(["a b a b", "b a"], type=pa.large_string())}))
    got = collect(top_ngrams(ds, n=2, k=3)).to_pydict()
    assert list(zip(got["term"], got["cnt"])) == [
        ("a b", 2), ("b a", 2)]


def test_top_ngrams_validation(ray_session):
    from ksql_ray.ops.terms import top_ngrams

    ds = ray.data.from_arrow(pa.table({"text": pa.array(["a b"])}))
    with pytest.raises(ValueError):
        top_ngrams(ds, n=1)


def test_tfidf_top_terms_brute(ray_session):
    import collections
    import math

    from ksql_ray.ops.terms import tfidf_top_terms

    docs = ["a a b c", "a b b d", "c c c e", "a d e f", "b b b b"]
    t = pa.table({"doc_id": pa.array(range(5), pa.int64()),
                  "text": pa.array(docs)})
    got = collect(tfidf_top_terms(
        ray.data.from_arrow(t).repartition(3), "doc_id", "text", k=2))
    tf = [collections.Counter(d.split()) for d in docs]
    df = collections.Counter(tok for c in tf for tok in c)
    n = 5
    rows = {}
    for d, c in enumerate(tf):
        scored = sorted(((tok, cnt * math.log(n / df[tok]))
                         for tok, cnt in c.items()),
                        key=lambda x: (-x[1], x[0]))[:2]
        rows[d] = [(tok, pytest.approx(s, abs=1e-12), r)
                   for r, (tok, s) in enumerate(scored)]
    for r in got.to_pylist():
        tok, s, rk = rows[r["doc_id"]][r["rank"]]
        assert r["term"] == tok and r["tfidf"] == s and r["rank"] == rk
    assert got.num_rows == 9    # doc 4 ("b b b b") has 1 distinct term
    with pytest.raises(ValueError):
        tfidf_top_terms(ray.data.from_arrow(t), "doc_id", "text", k=0)


def test_add_char_entropy(ray_session):
    import math

    from ksql_ray.ops.quality import add_char_entropy

    t = pa.table({"doc_id": pa.array([0, 1, 2, 3, 4], pa.int64()),
                  "text": pa.array(["aaaa", "ab", "", None, "aé🙂é"])})
    out = add_char_entropy(t)
    e = {r["doc_id"]: r["char_entropy"] for r in out.to_pylist()}
    assert e[0] == 0.0                      # single symbol
    assert e[1] == 1.0                      # two equiprobable symbols
    assert e[2] == 0.0                      # empty -> 0
    assert e[3] is None                     # NULL -> NULL
    # codepoints: a, é, é, 🙂 -> p = (.25, .5, .25)
    want = -(0.25 * math.log2(0.25) * 2 + 0.5 * math.log2(0.5))
    assert e[4] == pytest.approx(want, abs=1e-6)


# ----------------------------------------------------- bottom-k / mixture
def test_bottom_k_sample_vs_duckdb(docs_ds, duck):
    from ksql_ray.ops.sample import bottom_k_sample

    got = sorted(collect(bottom_k_sample(
        docs_ds, "doc_id", 23)).column("doc_id").to_pylist())
    exp = [r[0] for r in duck.execute(
        "SELECT doc_id FROM documents ORDER BY "
        "('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT, "
        "doc_id LIMIT 23").fetchall()]
    assert got == sorted(exp)


def test_bottom_k_sample_merge_property(docs_ds):
    """Bottom-k of a union == bottom-k of per-shard bottom-k's: the
    sample is invariant to how the input is split into batches."""
    from ksql_ray.ops.sample import bottom_k_sample

    whole = sorted(collect(bottom_k_sample(
        docs_ds, "doc_id", 11)).column("doc_id").to_pylist())
    reparted = docs_ds.repartition(7)
    shard = sorted(collect(bottom_k_sample(
        reparted, "doc_id", 11)).column("doc_id").to_pylist())
    assert whole == shard
    # k >= n degenerates to the full table
    n = docs_ds.count()
    assert collect(bottom_k_sample(
        docs_ds, "doc_id", n + 50)).num_rows == n


def test_bottom_k_sample_schema_and_errors(docs_ds):
    from ksql_ray.ops.sample import bottom_k_sample

    t = collect(bottom_k_sample(docs_ds, "doc_id", 5, keep_hash=True))
    assert "__sh" in t.column_names and t.num_rows == 5
    with pytest.raises(ValueError):
        bottom_k_sample(docs_ds, "doc_id", 0)


def test_mixture_sample_rates(docs_ds, duck):
    from ksql_ray.ops.sample import mixture_sample

    w = {"src0": 0.5, "src1": 0.3, "src2": 0.1, "src3": 0.1}
    got = collect(mixture_sample(docs_ds, "doc_id", "source", w, 60))
    # only weighted domains survive
    assert set(got.column("source").to_pylist()) <= set(w)
    case = ("CASE source WHEN 'src0' THEN 0.5 WHEN 'src1' THEN 0.3 "
            "WHEN 'src2' THEN 0.1 WHEN 'src3' THEN 0.1 END")
    exp = [r[0] for r in duck.execute(
        "WITH cnt AS (SELECT source, COUNT(*)::DOUBLE AS c FROM documents "
        "GROUP BY source) "
        "SELECT doc_id FROM documents JOIN cnt USING (source) "
        f"WHERE ({case}) IS NOT NULL "
        "AND ('0x' || substr(md5(CAST(doc_id AS VARCHAR)), 1, 8))::UBIGINT "
        f"< LEAST(1.0, (60.0 * (({case}) / 1.0)) / c) * 4294967296.0"
    ).fetchall()]
    assert sorted(got.column("doc_id").to_pylist()) == sorted(exp)


def test_mixture_sample_saturation(docs_ds):
    """A domain whose share already undershoots its target keeps ALL
    rows (rate clamps at 1), and unknown-domain weights are ignored."""
    from ksql_ray.ops.sample import mixture_sample

    got = collect(mixture_sample(
        docs_ds, "doc_id", "source", {"src5": 1.0, "nosuch": 9.0}, 10 ** 6))
    full = collect(docs_ds.filter(
        lambda r: r["source"] == "src5"))
    assert got.num_rows == full.num_rows
    with pytest.raises(ValueError):
        mixture_sample(docs_ds, "doc_id", "source", {"a": 1.0}, 0)


# --------------------------------------------------------------- C4 cleanup
def _c4_tbl():
    return pa.table({
        "doc_id": pa.array([1, 2, 3, 4], pa.int64()),
        "text": pa.array([
            "This is a good long sentence here.\nshort one.\n"
            "Another proper long line goes here!\n"
            "A third fine long line stays put.\nno punct line here at all",
            "contains lorem ipsum so the page dies. With lines.",
            "Uses javascript in this long enough line.\n"
            "Good line one is long enough today.\n"
            "Good line two is long enough today!\n"
            "Good line three is long enough today?",
            "Only two good lines survive here today.\n"
            "Second good line survives here as well.\nshort.",
        ]),
    })


def test_c4_clean_rules():
    from ksql_ray.ops.c4 import c4_clean_batch

    out = c4_clean_batch(_c4_tbl()).to_pydict()
    # doc 2 dies on lorem ipsum, doc 4 on min_lines
    assert out["doc_id"] == [1, 3]
    assert out["n_lines"] == [5, 4] and out["n_kept"] == [3, 3]
    assert out["text"][0].count("\n") == 2
    assert "short one." not in out["text"][0]
    assert "javascript" not in out["text"][1]


def test_c4_clean_large_string():
    # large_string text (the fixture/transcript schema) takes the
    # large_list binary_join kernel, which needs a large_string sep
    from ksql_ray.ops.c4 import c4_clean_batch

    import pyarrow.compute as pc

    t = _c4_tbl()
    t = t.set_column(1, "text", pc.cast(t.column("text"),
                                        pa.large_string()))
    out = c4_clean_batch(t).to_pydict()
    assert out["doc_id"] == [1, 3]
    assert out["text"][0].count("\n") == 2


def test_c4_clean_edges():
    from ksql_ray.ops.c4 import c4_clean_batch

    # zero-row batch keeps the output schema stable
    empty = c4_clean_batch(_c4_tbl().slice(0, 0))
    assert empty.num_rows == 0
    assert empty.column_names == ["doc_id", "text", "n_lines", "n_kept"]
    # curly-brace page kill + trim contract (tab/CR trimmed, then the
    # terminal-punctuation check applies to the trimmed line)
    t = pa.table({
        "doc_id": pa.array([1, 2], pa.int64()),
        "text": pa.array([
            "var x = { broken json page with braces everywhere }",
            "\tA tab-indented long line that still ends well.\r\n"
            "Second proper long line of this tidy page.\n"
            "Third proper long line of this tidy page.",
        ]),
    })
    out = c4_clean_batch(t).to_pydict()
    assert out["doc_id"] == [2] and out["n_kept"] == [3]


def test_c4_clean_vs_duckdb_on_planted_pages(ray_session, duck):
    from ksql_ray.pipelines.driver_queries import REGISTRY

    q = REGISTRY["op_c4_clean"]
    got = q.run(SF_DIR)
    exp = duck.execute(q.sql).arrow()
    assert_tables_equal(got, exp)


def test_strip_markup():
    from ksql_ray.ops.c4 import strip_markup_batch

    t = pa.table({"doc_id": [1, 2, 3], "text": [
        "keep this <b>not this</b> ok",
        "code ```a\nb``` and `x = 1` then https://e.com/p?a=1 done",
        "  plain   text \t with   runs  ",
    ]})
    out = strip_markup_batch(t).to_pydict()
    assert out["text"][0] == "keep this not this ok"
    assert out["text"][1] == "code and then done"
    assert out["text"][2] == "plain text with runs"


def test_strip_markup_matches_duckdb(duck):
    # both sides run RE2: the rule chain must agree bit-for-bit
    from ksql_ray.ops.c4 import strip_markup_batch

    texts = [
        "a <div class='x'>b</div> c",
        "```fence``` mid ```another\nmultiline``` end",
        "`tick` nested <i>`both`</i> https://x.io/a,b).",
        "no markup at all",
        "",
    ]
    t = pa.table({"text": pa.array(texts, type=pa.string())})
    got = strip_markup_batch(t).to_pydict()["text"]
    import pandas as pd

    duck.register("smk", pd.DataFrame({"text": texts}))
    exp = [r[0] for r in duck.execute(r"""
        SELECT trim(regexp_replace(regexp_replace(regexp_replace(
               regexp_replace(regexp_replace(text,
               '```[\s\S]*?```', ' ', 'g'),
               '`[^`]*`', ' ', 'g'),
               '<[^>]+>', ' ', 'g'),
               'https?://[^\s]+', ' ', 'g'),
               '[ \t]+', ' ', 'g'), ' ' || chr(9) || chr(13))
        FROM smk""").fetchall()]
    assert got == exp


# ------------------------------------------------------------ readability
def test_readability_brute_force():
    from ksql_ray.ops.quality import add_readability

    t = pa.table({
        "doc_id": pa.array(range(4), pa.int64()),
        "text": pa.array([
            "The cat sat. On the mat!",     # 6 words, 2 sentences
            "xyzzy 123 ?!",                 # no-vowel words floor at 1
            None,                           # NULL -> NULL
            "word",                         # no sentence punct -> 1
        ]),
    })
    out = add_readability(t).to_pydict()

    def brute(text):
        import re
        lt = text.strip().lower()
        toks = re.split(r"\s+", lt)
        words = len(toks)
        sents = max(len(re.findall(r"[.!?]+", lt)), 1)
        syl = len(re.findall(r"[aeiouy]+", lt)) + sum(
            1 for x in toks if not re.search(r"[aeiouy]", x))
        v = 206.835 - 1.015 * (words / sents) - 84.6 * (syl / words)
        import numpy as _np
        return float(_np.trunc(v * 1e4 + (0.5 if v >= 0 else -0.5)) / 1e4)

    for i, text in enumerate(t.column("text").to_pylist()):
        if text is None:
            assert out["flesch"][i] is None
        else:
            assert out["flesch"][i] == brute(text), (i, text)


def test_readability_vs_duckdb(docs_ds, duck):
    from conftest import assert_tables_equal, collect
    from ksql_ray.ops.quality import add_readability

    got = collect(docs_ds.map_batches(
        add_readability, batch_format="pyarrow",
        zero_copy_batch=True)).select(["doc_id", "flesch"])
    exp = duck.sql(r"""
WITH t AS (SELECT doc_id, trim(lower(text)) AS lt FROM documents),
w AS (SELECT doc_id, lt, regexp_split_to_array(lt, '\s+') AS toks FROM t),
syl AS (
  SELECT doc_id, len(toks)::DOUBLE AS words,
    greatest(len(regexp_extract_all(lt, '[.!?]+')), 1)::DOUBLE AS sentences,
    (len(regexp_extract_all(lt, '[aeiouy]+'))
     + len(list_filter(toks, x -> NOT regexp_matches(x, '[aeiouy]'))))
      ::DOUBLE AS syllables
  FROM w)
SELECT doc_id, ROUND(206.835 - 1.015 * (words / sentences)
                     - 84.6 * (syllables / words), 4) AS flesch
FROM syl""").arrow()
    assert_tables_equal(got, exp, float_tol=0)


# ------------------------------------------------------- auto quality filter
def test_auto_quality_filter_thresholds_and_rows(ray_session):
    import numpy as np

    from ksql_ray.ops.quality import auto_quality_filter

    t = pa.table({
        "id": pa.array(range(10), pa.int64()),
        "score": pa.array([float(i) for i in range(10)]),
        "ppl": pa.array([float(10 - i) for i in range(10)]),
    })
    out, thr = auto_quality_filter(
        ray.data.from_arrow(t).repartition(3),
        keep={"score": 0.3, "ppl": 0.5}, lower_better=("ppl",))
    # quantile_disc(score, 0.7) over 0..9 = 6 -> keep score >= 6
    # quantile_disc(ppl, 0.5) over 1..10 = 5 -> keep ppl <= 5
    assert thr == {"score": 6.0, "ppl": 5.0}
    ids = sorted(r["id"] for r in out.take_all())
    assert ids == [6, 7, 8, 9]      # score>=6 AND ppl=10-i<=5 -> i>=6


def test_auto_quality_filter_null_metric_drops(ray_session):
    from ksql_ray.ops.quality import auto_quality_filter

    t = pa.table({"id": pa.array([1, 2, 3], pa.int64()),
                  "m": pa.array([1.0, None, 3.0])})
    out, _ = auto_quality_filter(ray.data.from_arrow(t),
                                 keep={"m": 1.0})
    assert sorted(r["id"] for r in out.take_all()) == [1, 3]


def test_auto_quality_filter_validation(ray_session):
    import pytest as _pytest

    from ksql_ray.ops.quality import auto_quality_filter

    t = pa.table({"m": pa.array([1.0])})
    ds = ray.data.from_arrow(t)
    with _pytest.raises(ValueError):
        auto_quality_filter(ds, {})
    with _pytest.raises(ValueError):
        auto_quality_filter(ds, {"m": 0.0})
