"""chunk_dedup() vs a brute-force single-process reference."""

import numpy as np
import pyarrow as pa
import ray.data

from ksql_ray.ops.spans import chunk_dedup


def _ref_chunk_dedup(docs, width):
    """docs: list of (doc_id, text). Global first-occurrence-by-
    (doc_id, chunk_idx) keep rule over exact chunk strings."""
    occurrences = {}  # chunk -> (doc_id, chunk_idx) of first occurrence
    per_doc = {}
    for doc_id, text in docs:
        toks = text.strip().split() or [""]
        chunks = [" ".join(toks[i:i + width])
                  for i in range(0, len(toks), width)]
        per_doc[doc_id] = chunks
    for doc_id in sorted(per_doc):
        for idx, ch in enumerate(per_doc[doc_id]):
            occurrences.setdefault(ch, (doc_id, idx))
    out = {}
    for doc_id, chunks in per_doc.items():
        kept = [ch for i, ch in enumerate(chunks)
                if occurrences[ch] == (doc_id, i)]
        out[doc_id] = (len(chunks), len(chunks) - len(kept), " ".join(kept))
    return out


def _run(docs, width, **kw):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs]),
    })).repartition(4)
    got = chunk_dedup(ds, width=width, **kw).to_pandas()
    return {r.doc_id: (r.n_chunks, r.dup_chunks, r.clean_text)
            for r in got.itertuples()}


def test_planted_repeats(ray_session):
    boiler = "x" + " y z a b c d e"  # 8 tokens: one full-width chunk
    docs = [
        (1, boiler + " unique one two three four five six seven"),
        (2, boiler + " other tokens here now then later done yes"),
        (3, "totally different text with no repeats at all"),
        (4, boiler),  # the whole doc duplicates doc 1's first chunk
    ]
    got = _run(docs, width=8)
    assert got == _ref_chunk_dedup(docs, 8)
    assert got[1][1] == 0          # doc 1 owns the first occurrence
    assert got[2][1] == 1          # boilerplate chunk removed
    assert got[4] == (1, 1, "")    # fully-duplicate doc -> empty text


def test_unsorted_ids_first_occurrence(ray_session):
    # first occurrence is by (doc_id, chunk_idx) ORDER, not input order
    docs = [(9, "a b c"), (2, "a b c"), (5, "a b c")]
    got = _run(docs, width=8)
    assert got[2] == (1, 0, "a b c")
    assert got[5] == (1, 1, "")
    assert got[9] == (1, 1, "")


def test_within_doc_repeats_and_edges(ray_session):
    rng = np.random.default_rng(3)
    vocab = [f"w{i}" for i in range(30)]
    base = [(i, " ".join(rng.choice(vocab, size=rng.integers(1, 25))))
            for i in range(40)]
    span = "p q r s"
    docs = base + [
        (100, f"{span} {span} tail"),   # repeat within one doc (width=4)
        (101, ""),                      # empty -> one '' chunk
        (102, "   "),                   # whitespace-only -> '' chunk too
        (103, "a b c d e f g h"),       # exact multiple of width
    ]
    got = _run(docs, width=4)
    assert got == _ref_chunk_dedup(docs, 4)
    assert got[100] == (3, 1, f"{span} tail")
    # 101 owns the '' chunk (lowest id); 102 duplicates it
    assert got[101] == (1, 0, "")
    assert got[102] == (1, 1, "")
    assert got[103][0] == 2


def test_no_duplicates_at_all(ray_session):
    # the left-outer join's dup side is EMPTY: every doc passes through
    docs = [(i, f"unique{i} token{i} body{i}") for i in range(10)]
    got = _run(docs, width=4)
    assert all(got[i] == (1, 0, f"unique{i} token{i} body{i}")
               for i in range(10))


def test_string_doc_ids(ray_session):
    # the keep-rule and rebuild use order comparisons on the id column:
    # string ids must work end to end (lexicographic first occurrence)
    docs = [("z", "a b c"), ("m", "a b c"), ("a", "a b c"),
            ("k", "different text entirely")]
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs]),
        "text": pa.array([t for _, t in docs]),
    })).repartition(2)
    got = {r.doc_id: (r.n_chunks, r.dup_chunks, r.clean_text)
           for r in chunk_dedup(ds, width=8).to_pandas().itertuples()}
    assert got["a"] == (1, 0, "a b c")   # lexicographically first
    assert got["m"] == (1, 1, "")
    assert got["z"] == (1, 1, "")
    assert got["k"] == (1, 0, "different text entirely")


# ----------------------------------------------------- window_dedup

from ksql_ray.ops.spans import window_dedup


def _ref_window_dedup(docs, width):
    """Brute force: duplicate window = same width-token window text at
    an earlier (doc_id, pos); covered tokens removed."""
    per_doc = {}
    for doc_id, text in docs:
        per_doc[doc_id] = text.strip().split() or [""]
    seen = {}
    removed = {d: set() for d in per_doc}
    for doc_id in sorted(per_doc):
        toks = per_doc[doc_id]
        for i in range(len(toks) - width + 1):
            win = " ".join(toks[i:i + width])
            if win in seen:
                removed[doc_id].update(range(i, i + width))
            else:
                seen[win] = (doc_id, i)
    out = {}
    for doc_id, toks in per_doc.items():
        kept = [t for j, t in enumerate(toks) if j not in removed[doc_id]]
        out[doc_id] = (len(toks), len(removed[doc_id]), " ".join(kept))
    return out


def _run_w(docs, width, **kw):
    ds = ray.data.from_arrow(pa.table({
        "doc_id": pa.array([d for d, _ in docs], pa.int64()),
        "text": pa.array([t for _, t in docs]),
    })).repartition(4)
    got = window_dedup(ds, width=width, **kw).to_pandas()
    return {r.doc_id: (r.n_tokens, r.removed_tokens, r.clean_text)
            for r in got.itertuples()}


def test_window_shifted_repeat(ray_session):
    """A repeated passage at a NON-chunk alignment: window_dedup removes
    it, the brute reference agrees token for token."""
    passage = "the quick brown fox jumps over the lazy dog again and again"
    docs = [
        (1, passage + " tail one two three"),
        (2, "shift " + passage + " other ending here"),   # offset by 1
        (3, "a b c d e f g h i j"),                       # clean doc
    ]
    assert _run_w(docs, 6) == _ref_window_dedup(docs, 6)


def test_window_overlapping_dups_merge(ray_session):
    """Overlapping duplicate windows union their coverage (diff-array
    path), including within-doc self-repeats."""
    docs = [
        (10, "p q r s t u v w p q r s t u v w x y z"),   # self-repeat
        (11, "p q r s t u v w completely different words here"),
    ]
    assert _run_w(docs, 4) == _ref_window_dedup(docs, 4)


def test_window_short_docs_untouched(ray_session):
    docs = [(1, "one two three"), (2, "one two three"), (3, "   ")]
    got = _run_w(docs, 8)
    assert got[1] == (3, 0, "one two three")
    assert got[2] == (3, 0, "one two three")   # doc-level dup NOT cut
    assert got[3] == (1, 0, "")


def test_window_full_doc_removed(ray_session):
    docs = [(1, "a b c d e f g h"), (2, "a b c d e f g h")]
    got = _run_w(docs, 8)
    assert got[1] == (8, 0, "a b c d e f g h")
    assert got[2] == (8, 8, "")


def test_window_random_vs_brute(ray_session):
    rng = np.random.default_rng(17)
    vocab = [f"w{i}" for i in range(12)]
    docs = []
    for d in range(40):
        n = int(rng.integers(3, 30))
        docs.append((d, " ".join(rng.choice(vocab, n))))
    for width in (3, 5):
        assert _run_w(docs, width) == _ref_window_dedup(docs, width)
