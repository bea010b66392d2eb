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
