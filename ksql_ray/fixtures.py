"""Deterministic synthetic transcript fixtures (FIXTURES.md).

Generates the canonical input of BASELINE.json's input_hint — a Parquet
STREAM of multi-turn conversation transcripts
``(conv_id, turn_idx, role, text, tool, ts)`` — plus the ``conv_meta``
TABLE (stream-table join side) and the ``turn_scores`` STREAM
(stream-stream join side). Seed-stable (seed=42 default, numpy PCG64):
same (seed, n_turns) -> bit-identical tables.

The stream is written as N micro-batch Parquet files in arrival order
(arrival = ts order with ~2% late rows displaced 1-3 windows), which is
what the streaming driver consumes epoch by epoch.
"""

from __future__ import annotations

import os

import numpy as np
import pyarrow as pa
import pyarrow.parquet as pq

BASE_TS_US = 1_704_067_200_000_000  # 2024-01-01T00:00:00Z in microseconds
TOKENS = np.array(
    "the a model user agent turn reply tool call result think plan code "
    "search browse run test fix data query stream window join state key "
    "batch shard commit log trace span vector token prompt answer".split()
)


def gen_transcripts(
    n_turns: int = 2000,
    avg_turns_per_conv: int = 10,
    seed: int = 42,
    late_frac: float = 0.02,
    window_us: int = 60_000_000,
) -> pa.Table:
    rng = np.random.default_rng(seed)
    n_convs = max(1, n_turns // avg_turns_per_conv)
    # Zipf(1.2)-skewed conversation sizes: a few hot conversations
    w = (1.0 / np.arange(1, n_convs + 1) ** 1.2)
    w /= w.sum()
    conv_of_turn = rng.choice(n_convs, size=n_turns, p=w)
    conv_of_turn.sort()  # contiguous per conversation
    # per-conversation turn index (vectorized: position minus segment start)
    _, counts = np.unique(conv_of_turn, return_counts=True)
    seg_first = np.concatenate(([0], np.cumsum(counts)))[:-1]
    turn_idx = (np.arange(n_turns) - np.repeat(seg_first, counts)).astype(np.int32)

    conv_ids = np.array([f"conv-{i:08d}" for i in range(n_convs)])
    conv_col = conv_ids[conv_of_turn]

    # roles: cycle user/assistant with ~10% tool turns
    is_tool = rng.random(n_turns) < 0.10
    role = np.where(turn_idx % 2 == 0, "user", "assistant").astype(object)
    role[is_tool] = "tool"
    tools = rng.choice(np.array(["search", "code", "browse", "calc"]), size=n_turns)
    tool = np.where(is_tool, tools, None)

    # text: "conv_id:turn_idx " prefix + deterministic token soup. The
    # soup pool is pre-generated (1024 distinct strings, lognormal length)
    # and assembly uses Arrow varlen strings — numpy's np.char would
    # materialize fixed-width UCS4 arrays (~25 GB at 16M rows).
    import pyarrow.compute as _pc

    pool_lens = np.clip(rng.lognormal(3.0, 0.6, 1024), 3, 60).astype(int)
    pool = np.array(
        [" ".join(TOKENS[rng.integers(0, len(TOKENS), L)]) for L in pool_lens]
    )
    soup = pa.array(pool[rng.integers(0, len(pool), n_turns)], type=pa.string())
    conv_arr = pa.array(conv_col, type=pa.string())
    turn_str = _pc.cast(pa.array(turn_idx, type=pa.int32()), pa.string())
    prefix = _pc.binary_join_element_wise(conv_arr, turn_str, ":")
    # large_string: 16M+ turns exceed 2 GiB of text, overflowing 32-bit
    # string offsets on take/concat (SURVEY.md §1.2)
    texts = _pc.cast(_pc.binary_join_element_wise(prefix, soup, " "), pa.large_string())

    # event time: conv-specific start + ~5s/turn jitter (vectorized
    # segmented cumsum — no per-conversation Python loop)
    conv_start = BASE_TS_US + (
        rng.integers(0, 3_600_000_000, n_convs)  # conversations start within 1h
    )
    step = rng.integers(1_000_000, 10_000_000, n_turns)  # 1-10 s per turn
    cs = np.cumsum(step)
    first_idx = np.concatenate(([0], np.cumsum(counts)))[:-1]
    seg_base = cs[first_idx] - step[first_idx]  # cumsum up to each conv's start
    ts = (
        np.repeat(conv_start[: len(counts)], counts)
        + cs
        - np.repeat(seg_base, counts)
    ).astype(np.int64)

    # arrival order = ts order, with ~2% rows displaced late by 1-3 windows
    arrival = ts.copy()
    late = rng.random(n_turns) < late_frac
    arrival[late] += rng.integers(1, 4, late.sum()) * window_us

    tbl = pa.table(
        {
            "conv_id": pa.array(conv_col, type=pa.string()),
            "turn_idx": pa.array(turn_idx, type=pa.int32()),
            "role": pa.array(role, type=pa.string()),
            "text": texts,
            "tool": pa.array(tool.tolist(), type=pa.string()),
            "ts": pa.array(ts, type=pa.timestamp("us")),
        }
    )
    order = np.argsort(arrival, kind="stable")
    return tbl.take(pa.array(order))


def gen_conv_meta(transcripts: pa.Table, seed: int = 42) -> pa.Table:
    import pyarrow.compute as pc

    convs = pc.unique(transcripts.column("conv_id")).sort()
    n = len(convs)
    # deterministic pseudo-hash per conv index
    rng = np.random.default_rng(seed + 1)
    tier = rng.choice(np.array(["free", "pro", "enterprise"]), size=n)
    lang = rng.choice(np.array(["en", "de", "ja", "fr"]), size=n)
    # created_ts = first turn ts - 1min (vectorized grouped min)
    mins = pa.TableGroupBy(
        transcripts.select(["conv_id", "ts"]), "conv_id", use_threads=False
    ).aggregate([("ts", "min")])
    mins = mins.take(pc.sort_indices(mins, sort_keys=[("conv_id", "ascending")]))
    created = pc.subtract(
        pc.cast(mins.column("ts_min"), pa.int64()), pa.scalar(60_000_000)
    )
    return pa.table(
        {
            "conv_id": convs,
            "user_tier": pa.array(tier, type=pa.string()),
            "lang": pa.array(lang, type=pa.string()),
            "created_ts": pc.cast(created, pa.timestamp("us")),
        }
    )


def gen_turn_scores(transcripts: pa.Table, seed: int = 42, coverage: float = 0.8) -> pa.Table:
    import pyarrow.compute as pc

    rng = np.random.default_rng(seed + 2)
    n = transcripts.num_rows
    keep = rng.random(n) < coverage
    sub = transcripts.filter(pa.array(keep))
    m = sub.num_rows
    score = rng.random(n)[keep]  # deterministic per original row position
    ts2 = pc.add(
        pc.cast(sub.column("ts"), pa.int64()),
        pa.array(rng.integers(0, 2_000_000, n)[keep], type=pa.int64()),
    )
    return pa.table(
        {
            "conv_id": sub.column("conv_id"),
            "turn_idx": sub.column("turn_idx"),
            "score": pa.array(score, type=pa.float64()),
            "ts": pc.cast(ts2, pa.timestamp("us")),
        }
    )


def write_stream_files(tbl: pa.Table, out_dir: str, n_files: int = 8) -> list[str]:
    """Split a table (already in arrival order) into micro-batch Parquet
    files — the stream the driver consumes epoch by epoch."""
    os.makedirs(out_dir, exist_ok=True)
    n = tbl.num_rows
    bounds = np.linspace(0, n, n_files + 1).astype(int)
    paths = []
    for i in range(n_files):
        part = tbl.slice(bounds[i], bounds[i + 1] - bounds[i])
        p = os.path.join(out_dir, f"batch-{i:05d}.parquet")
        pq.write_table(part, p)
        paths.append(p)
    return paths


def materialize_fixture_dir(
    base_dir: str, n_turns: int = 2000, seed: int = 42, n_files: int = 8
) -> dict[str, str]:
    """Write transcripts stream dir + conv_meta/turn_scores tables; returns
    paths. Idempotent for a given (dir, params)."""
    os.makedirs(base_dir, exist_ok=True)
    marker = os.path.join(base_dir, f".done-v2-{n_turns}-{seed}-{n_files}")
    stream_dir = os.path.join(base_dir, "transcripts")
    meta_path = os.path.join(base_dir, "conv_meta.parquet")
    scores_path = os.path.join(base_dir, "turn_scores.parquet")
    if not os.path.exists(marker):
        t = gen_transcripts(n_turns=n_turns, seed=seed)
        write_stream_files(t, stream_dir, n_files=n_files)
        pq.write_table(gen_conv_meta(t, seed), meta_path)
        pq.write_table(gen_turn_scores(t, seed), scores_path)
        with open(marker, "w") as f:
            f.write("ok")
    return {"transcripts": stream_dir, "conv_meta": meta_path, "turn_scores": scores_path}
