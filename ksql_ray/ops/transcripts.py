"""Transcript assembly and token-window chunking.

The two halves of turning the input_hint's multi-turn transcript stream
``(conv_id, turn_idx, role, text, tool, ts)`` into LLM training
documents — ops the reference client cannot express (no string
aggregation or table-generating functions anywhere in
/root/reference/ksql/*.go):

* ``assemble_conversations``: flatten each conversation's turns, in
  turn order, into ONE document string (optionally ``role: text``
  lines) — SQL ``string_agg(text, sep ORDER BY turn_idx)``. Shape: ONE
  hash shuffle on the key (ops/dedup._partition_by — whole partitions
  per call), then a per-partition sort + segment-offset ListArray build
  + one ``binary_join`` kernel. No per-row Python.

* ``chunk_split``: split each document's whitespace tokens into
  context-window chunks of ``width`` tokens every ``stride`` tokens
  (stride < width = overlapping chunks) — the fan-out half of training
  prep. Shape: a STATELESS ``map_batches`` flat-map, zero shuffles;
  chunk texts are rebuilt from the flat token buffer with one vectorized
  gather + ``binary_join`` (the spans.py flat-buffer trick, generalized
  to strided starts). Chunk rule (mirrored by the gate oracle):
  starts = 0, stride, 2*stride, ... < n_tokens; chunk i =
  tokens[start : start + width] (the last chunks may be short).
"""

from __future__ import annotations

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .dedup import _partition_by, _pin

__all__ = ["assemble_conversations", "chunk_split", "conversation_stats"]

_WS = r"\s+"


def assemble_conversations(
    ds: ray.data.Dataset,
    key_cols: list[str],
    order_cols: list[str],
    text_col: str = "text",
    role_col: str | None = None,
    sep: str = "\n",
    num_partitions: int = 32,
) -> ray.data.Dataset:
    """One row per key: ``doc`` = the key's ``text_col`` values joined by
    ``sep`` in (order_cols) order (each prefixed ``role: `` when
    ``role_col`` is given), plus ``n_turns`` and ``n_chars``
    (= length(doc))."""
    sort_spec = [(k, "ascending") for k in key_cols] + [
        (o, "ascending") for o in order_cols]

    def assemble(group: pa.Table) -> pa.Table:
        if "__part" in group.column_names:
            group = group.drop_columns(["__part"])
        keys_schema = [group.schema.field(k) for k in key_cols]
        if group.num_rows == 0:
            cols = {k.name: pa.nulls(0, k.type) for k in keys_schema}
            cols["doc"] = pa.nulls(0, pa.string())
            cols["n_turns"] = pa.array([], type=pa.int64())
            cols["n_chars"] = pa.array([], type=pa.int64())
            return pa.table(cols)
        tbl = group.take(pc.sort_indices(group, sort_keys=sort_spec))
        n = tbl.num_rows
        texts = pc.fill_null(tbl.column(text_col), "")
        if pa.types.is_large_string(texts.type):
            # binary_join has no list<large_string> kernel; per-partition
            # text is far below 2 GiB, int32 offsets are fine
            texts = pc.cast(texts, pa.string())
        if role_col is not None:
            roles = pc.fill_null(tbl.column(role_col), "")
            texts = pc.binary_join_element_wise(
                pc.cast(roles, pa.string()), texts, ": ")
        # segment boundaries -> one list entry per distinct key
        change = np.zeros(n, dtype=bool)
        change[0] = True
        for k in key_cols:
            kv = tbl.column(k).to_numpy(zero_copy_only=False)
            change[1:] |= kv[1:] != kv[:-1]
        starts = np.flatnonzero(change)
        offsets = pa.array(np.append(starts, n), type=pa.int32())
        if isinstance(texts, pa.ChunkedArray):
            texts = texts.combine_chunks()
        docs = pc.binary_join(
            pa.ListArray.from_arrays(offsets, texts), sep)
        n_turns = np.diff(np.append(starts, n)).astype(np.int64)
        out = {k: tbl.column(k).take(pa.array(starts)) for k in key_cols}
        out["doc"] = docs
        out["n_turns"] = pa.array(n_turns, type=pa.int64())
        out["n_chars"] = pc.cast(pc.utf8_length(docs), pa.int64())
        return pa.table(out)

    return _partition_by(ds, key_cols, num_partitions).map_groups(
        _pin(assemble), batch_format="pyarrow")


def conversation_stats(
    ds: ray.data.Dataset,
    key_cols: list[str],
    ts_col: str = "ts",
    text_col: str = "text",
    role_col: str | None = "role",
    roles: tuple[str, ...] = ("user", "assistant"),
    tool_col: str | None = "tool",
) -> ray.data.Dataset:
    """Per-conversation health metrics over a turns table — the
    corpus-triage pass before transcript assembly (turn counts, role
    mix, tool usage, size, span). One row per key with ``n_turns``,
    ``n_<role>`` per listed role, ``n_tool`` (non-null ``tool_col``
    rows, when given), ``total_chars`` (sum of text lengths, NULL text
    counted 0), ``first_ts`` / ``last_ts``, ``duration_s`` and
    ``avg_chars``.

    Scale shape: every metric is a self-merging aggregate, so the op is
    a pure combiner — per-batch pandas groupby partials (one row per
    key per batch) merged by ``smallagg.grouped_agg`` (one task when
    the per-key partials are small, a hash exchange otherwise). The
    shuffle never carries text — only the per-key counter rows — so at
    10^12 turns the exchanged volume is O(distinct convs x batches),
    ~10^3x below the input. The reference builder has no multi-metric
    grouped projection like this (string + time + conditional counts in
    one pass); closest analogs are its COUNT/MIN/MAX aggregates
    (reference ksql/functions.go)."""
    from .smallagg import grouped_agg

    role_outs = {r: f"n_{r}" for r in roles}

    def partial(batch: pa.Table) -> pa.Table:
        import pandas as pd

        cols = {k: batch.column(k).to_pandas() for k in key_cols}
        chars = pc.cast(pc.utf8_length(pc.fill_null(
            batch.column(text_col), "")), pa.int64())
        cols["total_chars"] = chars.to_pandas()
        ts_us = pc.cast(batch.column(ts_col), pa.int64())
        cols["first_us"] = ts_us.to_pandas()
        cols["last_us"] = cols["first_us"]
        if role_col is not None:
            role = batch.column(role_col)
            for r, out in role_outs.items():
                cols[out] = pc.cast(
                    pc.fill_null(pc.equal(role, r), False),
                    pa.int64()).to_pandas()
        if tool_col is not None:
            cols["n_tool"] = pc.cast(
                pc.is_valid(batch.column(tool_col)), pa.int64()).to_pandas()
        df = pd.DataFrame(cols)
        aggs = {"total_chars": "sum", "first_us": "min", "last_us": "max"}
        aggs.update({out: "sum" for out in role_outs.values()})
        if tool_col is not None:
            aggs["n_tool"] = "sum"
        g = df.groupby(key_cols, dropna=False, sort=False).agg(
            n_turns=(("total_chars", "size")), **{
                k: (k, f) for k, f in aggs.items()}).reset_index()
        out = {k: pa.Array.from_pandas(
            g[k], type=batch.schema.field(k).type) for k in key_cols}
        out["n_turns"] = pa.array(g["n_turns"].to_numpy(),
                                  type=pa.int64())
        for c in aggs:
            # from_pandas keeps NaN (an all-NULL-ts key's min/max) as
            # NULL — a bare int64 cast of the numpy floats would raise
            out[c] = pa.Array.from_pandas(g[c]).cast(pa.int64())
        return pa.table(out)

    parts = ds.map_batches(partial, batch_format="pyarrow",
                           zero_copy_batch=True)
    merge_aggs = {"n_turns": "sum"}
    merge_aggs.update({out: "sum" for out in role_outs.values()})
    if tool_col is not None:
        merge_aggs["n_tool"] = "sum"
    merge_aggs.update({"total_chars": "sum", "first_us": "min",
                       "last_us": "max"})
    merged = grouped_agg(parts, key_cols, merge_aggs)

    def finish(batch: pa.Table) -> pa.Table:
        if batch.num_rows == 0 and "first_us" not in batch.column_names:
            return batch
        first = batch.column("first_us")
        last = batch.column("last_us")
        dur = pc.divide(pc.cast(pc.subtract(last, first), pa.float64()),
                        1_000_000.0)
        avg = pc.divide(pc.cast(batch.column("total_chars"), pa.float64()),
                        pc.cast(batch.column("n_turns"), pa.float64()))
        batch = batch.set_column(
            batch.column_names.index("first_us"), "first_ts",
            pc.cast(first, pa.timestamp("us")))
        batch = batch.set_column(
            batch.column_names.index("last_us"), "last_ts",
            pc.cast(last, pa.timestamp("us")))
        return batch.append_column("duration_s", dur).append_column(
            "avg_chars", avg)

    return merged.map_batches(finish, batch_format="pyarrow",
                              zero_copy_batch=True)


def chunk_split(
    ds: ray.data.Dataset,
    id_col: str = "doc_id",
    text_col: str = "text",
    width: int = 256,
    stride: int | None = None,
) -> ray.data.Dataset:
    """Fan each document out into (id_col, chunk_idx, n_tokens, chunk)
    rows — context-window chunks of ``width`` whitespace tokens starting
    every ``stride`` tokens (default: ``width``, i.e. non-overlapping).
    Empty/NULL text splits to the single token '' (one empty chunk), so
    every document yields >= 1 row — mirrored by the oracle."""
    if width < 1:
        raise ValueError("width must be >= 1")
    stride = width if stride is None else stride
    if not 1 <= stride <= width:
        raise ValueError("stride must be in [1, width]")

    @_pin
    def split(batch: pa.Table) -> pa.Table:
        text = batch.column(text_col)
        if pa.types.is_large_string(text.type):
            text = pc.cast(text, pa.string())
        toks = pc.split_pattern_regex(
            pc.utf8_trim_whitespace(pc.fill_null(text, "")), _WS)
        if isinstance(toks, pa.ChunkedArray):
            toks = toks.combine_chunks()
        offs = toks.offsets.to_numpy().astype(np.int64)
        vals = toks.values
        ntok = np.diff(offs)                      # >= 1 per doc
        nch = (ntok + stride - 1) // stride       # starts 0,s,2s,... < ntok
        total = int(nch.sum())
        doc_of_chunk = np.repeat(np.arange(len(nch), dtype=np.int64), nch)
        first = np.zeros(len(nch) + 1, dtype=np.int64)
        np.cumsum(nch, out=first[1:])
        within = np.arange(total, dtype=np.int64) - first[doc_of_chunk]
        start_tok = within * stride
        lens = np.minimum(start_tok + width, ntok[doc_of_chunk]) - start_tok
        if stride == width:
            # consecutive starts tile the flat token buffer — no gather
            abs_start = offs[:-1][doc_of_chunk] + start_tok
            chunk_off = np.append(abs_start, offs[-1])
            chunk_vals = vals
        else:
            # strided gather: concat of ranges built with the
            # repeat/arange trick (no Python loop)
            out_first = np.zeros(total + 1, dtype=np.int64)
            np.cumsum(lens, out=out_first[1:])
            n_out = int(out_first[-1])
            abs_start = offs[:-1][doc_of_chunk] + start_tok
            idx = (np.repeat(abs_start, lens)
                   + np.arange(n_out, dtype=np.int64)
                   - np.repeat(out_first[:-1], lens))
            chunk_vals = vals.take(pa.array(idx))
            chunk_off = out_first
        if chunk_off[-1] > np.iinfo(np.int32).max:
            # overlap duplicates tokens ~width/stride×; a jumbo batch can
            # outgrow 32-bit list offsets — int64 offsets keep it exact
            lists = pa.LargeListArray.from_arrays(
                pa.array(chunk_off, type=pa.int64()), chunk_vals)
        else:
            lists = pa.ListArray.from_arrays(
                pa.array(chunk_off, type=pa.int32()), chunk_vals)
        chunks = pc.binary_join(lists, " ")
        return pa.table({
            id_col: batch.column(id_col).take(pa.array(doc_of_chunk)),
            "chunk_idx": pa.array(within, type=pa.int64()),
            "n_tokens": pa.array(lens, type=pa.int64()),
            "chunk": chunks,
        })

    return ds.select_columns([id_col, text_col]).map_batches(
        split, batch_format="pyarrow")
