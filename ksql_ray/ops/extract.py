"""Vectorized regex field extraction over text columns.

ksqlDB exposes scalar string functions but the Go reference builds
only plain column projections (verified across /root/reference/ksql/
*.go — no function-call expression surface beyond aggregates); corpus
pipelines constantly lift structured fields out of semi-structured
text (JSON-ish props, log lines, URLs).

Scale shape: one ``pc.extract_regex`` kernel per batch (RE2, compiled
once per call site inside Arrow) — stateless ``map_batches``, no
shuffle, streaming. Rows that do not match yield NULL in every output
column (DuckDB parity form: ``NULLIF(regexp_extract(...), '')`` since
DuckDB returns '' for misses — both engines run RE2, so match
semantics agree).
"""

from __future__ import annotations

import re

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

from .dedup import _pin

__all__ = ["regex_extract"]

_GROUP_RE = re.compile(r"\(\?P<([A-Za-z_][A-Za-z0-9_]*)>")


def regex_extract(ds: ray.data.Dataset, text_col: str, pattern: str,
                  keep: list[str] | None = None) -> ray.data.Dataset:
    """Append one column per named group in ``pattern``
    (``(?P<name>...)``), NULL where the pattern does not match.
    ``keep`` defaults to all input columns."""
    names = _GROUP_RE.findall(pattern)
    if not names:
        raise ValueError("pattern needs at least one (?P<name>...) group")

    def fn(batch: pa.Table) -> pa.Table:
        structs = pc.extract_regex(batch.column(text_col), pattern=pattern)
        if isinstance(structs, pa.ChunkedArray):
            structs = structs.combine_chunks()
        cols = list(keep) if keep is not None else list(batch.column_names)
        out = {k: batch.column(k) for k in cols}
        for name in names:
            out[name] = pc.struct_field(structs, name)
        return pa.table(out)

    return ds.map_batches(_pin(fn), batch_format="pyarrow",
                          zero_copy_batch=True)
