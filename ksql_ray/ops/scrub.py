"""PII / URL scrubbing for training-data pipelines.

Redacts e-mail addresses, URLs and IPv4 addresses from a text column
and counts the redactions — the standard pre-training hygiene pass.
Extends the engine's training-data surface (the reference ksql builder
has no scalar string library; absence verified across
/root/reference/ksql/*.go).

Ray-Data-native: one stateless ``map_batches`` transform, all regex
work in Arrow's RE2 kernels (``count_substring_regex`` /
``replace_substring_regex``) — no Python loop over rows. DuckDB's
``regexp_replace(..., 'g')`` / ``regexp_matches`` also run RE2, so the
oracle form is bit-equal (see ``op_pii_scrub`` in
pipelines/driver_queries.py).

Replacement order matters and is part of the contract: URLs first
(an e-mail-shaped userinfo inside a URL is swallowed by the URL token),
then e-mails, then IPv4.
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc
import ray.data

__all__ = ["EMAIL_RE", "URL_RE", "IPV4_RE", "scrub_pii", "scrub_documents"]

# RE2-compatible (no lookarounds/backrefs) so Arrow and DuckDB agree.
EMAIL_RE = r"[A-Za-z0-9._%+-]+@[A-Za-z0-9.-]+\.[A-Za-z]{2,}"
URL_RE = r"https?://[^\s]+"
IPV4_RE = r"\b\d{1,3}\.\d{1,3}\.\d{1,3}\.\d{1,3}\b"

_ORDER = (
    (URL_RE, "<URL>", "n_urls"),
    (EMAIL_RE, "<EMAIL>", "n_emails"),
    (IPV4_RE, "<IP>", "n_ips"),
)


def scrub_pii(batch: pa.Table, text_col: str = "text",
              out: str = "text_scrubbed") -> pa.Table:
    """Append ``out`` (redacted text) plus n_urls / n_emails / n_ips
    (int64 counts of non-overlapping matches, counted BEFORE each
    replacement in the documented order)."""
    t = batch.column(text_col)
    if isinstance(t, pa.ChunkedArray):
        t = t.combine_chunks()
    counts = {}
    for regex, token, name in _ORDER:
        counts[name] = pc.cast(pc.count_substring_regex(t, regex), pa.int64())
        t = pc.replace_substring_regex(t, regex, token)
    batch = batch.append_column(out, t)
    for _, _, name in _ORDER:
        batch = batch.append_column(name, counts[name])
    return batch


def scrub_documents(ds: ray.data.Dataset, text_col: str = "text",
                    replace: bool = True) -> ray.data.Dataset:
    """Corpus-level scrub. ``replace=True`` overwrites the text column
    with the redacted form (keeping the counts); ``False`` keeps both."""
    def fn(batch: pa.Table) -> pa.Table:
        batch = scrub_pii(batch, text_col)
        if replace:
            idx = batch.column_names.index(text_col)
            scrubbed = batch.column("text_scrubbed")
            batch = batch.drop_columns(["text_scrubbed"]) \
                         .set_column(idx, text_col, scrubbed)
        return batch

    return ds.map_batches(fn, batch_format="pyarrow", zero_copy_batch=True)
