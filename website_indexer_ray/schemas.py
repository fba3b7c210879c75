"""Arrow schemas for every table the engine reads or writes.

Mirrors the reference's relational schema (/root/reference/crawler/
models.py) re-expressed columnar: M2M bridge tables become
``list<string>`` columns, and a parsed page additionally projects to
the interleaved-span document shape mandated by BASELINE.json's
``input_hint``:
``(doc_id: string, spans: list<struct<kind, text, media_ref, offset>>)``.

All stages enforce these schemas at ``map_batches(batch_format=
"pyarrow")`` boundaries. Persisted as Parquet (Lance is not available
in this container; the layout — one directory per generation /
partition with a ``_SUCCESS`` manifest — carries the same resumability
contract).
"""

from __future__ import annotations

import pyarrow as pa

SPAN_STRUCT = pa.struct(
    [
        ("kind", pa.string()),
        ("text", pa.string()),
        ("media_ref", pa.string()),
        ("offset", pa.int32()),
    ]
)

# BASELINE.json input_hint shape.
DOCS_SCHEMA = pa.schema(
    [
        ("doc_id", pa.string()),
        ("spans", pa.list_(SPAN_STRUCT)),
    ]
)

# Synthetic web the fetch stage serves (FIXTURES.md §1).
CORPUS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("host", pa.string()),
        ("status_code", pa.int32()),
        ("content_type", pa.string()),
        ("location", pa.string()),
        ("html", pa.large_string()),
        ("fetch_delay_ms", pa.int32()),
    ]
)

SEEDS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("seed_batch", pa.int32()),
    ]
)

# Frontier rows (one per candidate URL per generation).
FRONTIER_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("url_hash", pa.uint64()),
        ("host", pa.string()),
        ("depth", pa.int32()),
        ("parent_url", pa.string()),
        ("parent_host", pa.string()),
        ("root_url", pa.string()),
        ("generation", pa.int32()),
        ("seed_batch", pa.int32()),
    ]
)

# Union record table written per generation — one row per requested
# URL, routed by record_type (plugin.py:205-281 response routing):
#   "page"     200 text/html on the start host, with a title
#   "error"    status >= 400, or 0 for network-level failure
#   "redirect" 300-399
#   "skipped"  200 responses the reference silently drops
#              (external host, non-HTML content type, or no title)
RECORDS_SCHEMA = pa.schema(
    [
        ("record_type", pa.string()),
        ("url", pa.string()),
        ("url_hash", pa.uint64()),
        ("host", pa.string()),
        ("generation", pa.int32()),
        ("depth", pa.int32()),
        # Seed-batch provenance: inherited parent→child through
        # expansion so lineage rows attribute outcome counts per
        # (generation, seed_batch) — the north_rule's lineage key.
        ("seed_batch", pa.int32()),
        ("timestamp", pa.timestamp("us")),
        ("status_code", pa.int32()),
        ("referrer", pa.string()),
        ("location", pa.string()),
        ("method", pa.string()),
        ("title", pa.string()),
        ("language", pa.string()),
        ("html", pa.large_string()),
        ("text", pa.large_string()),
        ("components", pa.list_(pa.string())),
        ("links", pa.list_(pa.string())),
        ("media", pa.list_(pa.string())),
        ("frontier_links", pa.list_(pa.string())),
    ]
)

PAGES_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("timestamp", pa.timestamp("us")),
        ("title", pa.string()),
        ("language", pa.string()),
        ("html", pa.large_string()),
        ("text", pa.large_string()),
        ("components", pa.list_(pa.string())),
        ("links", pa.list_(pa.string())),
    ]
)

ERRORS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("timestamp", pa.timestamp("us")),
        ("status_code", pa.int32()),
        ("referrer", pa.string()),
    ]
)

REDIRECTS_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("timestamp", pa.timestamp("us")),
        ("status_code", pa.int32()),
        ("referrer", pa.string()),
        ("location", pa.string()),
        ("is_http_to_https", pa.bool_()),
        ("is_append_slash", pa.bool_()),
    ]
)

SEEN_SCHEMA = pa.schema(
    [
        ("url", pa.string()),
        ("url_hash", pa.uint64()),
    ]
)

# Per-partition lineage record (north_rule: seed batch, frontier
# generation, fetch outcome counts) generalizing the Crawl row
# (crawler/models.py:19-52).
LINEAGE_SCHEMA = pa.schema(
    [
        ("crawl_id", pa.string()),
        ("generation", pa.int32()),
        ("seed_batch", pa.int32()),
        ("n_candidates", pa.int64()),
        ("n_accepted", pa.int64()),
        ("n_pages", pa.int64()),
        ("n_errors", pa.int64()),
        ("n_redirects", pa.int64()),
        ("n_skipped", pa.int64()),
        ("wall_s", pa.float64()),
        ("status", pa.string()),
    ]
)


def empty_table(schema: pa.Schema) -> pa.Table:
    return schema.empty_table()
