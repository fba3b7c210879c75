"""Interleaved-span document construction (BASELINE.json input_hint).

A parsed page maps to one ``docs`` row
``(doc_id: string, spans: list<struct<kind,text,media_ref,offset>>)``
with the span sequence (FIXTURES.md §3; reference fields from
/root/reference/crawler/parser.py:68-122):

  1. kind="title"     stripped <title> text
  2. kind="lang"      root lang attribute, if present
  3. kind="text"      whitespace-collapsed cleaned body text, if a body
  4. kind="link" × N  hrefs, set-deduped + unwrapped + sorted
  5. kind="component" × N  class names, set-deduped + sorted
  6. kind="media" × N  dropped <img> srcs in document order
                       (text="", media_ref=src)

``offset`` is the ordinal within the row's sequence. The per-row
invariant vs the reference is span-sequence equality on
(kind, text, media_ref, order).
"""

from __future__ import annotations

import pyarrow as pa
import pyarrow.compute as pc

from website_indexer_ray.schemas import DOCS_SCHEMA


def build_spans(
    title: str,
    language: str | None,
    text: str | None,
    links: list[str],
    components: list[str],
    media: list[str],
) -> list[dict]:
    spans: list[dict] = []

    def add(kind: str, text_val: str = "", media_ref: str = "") -> None:
        spans.append(
            {
                "kind": kind,
                "text": text_val,
                "media_ref": media_ref,
                "offset": len(spans),
            }
        )

    add("title", title)
    if language is not None:
        add("lang", language)
    if text is not None:
        add("text", text)
    for href in links:
        add("link", href)
    for cls in components:
        add("component", cls)
    for src in media:
        add("media", "", src)
    return spans


DOC_SOURCE_COLUMNS = [
    "record_type", "url", "title", "language", "text",
    "links", "components", "media",
]


def docs_table_from_records(batch: pa.Table) -> pa.Table:
    """Project page records (RECORDS_SCHEMA) to the docs shape.

    Only rows with record_type == "page" produce documents (titleless /
    skipped rows have no index entry, parser.py:75-76). Shaped for
    direct use as a ``map_batches`` callable over a pruned
    (``DOC_SOURCE_COLUMNS``) records dataset — the streaming form used
    by ``entry()``.
    """
    cols = batch.select(
        ["record_type", "url", "title", "language", "text",
         "links", "components", "media"]
    ).to_pylist()
    doc_ids: list[str] = []
    spans_col: list[list[dict]] = []
    for row in cols:
        if row["record_type"] != "page":
            continue
        doc_ids.append(row["url"])
        spans_col.append(
            build_spans(
                row["title"], row["language"], row["text"],
                row["links"] or [], row["components"] or [], row["media"] or [],
            )
        )
    return pa.Table.from_pydict(
        {"doc_id": doc_ids, "spans": spans_col}, schema=DOCS_SCHEMA
    )


def flatten_spans(batch: pa.Table) -> pa.Table:
    """DOCS_SCHEMA → one row per span (doc_id, kind, text, media_ref,
    offset) — the hashable tabular projection of the interleaved-span
    shape. Fully vectorized: ``pc.list_flatten`` for the struct values,
    ``pc.list_parent_indices`` to repeat doc_ids."""
    spans = batch.column("spans").combine_chunks()
    flat = pc.list_flatten(spans)
    parents = pc.list_parent_indices(spans)
    doc_ids = pc.take(batch.column("doc_id").combine_chunks(), parents)
    return pa.table(
        {
            "doc_id": doc_ids,
            "kind": pc.struct_field(flat, "kind"),
            "text": pc.struct_field(flat, "text"),
            "media_ref": pc.struct_field(flat, "media_ref"),
            "offset": pc.struct_field(flat, "offset"),
        }
    )
