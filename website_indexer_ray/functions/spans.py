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

from website_indexer_ray.schemas import DOCS_SCHEMA, SPAN_STRUCT


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

    Fully vectorized: the six span groups (title, lang, text, links,
    components, media — ``build_spans`` order) are assembled as flat
    arrays with (page, group, ordinal) keys, sorted once, and wrapped
    into the list<struct> column via offsets — no per-row Python.
    ``build_spans`` remains the one-row reference form (tests compare
    the two).
    """
    import numpy as np

    pages = batch.filter(pc.equal(batch.column("record_type"), "page"))
    n = pages.num_rows
    if n == 0:
        return DOCS_SCHEMA.empty_table()

    parents: list[np.ndarray] = []
    grps: list[np.ndarray] = []
    ords: list[np.ndarray] = []
    kinds: list[pa.Array] = []
    texts: list[pa.Array] = []
    refs: list[pa.Array] = []

    def add_scalar_group(grp: int, kind: str, values, mask: np.ndarray) -> None:
        """One span per page where mask holds; span text = values."""
        idx = np.flatnonzero(mask)
        if not len(idx):
            return
        parents.append(idx)
        grps.append(np.full(len(idx), grp, dtype=np.int8))
        ords.append(np.zeros(len(idx), dtype=np.int64))
        kinds.append(pa.array([kind] * len(idx), type=pa.string()))
        # RECORDS_SCHEMA mixes string/large_string (text/html are
        # large); the span struct is plain string.
        texts.append(values.take(pa.array(idx)).cast(pa.string()))
        refs.append(pa.array([""] * len(idx), type=pa.string()))

    title = pages.column("title").combine_chunks()
    lang = pages.column("language").combine_chunks()
    text = pages.column("text").combine_chunks()
    add_scalar_group(0, "title", title, np.ones(n, dtype=bool))
    add_scalar_group(1, "lang", lang, pc.is_valid(lang).to_numpy(zero_copy_only=False))
    add_scalar_group(2, "text", text, pc.is_valid(text).to_numpy(zero_copy_only=False))

    def add_list_group(grp: int, kind: str, colname: str, as_ref: bool) -> None:
        col = pages.column(colname).combine_chunks()
        flat = pc.list_flatten(col)
        if len(flat) == 0:
            return
        par = pc.list_parent_indices(col).to_numpy(zero_copy_only=False)
        lens = pc.fill_null(pc.list_value_length(col), 0).to_numpy(
            zero_copy_only=False
        )
        starts = np.repeat(np.cumsum(lens) - lens, lens)
        parents.append(par)
        grps.append(np.full(len(par), grp, dtype=np.int8))
        ords.append(np.arange(len(par), dtype=np.int64) - starts)
        kinds.append(pa.array([kind] * len(par), type=pa.string()))
        if as_ref:
            texts.append(pa.array([""] * len(par), type=pa.string()))
            refs.append(flat.cast(pa.string()))
        else:
            texts.append(flat.cast(pa.string()))
            refs.append(pa.array([""] * len(par), type=pa.string()))

    add_list_group(3, "link", "links", as_ref=False)
    add_list_group(4, "component", "components", as_ref=False)
    add_list_group(5, "media", "media", as_ref=True)

    parent_all = np.concatenate(parents)
    key = pa.table(
        {
            "parent": pa.array(parent_all, type=pa.int64()),
            "grp": pa.array(np.concatenate(grps), type=pa.int8()),
            "ord": pa.array(np.concatenate(ords), type=pa.int64()),
        }
    )
    order = pc.sort_indices(
        key,
        sort_keys=[("parent", "ascending"), ("grp", "ascending"), ("ord", "ascending")],
    )
    order_np = order.to_numpy(zero_copy_only=False)
    parent_sorted = parent_all[order_np]
    counts = np.bincount(parent_sorted, minlength=n)
    page_starts = np.cumsum(counts) - counts
    offsets_in_page = np.arange(len(parent_sorted), dtype=np.int64) - np.repeat(
        page_starts, counts
    )

    struct = pa.StructArray.from_arrays(
        [
            pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in kinds]).take(order),
            pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in texts]).take(order),
            pa.concat_arrays([a.combine_chunks() if isinstance(a, pa.ChunkedArray) else a for a in refs]).take(order),
            pa.array(offsets_in_page.astype(np.int32), type=pa.int32()),
        ],
        fields=list(SPAN_STRUCT),
    )
    list_offsets = pa.array(
        np.concatenate(([0], np.cumsum(counts))).astype(np.int32), type=pa.int32()
    )
    spans = pa.ListArray.from_arrays(list_offsets, struct)
    return pa.Table.from_arrays(
        [pages.column("url").combine_chunks(), spans], schema=DOCS_SCHEMA
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
