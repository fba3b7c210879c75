"""Query/export layer — the reference viewer re-expressed as Dataset
expressions over the crawl checkpoint tables.

Covers the viewer's API surface (/root/reference/viewer/views.py:79-159,
urls.py:6-13): the six substring search types
(crawler/search.py:10-66), page detail lookup (views.py:151-159),
component/error/redirect list views with filters (views.py:79-106),
crawl stats (viewer/context_processors.py:6-27), pagination
(viewer/pagination.py:5-16, page size 25 per settings.py:131), CSV
export with UTF-8 BOM + per-type headers + date-stamped filename
(views.py:38-76, serializers.py:27-95), and the title-suffix strip
(serializers.py:19-35).

Search predicates are vectorized pyarrow.compute kernels inside
map_batches (C1: ``pc.match_substring(..., ignore_case=True)`` is the
engine form of Django's ``icontains``); list-column searches
(components/links) flatten with ``pc.list_flatten`` +
``list_parent_indices`` instead of the reference's M2M join tables
(SURVEY.md §2.5 J2/J3).
"""

from __future__ import annotations

import io
import re
from urllib.parse import quote_plus

import pyarrow as pa
import pyarrow.compute as pc

PAGE_VALUES = ["timestamp", "url", "title", "language"]  # search.py:7
PAGE_SIZE = 25  # settings.py:131

PAGE_TITLE_SUFFIX_RE = re.compile(
    r" \| ("
    r"Consumer Financial Protection Bureau|"
    r"Oficina para la Protección Financiera del Consumidor"
    r")$"
)  # serializers.py:19-24

SEARCH_TYPES = ("title", "url", "components", "links", "text", "html")  # forms.py:4-18


def _pages_only(records: pa.Table) -> pa.Table:
    return records.filter(pc.equal(records.column("record_type"), "page"))


def _icontains(col: pa.ChunkedArray, q: str) -> pa.ChunkedArray:
    return pc.match_substring(col, q, ignore_case=True)


def _list_any_match(table: pa.Table, list_col: str, qs: list[str]) -> pa.Array:
    """Row mask: any element of ``list_col`` icontains any of ``qs``."""
    col = table.column(list_col).combine_chunks()
    flat = pc.list_flatten(col)
    parents = pc.list_parent_indices(col)
    if len(flat) == 0:
        return pa.array([False] * table.num_rows, type=pa.bool_())
    match = pc.match_substring(flat, qs[0], ignore_case=True)
    for q in qs[1:]:
        match = pc.or_(match, pc.match_substring(flat, q, ignore_case=True))
    import numpy as np

    mask = np.zeros(table.num_rows, dtype=bool)
    hit_parents = pc.filter(parents, match).to_numpy(zero_copy_only=False)
    mask[np.unique(hit_parents)] = True
    return pa.array(mask)


def _explode_matches(
    table: pa.Table, list_col: str, qs: list[str], out_name: str
) -> pa.Table:
    """(page × matching element) rows — the CSV include-variant of the
    component/link searches (search.py:17-19,36-38)."""
    col = table.column(list_col).combine_chunks()
    flat = pc.list_flatten(col)
    parents = pc.list_parent_indices(col)
    if len(flat) == 0:
        keep = pa.array([], type=pa.int64())
        vals = pa.array([], type=pa.string())
    else:
        match = pc.match_substring(flat, qs[0], ignore_case=True)
        for q in qs[1:]:
            match = pc.or_(match, pc.match_substring(flat, q, ignore_case=True))
        keep = pc.filter(parents, match)
        vals = pc.filter(flat, match)
    out = table.select(PAGE_VALUES).take(keep)
    return out.append_column(out_name, vals)


def search_pages(
    records: pa.Table,
    search_type: str = "",
    q: str = "",
    include_related: bool = False,
    language: str | None = None,
) -> pa.Table:
    """The six search types (search.py:10-66; dispatch views.py:113-132).

    Returns [timestamp, url, title, language] (+ class_name/link_url
    when ``include_related``, the CSV variants), sorted by url
    (models.py:76 default ordering). ``language`` applies the page
    views' filterset (views.py:109 filterset_fields=["language"]).
    """
    pages = _pages_only(records)
    if language is not None:
        pages = pages.filter(pc.equal(pages.column("language"), language))

    # Dispatch mirrors views.py:113-132: a valid search_type runs its
    # search even with an empty q (icontains "" matches everything —
    # the reference's components/links CSVs with no q are the joined
    # row sets); only a missing/invalid search_type is search_empty.
    if search_type not in SEARCH_TYPES:
        out = pages.select(PAGE_VALUES)  # search_empty, search.py:49-50
    elif search_type in ("title", "url", "text", "html"):
        colname = search_type
        col = pages.column(colname)
        out = pages.filter(_icontains(col, q)).select(PAGE_VALUES)
    elif search_type == "components":
        if include_related:
            out = _explode_matches(pages, "components", [q], "class_name")
        else:
            out = pages.filter(_list_any_match(pages, "components", [q])).select(
                PAGE_VALUES
            )
    else:  # links — OR with the url-encoded variant (search.py:25-42)
        qs = [q, quote_plus(q)]
        if include_related:
            out = _explode_matches(pages, "links", qs, "link_url")
        else:
            out = pages.filter(_list_any_match(pages, "links", qs)).select(
                PAGE_VALUES
            )

    sort_keys = [("url", "ascending")] + (
        [(out.schema.names[-1], "ascending")] if include_related and out.num_columns == 5 else []
    )
    return out.take(pc.sort_indices(out, sort_keys=sort_keys))


def search_pages_ds(
    records_ds,
    search_type: str = "",
    q: str = "",
    include_related: bool = False,
    language: str | None = None,
):
    """Dataset-native form of ``search_pages`` — the scale path: the
    predicate runs as ``map_batches`` over the records dataset (pruned
    to the needed columns by the caller's read), so the full crawl —
    HTML included — never materializes on the driver; only matching
    projected rows flow to the final url sort. Returns a Dataset.
    """

    def batch_search(batch: pa.Table) -> pa.Table:
        out = search_pages(
            batch, search_type, q, include_related=include_related,
            language=language,
        )
        return out

    keys = ["url"]
    if include_related and search_type in ("components", "links"):
        keys.append("class_name" if search_type == "components" else "link_url")
    return records_ds.map_batches(batch_search, batch_format="pyarrow").sort(keys)


def strip_title_suffix(table: pa.Table) -> pa.Table:
    """Presentation-side title cleanup (serializers.py:27-35)."""
    titles = [
        PAGE_TITLE_SUFFIX_RE.sub("", t) if t is not None else None
        for t in table.column("title").to_pylist()
    ]
    idx = table.schema.get_field_index("title")
    return table.set_column(idx, "title", pa.array(titles, type=pa.string()))


def page_detail(records: pa.Table, url: str) -> dict | None:
    """Exact-URL detail lookup (views.py:151-159)."""
    pages = _pages_only(records)
    hit = pages.filter(pc.equal(pages.column("url"), url))
    if hit.num_rows == 0:
        return None
    row = hit.select(
        ["timestamp", "url", "title", "language", "text", "html",
         "components", "links"]
    ).to_pylist()[0]
    return row


def list_components(records: pa.Table) -> pa.Table:
    """Global distinct component dimension (models.py:84-88; A4)."""
    pages = _pages_only(records)
    flat = pc.list_flatten(pages.column("components").combine_chunks())
    distinct = pc.unique(flat)
    return pa.table(
        {"class_name": pc.take(distinct, pc.sort_indices(distinct))}
    )


def list_links(records: pa.Table) -> pa.Table:
    """Global distinct link dimension (models.py:91-95)."""
    pages = _pages_only(records)
    flat = pc.list_flatten(pages.column("links").combine_chunks())
    distinct = pc.unique(flat)
    return pa.table({"href": pc.take(distinct, pc.sort_indices(distinct))})


def list_errors(records: pa.Table, status_code: int | None = None) -> pa.Table:
    """Error list view with status filter (views.py:91-97)."""
    errors = records.filter(pc.equal(records.column("record_type"), "error"))
    if status_code is not None:
        errors = errors.filter(pc.equal(errors.column("status_code"), status_code))
    out = errors.select(["timestamp", "url", "status_code", "referrer"])
    return out.take(pc.sort_indices(out, sort_keys=[("url", "ascending")]))


def list_redirects(records: pa.Table, status_code: int | None = None) -> pa.Table:
    """Redirect list view (views.py:100-106) + derived flags
    (models.py:172-178, M12) as vectorized string compute."""
    reds = records.filter(pc.equal(records.column("record_type"), "redirect"))
    if status_code is not None:
        reds = reds.filter(pc.equal(reds.column("status_code"), status_code))
    url = reds.column("url")
    loc = reds.column("location")
    # Exactly location == re.sub("^http://", "https://", url)
    # (models.py:172-174) — no extra url != location guard, faithful to
    # the reference.
    https_twin = pc.replace_substring_regex(url, r"^http://", "https://")
    is_http_to_https = pc.equal(loc, https_twin)
    slash_twin = pc.binary_join_element_wise(url, pa.scalar("/"), "")
    is_append_slash = pc.and_kleene(
        pc.invert(pc.match_substring_regex(url, "/$")), pc.equal(loc, slash_twin)
    )
    out = reds.select(["timestamp", "url", "status_code", "referrer"])
    out = out.append_column("redirect_url", loc)
    out = out.append_column(
        "is_http_to_https", pc.fill_null(is_http_to_https, False)
    )
    out = out.append_column(
        "is_append_slash", pc.fill_null(is_append_slash, False)
    )
    return out.take(pc.sort_indices(out, sort_keys=[("url", "ascending")]))


def crawl_stats(records: pa.Table) -> dict:
    """Count/Min/Max(timestamp) + duration (context_processors.py:6-27)."""
    pages = _pages_only(records)
    ts = pages.column("timestamp")
    count = pages.num_rows
    start = pc.min(ts).as_py() if count else None
    end = pc.max(ts).as_py() if count else None
    duration = (end - start) if start and end else None
    return {"count": count, "start": start, "end": end, "duration": duration}


def paginate(table: pa.Table, page_number: int = 1, page_size: int = PAGE_SIZE) -> dict:
    """DRF-style page window (pagination.py:5-16)."""
    num_pages = max(1, -(-table.num_rows // page_size))
    page_number = min(max(1, page_number), num_pages)
    window = table.slice((page_number - 1) * page_size, page_size)
    return {
        "count": table.num_rows,
        "num_pages": num_pages,
        "page_number": page_number,
        "results": window.to_pylist(),
    }


_SEARCH_NAMES = {
    "title": "the page title",
    "url": "the page URL",
    "components": "components",
    "links": "link URLs",
    "text": "full text",
    "html": "page HTML",
}  # templatetags/viewer.py:28-35


def _intcomma(n: int) -> str:
    return f"{n:,}"


def results_summary(
    count: int, search_type: str = "", q: str = "", truncate_q_at: int = 24
) -> str:
    """The viewer's results-summary line
    (viewer/templatetags/viewer.py:14-40), byte-identical wording."""
    plural = "" if count == 1 else "s"
    if not q or not search_type:
        if not count:
            return "There are no indexed pages"
        return f"Showing all {_intcomma(count)} indexed page{plural}"
    search_name = _SEARCH_NAMES[search_type]
    count_str = _intcomma(count) if count else "No"
    truncated_q = f"{q[:truncate_q_at]}..." if len(q) > truncate_q_at else q
    return f'{count_str} page{plural} with "{truncated_q}" in {search_name}'


def format_datetime(dt) -> str:
    """Django ``date(dt, "N j, Y, g:i a T")`` formatting
    (templatetags/viewer.py:9-11): abbreviated month (Django style,
    e.g. "Sept."), no zero-padded day/hour, lowercase a.m./p.m."""
    months = [
        "Jan.", "Feb.", "March", "April", "May", "June", "July",
        "Aug.", "Sept.", "Oct.", "Nov.", "Dec.",
    ]
    hour12 = dt.hour % 12 or 12
    ampm = "a.m." if dt.hour < 12 else "p.m."
    tz = dt.tzname() or "UTC"
    return (
        f"{months[dt.month - 1]} {dt.day}, {dt.year}, "
        f"{hour12}:{dt.minute:02d} {ampm} {tz}"
    )


# --- CSV export (S6: views.py:38-76, serializers.py csv_header) -----

CSV_HEADERS = {
    "pages": ["url", "title", "language"],
    "pages_components": ["url", "title", "language", "class_name"],
    "pages_links": ["url", "title", "language", "link_url"],
    "components": ["class_name"],
    "errors": ["url", "status_code", "referrer"],
    "redirects": [
        "url", "status_code", "referrer", "redirect_url",
        "is_http_to_https", "is_append_slash",
    ],
}


def to_csv_bytes(table: pa.Table, kind: str, crawl_start=None) -> tuple[str, bytes]:
    """(filename, bytes) with UTF-8 BOM and the reference's headers;
    filename stamped with the crawl start date (views.py:64-76)."""
    header = CSV_HEADERS[kind]
    basename = kind.split("_")[0]
    filename = basename
    if crawl_start is not None:
        filename += f"-{crawl_start.strftime('%Y%m%d')}"
    filename += ".csv"

    # Vectorized export (pandas' C CSV writer — QUOTE_MINIMAL with
    # doubled quotes and CRLF rows, the reference's csv.writer wire
    # format), not a per-row Python loop.
    import pandas as pd

    cols = {}
    for h in header:
        if h in table.schema.names:
            col = table.column(h)
            vals = col.to_pylist()
            # str() per cell matches csv.writer; bools stay Python
            # bools so pandas renders True/False.
            if pa.types.is_boolean(col.type):
                cols[h] = vals
            else:
                cols[h] = ["" if v is None else str(v) for v in vals]
        else:
            cols[h] = [""] * table.num_rows
    df = pd.DataFrame(cols, columns=header)
    buf = io.StringIO()
    df.to_csv(buf, index=False, lineterminator="\r\n")
    return filename, b"\xef\xbb\xbf" + buf.getvalue().encode("utf-8")
