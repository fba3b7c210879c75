"""Recrawl diffing — what changed between two crawl snapshots.

The reference's production cadence is a nightly FULL re-crawl of the
site (BASELINE.md: no incremental path); the first thing a consumer
of nightly snapshots needs is the delta. ``crawl_diff`` compares two
crawl checkpoints' page sets and returns (url, change) rows with
``change ∈ {added, removed, changed}``:

  - ``added``:   url is a page in B but not in A
  - ``removed``: url is a page in A but not in B
  - ``changed``: page in both, html bytes differ

Scale shape: each side reduces to slim (url_key, url, side,
content_hash) rows inside the scan tasks — html never leaves them —
and ONE url-keyed actor exchange co-locates both sides of every url,
where the compare is a dict walk over the partition's pages (keyed by
the full url string, so a routing-key collision only co-locates two
urls, never conflates them). Only diff rows (≪ pages for a nightly
delta) return. Content equality is 64-bit blake2b equality (C-fast
over the whole body — a pure-Python hash would cost milliseconds per
page; collisions mean a missed change at 2^-64, negligible), which
matches byte-equality for the oracle's purposes.
"""

from __future__ import annotations

from hashlib import blake2b
from zlib import crc32

import pyarrow as pa
import pyarrow.compute as pc

_DIFF_COLUMNS = ["record_type", "url", "html"]


def _side_rows(batch: pa.Table, side: int) -> pa.Table:
    pages = batch.filter(pc.equal(batch.column("record_type"), "page"))
    urls = pages.column("url").to_pylist()
    htmls = pages.column("html").to_pylist()
    return pa.table(
        {
            "url_key": pa.array(
                [crc32(u.encode()) for u in urls], type=pa.int64()
            ),
            "url": pa.array(urls, type=pa.string()),
            "side": pa.array([side] * len(urls), type=pa.int32()),
            "content_hash": pa.array(
                [
                    int.from_bytes(
                        blake2b((h or "").encode(), digest_size=8).digest(),
                        "big",
                    )
                    >> 1
                    for h in htmls
                ],
                type=pa.int64(),
            ),
        }
    )


def _diff_partition(group: pa.Table) -> pa.Table:
    """One url-hash partition holding both sides: classify each url.
    The dict walk is bounded by the partition's PAGE count (slim
    metadata rows, not content)."""
    by_url: dict[str, list[int | None]] = {}
    for url, side, ch in zip(
        group.column("url").to_pylist(),
        group.column("side").to_pylist(),
        group.column("content_hash").to_pylist(),
    ):
        slot = by_url.setdefault(url, [None, None])
        slot[side] = ch
    out_u, out_c = [], []
    for url, (a, b) in by_url.items():
        if a is None:
            out_u.append(url)
            out_c.append("added")
        elif b is None:
            out_u.append(url)
            out_c.append("removed")
        elif a != b:
            out_u.append(url)
            out_c.append("changed")
    return pa.table(
        {
            "url": pa.array(out_u, type=pa.string()),
            "change": pa.array(out_c, type=pa.string()),
        }
    )


def crawl_diff(records_a, records_b) -> pa.Table:
    """Diff two crawls' page sets; ``records_a``/``records_b`` are
    Datasets over the respective records checkpoints (pruned to
    ``_DIFF_COLUMNS``). Returns (url, change) sorted by url."""
    import functools

    from website_indexer_ray.state.exchange import hash_exchange

    tagged = records_a.map_batches(
        functools.partial(_side_rows, side=0), batch_format="pyarrow"
    ).union(
        records_b.map_batches(
            functools.partial(_side_rows, side=1), batch_format="pyarrow"
        )
    )
    out = hash_exchange(tagged, "url_key", _diff_partition)
    empty = pa.table(
        {
            "url": pa.array([], type=pa.string()),
            "change": pa.array([], type=pa.string()),
        }
    )
    if out is None:
        return empty
    return out.take(pc.sort_indices(out, sort_keys=[("url", "ascending")]))


def recrawl_priority(records_a, records_b) -> pa.Table:
    """Adaptive recrawl scheduling from two nightly snapshots: every
    page of the NEWER snapshot (B) gets a fetch priority for the next
    crawl — 0 = changed since A (demonstrably volatile), 1 = newly
    added (no history yet), 2 = unchanged (stable).  Removed pages
    have nothing to fetch and are excluded.  This is the incremental
    path the reference lacks (it re-crawls everything nightly at equal
    priority): a budgeted recrawl takes the priority-ordered prefix.

    Scale shape: the classified delta (``crawl_diff`` — slim rows,
    ≪ pages for a nightly delta) broadcasts once via ``ray.put``;
    B's pages stream through one map_batches that assigns priorities
    by lookup. Returns (url, priority) sorted by (priority, url)."""
    import ray

    from website_indexer_ray.util import cached_get

    diff = crawl_diff(records_a, records_b)
    pri = {
        u: (0 if c == "changed" else 1)
        for u, c in zip(
            diff.column("url").to_pylist(), diff.column("change").to_pylist()
        )
        if c != "removed"
    }
    ref = ray.put(pri)

    def assign(batch: pa.Table) -> pa.Table:
        lookup = cached_get(ref)
        pages = batch.filter(pc.equal(batch.column("record_type"), "page"))
        urls = pages.column("url").to_pylist()
        return pa.table(
            {
                "url": pa.array(urls, type=pa.string()),
                "priority": pa.array(
                    [lookup.get(u, 2) for u in urls], type=pa.int64()
                ),
            }
        )

    # the priority pass needs only (record_type, url) — drop html
    # before the map so B's page bodies are not shipped a second time
    slim_b = records_b.select_columns(["record_type", "url"])
    parts = [
        t
        for t in (
            pa.table(b)
            for b in slim_b.map_batches(
                assign, batch_format="pyarrow"
            ).iter_batches(batch_format="pyarrow")
        )
        if t.num_rows
    ]
    if not parts:
        return pa.table(
            {
                "url": pa.array([], type=pa.string()),
                "priority": pa.array([], type=pa.int64()),
            }
        )
    out = pa.concat_tables(parts)
    return out.take(
        pc.sort_indices(
            out, sort_keys=[("priority", "ascending"), ("url", "ascending")]
        )
    )


def crawl_diff_from_checkpoints(out_a: str, out_b: str) -> pa.Table:
    """Convenience form over two crawl checkpoint dirs."""
    from website_indexer_ray.pipelines.engine import CrawlResult

    a = CrawlResult(out_a).ray_records(columns=_DIFF_COLUMNS)
    b = CrawlResult(out_b).ray_records(columns=_DIFF_COLUMNS)
    return crawl_diff(a, b)
