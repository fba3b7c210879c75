"""Django dumpdata-fixture interop (S8 companion).

The reference regenerates its test fixture with
``./manage.py dumpdata crawler > crawler/fixtures/sample.json``
(/root/reference/README.md:291-298) — a JSON list of
``{"model": "crawler.<name>", "pk": N, "fields": {...}}`` objects with
normalized Component/Link dimension rows and M2M pk lists on pages
(crawler/models.py). This module converts between that wire format and
the engine's columnar RECORDS_SCHEMA, so a user can

  - export a crawl checkpoint as a Django-loadable fixture
    (``dump_fixture``), and
  - ingest a reference fixture (including the repo's own
    ``crawler/fixtures/sample.json``) as a records table the whole
    query layer runs on unchanged (``load_fixture``).

Timestamps serialize in Django's ECMA-262 form (``...Z``); the M2M
normalization assigns dimension pks in first-seen order exactly as a
fresh Django db would (autoincrement insert order).
"""

from __future__ import annotations

import json
from datetime import datetime, timezone

import pyarrow as pa
import pyarrow.compute as pc

from website_indexer_ray.schemas import RECORDS_SCHEMA


def _ts_str(ts) -> str | None:
    """int µs-since-epoch or datetime → Django's ECMA-262 string."""
    if ts is None:
        return None
    if isinstance(ts, datetime):
        dt = ts if ts.tzinfo else ts.replace(tzinfo=timezone.utc)
    else:
        dt = datetime.fromtimestamp(ts / 1e6, tz=timezone.utc)
    s = dt.strftime("%Y-%m-%dT%H:%M:%S.%f")[:-3]  # millisecond precision
    return s + "Z"


def _ts_dt(s: str | None) -> datetime | None:
    if not s:
        return None
    return datetime.fromisoformat(s.replace("Z", "+00:00")).replace(tzinfo=None)


def dump_fixture(records: pa.Table, crawl_config: dict | None = None) -> list[dict]:
    """Records table → Django-fixture object list (crawl, components,
    links, pages with M2M pk lists, errors, redirects)."""
    out: list[dict] = [
        {
            "model": "crawler.crawl",
            "pk": 1,
            "fields": {
                "started": _ts_str(
                    pc.min(records.column("timestamp")).value
                    if records.num_rows
                    else None
                ),
                "status": "Finished",
                "config": crawl_config or {},
                "failure_message": None,
            },
        }
    ]

    pages = records.filter(pc.equal(records.column("record_type"), "page"))
    pages = pages.take(pc.sort_indices(pages, sort_keys=[("url", "ascending")]))

    comp_pk: dict[str, int] = {}
    link_pk: dict[str, int] = {}
    for row in pages.select(["components", "links"]).to_pylist():
        for c in row["components"] or []:
            comp_pk.setdefault(c, len(comp_pk) + 1)
        for h in row["links"] or []:
            link_pk.setdefault(h, len(link_pk) + 1)
    out += [
        {"model": "crawler.component", "pk": pk, "fields": {"class_name": c}}
        for c, pk in comp_pk.items()
    ]
    out += [
        {"model": "crawler.link", "pk": pk, "fields": {"href": h}}
        for h, pk in link_pk.items()
    ]

    for i, row in enumerate(pages.to_pylist(), start=1):
        out.append(
            {
                "model": "crawler.page",
                "pk": i,
                "fields": {
                    "crawl": 1,
                    "timestamp": _ts_str(row["timestamp"]),
                    "url": row["url"],
                    "title": row["title"],
                    "language": row["language"],
                    "html": row["html"],
                    "text": row["text"],
                    "components": [comp_pk[c] for c in row["components"] or []],
                    "links": [link_pk[h] for h in row["links"] or []],
                },
            }
        )

    for model, rtype, fields in (
        ("crawler.error", "error", ["timestamp", "url", "status_code", "referrer"]),
        (
            "crawler.redirect",
            "redirect",
            ["timestamp", "url", "status_code", "referrer", "location"],
        ),
    ):
        sub = records.filter(pc.equal(records.column("record_type"), rtype))
        sub = sub.take(pc.sort_indices(sub, sort_keys=[("url", "ascending")]))
        for i, row in enumerate(sub.to_pylist(), start=1):
            f = {k: row[k] for k in fields}
            f["timestamp"] = _ts_str(row["timestamp"])
            f["crawl"] = 1
            out.append({"model": model, "pk": i, "fields": f})
    return out


def load_fixture(objs: list[dict] | str) -> pa.Table:
    """Django-fixture objects (or a path to a dumpdata JSON file) →
    RECORDS_SCHEMA table the query layer consumes directly."""
    if isinstance(objs, str):
        with open(objs) as fh:
            objs = json.load(fh)
    comps = {
        o["pk"]: o["fields"]["class_name"]
        for o in objs
        if o["model"] == "crawler.component"
    }
    links = {
        o["pk"]: o["fields"]["href"] for o in objs if o["model"] == "crawler.link"
    }

    rows: list[dict] = []

    def base(f: dict, rtype: str) -> dict:
        return {
            "record_type": rtype,
            "url": f["url"],
            "url_hash": 0,
            "host": "",
            "generation": 0,
            "depth": 0,
            "seed_batch": 0,
            "timestamp": _ts_dt(f.get("timestamp")),
            "status_code": f.get("status_code", 200),
            "referrer": f.get("referrer"),
            "location": f.get("location"),
            "method": "GET",
            "title": f.get("title"),
            "language": f.get("language"),
            "html": f.get("html"),
            "text": f.get("text"),
            "components": None,
            "links": None,
            "media": None,
            "frontier_links": None,
        }

    for o in objs:
        f = o["fields"]
        if o["model"] == "crawler.page":
            row = base(f, "page")
            row["components"] = [comps[pk] for pk in f.get("components", [])]
            row["links"] = [links[pk] for pk in f.get("links", [])]
            rows.append(row)
        elif o["model"] == "crawler.error":
            rows.append(base(f, "error"))
        elif o["model"] == "crawler.redirect":
            rows.append(base(f, "redirect"))
    return pa.Table.from_pylist(rows, schema=RECORDS_SCHEMA)
