"""Sequential oracle: reference crawl semantics in plain Python.

Used ONLY in tests. Implements the reference's crawl behavior
(/root/reference/crawler/wpull/plugin.py accept_url 92-168, response
routing 205-281, budget 88-100; BFS level semantics of wpull
crawler.py:47) directly and independently of the distributed engine's
stage classes — the engine and this oracle share only the leaf
functions validated by golden tests (canonicalize, parse_page,
timestamps), so equality between them is a genuine cross-check of the
distributed machinery (predicates, seen-claim actors, expansion,
checkpointing).

Canonical crawl order is defined as (generation, sorted canonical
URL); within a generation the oracle claims candidates in sorted order
with the budget applied before each claim — the distributed engine
reproduces exactly this order (SURVEY.md §2.10).
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from urllib.parse import parse_qs, urlsplit

from website_indexer_ray.config import CrawlConfig
from website_indexer_ray.functions.htmlparse import HTML_EXTERNAL_SITE, parse_page
from website_indexer_ray.functions.urls import (
    canonicalize,
    explicit_port,
    hostname,
    hostname_with_port,
    url_hash,
)
from website_indexer_ray.stages.fetch import record_timestamp_us


@dataclass
class OracleResult:
    records: list[dict] = field(default_factory=list)
    order: list[tuple[str, int]] = field(default_factory=list)  # (url, generation)
    seen: set[str] = field(default_factory=set)

    def by_type(self, rtype: str) -> list[dict]:
        return sorted(
            (r for r in self.records if r["record_type"] == rtype),
            key=lambda r: r["url"],
        )


def crawl_oracle(corpus: dict[str, tuple], seeds: list[str], cfg: CrawlConfig) -> OracleResult:
    skip_res = [re.compile(p) for p in cfg.skip_url_patterns]
    head_res = [re.compile(p) for p in cfg.head_url_patterns]
    start_hp = hostname_with_port(cfg.start_url)
    start_hostname = hostname(cfg.start_url)
    start_port = explicit_port(cfg.start_url)

    result = OracleResult()
    requested = result.seen

    frontier: list[dict] = []
    for s in seeds:
        u = canonicalize(s, profile=cfg.canonical_profile)
        if u:
            frontier.append(
                {"url": u, "depth": 0, "parent_url": "", "parent_host": start_hp}
            )

    def accept(row: dict) -> tuple[bool, dict | None]:
        """plugin.py:92-168, minus budget/seen (applied at claim)."""
        url = row["url"]
        if cfg.depth and row["depth"] > cfg.depth:
            return False, None
        if any(p.match(url) for p in skip_res):
            return False, None
        if row["parent_host"] != start_hp:
            return False, None
        if any(p.match(url) for p in head_res):
            row["method"] = "HEAD"
            return True, None
        if hostname_with_port(url) == start_hp:
            parts = urlsplit(url)
            if "." in parts.path:
                return False, None
            qs = parse_qs(parts.query)
            if qs:
                if HTML_EXTERNAL_SITE.match(parts.path):
                    ext_urls = qs.get("ext_url")
                    if ext_urls:
                        ext = canonicalize(ext_urls[0], profile=cfg.canonical_profile)
                        rw = None
                        if ext is not None:
                            rw = dict(row)
                            rw["url"] = ext
                            rw["method"] = "GET"
                        return False, rw
                elif list(qs.keys()) != ["page"]:
                    return False, None
        row.setdefault("method", "GET")
        return True, None

    g = 0
    while frontier and g < cfg.max_generations:
        # Phase A: predicate chain with F8 re-evaluation.
        accepted: list[dict] = []
        pending = [dict(r) for r in frontier]
        for _ in range(4):
            rewrites = []
            for row in pending:
                ok, rw = accept(row)
                if ok:
                    accepted.append(row)
                if rw is not None:
                    rewrites.append(rw)
            if not rewrites:
                break
            pending = rewrites

        # Phase B: canonical-order claim with budget (plugin.py:88-106).
        # Sort key includes the same-URL tiebreak (depth, parent_url,
        # method) so the first occurrence per URL is the canonical
        # winner the engine's frontier-dedup groupby picks.
        accepted.sort(
            key=lambda r: (
                r["url"],
                r["depth"],
                r["parent_url"] or "",
                r.get("method") or "GET",
            )
        )
        claimed: list[dict] = []
        claimed_urls: set[str] = set()
        for row in accepted:
            u = row["url"]
            if u in requested or u in claimed_urls:
                continue
            if cfg.max_pages and len(requested) + len(claimed) >= cfg.max_pages:
                continue
            claimed_urls.add(u)
            claimed.append(row)

        # Phase C: sequential fetch + record + expand
        # (plugin.py:170-281).
        next_frontier: list[dict] = []
        for row in claimed:
            u = row["url"]
            requested.add(u)
            result.order.append((u, g))
            h = url_hash(u)
            referrer = row["parent_url"] or None
            rec = {
                "record_type": "skipped",
                "url": u,
                "generation": g,
                "depth": row["depth"],
                "timestamp": record_timestamp_us(g, h),
                "status_code": 0,
                "referrer": referrer,
                "location": None,
                "method": row.get("method", "GET"),
                "title": None,
                "language": None,
                "html": None,
                "text": None,
                "components": None,
                "links": None,
                "media": None,
            }
            entry = corpus.get(u)
            status, ctype, location, html, _delay = entry if entry else (0, "", None, None, 0)
            if row.get("method") == "HEAD":
                html = None
            rec["status_code"] = status

            if status == 0:
                rec["record_type"] = "error"
            elif 300 <= status < 400:
                rec["record_type"] = "redirect"
                rec["location"] = location
                if location:
                    loc_host = hostname(location)
                    loc_port = explicit_port(location)
                    followable = not (
                        (loc_host and loc_host != start_hostname)
                        or (loc_port is not None and loc_port != start_port)
                    )
                    if followable:
                        target = canonicalize(
                            location, base=u, profile=cfg.canonical_profile
                        )
                        if target:
                            next_frontier.append(
                                {
                                    "url": target,
                                    "depth": row["depth"],
                                    "parent_url": referrer or u,
                                    "parent_host": hostname_with_port(
                                        referrer or cfg.start_url
                                    ),
                                }
                            )
            elif status >= 400:
                rec["record_type"] = "error"
            else:  # 200-class
                if hostname_with_port(u) == start_hp and (ctype or "").startswith("text/html") and html is not None:
                    parsed = parse_page(html, start_hostname)
                    dedup: set[str] = set()
                    for href in parsed.frontier_links:
                        child = canonicalize(href, base=u, profile=cfg.canonical_profile)
                        if child is None or child in dedup:
                            continue
                        dedup.add(child)
                        next_frontier.append(
                            {
                                "url": child,
                                "depth": row["depth"] + 1,
                                "parent_url": u,
                                "parent_host": hostname_with_port(u),
                            }
                        )
                    if parsed.title is not None:
                        rec["record_type"] = "page"
                        rec["title"] = parsed.title
                        rec["language"] = parsed.language
                        rec["html"] = html
                        rec["text"] = parsed.text
                        rec["components"] = parsed.components
                        rec["links"] = parsed.links
                        rec["media"] = parsed.media
            result.records.append(rec)

        frontier = next_frontier
        g += 1

    return result
