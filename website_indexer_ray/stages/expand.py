"""Frontier expansion: records(gen g) → candidate frontier rows(gen g+1).

A stateless ``map_batches`` projection over the per-generation records
table (columns pruned at the read — url, depth, record_type, location,
status_code, frontier_links only; never the HTML):

- page / skipped-internal rows: each raw ``frontier_links`` href is
  resolved against the page URL and canonicalized (wpull's extractor +
  normalization, crawler.py:43-44); child depth = parent depth + 1
  with parent_url carried on the row (URLProperties inheritance,
  plugin.py:145-151).
- redirect rows: the recorded Location is followed only when its
  hostname/port don't contradict the start URL's
  (plugin.py:236-245); the target keeps the redirect's depth and the
  redirect's ORIGINAL parent (wpull treats a redirect as the same
  item), entering the next generation.

Within-batch href dedup is done here (cheap set), cross-batch and
cross-generation dedup is the seen-claim stage's job.
"""

from __future__ import annotations

import pyarrow as pa

from website_indexer_ray.config import CrawlConfig
from website_indexer_ray.functions.urls import (
    canonicalize,
    explicit_port,
    hostname,
    hostname_with_port,
    url_hash,
)
from website_indexer_ray.schemas import FRONTIER_SCHEMA

EXPAND_COLUMNS = [
    "record_type",
    "url",
    "depth",
    "status_code",
    "location",
    "referrer",
    "frontier_links",
    "generation",
    "seed_batch",
]


class ExpandStage:
    def __init__(self, cfg: CrawlConfig | dict):
        self.cfg = CrawlConfig.from_dict(cfg) if isinstance(cfg, dict) else cfg
        self.start_hostname = hostname(self.cfg.start_url)
        self.start_port = explicit_port(self.cfg.start_url)

    def follow_redirect(self, location: str) -> bool:
        """plugin.py:236-245 — note hostname and explicit port are
        checked independently, not as host:port."""
        loc_host = hostname(location)
        loc_port = explicit_port(location)
        if loc_host and loc_host != self.start_hostname:
            return False
        if loc_port is not None and loc_port != self.start_port:
            return False
        return True

    def expand_rows(self, rows: list[dict]) -> list[dict]:
        out: list[dict] = []
        profile = self.cfg.canonical_profile
        for row in rows:
            rtype = row["record_type"]
            gen_next = row["generation"] + 1
            if rtype == "redirect":
                location = row["location"]
                if not location or not self.follow_redirect(location):
                    continue
                target = canonicalize(location, base=row["url"], profile=profile)
                if target is None:
                    continue
                out.append(
                    {
                        "url": target,
                        "url_hash": url_hash(target),
                        "host": hostname_with_port(target),
                        "depth": row["depth"],  # redirect keeps its level
                        "parent_url": row["referrer"] or row["url"],
                        "parent_host": hostname_with_port(
                            row["referrer"] or self.cfg.start_url
                        ),
                        "root_url": self.cfg.start_url,
                        "generation": gen_next,
                        "seed_batch": row.get("seed_batch", 0) or 0,
                    }
                )
                continue

            links = row.get("frontier_links")
            if not links:
                continue
            base = row["url"]
            parent_host = hostname_with_port(base)
            seen_here: set[str] = set()
            for href in links:
                child = canonicalize(href, base=base, profile=profile)
                if child is None or child in seen_here:
                    continue
                seen_here.add(child)
                out.append(
                    {
                        "url": child,
                        "url_hash": url_hash(child),
                        "host": hostname_with_port(child),
                        "depth": row["depth"] + 1,
                        "parent_url": base,
                        "parent_host": parent_host,
                        "root_url": self.cfg.start_url,
                        "generation": gen_next,
                        "seed_batch": row.get("seed_batch", 0) or 0,
                    }
                )
        return out

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        out = self.expand_rows(rows)
        if not out:
            return FRONTIER_SCHEMA.empty_table()
        return pa.Table.from_pylist(out, schema=FRONTIER_SCHEMA)
