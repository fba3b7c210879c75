"""Frontier accept/reject predicate chain (SURVEY.md §2.3 F1-F10).

Reimplements the reference's ``accept_url`` hook
(/root/reference/crawler/wpull/plugin.py:92-168) as a stateless
``map_batches`` stage over Arrow frontier batches. Evaluation per
candidate row, in reference order:

  F1  upstream verdict: depth cap (wpull ``--level``,
      crawler.py:47) — non-http(s) schemes are already dropped by the
      canonicalizer at expansion time
  F4  static SKIP_URLS regexes (plugin.py:108-110)
  F5  reject candidates whose *parent* is on a different host:port
      than the start URL (plugin.py:112-119) — crawl external links
      once, never recurse
  F6  HEAD-request domains: method rewrite, not a rejection
      (plugin.py:121-126); skips the internal-only checks (the
      reference's ``elif``)
  F7  internal URLs with "." in the path (filename-like) rejected
      (plugin.py:128-132)
  F8  internal ``/external-site/?ext_url=X``: reject the wrapper but
      re-enqueue X at the same depth with the same parent
      (plugin.py:136-157). The reference also calls
      URLTable.remove_many([X]) — but that only clears wpull's
      enqueue-dedup so the re-add isn't silently dropped; the
      plugin's own ``requested_urls`` check (F3, plugin.py:104-106)
      still rejects X if it was already *fetched*. Our offer/claim
      protocol plays both roles at once (candidates are offered
      unconditionally, claims are once-per-URL), so the net semantics
      — X fetched at most once per crawl — match without a delete.
      SeenShard.remove exists (state/seen.py) for operator-initiated
      re-crawl overrides.
  F9  internal URLs with querystrings: only exactly ``?page=N``
      crawlable (plugin.py:159-162)

F2 (max_pages budget) and F3 (already-requested dedup) are applied by
the seen-claim stage *after* this one; the reordering cannot change
which URLs get fetched (all rejections are absorbing, and F8's
re-enqueue is budget-checked downstream in both orders).

Rewritten F8 rows are re-run through the chain (wpull re-evaluates
re-added URLs when they're popped), bounded to a few iterations to
break pathological nesting.
"""

from __future__ import annotations

from urllib.parse import parse_qs, urlsplit

import pyarrow as pa

from website_indexer_ray.config import CrawlConfig
from website_indexer_ray.functions.htmlparse import HTML_EXTERNAL_SITE
from website_indexer_ray.functions.urls import canonicalize, hostname_with_port, url_hash
from website_indexer_ray.schemas import FRONTIER_SCHEMA

_MAX_REWRITE_PASSES = 4


class PredicateStage:
    """Callable for ``map_batches(batch_format="pyarrow")``; also
    usable directly (the sequential oracle shares this exact code so
    engine-vs-oracle equality tests exercise one predicate
    implementation against the reference's cited semantics)."""

    def __init__(self, cfg: CrawlConfig | dict):
        if isinstance(cfg, dict):
            cfg = CrawlConfig.from_dict(cfg)
        self.cfg = cfg
        self.skip_res = cfg.compile_skip()
        self.head_res = cfg.compile_head()
        self.start_host_port = hostname_with_port(cfg.start_url)

    def accept_row(self, row: dict) -> tuple[bool, dict | None]:
        """(accepted, rewrite_row). ``row`` is mutated to carry
        ``method``. Mirrors plugin.py:92-168 line by line."""
        url = row["url"]
        cfg = self.cfg

        # F1: depth cap (upstream wpull verdict).
        if cfg.depth and row["depth"] > cfg.depth:
            return False, None

        # F4: static skip regexes.
        if any(p.match(url) for p in self.skip_res):
            return False, None

        # F5: don't recurse from external-domain parents.
        if row["parent_host"] != self.start_host_port:
            return False, None

        # F6: HEAD-request domains (method rewrite; skips F7-F9).
        if any(p.match(url) for p in self.head_res):
            row["method"] = "HEAD"
            return True, None

        if hostname_with_port(url) == self.start_host_port:
            parts = urlsplit(url)

            # F7: filename-like paths.
            if "." in parts.path:
                return False, None

            qs = parse_qs(parts.query)
            if qs:
                # F8: external-site wrapper → re-enqueue target.
                if HTML_EXTERNAL_SITE.match(parts.path):
                    ext_urls = qs.get("ext_url")
                    if ext_urls:
                        ext = canonicalize(
                            ext_urls[0], profile=cfg.canonical_profile
                        )
                        rewrite = None
                        if ext is not None:
                            rewrite = dict(row)
                            rewrite["url"] = ext
                            rewrite["url_hash"] = url_hash(ext)
                            rewrite["host"] = hostname_with_port(ext)
                            rewrite["method"] = "GET"
                            # same depth, same parent, same root
                            # (plugin.py:145-151).
                        return False, rewrite
                    # No ext_url param: falls through ACCEPTED —
                    # faithful to the reference's control flow
                    # (plugin.py:139-144 has no else).
                # F9: only ?page=N querystrings crawlable.
                elif list(qs.keys()) != ["page"]:
                    return False, None

        row.setdefault("method", "GET")
        return True, None

    def process_rows(self, rows: list[dict]) -> list[dict]:
        """Run the chain with F8 rewrite re-evaluation; returns
        accepted rows (with ``method``)."""
        accepted: list[dict] = []
        pending = [dict(r) for r in rows]
        for _ in range(_MAX_REWRITE_PASSES):
            rewrites: list[dict] = []
            for row in pending:
                row.setdefault("method", "GET")
                ok, rewrite = self.accept_row(row)
                if ok:
                    accepted.append(row)
                if rewrite is not None:
                    rewrites.append(rewrite)
            if not rewrites:
                break
            pending = rewrites
        return accepted

    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        accepted = self.process_rows(rows)
        schema = FRONTIER_SCHEMA.append(pa.field("method", pa.string()))
        if not accepted:
            return schema.empty_table()
        return pa.Table.from_pylist(accepted, schema=schema)
