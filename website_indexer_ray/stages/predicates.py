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

import numpy as np
import pyarrow as pa
import pyarrow.compute as pc

from website_indexer_ray.config import CrawlConfig
from website_indexer_ray.functions.htmlparse import HTML_EXTERNAL_SITE
from website_indexer_ray.functions.urls import canonicalize, hostname_with_port, url_hash
from website_indexer_ray.schemas import FRONTIER_SCHEMA

_MAX_REWRITE_PASSES = 4

# "." anywhere in the path portion (after the authority, before ?/#) —
# the vectorized form of F7's `"." in urlsplit(url).path`.
_DOT_IN_PATH_RE = r"^[^/?#]+//[^/?#]*/[^?#]*\."


def _anchor(pattern: str) -> str:
    """Python ``re.match`` anchors at the start; Arrow's
    match_substring_regex matches anywhere — wrap to keep re.match
    semantics."""
    return f"^(?:{pattern})"


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
        """Vectorized chain: F1/F4/F5/F7 and the F6 method rewrite are
        pure string/compare kernels over the whole batch; only rows
        that carry a querystring on the start host (the F8 wrapper
        re-enqueue and the F9 ?page=N rule, plus any F8 rewrites) drop
        to the exact row-wise path — a rare slice of real frontiers.
        Equality with ``process_rows`` (the sequential-oracle form) is
        pinned by the engine-vs-oracle e2e tests."""
        schema = FRONTIER_SCHEMA.append(pa.field("method", pa.string()))
        if batch.num_rows == 0:
            return schema.empty_table()
        batch = batch.select(FRONTIER_SCHEMA.names).combine_chunks()
        url = batch.column("url")

        def any_match(patterns) -> pa.Array:
            mask = None
            for p in patterns:
                m = pc.match_substring_regex(url, _anchor(p.pattern))
                mask = m if mask is None else pc.or_(mask, m)
            if mask is None:
                return pa.array(np.zeros(batch.num_rows, dtype=bool))
            return mask

        cfg = self.cfg
        # F1 depth cap (0 = uncapped).
        keep = (
            pc.less_equal(batch.column("depth"), cfg.depth)
            if cfg.depth
            else pa.array(np.ones(batch.num_rows, dtype=bool))
        )
        # F4 skip regexes; F5 external-parent rejection.
        keep = pc.and_(keep, pc.invert(any_match(self.skip_res)))
        keep = pc.and_(
            keep, pc.equal(batch.column("parent_host"), self.start_host_port)
        )
        # F6: HEAD-domain rows accept immediately (skip F7-F9).
        head = pc.and_(keep, any_match(self.head_res))
        rest = pc.and_(keep, pc.invert(head))
        internal = pc.equal(batch.column("host"), self.start_host_port)
        # F7: filename-like internal paths.
        dot = pc.match_substring_regex(url, _DOT_IN_PATH_RE)
        rest = pc.and_(rest, pc.invert(pc.and_(internal, dot)))
        # F8/F9 live behind "internal with a querystring" — exact path.
        has_query = pc.match_substring(url, "?")
        complex_mask = pc.and_(rest, pc.and_(internal, has_query))
        vec_get = pc.and_(rest, pc.invert(complex_mask))

        parts = []
        n_head = pc.sum(head).as_py() or 0
        if n_head:
            parts.append(
                batch.filter(head).append_column(
                    "method", pa.array(["HEAD"] * n_head)
                )
            )
        n_get = pc.sum(vec_get).as_py() or 0
        if n_get:
            parts.append(
                batch.filter(vec_get).append_column(
                    "method", pa.array(["GET"] * n_get)
                )
            )
        if pc.sum(complex_mask).as_py():
            accepted = self.process_rows(batch.filter(complex_mask).to_pylist())
            if accepted:
                parts.append(pa.Table.from_pylist(accepted, schema=schema))
        if not parts:
            return schema.empty_table()
        return pa.concat_tables(
            [p.select(schema.names).cast(schema) for p in parts]
        )
