"""Fetch + response-routing + parse stage — the engine's hot path.

An actor-pool ``map_batches`` stage (callable class ⇒ one instance per
actor; corpus broadcast, politeness state, robots cache and compiled
regexes are built ONCE in ``__init__``). Per accepted frontier row it
reproduces the reference's response handling
(/root/reference/crawler/wpull/plugin.py:170-281):

  status 0 / missing from corpus → Error(status_code=0)
    (plugin.py:170-185: network-level failure)
  3xx → Redirect record (plugin.py:219-245); the follow decision is
    made by the expansion stage from the recorded location
  ≥400 → Error record (plugin.py:246-254)
  200 external host → skipped, unrecorded (plugin.py:258-262)
  200 non-text/html → skipped (plugin.py:274-281)
  200 internal text/html → parse (functions/htmlparse, the reference's
    parser.py semantics); no title ⇒ skipped (parser.py:75-76) but
    frontier links still expand
  HEAD method → status only, never a body/parse (plugin.py:121-126)

"Fetching" at test/bench scale is a lookup into the broadcast
synthetic corpus (``ray.put`` once on the driver, ``ray.get`` once per
actor — zero per-batch re-shipping); a real-network fetcher drops in
behind the same ``_fetch`` seam.

Timestamps are a pure per-row function —
``epoch + generation s + (url_hash % 1e6) µs`` — so no global ordering
state is needed at any scale and the sequential oracle reproduces them
bit-for-bit.
"""

from __future__ import annotations

import time

import pyarrow as pa
import ray

from website_indexer_ray.config import CrawlConfig
from website_indexer_ray.functions.htmlparse import parse_page
from website_indexer_ray.functions.urls import hostname, hostname_with_port
from website_indexer_ray.schemas import RECORDS_SCHEMA
from website_indexer_ray.state.politeness import HostRateLimiter
from website_indexer_ray.state.robots import RobotsCache

EPOCH_US = 1_700_000_000 * 1_000_000


class CorpusIndex:
    """url → corpus row over a ZERO-COPY broadcast Arrow table.

    ``ray.put`` of a Python dict ships a pickle that every worker
    process re-deserializes in full — O(corpus bytes) per worker, paid
    inside the first timed fetch wave for any worker the warm pass
    missed. An Arrow table in the object store is memory-mapped
    zero-copy instead: the only per-worker cost is this index build
    (one ``to_pylist`` of the url column, ~10 ms at 50k rows); the
    HTML payload bytes stay in shared plasma memory and are
    materialized per-row at fetch time."""

    __slots__ = ("_idx", "_cols")

    def __init__(self, tbl: pa.Table):
        tbl = tbl.combine_chunks()
        self._idx = {u: i for i, u in enumerate(tbl.column("url").to_pylist())}
        self._cols = [
            tbl.column(c).chunk(0) if tbl.column(c).num_chunks else tbl.column(c)
            for c in ("status_code", "content_type", "location", "html", "fetch_delay_ms")
        ]

    def get(self, url: str):
        i = self._idx.get(url)
        if i is None:
            return None
        return tuple(col[i].as_py() for col in self._cols)

# Per-worker-process cache for the stateless task path: Ray reuses
# worker processes across tasks and jobs within a session, so the
# broadcast corpus is fetched+deserialized once per worker (actor-like
# amortization) while tasks keep the scheduler's instant, pool-free
# dispatch. Keyed by (object ref, config) so concurrent crawls don't
# cross-contaminate.
_TASK_STAGE_CACHE: dict = {}


def fetch_parse_task(
    batch: pa.Table,
    corpus_ref=None,
    cfg_json: str = "",
    budget_handle=None,
    robots_handle=None,
    shards=None,
) -> pa.Table:
    """Stateless map_batches task form of FetchParseStage — used when
    the stage holds no cross-batch state (no politeness wait, no
    robots cache, no shared host budget), where an actor pool's only
    contribution would be its multi-second per-generation spin-up.

    With ``budget_handle`` it also serves the salted-host path: the
    per-host rate state lives in the shared HostBudget actor, so the
    task itself is still stateless and cacheable."""
    import json

    key = (
        corpus_ref.hex() if hasattr(corpus_ref, "hex") else id(corpus_ref),
        cfg_json,
        budget_handle is not None,
        robots_handle is not None,
        tuple(str(s) for s in shards) if shards else None,
    )
    stage = _TASK_STAGE_CACHE.get(key)
    if stage is None:
        stage = FetchParseStage(
            corpus_ref, json.loads(cfg_json), budget_handle, robots_handle,
            shards=shards,
        )
        _TASK_STAGE_CACHE[key] = stage
    return stage(batch)


def record_timestamp_us(generation: int, url_hash: int) -> int:
    return EPOCH_US + generation * 1_000_000 + (url_hash % 1_000_000)


class FetchParseStage:
    def __init__(
        self,
        corpus_ref,
        cfg: dict,
        budget_handle=None,
        robots_handle=None,
        shards=None,
    ):
        self.cfg = CrawlConfig.from_dict(cfg) if isinstance(cfg, dict) else cfg
        if corpus_ref is None:
            # Real-network mode: the HttpFetcher drops in behind the
            # same _fetch seam (stages/httpfetch.py).
            from website_indexer_ray.stages.httpfetch import HttpFetcher

            self.corpus = None
            self.http = HttpFetcher(
                connect_timeout=self.cfg.connect_timeout,
                read_timeout=self.cfg.read_timeout,
                session_timeout=self.cfg.session_timeout,
                user_agent=self.cfg.user_agent,
                host_map=self.cfg.host_map,
            )
        else:
            corpus = (
                corpus_ref
                if isinstance(corpus_ref, (dict, pa.Table, CorpusIndex))
                else ray.get(corpus_ref)
            )
            if isinstance(corpus, pa.Table):
                corpus = CorpusIndex(corpus)
            # dict | CorpusIndex — both expose .get(url) → row tuple
            self.corpus = corpus
            self.http = None
        self.start_host_port = hostname_with_port(self.cfg.start_url)
        self.start_hostname = hostname(self.cfg.start_url)
        self.limiter = HostRateLimiter(
            wait=self.cfg.politeness_wait, random_wait=self.cfg.random_wait
        )
        self.budget = budget_handle  # shared HostBudget when salted
        self._delay_seen: set[str] = set()  # hosts whose Crawl-delay is pushed
        self.robots = (
            # robots_handle = cluster-shared RobotsStore actor: each
            # host's robots.txt is fetched ~once per cluster, not once
            # per fetch actor (north_star: robots caches as actor state)
            RobotsCache(self._fetch_robots_text, store=robots_handle)
            if self.cfg.respect_robots
            else None
        )
        # Fused frontier expansion (engine.py phase A folded into the
        # fetch): the parsed records' links are expanded, filtered
        # through the SAME predicate chain, and offered to the seen
        # shards while still in memory — the next generation never
        # re-reads this generation's checkpoint from storage. The
        # records checkpoint stays the durable source of truth, so a
        # resumed crawl re-derives offers from it via the unfused
        # phase-A path.
        self._shards = list(shards) if shards else None
        self._expand = self._pred = None
        if self._shards:
            from website_indexer_ray.stages.expand import ExpandStage
            from website_indexer_ray.stages.predicates import PredicateStage

            self._expand = ExpandStage(self.cfg)
            self._pred = PredicateStage(self.cfg)
            self._cand_rr = 0  # round-robin shard for count reports
        # Connection multiplexing: one pool per stage instance (per
        # actor / per cached task worker), threads live across batches.
        self._conn_pool = None
        if self.cfg.fetch_threads > 1:
            from concurrent.futures import ThreadPoolExecutor

            self._conn_pool = ThreadPoolExecutor(
                max_workers=self.cfg.fetch_threads,
                thread_name_prefix="fetch-conn",
            )

    # --- fetch seam -------------------------------------------------
    def _fetch(self, url: str, method: str) -> tuple[int, str, str | None, str | None, int]:
        """(status, content_type, location, html, delay_ms); a miss is
        a network-level failure (status 0, plugin.py:176-183)."""
        if self.http is not None:
            return self.http.fetch(url, method)
        row = self.corpus.get(url)
        if row is None:
            return 0, "", None, None, 0
        status, ctype, location, html, delay = row
        if method == "HEAD":
            html = None
        return status, ctype, location, html, delay

    def _fetch_robots_text(self, robots_url: str) -> str | None:
        if self.http is not None:
            status, _ct, _loc, body, _d = self.http.fetch(
                robots_url, "GET", body_prefixes=("",)
            )
            return body if status == 200 else None
        row = self.corpus.get(robots_url)
        if row is None or row[0] != 200:
            return None
        return row[3]

    # --- per-batch --------------------------------------------------
    def __call__(self, batch: pa.Table) -> pa.Table:
        rows = batch.to_pylist()
        # Robots verdicts first: excluded rows never reach the fetch,
        # so they must not consume politeness slots — reserving for
        # them would advance the host's next_ok by wait×n and
        # permanently over-throttle hosts with many excluded URLs.
        allowed = [
            self.robots is None or self.robots.allowed(r["url"]) for r in rows
        ]
        if self.robots is not None:
            # Honor robots Crawl-delay: once per host per actor, push
            # the override into the local limiter and (salted path) the
            # shared HostBudget — actor tasks from one caller run FIFO,
            # so the override lands before this batch's reserve_n.
            # Effective wait = max(configured, Crawl-delay): a site's
            # stricter request tightens, never loosens.
            for r, ok in zip(rows, allowed):
                h = r["host"]
                if not ok or h in self._delay_seen:
                    continue
                self._delay_seen.add(h)
                d = self.robots.crawl_delay(r["url"])
                if d and d > 0:
                    self.limiter.set_host_wait(h, d)
                    if self.budget is not None:
                        self.budget.set_host_wait.remote(h, d)
        if self.budget is not None and rows:
            # One reserve_n RPC per (host, batch) instead of a blocking
            # actor round-trip per row; slots are wall-clock targets
            # relative to the reservation time.
            from collections import Counter

            counts = Counter(
                r["host"] for r, ok in zip(rows, allowed) if ok
            )
            futs = {
                h: self.budget.reserve_n.remote(h, c) for h, c in counts.items()
            }
            t0 = time.monotonic()
            self._slot_t0 = t0
            self._slots = {h: iter(ray.get(f)) for h, f in futs.items()}
        # Each connection thread carries whole rows independently;
        # executor.map preserves row order, and record contents are
        # pure per-row functions (synthetic timestamps, no shared
        # mutable state), so the output table is bit-identical to the
        # sequential loop. Network waits (or their simulated stand-in)
        # overlap across the pool; parse work stays GIL-serialized and
        # is what the slot's CPU reservation pays for.
        if self._conn_pool is not None and len(rows) > 1:
            out = list(
                self._conn_pool.map(
                    lambda pair: self._process(pair[0], robots_allowed=pair[1]),
                    zip(rows, allowed),
                )
            )
        else:
            out = [
                self._process(row, robots_allowed=ok)
                for row, ok in zip(rows, allowed)
            ]
        if self._shards is not None and out:
            self._offer_expansion(out)
        if not out:
            return RECORDS_SCHEMA.empty_table()
        return pa.Table.from_pylist(out, schema=RECORDS_SCHEMA)

    def _offer_expansion(self, records: list[dict]) -> None:
        """Fused phase A: expand this batch's records into next-
        generation candidates, count them pre-predicate (the lineage
        n_candidates definition), filter through the predicate chain,
        and offer the survivors to the seen shards. Identical
        candidate set and winner resolution as the checkpoint-reading
        phase A: expand/predicate are pure functions of record fields
        that round-trip parquet exactly, and the shards' min-key
        winner is offer-order-independent."""
        from collections import Counter

        from website_indexer_ray.schemas import FRONTIER_SCHEMA
        from website_indexer_ray.state import seen as seen_state

        candidates = self._expand.expand_rows(records)
        if not candidates:
            return
        counts = dict(Counter(r.get("seed_batch", 0) or 0 for r in candidates))
        shard = self._shards[self._cand_rr % len(self._shards)]
        self._cand_rr += 1
        count_fut = shard.add_cand_counts.remote(counts)
        acc = self._pred(pa.Table.from_pylist(candidates, schema=FRONTIER_SCHEMA))
        if acc.num_rows:
            seen_state.offer_batch(self._shards, acc)
        # Block until the count lands: the engine drains counts right
        # after the generation's write barrier, so an in-flight RPC
        # here would race the lineage read.
        ray.get(count_fut)

    def _process(self, row: dict, robots_allowed: bool = True) -> dict:
        url = row["url"]
        host = row["host"]
        method = row.get("method") or "GET"
        referrer = row["parent_url"] or None

        rec = {
            "record_type": "skipped",
            "url": url,
            "url_hash": row["url_hash"],
            "host": host,
            "generation": row["generation"],
            "depth": row["depth"],
            "seed_batch": row.get("seed_batch", 0) or 0,
            "timestamp": record_timestamp_us(row["generation"], row["url_hash"]),
            "status_code": 0,
            "referrer": referrer,
            "location": None,
            "method": method,
            "title": None,
            "language": None,
            "html": None,
            "text": None,
            "components": None,
            "links": None,
            "media": None,
            "frontier_links": None,
        }

        if not robots_allowed:
            rec["record_type"] = "robots_excluded"
            return rec

        if self.budget is not None:
            target = self._slot_t0 + next(self._slots[host])
            wait = target - time.monotonic()
            if wait > 0:
                time.sleep(wait)
        else:
            self.limiter.acquire(host)

        status, ctype, location, html, delay_ms = self._fetch(url, method)
        if self.cfg.simulate_latency and delay_ms:
            time.sleep(delay_ms / 1000.0)
        rec["status_code"] = status

        if status == 0:
            rec["record_type"] = "error"
            return rec

        if status >= 300:
            if status < 400:
                rec["record_type"] = "redirect"
                rec["location"] = location
            else:
                rec["record_type"] = "error"
            return rec

        # 200-class.
        if hostname_with_port(url) != self.start_host_port:
            return rec  # external success: unrecorded by the reference

        if not (ctype or "").startswith("text/html") or html is None:
            return rec

        parsed = parse_page(html, self.start_hostname)
        rec["frontier_links"] = parsed.frontier_links
        if parsed.title is None:
            return rec  # titleless: not indexed, still expands

        rec["record_type"] = "page"
        rec["title"] = parsed.title
        rec["language"] = parsed.language
        rec["html"] = html
        rec["text"] = parsed.text
        rec["components"] = parsed.components
        rec["links"] = parsed.links
        rec["media"] = parsed.media
        return rec
