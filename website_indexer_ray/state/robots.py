"""robots.txt cache (north_rule component).

The reference disables robots handling outright (``--no-robots``,
/root/reference/crawler/wpull/crawler.py:35), so the engine's default
``respect_robots=False`` reproduces reference semantics exactly. When
enabled, each fetcher actor keeps a per-host parsed-robots cache; the
robots body comes through the same fetch path as everything else
(``https://<host>/robots.txt`` looked up in the corpus / fetched).
"""

from __future__ import annotations

from urllib import robotparser
from urllib.parse import urlsplit

import ray


@ray.remote(num_cpus=0)
class RobotsStore:
    """Cluster-shared robots.txt body cache (north_star: "robots.txt
    caches as actor state"). Without it every fetch actor fetches each
    host's robots.txt independently — at 10⁶ hosts × hundreds of
    fetchers that is hundreds of duplicate robots requests per host.
    The store holds bodies (None = unavailable ⇒ allow-all); parsing
    stays local to each fetcher's RobotsCache (parsers aren't worth an
    RPC). Two racing fetchers may both fetch once — first write wins,
    which is harmless (same body)."""

    def __init__(self):
        self.bodies: dict[str, str | None] = {}

    def lookup(self, origin: str) -> tuple[bool, str | None]:
        if origin in self.bodies:
            return True, self.bodies[origin]
        return False, None

    def store(self, origin: str, body: str | None) -> None:
        self.bodies.setdefault(origin, body)


class RobotsCache:
    def __init__(
        self,
        fetch_text,
        user_agent: str = "website-indexer-ray",
        store=None,
    ):
        """``fetch_text(url) -> str | None`` returns the robots.txt body
        or None when unavailable (unavailable ⇒ allow all, the
        conventional default). ``store`` is an optional shared
        RobotsStore actor handle: bodies are looked up there before
        fetching and published there after, so a cluster fetches each
        host's robots.txt approximately once."""
        self.fetch_text = fetch_text
        self.user_agent = user_agent
        self.store = store
        self.cache: dict[str, robotparser.RobotFileParser | None] = {}

    def _fetch_body(self, origin: str) -> str | None:
        if self.store is not None:
            known, body = ray.get(self.store.lookup.remote(origin))
            if known:
                return body
        body = self.fetch_text(f"{origin}/robots.txt")
        if self.store is not None:
            self.store.store.remote(origin, body)
        return body

    def _parser_for(self, url: str) -> robotparser.RobotFileParser | None:
        parts = urlsplit(url)
        key = f"{parts.scheme}://{parts.netloc}"
        if key not in self.cache:
            body = self._fetch_body(key)
            if body is None:
                self.cache[key] = None
            else:
                rp = robotparser.RobotFileParser()
                rp.parse(body.splitlines())
                self.cache[key] = rp
        return self.cache[key]

    def allowed(self, url: str) -> bool:
        rp = self._parser_for(url)
        if rp is None:
            return True
        return rp.can_fetch(self.user_agent, url)

    def crawl_delay(self, url: str) -> float | None:
        """The host's robots Crawl-delay for our agent (None when the
        robots body is absent or sets none) — fetchers feed this into
        the per-host politeness override so a site's own stricter
        request tightens (never loosens) the configured wait."""
        rp = self._parser_for(url)
        if rp is None:
            return None
        d = rp.crawl_delay(self.user_agent)
        return float(d) if d is not None else None
