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


class RobotsCache:
    def __init__(self, fetch_text, user_agent: str = "website-indexer-ray"):
        """``fetch_text(url) -> str | None`` returns the robots.txt body
        or None when unavailable (unavailable ⇒ allow all, the
        conventional default)."""
        self.fetch_text = fetch_text
        self.user_agent = user_agent
        self.cache: dict[str, robotparser.RobotFileParser | None] = {}

    def _parser_for(self, url: str) -> robotparser.RobotFileParser | None:
        parts = urlsplit(url)
        key = f"{parts.scheme}://{parts.netloc}"
        if key not in self.cache:
            body = self.fetch_text(f"{key}/robots.txt")
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
