"""URL canonicalization and host helpers.

The reference relies on wpull's URL normalization (resolve relative
hrefs, strip fragments) plus ``urllib.parse`` inspection inside its
plugin (/root/reference/crawler/wpull/plugin.py:129-162,236-242). We
make canonicalization an explicit, testable function applied before
hashing (xxh64) and cuckoo-filter membership.

Two profiles:

- ``reference`` (default): matches the reference's effective behavior —
  resolve against the parent URL, strip the fragment, lowercase scheme
  and host, drop default ports. The URL-seen set produced under this
  profile is what the sequential oracle reproduces.
- ``aggressive``: additionally strips tracking query params
  (utm_*, fbclid, gclid, mc_cid, mc_eid), sorts remaining query params,
  and normalizes a trailing slash onto bare directory-like paths. For
  production-scale crawls where near-identical URLs explode the
  frontier; NOT used when reproducing reference semantics.
"""

from __future__ import annotations

import re
from functools import lru_cache
from urllib.parse import parse_qsl, urlencode, urljoin, urlsplit, urlunsplit

from website_indexer_ray.functions.xxh import xxh64

_DEFAULT_PORTS = {"http": 80, "https": 443}
_TRACKING_RE = re.compile(r"^(utm_|fbclid$|gclid$|mc_cid$|mc_eid$)")


@lru_cache(maxsize=1 << 16)
def canonicalize(
    url: str,
    base: str | None = None,
    profile: str = "reference",
) -> str | None:
    """Canonical form of ``url`` (optionally resolved against ``base``).

    Returns None for non-http(s) or unparseable URLs (mailto:,
    javascript:, tel:, malformed) — those never enter the frontier.

    Memoized (pure function): the same hrefs — nav bars, footers,
    listing links — recur across thousands of pages within a worker,
    so the per-process cache turns repeat canonicalizations into dict
    hits.
    """
    if base:
        try:
            url = urljoin(base, url)
        except ValueError:
            return None
    try:
        parts = urlsplit(url)
    except ValueError:
        return None

    scheme = parts.scheme.lower()
    if scheme not in ("http", "https"):
        return None

    host = (parts.hostname or "").lower()
    if not host:
        return None
    try:
        port = parts.port
    except ValueError:
        return None
    netloc = host if (port is None or port == _DEFAULT_PORTS.get(scheme)) else f"{host}:{port}"

    path = parts.path or "/"
    query = parts.query

    if profile == "aggressive":
        if query:
            kept = [(k, v) for k, v in parse_qsl(query, keep_blank_values=True) if not _TRACKING_RE.match(k)]
            kept.sort()
            query = urlencode(kept)
        if "." not in path.rsplit("/", 1)[-1] and not path.endswith("/"):
            path = path + "/"

    return urlunsplit((scheme, netloc, path, query, ""))


@lru_cache(maxsize=1 << 16)
def url_hash(url: str) -> int:
    """Stable unsigned 64-bit hash of a canonical URL (xxh64, memoized
    — the pure-python reference implementation costs ~5us/URL and hot
    URLs repeat heavily within a worker)."""
    return xxh64(url)


@lru_cache(maxsize=1 << 16)
def hostname_with_port(url: str) -> str:
    """Host[:explicit-port] — mirrors wpull URLInfo.hostname_with_port
    equality checks in the reference plugin (plugin.py:115-119,129,260)."""
    parts = urlsplit(url)
    host = (parts.hostname or "").lower()
    try:
        port = parts.port
    except ValueError:
        port = None
    if port is None or port == _DEFAULT_PORTS.get(parts.scheme.lower()):
        return host
    return f"{host}:{port}"


def hostname(url: str) -> str:
    try:
        return (urlsplit(url).hostname or "").lower()
    except ValueError:
        return ""


def explicit_port(url: str) -> int | None:
    """Explicit port in the URL text, None when absent (plugin.py:241)."""
    try:
        return urlsplit(url).port
    except ValueError:
        return None
