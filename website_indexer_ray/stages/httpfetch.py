"""Real-socket HTTP fetcher behind the FetchParseStage ``_fetch`` seam.

Reproduces the reference crawler's client behavior
(/root/reference/crawler/wpull/crawler.py:38-47): DNS/connect timeout
5 s, read timeout 30 s, session (whole-response) timeout 30 s, no
certificate verification (``--no-check-certificate``), user agent
"CFPB website indexer", and — critically — redirects are NOT followed
(3xx statuses are recorded with their Location and the follow decision
belongs to the expansion stage, plugin.py:219-245).

Built on ``http.client`` so the no-redirect, per-phase-timeout
semantics are explicit; one fetcher instance per fetch actor (created
once in ``FetchParseStage.__init__``), connections are per-request
(the politeness pacing between requests makes keep-alive moot).

``host_map`` is a test shim — {hostname: (scheme, addr, port)}
rewires where a hostname's socket actually connects (an /etc/hosts
stand-in) so e2e tests can serve "external" hosts from a local
server. The request line and Host header still carry the original
URL, so the server sees the real request.

Network-level failures (DNS, refused, TLS, any timeout) return
status 0 — the reference's network-error routing
(plugin.py:170-185).
"""

from __future__ import annotations

import ssl
import time
from http.client import HTTPConnection, HTTPSConnection
from urllib.parse import urljoin, urlsplit

DEFAULT_USER_AGENT = "CFPB website indexer"  # crawler.py:46


class HttpFetcher:
    def __init__(
        self,
        connect_timeout: float = 5.0,
        read_timeout: float = 30.0,
        session_timeout: float = 30.0,
        user_agent: str = DEFAULT_USER_AGENT,
        host_map: dict | None = None,
    ):
        self.connect_timeout = connect_timeout
        self.read_timeout = read_timeout
        self.session_timeout = session_timeout
        self.user_agent = user_agent
        self.host_map = {
            h: tuple(v) for h, v in (host_map or {}).items()
        }
        self._ssl_ctx = ssl._create_unverified_context()

    def fetch(
        self,
        url: str,
        method: str = "GET",
        body_prefixes: tuple = ("text/html",),
    ) -> tuple[int, str, str | None, str | None, int]:
        """(status, content_type, location, body, delay_ms).

        The body is decoded (header charset, utf-8 fallback) only for
        2xx responses whose Content-Type starts with one of
        ``body_prefixes`` and only for GET — HEAD never reads a body
        (plugin.py:121-126).
        """
        t0 = time.monotonic()
        try:
            parts = urlsplit(url)
            scheme = parts.scheme
            host = parts.hostname or ""
            port = parts.port
            if host in self.host_map:
                scheme, addr, aport = self.host_map[host]
            else:
                addr, aport = host, port or (443 if scheme == "https" else 80)
            if scheme == "https":
                conn = HTTPSConnection(
                    addr, aport, timeout=self.connect_timeout,
                    context=self._ssl_ctx,
                )
            else:
                conn = HTTPConnection(addr, aport, timeout=self.connect_timeout)
            path = parts.path or "/"
            if parts.query:
                path += "?" + parts.query
            try:
                conn.request(
                    method,
                    path,
                    headers={
                        "User-Agent": self.user_agent,
                        "Host": parts.netloc,
                        "Connection": "close",
                    },
                )
                if conn.sock is not None:
                    conn.sock.settimeout(self.read_timeout)
                resp = conn.getresponse()
                status = resp.status
                ctype = resp.getheader("Content-Type") or ""
                location = resp.getheader("Location")
                if location:
                    location = urljoin(url, location)
                body = None
                if (
                    method != "HEAD"
                    and 200 <= status < 300
                    and any(ctype.startswith(p) for p in body_prefixes)
                ):
                    chunks = []
                    # wpull --timeout semantics: the WHOLE response is
                    # bounded by session_timeout. read1 issues at most
                    # ONE socket recv per call (resp.read would loop
                    # recv until the full chunk arrives, letting a
                    # slow-drip server reset the timeout forever), so
                    # the deadline check runs between every recv, and
                    # each recv's socket timeout is capped at the
                    # remaining session budget.
                    deadline = t0 + self.session_timeout
                    while True:
                        remaining = deadline - time.monotonic()
                        if remaining <= 0:
                            raise TimeoutError("session timeout")
                        if conn.sock is not None:
                            conn.sock.settimeout(
                                min(self.read_timeout, remaining)
                            )
                        chunk = resp.read1(65536)
                        if not chunk:
                            break
                        chunks.append(chunk)
                    charset = "utf-8"
                    if "charset=" in ctype:
                        charset = (
                            ctype.split("charset=")[-1].split(";")[0].strip()
                            or "utf-8"
                        )
                    body = b"".join(chunks).decode(charset, errors="replace")
                return status, ctype, location, body, 0
            finally:
                conn.close()
        except Exception:
            return 0, "", None, None, 0
