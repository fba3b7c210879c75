"""Real-socket crawl e2e: serve the reference's sample site
(/root/reference/sample/src) over a local HTTP server and check the
crawl reproduces the reference's recorded sample crawl
(sample/sample.sqlite3): 3 pages, 1 error (the external
https://example.com/file.xlsx 404), 1 component, 9 distinct links.

External hosts (example.com / example.org) are rewired to the same
local server via the HttpFetcher host_map shim (an /etc/hosts
stand-in) — sockets, request lines and response parsing are all real.
"""

from __future__ import annotations

import functools
import http.server
import os
import threading

import pyarrow as pa
import pyarrow.compute as pc
import pytest

from website_indexer_ray.config import CrawlConfig
from website_indexer_ray.pipelines import query
from website_indexer_ray.pipelines.engine import CrawlEngine, CrawlResult
from website_indexer_ray.schemas import SEEDS_SCHEMA
from website_indexer_ray.stages.httpfetch import HttpFetcher

SAMPLE_SRC = "/root/reference/sample/src"

pytestmark = pytest.mark.skipif(
    not os.path.isdir(SAMPLE_SRC), reason="reference sample site not present"
)


@pytest.fixture(scope="module")
def server():
    handler = functools.partial(
        http.server.SimpleHTTPRequestHandler, directory=SAMPLE_SRC
    )
    httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"127.0.0.1:{httpd.server_address[1]}", httpd.server_address[1]
    httpd.shutdown()


class TestHttpFetcher:
    def test_basic_get(self, server):
        host, port = server
        f = HttpFetcher()
        status, ctype, loc, body, _ = f.fetch(f"http://{host}/", "GET")
        assert status == 200
        assert ctype.startswith("text/html")
        assert "Sample homepage" in body

    def test_head_reads_no_body(self, server):
        host, _ = server
        status, ctype, _loc, body, _ = f"http://{host}/child/", None, None, None, None
        f = HttpFetcher()
        status, ctype, _loc, body, _ = f.fetch(f"http://{host}/child/", "HEAD")
        assert status == 200
        assert body is None

    def test_redirect_not_followed(self, server):
        host, _ = server
        # SimpleHTTPRequestHandler 301-redirects a directory URL
        # missing its trailing slash.
        f = HttpFetcher()
        status, _ctype, loc, body, _ = f.fetch(f"http://{host}/child", "GET")
        assert status == 301
        assert loc.endswith("/child/")
        assert body is None

    def test_404(self, server):
        host, _ = server
        f = HttpFetcher()
        status, *_ = f.fetch(f"http://{host}/nope/", "GET")
        assert status == 404

    def test_network_failure_is_status_0(self):
        f = HttpFetcher(connect_timeout=0.5)
        # RFC 2606 .invalid TLD: DNS resolution fails.
        status, ctype, loc, body, _ = f.fetch(
            "http://no-such-host.invalid/", "GET"
        )
        assert (status, ctype, loc, body) == (0, "", None, None)

    def test_slow_drip_bounded_by_session_timeout(self):
        """A server dribbling bytes faster than read_timeout but
        forever must be cut off at session_timeout (wpull --timeout
        whole-response semantics), not extended per chunk."""
        import socket
        import time

        srv = socket.socket()
        srv.bind(("127.0.0.1", 0))
        srv.listen(1)
        port = srv.getsockname()[1]
        stop = threading.Event()

        def drip():
            conn, _ = srv.accept()
            conn.recv(65536)
            conn.sendall(
                b"HTTP/1.1 200 OK\r\nContent-Type: text/html\r\n"
                b"Content-Length: 1000000\r\n\r\n"
            )
            while not stop.is_set():
                try:
                    conn.sendall(b"x")
                except OSError:
                    break
                time.sleep(0.2)
            conn.close()

        t = threading.Thread(target=drip, daemon=True)
        t.start()
        try:
            f = HttpFetcher(read_timeout=30.0, session_timeout=1.0)
            t0 = time.monotonic()
            status, _ct, _loc, body, _d = f.fetch(
                f"http://127.0.0.1:{port}/slow", "GET"
            )
            elapsed = time.monotonic() - t0
            assert status == 0  # recorded as a network-level failure
            assert elapsed < 5.0, f"slow-drip ran {elapsed:.1f}s"
        finally:
            stop.set()
            srv.close()

    def test_host_map_rewires_socket(self, server):
        _, port = server
        f = HttpFetcher(host_map={"example.com": ("http", "127.0.0.1", port)})
        status, ctype, *_ = f.fetch("https://example.com/", "GET")
        assert status == 200
        assert ctype.startswith("text/html")


class TestSampleSiteCrawl:
    @pytest.fixture(scope="class")
    def result(self, server, tmp_path_factory):
        host, port = server
        start = f"http://{host}/"
        cfg = CrawlConfig(
            start_url=start,
            n_seen_shards=2,
            fetch_concurrency=2,
            host_map={
                "example.com": ("http", "127.0.0.1", port),
                "example.org": ("http", "127.0.0.1", port),
            },
        )
        seeds = pa.Table.from_pylist(
            [{"url": start, "seed_batch": 0}], schema=SEEDS_SCHEMA
        )
        out = str(tmp_path_factory.mktemp("httpcrawl"))
        return CrawlEngine(cfg, out, crawl_id="http-e2e").run(None, seeds), start

    def test_pages_match_reference_sample_crawl(self, result):
        res, start = result
        pages = query.search_pages(res.records_table())
        assert pages.column("url").to_pylist() == [
            start,
            f"{start}child/",
            f"{start}child/?page=2",
        ]
        assert set(pages.column("title").to_pylist()) == {
            "Sample homepage",
            "Sample child page",
        }
        assert set(pages.column("language").to_pylist()) == {"en"}

    def test_single_external_404_error(self, result):
        res, _ = result
        errors = query.list_errors(res.records_table())
        assert errors.num_rows == 1
        assert errors.column("url").to_pylist() == ["https://example.com/file.xlsx"]
        assert errors.column("status_code").to_pylist() == [404]

    def test_component_and_link_dimensions(self, result):
        res, _ = result
        comps = query.list_components(res.records_table())
        assert comps.column("class_name").to_pylist() == ["o-sample"]
        links = query.list_links(res.records_table())
        assert sorted(links.column("href").to_pylist()) == sorted(
            [
                "./file.xlsx",
                "/child/",
                "/child/?foo=bar",
                "/child/?page=2",
                "/child/?page=2&foo=bar",
                "https://example.com/",
                "https://example.com/file.xlsx",
                "https://example.org/",
                "/",
            ]
        )

    def test_no_redirects_recorded(self, result):
        res, _ = result
        assert query.list_redirects(res.records_table()).num_rows == 0


class TestHttpRobots:
    """ST3 over the real fetcher: robots.txt fetched through the same
    HTTP path, per-host cache, disallowed URLs recorded as
    robots_excluded and never fetched."""

    @pytest.fixture(scope="class")
    def robots_site(self, tmp_path_factory):
        import shutil

        root = tmp_path_factory.mktemp("robots_site")
        shutil.copytree(SAMPLE_SRC, root / "src", dirs_exist_ok=True)
        (root / "src" / "robots.txt").write_text(
            "User-agent: *\nDisallow: /child/\n"
        )
        handler = functools.partial(
            http.server.SimpleHTTPRequestHandler, directory=str(root / "src")
        )
        httpd = http.server.ThreadingHTTPServer(("127.0.0.1", 0), handler)
        t = threading.Thread(target=httpd.serve_forever, daemon=True)
        t.start()
        yield f"127.0.0.1:{httpd.server_address[1]}", httpd.server_address[1]
        httpd.shutdown()

    def test_robots_excludes_child(self, ray_session, robots_site, tmp_path):
        host, port = robots_site
        start = f"http://{host}/"
        cfg = CrawlConfig(
            start_url=start,
            n_seen_shards=2,
            fetch_concurrency=2,
            respect_robots=True,
            host_map={
                "example.com": ("http", "127.0.0.1", port),
                "example.org": ("http", "127.0.0.1", port),
            },
        )
        seeds = pa.Table.from_pylist(
            [{"url": start, "seed_batch": 0}], schema=SEEDS_SCHEMA
        )
        res = CrawlEngine(cfg, str(tmp_path / "robots_crawl")).run(None, seeds)
        records = res.records_table()
        pages = query.search_pages(records)
        assert pages.column("url").to_pylist() == [start]
        excluded = records.filter(
            pc.equal(records.column("record_type"), "robots_excluded")
        )
        assert f"{start}child/" in excluded.column("url").to_pylist()


class TestCliNetworkCrawl:
    """The full user storyline the reference supports, via the CLI
    with no corpus: real-network crawl of the sample site, then the
    query surface over the checkpoint."""

    def test_crawl_then_query(self, ray_session, server, tmp_path, capsys):
        import json

        from website_indexer_ray.__main__ import main

        host, port = server
        out = str(tmp_path / "cli_net_crawl")
        rc = main(
            [
                "crawl",
                "--start-url", f"http://{host}/",
                "--out", out,
                "--politeness-wait", "0",
                "--no-random-wait",
            ]
        )
        assert rc == 0
        summary = json.loads(capsys.readouterr().out.strip().splitlines()[-1])
        assert summary["status"] == "Finished"
        assert summary["pages"] == 3
        # external example.com/example.org are unreachable here (no
        # host_map through the CLI): network-level status-0 errors are
        # recorded, never fail the run (plugin.py:283-304 semantics).
        assert summary["errors"] >= 1

        rc = main(["query", "--out", out, "--search-type", "title",
                   "--q", "Sample"])
        assert rc == 0
        page = json.loads(capsys.readouterr().out)
        assert page["count"] == 3


class TestNetworkCrawlResume:
    """Lossless resume over the real fetcher: a crawl capped at one
    generation resumes to the same final tables as an uninterrupted
    network crawl."""

    def test_partial_then_resume(self, ray_session, server, tmp_path):
        host, port = server
        start = f"http://{host}/"
        host_map = {
            "example.com": ("http", "127.0.0.1", port),
            "example.org": ("http", "127.0.0.1", port),
        }
        seeds = pa.Table.from_pylist(
            [{"url": start, "seed_batch": 0}], schema=SEEDS_SCHEMA
        )

        full_cfg = CrawlConfig(
            start_url=start, n_seen_shards=2, fetch_concurrency=2,
            host_map=host_map,
        )
        full = CrawlEngine(full_cfg, str(tmp_path / "net_full")).run(None, seeds)

        part_cfg = CrawlConfig(
            start_url=start, n_seen_shards=2, fetch_concurrency=2,
            host_map=host_map, max_generations=1,
        )
        out = str(tmp_path / "net_resume")
        CrawlEngine(part_cfg, out).run(None, seeds)
        partial_pages = query.search_pages(CrawlResult(out).records_table())
        assert partial_pages.num_rows < 3  # genuinely interrupted

        resumed = CrawlEngine(full_cfg, out).run(None, seeds, resume=True)
        key = lambda t: sorted(t.to_pylist(), key=lambda r: r["url"])
        assert key(resumed.records_table()) == key(full.records_table())
        assert resumed.seen_table().equals(full.seen_table())
