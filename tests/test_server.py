"""Viewer HTTP server tests — the reference viewer's endpoint surface
(viewer/urls.py:6-13) exercised over real sockets against a crawl of
the synthetic sample site (mirrors viewer/tests/test_views.py
assertions: counts, pagination shape, CSV BOM/headers/filename, 404
detail payloads)."""

from __future__ import annotations

import json
import threading
import urllib.request

import pytest

from website_indexer_ray.config import CrawlConfig
from website_indexer_ray.fixtures.gen import SAMPLE_START_URL, sample_site_corpus
from website_indexer_ray.pipelines.engine import CrawlEngine
from website_indexer_ray.server import make_server


@pytest.fixture(scope="module")
def base_url(ray_session, tmp_path_factory):
    corpus, seeds = sample_site_corpus()
    cfg = CrawlConfig(
        start_url=SAMPLE_START_URL, n_seen_shards=2, fetch_concurrency=2
    )
    out = str(tmp_path_factory.mktemp("server_crawl"))
    CrawlEngine(cfg, out).run(corpus, seeds)
    httpd = make_server(out, port=0)
    t = threading.Thread(target=httpd.serve_forever, daemon=True)
    t.start()
    yield f"http://127.0.0.1:{httpd.server_address[1]}"
    httpd.shutdown()


def get(url: str):
    try:
        with urllib.request.urlopen(url) as resp:
            return resp.status, dict(resp.headers), resp.read()
    except urllib.error.HTTPError as e:
        return e.code, dict(e.headers), e.read()


class TestPages:
    def test_index_lists_all_pages(self, base_url):
        status, _h, body = get(f"{base_url}/")
        assert status == 200
        page = json.loads(body)
        assert page["count"] == 3
        assert [r["url"] for r in page["results"]] == [
            "http://localhost:8000/",
            "http://localhost:8000/child/",
            "http://localhost:8000/child/?page=2",
        ]
        assert "indexed page" in page["results_summary"]

    def test_title_search(self, base_url):
        _s, _h, body = get(f"{base_url}/?search_type=title&q=child")
        page = json.loads(body)
        assert page["count"] == 2
        assert page["results_summary"] == '2 pages with "child" in the page title'

    def test_csv_has_bom_header_and_filename(self, base_url):
        _s, headers, body = get(f"{base_url}/?format=csv")
        assert body.startswith(b"\xef\xbb\xbf")
        assert body[3:].split(b"\r\n")[0] == b"url,title,language"
        assert headers["Content-Disposition"].startswith(
            "attachment; filename=pages-"
        )
        assert headers["Content-Disposition"].endswith(".csv")

    def test_components_csv_variant(self, base_url):
        _s, _h, body = get(f"{base_url}/?search_type=components&q=o-&format=csv")
        assert b"class_name" in body.split(b"\r\n")[0]

    def test_page_detail_and_404(self, base_url):
        _s, _h, body = get(f"{base_url}/page/?url=http://localhost:8000/")
        row = json.loads(body)
        assert row["title"] == "Sample homepage"
        assert row["components"] == ["o-sample"]
        status, _h, body = get(f"{base_url}/page/?url=http://nope/")
        assert status == 404
        assert json.loads(body) == {"detail": "Not found."}


class TestDimensionsAndStats:
    def test_components_unpaginated(self, base_url):
        _s, _h, body = get(f"{base_url}/components/")
        data = json.loads(body)
        assert data["results"] == [{"class_name": "o-sample"}]

    def test_errors_with_status_filter(self, base_url):
        _s, _h, body = get(f"{base_url}/errors/")
        all_errors = json.loads(body)["count"]
        _s, _h, body = get(f"{base_url}/errors/?status_code=404")
        assert json.loads(body)["count"] <= all_errors

    def test_redirects_endpoint(self, base_url):
        status, _h, body = get(f"{base_url}/redirects/")
        assert status == 200
        assert "results" in json.loads(body)

    def test_status_and_help(self, base_url):
        _s, _h, body = get(f"{base_url}/status/")
        stats = json.loads(body)
        assert stats["count"] == 3
        status, _h, body = get(f"{base_url}/help/")
        assert status == 200
        assert b"viewer API" in body

    def test_unknown_route_404(self, base_url):
        status, _h, body = get(f"{base_url}/nope/")
        assert status == 404


class TestHTMLRendering:
    """AlsoRenderHTMLMixin equivalents (views.py:33-36): pages,
    page detail, and components render HTML; errors/redirects stay
    JSON/CSV-only like the reference."""

    def test_search_page_html(self, base_url):
        status, headers, body = get(f"{base_url}/?format=html")
        assert status == 200
        assert headers["Content-Type"].startswith("text/html")
        text = body.decode()
        assert "Showing all 3 indexed pages" in text
        assert "Download search results" in text
        assert 'name="q"' in text  # the search form
        assert "http://localhost:8000/child/" in text

    def test_base_shell_structure(self, base_url):
        """The shell mirrors base.html's landmarks (skip-nav, grid
        main, footer — the exact elements the reference parser strips,
        parser.py:133-151) and links a served stylesheet."""
        _s, _h, body = get(f"{base_url}/?format=html")
        text = body.decode()
        for marker in (
            'class="skip-nav"',
            'class="u-layout-grid" id="main"',
            'class="o-footer"',
            "/static/css/main.css",
        ):
            assert marker in text, marker
        status, headers, css = get(f"{base_url}/static/css/main.css")
        assert status == 200
        assert headers["Content-Type"].startswith("text/css")
        assert b".skip-nav__link" in css

    def test_static_js_bundle(self, base_url):
        """The served main.js reproduces the reference bundle's two
        behaviors (viewer/static_src/js/main.js): swap the no-js
        marker class and initialise every o-expandable. The shell
        carries class="no-js" on <html> (base.html:5) and loads the
        script at the end of <body> (base.html:50)."""
        _s, _h, body = get(f"{base_url}/?format=html")
        text = body.decode()
        assert '<html lang="en" class="no-js">' in text
        assert '<script src="/static/js/main.js"></script></body>' in text
        status, headers, js = get(f"{base_url}/static/js/main.js")
        assert status == 200
        assert headers["Content-Type"].startswith("text/javascript")
        js = js.decode()
        assert "no-js" in js  # strips the marker class
        assert "o-expandable--open" in js  # toggles the open modifier
        assert "aria-expanded" in js  # keeps the button state accessible
        assert "o-expandable--onload-open" in js  # sections can start open

    @pytest.mark.skipif(
        __import__("shutil").which("node") is None,
        reason="node unavailable for executing the served bundle",
    )
    def test_static_js_executes(self, base_url, tmp_path):
        """Execute the served bundle under a minimal DOM shim (node):
        the no-js class is swapped for js, --onload-open sections start
        open with aria-expanded=true, and a header click toggles both
        the modifier and the aria state — the observable contract of
        the reference's Expandable.init() (viewer/static_src/js/main.js)."""
        import subprocess

        _s, _h, js = get(f"{base_url}/static/js/main.js")
        bundle = tmp_path / "main.js"
        bundle.write_bytes(js)
        harness = tmp_path / "check.js"
        harness.write_text(_JS_DOM_HARNESS.replace("__BUNDLE__", str(bundle)))
        out = subprocess.run(
            ["node", str(harness)], capture_output=True, text=True, timeout=30
        )
        assert out.returncode == 0, out.stderr
        first, second, third = (json.loads(l) for l in out.stdout.splitlines())
        assert first == {
            "rootClass": "js",
            "onloadOpen": True,
            "onloadAria": "true",
            "closedStart": False,
            "closedAria": "false",
        }
        assert second == {"afterClickOpen": True, "afterClickAria": "true"}
        assert third == {"afterSecondClick": False}

    def test_page_detail_expandables(self, base_url):
        """Detail sections are o-expandables; the section matching the
        incoming search_type starts open (page_detail.html:19,44,69)."""
        url = "http://localhost:8000/"
        _s, _h, body = get(f"{base_url}/page/?url={url}&format=html")
        text = body.decode()
        assert text.count('class="o-expandable ') == 3
        assert "o-expandable--onload-open" not in text  # no search_type
        _s, _h, body = get(
            f"{base_url}/page/?url={url}&format=html&search_type=links"
        )
        text = body.decode()
        # exactly the Links section carries the onload-open modifier
        assert text.count("o-expandable--onload-open") == 1
        open_start = text.index("o-expandable--onload-open")
        assert "Links" in text[open_start : open_start + 400]

    def test_page_detail_breadcrumbs_and_title(self, base_url):
        _s, _h, body = get(
            f"{base_url}/page/?url=http://localhost:8000/&format=html"
        )
        text = body.decode()
        assert 'class="m-breadcrumbs"' in text  # detail pages get crumbs
        assert "<title>Sample homepage" in text
        # the list view has no breadcrumbs (matches the reference:
        # page_list.html renders none)
        _s, _h, body = get(f"{base_url}/?format=html")
        assert 'class="m-breadcrumbs"' not in body.decode()

    def test_search_summary_wording_html(self, base_url):
        _s, _h, body = get(f"{base_url}/?search_type=title&q=child&format=html")
        assert '2 pages with &quot;child&quot; in the page title' in body.decode()

    def test_accept_header_negotiation(self, base_url):
        import urllib.request

        req = urllib.request.Request(
            f"{base_url}/", headers={"Accept": "text/html,application/xhtml+xml"}
        )
        with urllib.request.urlopen(req) as resp:
            assert resp.headers["Content-Type"].startswith("text/html")

    def test_page_detail_html(self, base_url):
        _s, _h, body = get(
            f"{base_url}/page/?url=http://localhost:8000/&format=html"
        )
        text = body.decode()
        assert "<h1>Sample homepage</h1>" in text
        assert "o-sample" in text

    def test_components_html(self, base_url):
        _s, _h, body = get(f"{base_url}/components/?format=html")
        assert "search_type=components&q=o-sample" in body.decode()

    def test_errors_stay_json(self, base_url):
        _s, headers, _b = get(f"{base_url}/errors/?format=html")
        # reference Error/RedirectListView have no HTML renderer
        assert headers["Content-Type"].startswith("application/json")

    def test_pagination_links_preserve_search(self, base_url):
        """A >25-result search would page; nav links must carry the
        active search params. The sample crawl has 3 pages so force a
        tiny window through the paginate API shape instead: just
        assert the renderer embeds search params when pages > 1."""
        from website_indexer_ray.server import ViewerHandler

        html = ViewerHandler._render_search(
            None,  # self unused by the nav-building path under test? no - it is
            {"count": 60, "num_pages": 3, "page_number": 2,
             "results": [], "results_summary": "x"},
            "title", "child",
        )
        assert "search_type=title" in html and "q=child" in html
        assert "page=1" in html and "page=3" in html


class TestSlimServingMemory:
    """The serving process never holds the html column in memory: html
    searches and page-detail html come from streamed/filtered
    checkpoint reads."""

    def test_state_excludes_html(self, base_url):
        # reach into the live handler's state through a fresh one
        pass  # structural check below uses ViewerState directly

    def test_viewer_state_slim(self, ray_session, tmp_path):
        from website_indexer_ray.config import CrawlConfig
        from website_indexer_ray.fixtures.gen import (
            SAMPLE_START_URL,
            sample_site_corpus,
        )
        from website_indexer_ray.pipelines.engine import CrawlEngine
        from website_indexer_ray.server import ViewerState

        corpus, seeds = sample_site_corpus()
        cfg = CrawlConfig(start_url=SAMPLE_START_URL, n_seen_shards=2,
                          fetch_concurrency=2)
        out = str(tmp_path / "slim_crawl")
        CrawlEngine(cfg, out).run(corpus, seeds)
        state = ViewerState(out)
        assert "html" not in state.records.schema.names
        assert state.html_matching_urls("o-sample") == {
            "http://localhost:8000/"
        }
        assert "Sample homepage" in state.page_html("http://localhost:8000/")

    def test_html_search_still_works(self, base_url):
        _s, _h, body = get(f"{base_url}/?search_type=html&q=o-sample")
        assert json.loads(body)["count"] == 1

    def test_detail_still_carries_html(self, base_url):
        _s, _h, body = get(f"{base_url}/page/?url=http://localhost:8000/")
        assert "o-sample" in json.loads(body)["html"]


class TestPaginationLinks:
    """DRF pagination payload parity: next/previous URLs alongside
    num_pages/page_number (viewer/pagination.py:5-16)."""

    def test_single_page_has_null_links(self, base_url):
        _s, _h, body = get(f"{base_url}/")
        page = json.loads(body)
        assert page["next"] is None and page["previous"] is None
        assert page["num_pages"] == 1 and page["page_number"] == 1

    def test_multi_page_links(self, base_url):
        from website_indexer_ray.server import ViewerHandler

        page = {"page_number": 2, "num_pages": 3}
        ViewerHandler._add_page_links(page, "/", {"q": "x", "page": "2"})
        assert page["previous"] == "/?q=x&page=1"
        assert page["next"] == "/?q=x&page=3"

    def test_help_html_common_searches(self, base_url):
        """help.html parity: one section per search type with live
        example links (templates/viewer/help.html structure)."""
        _s, headers, body = get(f"{base_url}/help/?format=html")
        assert headers["Content-Type"].startswith("text/html")
        text = body.decode()
        assert "Common searches" in text
        for stype in ("title", "url", "components", "links", "text", "html"):
            assert f"search_type={stype}" in text
        # components example links into the served crawl's real dim
        assert "q=o-sample" in text
        # plain-text form still served without format=html
        _s, h2, body2 = get(f"{base_url}/help/")
        assert h2["Content-Type"].startswith("text/plain")


# DOM shim for test_static_js_executes: just enough of the DOM for the
# bundle's three calls (documentElement className swap, querySelectorAll
# over expandables, header button clicks).
_JS_DOM_HARNESS = """\
function El(classes) {
  const self = {
    classes: new Set(classes),
    attrs: {},
    handlers: {},
    get className() { return [...self.classes].join(' '); },
    set className(v) { self.classes = new Set(v.split(/\\s+/).filter(Boolean)); },
    classList: {
      toggle(c, force) {
        const want = force === undefined ? !self.classes.has(c) : force;
        want ? self.classes.add(c) : self.classes.delete(c);
      },
      contains(c) { return self.classes.has(c); },
    },
    setAttribute(k, v) { self.attrs[k] = v; },
    getAttribute(k) { return self.attrs[k]; },
    addEventListener(ev, fn) { self.handlers[ev] = fn; },
    click() { self.handlers.click && self.handlers.click(); },
  };
  return self;
}
const open = El(['o-expandable', 'o-expandable--onload-open']);
const closed = El(['o-expandable']);
const openBtn = El(['o-expandable__header']);
const closedBtn = El(['o-expandable__header']);
open.querySelector = () => openBtn;
closed.querySelector = () => closedBtn;
global.document = {
  documentElement: El(['no-js']),
  querySelectorAll: (sel) => sel === '.o-expandable' ? [open, closed] : [],
};
require('__BUNDLE__');
const doc = global.document.documentElement;
console.log(JSON.stringify({
  rootClass: doc.className,
  onloadOpen: open.classList.contains('o-expandable--open'),
  onloadAria: openBtn.getAttribute('aria-expanded'),
  closedStart: closed.classList.contains('o-expandable--open'),
  closedAria: closedBtn.getAttribute('aria-expanded'),
}));
closedBtn.click();
console.log(JSON.stringify({
  afterClickOpen: closed.classList.contains('o-expandable--open'),
  afterClickAria: closedBtn.getAttribute('aria-expanded'),
}));
closedBtn.click();
console.log(JSON.stringify({
  afterSecondClick: closed.classList.contains('o-expandable--open'),
}));
"""
