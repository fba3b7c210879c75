"""Viewer HTTP server — the reference viewer's API surface
(/root/reference/viewer/urls.py:6-13, views.py:79-159) served from a
crawl checkpoint directory over stdlib http.server (no web framework
in this container; the routing/semantics are what's reproduced):

  GET /                ?search_type=&q=&language=&page=N&format=json|csv
                       page list + the six search types (views.py:113-132)
  GET /page/           ?url=...   exact-URL detail, 404 JSON when absent
                       (views.py:151-159)
  GET /components/     ?format=csv   global component dimension,
                       unpaginated (views.py:79-88)
  GET /errors/         ?status_code=&page=&format=csv (views.py:91-97)
  GET /redirects/      ?status_code=&page=&format=csv (views.py:100-106)
  GET /status/         crawl stats (viewer/context_processors.py:6-27)
  GET /help/           static help text (urls.py:12)

CSV responses carry the UTF-8 BOM, per-type headers and the
date-stamped attachment filename (views.py:38-76). JSON list
responses use the viewer's page-window shape (pagination.py:5-16,
page size 25). The handler serves from slim in-memory tables loaded
once at startup; a checkpoint too large for that swaps in the
Dataset-native search path (pipelines/query.search_pages_ds) behind
the same handlers.

Run: python -m website_indexer_ray.server --out /path/to/crawl [--port 8000]
"""

from __future__ import annotations

import argparse
import json
from http.server import BaseHTTPRequestHandler, ThreadingHTTPServer
from urllib.parse import parse_qs, urlsplit

import pyarrow as pa

from website_indexer_ray.pipelines import query
from website_indexer_ray.pipelines.engine import CrawlResult

HELP_TEXT = (
    "website-indexer viewer API\n"
    "  /            page search (search_type, q, language, page, format)\n"
    "  /page/       page detail (url)\n"
    "  /components/ component dimension\n"
    "  /errors/     crawl errors (status_code filter)\n"
    "  /redirects/  crawl redirects (status_code filter)\n"
    "  /status/     crawl stats\n"
)


class ViewerState:
    """Checkpoint tables loaded once per serving process.

    The in-memory copy excludes the html column — the dominant payload
    (usually >90% of a crawl's bytes). html-needing requests (the html
    search, page detail) stream the pruned (url, html) columns from
    the checkpoint with a vectorized scanner instead: serving memory
    is bounded by the slim table however large the crawl's html is.
    """

    def __init__(self, out_dir: str):
        import pyarrow.compute as pc

        self.result = CrawlResult(out_dir)
        full_schema = self.result.records_dataset().schema
        slim_cols = [n for n in full_schema.names if n != "html"]
        self.records = self.result.records_table(columns=slim_cols)
        self.stats = query.crawl_stats(self.records)
        self._pc = pc

    def html_matching_urls(self, q: str) -> set:
        """URLs of pages whose html icontains q — streamed scan of the
        pruned (record_type, url, html) columns, batch-vectorized."""
        pc = self._pc
        out: set = set()
        scanner = self.result.records_dataset().scanner(
            columns=["record_type", "url", "html"]
        )
        for batch in scanner.to_batches():
            t = pa.Table.from_batches([batch])
            pages = t.filter(pc.equal(t.column("record_type"), "page"))
            if not pages.num_rows:
                continue
            mask = pc.match_substring(
                pages.column("html"), q, ignore_case=True
            )
            out.update(
                pages.filter(pc.fill_null(mask, False)).column("url").to_pylist()
            )
        return out

    def page_html(self, url: str) -> str | None:
        """One page's html via a filtered checkpoint read."""
        import pyarrow.dataset as pads

        t = self.result.records_dataset().to_table(
            columns=["url", "html"], filter=pads.field("url") == url
        )
        return t.column("html")[0].as_py() if t.num_rows else None

    def search_html(self, q: str, language: str | None = None) -> pa.Table:
        """The html search over the slim state: matching URLs come
        from the streamed html scan, then project the slim page rows
        (search.py:62-63 semantics, url-sorted)."""
        pc = self._pc
        pages = self.records.filter(
            pc.equal(self.records.column("record_type"), "page")
        )
        if language is not None:
            pages = pages.filter(pc.equal(pages.column("language"), language))
        urls = self.html_matching_urls(q)
        mask = pc.is_in(
            pages.column("url"), value_set=pa.array(sorted(urls), type=pa.string())
        )
        out = pages.filter(pc.fill_null(mask, False)).select(query.PAGE_VALUES)
        return out.take(pc.sort_indices(out, sort_keys=[("url", "ascending")]))


def _esc(s) -> str:
    import html

    return html.escape(str(s if s is not None else ""))


def _expandable(label: str, content_html: str, open_: bool = False) -> str:
    """One design-system o-expandable section (the markup contract of
    reference page_detail.html:19-33: header button with label + cues,
    a content div, and the --onload-open modifier for sections that
    start open)."""
    onload = " o-expandable--onload-open" if open_ else ""
    return (
        f'<div class="o-expandable o-expandable--background'
        f' o-expandable--border{onload}">'
        '<button class="o-expandable__header" title="Expand content">'
        f'<h3 class="h4 o-expandable__label">{_esc(label)}</h3>'
        '<span class="o-expandable__cues">'
        '<span class="o-expandable__cue-open" role="img"'
        ' aria-label="Show">Show</span>'
        '<span class="o-expandable__cue-close" role="img"'
        ' aria-label="Hide">Hide</span>'
        "</span></button>"
        f'<div class="o-expandable__content">{content_html}</div>'
        "</div>"
    )


# Base shell mirroring the reference viewer's template structure
# (viewer/templates/viewer/base.html): skip-nav link, grid main with a
# breadcrumbs slot, footer — deliberately the same .skip-nav /
# .u-layout-grid / .o-footer landmarks the reference's own PARSER
# strips before text extraction (crawler/parser.py:133-151), so pages
# this viewer serves are realistic crawl targets for the engine.
_HTML_SHELL = (
    '<!DOCTYPE html><html lang="en" class="no-js"><head>'
    '<meta charset="utf-8">'
    '<meta name="viewport" content="width=device-width, initial-scale=1">'
    "<title>{title}</title>"
    '<link rel="stylesheet" href="/static/css/main.css">'
    "</head><body>"
    '<div class="skip-nav">'
    '<a class="skip-nav__link" href="#main">Skip to main content</a></div>'
    '<main class="u-layout-grid" id="main">'
    '<div class="u-layout-grid__wrapper">{breadcrumbs}'
    '<div class="u-layout-grid__main">{body}</div>'
    "</div></main>"
    '<footer class="o-footer"><div class="wrapper">'
    "Web page index viewer</div></footer>"
    '<script src="/static/js/main.js"></script>'
    "</body></html>"
)

_BREADCRUMBS = (
    '<div class="u-layout-grid__breadcrumbs">'
    '<nav class="m-breadcrumbs" aria-label="Breadcrumbs">/ '
    '<a class="m-breadcrumbs__crumb" href="/?format=html">'
    "Web page index</a></nav></div>"
)

_DEFAULT_TITLE = "Web page index"

_MAIN_CSS = """\
:root { color-scheme: light; }
body { margin: 0; font-family: system-ui, sans-serif; color: #101820;
       line-height: 1.5; }
.skip-nav__link { position: absolute; left: -9999px; }
.skip-nav__link:focus { position: static; display: inline-block;
                        padding: .5em; }
.u-layout-grid__wrapper { max-width: 60rem; margin: 0 auto;
                          padding: 1rem 1.5rem 3rem; }
.m-breadcrumbs { font-size: .875rem; padding: .5rem 0; color: #5a5d61; }
.m-breadcrumbs__crumb { color: #0072ce; }
a { color: #0072ce; }
form input[type=search] { padding: .4em; min-width: 16rem; }
form select, form button { padding: .4em; }
.m-notification { border-left: 4px solid #20aa3f; background: #f0f8eb;
                  padding: .75rem 1rem; margin: 1rem 0; }
.m-notification--warning { border-left-color: #ff9e1b;
                           background: #fff6ec; }
.m-list, .results-list ul { list-style: none; padding: 0; }
.results-list__item { padding: .75rem 0; border-bottom: 1px solid #e3e4e5; }
.results-list__item h4 { margin: 0 0 .25rem; }
nav.pagination, nav { margin: 1rem 0; }
table { border-collapse: collapse; }
td, th { border: 1px solid #e3e4e5; padding: .3rem .6rem;
         text-align: left; }
footer.o-footer { border-top: 1px solid #e3e4e5; padding: 1rem 1.5rem;
                  color: #5a5d61; font-size: .875rem; }
/* Expandables (design-system o-expandable contract): content is
   always visible without JS (progressive enhancement — the `no-js`
   class stays on <html>); with JS the sections collapse and the
   header button toggles them. */
.o-expandable { border: 1px solid #e3e4e5; background: #f7f8f9;
                margin: 1rem 0; }
.o-expandable__header { display: block; width: 100%; text-align: left;
                        background: none; border: 0; padding: .75rem 1rem;
                        font: inherit; cursor: pointer; }
.o-expandable__label { margin: 0; display: inline; }
.o-expandable__cues { float: right; font-size: .875rem; color: #0072ce; }
.o-expandable__content { padding: 0 1rem .75rem; }
.no-js .o-expandable__cues { display: none; }
.js .o-expandable__content { display: none; }
.js .o-expandable--open .o-expandable__content { display: block; }
.js .o-expandable__cue-close { display: none; }
.js .o-expandable--open .o-expandable__cue-open { display: none; }
.js .o-expandable--open .o-expandable__cue-close { display: inline; }
"""

# Vanilla-JS equivalent of the reference's entire front-end bundle
# (viewer/static_src/js/main.js): (1) swap the no-js marker class for
# js, (2) initialise every design-system Expandable — the reference
# imports `Expandable` from @cfpb/cfpb-design-system and calls
# `Expandable.init()`; the observable contract (header button toggles
# the --open modifier + aria-expanded, --onload-open starts open) is
# reproduced here without the build step (esbuild/scripts.js is the
# reference's bundler config; no bundler is needed for ~30 lines).
_MAIN_JS = """\
(function () {
  'use strict';
  var root = document.documentElement;
  root.className = root.className.replace(/(^|\\s)no-js(\\s|$)/, '$1$2');
  root.className += (root.className ? ' ' : '') + 'js';

  function setState(exp, open) {
    exp.classList.toggle('o-expandable--open', open);
    var btn = exp.querySelector('.o-expandable__header');
    if (btn) btn.setAttribute('aria-expanded', open ? 'true' : 'false');
  }

  var expandables = document.querySelectorAll('.o-expandable');
  Array.prototype.forEach.call(expandables, function (exp) {
    setState(exp, exp.classList.contains('o-expandable--onload-open'));
    var btn = exp.querySelector('.o-expandable__header');
    if (!btn) return;
    btn.addEventListener('click', function () {
      setState(exp, !exp.classList.contains('o-expandable--open'));
    });
  });
})();
"""


class ViewerHandler(BaseHTTPRequestHandler):
    state: ViewerState  # assigned by make_server

    # --- plumbing ----------------------------------------------------
    def log_message(self, fmt, *args):  # quiet by default
        pass

    def _send(self, code: int, body: bytes, ctype: str, extra: dict | None = None):
        self.send_response(code)
        self.send_header("Content-Type", ctype)
        self.send_header("Content-Length", str(len(body)))
        for k, v in (extra or {}).items():
            self.send_header(k, v)
        self.end_headers()
        self.wfile.write(body)

    def _json(self, obj, code: int = 200):
        self._send(
            code,
            json.dumps(obj, default=str).encode(),
            "application/json",
        )

    def _csv(self, table, kind: str):
        name, data = query.to_csv_bytes(table, kind, self.state.stats["start"])
        self._send(
            200,
            data,
            "text/csv; charset=utf-8",
            {"Content-Disposition": f"attachment; filename={name}"},
        )

    # --- routing -----------------------------------------------------
    def do_GET(self):
        parts = urlsplit(self.path)
        qs = {k: v[0] for k, v in parse_qs(parts.query).items()}
        route = parts.path.rstrip("/") or "/"
        try:
            if route == "/":
                self._pages(qs)
            elif route == "/page":
                self._page_detail(qs)
            elif route == "/components":
                self._components(qs)
            elif route == "/errors":
                self._errors_or_redirects(qs, "errors")
            elif route == "/redirects":
                self._errors_or_redirects(qs, "redirects")
            elif route == "/status":
                s = self.state.stats
                self._json(
                    {
                        "count": s["count"],
                        "start": s["start"],
                        "end": s["end"],
                        "duration_s": (
                            s["duration"].total_seconds()
                            if s["duration"] is not None
                            else None
                        ),
                    }
                )
            elif route == "/static/css/main.css":
                self._send(200, _MAIN_CSS.encode(), "text/css; charset=utf-8")
            elif route == "/static/js/main.js":
                self._send(
                    200,
                    _MAIN_JS.encode(),
                    "text/javascript; charset=utf-8",
                )
            elif route == "/help":
                if self._wants_html(qs):
                    self._html(self._render_help())
                else:
                    self._send(200, HELP_TEXT.encode(), "text/plain; charset=utf-8")
            else:
                self._json({"detail": "Not found."}, 404)
        except Exception as exc:  # pragma: no cover - defensive 500
            self._json({"detail": f"{type(exc).__name__}: {exc}"}, 500)

    def _html(self, body: str, title: str = _DEFAULT_TITLE, crumbs: bool = False):
        page = _HTML_SHELL.format(
            title=_esc(title),
            breadcrumbs=_BREADCRUMBS if crumbs else "",
            body=body,
        )
        self._send(200, page.encode(), "text/html; charset=utf-8")

    def _wants_html(self, qs: dict) -> bool:
        if qs.get("format") == "html":
            return True
        if "format" in qs:
            return False
        accept = self.headers.get("Accept", "")
        return "text/html" in accept and "application/json" not in accept.split(",")[0]

    # --- views -------------------------------------------------------
    def _pages(self, qs: dict):
        search_type = qs.get("search_type", "")
        q = qs.get("q", "")
        is_csv = qs.get("format") == "csv"
        if search_type == "html":
            # html never lives in serving memory — streamed scan.
            out = self.state.search_html(q, language=qs.get("language"))
        else:
            out = query.search_pages(
                self.state.records,
                search_type,
                q,
                include_related=is_csv and search_type in ("components", "links"),
                language=qs.get("language"),
            )
        if is_csv:
            kind = (
                "pages_components"
                if search_type == "components"
                else "pages_links" if search_type == "links" else "pages"
            )
            # The reference strips the title suffix in EVERY list
            # serialization, CSV included (serializers.py:27-35).
            self._csv(query.strip_title_suffix(out), kind)
            return
        page = query.paginate(query.strip_title_suffix(out), int(qs.get("page", 1)))
        page["results_summary"] = query.results_summary(
            page["count"], search_type, q
        )
        self._add_page_links(page, "/", qs)
        if self._wants_html(qs):
            self._html(self._render_search(page, search_type, q))
            return
        self._json(page)

    @staticmethod
    def _add_page_links(page: dict, path: str, qs: dict) -> None:
        """DRF PageNumberPagination's next/previous URL fields
        (viewer/pagination.py:5-16 wraps them with num_pages/
        page_number, which query.paginate already provides)."""
        from urllib.parse import urlencode

        params = {k: v for k, v in qs.items() if k != "page"}
        n, num = page["page_number"], page["num_pages"]
        page["next"] = (
            f"{path}?{urlencode({**params, 'page': n + 1})}" if n < num else None
        )
        page["previous"] = (
            f"{path}?{urlencode({**params, 'page': n - 1})}" if n > 1 else None
        )

    def _render_search(self, page: dict, search_type: str, q: str) -> str:
        """HTML equivalent of the viewer's search page
        (templates/viewer/search_results.html + page_list.html +
        search_form.html + pagination.html): the search form, the
        results-summary notification (byte-identical wording via
        templatetags), a CSV download link, the result list with
        per-page detail links, and prev/next pagination."""
        from urllib.parse import quote_plus, urlencode

        opts = "".join(
            f'<option value="{t}"{" selected" if t == search_type else ""}>{t}</option>'
            for t in ("title", "url", "components", "links", "text", "html")
        )
        form = (
            '<form action="/"><h2>Search the index</h2>'
            f'<input type="search" name="q" value="{_esc(q)}" maxlength="75">'
            f'<select name="search_type">{opts}</select>'
            "<button type=\"submit\">Search</button></form>"
        )
        csv_qs = urlencode(
            {"format": "csv", **({"search_type": search_type} if search_type else {}),
             **({"q": q} if q else {})}
        )
        summary = (
            f'<div class="m-notification__message">{_esc(page["results_summary"])}</div>'
            f'<a href="/?{csv_qs}">Download search results</a>'
        )
        items = "".join(
            f'<li class="results-list__item"><h4><a href="{_esc(r["url"])}">'
            f'{_esc(r["title"])}</a></h4><div>{_esc(r["url"])}</div>'
            f'<a href="/page/?url={quote_plus(r["url"])}">View page details</a></li>'
            for r in page["results"]
        )
        nav = ""
        if page["num_pages"] > 1:
            base = {
                **({"search_type": search_type} if search_type else {}),
                **({"q": q} if q else {}),
                "format": "html",
            }
            n = page["page_number"]
            if n > 1:
                nav += (
                    f'<a href="/?{urlencode({**base, "page": n - 1})}">Previous</a> '
                )
            nav += f'Page {n} of {page["num_pages"]}'
            if n < page["num_pages"]:
                nav += f' <a href="/?{urlencode({**base, "page": n + 1})}">Next</a>'
        return f'{form}{summary}<ul class="m-list">{items}</ul><nav>{nav}</nav>'

    def _render_help(self) -> str:
        """HTML equivalent of the viewer's common-searches help page
        (templates/viewer/help.html): one section per search type with
        a short explanation and live example searches drawn from the
        served crawl, so every example link returns results."""
        from urllib.parse import urlencode

        st = self.state
        comps = query.list_components(st.records)
        comp_q = (
            comps.column("class_name")[0].as_py() if comps.num_rows else "m-"
        )
        sections = [
            ("title", "Match words in page titles.", ["the", "a"]),
            ("url", "Match any fragment of the page URL.", ["/", "page"]),
            (
                "components",
                "Pages using a design component class (see the full "
                '<a href="/components/?format=html">component list</a>).',
                [comp_q],
            ),
            (
                "links",
                "Pages whose outgoing links contain the query — use a "
                "path fragment to find every page linking somewhere.",
                ["/", "http"],
            ),
            ("text", "Full-text search over the extracted page text.", ["and"]),
            (
                "html",
                "Raw-source search: markup, attributes, class names — "
                "anything in the stored HTML.",
                ["<a", "lang="],
            ),
        ]
        out = ["<h1>Common searches</h1>"]
        for stype, blurb, examples in sections:
            links = " · ".join(
                f'<a href="/?{urlencode({"search_type": stype, "q": q, "format": "html"})}">'
                f"Search &quot;{_esc(q)}&quot;</a>"
                for q in examples
            )
            out.append(
                f"<h2>{_esc(stype)}</h2><p>{blurb}</p>"
                f"<p>Examples: {links}</p>"
            )
        out.append(
            '<h2>Exports</h2><p>Every list view takes format=csv '
            "(BOM-prefixed, date-stamped filename) and format=json "
            "(paginated, page size 25).</p>"
        )
        return "".join(out)

    def _page_detail(self, qs: dict):
        url = qs.get("url", "")
        pages = self.state.records
        import pyarrow.compute as pc

        hit = pages.filter(
            pc.and_(
                pc.equal(pages.column("record_type"), "page"),
                pc.equal(pages.column("url"), url),
            )
        )
        if hit.num_rows == 0:
            self._json({"detail": "Not found."}, 404)
            return
        row = hit.select(
            ["timestamp", "url", "title", "language", "text",
             "components", "links"]
        ).to_pylist()[0]
        row["html"] = self.state.page_html(url)  # filtered read
        if self._wants_html(qs):
            comps = "".join(f"<li>{_esc(c)}</li>" for c in row["components"] or [])
            links = "".join(f"<li>{_esc(h)}</li>" for h in row["links"] or [])
            search_type = qs.get("search_type", "")
            # Expandable sections mirror the reference's page detail
            # (page_detail.html:19-76): each section is a design-system
            # o-expandable whose --onload-open modifier is applied when
            # the incoming search_type matches, so the section the user
            # searched in starts open.
            body = (
                f'<h1>{_esc(row["title"])}</h1>'
                f'<div><a href="{_esc(row["url"])}">{_esc(row["url"])}</a></div>'
                f'<div>Language: {_esc(row["language"])}</div>'
                + _expandable("Links", f"<ul>{links}</ul>",
                              open_=search_type == "links")
                + _expandable("Components", f"<ul>{comps}</ul>",
                              open_=search_type == "components")
                + _expandable("Text", f'<p>{_esc(row["text"])}</p>',
                              open_=search_type == "text")
            )
            self._html(
                body,
                title=row["title"] or _DEFAULT_TITLE,
                crumbs=True,  # page_detail.html renders breadcrumbs
            )
            return
        self._json(row)

    def _components(self, qs: dict):
        table = query.list_components(self.state.records)
        if qs.get("format") == "csv":
            self._csv(table, "components")
        elif self._wants_html(qs):
            items = "".join(
                f'<li><a href="/?search_type=components&q={_esc(r["class_name"])}">'
                f'{_esc(r["class_name"])}</a></li>'
                for r in table.to_pylist()
            )
            self._html(f"<h1>Components</h1><ul>{items}</ul>")
        else:
            # pagination_class = None (views.py:81): full list.
            self._json({"count": table.num_rows, "results": table.to_pylist()})

    def _errors_or_redirects(self, qs: dict, kind: str):
        status = int(qs["status_code"]) if "status_code" in qs else None
        table = (
            query.list_errors(self.state.records, status_code=status)
            if kind == "errors"
            else query.list_redirects(self.state.records, status_code=status)
        )
        if qs.get("format") == "csv":
            self._csv(table, kind)
        else:
            # reference Error/RedirectListView have no HTML renderer
            # (views.py:33-36 mixin absent) — JSON/CSV only, faithful.
            page = query.paginate(table, int(qs.get("page", 1)))
            self._add_page_links(page, f"/{kind}/", qs)
            self._json(page)


def make_server(out_dir: str, port: int = 0) -> ThreadingHTTPServer:
    state = ViewerState(out_dir)
    handler = type("BoundViewerHandler", (ViewerHandler,), {"state": state})
    return ThreadingHTTPServer(("127.0.0.1", port), handler)


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="website_indexer_ray.server")
    p.add_argument("--out", required=True, help="crawl checkpoint directory")
    p.add_argument("--port", type=int, default=8000)
    args = p.parse_args(argv)
    httpd = make_server(args.out, args.port)
    print(f"viewer serving {args.out} on http://127.0.0.1:{httpd.server_address[1]}/")
    httpd.serve_forever()
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
