"""HTML parsing with reference-equivalent semantics, stdlib-only.

Reimplements the observable behavior of the reference parser
(/root/reference/crawler/parser.py:68-151) without lxml (not available
in this container) on top of ``html.parser.HTMLParser``:

- ``title``: first <title> element's leading text, stripped
  (parser.py:71-72). No title ⇒ page is not indexed (parser.py:75-76).
- ``language``: root element's ``lang`` attribute (parser.py:73).
- cleaned body: the direct <body> child of the root with subtrees
  matching ``.o-header .o-footer .skip-nav img script style`` dropped
  (parser.py:133-151).
- ``text``: whitespace-collapsed text content of the cleaned body
  (parser.py:80-83); None when there is no body.
- index ``links``: hrefs of <a> elements inside the cleaned body,
  set-deduped, external-site wrappers unwrapped, sorted
  (parser.py:90-115). Hrefs are kept verbatim (relative links stay
  relative) as in the reference.
- ``components``: design-system class names matched by
  ``(?:(?:class=")|\\s)((?:o|m|a)-[\\w\\-]*)`` over the serialized
  cleaned-body HTML, set-deduped, sorted (parser.py:14,117-120).
- ``media``: srcs of <img> elements remaining after the class-based
  drops, in document order — our extension for the interleaved-span
  document model (the reference simply drops them, parser.py:138-145).
- ``frontier_links``: hrefs of ALL <a> elements in the whole document
  (wpull's own extractor: ``--link-extractors=html --follow-tags=a``,
  /root/reference/crawler/wpull/crawler.py:43-44), unresolved; the
  frontier-expansion stage resolves them against the page URL. Distinct
  from index links per the reference's dual extraction.

Lenient parsing stands in for the lxml → soupparser fallback
(parser.py:125-130): ``html.parser`` never raises on malformed input;
we additionally auto-close void elements and recover from stray end
tags, and wrap fragment inputs (no <html>) in an implicit root like
``lxml.html.fromstring`` does.
"""

from __future__ import annotations

import re
from dataclasses import dataclass, field
from html import escape
from html.parser import HTMLParser
from urllib.parse import parse_qs, urlsplit

HTML_COMPONENT_SEARCH = re.compile(r"(?:(?:class=\")|\s)((?:o|m|a)-[\w\-]*)")
HTML_EXTERNAL_SITE = re.compile("/external-site/")
HTML_WHITESPACE = re.compile(r"\s+")

_VOID = {
    "area", "base", "br", "col", "embed", "hr", "img", "input",
    "link", "meta", "param", "source", "track", "wbr",
}
# Tags that implicitly close an open element of the same tag.
_SELF_CLOSING_SIBLINGS = {"p", "li", "tr", "td", "th", "option"}

_DROP_CLASSES = {"o-header", "o-footer", "skip-nav"}
_DROP_TAGS = {"img", "script", "style"}


class Element:
    __slots__ = ("tag", "attrs", "children")

    def __init__(self, tag: str, attrs: list[tuple[str, str | None]]):
        self.tag = tag
        # lxml/libxml2 keeps only the FIRST of duplicate attributes;
        # html.parser reports all of them — dedupe at construction so
        # serialization (which the component regex runs over) matches.
        if len(attrs) > 1:
            seen: set[str] = set()
            deduped = []
            for k, v in attrs:
                if k not in seen:
                    seen.add(k)
                    deduped.append((k, v))
            attrs = deduped
        self.attrs = attrs
        self.children: list[Element | str] = []

    def attr(self, name: str) -> str | None:
        for k, v in self.attrs:
            if k == name:
                return v
        return None

    def class_tokens(self) -> set[str]:
        cls = self.attr("class")
        return set(cls.split()) if cls else set()


class _TreeBuilder(HTMLParser):
    def __init__(self) -> None:
        super().__init__(convert_charrefs=True)
        self.root = Element("#document", [])
        self.stack = [self.root]

    def handle_starttag(self, tag: str, attrs) -> None:
        if tag in _SELF_CLOSING_SIBLINGS and self.stack[-1].tag == tag:
            self.stack.pop()
        elif tag in ("body", "head"):
            # lxml-style recovery: <body>/<head> are always direct
            # children of <html>; implicitly close anything still open
            # below it (e.g. an unclosed <head> before <body>).
            for i in range(len(self.stack) - 1, 0, -1):
                if self.stack[i].tag == "html":
                    del self.stack[i + 1 :]
                    break
        el = Element(tag, list(attrs))
        self.stack[-1].children.append(el)
        if tag not in _VOID:
            self.stack.append(el)

    def handle_startendtag(self, tag: str, attrs) -> None:
        self.stack[-1].children.append(Element(tag, list(attrs)))

    def handle_endtag(self, tag: str) -> None:
        for i in range(len(self.stack) - 1, 0, -1):
            if self.stack[i].tag == tag:
                del self.stack[i:]
                return
        # stray end tag: ignore (lenient recovery)

    def handle_data(self, data: str) -> None:
        if data:
            self.stack[-1].children.append(data)


def parse_tree(html: str) -> Element:
    """Parse into a tree and return the document root element.

    Like ``lxml.html.fromstring``: if the document has an <html>
    element it is the root; otherwise the top-level content is wrapped
    in an implicit root element.
    """
    builder = _TreeBuilder()
    builder.feed(html)
    builder.close()
    doc = builder.root
    for child in doc.children:
        if isinstance(child, Element) and child.tag == "html":
            return child
    root = Element("div", [])
    root.children = doc.children
    return root


def _find_first(el: Element, tag: str) -> Element | None:
    """First matching descendant in DOCUMENT order (lxml's
    ``.find(".//tag")`` is pre-order DFS — a deeper-but-earlier match
    beats a shallower later one)."""
    stack = [c for c in reversed(el.children) if isinstance(c, Element)]
    while stack:
        node = stack.pop()
        if node.tag == tag:
            return node
        stack.extend(
            c for c in reversed(node.children) if isinstance(c, Element)
        )
    return None


def _leading_text(el: Element) -> str | None:
    """Text before the first child element — lxml's ``.text``."""
    parts = []
    for child in el.children:
        if isinstance(child, str):
            parts.append(child)
        else:
            break
    return "".join(parts) if parts else None


# All tree walkers below use explicit stacks, not recursion: lxml (C)
# handles arbitrarily deep documents, and real-world pathological HTML
# (thousands of unclosed <div>s) must not RecursionError a fetch task.


def _text_content(el: Element, out: list[str]) -> None:
    stack: list = list(reversed(el.children))
    while stack:
        node = stack.pop()
        if isinstance(node, str):
            out.append(node)
        else:
            stack.extend(reversed(node.children))


def _serialize(el: Element, out: list[str]) -> None:
    stack: list[tuple[str, object]] = [("open", el)]
    while stack:
        op, node = stack.pop()
        if op == "text":
            out.append(escape(node, quote=False))
            continue
        if op == "close":
            out.append(f"</{node.tag}>")
            continue
        attrs = []
        for k, v in node.attrs:
            if v is None:
                attrs.append(f" {k}")
            else:
                attrs.append(f' {k}="{escape(v, quote=True)}"')
        out.append(f"<{node.tag}{''.join(attrs)}>")
        if node.tag not in _VOID:
            stack.append(("close", node))
        for child in reversed(node.children):
            stack.append(
                ("text", child) if isinstance(child, str) else ("open", child)
            )


def serialize(el: Element) -> str:
    out: list[str] = []
    _serialize(el, out)
    return "".join(out)


def _clean_body(body: Element) -> list[str]:
    """Drop header/footer/skip-nav/img/script/style subtrees in place.

    Returns the srcs of <img> elements that were dropped by the tag
    pass (i.e. not already inside a dropped class subtree), in document
    order — these become ``media`` spans.
    """
    media: list[str] = []
    # Simulated recursion frames (element, child iterator, kept list)
    # so img srcs land in the SAME interleaved document order the
    # recursive form produced — media order feeds span `ord` columns.
    stack: list[tuple[Element, object, list]] = [
        (body, iter(body.children), [])
    ]
    while stack:
        el, it, kept = stack[-1]
        descended = False
        for child in it:
            if isinstance(child, str):
                kept.append(child)
                continue
            if child.class_tokens() & _DROP_CLASSES:
                continue
            if child.tag in _DROP_TAGS:
                if child.tag == "img":
                    src = child.attr("src")
                    if src:
                        media.append(src)
                continue
            kept.append(child)
            stack.append((child, iter(child.children), []))
            descended = True
            break
        if not descended:
            el.children = kept
            stack.pop()
    return media


def _iter_a_hrefs(el: Element, out: list[str]) -> None:
    stack = [c for c in reversed(el.children) if isinstance(c, Element)]
    while stack:
        node = stack.pop()
        if node.tag == "a":
            href = node.attr("href")
            if href is not None:
                out.append(href)
        stack.extend(
            c for c in reversed(node.children) if isinstance(c, Element)
        )


def unwrap_external_site(hrefs: list[str], internal_link_host: str) -> list[str]:
    """Replace ``/external-site/?ext_url=X`` wrappers with X
    (parser.py:98-113). Invalid URLs pass through untouched."""
    result = list(hrefs)
    for i, href in enumerate(result):
        try:
            parsed = urlsplit(href)
            netloc_host = parsed.netloc
        except ValueError:
            continue
        if not HTML_EXTERNAL_SITE.match(parsed.path):
            continue
        if netloc_host and internal_link_host != netloc_host:
            continue
        ext_url = parse_qs(parsed.query).get("ext_url")
        if ext_url:
            result[i] = ext_url[0]
    return result


@dataclass
class ParsedPage:
    html: str
    title: str | None
    language: str | None
    text: str | None
    links: list[str] = field(default_factory=list)
    components: list[str] = field(default_factory=list)
    media: list[str] = field(default_factory=list)
    frontier_links: list[str] = field(default_factory=list)


def parse_page(html: str, internal_link_host: str) -> ParsedPage | None:
    """Full page parse.

    A page with no title is not indexable (``title is None`` ⇒ the
    caller records no Page row, parser.py:75-76 / plugin.py:264-269),
    but its ``frontier_links`` are still returned because wpull's own
    extractor follows links regardless of the index-side parse.
    """
    tree = parse_tree(html)

    title_el = _find_first(tree, "title")
    title = None
    if title_el is not None:
        leading = _leading_text(title_el)
        if leading is not None:
            title = leading.strip()
    language = tree.attr("lang")

    # Frontier links come from the whole, uncleaned document (wpull's
    # extractor runs independently of the index-side parse).
    frontier_links: list[str] = []
    _iter_a_hrefs(tree, frontier_links)

    if title is None:
        return ParsedPage(
            html=html, title=None, language=language, text=None,
            frontier_links=frontier_links,
        )

    body = None
    for child in tree.children:
        if isinstance(child, Element) and child.tag == "body":
            body = child
            break

    if body is None:
        return ParsedPage(
            html=html, title=title, language=language, text=None,
            frontier_links=frontier_links,
        )

    media = _clean_body(body)

    text = HTML_WHITESPACE.sub(" ", "".join(_collect_text(body))).strip()

    hrefs: list[str] = []
    _iter_a_hrefs(body, hrefs)
    hrefs = list(set(hrefs))
    links = sorted(unwrap_external_site(hrefs, internal_link_host))

    body_html = serialize(body)
    components = sorted(set(HTML_COMPONENT_SEARCH.findall(body_html)))

    return ParsedPage(
        html=html, title=title, language=language, text=text,
        links=links, components=components, media=media,
        frontier_links=frontier_links,
    )


def _collect_text(el: Element) -> list[str]:
    out: list[str] = []
    _text_content(el, out)
    return out
