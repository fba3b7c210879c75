"""Deterministic synthetic web corpus generator (FIXTURES.md §1).

Stands in for the reference's conformance corpus
(/root/reference/sample/src/ + crawler/fixtures/sample.json). The
fetch stage joins frontier URLs against this table instead of doing
network I/O; every edge case the reference's predicate chain and
parser handle is represented:

- external links, ``/external-site/?ext_url=…`` obfuscated links
  (plugin.py:136-157), file-like paths (plugin.py:131), ``?page=N``
  vs other querystrings (plugin.py:159-162), social-share SKIP_URLS
  (plugin.py:22-32)
- redirect chains: append-slash and http→https
  (crawler/models.py:172-178), redirect-to-external (plugin.py:236-245)
- 404/500/network-error rows (plugin.py:170-183,246-254), non-HTML
  content types (plugin.py:274-281)
- no-title pages (parser.py:75-76), no-body pages, malformed HTML
  (parser.py:125-130), droppable subtrees + components + imgs
  (parser.py:14,117-120,133-151)

Generation is seeded and fully deterministic; no wall clock, no
external data.
"""

from __future__ import annotations

import random

import pyarrow as pa

from website_indexer_ray.schemas import CORPUS_SCHEMA, SEEDS_SCHEMA

START_URL = "https://test.example/"
START_HOST = "test.example"

COMPONENT_CLASSES = [
    "o-card", "m-nav", "a-btn", "o-table", "m-form-field", "a-link",
    "o-banner", "m-list", "a-tag",
]

SKIP_LINKS = [
    "https://www.facebook.com/dialog/share?href=x",
    "https://twitter.com/intent/tweet?text=x",
    "https://x.com/intent/tweet?text=x",
    "https://www.linkedin.com/shareArticle?url=x",
]


def _page_html(
    rng: random.Random,
    title: str | None,
    lang: str | None,
    body_links: list[str],
    components: list[str],
    imgs: list[str],
    header_links: list[str],
    text_seed: int,
    malformed: bool = False,
    no_body: bool = False,
) -> str:
    head = "<head>"
    if title is not None:
        head += f"<title>{title}</title>"
    head += '<meta charset="utf-8" /></head>'
    lang_attr = f' lang="{lang}"' if lang else ""

    if no_body:
        return f"<!DOCTYPE html>\n<html{lang_attr}>{head}</html>"

    parts = [f"<!DOCTYPE html>\n<html{lang_attr}>", head, "<body>"]
    if header_links:
        nav = "".join(f'<a href="{h}">nav</a>' for h in header_links)
        parts.append(f'<div class="o-header">{nav}<img src="/logo.png"></div>')
    parts.append(f"<h1>{title or 'Untitled'}</h1>")
    words = ["data", "crawl", "consumer", "finance", "report", "index",
             "page", "sample", "notice", "guide"]
    r = random.Random(text_seed)
    sentence = " ".join(r.choice(words) for _ in range(r.randint(8, 24)))
    parts.append(f"<p>{sentence}.</p>")
    for comp in components:
        parts.append(f'<div class="{comp}">component {comp} content</div>')
    for img in imgs:
        parts.append(f'<img src="{img}" alt="">')
    parts.append("<script>var ignored = 1;</script>")
    for link in body_links:
        if malformed:
            parts.append(f'<p><a href="{link}">link')
        else:
            parts.append(f'<p><a href="{link}">link to {link}</a></p>')
    parts.append('<div class="o-footer"><a href="/">home</a></div>')
    if not malformed:
        parts.append("</body></html>")
    return "\n".join(parts)


def generate_corpus(
    n_pages: int = 100,
    seed: int = 42,
    n_ext_hosts: int = 4,
    avg_links: int = 6,
    start_url: str = START_URL,
    wide: bool = False,
    latency_ms: tuple[int, int] = (0, 0),
) -> tuple[pa.Table, pa.Table]:
    """Build (corpus, seeds) Arrow tables for a synthetic site of
    ``n_pages`` regular internal pages plus edge-case URLs.

    The link graph is preferential (Zipf-ish: early pages get more
    in-links) so host/frontier skew is represented.

    ``wide=True`` makes every section page link ALL of its child pages
    (BFS diameter ~3 — the shape of a real site with listing pages),
    used by the bench so generation count stays small at any scale.
    ``latency_ms=(lo, hi)`` assigns every corpus row a deterministic
    per-URL fetch delay in that range (the bench's stand-in for
    network latency; the engine honors it when
    ``CrawlConfig.simulate_latency`` is set).
    """
    rng = random.Random(seed)
    delay_rng = random.Random(seed ^ 0x5EED)
    host = START_HOST

    n_sections = max(2, n_pages // 25)
    sections = [f"{start_url}s{i}/" for i in range(n_sections)]
    pages = [
        f"{sections[i % n_sections]}p{i // n_sections}/" for i in range(n_pages)
    ]

    n_special = max(1, n_pages // 20)
    notitle = [f"{start_url}notitle-{k}/" for k in range(n_special)]
    nobody = [f"{start_url}nobody-{k}/" for k in range(n_special)]
    malformed = [f"{start_url}malformed-{k}/" for k in range(n_special)]
    plain = [f"{start_url}plain-{k}/" for k in range(n_special)]
    missing = [f"{start_url}missing-{k}/" for k in range(n_special)]
    broken = [f"{start_url}broken-{k}/" for k in range(n_special)]
    down = [f"{start_url}down-{k}/" for k in range(n_special)]
    oldpaths = [f"{start_url}old-{k}" for k in range(n_special)]
    goext = [f"{start_url}goext-{k}/" for k in range(n_special)]
    listing = [f"{start_url}list/?page={k}" for k in range(1, 4)]

    ext_hosts = [f"ext{m}.example" for m in range(n_ext_hosts)]
    ext_ok = [f"https://{h}/ok{j}/" for h in ext_hosts for j in range(3)]
    ext_404 = [f"https://{h}/gone{j}/" for h in ext_hosts for j in range(2)]
    ext_redir = [f"http://{h}/sec{j}" for h in ext_hosts for j in range(2)]
    ext_down = [f"https://{h}/dead{j}/" for h in ext_hosts for j in range(1)]

    def rand_internal(r: random.Random) -> str:
        # preferential attachment: early pages are hotter
        idx = min(int(r.paretovariate(1.2)) - 1, len(pages) - 1)
        return pages[idx]

    def make_links(r: random.Random, self_url: str) -> list[str]:
        links: list[str] = []
        for _ in range(r.randint(max(1, avg_links - 3), avg_links + 3)):
            roll = r.random()
            if roll < 0.55:
                links.append(rand_internal(r))
            elif roll < 0.62:
                links.append(r.choice(ext_ok + ext_404 + ext_redir + ext_down))
            elif roll < 0.68:
                ext = r.choice(ext_ok)
                from urllib.parse import quote_plus
                links.append(f"/external-site/?ext_url={quote_plus(ext)}")
            elif roll < 0.73:
                links.append(f"./file-{r.randint(0, 9)}.xlsx")
            elif roll < 0.78:
                links.append(r.choice(listing))
            elif roll < 0.82:
                links.append(rand_internal(r) + "?foo=bar")
            elif roll < 0.85:
                links.append(r.choice(SKIP_LINKS))
            elif roll < 0.88:
                links.append(rand_internal(r) + "#frag")
            elif roll < 0.90:
                links.append("mailto:info@test.example")
            elif roll < 0.93 and notitle:
                links.append(
                    r.choice(notitle + nobody + malformed + plain)
                )
            elif roll < 0.97:
                links.append(
                    r.choice(missing + broken + down + oldpaths + goext)
                )
            else:
                links.append(r.choice(sections))
        return links

    rows: list[dict] = []

    def add(url, status=200, ctype="text/html", location=None, html=None, delay=0):
        if latency_ms[1] > 0:
            delay = delay_rng.randint(latency_ms[0], latency_ms[1])
        rows.append(
            {
                "url": url,
                "host": url.split("/")[2],
                "status_code": status,
                "content_type": ctype,
                "location": location,
                "html": html,
                "fetch_delay_ms": delay,
            }
        )

    # root page links to all sections + a few pages + edge cases
    root_links = list(sections) + pages[:3] + listing[:1] + [SKIP_LINKS[0]]
    add(
        start_url,
        html=_page_html(
            rng, "Home — Test Site", "en", root_links,
            ["o-banner"], ["/hero.png"], ["/", sections[0]], text_seed=seed,
        ),
    )

    for i, sec in enumerate(sections):
        sec_pages = [p for p in pages if p.startswith(sec)]
        listed = sec_pages if wide else sec_pages[:20]
        links = listed + make_links(random.Random(seed * 31 + i), sec)
        add(
            sec,
            html=_page_html(
                rng, f"Section {i} — Test Site", "en", links,
                [COMPONENT_CLASSES[i % len(COMPONENT_CLASSES)]],
                [], ["/"], text_seed=seed * 31 + i,
            ),
        )

    for i, page in enumerate(pages):
        r = random.Random(seed * 101 + i)
        lang = "es" if i % 7 == 3 else "en"
        comps = r.sample(COMPONENT_CLASSES, r.randint(0, 3))
        imgs = [f"/img/{i}-{j}.png" for j in range(r.randint(0, 2))]
        add(
            page,
            html=_page_html(
                r, f"Page {i} — Test Site", lang, make_links(r, page),
                comps, imgs, ["/"], text_seed=seed * 101 + i,
            ),
            delay=r.choice([0, 0, 0, 1, 2]),
        )

    for k, url in enumerate(listing):
        r = random.Random(seed * 7 + k)
        add(
            url,
            html=_page_html(
                r, f"Listing page {k + 1} — Test Site", "en",
                make_links(r, url) + [listing[(k + 1) % len(listing)]],
                ["m-list"], [], ["/"], text_seed=seed * 7 + k,
            ),
        )

    for k, url in enumerate(notitle):
        add(url, html=_page_html(rng, None, "en", [pages[k % len(pages)]], [], [], [], text_seed=k))
    for k, url in enumerate(nobody):
        add(url, html=_page_html(rng, f"No body {k}", "en", [], [], [], [], text_seed=k, no_body=True))
    for k, url in enumerate(malformed):
        r = random.Random(seed * 13 + k)
        add(url, html=_page_html(r, f"Malformed {k} — Test Site", "en", make_links(r, url), ["a-btn"], [], [], text_seed=k, malformed=True))
    for k, url in enumerate(plain):
        add(url, ctype="application/pdf", html=None)
    for url in missing:
        add(url, status=404, html=None)
    for url in broken:
        add(url, status=500, html=None)
    for url in down:
        add(url, status=0, ctype="", html=None)
    for k, url in enumerate(oldpaths):
        add(url, status=301, location=url + "/", html=None)
        add(url + "/", html=_page_html(rng, f"Old page {k} — Test Site", "en", [pages[k % len(pages)]], [], [], [], text_seed=seed + k))
    for k, url in enumerate(goext):
        add(url, status=302, location=ext_ok[k % len(ext_ok)], html=None)

    for url in ext_ok:
        add(url, html="<html><head><title>External OK</title></head><body>external</body></html>")
    for url in ext_404:
        add(url, status=404, html=None)
    for url in ext_redir:
        add(url, status=301, location="https://" + url[len("http://"):], html=None)
        add("https://" + url[len("http://"):], html="<html><head><title>External secure</title></head><body>x</body></html>")
    # ext_down URLs are intentionally NOT in the corpus → network error.

    corpus = pa.Table.from_pylist(rows, schema=CORPUS_SCHEMA)
    seeds = pa.Table.from_pylist(
        [{"url": start_url, "seed_batch": 0}], schema=SEEDS_SCHEMA
    )
    return corpus, seeds


# --- The reference conformance corpus -------------------------------------
# Byte-identical HTML to /root/reference/sample/src/{index,child/index}.html
# (test fixture data, not code). The statuses reproduce the recorded crawl
# in crawler/fixtures/sample.json: 3 pages, 1 error (404 on
# https://example.com/file.xlsx), externals responding 200.

SAMPLE_START_URL = "http://localhost:8000/"

_SAMPLE_INDEX_HTML = """<!DOCTYPE html>
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

_SAMPLE_CHILD_HTML = """<!DOCTYPE html>
<html lang="en">
  <head>
    <title>Sample child page</title>
    <meta charset="utf-8" />
    <meta http-equiv="Content-type" content="text/html; charset=utf-8" />
    <meta name="viewport" content="width=device-width, initial-scale=1" />
  </head>
  <body>
    <h1>Sample child page</h1>
    <p>This is sample content.</p>
    <p><a href="/">This is a link to the homepage.</a></p>
  </body>
</html>
"""


def sample_site_corpus() -> tuple[pa.Table, pa.Table]:
    """Corpus reproducing the reference's recorded sample crawl."""
    rows = [
        dict(url="http://localhost:8000/", host="localhost:8000", status_code=200,
             content_type="text/html", location=None, html=_SAMPLE_INDEX_HTML,
             fetch_delay_ms=0),
        dict(url="http://localhost:8000/child/", host="localhost:8000",
             status_code=200, content_type="text/html", location=None,
             html=_SAMPLE_CHILD_HTML, fetch_delay_ms=0),
        dict(url="http://localhost:8000/child/?page=2", host="localhost:8000",
             status_code=200, content_type="text/html", location=None,
             html=_SAMPLE_CHILD_HTML, fetch_delay_ms=0),
        dict(url="https://example.com/", host="example.com", status_code=200,
             content_type="text/html", location=None,
             html="<html><head><title>Example</title></head><body>x</body></html>",
             fetch_delay_ms=0),
        dict(url="https://example.org/", host="example.org", status_code=200,
             content_type="text/html", location=None,
             html="<html><head><title>Example org</title></head><body>x</body></html>",
             fetch_delay_ms=0),
        dict(url="https://example.com/file.xlsx", host="example.com",
             status_code=404, content_type="text/html", location=None,
             html=None, fetch_delay_ms=0),
    ]
    corpus = pa.Table.from_pylist(rows, schema=CORPUS_SCHEMA)
    seeds = pa.Table.from_pylist(
        [{"url": SAMPLE_START_URL, "seed_batch": 0}], schema=SEEDS_SCHEMA
    )
    return corpus, seeds


def mutate_corpus_rev2(corpus: pa.Table) -> pa.Table:
    """Deterministic 'second nightly snapshot' of a corpus, exercising
    every recrawl-diff class (pipelines/recrawl.py):

      - every 7th page row (by position) gets an invisible HTML
        comment appended → content CHANGED, parse results identical;
      - row 3 additionally gains a visible link to a brand-new page,
        and that page's corpus row is appended → one ADDED page;
      - every 11th page row (positions > 0, skipping the start page)
        is REMOVED from the corpus → the recrawl records it as an
        error, so the page disappears from the page set.
    """
    urls = corpus.column("url").to_pylist()
    htmls = corpus.column("html").to_pylist()
    keep = []
    for i in range(corpus.num_rows):
        if i > 0 and i % 11 == 0:
            continue
        keep.append(i)
        if i % 7 == 0:
            htmls[i] = (htmls[i] or "") + "<!-- rev2 -->"
        if i == 3:
            # inside the document — content after </html> is ignored
            # by the (reference-parity) parser's link extraction
            htmls[i] = (htmls[i] or "").replace(
                "</body>", '<a href="/rev2-extra/">new</a></body>', 1
            )
    mutated = corpus.set_column(
        corpus.schema.get_field_index("html"),
        "html",
        pa.array(htmls, type=pa.large_string()),
    ).take(pa.array(keep, type=pa.int64()))
    host = urls[0].split("/")[2]
    extra = pa.table(
        {
            "url": pa.array([f"https://{host}/rev2-extra/"], type=pa.string()),
            "host": pa.array([host], type=pa.string()),
            "status_code": pa.array([200], type=pa.int32()),
            "content_type": pa.array(["text/html"], type=pa.string()),
            "location": pa.array([""], type=pa.string()),
            "html": pa.array(
                ["<html><head><title>rev2 extra</title></head>"
                 "<body><p>new page</p></body></html>"],
                type=pa.large_string(),
            ),
            "fetch_delay_ms": pa.array([0], type=pa.int32()),
        }
    )
    return pa.concat_tables([mutated, extra.cast(mutated.schema)])
