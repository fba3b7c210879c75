"""Property-based tests (hypothesis) for the pure leaf functions the
whole engine's determinism rests on: canonicalizer idempotence, hash
stability, cuckoo-filter no-false-negatives, span-offset integrity.
"""

import string

from hypothesis import given, settings
from hypothesis import strategies as st

from website_indexer_ray.functions.spans import build_spans
from website_indexer_ray.functions.urls import canonicalize, hostname_with_port, url_hash
from website_indexer_ray.functions.xxh import xxh64
from website_indexer_ray.state.cuckoo import CuckooFilter

_url_chars = string.ascii_letters + string.digits + "-._~/?#@!$&'()*+,;=%"


@settings(max_examples=200, deadline=None)
@given(st.text(alphabet=_url_chars, min_size=0, max_size=80))
def test_canonicalize_idempotent(suffix):
    """canonicalize is a projection: applying it twice equals once."""
    url = "https://Example.COM:443/" + suffix
    once = canonicalize(url)
    if once is not None:
        assert canonicalize(once) == once


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=_url_chars, min_size=1, max_size=60))
def test_canonicalize_strips_fragment(path):
    base = canonicalize(f"https://h.example/{path}")
    if base is not None and "#" not in base:
        withfrag = canonicalize(f"https://h.example/{path}#section")
        assert withfrag == base


@settings(max_examples=200, deadline=None)
@given(st.binary(min_size=0, max_size=200), st.integers(min_value=0, max_value=2**32))
def test_xxh64_deterministic_and_64bit(data, seed):
    h1 = xxh64(data, seed=seed)
    h2 = xxh64(data, seed=seed)
    assert h1 == h2
    assert 0 <= h1 < 2**64


@settings(max_examples=50, deadline=None)
@given(st.lists(st.integers(min_value=1, max_value=2**63), min_size=1, max_size=200, unique=True))
def test_cuckoo_no_false_negatives(hashes):
    """Every inserted key is reported present (false positives allowed,
    false negatives never) — and deletion removes it."""
    f = CuckooFilter(capacity=4096)
    for h in hashes:
        assert f.insert(h)
    for h in hashes:
        assert f.contains(h)
    for h in hashes:
        assert f.delete(h)


@settings(max_examples=100, deadline=None)
@given(
    st.text(min_size=1, max_size=20),
    st.one_of(st.none(), st.text(min_size=1, max_size=5)),
    st.one_of(st.none(), st.text(max_size=40)),
    st.lists(st.text(min_size=1, max_size=20), max_size=5),
    st.lists(st.text(min_size=1, max_size=10), max_size=3),
    st.lists(st.text(min_size=1, max_size=15), max_size=3),
)
def test_span_offsets_contiguous(title, lang, text, links, components, media):
    """Span offsets are exactly 0..n-1 in construction order and the
    kind sequence follows title < lang < text < link* < component* <
    media* (the input_hint ordering invariant)."""
    spans = build_spans(title, lang, text, links, components, media)
    assert [s["offset"] for s in spans] == list(range(len(spans)))
    kind_rank = {"title": 0, "lang": 1, "text": 2, "link": 3, "component": 4, "media": 5}
    ranks = [kind_rank[s["kind"]] for s in spans]
    assert ranks == sorted(ranks)


@settings(max_examples=100, deadline=None)
@given(st.text(alphabet=_url_chars, min_size=0, max_size=60))
def test_hostname_with_port_default_ports_dropped(path):
    assert hostname_with_port(f"https://H.Example:443/{path}") == "h.example"
    assert hostname_with_port(f"http://H.Example:80/{path}") == "h.example"
    assert hostname_with_port(f"http://h.example:8080/{path}") == "h.example:8080"


@settings(max_examples=100, deadline=None)
@given(st.text(min_size=0, max_size=100))
def test_url_hash_stable(s):
    assert url_hash(s) == url_hash(s) == xxh64(s)


@settings(max_examples=100, deadline=None)
@given(
    st.lists(
        st.tuples(
            st.sampled_from(
                [
                    "https://test.example/{}/",
                    "https://test.example/{}.pdf",
                    "https://test.example/list/?page={}",
                    "https://test.example/list/?page={}&x=1",
                    "https://test.example/external-site/?ext_url=https%3A%2F%2Fe{}.example%2F",
                    "https://ext{}.example/",
                    "https://www.facebook.com/dialog/share?u={}",
                ]
            ),
            st.integers(min_value=0, max_value=30),
            st.integers(min_value=0, max_value=6),  # depth
            st.booleans(),  # external parent
        ),
        min_size=0,
        max_size=40,
    )
)
def test_predicate_vectorized_equals_rowwise(rows_spec):
    """Property: the vectorized PredicateStage.__call__ accepts exactly
    the (url, method) set process_rows does, over arbitrary mixes of
    every rule-triggering URL shape."""
    import pyarrow as pa

    from website_indexer_ray.config import CrawlConfig
    from website_indexer_ray.schemas import FRONTIER_SCHEMA
    from website_indexer_ray.stages.predicates import PredicateStage

    cfg = CrawlConfig(
        start_url="https://test.example/",
        depth=4,
        head_url_patterns=(r"^https://ext1\.example/.*",),
    )
    rows = []
    for i, (tmpl, n, depth, ext_parent) in enumerate(rows_spec):
        url = tmpl.format(n)
        rows.append(
            {
                "url": url,
                "url_hash": i,
                "host": hostname_with_port(url),
                "depth": depth,
                "parent_url": "https://test.example/",
                "parent_host": "ext9.example" if ext_parent else "test.example",
                "root_url": "https://test.example/",
                "generation": 1,
                "seed_batch": 0,
            }
        )
    st_obj = PredicateStage(cfg)
    batch = pa.Table.from_pylist(rows, schema=FRONTIER_SCHEMA)
    vec = sorted((r["url"], r["method"]) for r in st_obj(batch).to_pylist())
    ref = sorted((r["url"], r["method"]) for r in st_obj.process_rows(rows))
    assert vec == ref
