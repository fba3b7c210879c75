"""dumpdata-fixture interop tests: round-trip our crawl through the
Django fixture wire format, and ingest the REFERENCE's own
crawler/fixtures/sample.json — the whole query layer must produce the
reference's recorded results from it."""

from __future__ import annotations

import os

import pyarrow.compute as pc
import pytest

from website_indexer_ray.fixtures.interop import dump_fixture, load_fixture
from website_indexer_ray.pipelines import query

REF_FIXTURE = "/root/reference/crawler/fixtures/sample.json"


@pytest.fixture(scope="module")
def crawl_records(ray_session, tmp_path_factory):
    from website_indexer_ray.config import CrawlConfig
    from website_indexer_ray.fixtures.gen import SAMPLE_START_URL, sample_site_corpus
    from website_indexer_ray.pipelines.engine import CrawlEngine

    corpus, seeds = sample_site_corpus()
    cfg = CrawlConfig(start_url=SAMPLE_START_URL, n_seen_shards=2,
                      fetch_concurrency=2)
    out = str(tmp_path_factory.mktemp("interop_crawl"))
    return CrawlEngine(cfg, out).run(corpus, seeds).records_table()


class TestRoundTrip:
    def test_dump_load_preserves_query_surface(self, crawl_records):
        objs = dump_fixture(crawl_records, {"start_url": "http://localhost:8000"})
        back = load_fixture(objs)
        for fn in (query.search_pages, query.list_errors, query.list_redirects):
            a, b = fn(crawl_records), fn(back)
            assert a.column("url").to_pylist() == b.column("url").to_pylist()
        assert (
            query.list_components(back).column("class_name").to_pylist()
            == query.list_components(crawl_records).column("class_name").to_pylist()
        )
        assert (
            query.list_links(back).column("href").to_pylist()
            == query.list_links(crawl_records).column("href").to_pylist()
        )

    def test_dump_shape_matches_django(self, crawl_records):
        objs = dump_fixture(crawl_records)
        models = {o["model"] for o in objs}
        assert "crawler.crawl" in models and "crawler.page" in models
        page = next(o for o in objs if o["model"] == "crawler.page")
        assert set(page["fields"]) == {
            "crawl", "timestamp", "url", "title", "language", "html",
            "text", "components", "links",
        }
        assert page["fields"]["timestamp"].endswith("Z")


@pytest.mark.skipif(
    not os.path.exists(REF_FIXTURE), reason="reference fixture not present"
)
class TestReferenceFixtureIngest:
    def test_reference_sample_loads_and_queries(self):
        records = load_fixture(REF_FIXTURE)
        pages = query.search_pages(records)
        assert pages.column("url").to_pylist() == [
            "http://localhost:8000/",
            "http://localhost:8000/child/",
            "http://localhost:8000/child/?page=2",
        ]
        comps = query.list_components(records)
        assert comps.column("class_name").to_pylist() == ["o-sample"]
        links = query.list_links(records)
        assert links.num_rows == 9
        errors = query.list_errors(records)
        assert errors.column("url").to_pylist() == [
            "https://example.com/file.xlsx"
        ]
        assert errors.column("status_code").to_pylist() == [404]

    def test_ingest_export_ingest_fixpoint(self):
        """Round-trip starting from the REFERENCE's own dumpdata file:
        load → dump → load reaches a fixpoint — the second ingest is
        row-identical to the first (record types, payloads, dimension
        lists, timestamps all survive the wire format)."""
        first = load_fixture(REF_FIXTURE)
        second = load_fixture(dump_fixture(first))

        def canon(tbl):
            t = tbl.select(sorted(tbl.schema.names))
            return t.take(
                pc.sort_indices(
                    t,
                    sort_keys=[("record_type", "ascending"), ("url", "ascending")],
                )
            ).to_pylist()

        assert canon(first) == canon(second)

    def test_reference_search_semantics_over_ingested_fixture(self):
        records = load_fixture(REF_FIXTURE)
        out = query.search_pages(records, "components", "o-sample")
        assert out.column("url").to_pylist() == ["http://localhost:8000/"]
        out = query.search_pages(records, "text", "SAMPLE CONTENT")
        assert out.num_rows == 3
