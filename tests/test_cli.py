"""CLI entrypoint (python -m website_indexer_ray) — the reference's
manage.py command surface (crawl.py:7-15, manage_crawls.py:14-69)
driven in-process against the synthetic corpus."""

import json

import pyarrow.parquet as pq

from website_indexer_ray.__main__ import main
from website_indexer_ray.fixtures.gen import generate_corpus


def _json_lines(out: str) -> list:
    """Parse the CLI's JSON output lines, skipping any raylet/worker
    warnings Ray interleaves into captured stdout under load (they
    never start with '{' or '[')."""
    return [
        json.loads(ln)
        for ln in out.strip().splitlines()
        if ln.lstrip().startswith(("{", "["))
    ]


def test_cli_curate(ray_session, tmp_path, capsys):
    rc = main(
        [
            "curate",
            "--sf-dir", "/root/testdata/sf0.001",
            "--out", str(tmp_path / "curated"),
        ]
    )
    assert rc == 0
    stats = _json_lines(capsys.readouterr().out)[-1]
    assert stats["input"] == 500
    assert 0 < stats["kept"] <= stats["cleaned"] <= stats["input"]
    assert (tmp_path / "curated" / "kept" / "_SUCCESS").exists()


def test_cli_crawl_query_manage(ray_session, tmp_path, capsys):
    corpus, seeds = generate_corpus(n_pages=30, seed=42)
    pq.write_table(corpus, str(tmp_path / "corpus.parquet"))
    pq.write_table(seeds, str(tmp_path / "seeds.parquet"))
    out = tmp_path / "root" / "run1"

    rc = main(
        [
            "crawl",
            "--start-url", "https://test.example/",
            "--corpus", str(tmp_path / "corpus.parquet"),
            "--seeds", str(tmp_path / "seeds.parquet"),
            "--out", str(out),
            "--crawl-id", "t1",
            "--seen-shards", "2",
            "--politeness-wait", "0",
        ]
    )
    assert rc == 0
    summary = _json_lines(capsys.readouterr().out)[-1]
    assert summary["status"] == "Finished"
    assert summary["pages"] > 0
    assert summary["urls_fetched"] >= summary["pages"]

    rc = main(
        ["query", "--out", str(out), "--search-type", "title", "--q", "Section"]
    )
    assert rc == 0
    page = _json_lines(capsys.readouterr().out)[-1]
    assert page["count"] >= 1
    assert all("Section" in r["title"] for r in page["results"])

    rc = main(["page", "--out", str(out), "--url", "https://test.example/"])
    assert rc == 0
    detail = _json_lines(capsys.readouterr().out)[-1]
    assert detail["title"].startswith("Home")

    rc = main(["page", "--out", str(out), "--url", "https://nope.example/"])
    assert rc == 4  # RetrieveAPIView 404 analog
    capsys.readouterr()

    rc = main(["list", "errors", "--out", str(out), "--status-code", "404"])
    assert rc == 0
    err_rows = _json_lines(capsys.readouterr().out)
    assert err_rows and all(r["status_code"] == 404 for r in err_rows)

    rc = main(["list", "components", "--out", str(out)])
    assert rc == 0
    comps = _json_lines(capsys.readouterr().out)
    assert comps == sorted(comps, key=lambda r: r["class_name"])

    rc = main(["manage", "list", "--root", str(tmp_path / "root")])
    assert rc == 0
    rows = _json_lines(capsys.readouterr().out)
    assert rows[0]["name"] == "run1"
    assert rows[0]["status"] == "Finished"


class TestExitStatusMapping:
    """plugin.py:283-304 — network-class exit codes downgrade to 0."""

    def test_network_classes_downgrade(self):
        from website_indexer_ray.__main__ import map_exit_status

        for code in (4, 5, 6, 7, 8):
            assert map_exit_status(code) == 0

    def test_real_errors_kept(self):
        from website_indexer_ray.__main__ import map_exit_status

        for code in (1, 2, 3):
            assert map_exit_status(code) == code

    def test_exception_classification(self):
        import socket
        import ssl

        from website_indexer_ray.__main__ import _classify_crawl_exception

        assert _classify_crawl_exception(ssl.SSLError()) == 5
        assert _classify_crawl_exception(socket.gaierror()) == 4
        assert _classify_crawl_exception(TimeoutError()) == 4
        assert _classify_crawl_exception(ValueError()) == 1

    def test_file_io_errors_not_downgraded(self):
        from website_indexer_ray.__main__ import (
            _classify_crawl_exception,
            map_exit_status,
        )

        assert map_exit_status(_classify_crawl_exception(PermissionError())) == 3
        assert map_exit_status(_classify_crawl_exception(FileNotFoundError())) == 3


def test_diff_subcommand(ray_session, tmp_path, capsys):
    """`diff --old A --new B` prints one JSON line per changed page."""
    import json as _json

    from website_indexer_ray.__main__ import main as cli_main
    from website_indexer_ray.config import CrawlConfig
    from website_indexer_ray.fixtures.gen import (
        START_URL,
        generate_corpus,
        mutate_corpus_rev2,
    )
    from website_indexer_ray.pipelines.engine import CrawlEngine

    corpus, seeds = generate_corpus(n_pages=30, seed=42)
    cfg = CrawlConfig(start_url=START_URL, n_seen_shards=2, fetch_concurrency=2)
    a, b = str(tmp_path / "a"), str(tmp_path / "b")
    CrawlEngine(cfg, a).run(corpus, seeds)
    CrawlEngine(cfg, b).run(mutate_corpus_rev2(corpus), seeds)

    rc = cli_main(["diff", "--old", a, "--new", b])
    assert rc == 0
    rows = _json_lines(capsys.readouterr().out)
    assert rows and {r["change"] for r in rows} <= {"added", "removed", "changed"}
